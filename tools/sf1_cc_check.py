"""sf1 value evidence for the connected-component registry rows
(VERDICT r11 task 5): dedup_clusters and split_levels.

Their driver oracles replay CC with a recursive reachability CTE —
fine at the sf0.01 gate, but quadratic PER COMPONENT (reach holds
every (node, reachable-label) pair, so a size-S component costs S²
rows) and the sf1 corpus bands ~48k of its 50k docs into a handful of
mega-components: the replay can never finish, at any timeout, and no
OUTPUT sample helps because every label depends on the whole
component. DuckDB 1.0 has no keyed/incremental recursion, so this
tool iterates min-label propagation FROM PYTHON over DuckDB temp
tables — O(E) per round, converging in component-diameter rounds
(banded components are unions of band-bucket cliques, so diameters
are small) — and value-compares the full 50k/100k-row outputs
against the Spark side. Same pair SQL as the driver oracle
(_oracle_minhash_pairs, materialized-hs form), same split hashing as
_oracle_cluster_split/_oracle_train_split.

Usage: python tools/sf1_cc_check.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from greenmask_spark.session import get_spark  # noqa: E402


def duck_clusters(con) -> None:
    """Create table ``clusters(doc_id, cluster_id)``: min reachable id
    per node over the symmetric LSH-candidate edges — the same
    semantics as the driver oracle's recursive CTE, iterated to an
    OBSERVED fixpoint (the loop only stops when a full round changes
    zero labels, so convergence is proven, not assumed)."""
    t0 = time.perf_counter()
    con.sql(
        "CREATE TABLE pairs AS " + entrymod._oracle_minhash_pairs()
    )
    con.sql("""
        CREATE TABLE edges AS
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION ALL SELECT id_b, id_a FROM pairs""")
    n_pairs = con.sql("SELECT count(*) FROM pairs").fetchone()[0]
    print(f"  pairs: {n_pairs} in {time.perf_counter() - t0:.1f}s")
    con.sql("CREATE TABLE lab AS SELECT doc_id AS n, doc_id AS r "
            "FROM documents")
    for it in range(1, 101):
        t1 = time.perf_counter()
        con.sql("""
            CREATE OR REPLACE TABLE lab2 AS
            SELECT n, min(r) AS r FROM (
              SELECT n, r FROM lab
              UNION ALL
              SELECT e.v AS n, lab.r FROM lab JOIN edges e ON e.u = lab.n
            ) GROUP BY n""")
        changed = con.sql(
            "SELECT count(*) FROM lab JOIN lab2 USING (n) "
            "WHERE lab.r <> lab2.r").fetchone()[0]
        con.sql("DROP TABLE lab")
        con.sql("ALTER TABLE lab2 RENAME TO lab")
        print(f"  iter {it}: {changed} labels moved "
              f"({time.perf_counter() - t1:.1f}s)")
        if changed == 0:
            break
    else:
        raise RuntimeError("label propagation did not converge in 100 "
                           "rounds")
    con.sql("CREATE TABLE clusters AS SELECT n AS doc_id, r AS cluster_id "
            "FROM lab")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1"
    spark = get_spark("sf1-cc-check")
    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS FROM "
            f"'{os.path.join(sf_dir, 'documents.parquet')}'")

    # the duck phase is hours at sf10 (the pair build is a 250M-sha256
    # interpreted pipeline) — persist its labels next to the data so a
    # failed SPARK phase (r13: OOM at the old fixed 8g heap) doesn't
    # force a duck rerun; delete the cache to recompute
    cache = os.path.join(sf_dir, "cc_labels_cache.parquet")
    if os.path.exists(cache):
        print(f"duckdb: reusing cached labels {cache}")
        con.sql(f"CREATE TABLE clusters AS FROM '{cache}'")
    else:
        print("duckdb: iterated min-label propagation")
        duck_clusters(con)
        con.sql(f"COPY clusters TO '{cache}' (FORMAT parquet)")
        print(f"  labels cached -> {cache}")

    failures = 0

    # --- dedup_clusters ---
    t0 = time.perf_counter()
    srows = sorted(
        (int(r.doc_id), int(r.cluster_id))
        for r in entrymod.q_dedup_clusters(spark, sf_dir).collect()
    )
    print(f"spark dedup_clusters: {len(srows)} rows "
          f"in {time.perf_counter() - t0:.1f}s")
    drows = sorted(
        (int(a), int(b))
        for a, b in con.sql(
            "SELECT doc_id, cluster_id FROM clusters").fetchall()
    )
    ok = srows == drows
    print(f"dedup_clusters: spark {len(srows)} vs duckdb {len(drows)} -> "
          + ("VALUE-EXACT" if ok else "MISMATCH"))
    failures += 0 if ok else 1

    # --- split_levels (hash leg = _oracle_train_split verbatim;
    # cluster leg = _oracle_cluster_split's CASE over the iterated
    # clusters table) ---
    t0 = time.perf_counter()
    srows = sorted(
        (r.scheme, int(r.doc_id), r.split)
        for r in entrymod.q_split_levels(spark, sf_dir).collect()
    )
    print(f"spark split_levels: {len(srows)} rows "
          f"in {time.perf_counter() - t0:.1f}s")
    u_cl = ("(CAST(('0x' || substr(sha256(CAST(c.cluster_id AS VARCHAR) "
            "|| ':split:42'), 1, 15)) AS BIGINT) % 1000000)")
    drows = sorted(
        (s, int(d), sp)
        for s, d, sp in con.sql(f"""
            SELECT 'hash' AS scheme, doc_id, split
            FROM ({entrymod._oracle_train_split()})
            UNION ALL
            SELECT 'cluster', d.doc_id,
                   CASE WHEN {u_cl} < 800000 THEN 'train'
                        WHEN {u_cl} < 900000 THEN 'val'
                        ELSE 'test' END
            FROM documents d JOIN clusters c ON c.doc_id = d.doc_id
        """).fetchall()
    )
    ok = srows == drows
    print(f"split_levels: spark {len(srows)} vs duckdb {len(drows)} -> "
          + ("VALUE-EXACT" if ok else "MISMATCH"))
    failures += 0 if ok else 1
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
