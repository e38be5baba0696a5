"""Deterministic pair-gated value check for ngram_jaccard at big SF
(VERDICT r11 task 5).

ngram_jaccard's output is PAIR-LOCAL: candidate generation (minhash →
banding → distinct pairs) is global, but each output row's jaccard
value depends only on its two documents. So a deterministic gate on
(id_a + id_b) applied identically in both engines keeps the candidate
set exact (both sides still band ALL docs) while cutting the
interpreted per-pair jaccard leg — the part that made the full sf1
replay blow its timeout (3.27M pairs × list_intersect) — by the gate
modulus. The comparison is value-exact on the gated subset: same
pairs, same shingle hashes, same 4-dp rounding.

Usage: python tools/sf1_pair_sample.py [sf_dir] [modulus]
  (defaults: .scale/sf1, 50 -> ~65k of the 3.27M sf1 pairs)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from greenmask_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1"
    mod = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    import pyspark.sql.functions as F

    spark = get_spark("sf1-pair-sample")
    t0 = time.perf_counter()
    sdf = entrymod.q_ngram_jaccard(spark, sf_dir).filter(
        F.pmod(F.col("id_a") + F.col("id_b"), F.lit(mod)) == 0
    )
    srows = sorted(
        (int(r.id_a), int(r.id_b), float(r.jaccard)) for r in sdf.collect()
    )
    spark_s = time.perf_counter() - t0

    # gate INSIDE the jaccard leg: wrap the oracle so candidates stay
    # global but only gated pairs pay list_intersect
    sql = (
        "SELECT * FROM (" + entrymod._oracle_ngram_jaccard() + ") "
        f"WHERE (id_a + id_b) % {mod} = 0"
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS FROM "
        f"'{os.path.join(sf_dir, 'documents.parquet')}'"
    )
    t1 = time.perf_counter()
    drows = sorted(
        (int(a), int(b), float(j)) for a, b, j in con.sql(sql).fetchall()
    )
    duck_s = time.perf_counter() - t1

    print(f"gate (id_a+id_b) % {mod} == 0 at {sf_dir}: "
          f"spark {len(srows)} rows in {spark_s:.1f}s, "
          f"duckdb {len(drows)} rows in {duck_s:.1f}s")
    ok = srows == drows
    if not ok:
        sset, dset = set(srows), set(drows)
        print("spark-only:", sorted(sset - dset)[:5])
        print("duck-only :", sorted(dset - sset)[:5])
    print("VALUE-EXACT" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
