"""Full-output oracle parity in BOUNDED memory: shard both engines by
a key column and compare shard-by-shard with the strict driver
normalizer.

The plain sweeps (check_oracle / staged_parity) collect each side's
ENTIRE output onto the Python driver — at decade scale that is the
COMPARATOR's wall, not the operator's (e.g. the t_numeric_draws melt
is 123M rows at sf10: Spark computes it in seconds, collectToPython
dies), and some deliberately-interpreted DuckDB replays (the
entropy_profile per-char list fold) exhaust DuckDB's non-spillable
list-aggregate memory before returning at all. Sharding by
``key % n_shards`` pushes the SAME partition predicate into both
engines, so each shard re-runs the full operator logic over a 1/n
slice: the union of green shards is hash-exact equality over the FULL
output, with peak memory 1/n everywhere (Spark driver, DuckDB, the
Python compare).

Usage: python tools/sharded_parity.py SF_DIR NAME KEY_COL N_SHARDS [K]
NAME resolves q_<NAME>/_oracle_<NAME> from __spark_entry__ (staged
rows included). KEY_COL must be an integer output column. With K,
only shard K runs — one fresh process per shard isolates replays
whose engine-side allocations accumulate across shards (DuckDB's
buffer pool holds list-aggregate memory for the connection's life).
Env: ORACLE_TIMEOUT_S as in check_oracle. SHARD_SOURCE_TABLE=<table>
additionally pre-filters that DuckDB view to the shard's keys —
required when the replay materializes per-row state the optimizer
won't prune through (entropy_profile's per-char list folds OOM DuckDB
even for a 1/10 output slice, because the outer ``key % n`` filter is
not pushed into the interpreted CTE). ONLY valid for row-local
queries whose output key equals the source table's key 1:1 — never
for cross-row aggregates over the key.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from greenmask_spark.session import TABLES, get_spark  # noqa: E402
from tools.check_oracle import _run_oracle, norm_rows  # noqa: E402


def main() -> int:
    if len(sys.argv) not in (5, 6):
        print(__doc__)
        return 2
    sf_dir, name, key_col = sys.argv[1:4]
    n_shards = int(sys.argv[4])
    only_k = int(sys.argv[5]) if len(sys.argv) == 6 else None
    oracle_timeout = float(os.environ.get("ORACLE_TIMEOUT_S", "0")) or None

    qfn = getattr(entrymod, f"q_{name}")
    osql = getattr(entrymod, f"_oracle_{name}")()

    src_table = os.environ.get("SHARD_SOURCE_TABLE")

    spark = get_spark("sharded-parity")
    con = duckdb.connect()

    def make_views(k: int) -> None:
        for t in TABLES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            if not os.path.exists(path):
                continue
            where = (f" WHERE ({key_col} % {n_shards} + {n_shards})"
                     f" % {n_shards} = {k}" if t == src_table else "")
            con.sql(f"CREATE OR REPLACE VIEW {t} AS "
                    f"SELECT * FROM '{path}'{where}")

    total = 0
    t_all = time.perf_counter()
    shard_range = range(n_shards) if only_k is None else [only_k]
    for k in shard_range:
        make_views(k)
        t0 = time.perf_counter()
        sdf = qfn(spark, sf_dir).filter(
            F.pmod(F.col(key_col), F.lit(n_shards)) == k
        )
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        t1 = time.perf_counter()
        dsql = (f"SELECT * FROM ({osql}) "
                f"WHERE ({key_col} % {n_shards} + {n_shards})"
                f" % {n_shards} = {k}")
        dcols, drows = _run_oracle(con, dsql, oracle_timeout)
        t2 = time.perf_counter()
        if sorted(scols) != sorted(dcols):
            print(f"FAIL shard {k}: columns {sorted(scols)} vs "
                  f"{sorted(dcols)}")
            return 1
        if len(srows) != len(drows):
            print(f"FAIL shard {k}: rowcount spark={len(srows)} "
                  f"duck={len(drows)}")
            return 1
        ns, nd = norm_rows(scols, srows), norm_rows(dcols, drows)
        if ns != nd:
            n_bad = sum(a != b for a, b in zip(ns, nd))
            print(f"FAIL shard {k}: {n_bad} mismatched rows; first: "
                  f"{[(a, b) for a, b in zip(ns, nd) if a != b][:2]}")
            return 1
        total += len(srows)
        print(f"ok shard {k + 1}/{n_shards}: {len(srows)} rows "
              f"[spark {t1 - t0:.1f}s, duck {t2 - t1:.1f}s]",
              flush=True)
    label = (f"{n_shards} shards" if only_k is None
             else f"shard {only_k}/{n_shards}")
    print(f"\nVALUE-EXACT: {total} rows across {label} "
          f"[{time.perf_counter() - t_all:.1f}s total]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
