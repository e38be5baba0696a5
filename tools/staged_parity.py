"""Oracle parity for STAGED driver rows (q_<name>/_oracle_<name> pairs
that exist in __spark_entry__.py but are not yet rotated into
queries()) at an arbitrary SF — the decade-step evidence SCALE.md
records for operators BEFORE their driver debut, using the exact same
row normalization/compare as tools/check_oracle.py (itself the local
replica of the driver gate).

Usage: python tools/staged_parity.py SF_DIR name [name ...]
Env:   ORACLE_TIMEOUT_S — degrade an over-budget DuckDB replay to
       reported rows-only evidence instead of hanging the sweep.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from greenmask_spark.session import TABLES, get_spark  # noqa: E402
from tools.check_oracle import _run_oracle, norm_rows  # noqa: E402


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    oracle_timeout = float(os.environ.get("ORACLE_TIMEOUT_S", "0")) or None

    spark = get_spark("staged-parity")
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS FROM '{path}'")

    passed = failed = skipped = 0
    for name in names:
        qfn = getattr(entrymod, f"q_{name}", None)
        ofn = getattr(entrymod, f"_oracle_{name}", None)
        if qfn is None:
            print(f"FAIL  {name}: no q_{name} in __spark_entry__")
            failed += 1
            continue
        t0 = time.perf_counter()
        try:
            sdf = qfn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            failed += 1
            continue
        spark_s = time.perf_counter() - t0
        if ofn is None:
            print(f"skip  {name}: no oracle (rows={len(srows)}) "
                  f"[spark {spark_s:.1f}s]")
            skipped += 1
            continue
        t1 = time.perf_counter()
        try:
            dcols, drows = _run_oracle(con, ofn(), oracle_timeout)
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            if "INTERRUPT" in msg.upper():
                print(f"skip  {name}: oracle timeout after "
                      f"{oracle_timeout:.0f}s — rows-only "
                      f"(spark ok, {len(srows)} rows in {spark_s:.1f}s)")
                skipped += 1
            else:
                print(f"FAIL  {name}: duckdb error: {msg[:300]}")
                failed += 1
            continue
        duck_s = time.perf_counter() - t1
        if sorted(scols) != sorted(dcols):
            print(f"FAIL  {name}: columns spark={sorted(scols)} "
                  f"duck={sorted(dcols)}")
            failed += 1
            continue
        if len(srows) != len(drows):
            print(f"FAIL  {name}: rowcount spark={len(srows)} "
                  f"duck={len(drows)}")
            failed += 1
            continue
        ns, nd = norm_rows(scols, srows), norm_rows(dcols, drows)
        if ns != nd:
            n_bad = sum(a != b for a, b in zip(ns, nd))
            bad = [(a, b) for a, b in zip(ns, nd) if a != b][:2]
            print(f"FAIL  {name}: value mismatch ({n_bad} rows); "
                  f"first: {bad}")
            failed += 1
            continue
        print(f"ok    {name} ({len(srows)} rows) "
              f"[spark {spark_s:.1f}s, duck {duck_s:.1f}s]")
        passed += 1
    print(f"\n{passed} ok, {failed} failed, {skipped} skipped (rows-only)")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
