"""Local replica of the driver's correctness gate: run each queries() entry
in Spark and its oracle_sql() twin in DuckDB at sf0.01; compare row count,
column names, and order-insensitive value multisets.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from greenmask_spark.session import TABLES, get_spark  # noqa: E402


def norm_cell(v):
    if isinstance(v, decimal.Decimal):
        # STRICT: keep decimals as exact strings — the driver's value hash
        # does not normalize dtypes, so neither do we (r1 lesson: two
        # queries passed here under float() normalization yet failed the
        # driver's hash on representation drift).
        return ("dec", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(norm_cell(r[i]) for i in order) for r in rows
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) \
        else "/root/testdata/sf0.01"
    only = set(a for a in sys.argv[1:] if not os.path.isdir(a))

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS FROM '{path}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    passed = failed = skipped = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {str(e)[:200]}")
            failed += 1
            continue
        if name not in oracles:
            print(f"skip  {name}: no oracle (rows={len(srows)})")
            skipped += 1
            continue
        try:
            res = con.sql(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:200]}")
            failed += 1
            continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL  {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
            failed += 1
            continue
        if len(srows) != len(drows):
            print(f"FAIL  {name}: rowcount spark={len(srows)} duck={len(drows)}")
            failed += 1
            continue
        ns, nd = norm_rows(scols, srows), norm_rows(dcols, drows)
        if ns != nd:
            bad = [(a, b) for a, b in zip(ns, nd) if a != b][:3]
            print(f"FAIL  {name}: value mismatch ({sum(a != b for a, b in zip(ns, nd))}"
                  f" rows); first: {bad}")
            failed += 1
            continue
        print(f"ok    {name} ({len(srows)} rows)")
        passed += 1
    print(f"\n{passed} ok, {failed} failed, {skipped} skipped (rows-only)")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
