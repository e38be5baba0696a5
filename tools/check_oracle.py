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


def _run_oracle(con, sql: str, timeout_s: float | None):
    """Run the DuckDB twin, interrupting it after ``timeout_s``.

    Some oracle twins deliberately RE-DERIVE the operator in
    interpreted SQL (per-doc minhash recompute, unrolled fixpoint
    iterations) — at decade-step scale a few of those replays cost
    hours of ORACLE time while the Spark side runs in seconds. The
    timeout keeps a big-SF sweep terminating: a timed-out query
    degrades to the driver's weaker rows-only evidence and is
    REPORTED as such, never silently passed."""
    if not timeout_s:
        res = con.sql(sql)
        return [d[0] for d in res.description], res.fetchall()
    import threading

    # dedicated cursor (shares the catalog/views): a completion/timeout
    # race — query finishing right as timeout_s elapses — could leave a
    # PENDING interrupt on the connection that aborts the NEXT oracle
    # query, misreporting it as a timeout. An interrupt stranded on this
    # cursor dies with the cursor instead.
    cur = con.cursor()
    done = threading.Event()

    def watchdog():
        if not done.wait(timeout_s):
            cur.interrupt()

    t = threading.Thread(target=watchdog, daemon=True)
    t.start()
    try:
        res = cur.sql(sql)
        cols = [d[0] for d in res.description]
        rows = res.fetchall()
        return cols, rows
    finally:
        done.set()
        t.join()  # never close a cursor a live thread may interrupt
        cur.close()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) \
        else "/root/testdata/sf0.01"
    only = set(a for a in sys.argv[1:] if not os.path.isdir(a))
    oracle_timeout = float(os.environ.get("ORACLE_TIMEOUT_S", "0")) or None

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS FROM '{path}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    passed = failed = skipped = 0
    import time as _time
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = _time.perf_counter()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {str(e)[:200]}")
            failed += 1
            continue
        spark_s = _time.perf_counter() - t0
        if name not in oracles:
            print(f"skip  {name}: no oracle (rows={len(srows)}) "
                  f"[spark {spark_s:.1f}s]")
            skipped += 1
            continue
        t1 = _time.perf_counter()
        try:
            dcols, drows = _run_oracle(con, oracles[name], oracle_timeout)
        except Exception as e:
            msg = str(e)
            if "INTERRUPT" in msg.upper():
                print(f"skip  {name}: oracle timeout after "
                      f"{oracle_timeout:.0f}s — rows-only evidence "
                      f"(spark ok, {len(srows)} rows in {spark_s:.1f}s)")
                skipped += 1
            else:
                print(f"FAIL  {name}: duckdb error: {msg[:200]}")
                failed += 1
            continue
        duck_s = _time.perf_counter() - t1
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
        print(f"ok    {name} ({len(srows)} rows) "
              f"[spark {spark_s:.1f}s, duck {duck_s:.1f}s]")
        passed += 1
    print(f"\n{passed} ok, {failed} failed, {skipped} skipped (rows-only)")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
