"""sf10 value evidence for the iterative-graph registry row
(VERDICT r12 #6): pagerank over the 60M-row lineitem shipment graph.

The DuckDB oracle unrolls the 3 power iterations as SQL joins; at sf10
that materializes three 60M-edge join pyramids and the replay died
spilling >70 GB of temp to disk (measured this round) — the same
structural wall the recursive-CTE CC replay hit at sf1. The fix is the
same convention tools/sf1_cc_check.py established: replay the
fixed-point kernel OUTSIDE SQL with the exact integer arithmetic the
operator contracts (every rank is bigint nano-units; multiply-divide
uses the overflow-safe split form), vectorized in numpy int64 so 60M
edges iterate in seconds — the scale-out twin of the pure-Python
replay tests/test_functions.py::test_pagerank_fixed_point has pinned
since r8. np.add.at does the integer scatter-add (np.bincount would
round-trip through float64 and break exactness past 2^53).

Usage: python tools/sf10_pagerank_check.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import numpy as np  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from greenmask_spark.functions.linkgraph import RANK_SCALE  # noqa: E402
from greenmask_spark.session import get_spark  # noqa: E402

N_ITERS = 3          # _PR_ITERS — the registry row's unroll count
DAMPING_PPM = 850_000
DST_OFFSET = 1_000_000


def numpy_pagerank(sf_dir: str):
    """(nodes, ranks) int64 arrays — the exact integer kernel."""
    con = duckdb.connect()
    t0 = time.perf_counter()
    # the kernel casts each edge weight to bigint, drops w <= 0, THEN
    # pre-aggregates multi-edges — replicated exactly
    src, dst, w = (
        np.asarray(c, dtype=np.int64)
        for c in con.sql(f"""
        SELECT src, dst, sum(w) AS w FROM (
          SELECT l_suppkey AS src, l_partkey + {DST_OFFSET} AS dst,
                 CAST(l_quantity AS BIGINT) AS w
          FROM read_parquet('{sf_dir}/lineitem.parquet')
        ) WHERE w > 0 GROUP BY 1, 2 ORDER BY 1, 2
        """).fetchnumpy().values()
    )
    print(f"  edges: {len(src):,} in {time.perf_counter() - t0:.1f}s")
    nodes = np.union1d(src, dst)                      # sorted unique
    n = len(nodes)
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    wtot = np.zeros(n, dtype=np.int64)
    np.add.at(wtot, si, w)
    has_out = wtot > 0
    d, ppm, scale = DAMPING_PPM, 1_000_000, RANK_SCALE
    base = (ppm - d) * scale // ppm
    r = np.full(n, scale, dtype=np.int64)
    wt_src = wtot[si]
    for it in range(N_ITERS):
        t1 = time.perf_counter()
        rs = r[si]
        # (r div W)*w + ((r mod W)*w) div W — the split form verbatim
        contrib = (rs // wt_src) * w + ((rs % wt_src) * w) // wt_src
        inflow = np.zeros(n, dtype=np.int64)
        np.add.at(inflow, di, contrib)
        dang = int(r[~has_out].sum())
        x = inflow + dang // n
        r = base + (x // ppm) * d + ((x % ppm) * d) // ppm
        print(f"  iter {it + 1}: {time.perf_counter() - t1:.1f}s")
    return nodes, r


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf10"
    print("numpy: exact integer kernel replay")
    t0 = time.perf_counter()
    nodes, ranks = numpy_pagerank(sf_dir)
    print(f"numpy total: {len(nodes):,} ranks "
          f"in {time.perf_counter() - t0:.1f}s")

    spark = get_spark("sf10-pagerank-check")
    t0 = time.perf_counter()
    rows = entrymod.q_pagerank(spark, sf_dir).collect()
    print(f"spark pagerank: {len(rows):,} rows "
          f"in {time.perf_counter() - t0:.1f}s")
    got = np.array(sorted((r.node, r.rank_fp) for r in rows),
                   dtype=np.int64)
    want = np.stack([nodes, ranks], axis=1)
    ok = got.shape == want.shape and bool((got == want).all())
    print("pagerank sf10: "
          + ("VALUE-EXACT over the full output" if ok else "MISMATCH"))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
