"""Physical-plan audit over every queries() entry → PLANS.md.

For each query, runs the plan at the given sf (executing it so AQE's
final plan is what gets audited) and counts the nodes that matter at
100 TB: shuffles (Exchange), broadcasts, sort-merge joins, Python
boundaries (BatchEvalPython / ArrowEvalPython / MapInPandas /
FlatMapGroupsInPandas), whole-stage-codegen spans, parquet scans (with
pushed filters), and cache reads.

Counts come from TRAVERSING the executed plan tree, not regexing its
string form: the toString inlines every cached relation's fill plan at
each InMemoryTableScan reference, so textual counts over-report a
persisted subplan once per consumer. The walk descends AQE stages,
stops at ReusedExchange, and audits each DISTINCT cached relation's
fill plan exactly once (merged into the totals — the fill runs once per
query, which is the whole point of the persist).

Usage: python tools/plan_audit.py [sf_dir] [out_md]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from greenmask_spark.session import get_spark  # noqa: E402

from greenmask_spark.plan.health import plan_health  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_md = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PLANS.md")
    spark = get_spark("greenmask-spark-plan-audit")
    rows = []
    for name, fn in entrymod.queries().items():
        try:
            df = fn(spark, sf_dir)
            df.count()  # finalize AQE
            rows.append((name, plan_health(df), None))
        except Exception as e:  # pragma: no cover - audit must not die
            rows.append((name, None, str(e).split("\n")[0][:100]))

    with open(out_md, "w") as fh:
        fh.write(
            "# PLANS — physical-plan audit (AQE-final, sf={})\n\n"
            "Node counts that matter at scale, from a physical-plan-tree\n"
            "walk (each persisted subplan audited once — its fill cost —\n"
            "plus a cache_reads column for its consumers; ReusedExchange\n"
            "not double-counted). `python` > 0 is licensed only for\n"
            "Template/Cmd/Json-generic/multimodal/BLAS-tile paths and the\n"
            "vectorized ANN taggers (IVF centroid argmin, LSH sign-bit\n"
            "bucketing — Arrow-batch numpy kernels, not per-row UDFs);\n"
            "`scans` vs `pushed` shows predicate pushdown reaching parquet\n"
            "(scans without filters legitimately push nothing). `spread`\n"
            "counts the input-size-ADAPTIVE round-robin exchanges\n"
            "(session.spread_input) that parallelize a sub-core-count\n"
            "scan at this sf — they do not exist at scale, so they are\n"
            "audited apart from the algorithmic shuffles.\n\n".format(
                sf_dir.rstrip("/").rsplit("sf", 1)[-1])
        )
        fh.write("| query | shuffles | spread | broadcasts | SMJ | python | "
                 "codegen spans | scans | w/ pushed filters | cache reads |\n")
        fh.write("|---|---|---|---|---|---|---|---|---|---|\n")
        for name, a, err in rows:
            if a is None:
                fh.write(f"| {name} | ERROR: {err} | | | | | | | | |\n")
                continue
            fh.write(
                f"| {name} | {a['shuffles']} | {a['spread']} | {a['bcasts']} | {a['smj']} "
                f"| {a['python']} | {a['codegen']} | {a['scans']} "
                f"| {a['pushed']} | {a['cache_reads']} |\n"
            )
    errs = sum(1 for _, a, _ in rows if a is None)
    total_py = sum(a["python"] for _, a, _ in rows if a)
    print(f"audited {len(rows)} queries → {out_md}; "
          f"python-boundary nodes total: {total_py}; errors: {errs}")
    return 1 if errs else 0


if __name__ == "__main__":
    raise SystemExit(main())
