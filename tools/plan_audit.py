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

PY_NODES = {
    "ArrowEvalPythonExec", "BatchEvalPythonExec", "MapInPandasExec",
    "FlatMapGroupsInPandasExec", "FlatMapGroupsInPandasWithStateExec",
    "MapInBatchExec",
}


def _walk(node, out, seen_caches, jvm):
    cls = node.getClass().getSimpleName()
    # AQE reuses stage OBJECTS (the same QueryStageExec referenced from
    # several parents) — walk each physical node once
    nid = jvm.System.identityHashCode(node)
    if nid in seen_caches:
        return
    seen_caches.add(nid)
    out.append(node)
    if cls == "AdaptiveSparkPlanExec":
        _walk(node.executedPlan(), out, seen_caches, jvm)
        return
    if cls in ("ShuffleQueryStageExec", "BroadcastQueryStageExec",
               "TableCacheQueryStageExec", "ResultQueryStageExec"):
        _walk(node.plan(), out, seen_caches, jvm)
        return
    if cls == "ReusedExchangeExec":
        return  # physical reuse: the referenced exchange is counted once
    if cls == "InMemoryTableScanExec":
        rel = node.relation()
        rid = jvm.System.identityHashCode(rel)
        if rid not in seen_caches:
            seen_caches.add(rid)
            # audit the fill plan once — it executes once per query
            _walk(rel.cachedPlan(), out, seen_caches, jvm)
        return
    cs = node.children()
    for i in range(cs.size()):
        _walk(cs.apply(i), out, seen_caches, jvm)


def audit(df, jvm) -> dict:
    nodes: list = []
    _walk(df._jdf.queryExecution().executedPlan(), nodes, set(), jvm)
    counts = {"shuffles": 0, "bcasts": 0, "smj": 0, "python": 0,
              "codegen": 0, "scans": 0, "pushed": 0, "cache_reads": 0}
    for n in nodes:
        cls = n.getClass().getSimpleName()
        if cls == "ShuffleExchangeExec":
            counts["shuffles"] += 1
        elif cls == "BroadcastExchangeExec":
            counts["bcasts"] += 1
        elif cls == "SortMergeJoinExec":
            counts["smj"] += 1
        elif cls in PY_NODES:
            counts["python"] += 1
        elif cls == "WholeStageCodegenExec":
            counts["codegen"] += 1
        elif cls == "InMemoryTableScanExec":
            counts["cache_reads"] += 1
        elif cls == "FileSourceScanExec":
            counts["scans"] += 1
            s = n.simpleString(4000)
            if "PushedFilters: [" in s and "PushedFilters: []" not in s:
                counts["pushed"] += 1
    return counts


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_md = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PLANS.md")
    spark = get_spark("greenmask-spark-plan-audit")
    jvm = spark._jvm
    rows = []
    for name, fn in entrymod.queries().items():
        try:
            df = fn(spark, sf_dir)
            df.count()  # finalize AQE
            rows.append((name, audit(df, jvm), None))
        except Exception as e:  # pragma: no cover - audit must not die
            rows.append((name, None, str(e).split("\n")[0][:100]))

    with open(out_md, "w") as fh:
        fh.write(
            "# PLANS — physical-plan audit (AQE-final, sf={})\n\n"
            "Node counts that matter at scale, from a physical-plan-tree\n"
            "walk (each persisted subplan audited once — its fill cost —\n"
            "plus a cache_reads column for its consumers; ReusedExchange\n"
            "not double-counted). `python` > 0 is licensed only for\n"
            "Template/Cmd/Json-generic/multimodal/BLAS-tile paths;\n"
            "`scans` vs `pushed` shows predicate pushdown reaching parquet\n"
            "(scans without filters legitimately push nothing).\n\n".format(
                sf_dir.rstrip("/").rsplit("sf", 1)[-1])
        )
        fh.write("| query | shuffles | broadcasts | SMJ | python | "
                 "codegen spans | scans | w/ pushed filters | cache reads |\n")
        fh.write("|---|---|---|---|---|---|---|---|---|\n")
        for name, a, err in rows:
            if a is None:
                fh.write(f"| {name} | ERROR: {err} | | | | | | | |\n")
                continue
            fh.write(
                f"| {name} | {a['shuffles']} | {a['bcasts']} | {a['smj']} "
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
