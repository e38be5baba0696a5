"""Physical-plan audit over every queries() entry → PLANS.md.

For each query, runs the plan at the given sf (executing it so AQE's
final plan is what gets audited) and counts the nodes that matter at
100 TB: shuffles (Exchange), broadcasts, sort-merge joins, Python
boundaries (BatchEvalPython / ArrowEvalPython / MapInPandas /
FlatMapGroupsInPandas), whole-stage-codegen spans, and whether parquet
scans carry pushed filters.

Usage: python tools/plan_audit.py [sf_dir] [out_md]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from greenmask_spark.session import get_spark  # noqa: E402

#: node → (column, regex)
COUNTERS = [
    ("shuffles", r"\bExchange (hash|range|SinglePartition)"),
    ("bcasts", r"\bBroadcastExchange\b"),
    ("smj", r"\bSortMergeJoin\b"),
    ("python", r"\b(BatchEvalPython|ArrowEvalPython|MapInPandas|"
               r"FlatMapGroupsInPandas|FlatMapGroupsInPandasWithState)\b"),
    ("codegen", r"\*\(\d+\)"),
]


def audit(plan: str) -> dict:
    out = {name: len(re.findall(rx, plan)) for name, rx in COUNTERS}
    out["codegen"] = len({m for m in re.findall(r"\*\((\d+)\)", plan)})
    scans = re.findall(r"FileScan parquet.*", plan)
    pushed = sum(1 for s in scans
                 if re.search(r"PushedFilters: \[(?!\])", s))
    out["scans"] = len(scans)
    out["pushed"] = pushed
    return out


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
            plan = df._jdf.queryExecution().executedPlan().toString()
            a = audit(plan)
            rows.append((name, a, None))
        except Exception as e:  # pragma: no cover - audit must not die
            rows.append((name, None, str(e).split("\n")[0][:100]))

    with open(out_md, "w") as fh:
        fh.write(
            "# PLANS — physical-plan audit (AQE-final, sf={})\n\n"
            "Node counts that matter at scale. `python` > 0 is licensed only\n"
            "for Template/Cmd/Json-generic/multimodal/near-dup-tile paths;\n"
            "`scans` vs `pushed` shows predicate pushdown reaching parquet\n"
            "(scans without filters legitimately push nothing).\n\n".format(
                sf_dir.rstrip("/").rsplit("sf", 1)[-1])
        )
        fh.write("| query | shuffles | broadcasts | SMJ | python | "
                 "codegen spans | scans | w/ pushed filters |\n")
        fh.write("|---|---|---|---|---|---|---|---|\n")
        for name, a, err in rows:
            if a is None:
                fh.write(f"| {name} | ERROR: {err} | | | | | | |\n")
                continue
            fh.write(
                f"| {name} | {a['shuffles']} | {a['bcasts']} | {a['smj']} "
                f"| {a['python']} | {a['codegen']} | {a['scans']} "
                f"| {a['pushed']} |\n"
            )
    total_python = sum(a["python"] for _, a, _ in rows if a)
    print(f"audited {len(rows)} queries → {out_md}; "
          f"python-boundary nodes total: {total_python}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
