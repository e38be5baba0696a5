"""Capture .explain("formatted") for bench HEADLINE queries into
plans/<dir>/<query>_<tag>.txt (dir from $SPARK_GRAFT_PLANS_DIR, default r14) (tag = before/after). Usage:

    python tools/capture_plans.py <tag> [query ...]

Queries default to the full bench HEADLINE list. The formatted plan is
the AQE-initial plan (the judge-checkable artifact bench methodology
names); checkpointed subplans appear as their truncated scans, exactly
as the executed query sees them.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
import bench  # noqa: E402
from greenmask_spark.session import get_spark  # noqa: E402


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or bench.HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", os.environ.get("SPARK_GRAFT_PLANS_DIR", "r14"))
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("greenmask-spark-plans")
    qs = entrymod.queries()
    for name in names:
        fn = qs.get(name) or getattr(entrymod, "q_" + name)
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
