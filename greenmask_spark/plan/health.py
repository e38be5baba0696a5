"""Physical-plan health introspection: the node counts that matter at
100 TB, from a walk of the AQE-final executed plan tree.

Counting from the plan's STRING form over-reports: toString inlines
every cached relation's fill plan at each InMemoryTableScan reference
and repeats reused exchanges. The walk descends AQE stages, stops at
ReusedExchange, and audits each distinct cached relation's fill plan
exactly once (it executes once per query — that is the point of a
persist).

Use ``plan_health(df)`` after running (or at least counting) the frame
so AQE has finalized; ``tools/plan_audit.py`` applies this to every
driver query and writes PLANS.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

PY_NODES = {
    "ArrowEvalPythonExec", "BatchEvalPythonExec", "MapInPandasExec",
    "FlatMapGroupsInPandasExec", "FlatMapGroupsInPandasWithStateExec",
    "MapInBatchExec",
}

_STAGES = (
    "ShuffleQueryStageExec", "BroadcastQueryStageExec",
    "TableCacheQueryStageExec", "ResultQueryStageExec",
)


def _walk(node, out, seen, jvm):
    cls = node.getClass().getSimpleName()
    # AQE reuses stage OBJECTS (same QueryStageExec under several
    # parents) — visit each physical node once
    nid = jvm.System.identityHashCode(node)
    if nid in seen:
        return
    seen.add(nid)
    out.append(node)
    if cls == "AdaptiveSparkPlanExec":
        _walk(node.executedPlan(), out, seen, jvm)
        return
    if cls in _STAGES:
        _walk(node.plan(), out, seen, jvm)
        return
    if cls == "ReusedExchangeExec":
        return  # physical reuse: the referenced exchange counts once
    if cls == "InMemoryTableScanExec":
        rel = node.relation()
        rid = jvm.System.identityHashCode(rel)
        if rid not in seen:
            seen.add(rid)
            _walk(rel.cachedPlan(), out, seen, jvm)
        return
    cs = node.children()
    for i in range(cs.size()):
        _walk(cs.apply(i), out, seen, jvm)


def plan_health(df: DataFrame) -> dict:
    """Counts for the executed plan: shuffles, broadcasts, sort-merge
    joins, Python boundaries, codegen spans, parquet scans (+ pushed
    filters), cache reads."""
    jvm = df.sparkSession._jvm
    nodes: list = []
    _walk(df._jdf.queryExecution().executedPlan(), nodes, set(), jvm)
    counts = {"shuffles": 0, "bcasts": 0, "smj": 0, "python": 0,
              "codegen": 0, "scans": 0, "pushed": 0, "cache_reads": 0,
              "spread": 0}
    for n in nodes:
        cls = n.getClass().getSimpleName()
        if cls == "ShuffleExchangeExec":
            # spread exchanges are the input-size-ADAPTIVE spread
            # (session.spread_input): they exist only when the input
            # yields fewer scan splits than the session has cores —
            # i.e. never at scale — so they are audited separately
            # from the algorithmic (hash/range) shuffles whose count
            # IS the operator's 100 TB shape. The spread key is
            # hash(monotonically_increasing_id) (sort-free, unlike
            # keyless round-robin); RoundRobinPartitioning stays
            # classified as spread for older plans
            # the spread key is hoisted by PullOutNondeterministic into
            # an attribute named _nondeterministic, which is what the
            # physical hashpartitioning prints
            op = str(n.outputPartitioning())
            if ("RoundRobinPartitioning" in op
                    or "_nondeterministic" in op
                    or "monotonically_increasing_id" in op):
                counts["spread"] += 1
            else:
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


def plan_has_nondeterministic(df: DataFrame) -> bool:
    """True when any expression in the frame's ANALYZED logical plan is
    non-deterministic (rand(), uuid(), shuffle(), monotonically_
    increasing_id(), a non-deterministic UDF, …). Operators that read
    their input more than once (e.g. ``cap_per_domain``'s count pass +
    two union branches) use this to detect inputs whose re-execution
    could disagree between reads. ``Expression.deterministic`` is
    subtree-recursive, so checking each node's own expression list
    covers the whole tree. Returns False when introspection is
    unavailable (no JVM plan handle) — callers treat that as
    'assume deterministic', matching the pre-guard behavior.

    Fast path: a frame carrying the load_tables scan hint
    (``_graft_scan_bytes``) is by construction a deterministic parquet
    scan plus deterministic projections/filters (``keep_scan_hint``'s
    documented invariant — the hint must only be carried across
    deterministic derivations), so the JVM plan walk — tens to
    hundreds of py4j round trips — is skipped outright."""
    if getattr(df, "_graft_scan_bytes", None) is not None:
        return False
    try:
        # explicit stack, not recursion: an iteratively-built plan can
        # nest deeper than Python's recursion limit, and a
        # RecursionError swallowed by the fallback below would
        # silently disable the guard on exactly the complex inputs
        # most likely to need it
        stack = [df._jdf.queryExecution().analyzed()]
        while stack:
            node = stack.pop()
            # RepartitionByExpression's expressions only decide row
            # PLACEMENT, never row values — the session.spread_input
            # key (monotonically_increasing_id) is formally
            # non-deterministic but cannot make two passes over the
            # same frame disagree on the row multiset, which is the
            # only thing this guard protects. Spark's
            # PullOutNondeterministic rule hoists the key into a child
            # Project as an alias literally named `_nondeterministic`,
            # so that alias is exempt too — ONLY directly under a
            # RepartitionByExpression (a value column built from
            # mono_id keeps its user alias and still trips the guard).
            if node.getClass().getSimpleName() == "RepartitionByExpression":
                cs = node.children()
                for i in range(cs.size()):
                    c = cs.apply(i)
                    if c.getClass().getSimpleName() != "Project":
                        stack.append(c)
                        continue
                    cexprs = c.expressions()
                    for j in range(cexprs.size()):
                        e = cexprs.apply(j)
                        # the exemption requires BOTH the
                        # PullOutNondeterministic alias name AND a
                        # MonotonicallyIncreasingID child: the rule
                        # gives rand()-derived repartition keys the
                        # same alias, and those ARE the retry hazard
                        # (SPARK-38388) this guard exists to catch —
                        # matching on the name alone would wave them
                        # through.
                        if (e.getClass().getSimpleName() == "Alias"
                                and e.name() == "_nondeterministic"
                                and e.child().getClass().getSimpleName()
                                == "MonotonicallyIncreasingID"):
                            continue
                        if not e.deterministic():
                            return True
                    gcs = c.children()
                    for j in range(gcs.size()):
                        stack.append(gcs.apply(j))
                continue
            exprs = node.expressions()
            for i in range(exprs.size()):
                if not exprs.apply(i).deterministic():
                    return True
            cs = node.children()
            for i in range(cs.size()):
                stack.append(cs.apply(i))
            # subqueries hang off expressions, but a rand() inside one
            # already fails expression.deterministic above
        return False
    except Exception:
        return False
