"""Focused tests for session.spread_input — the input-size-adaptive
parallelizing repartition (OPTIMIZATION_r13 §3.1/§3.12).

The floor check must run BEFORE the RDD conversion: df.rdd forces full
physical planning + RDD DAG conversion that is then thrown away, and
on the light transformer chains whose input sits under the floor that
check cost exceeded the work it was gating (measured ~+0.15 s/call).
"""

from __future__ import annotations

import pyspark.sql
import pytest

from greenmask_spark.session import spread_input


def _has_spread_exchange(df) -> bool:
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    return "RepartitionByExpression" in plan


def test_spread_fires_when_underparallel(spark):
    df = spark.range(0, 1000).selectExpr("id", "id * 2 AS v")
    out = spread_input(df, est_partitions=1, min_bytes=0)
    assert _has_spread_exchange(out)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    # placement-only: the row multiset is unchanged
    assert sorted(r.v for r in out.collect()) == sorted(
        r.v for r in df.collect())


def test_spread_noop_when_already_parallel(spark):
    df = spark.range(0, 1000)
    out = spread_input(df, est_partitions=1 << 20)
    assert out is df


def test_spread_floor_short_circuits_before_rdd(spark, tmp_path, monkeypatch):
    """Under-floor inputs return unchanged WITHOUT paying the RDD
    conversion — the floor gate must use Catalyst stats only."""
    p = str(tmp_path / "tiny.parquet")
    spark.range(0, 100).selectExpr("id", "id * 3 AS v").write.parquet(p)
    df = spark.read.parquet(p)

    def _boom(self):
        raise AssertionError("floor path must not convert to RDD")

    monkeypatch.setattr(pyspark.sql.DataFrame, "rdd",
                        property(_boom), raising=True)
    out = spread_input(df, min_bytes=1 << 30)
    assert out is df


def test_spread_env_off(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SPREAD", "off")
    df = spark.range(0, 10)
    assert spread_input(df, est_partitions=1, min_bytes=0) is df


def test_spread_hint_avoids_all_plan_introspection(spark, monkeypatch):
    """With a caller-supplied input_bytes hint the decision must touch
    NEITHER Catalyst stats NOR the RDD conversion (zero py4j beyond the
    cached conf lookups)."""
    import greenmask_spark.session as sess

    # warm the per-session conf/parallelism caches so the hinted path
    # is introspection-free afterwards
    sess._scan_confs(spark)
    target = spark.sparkContext.defaultParallelism
    sess._PARALLELISM_CACHE[id(spark)] = target

    df = spark.range(0, 1000).selectExpr("id", "id * 2 AS v")

    def _boom(self):
        raise AssertionError("hinted path must not touch the JVM plan")

    class _BoomJdf:
        def __getattr__(self, name):
            raise AssertionError("hinted path must not touch the JVM plan")

    monkeypatch.setattr(pyspark.sql.DataFrame, "rdd",
                        property(_boom), raising=True)
    df._jdf = _BoomJdf()  # instance attr — any JVM-plan access raises
    # under floor: untouched
    assert spread_input(df, min_bytes=1 << 20, input_bytes=1024) is df
    # over floor, under-parallel: spreads (repartition itself is
    # allowed to build plan nodes — use an unbroken frame)
    monkeypatch.undo()
    fresh = spark.range(0, 1000).selectExpr("id", "id * 2 AS v")
    out = spread_input(fresh, min_bytes=0, input_bytes=1 << 20)
    assert _has_spread_exchange(out)


def test_keep_scan_hint_carries_bytes(spark):
    from greenmask_spark.session import keep_scan_hint

    df = spark.range(0, 10)
    df._graft_scan_bytes = 12345
    derived = df.selectExpr("id", "id AS j")
    assert getattr(derived, "_graft_scan_bytes", None) is None
    out = keep_scan_hint(derived, df)
    assert out._graft_scan_bytes == 12345


def _cache_entry_loaded(spark, df):
    """(found, loaded): whether the frame's plan has a cache-manager
    entry, and whether that entry's column buffers are materialized."""
    cm = spark._jsparkSession.sharedState().cacheManager()
    opt = cm.lookupCachedData(df._jdf)  # Dataset overload
    if opt.isEmpty():
        return False, False
    rep = opt.get().cachedRepresentation()
    return True, rep.cacheBuilder().isCachedColumnBuffersLoaded()


def test_share_subtree_never_reuses_previous_calls_cache(spark):
    """The one-live-handle-per-key contract: registering call 2's frame
    unpersists call 1's FIRST, so call 2 starts from an unmaterialized
    entry and recomputes from its inputs — no later action can read an
    earlier call's materialized partitions (the no-result-caching
    rule). Order matters: persist() over a still-registered plan-equal
    entry would silently adopt its data."""
    from greenmask_spark.session import _SUBTREE_HANDLES, share_subtree

    def build():
        return spark.range(0, 100).selectExpr("id", "id * 7 AS v")

    a = share_subtree(build(), "test.sub")
    a.count()                      # materialize call 1
    found, loaded = _cache_entry_loaded(spark, a)
    assert found and loaded
    b = share_subtree(build(), "test.sub")
    # the (plan-equal) entry now live is call 2's FRESH one: present
    # but with no materialized buffers — call 1's data is gone
    found, loaded = _cache_entry_loaded(spark, b)
    assert found and not loaded
    assert _SUBTREE_HANDLES["test.sub"] is b
    assert b.count() == 100        # recomputes from inputs
    # cleanup so no handle outlives the test
    b.unpersist(False)
    _SUBTREE_HANDLES.pop("test.sub", None)
