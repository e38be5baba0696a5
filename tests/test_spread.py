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
