"""SparkSession construction with scale-oriented defaults.

The reference parallelizes with a worker pool over whole tables
(internal/db/postgres/cmd/dump.go:253-268) and has no intra-table
parallelism; here Spark owns all parallelism and we tune the session for
the shuffle/AQE behavior we want at cluster scale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Configs that matter at 100 TB just as much as on local[32]:
#: - AQE coalesces post-shuffle partitions and splits skewed ones at runtime,
#:   so a fixed shuffle.partitions number doesn't have to be exactly right.
#: - Arrow batching keeps the (rare) pandas-UDF path amortized.
#: - maxPartitionBytes keeps scan partitions memory-sized.
DEFAULT_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.files.maxPartitionBytes": "128m",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.sql.parquet.filterPushdown": "true",
    # driver testdata events.ts is TIMESTAMP(NANOS); read as long + convert
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.driver.memory": "8g",
    "spark.ui.enabled": "false",
}


def get_spark(app_name: str = "greenmask-spark", **extra_confs: str) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    # local-mode heap = the whole unified memory pool; the sf10+ scale
    # sweeps need more than the 8g default (on a cluster this is just
    # spark.executor.memory, so an env knob is the honest local analog)
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    confs = {**DEFAULT_CONFS, **({"spark.driver.memory": mem} if mem else {})}
    builder = SparkSession.builder.appName(app_name).master(f"local[{cpus}]")
    for k, v in {**confs, **extra_confs}.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load the driver-generated parquet tables as DataFrames.

    Columnar parquet scan with pushdown enabled — filters and projections
    declared downstream reach the footer (check .explain for PushedFilters
    / ReadSchema).
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    # The driver may hand us a session built without our defaults; the
    # nanos-timestamp conf is runtime-settable, so set it defensively
    # (events.parquet is TIMESTAMP(NANOS) and unreadable otherwise).
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # keep the NTZ→TIMESTAMP cast below a wall-clock identity even on a
        # session built without our defaults
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass

    out = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            if name == "events" and isinstance(
                df.schema["ts"].dataType, T.LongType
            ):
                # nanos-as-long → microsecond timestamp (matches DuckDB's
                # ns→µs truncation of the same file)
                # integer `div`, not `/`: ns epochs overflow double mantissa
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
            if name == "events" and isinstance(
                df.schema["ts"].dataType, T.TimestampNTZType
            ):
                # micros-without-UTC-adjustment parquet reads as NTZ; with the
                # session pinned to UTC this cast is wall-clock-identity and
                # restores TIMESTAMP for event-time ops (withWatermark and
                # unix_micros reject NTZ)
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
            out[name] = df
    return out
