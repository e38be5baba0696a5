"""Structured Streaming surface.

The reference is snapshot-only (REPEATABLE READ dump — SURVEY §2.9:
no watermarks, no event-time windows); parity does not require streaming.
This module is the Spark-native extension: the SAME TablePlan expression
chains apply unchanged to streaming DataFrames (Column expressions are
execution-mode agnostic), so a masking config written for batch dumps
anonymizes a live stream too.

Scale notes: watermarking bounds state; windowed aggregation state lives
in the state store keyed by (window, group) — size the watermark to the
real out-of-orderness, not to taste.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from greenmask_spark.plan.planner import TablePlan, apply_plan


def masked_stream(stream_df: DataFrame, plan: TablePlan) -> DataFrame:
    """Apply a batch masking plan to a streaming DataFrame.

    Pure-expression plans transfer as-is. Table-level (mapInPandas) steps
    also work on streams, but limit/subset conds are batch-only concepts
    and are rejected here."""
    if plan.limit is not None:
        raise ValueError("rows_limit is a batch (validate-mode) concept")
    return apply_plan(stream_df, plan)


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    group_col: str = "event_type",
) -> DataFrame:
    """Event-time windowed counts with late-data handling.

    Works on both batch and streaming inputs (batch ignores the watermark,
    which lets the DuckDB oracle check the same aggregation logic)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    w = F.window(F.col(ts_col), window, slide or window)
    return (
        df.groupBy(w.alias("w"), F.col(group_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            group_col,
            "n_events",
            "sum_value",
        )
    )


def stream_events_from_dir(
    spark,
    path: str,
    schema,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source stream over a directory of parquet drops."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )
