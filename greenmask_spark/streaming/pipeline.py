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


def _tz_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """withWatermark / event-time state require TIMESTAMP; a NTZ event-time
    column (parquet micros without UTC adjustment) casts over — wall-clock
    identity under a fixed session timezone."""
    from pyspark.sql import types as T

    if isinstance(df.schema[ts_col].dataType, T.TimestampNTZType):
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


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
    df = _tz_event_time(events, ts_col)
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


def dedup_stream(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup for ingestion pipelines: keep the first
    arrival per key within the watermark horizon.

    ``dropDuplicates`` on a watermarked stream is Spark's bounded-state
    dedup — state holds one entry per distinct key seen inside the
    horizon and is evicted as the watermark advances, so an unbounded
    stream runs in bounded memory (the batch analog is dedup_exact's
    groupBy). On batch input the watermark is a no-op and this is plain
    dropDuplicates over the keys."""
    df = _tz_event_time(events, ts_col)
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
        return df.dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


#: sessionization output shape shared by the batch and stateful-stream paths
_SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, sum_value double"
)


def sessionize_batch(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Gap-based sessions over a batch table — the oracle-checkable twin
    of ``sessionize_stream`` (identical output on the same input).

    Classic two-window plan: lag() marks a session break when the gap to
    the previous event exceeds ``gap_minutes``; a running sum of break
    flags numbers the sessions; then one groupBy. Both windows and the
    aggregation share the same hash partitioning on ``user_col``, so the
    whole thing is ONE shuffle (AQE reuses the exchange)."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    # interval comparison works on both TIMESTAMP and TIMESTAMP_NTZ columns
    # (unix_micros rejects NTZ, and an NTZ→TZ cast would shift across DST);
    # microsecond resolution so fractional gap_minutes (0.5 = 30s) is honored
    gap = F.expr(f"INTERVAL {int(round(gap_minutes * 60_000_000))} MICROSECOND")
    brk = F.when(
        prev.isNull() | ((F.col(ts_col) - prev) > gap),
        F.lit(1),
    ).otherwise(F.lit(0))
    sess = events.withColumn("__sess", F.sum(brk).over(w))
    return (
        sess.groupBy(F.col(user_col).alias("user_id"), F.col("__sess"))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            # decimal-space sum → exact, engine-independent (same pattern as
            # windowed_event_counts; a double sum's last ulp is order-dependent)
            F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double")
            .alias("sum_value"),
        )
        .drop("__sess")
    )


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Custom stateful streaming operator: gap-based sessionization via
    ``applyInPandasWithState`` (the Spark-native arbitrary-state API).

    Per-user state holds the open session (start, last_ts, count, sum);
    each micro-batch folds its (time-sorted) events in, emitting a closed
    session whenever a gap exceeds ``gap_minutes``; an event-time timeout
    flushes the final session once the watermark passes last_ts + gap.
    State is bounded: one open session per active user, regardless of
    stream length — the watermark is what makes 100 TB/day sustainable.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60_000_000

    def fold(key, pdfs, state: GroupState):
        import pandas as pd

        (user,) = key

        def emit(sessions):
            return pd.DataFrame({
                "user_id": [user] * len(sessions),
                "session_start": [pd.Timestamp(s, unit="us") for s, *_ in sessions],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, *_ in sessions],
                "n_events": [n for *_, n, _sv in sessions],
                "sum_value": [round(sv, 2) for *_, sv in sessions],
            })

        if state.hasTimedOut:
            closed = [tuple(state.get)]
            state.remove()
            yield emit(closed)
            return

        rows = pd.concat(list(pdfs)).sort_values(ts_col)
        # normalize to ns then µs ints — robust to datetime64[us] frames
        ts_us = (
            rows[ts_col].astype("datetime64[ns]").astype("int64") // 1_000
        ).to_numpy()
        vals = rows[value_col].to_numpy()
        if state.exists:
            start_us, last_us, n, sv = state.get
        else:
            start_us, last_us, n, sv = 0, 0, 0, 0.0
        closed = []
        for t, v in zip(ts_us, vals):
            t = int(t)
            if n and t - last_us > gap_us:
                closed.append((start_us, last_us, n, sv))
                n, sv = 0, 0.0
            if n == 0:
                start_us, last_us = t, t
            start_us = min(start_us, t)
            last_us = max(last_us, t)
            n += 1
            sv += float(v)
        state.update((start_us, last_us, n, sv))
        state.setTimeoutTimestamp((last_us + gap_us) // 1_000)
        if closed:
            yield emit(closed)

    return (
        _tz_event_time(events, ts_col).withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            fold,
            outputStructType=_SESSION_SCHEMA,
            stateStructType="start_us long, last_us long, n long, sv double",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
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


def near_dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
    num_perm: int = 16,
    k: int = 5,
) -> DataFrame:
    """Streaming near-duplicate suppression: drop documents whose FULL
    MinHash signature matches one already seen inside the watermark
    horizon (signature-identical ≈ very-high-Jaccard near-dup — the
    streaming tier of the batch MinHash pipeline, which can afford
    banded candidate generation + verification; cross-batch LSH band
    state would need a per-band keyed state plus a per-doc vote, i.e.
    two chained stateful operators — the signature-exact form gives
    bounded one-op state with the same "drop the obvious near-dup at
    ingestion" role).

    State is one (signature, ts) entry per distinct signature inside the
    horizon, evicted as the watermark advances. On batch input this is a
    plain signature dedup (watermark no-op)."""
    from greenmask_spark.functions.dedup import (
        _shingle_hash,
        minhash_signature_from_hashes,
        shingles,
    )

    # stage the hashed-shingle array in its own projection so the
    # num_perm array_mins reference materialized hashes — the plain
    # minhash_signature expression duplicates the sha256 subtree into
    # every permutation (num_perm x recompute per record, the interpreted
    # hot path this repo's own measurements flag)
    staged = docs.withColumn(
        "__hs", F.transform(shingles(F.col(text_col), k), _shingle_hash)
    )
    sig = F.concat_ws(
        "_",
        F.transform(
            minhash_signature_from_hashes(F.col("__hs"), num_perm),
            lambda x: x.cast("string"),
        ),
    )
    staged = staged.withColumn("__sig", sig).drop("__hs")
    return dedup_stream(staged, ["__sig"], ts_col, watermark).drop("__sig")


def quota_stream(
    events: DataFrame,
    group_col: str,
    max_per_group: int,
    key_col: str = "event_id",
) -> DataFrame:
    """Streaming per-group quota — the ingestion tier of
    ``functions.web.cap_per_domain``: admit at most ``max_per_group``
    rows per ``group_col`` value over the stream's LIFETIME. The batch
    cap selects by salted-hash rank (reproducible offline, order-free);
    an online admission decision can only be causal, so the stream
    admits FIRST ARRIVALS. Admission COUNT per group is exact across
    any replay; WHICH rows win a quota boundary falling mid-micro-batch
    is only reproducible when each group's rows arrive from one input
    partition per batch — after the groupBy shuffle, within-group order
    across multiple source partitions follows fetch order, which Spark
    does not fix (sort upstream, or accept count-exactness — the usual
    quota contract). On batch
    input this degrades to the batch cap's hash-rank selection
    (``cap_per_domain``) — first-arrival is meaningless without a
    stream clock, and the hash rank is the reproducible offline twin.

    State per group is ONE long (admitted count), ``NoTimeout``: a
    quota is a lifetime budget, so the store is bounded by group
    CARDINALITY (8 bytes a domain), not stream length — the same
    bounded-state contract as ``dedup_stream``'s watermark horizon,
    with cardinality instead of time as the bound. NULL groups pool
    into one quota bucket (pandas groupby on the state key — matching
    the batch cap's null-safe bucket)."""
    if int(max_per_group) < 1:
        raise ValueError(f"max_per_group={max_per_group} must be >= 1")
    if not events.isStreaming:
        from greenmask_spark.functions.web import cap_per_domain

        return cap_per_domain(
            events, int(max_per_group),
            domain_col=group_col, key_col=key_col,
        )
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    n_max = int(max_per_group)
    out_schema = events.schema

    def admit(key, pdfs, state: GroupState):
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            if n >= n_max:
                continue
            take = pdf.iloc[: n_max - n]
            n += len(take)
            if len(take):
                yield take
        state.update((n,))

    return (
        events.groupBy(group_col)
        .applyInPandasWithState(
            admit,
            outputStructType=out_schema,
            stateStructType="n long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def dedup_stream_against(
    docs: DataFrame,
    reference: DataFrame,
    text_col: str = "text",
    level: str = "exact",
    num_perm: int = 16,
    k: int = 5,
) -> DataFrame:
    """Streaming incremental dedup against a STATIC reference corpus —
    the ingestion tier of ``functions.dedup.dedup_against`` (the
    rolling-crawl shape: the reference is keyed once with
    ``prepare_reference``, written to parquet, and every arriving
    micro-batch anti-joins it; raw reference frames work too).
    Stream-static ``left_anti`` needs NO state store: the reference
    side is a plain (re-broadcastable) scan, so an unbounded stream
    dedups against a trillion-doc reference in bounded memory.

    - ``level="exact"``: content-digest anti-join (the batch path's
      semantics, verbatim).
    - ``level="fuzzy"``: FULL-signature match — a document whose
      MinHash signature equals a reference document's is dropped
      (signature-identical ≈ very-high-Jaccard; the same bounded
      tier rationale as ``near_dedup_stream`` — banded candidates +
      Jaccard verification need stream-side aggregation and stay a
      batch concern). The signature is a pure projection (staged
      hashed-shingle array, no aggregation), so the plan stays a
      stateless map + one anti-join. num_perm/k must match a
      prepared reference (validated, like the batch path).
    """
    from greenmask_spark.functions.dedup import (
        _shingle_hash,
        _validate_prepared,
        minhash_signature_from_hashes,
        shingles,
    )

    t = F.col(text_col)
    if level == "exact":
        if "__ref_key" in reference.columns:
            keys = reference.select("__ref_key")
        else:
            keys = reference.select(
                F.sha2(t, 256).alias("__ref_key")
            ).distinct()
        return docs.join(
            keys, F.sha2(t, 256) == F.col("__ref_key"), "left_anti"
        )
    if level != "fuzzy":
        raise ValueError(f"level {level!r}: exact|fuzzy")

    def sig_str(sig_col):
        return F.concat_ws(
            "_", F.transform(sig_col, lambda x: x.cast("string"))
        )

    if "__ref_sig" in reference.columns:
        _validate_prepared(reference, num_perm, k)
        ref_sigs = reference.select(
            sig_str(F.col("__ref_sig")).alias("__rsig")
        ).distinct()
    else:
        staged_ref = reference.filter(t.isNotNull()).withColumn(
            "__hs", F.transform(shingles(t, k), _shingle_hash)
        )
        ref_sigs = staged_ref.select(
            sig_str(
                minhash_signature_from_hashes(F.col("__hs"), num_perm)
            ).alias("__rsig")
        ).distinct()
    # staged hashes: the plain minhash_signature expression would
    # recompute the sha256 subtree once per permutation (see
    # near_dedup_stream)
    staged = docs.withColumn(
        "__hs", F.transform(shingles(t, k), _shingle_hash)
    ).withColumn(
        "__sig",
        sig_str(minhash_signature_from_hashes(F.col("__hs"), num_perm)),
    ).drop("__hs")
    return staged.join(
        ref_sigs, F.col("__sig") == F.col("__rsig"), "left_anti"
    ).drop("__sig")


def sketch_stream(
    stream_df: DataFrame,
    build,
    state_dir: str,
    query_name: str = "sketch_stream",
    checkpoint_dir: str | None = None,
):
    """Maintain a mergeable sketch (functions/sketches: Bloom words,
    Count-Min cells, HLL registers) over an unbounded stream: each
    micro-batch's sketch lands under ``state_dir/batch=<id>`` and
    ``merged_sketch`` folds the batches on read.

    The write is keyed by Structured Streaming's batch id and OVERWRITES
    its own directory, so a replayed batch (at-least-once restart)
    rewrites the same path with the same deterministic content —
    idempotent, giving exactly-once SKETCH state with a plain parquet
    sink, no transactional store. This is why the per-batch layout
    beats merging into one running sketch file inside foreachBatch:
    a replay there would double-merge, which Bloom (bit_or) and HLL
    (max) absorb but Count-Min (sum) does NOT.

    The idempotence claim rests on STABLE batch ids, which Structured
    Streaming only guarantees through a durable checkpoint — so the
    checkpoint defaults to ``state_dir/_checkpoint`` rather than
    Spark's temp-dir default (a restart without a checkpoint would
    renumber batches from 0 and re-ingest, double-counting Count-Min
    state). Pass ``checkpoint_dir`` to relocate it.

    ``build`` maps a static batch DataFrame to its sketch frame (e.g.
    ``lambda b: hll_registers(b, "user", p=10)``). Returns the started
    StreamingQuery; sizing/p/depth params are closed over — the same
    contract discipline as the batch mergers."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        # stage-and-rename publication: mode("overwrite") on the live
        # path would DELETE the directory first, so a concurrent
        # merged_sketch glob could hit missing files mid-commit (not
        # just read a partial batch). Writing to _staging and renaming
        # makes the batch appear atomically on filesystems with atomic
        # directory rename (local/HDFS; object stores degrade to a
        # fast copy window — still strictly narrower than the
        # delete-then-write window). Replays stay idempotent: the
        # stale target is removed only after its replacement is fully
        # written.
        sketch = build(batch_df)
        spark = batch_df.sparkSession
        jvm = spark._jvm
        staging = f"{state_dir}/_staging/batch={batch_id}"
        final = f"{state_dir}/batch={batch_id}"
        sketch.write.mode("overwrite").parquet(staging)
        src = jvm.org.apache.hadoop.fs.Path(staging)
        dst = jvm.org.apache.hadoop.fs.Path(final)
        fs = dst.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(dst):
            fs.delete(dst, True)
        # Hadoop FileSystem.rename signals most failures by returning
        # false, not raising — swallowing it would leave the batch in
        # _staging (merged_sketch permanently undercounts; on a replay
        # the stale target was already deleted above). Raising makes
        # the foreachBatch fail so structured streaming retries.
        if not fs.rename(src, dst):
            raise IOError(
                f"atomic publish failed: rename {staging} -> {final} "
                f"returned false"
            )

    return (
        stream_df.writeStream.foreachBatch(_write)
        .queryName(query_name)
        .outputMode("update")
        .option(
            "checkpointLocation",
            checkpoint_dir or f"{state_dir}/_checkpoint",
        )
        .start()
    )


def merged_sketch(spark, state_dir: str, merge) -> DataFrame:
    """Fold every per-batch sketch under ``state_dir`` with the
    family's merger (bloom_merge / cms_merge / hll_merge /
    histogram_merge) — one sketch-sized shuffle however many batches
    have accumulated. All batches read as ONE glob'd scan (the merge
    is a re-aggregate, so a single union'd frame is equivalent to
    merging frame-by-frame), through the same Hadoop filesystem layer
    the writes use — state on s3a/abfss/hdfs works, not just local
    paths. A maintenance job can periodically compact old batches
    into one (the merge is associative).

    Concurrency: ``sketch_stream`` publishes each batch by writing to
    ``_staging`` and RENAMING into place (underscore-prefixed, so this
    glob never sees half-written files), which removes the old
    delete-then-rewrite failure mode where a concurrent read could
    fail outright on missing files mid-commit. What remains is the
    narrow replace window on a REPLAYED batch id (delete stale target
    + rename): a read landing exactly there can miss that one batch's
    rows — undercounting it until the rename lands, never erroring on
    a partially written file. Read between triggers or after the
    query stops for exact results."""
    from pyspark.errors import AnalysisException

    try:
        frames = spark.read.parquet(f"{state_dir}/batch=*")
    except AnalysisException as e:
        raise ValueError(f"no sketch batches under {state_dir}") from e
    return merge(frames.drop("batch"))


def windowed_distinct_stream(
    stream_df: DataFrame,
    ts_col: str,
    value_col: str,
    window: str = "6 hours",
    watermark: str = "1 hour",
    p: int = 10,
) -> DataFrame:
    """Approximate distinct values per event-time window on a STREAM —
    the canonical streaming-sketch application ("distinct users per
    hour", live): HLL register rows maintained as a watermarked
    (window, bucket) → max-rho aggregation. State is bounded at ≤ 2^p
    rows per open window regardless of event volume (a distinct-count
    via dropDuplicates would hold every value in state), and max is
    insensitive to replays. Emits (window_start, window_end, bucket,
    register); fold finished windows with
    ``functions.sketches.hll_estimate_col`` — e.g. the batch twin
    ``windowed_distinct`` runs the same aggregation + estimate in one
    query (two stacked streaming aggs are unsupported, so the estimate
    stage runs over the sink)."""
    from greenmask_spark.functions.sketches import hll_bucket_rho

    win = F.window(F.col(ts_col), window).alias("__w")
    regs = (
        hll_bucket_rho(
            _tz_event_time(stream_df, ts_col).withWatermark(
                ts_col, watermark
            ),
            value_col, p,
            keep=[win],
        )
        .groupBy("__w", "bucket")
        .agg(F.max("_rho").alias("register"))
    )
    return regs.select(
        F.col("__w.start").alias("window_start"),
        F.col("__w.end").alias("window_end"),
        "bucket", "register",
    )
