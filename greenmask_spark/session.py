"""SparkSession construction with scale-oriented defaults.

The reference parallelizes with a worker pool over whole tables
(internal/db/postgres/cmd/dump.go:253-268) and has no intra-table
parallelism; here Spark owns all parallelism and we tune the session for
the shuffle/AQE behavior we want at cluster scale.
"""

from __future__ import annotations

import glob
import math
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


def _size_conf_bytes(spark: SparkSession, key: str, default: int) -> int:
    """Parse a Spark size conf ('128m', '1g', plain bytes) to bytes."""
    try:
        raw = str(spark.conf.get(key)).strip().lower()
    except Exception:
        return default
    units = {"k": 1024, "m": 1024**2, "g": 1024**3, "t": 1024**4}
    try:
        if raw and raw[-1] == "b" and len(raw) > 1 and raw[-2] in units:
            raw = raw[:-1]
        if raw and raw[-1] in units:
            return int(float(raw[:-1]) * units[raw[-1]])
        return int(raw)
    except Exception:
        return default


#: below this input size the spread exchange costs more in task
#: scheduling than the single-task scan it fixes (dimension tables,
#: 1-row stats frames) — measured locally, irrelevant at scale where
#: the spread never fires at all
_SPREAD_MIN_BYTES = 64 * 1024


def _path_bytes(path: str) -> int:
    """Total data bytes of a parquet file/directory (driver-side file
    listing, no Spark involved) — the cheap input-size estimate
    ``load_tables`` attaches to each frame so ``spread_input`` can make
    its floor/parallelism decision WITHOUT any py4j round-trip."""
    if os.path.isdir(path):
        files = [p for p in glob.glob(os.path.join(path, "**"),
                                      recursive=True)
                 if os.path.isfile(p) and not os.path.basename(p).startswith(("_", "."))]
    else:
        files = [path]
    return sum(os.path.getsize(p) for p in files)


#: per-session cache of (maxPartitionBytes, openCostInBytes): the conf
#: values are fixed for a session, and reading them via spark.conf is a
#: py4j round-trip the hinted spread path exists to avoid
_SCAN_CONF_CACHE: dict[int, tuple[int, int]] = {}


#: per-context cache of defaultParallelism (same rationale)
_PARALLELISM_CACHE: dict[int, int] = {}


def _scan_confs(spark: SparkSession) -> tuple[int, int]:
    key = id(spark)
    got = _SCAN_CONF_CACHE.get(key)
    if got is None:
        got = (
            _size_conf_bytes(spark, "spark.sql.files.maxPartitionBytes",
                             128 * 1024**2),
            _size_conf_bytes(spark, "spark.sql.files.openCostInBytes",
                             4 * 1024**2),
        )
        _SCAN_CONF_CACHE[key] = got
    return got


def est_input_bytes(df: DataFrame) -> int | None:
    """Best-effort input-size estimate for scale gates: the
    load_tables file-size hint when the frame carries one (free),
    else Catalyst's optimized-plan stats (one py4j analysis pass —
    acceptable inside operators whose work dwarfs it), else None
    (callers treat None as 'unknown → take the local-scale path')."""
    b = getattr(df, "_graft_scan_bytes", None)
    if b is not None:
        return int(b)
    try:
        return int(df._jdf.queryExecution().optimizedPlan()
                   .stats().sizeInBytes())
    except Exception:
        return None


#: live handles of share_subtree, at most one per key — see its contract
_SUBTREE_HANDLES: dict[str, DataFrame] = {}


def share_subtree(df: DataFrame, key: str) -> DataFrame:
    """Persist a multiply-consumed subtree for the duration of ONE
    operator call (guide §5): block-manager compute locks make the
    consumers share a single computation instead of each re-executing
    the subtree — the same protection an eager ``localCheckpoint``
    buys, WITHOUT paying full physical planning (and possibly a
    dedicated job) at plan-build time, which is what
    ``Dataset.checkpoint`` does even for ``eager=False``.

    Lifetime contract (the no-result-caching rule): at most ONE live
    handle exists per key. Registering a new frame under a key FIRST
    unpersists the previous one, so by the time any later call of the
    same operator runs an action, the earlier call's materialized
    partitions are gone from the cache manager and the new call
    recomputes from its inputs — order matters, because ``persist()``
    on a plan that canonicalized-equals a still-registered entry would
    silently adopt that entry's data. The last handle of a session
    stays registered (lazily persisted, typically sliver-sized) until
    the next call or session teardown; it is never readable by any
    other plan shape.

    Use for subtrees that are (a) consumed more than once inside one
    returned plan and (b) expensive relative to their size (a corpus
    pass producing a sliver). Callers that can run actions internally
    should keep the persist+unpersist-in-call pattern instead (HITS).
    """
    from pyspark import StorageLevel

    old = _SUBTREE_HANDLES.pop(key, None)
    if old is not None:
        try:
            old.unpersist(False)
        except Exception:
            pass
    try:
        handle = df.persist(StorageLevel.MEMORY_AND_DISK)
    except Exception:
        # already pinned by the caller at another level — the sharing
        # this helper exists for is in place; leave its lifetime to
        # whoever pinned it
        return df
    _SUBTREE_HANDLES[key] = handle
    return handle


def keep_scan_hint(derived: DataFrame, src: DataFrame) -> DataFrame:
    """Carry ``src``'s load_tables size hint onto a derived frame
    (DataFrame transformations return new objects, dropping the
    attribute). INVARIANT: only use across DETERMINISTIC derivations
    that keep the frame ~scan-sized (added column copies, projections,
    filters) — the hint feeds (a) spread_input's floor/parallelism
    estimate and (b) plan_has_nondeterministic's fast path, which
    treats a hinted frame as a deterministic scan+projection chain."""
    b = getattr(src, "_graft_scan_bytes", None)
    if b is not None:
        derived._graft_scan_bytes = b
    return derived


def spread_input(
    df: DataFrame,
    est_partitions: int | None = None,
    min_bytes: int = _SPREAD_MIN_BYTES,
    input_bytes: int | None = None,
) -> DataFrame:
    """Input-size-ADAPTIVE parallelizing repartition (guide §2: derive
    partitioning from input size, never a constant tuned for one mode).

    ``min_bytes`` is the tiny-input floor: inputs estimated under it
    are left alone (the exchange costs more than the single-task pass
    it parallelizes). ``input_bytes`` is an optional caller-known size
    (file bytes of the scan behind ``df``) that replaces BOTH
    plan-introspection fallbacks below — with it the decision costs no
    py4j round-trip at all. Callers whose per-row work is LIGHTER than the
    text/Arrow kernels the default floor was measured on (e.g. the
    transformer masking chain: a handful of hash/regex expressions per
    row) pass a larger floor — below ~1 MB of input such a chain
    finishes on one core faster than the spread exchange round-trips.
    Irrelevant at scale: every floor is dwarfed by any real table, so
    the spread never fires there either way.

    A small table is one parquet row group → ONE scan task, so every
    downstream per-row transform (sha256 masking chains, regex text
    stats, Arrow-batch kernels) runs single-threaded no matter how many
    cores the session has. When the estimated scan-split count is below
    the session's default parallelism, hash-repartition up to it; when
    the input already yields >= parallelism splits (any real-scale
    table), this is a NO-OP — the exchange does not exist on a cluster,
    so it can never move 100 TB. Set SPARK_GRAFT_SPREAD=off to disable.

    The spread key is ``monotonically_increasing_id()`` (deterministic
    per task attempt: partition index + in-partition row order, both
    fixed for a deterministic scan — the SPARK-38388 retry hazard only
    applies to rand-derived keys), NOT keyless round-robin: a keyless
    ``repartition(n)`` first pays a full LOCAL SORT of its input
    (``spark.sql.execution.sortBeforeRepartition``, guide §2.5), which
    A/B measures put at ~2x the total spread overhead on scan+join
    queries. Sequential ids hash evenly, so the spread is skew-free.

    Value-neutral by repo contract: every operator is partitioning-
    independent (the integer-exactness discipline), which the oracle
    gate re-proves over the spread plans.
    """
    from pyspark.sql import functions as F

    if os.environ.get("SPARK_GRAFT_SPREAD", "auto") == "off":
        return df
    spark = df.sparkSession
    # defaultParallelism is fixed for a context — cache it next to the
    # scan confs so the hinted path stays py4j-free after first use
    key = id(spark)
    target = _PARALLELISM_CACHE.get(key)
    if target is None:
        target = spark.sparkContext.defaultParallelism
        _PARALLELISM_CACHE[key] = target
    if est_partitions is None and input_bytes is not None:
        # caller-supplied size hint (load_tables attaches the scan's
        # file bytes as ``_graft_scan_bytes``): the whole floor +
        # split-count decision runs on driver-local integers — zero
        # py4j round-trips, which on the light transformer masking
        # chains was the single largest per-call cost the r13 verdict
        # flagged (the stats() analysis pass below).
        if input_bytes < min_bytes:
            return df
        mpb, _open_cost = _scan_confs(spark)
        est_partitions = max(1, math.ceil(input_bytes / max(mpb, 1)))
    if est_partitions is None:
        try:
            # the same tiny-input floor the path-based estimate has:
            # Catalyst's own size estimate (file bytes for a scan,
            # propagated through projections) — a dimension-sized
            # frame is cheaper as one task than as a session's worth
            # of near-empty ones. Checked BEFORE the RDD conversion
            # below: optimizedPlan().stats() is one analysis pass,
            # while df.rdd forces FULL physical planning + RDD DAG
            # conversion that is then thrown away — measured at
            # ~+0.15 s per call on the light transformer chains whose
            # input sits under the floor (the check cost exceeded the
            # work it was gating).
            size = int(df._jdf.queryExecution().optimizedPlan()
                       .stats().sizeInBytes())
            if size < min_bytes:
                return df
        except Exception:
            pass
        try:
            est_partitions = df.rdd.getNumPartitions()
        except Exception:
            return df
    if est_partitions >= target:
        return df
    return df.repartition(target, F.monotonically_increasing_id())


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
            # per-session cache of loaded table FRAMES. A DataFrame is
            # a lazy plan handle, not data: caching it skips the
            # repeated spark.read.parquet footer/schema round-trips
            # every operator build pays (~0.2 s per call locally — the
            # largest constant in light queries' plan-build time);
            # every ACTION on the frame still scans the parquet files
            # from disk. Stored ON the session object (dies with it)
            # and keyed on (path, mtime, size) so regenerated testdata
            # invalidates; nothing about query RESULTS is ever stored.
            cache = getattr(spark, "_graft_table_cache", None)
            if cache is None:
                cache = {}
                try:
                    spark._graft_table_cache = cache
                except Exception:
                    pass
            st = os.stat(path)
            ck = (path, st.st_mtime_ns, st.st_size)
            cached = cache.get(ck)
            if cached is not None:
                out[name] = cached
                continue
            # NO blanket spread here: a parallelizing exchange only
            # pays for itself above heavy per-row compute, so the
            # operators that own such compute (masking chains, text
            # stats, Arrow kernels) call spread_input themselves —
            # A/B sweeps showed the blanket form taxing every pure
            # scan+join/agg query (q1/q3/q5, sketch probes, window
            # rows) ~0.2-0.5 s each for no benefit
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
            # size hint for spread_input: the scan's file bytes, known
            # here for free — downstream spreads (the transformer
            # masking chain) pass it through so their floor/parallelism
            # decision never pays a per-call py4j stats round-trip
            try:
                df._graft_scan_bytes = _path_bytes(path)
            except OSError:
                pass
            cache[ck] = df
            out[name] = df
    return out
