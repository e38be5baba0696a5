"""Mergeable corpus sketches: Bloom-filter membership, Count-Min term
frequency, HyperLogLog cardinality — the fixed-memory approximate-
statistics tier a 100 TB pipeline runs where the exact structures no
longer fit (a seen-URL set of 100 B crawl records, a per-term count
table over an open vocabulary, a distinct-user count across shards).

Design rule (same as the n-gram LM and the PQ codebooks): **a sketch IS
a small DataFrame.** Build it with ONE map-side-combined aggregation
over the corpus, persist it as parquet, merge sketches across shards /
crawls with a plain union + re-aggregate (bit_or / sum / max — all
partial-aggregable, so merging N shard sketches is one tiny shuffle of
sketch rows, never corpus rows), and broadcast it at query time.

Hashes are the portable sha256-slice family shared with the MinHash /
dedup modules (dedup.py `_shingle_hash`), so every sketch replays
bit-for-bit in ANSI SQL — no engine-private hash (xxhash64, murmur)
leaks into a persisted artifact that a different engine might later
read. Bits pack 32 per bigint word: both Spark and DuckDB overflow a
signed ``1 << 63``, and 32-bit masks keep every intermediate positive
in both engines.

Scale shapes:
- ``bloom_build``: one shuffle of (word_idx, mask) int pairs, bit_or
  map-side combined; output ≤ num_bits/32 rows regardless of input.
- ``bloom_contains``: ZERO shuffle on the probe side — k broadcast
  left joins + pure expressions, so it runs unchanged on a streaming
  DataFrame (stateless; no watermark, no state store).
- ``cms_build``: one shuffle of (row_idx, bucket, weight), sum
  map-side combined; output ≤ depth×width rows.
- ``hll_registers``: one shuffle of (bucket, rho) int pairs, max
  map-side combined; output ≤ 2^p rows.
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits packed per bigint word — 32, NOT 64: ``1 << 63`` overflows a
#: signed bigint in both Spark and DuckDB, and 32-bit masks keep every
#: word/mask value positive (no sign-extension surprises in bit_or/&).
BITS_PER_WORD = 32


def keyed_hash(col: Column, seed: int) -> Column:
    """Portable 60-bit non-negative hash of ``col`` under ``seed``:
    sha256 of ``value:seed``, first 15 hex digits as bigint. The exact
    DuckDB twin is
    ``CAST(('0x' || substr(sha256(concat_ws(':', v, 'seed')), 1, 15)) AS BIGINT)``.
    NULL values hash like concat_ws leaves them: the seed string alone
    (one shared bucket per seed) — deterministic in both engines."""
    payload = F.concat_ws(":", col.cast("string"), F.lit(str(seed)))
    return F.conv(F.substring(F.sha2(payload, 256), 1, 15), 16, 10).cast(
        "bigint"
    )


# ---------------------------------------------------------------- Bloom


def bloom_params(n_items: int, fp_rate: float = 0.01) -> tuple[int, int]:
    """Standard Bloom sizing: (num_bits, num_hashes) for an expected
    ``n_items`` insertions at ``fp_rate`` false-positive probability.
    m = ceil(-n ln p / ln²2), k = round(m/n · ln 2)."""
    if n_items <= 0:
        raise ValueError("n_items must be positive")
    if not (0.0 < fp_rate < 1.0):
        raise ValueError("fp_rate must be in (0, 1)")
    m = math.ceil(-n_items * math.log(fp_rate) / (math.log(2) ** 2))
    k = max(1, round(m / n_items * math.log(2)))
    return m, k


def bloom_build(
    df: DataFrame,
    col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """Bloom filter over ``df[col]`` as a sparse word table
    ``(word_idx bigint, bits bigint)`` — only words with at least one
    set bit appear, so a near-empty filter is near-empty on disk.

    One shuffle: groupBy(word_idx) with bit_or, map-side combined —
    duplicate positions pre-combine inside each task, so the exchange
    carries at most (tasks × live words) int pairs however many corpus
    rows hashed into them."""
    if num_bits < BITS_PER_WORD:
        raise ValueError(f"num_bits must be >= {BITS_PER_WORD}")
    if num_hashes < 1:
        raise ValueError("num_hashes must be >= 1")
    positions = F.array(
        *[
            F.pmod(keyed_hash(F.col(col), i), F.lit(num_bits))
            for i in range(num_hashes)
        ]
    )
    exploded = df.select(F.explode(positions).alias("_pos"))
    return (
        exploded.select(
            F.expr(f"_pos DIV {BITS_PER_WORD}").alias("word_idx"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT),"
                f" CAST(_pos % {BITS_PER_WORD} AS INT))"
            ).alias("_m"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("_m").alias("bits"))
    )


def _merge_sketches(frames, keys: list[str], agg: Column) -> DataFrame:
    """Shared merge shape: union the per-shard sketch frames, then one
    sketch-sized re-aggregate. A SINGLE frame also works (e.g. all
    batches read as one glob'd parquet) — the re-aggregate is the
    merge."""
    if not frames:
        raise ValueError("merge needs at least one sketch")
    return reduce(DataFrame.unionByName, frames).groupBy(*keys).agg(agg)


def bloom_merge(*blooms: DataFrame) -> DataFrame:
    """Union of Bloom filters (same num_bits/num_hashes contract):
    bit_or of word tables. Sketch-sized shuffle only."""
    return _merge_sketches(
        blooms, ["word_idx"], F.bit_or("bits").alias("bits")
    )


def bloom_contains(
    df: DataFrame,
    col: str,
    bloom: DataFrame,
    num_bits: int,
    num_hashes: int,
    out_col: str = "maybe_seen",
) -> DataFrame:
    """Adds boolean ``out_col``: true iff every one of the k hashed bit
    positions of ``df[col]`` is set in ``bloom``. No false negatives:
    an inserted value always tests true; a never-inserted value tests
    true with the sized false-positive probability.

    Scale/streaming shape: k broadcast LEFT joins (the bloom word table
    is ≤ num_bits/32 rows) + pure expressions — the probe side never
    shuffles, so this runs unchanged on a streaming DataFrame with no
    state store. The sketch pins via share_subtree first: it feeds k
    broadcast builds, and un-pinned each would re-run the sketch's
    whole build subtree (k reference scans instead of one). The
    persist's compute locks give the same single build as the r13
    eager localCheckpoint without its build-time physical-planning +
    dedicated-job cost; the sketch build is deterministic (sha256
    hashes + bit_or), so an eviction recomputes identical words."""
    if num_hashes < 1:
        raise ValueError("num_hashes must be >= 1")
    from greenmask_spark.session import share_subtree

    bloom = share_subtree(bloom, "sketches.bloom_probe")
    out = df
    hits = []
    helpers = []
    for i in range(num_hashes):
        p, w, b, m = f"__bl_p{i}", f"__bl_w{i}", f"__bl_b{i}", f"__bl_m{i}"
        out = out.withColumn(
            p, F.pmod(keyed_hash(F.col(col), i), F.lit(num_bits))
        )
        out = out.withColumn(
            m,
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT),"
                f" CAST({p} % {BITS_PER_WORD} AS INT))"
            ),
        )
        side = bloom.select(
            F.col("word_idx").alias(w), F.col("bits").alias(b)
        )
        out = out.join(
            F.broadcast(side),
            F.expr(f"{p} DIV {BITS_PER_WORD}") == F.col(w),
            "left",
        )
        hits.append(
            F.col(b).isNotNull()
            & (F.col(b).bitwiseAND(F.col(m)) != 0)
        )
        helpers += [p, w, b, m]
    out = out.withColumn(out_col, reduce(lambda a, c: a & c, hits))
    return out.drop(*helpers)


def bloom_dedup_against(
    corpus: DataFrame,
    reference: DataFrame,
    text_col: str = "text",
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """Approximate incremental dedup: drop corpus rows whose text
    digest MAY already be in ``reference`` — the crawler seen-set shape
    (CCNet / crawl-frontier style) for when the reference is too large
    to anti-join per shard.

    One-sided error, and on the SAFE side for dedup: a true duplicate
    is always dropped (no false negatives); a novel document is dropped
    with the sized false-positive probability. Contrast with the exact
    ``dedup_against`` (digest anti-join): that shuffles the reference's
    digests every run, this reduces the reference to a bitmap of
    num_bits/8 raw bytes built ONCE (persist it; merge rolling crawls
    with ``bloom_merge``) and broadcast to every shard. Sizing at 10
    bits/key for ~1% FP: a 100 M-document reference is a ~125 MB
    bitmap (vs a ~140 GB/1e9-doc-scaled digest join side per billion);
    a 10 B-document reference is ~12.5 GB — above broadcast range, so
    shard the reference and probe against per-shard blooms, or drop to
    the digest anti-join. The persisted word-table FORM costs about
    num_bits/2 raw bytes (one (word_idx bigint, bits bigint) row —
    16 bytes — per occupied 32-bit word), 4× the raw bitmap; parquet
    delta/RLE encoding recovers most of that overhead on densely
    occupied filters.

    Digest = sha2(text) — byte-identical semantics to dedup_exact /
    dedup_against(level="exact"), so the two paths drop the same true
    duplicates. That includes NULLs: the exact path's equi-join never
    matches a NULL digest, so NULL-text rows are excluded from the
    bloom build and always kept on the corpus side (un-filtered, a
    single NULL-text reference row would make every NULL-text corpus
    row test seen with probability 1 — not the sized FP rate)."""
    digest = F.sha2(F.col(text_col), 256)
    bloom = bloom_build(
        reference.select(digest.alias("__d")).filter(
            F.col("__d").isNotNull()
        ),
        "__d", num_bits, num_hashes,
    )
    tagged = bloom_contains(
        corpus.withColumn("__d", digest),
        "__d",
        bloom,
        num_bits,
        num_hashes,
        out_col="__maybe_seen",
    )
    return tagged.filter(
        F.col("__d").isNull() | ~F.col("__maybe_seen")
    ).drop("__d", "__maybe_seen")


# ------------------------------------------------------------ Count-Min


def cms_build(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 4096,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-Min sketch of ``df[col]`` frequencies (Cormode &
    Muthukrishnan 2005) as ``(row_idx int, bucket bigint, cnt bigint)``
    — ≤ depth×width rows whatever the input cardinality; the
    fixed-memory frequency table for an open vocabulary.

    Point estimates from ``cms_lookup`` are never under the true count
    and overshoot by ≤ 2N/width with probability 1 − 2^−depth. That
    never-undercount guarantee requires non-negative weights, so rows
    with ``weight_col < 0`` are FILTERED OUT (the same enforcement
    ``linkgraph.hits`` applies to edge weights — a silent negative
    would break the ``cms_lookup >= exact`` invariant); NULL weights
    contribute nothing. One shuffle: groupBy(row_idx, bucket) with a
    map-side-combined sum."""
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be positive")
    if weight_col:
        df = df.filter(
            F.col(weight_col).isNull() | (F.col(weight_col) >= 0)
        )
    w = F.col(weight_col).cast("bigint") if weight_col else F.lit(1).cast(
        "bigint"
    )
    positions = F.array(
        *[
            F.pmod(keyed_hash(F.col(col), i), F.lit(width))
            for i in range(depth)
        ]
    )
    return (
        df.select(
            F.posexplode(positions).alias("row_idx", "bucket"),
            w.alias("_w"),
        )
        .groupBy("row_idx", "bucket")
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Sum of Count-Min sketches (same depth/width contract) — per-
    shard sketches combine into the corpus sketch without touching
    corpus rows."""
    return _merge_sketches(
        sketches, ["row_idx", "bucket"], F.sum("cnt").alias("cnt")
    )


def cms_lookup(
    values: DataFrame,
    col: str,
    cms: DataFrame,
    depth: int,
    width: int,
    out_col: str = "est",
) -> DataFrame:
    """Point-frequency estimates for ``values[col]``: min over the
    depth counters each value hashes into. Returns the distinct values
    with ``out_col`` appended. The sketch broadcasts (≤ depth×width
    rows); the only exchange on the probe side is the per-value min,
    map-side combined over depth rows per value."""
    probes = values.select(col).distinct().select(
        F.col(col),
        F.posexplode(
            F.array(
                *[
                    F.pmod(keyed_hash(F.col(col), i), F.lit(width))
                    for i in range(depth)
                ]
            )
        ).alias("row_idx", "bucket"),
    )
    joined = probes.join(F.broadcast(cms), ["row_idx", "bucket"], "left")
    return (
        joined.groupBy(col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias(out_col))
    )


# ---------------------------------------------------------- HyperLogLog


def hll_registers(df: DataFrame, col: str, p: int = 10) -> DataFrame:
    """HyperLogLog registers (Flajolet 2007) over ``df[col]`` as
    ``(bucket int, register int)`` — ≤ 2^p rows; buckets no value
    hashed into are absent (they are register 0 for the estimator).

    bucket = h mod 2^p; register = max over the bucket's values of the
    leading-zero count (+1) of the remaining 60−p hash bits — the
    bit-length route (``length(conv(rem, 10, 2))``) keeps it exact
    integer arithmetic with a 1:1 DuckDB twin (``length(bin(rem))``),
    no float log2 anywhere. One shuffle: groupBy(bucket) with a
    map-side-combined max — at 100 TB each task pre-reduces to ≤ 2^p
    rows before the exchange."""
    if not (4 <= p <= 18):
        raise ValueError("p must be in [4, 18]")
    return (
        hll_bucket_rho(df, col, p)
        .groupBy("bucket")
        .agg(F.max("_rho").alias("register"))
    )


def hll_bucket_rho(df: DataFrame, col: str, p: int,
                   keep: list[Column] | None = None) -> DataFrame:
    """The stateless projection under every HLL variant: per-row
    (bucket, _rho) from the portable hash, plus any ``keep`` columns
    (e.g. an event-time window) — pure expressions, so it runs
    unchanged on a streaming DataFrame."""
    m = 1 << p
    field = 60 - p  # width of the rho field in bits
    hashed = df.select(
        *(keep or []),
        keyed_hash(F.col(col), 0).alias("_h"),
    ).withColumn(
        "bucket", F.pmod("_h", F.lit(m)).cast("int")
    ).withColumn("_rem", F.expr(f"_h DIV {m}"))
    rho = F.when(F.col("_rem") == 0, F.lit(field + 1)).otherwise(
        F.lit(field + 1) - F.length(F.conv(F.col("_rem"), 10, 2))
    )
    return hashed.withColumn("_rho", rho.cast("int")).drop("_h", "_rem")


def hll_merge(*register_frames: DataFrame) -> DataFrame:
    """Union of HLL sketches (same p): per-bucket max of registers."""
    return _merge_sketches(
        register_frames, ["bucket"], F.max("register").alias("register")
    )


def hll_cardinality(registers: DataFrame, p: int) -> float:
    """Distinct-count estimate from a register frame. The aggregate
    collects ONE row (the frame is ≤ 2^p rows — bounded like the other
    metric scalars). Small-range linear counting applies below 2.5·m;
    the 60-bit hash makes the large-range collision correction moot
    below ~2^30 distinct values, which is the honest ceiling of this
    estimator as built. For a distributed, cross-engine-deterministic
    per-group estimate (many windows/sources in one pass), use
    ``hll_estimate_col`` — its Z accumulates in exact integers."""
    m = 1 << p
    row = registers.agg(
        F.count("*").alias("nz"),
        F.sum(F.pow(F.lit(2.0), -F.col("register"))).alias("z_nz"),
    ).collect()[0]
    nonzero = row["nz"] or 0
    z = (m - nonzero) * 1.0 + (row["z_nz"] or 0.0)  # empty buckets add 2^-0
    if m >= 128:
        alpha = 0.7213 / (1 + 1.079 / m)
    else:
        alpha = {16: 0.673, 32: 0.697, 64: 0.709}[m]
    raw = alpha * m * m / z
    v = m - nonzero
    if raw <= 2.5 * m and v > 0:
        return m * math.log(m / v)
    return raw


def hll_estimate_col(nz: Column, z_scaled: Column, p: int) -> Column:
    """HLL estimate as a pure COLUMN over (non-zero-bucket count,
    integer-scaled Z): distributed per-group estimation (one row per
    window/source) with cross-engine determinism — ``z_scaled`` is
    Σ 2^(S − register) + (m − nz)·2^S with S = 61 − p: every term is
    an exact bigint (register ≤ 60−p+1 ≤ S for p ≥ 6), so the sum is
    order-free, unlike a float Σ 2^−register. The only float ops are
    one division (raw) or one ln (linear counting) on exact integer
    inputs. Requires p in [6, 18]."""
    if not (6 <= p <= 18):
        raise ValueError("p must be in [6, 18] for the exact-integer Z")
    m = 1 << p
    s = 61 - p
    if m >= 128:
        alpha = 0.7213 / (1 + 1.079 / m)
    else:
        alpha = {64: 0.709}[m]
    z_full = (
        (F.lit(m).cast("bigint") - nz) * F.lit(1 << s).cast("bigint")
        + z_scaled
    )
    raw = F.lit(float(alpha * m * m) * float(1 << s)) / z_full.cast(
        "double"
    )
    v = F.lit(m).cast("bigint") - nz
    lin = F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double"))
    return F.round(
        F.when((raw <= F.lit(2.5 * m)) & (v > 0), lin).otherwise(raw), 4
    )


def _z_scaled(p: int) -> Column:
    """Aggregate: Σ 2^(S − register) over present registers (bigint,
    exact)."""
    s = 61 - p
    return F.sum(
        F.expr(f"shiftleft(CAST(1 AS BIGINT),"
               f" CAST({s} - register AS INT))")
    )


def windowed_distinct(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    window: str = "6 hours",
    p: int = 10,
) -> DataFrame:
    """Approximate distinct values per event-time window — "distinct
    users per hour over 100 TB of events" as two map-side-combined
    aggregations: (window, bucket) → max rho (≤ 2^p rows per window
    however many events), then per-window estimate via the exact-
    integer Z of ``hll_estimate_col``. Output: (window_start,
    window_end, n_distinct_est). The streaming twin
    (streaming.pipeline.windowed_distinct_stream) runs the SAME
    register aggregation with a watermark."""
    win = F.window(F.col(ts_col), window).alias("__w")
    regs = (
        hll_bucket_rho(df, value_col, p, keep=[win])
        .groupBy("__w", "bucket")
        .agg(F.max("_rho").alias("register"))
    )
    agg = regs.groupBy("__w").agg(
        F.count("*").alias("__nz"), _z_scaled(p).alias("__zs")
    )
    return agg.select(
        F.col("__w.start").alias("window_start"),
        F.col("__w.end").alias("window_end"),
        hll_estimate_col(
            F.col("__nz"), F.col("__zs"), p
        ).alias("n_distinct_est"),
    )


# ------------------------------------------------------------- Histogram


def histogram_sketch(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    bins: int = 256,
) -> DataFrame:
    """Fixed-width histogram of ``df[col]`` over [lo, hi) as
    ``(bin int, cnt bigint)`` — the quantile/distribution sketch of the
    family (token-length and score distributions at corpus scale).
    Values below lo clamp into bin 0, at/above hi into bin bins-1, so
    mass is never dropped; NULLs are excluded (they have no position
    on the axis). Only occupied bins appear.

    Like the other sketches: ≤ ``bins`` rows whatever the input, ONE
    map-side-combined shuffle, mergeable across shards with
    ``histogram_merge`` (same lo/hi/bins contract), and exact integer
    content — bin edges are the only approximation, so the DuckDB
    replay is bit-for-bit. ``histogram_quantiles`` interpolates
    quantiles to within one bin width."""
    if bins < 1:
        raise ValueError("bins must be >= 1")
    if not (hi > lo):
        raise ValueError("hi must be > lo")
    v = F.col(col).cast("double")
    b = F.floor((v - F.lit(float(lo))) / F.lit(hi - lo) * bins)
    clamped = F.least(F.lit(bins - 1), F.greatest(F.lit(0), b)).cast("int")
    return (
        df.filter(v.isNotNull())
        .select(clamped.alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("cnt"))
    )


def histogram_merge(*hists: DataFrame) -> DataFrame:
    """Sum of histograms (same lo/hi/bins contract)."""
    return _merge_sketches(hists, ["bin"], F.sum("cnt").alias("cnt"))


def histogram_quantiles(
    hist: DataFrame,
    lo: float,
    hi: float,
    bins: int,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> list[float]:
    """Quantile estimates from a histogram sketch: linear
    interpolation inside the bin where the cumulative count crosses
    q·N — error bounded by one bin width. Collects the ≤ bins-row
    sketch (bounded, like the HLL estimator); clamp bins (0 and
    bins-1) estimate at their edge values."""
    rows = sorted((r["bin"], r["cnt"]) for r in hist.collect())
    n = sum(c for _, c in rows)
    if n == 0:
        raise ValueError("empty histogram")
    width = (hi - lo) / bins
    out = []
    for q in qs:
        if not (0.0 <= q <= 1.0):
            raise ValueError(f"quantile {q} outside [0, 1]")
        target = q * n
        cum = 0
        est = hi
        for b, c in rows:
            if cum + c >= target:
                frac = 0.0 if c == 0 else (target - cum) / c
                est = lo + (b + frac) * width
                break
            cum += c
        out.append(min(max(est, lo), hi))
    return out
