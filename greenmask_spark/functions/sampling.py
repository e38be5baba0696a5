"""Deterministic dataset splitting and sampling for training pipelines.

Both operators assign rows by a salted portable hash of a stable key —
not by ``rand()`` — so the same row lands in the same split/sample on
every run, on any cluster, at any partitioning, and the assignment is
replayable in plain SQL (the correctness oracle) or any other engine.
That reproducibility is the property training pipelines actually need:
re-running ingestion must not shuffle documents between train and test
(train/test contamination).

Scale shape: pure column expressions — a scan+project with NO shuffle
and no Python. Filters on the split column push down to the same scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: hash resolution: assignments quantize to millionths
_RESOLUTION = 1_000_000


def _unit_hash(key: Column, op: str, seed: int) -> Column:
    """Deterministic uniform draw in [0, 1_000_000) from a stable key —
    sha256 hex slice mod, the same arithmetic as the dedup/minhash
    portable hashes (SQL twin: ('0x' || substr(sha256(k), 1, 15))::BIGINT).

    ``op`` tags the hash per operation family so different operators
    draw INDEPENDENT uniforms even at the same seed: without it,
    hash_sample(hash_split(df)'s train rows, 0.5) would re-threshold the
    SAME draw (keeping 62.5% of train, and 0% of test) instead of
    sampling each split uniformly."""
    tagged = F.concat(key.cast("string"), F.lit(f":{op}:{seed}"))
    return F.pmod(
        F.conv(F.substring(F.sha2(tagged, 256), 1, 15), 16, 10).cast("bigint"),
        F.lit(_RESOLUTION),
    )


def hash_split(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    key_col: str = "doc_id",
    seed: int = 42,
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split with the given weights.

    ``weights`` maps split name → fraction (must sum to ~1); assignment
    thresholds the key's unit hash against cumulative weights, in dict
    order. Default 80/10/10 train/val/test."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights sum to {total}, expected 1.0")
    u = _unit_hash(F.col(key_col), "split", seed)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = u < int(round(acc * _RESOLUTION))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def hash_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic ``fraction`` sample: keeps a row iff its unit hash
    falls under the threshold. Unlike ``df.sample`` this is stable across
    runs/partitionings and composable (a 0.5 sample of a 0.5 sample with
    different seeds is an unbiased 0.25 sample)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction {fraction} outside [0, 1]")
    u = _unit_hash(F.col(key_col), "sample", seed)
    return df.filter(u < int(round(fraction * _RESOLUTION)))


def cross_split_contamination(
    df: DataFrame,
    split_col: str = "split",
    id_col: str = "doc_id",
    pairs=None,
) -> DataFrame:
    """Decontamination check: near-duplicate candidate pairs that CROSS a
    split boundary (a test document minhash-colliding with a train
    document is evaluation leakage). ``pairs`` defaults to MinHash-LSH
    candidates over ``df``; pass any (id_a, id_b) frame (winnow_pairs,
    simhash buckets) to change the detector.

    Output: (id_a, id_b, split_a, split_b), split_a != split_b. Scale
    shape: the candidate stream carries only ids; the two split lookups
    join on the id key (broadcast when the split map is small, else
    id-keyed shuffles — never document bodies)."""
    if pairs is None:
        from greenmask_spark.functions.dedup import minhash_candidates

        pairs = minhash_candidates(df, id_col=id_col)
    s = df.select(F.col(id_col).alias("id"), F.col(split_col).alias("s"))
    return (
        pairs.join(
            s.withColumnsRenamed({"id": "id_a", "s": "split_a"}), "id_a")
        .join(s.withColumnsRenamed({"id": "id_b", "s": "split_b"}), "id_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .select("id_a", "id_b", "split_a", "split_b")
    )


def stratified_hash_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str,
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Per-stratum deterministic sampling (``sampleBy`` without the RNG):
    each stratum keeps its own fraction of rows, hash-gated on the key.
    Strata missing from ``fractions`` are dropped (sampleBy semantics)."""
    for name, f_ in fractions.items():
        if not 0.0 <= f_ <= 1.0:
            raise ValueError(f"fraction {f_} for stratum {name!r} outside [0, 1]")
    u = _unit_hash(F.col(key_col), "strat", seed)
    thresh = F.create_map(*[
        x
        for name, f_ in fractions.items()
        for x in (F.lit(name), F.lit(int(round(f_ * _RESOLUTION))))
    ])
    t = F.element_at(thresh, F.col(strata_col).cast("string"))
    return df.filter(t.isNotNull() & (u < t))


#: DSIR feature-space default: hashed-ngram bucket count (the paper's
#: bag-of-hashed-ngrams dimension; 2^16 keeps the bucket table broadcastable)
DSIR_BUCKETS = 1 << 16


def _dsir_grams(text: Column) -> Column:
    """Unigrams + adjacent bigrams ("a b") of the whitespace-lowercase
    tokenization, in document order (unigrams first, then bigrams) —
    the hashed bag-of-ngrams features of DSIR."""
    from greenmask_spark.functions.text_analysis import tokens

    toks = F.filter(tokens(text), lambda t: t != "")
    # greatest(n-1, 0): a 0- or 1-token doc slices to empty bigram
    # arrays (ANSI slice rejects negative lengths)
    m = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, m),
        F.slice(toks, 2, m),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.concat(toks, bigrams)


def _dsir_bucket(gram: Column, buckets: int) -> Column:
    """Portable gram → bucket hash (sha256 hex slice mod buckets; the
    repo-wide cross-engine hash family)."""
    return F.pmod(
        F.conv(F.substring(F.sha2(gram, 256), 1, 15), 16, 10).cast("bigint"),
        F.lit(int(buckets)),
    )


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = DSIR_BUCKETS,
    smoothing: float = 1.0,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, arXiv:2302.03169 —
    "Data Selection for Language Models via Importance Resampling"):
    for every raw document, ``log p_target(x) / p_raw(x)`` under
    hashed-ngram (unigram+bigram) bag-of-words models with add-
    ``smoothing`` Laplace estimates over ``buckets`` feature buckets.
    High weight = looks like the target distribution (e.g. curated
    text) relative to the raw crawl. Output: (id, dsir_logw), one row
    per raw document (token-less docs weigh 0.0), rounded to 6
    decimals for cross-engine parity.

    Scale shape: both corpora reduce to (bucket, count) — map-side-
    combined aggs whose results are ≤ ``buckets`` rows (a ~1 MB
    broadcast at the 2^16 default; the raw corpus is scanned twice,
    once for counts and once for scoring — persist the gram stream to
    trade memory for the scan). Per-document summation folds the
    per-gram bucket log-ratios IN DOCUMENT ORDER (sort_array over
    (pos, lr) structs + a sequential aggregate fold), so the DuckDB
    oracle's ordered ``list_sum`` sees bit-identical doubles — the
    same contract as the ANN/LM paths."""
    if int(buckets) < 2:
        raise ValueError(f"buckets={buckets} must be >= 2")
    if smoothing <= 0:
        raise ValueError(f"smoothing={smoothing} must be > 0 "
                         "(unsmoothed zero-count buckets have log 0)")
    B, s = int(buckets), float(smoothing)

    def gram_stream(df: DataFrame) -> DataFrame:
        return (
            df.select(
                F.col(id_col).alias("id"),
                F.posexplode(_dsir_grams(F.col(text_col)))
                .alias("pos", "g"),
            )
            .select("id", "pos", _dsir_bucket(F.col("g"), B).alias("b"))
        )

    raw_grams = gram_stream(raw)
    # the bucket-count tables are tiny (≤ buckets rows) and feed TWO
    # consumers each (the log-ratio join and the totals): an eager
    # localCheckpoint materializes them once so the corpus-sized gram
    # streams are hashed once per corpus for counting, and the blocks
    # free when the result frame is unreachable (the dedup/_finish_
    # spans convention — no CacheManager session pinning)
    cr = raw_grams.groupBy("b").agg(
        F.count(F.lit(1)).alias("cr")).localCheckpoint(eager=True)
    ct = gram_stream(target).groupBy("b").agg(
        F.count(F.lit(1)).alias("ct")).localCheckpoint(eager=True)
    tot = (
        cr.agg(F.sum("cr").alias("Tr"))
        .crossJoin(ct.agg(F.sum("ct").alias("Tt")))
    )
    # per-bucket log ratio over the RAW bucket set (every scored gram's
    # bucket has cr >= 1 by construction; absent target buckets smooth)
    lr = (
        cr.join(ct, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            (
                F.log(F.coalesce(F.col("ct"), F.lit(0)) + F.lit(s))
                - F.log(F.col("Tt") + F.lit(s * B))
                - F.log(F.col("cr") + F.lit(s))
                + F.log(F.col("Tr") + F.lit(s * B))
            ).alias("lr"),
        )
    )
    summed = (
        raw_grams.join(F.broadcast(lr), "b")
        .groupBy("id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("pos", "lr"))
            ).alias("__terms")
        )
        .select(
            "id",
            F.round(
                F.aggregate(
                    "__terms", F.lit(0.0),
                    lambda acc, t: acc + t["lr"],
                ),
                6,
            ).alias("dsir_logw"),
        )
    )
    ids = raw.select(F.col(id_col).alias("id"))
    return ids.join(summed, "id", "left").select(
        "id", F.coalesce("dsir_logw", F.lit(0.0)).alias("dsir_logw")
    )


def dsir_resample(
    raw: DataFrame,
    target: DataFrame,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = DSIR_BUCKETS,
    smoothing: float = 1.0,
    seed: int = 42,
    weights: DataFrame | None = None,
) -> DataFrame:
    """DSIR selection: Gumbel-top-k over the importance log-weights —
    the paper's sampling-without-replacement, made deterministic by
    drawing the Gumbel noise from the salted unit hash instead of an
    RNG (g_i = w_i − ln(−ln u_i), u_i = hash(id)/RES): reproducible at
    any partitioning AND replayable in SQL. Pass ``weights`` (a
    ``dsir_log_weights`` output, possibly persisted) to skip the
    weight computation. The top-n is one TakeOrderedAndProject-class
    rank, no global sort."""
    w = weights if weights is not None else dsir_log_weights(
        raw, target, text_col, id_col, buckets, smoothing
    )
    u = (_unit_hash(F.col("id"), "dsir", seed) + 0.5) / float(_RESOLUTION)
    scored = w.select(
        "id", "dsir_logw",
        (F.col("dsir_logw") - F.log(-F.log(u))).alias("__g"),
    )
    return (
        scored.orderBy(F.desc("__g"), F.asc("id"))
        .limit(int(n))
        .select("id", "dsir_logw")
    )


def temperature_rates(
    counts: dict[str, int], budget: float, alpha: float = 0.5
) -> dict[str, float]:
    """Temperature-based mixture rates (the multilingual-LM standard:
    sampling probability p_i ∝ n_i^alpha, mT5/XLM-R style): given
    per-source document counts and a total document ``budget``, return
    the per-source keep/upsample rate to feed ``sample_mixture``.
    alpha=1 reproduces natural proportions; alpha=0 is uniform across
    sources; 0<alpha<1 upweights small sources. Rates may exceed 1
    (upsampling — sample_mixture's fractional-epoch machinery handles
    it). Pure driver arithmetic over |sources| numbers; get counts
    with one ``df.groupBy(source).count()``."""
    if budget <= 0:
        raise ValueError(f"budget={budget} must be > 0")
    if alpha < 0:
        raise ValueError(f"alpha={alpha} must be >= 0")
    pos = {s: int(n) for s, n in counts.items() if int(n) > 0}
    if not pos:
        raise ValueError("temperature_rates: no non-empty sources")
    weights = {s: float(n) ** alpha for s, n in pos.items()}
    z = sum(weights.values())
    # zero-count sources get rate 0.0 (NOT dropped): sample_mixture
    # validates that every source has a rate, so the composition
    # rates=temperature_rates(counts, ...) must stay total over counts
    return {
        s: (budget * (weights[s] / z) / pos[s]) if s in pos else 0.0
        for s in counts
    }


def unimax_rates(
    counts: dict[str, int], budget: float, max_epochs: float = 4.0
) -> dict[str, float]:
    """UniMax mixture rates (Chung et al. 2023, arXiv:2304.09151):
    distribute ``budget`` documents as uniformly as possible across
    sources, but never repeat a source more than ``max_epochs`` times
    — the epoch cap is what temperature sampling lacks (alpha small
    enough to flatten the head can spin a tiny source for hundreds of
    epochs). Exact greedy water-filling over sources ascending by
    capacity: each source gets min(cap_i, remaining/|remaining
    sources|). Deterministic (ties on capacity break by source name);
    Σ allocation = min(budget, Σ cap_i). Driver arithmetic only."""
    if budget <= 0:
        raise ValueError(f"budget={budget} must be > 0")
    if max_epochs <= 0:
        raise ValueError(f"max_epochs={max_epochs} must be > 0")
    pos = {s: int(n) for s, n in counts.items() if int(n) > 0}
    if not pos:
        raise ValueError("unimax_rates: no non-empty sources")
    cap = {s: max_epochs * n for s, n in pos.items()}
    remaining = float(budget)
    left = sorted(pos, key=lambda s: (cap[s], s))
    # zero-count sources get rate 0.0 (see temperature_rates)
    rates: dict[str, float] = {s: 0.0 for s in counts if s not in pos}
    for i, s in enumerate(left):
        fair = remaining / (len(left) - i)
        take = min(cap[s], fair)
        rates[s] = take / pos[s]
        remaining -= take
    return rates


def sample_mixture(
    sources: dict[str, DataFrame],
    rates: dict[str, float],
    key_col: str = "doc_id",
    seed: int = 42,
    source_col: str = "source_name",
) -> DataFrame:
    """Build a training mixture: per-source deterministic keep rates
    (Pile/Dolma-style source weighting, incl. rates > 1 for upsampling —
    a rate of 2.5 keeps every row twice plus a hash-gated 0.5 sample of
    third copies. The key column is cast to string; copies from epochs
    past the first gain an ``:e{epoch}`` suffix so downstream keys stay
    unique).

    Every source samples independently (op tag ``mix:{name}:{epoch}``),
    so identical keys across sources don't correlate. Output is the
    union with a ``source_col`` tag; pure scan+project per source —
    no shuffle, replayable in SQL."""
    missing = set(sources) - set(rates)
    if missing:
        raise ValueError(f"no mixture rate for sources: {sorted(missing)}")
    parts = []
    for name, df in sources.items():
        rate = rates[name]
        if rate < 0:
            raise ValueError(f"negative rate {rate} for {name!r}")
        full, frac = int(rate), rate - int(rate)
        for epoch in range(full):
            parts.append(_mixture_epoch(df, name, epoch, key_col, source_col))
        if frac > 0:
            u = _unit_hash(F.col(key_col), f"mix:{name}:{full}", seed)
            parts.append(
                _mixture_epoch(df, name, full, key_col, source_col).filter(
                    u < int(round(frac * _RESOLUTION))
                )
            )
    if not parts:
        raise ValueError("empty mixture")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _mixture_epoch(
    df: DataFrame, name: str, epoch: int, key_col: str, source_col: str
) -> DataFrame:
    # key goes to string in EVERY branch (not just suffixed epochs) so the
    # union's column type is consistent — mixed long/string branches would
    # make Spark cast "5:e1" back to long (ANSI error)
    key = F.col(key_col).cast("string")
    if epoch > 0:
        key = F.concat(key, F.lit(f":e{epoch}"))
    return df.withColumn(key_col, key).withColumn(source_col, F.lit(name))


def pack_sequences(
    df: DataFrame,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    max_tokens: int = 4096,
    n_packers: int = 256,
    seed: int = 42,
    sep_tokens: int = 0,
    strategy: str = "sequential",
) -> DataFrame:
    """Greedy sequence packing: concatenate documents into fixed
    token-budget training sequences (the standard pretraining packing
    step), fully deterministic.

    Docs hash into ``n_packers`` independent packing streams; within a
    stream docs are taken in ``id_col`` order and appended to the open
    bin unless they would exceed ``max_tokens`` (then a new bin opens).
    A doc longer than the budget gets a bin of its own (truncation is
    the tokenizer's job, flagged here via ``overflow``). ``sep_tokens``
    charges a per-document separator (EOS/BOS) against the budget —
    every doc costs ``n_tokens + sep_tokens``, matching what the
    tokenizer will actually emit when concatenating.

    ``strategy``:

    - ``sequential`` (default): docs pack in id order — preserves any
      upstream ordering (e.g. a deterministic shuffle) at the cost of
      more padding.
    - ``bfd`` (best-fit decreasing): docs sort by (tokens desc, id) and
      each goes to the open bin with the LEAST remaining room that still
      fits — the classic bin-packing heuristic, typically several
      percent less padding; intra-bin doc order becomes size-ordered.
      Both are fully deterministic.

    Output: (id, n_tokens, seq_id, seq_pos, seq_offset, overflow) —
    ``seq_id`` is "packer:bin", ``seq_pos`` the doc's index in the bin,
    ``seq_offset`` its starting token offset.

    Scale shape: ONE shuffle on the packer id (n_packers keys — size it
    ≥ cluster cores; each stream packs a ~1/n_packers slice in a single
    pandas pass). The greedy fill is inherently sequential per stream —
    this is the standard parallelization: determinism comes from the
    hash assignment + id order, NOT partition layout, so results are
    identical at any cluster size."""
    import pandas as pd
    from pyspark.sql import types as T

    # packer assignment uses the repo's PORTABLE sha-slice hash (not
    # xxhash64) so the whole packing run — assignment included — is
    # replayable in an ANSI-SQL oracle; one sha per row is noise next
    # to the packing pass itself
    tagged = F.concat(
        F.col(id_col).cast("string"), F.lit(f":pack:{seed}")
    )
    src = df.select(
        F.col(id_col).alias("id"),
        F.col(token_col).cast("long").alias("n_tokens"),
        F.pmod(
            F.conv(F.substring(F.sha2(tagged, 256), 1, 15), 16, 10)
            .cast("bigint"),
            F.lit(n_packers),
        ).alias("packer"),
    )
    schema = T.StructType([
        T.StructField("id", src.schema["id"].dataType),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("seq_id", T.StringType()),
        T.StructField("seq_pos", T.IntegerType()),
        T.StructField("seq_offset", T.LongType()),
        T.StructField("overflow", T.BooleanType()),
    ])

    if strategy not in ("sequential", "bfd"):
        raise ValueError(f"unknown strategy {strategy!r}: sequential|bfd")

    def _pack_sequential(packer, pdf: pd.DataFrame):
        bins, pos, offs, over = [], [], [], []
        bin_no, used, in_bin = 0, 0, 0
        for n in pdf["n_tokens"]:
            n = int(n) + sep_tokens
            if in_bin and used + n > max_tokens:
                bin_no, used, in_bin = bin_no + 1, 0, 0
            bins.append(f"{packer}:{bin_no}")
            pos.append(in_bin)
            offs.append(used)
            over.append(n > max_tokens)  # n includes the separator cost
            used += n
            in_bin += 1
            if used >= max_tokens:
                bin_no, used, in_bin = bin_no + 1, 0, 0
        return bins, pos, offs, over

    def _pack_bfd(packer, pdf: pd.DataFrame):
        import bisect

        # (remaining, bin_no) sorted by remaining — bisect finds the
        # tightest bin that still fits (search O(log b), insert O(b)).
        # Sizes descend, so the SMALLEST future cost is the last row's —
        # bins whose remainder drops below it can never fit anything and
        # CLOSE instead of lingering (without this the open list grows
        # unboundedly, e.g. all-docs-of-budget/2+1 opens a bin per doc)
        min_future = (int(pdf["n_tokens"].iloc[-1]) + sep_tokens
                      if len(pdf) else 0)
        open_bins: list[tuple[int, int]] = []
        state: dict[int, tuple[int, int]] = {}  # bin_no -> (used, count)
        bins, pos, offs, over = [], [], [], []
        next_bin = 0
        for n in pdf["n_tokens"]:
            n = int(n) + sep_tokens
            i = bisect.bisect_left(open_bins, (n, -1))
            if i < len(open_bins):
                rem, b = open_bins.pop(i)
            else:
                rem, b = max_tokens, next_bin
                next_bin += 1
                state[b] = (0, 0)
            used, cnt = state[b]
            bins.append(f"{packer}:{b}")
            pos.append(cnt)
            offs.append(used)
            over.append(n > max_tokens)
            used, cnt, rem = used + n, cnt + 1, rem - n
            state[b] = (used, cnt)
            if rem >= min_future:
                bisect.insort(open_bins, (rem, b))
        return bins, pos, offs, over

    def pack(key, pdf: pd.DataFrame) -> pd.DataFrame:
        packer = key[0]
        if strategy == "bfd":
            pdf = pdf.sort_values(
                ["n_tokens", "id"], ascending=[False, True],
                kind="mergesort").reset_index(drop=True)
            bins, pos, offs, over = _pack_bfd(packer, pdf)
        else:
            pdf = pdf.sort_values("id", kind="mergesort").reset_index(drop=True)
            bins, pos, offs, over = _pack_sequential(packer, pdf)
        out = pdf[["id", "n_tokens"]].copy()
        out["seq_id"] = bins
        out["seq_pos"] = pd.array(pos, dtype="int32")
        out["seq_offset"] = pd.array(offs, dtype="int64")
        out["overflow"] = over
        return out

    return src.groupBy("packer").applyInPandas(pack, schema=schema)


def _shuffle_hash(key_col: str, seed: int):
    return F.sha2(
        F.concat(F.col(key_col).cast("string"), F.lit(f":shuffle:{seed}")),
        256,
    )


def deterministic_shuffle(
    df: DataFrame,
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Global deterministic shuffle: total order by a salted hash of the
    key — the pre-training randomization step. Unlike ``orderBy(rand())``
    the order is a pure function of (key, seed): identical on every run,
    cluster size, and partitioning, so a resumed or re-sharded job sees
    the same sequence. One range-partitioned sort (Spark samples split
    points; rows move once)."""
    return df.orderBy(_shuffle_hash(key_col, seed), F.col(key_col))


def write_training_shards(
    df: DataFrame,
    path: str,
    key_col: str = "doc_id",
    rows_per_shard: int = 100_000,
    seed: int = 42,
    fmt: str = "parquet",
    compression: str = "zstd",
) -> None:
    """Write deterministically-shuffled fixed-size training shards.

    Rows order globally by the same salted hash ``deterministic_shuffle``
    uses; ``repartitionByRange`` on that hash gives contiguous global
    slices (Spark samples split points, rows move once) and
    ``maxRecordsPerFile`` bounds shard size, so a reader streaming the
    shards in filename order sees the full deterministically-shuffled
    sequence. Re-running at any cluster size reproduces the same
    row→shard-slice assignment (file boundaries within a range partition
    may differ; the ORDER does not)."""
    n_part = df.sparkSession.sparkContext.defaultParallelism
    (
        df.withColumn("__ord", _shuffle_hash(key_col, seed))
        # key tiebreaker: duplicate keys share a hash, and a hash-only
        # sort would leave their relative order to arrival order
        .repartitionByRange(n_part, F.col("__ord"), F.col(key_col))
        .sortWithinPartitions("__ord", key_col)
        .drop("__ord")
        .write.mode("overwrite").format(fmt)
        .option("compression", compression)
        .option("maxRecordsPerFile", str(rows_per_shard))
        .save(path)
    )


def cluster_aware_split(
    df: DataFrame,
    clusters: DataFrame,
    weights: dict[str, float] | None = None,
    key_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    seed: int = 42,
    out_col: str = "split",
) -> DataFrame:
    """Leakage-safe splitting: every member of a near-duplicate cluster
    lands in the SAME split, because the hash gate keys on the cluster
    id instead of the document id. Plain ``hash_split`` puts two
    near-identical documents on opposite sides of the train/test
    boundary whenever their ids hash differently — exactly the
    contamination ``cross_split_contamination`` detects; this prevents
    it by construction. ``clusters`` is ``dedup_clusters`` output
    (key_col, cluster_col); docs absent from it split by their own id."""
    c = clusters.select(
        F.col(key_col), F.col(cluster_col).alias("__cl"))
    joined = df.join(c, key_col, "left").withColumn(
        "__cl", F.coalesce(F.col("__cl"), F.col(key_col)))
    out = hash_split(joined, weights, key_col="__cl", seed=seed,
                     out_col=out_col)
    return out.drop("__cl")


def packing_stats(
    packed: DataFrame, max_tokens: int, sep_tokens: int = 0
) -> DataFrame:
    """One-row utilization summary of a ``pack_sequences`` result:
    bins, docs, mean fill fraction, padding fraction — the number to
    compare ``sequential`` vs ``bfd`` on a real corpus. Pass the SAME
    ``sep_tokens`` given to pack_sequences: separators consume budget
    and are neither fill shortfall nor padding."""
    per_bin = packed.groupBy("seq_id").agg(
        (F.sum("n_tokens") + F.count("*") * F.lit(sep_tokens)).alias("used"),
        F.count("*").alias("docs"))
    return per_bin.agg(
        F.count("*").alias("n_bins"),
        F.sum("docs").alias("n_docs"),
        F.round(F.avg(F.least(F.col("used"), F.lit(max_tokens))
                      / F.lit(float(max_tokens))), 4).alias("mean_fill"),
        F.round(
            F.sum(F.greatest(F.lit(max_tokens) - F.col("used"), F.lit(0)))
            / (F.count("*") * F.lit(float(max_tokens))), 4
        ).alias("padding_frac"),
    )


def select_to_budget(
    df: DataFrame,
    token_budget: int,
    token_col: str,
    score_col: str,
    id_col: str = "doc_id",
    n_buckets: int = 4096,
) -> DataFrame:
    """Keep the best documents until a token budget is exhausted: the
    maximal prefix of ``df`` ordered by (score DESC NULLS LAST, id ASC)
    whose cumulative ``token_col`` sum stays <= ``token_budget``
    (NULL or negative token counts count as 0 — cumulative sums must
    be monotone for the semantics to be a prefix at all) — the
    "select the top-quality N-token training set" operator every
    data-mixing run ends with. Exact by definition, deterministic
    (id tie-break), and replayable as one SQL window cumsum.

    The naive formulation — a GLOBAL window cumsum — funnels the whole
    corpus through one task. This runs the cap_per_domain two-phase
    shape instead: scores quantize into ``n_buckets`` range buckets, a
    map-side-combined per-bucket token-total agg + a <= n_buckets-row
    running sum locate the single THRESHOLD bucket where the budget
    crosses; buckets above it pass through with NO sort, buckets below
    it drop at the scan, and only the threshold bucket's rows (~1/
    n_buckets of the corpus) pay the exact (score, id) sort-window.
    Bucketing is a pure work partition: ties share a score and hence a
    bucket, so the result is bit-identical to the naive formulation at
    ANY n_buckets.

    Caveats, documented: scores must be finite (quantization does
    arithmetic on them; NULL is fine and sorts last as bucket -1); a
    degenerate corpus where most rows share ONE score concentrates the
    threshold bucket (the mega-domain caveat's twin). The input is
    read by the stats pass, the histogram and the two branches — four
    corpus scans replace the global sort (scans are parallel and
    bandwidth-bound; a sort is a single-task funnel), and a
    non-deterministic input is pinned with an eager localCheckpoint
    (the cap_per_domain rule). Persist the input first when the score/
    token columns are expensive to recompute per scan."""
    if token_budget < 0:
        raise ValueError(f"token_budget={token_budget} must be >= 0")
    if n_buckets < 1:
        raise ValueError(f"n_buckets={n_buckets} must be >= 1")
    from greenmask_spark.plan.health import plan_has_nondeterministic

    if plan_has_nondeterministic(df):
        df = df.localCheckpoint(eager=True)
    nb = int(n_buckets)
    # negative token counts clamp to 0 (NULL too): cumulative sums must
    # be monotone for the bucket decomposition to equal the global
    # prefix — with negatives admitted, a keep-all bucket whose TOTAL
    # fits could hide an intermediate prefix that overshoots
    base = df.withColumn(
        "__t",
        F.greatest(
            F.lit(0).cast("bigint"),
            F.coalesce(F.col(token_col).cast("bigint"), F.lit(0)),
        ),
    ).withColumn("__s", F.col(score_col).cast("double"))
    # both driver-plan frames are tiny (1 row / <= n_buckets+1 rows)
    # and feed MULTIPLE downstream reads — un-pinned, the histogram
    # and both branches would each re-execute the stats agg (a corpus
    # scan), and both branches the histogram agg. share_subtree's
    # persist runs each agg exactly once (compute locks) WITHOUT the
    # eager localCheckpoint's build-time physical planning + dedicated
    # job the r13 profile put at ~0.5-0.9 s per call locally; both
    # subtrees are deterministic, so a cache eviction recomputes the
    # identical values.
    from greenmask_spark.session import share_subtree

    stats = share_subtree(
        base.agg(F.min("__s").alias("__lo"), F.max("__s").alias("__hi")),
        "sampling.budget_stats",
    )
    b = base.crossJoin(F.broadcast(stats)).withColumn(
        "__b",
        F.when(F.col("__s").isNull(), F.lit(-1))
        .when(F.col("__hi") == F.col("__lo"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(nb - 1),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (F.col("__s") - F.col("__lo"))
                        / (F.col("__hi") - F.col("__lo"))
                        * nb
                    ),
                ),
            )
        )
        .cast("int"),
    ).drop("__lo", "__hi")
    # per-bucket token totals, then a running sum in score-descending
    # bucket order — <= n_buckets+1 rows, so the single-partition
    # window is a non-issue; the constant partition key exists ONLY to
    # keep WindowExec's "No Partition Defined" warning out of the logs
    # (harmless here by construction, but the noise would mask a REAL
    # unpartitioned window appearing elsewhere)
    run = Window.partitionBy(F.lit(0)).orderBy(F.desc("__b")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    plan = share_subtree(
        b.groupBy("__b").agg(F.sum("__t").alias("__bt"))
        .withColumn("__cum", F.sum("__bt").over(run))
        .withColumn("__off", F.col("__cum") - F.col("__bt"))
        .select("__b", "__cum", "__off"),
        "sampling.budget_plan",
    )
    joined = b.join(F.broadcast(plan), "__b")
    budget = F.lit(int(token_budget)).cast("bigint")
    keep_all = joined.filter(F.col("__cum") <= budget)
    thr = joined.filter(
        (F.col("__off") <= budget) & (F.col("__cum") > budget)
    )
    order = Window.partitionBy("__b").orderBy(
        F.col("__s").desc_nulls_last(), F.col(id_col)
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    thr_kept = thr.withColumn("__rcum", F.sum("__t").over(order)).filter(
        F.col("__off") + F.col("__rcum") <= budget
    ).drop("__rcum")
    helpers = ["__t", "__s", "__b", "__cum", "__off"]
    return keep_all.unionByName(thr_kept).drop(*helpers)


def weighted_sample(
    df: DataFrame,
    n: int,
    weight_col: str,
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: Gumbel-
    top-k (equivalent to Efraimidis-Spirakis A-ES keys), inclusion
    probability proportional to ``weight_col`` — the generic form of
    ``dsir_resample``'s selection stage, for quality-weighted subset
    draws and importance-weighted downsampling with ANY precomputed
    weight. Noise comes from the salted unit hash of ``key_col`` (not
    an RNG), so the draw is reproducible at any partitioning, across
    engines, and replayable in SQL: g_i = ln w_i − ln(−ln u_i),
    u_i = (hash(key)+0.5)/RES; take the n largest g (key ascending on
    ties). Rows with NULL or non-positive weights are excluded
    (ln undefined — they can never be sampled anyway).

    Scale shape: one scan + a TakeOrderedAndProject-class top-n rank —
    no global sort, no shuffle of anything but the per-partition
    top-n candidates."""
    if n < 0:
        raise ValueError(f"n={n} must be >= 0")
    u = (_unit_hash(F.col(key_col), "wsample", seed) + 0.5) / float(
        _RESOLUTION
    )
    w = F.col(weight_col).cast("double")
    g = F.log(w) - F.log(-F.log(u))
    return (
        df.filter(w.isNotNull() & (w > 0))
        .withColumn("__g", g)
        .orderBy(F.desc("__g"), F.asc(key_col))
        .limit(int(n))
        .drop("__g")
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    max_tokens: int = 512,
    overlap: int = 0,
    chunk_id_col: str = "chunk_id",
    chunk_col: str = "chunk_text",
    count_col: str = "n_tokens",
) -> DataFrame:
    """Fixed context-window document chunking with overlap: split each
    document's whitespace token stream into windows of ``max_tokens``
    tokens advancing by ``max_tokens - overlap`` (the RAG / long-context
    preprocessing step between cleaning and tokenize-and-pack — the
    within-document complement of pack_sequences' across-document
    binning). Chunk i covers tokens [i*stride, i*stride + max_tokens);
    the final window is the first one reaching the end of the document,
    so every token appears in >= 1 chunk, consecutive chunks share
    exactly ``overlap`` tokens (boundary sentences survive in one
    intact window), and a document never emits a fully-contained
    trailing runt. Documents with <= max_tokens tokens pass through as
    one chunk; whitespace-only/empty documents emit NO rows (there is
    nothing to train on — count them upstream if needed).

    Tokens are the trimmed ``\\s+`` split of the ORIGINAL-case text and
    chunks re-join with single spaces, so intra-document whitespace
    runs normalize — provenance is (id, chunk_id), by construction, not
    byte offsets. Everything is integer arithmetic over the token
    array, so the whole operator replays bit-for-bit in ANSI SQL (the
    registry oracle).

    Output: every input column except ``text_col``, plus
    (``chunk_id_col``, ``chunk_col``, ``count_col``) — chunk_id is the
    0-based window index, ``count_col`` the chunk's actual token count
    (== max_tokens everywhere but the final window). Provenance is the
    passed-through id columns plus chunk_id; pass ``chunk_col=
    text_col`` to replace the text in place (pipeline composition).

    Scale shape: ZERO exchanges — one scan, pure codegen'd expressions
    (split/sequence/explode/slice), chunks materialize inline at the
    scan. Row amplification is ~n/stride per document and byte
    amplification is bounded by max_tokens/stride (= 1 at overlap=0);
    with overlap the duplicated bytes are the price of window
    continuity, stated here so a 100 TB run sizes its output for it.
    """
    if max_tokens < 1:
        raise ValueError(f"chunk_documents: max_tokens={max_tokens} "
                         "must be >= 1")
    if not (0 <= overlap < max_tokens):
        raise ValueError(
            f"chunk_documents: overlap={overlap} must satisfy "
            f"0 <= overlap < max_tokens={max_tokens} (stride must be "
            "positive or chunking never advances)")
    stride = max_tokens - overlap
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    n = F.size("__toks")
    # windows past the first: integer ceil((n - max_tokens) / stride)
    n_chunks = F.when(n <= max_tokens, F.lit(1)).otherwise(
        F.lit(1) + F.expr(
            f"(size(__toks) - {max_tokens} + {stride - 1}) "
            f"div {stride}").cast("int")
    )
    start = F.col(chunk_id_col) * stride
    keep = [c for c in df.columns if c != text_col]
    return (
        df.withColumn("__toks", toks)
        .filter(F.size("__toks") > 0)
        .withColumn(
            chunk_id_col,
            F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))),
        )
        .select(
            *keep,
            F.col(chunk_id_col).cast("int").alias(chunk_id_col),
            F.array_join(
                F.slice(F.col("__toks"), start + 1, max_tokens), " "
            ).alias(chunk_col),
            F.least(F.lit(max_tokens), F.size("__toks") - start)
            .cast("int").alias(count_col),
        )
    )
