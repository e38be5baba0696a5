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

from pyspark.sql import Column, DataFrame
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
