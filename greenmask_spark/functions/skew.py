"""Skew-handling primitives: salting for hot keys.

AQE's skew-join splitting (enabled in session defaults) handles join-side
skew at runtime; these utilities cover the two cases AQE cannot:

- ``salted_agg``: a groupBy where one key holds a huge share of rows makes
  one reducer the straggler even with AQE (a single group cannot be
  split). Two-stage aggregation over a salted key bounds any reducer at
  ~1/buckets of the hot key.
- ``replicate_skew_join``: a large⋈medium equi-join where the medium side
  is too big to broadcast and the big side has hot keys. The big side
  salts deterministically; the medium side replicates to every salt
  bucket; the join key becomes (key, salt), splitting each hot key across
  ``buckets`` reducers.

Salts are derived from row content (xxhash64), never from rand(): results
are reproducible across retries and partitionings (a failed-task re-run
with rand() salts would double-count rows in an agg).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__gm_salt__"


def _salt_col(cols: list[str], buckets: int) -> Column:
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(buckets))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    buckets: int = 16,
    salt_on: list[str] | None = None,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs`` maps output name → (function, column) for the algebraic
    functions that re-combine exactly: sum, count, min, max.
    (avg is sum/count at the call site; distinct-style aggs don't
    decompose this way — use Spark's own groupBy for those.)

    ``salt_on`` defaults to every non-key column used by the aggs — any
    expression over non-key columns spreads a hot key's rows uniformly.
    If the aggs only reference key columns the salt would be constant per
    group (no mitigation at all) — pass ``salt_on`` explicitly then.
    """
    combiner = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for name, (fn, _) in aggs.items():
        if fn not in combiner:
            raise ValueError(f"{name}: {fn} is not algebraic-combinable")
    salt_src = salt_on or sorted({c for _, c in aggs.values()} - set(keys))
    if not salt_src:
        raise ValueError(
            "salted_agg: aggs reference only key columns, so the derived "
            "salt would be constant within each group; pass salt_on with "
            "non-key columns"
        )
    salted = df.withColumn(_SALT, _salt_col(salt_src, buckets))
    partial = salted.groupBy(*keys, _SALT).agg(*[
        getattr(F, fn)(c).alias(name) for name, (fn, c) in aggs.items()
    ])
    return partial.groupBy(*keys).agg(*[
        getattr(F, combiner[fn])(name).alias(name)
        for name, (fn, _) in aggs.items()
    ])


def replicate_skew_join(
    big: DataFrame,
    medium: DataFrame,
    on: list[str],
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys split across ``buckets``
    reducers; the medium side replicates ``buckets``× (the bounded,
    deliberate cost — use broadcast() instead when medium fits).

    The big side's salt hashes ALL its columns so rows of one hot key
    scatter; the medium side explodes a literal 0..buckets-1 array.

    Only join types where every output row is anchored to exactly one
    big-side row are allowed: under right/full outer an unmatched medium
    row would surface once per replica (``buckets``× duplicates)."""
    # normalize Spark's alias spellings (leftouter/leftsemi/semi/anti/…)
    # before the safety check so valid left-anchored aliases aren't rejected
    norm = how.lower().replace("_", "")
    if norm not in ("inner", "left", "leftouter", "leftsemi", "semi",
                    "leftanti", "anti"):
        raise ValueError(
            f"replicate_skew_join: how={how!r} would duplicate unmatched "
            f"replicated rows; use broadcast() for right/full outer"
        )
    bcols = big.columns
    salted_big = big.withColumn(_SALT, _salt_col(bcols, buckets))
    replicated = medium.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    joined = salted_big.join(replicated, on=[*on, _SALT], how=how)
    return joined.drop(_SALT)
