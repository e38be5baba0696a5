"""As-of (point-in-time) join — the temporal enrichment operator Spark
has no native form of (pandas: merge_asof; DuckDB: ASOF JOIN).

Spark-first shape: instead of a per-left-row lookup or a range
cross-join, both sides UNION on (key, time) and a single window pass
carries the most recent right-side payload forward onto each left row —
ONE shuffle on the join key, O(n log n) per key for the sort, no
replication, no Python. This is the scalable formulation: a
BroadcastNestedLoopJoin over a range predicate is O(|L|·|R|) per key and
a pandas-UDF lookup ships both sides through Arrow.

Skew note: a hot key serializes its window sort into one task. For a
single dominant key, pre-split by a coarse time bucket and run the join
per bucket with the previous bucket's last snapshot appended (classic
watermark hand-off) — the operator here keeps the simple contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    tolerance=None,
    suffix: str = "_right",
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right_ts`` ≤ ``left_ts`` (direction="backward", the merge_asof
    default) or the least ``right_ts`` ≥ ``left_ts`` ("forward"),
    matching on the equi-key(s) ``on``.

    - matches are INCLUSIVE (equal timestamps match), like merge_asof;
    - ``tolerance`` (seconds, or any value comparable after ts
      subtraction) bounds how stale a match may be; beyond it the right
      columns are NULL;
    - right payload columns arrive suffixed when they collide with left
      names; the matched right timestamp is always ``{right_ts}{suffix}``;
    - a NULL payload value on the matched right row stays NULL (the whole
      right ROW is carried as one struct, so a NULL field never falls
      back to an older row's value — matches merge_asof);
    - ties among right rows with the SAME timestamp resolve to one
      arbitrary-but-deterministic row (ordered by the full right row) —
      give right a unique tiebreak column if it matters.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction {direction!r}: backward|forward")
    keys = [on] if isinstance(on, str) else list(on)
    payload = [c for c in right.columns if c not in keys + [right_ts]]
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in payload
    }
    ts_out = right_ts + suffix

    # The whole right row travels as ONE struct (non-NULL exactly for
    # right-side rows): last(ignorenulls) then skips LEFT rows only, never
    # a NULL payload *field* on the true match — per-column carry would
    # resurrect an older row's value for that field (merge_asof mismatch).
    r_struct = F.struct(
        *[F.col(c).alias(out_names[c]) for c in payload],
        F.col(right_ts).alias(ts_out),
    )
    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).alias("__r"),
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in keys],
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        r_struct.alias("__r"),
    ).select(*l_tagged.columns)  # align column order for the union
    # give the NULL-literal struct on the left side the right's type
    l_tagged = l_tagged.withColumn(
        "__r", F.col("__r").cast(r_tagged.schema["__r"].dataType)
    )

    u = l_tagged.unionByName(r_tagged)
    # backward: right row sorts BEFORE a left row at the same instant
    # (__side 0 < 1) so equal timestamps match inclusively; forward
    # mirrors with a descending scan.
    if direction == "backward":
        w = Window.partitionBy(*keys).orderBy(F.asc("__t"), F.asc("__side"))
    else:
        w = Window.partitionBy(*keys).orderBy(F.desc("__t"), F.asc("__side"))
    w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    carried = u.select(
        *[c for c in u.columns if c != "__r"],
        F.last("__r", ignorenulls=True).over(w).alias("__r"),
    )
    res = carried.filter(F.col("__side") == 1).select(
        *[c for c in carried.columns if c != "__r"],
        *[F.col("__r")[out_names[c]].alias(out_names[c]) for c in payload],
        F.col("__r")[ts_out].alias(ts_out),
    )
    if tolerance is not None:
        if direction == "backward":
            fresh = F.col("__t") - F.col(ts_out) <= F.lit(tolerance)
        else:
            fresh = F.col(ts_out) - F.col("__t") <= F.lit(tolerance)
        res = res.select(
            *[c for c in res.columns
              if c not in [out_names[c2] for c2 in payload] + [ts_out]],
            *[F.when(fresh, F.col(out_names[c])).alias(out_names[c])
              for c in payload],
            F.when(fresh, F.col(ts_out)).alias(ts_out),
        )
    return res.drop("__t", "__side")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str = "start",
    end_col: str = "end",
    bucket_size: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join (``start ≤ p < end``) via bucketing.

    Spark plans a bare range predicate as BroadcastNestedLoopJoin —
    O(|P|·|I|). Bucketizing turns it into an equi-join: points key on
    ``floor(p / bucket_size)``; each interval replicates to every bucket
    it overlaps; the residual range filter runs post-join. Work becomes
    O(|P| + |I|·avg_span/bucket_size + matches); pick bucket_size near
    the median interval length so replication stays ~2×.

    ``how="left"`` keeps unmatched points with NULL interval columns
    (dedup to at most one match is the caller's job — overlapping
    intervals legitimately multiply rows, exactly like SQL)."""
    if how not in ("inner", "left"):
        raise ValueError(f"how {how!r}: inner|left")
    p_b = points.withColumn(
        "__b", F.floor(F.col(point_col) / F.lit(bucket_size)).cast("long")
    )
    i_b = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / F.lit(bucket_size)).cast("long"),
                # end is exclusive: an interval ending exactly on a bucket
                # boundary does not reach into the next bucket
                F.floor(
                    (F.col(end_col) - F.lit(1)) / F.lit(bucket_size)
                ).cast("long"),
            )
        ),
    )
    cond = (
        (p_b["__b"] == i_b["__b"])
        & (i_b[start_col] <= p_b[point_col])
        & (p_b[point_col] < i_b[end_col])
    )
    joined = p_b.join(i_b, cond, how).drop("__b")
    return joined
