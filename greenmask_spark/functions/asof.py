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

    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(out_names[c])
          for c in payload],
        F.lit(None).cast(right.schema[right_ts].dataType).alias(ts_out),
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in keys],
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(out_names[c]) for c in payload],
        F.col(right_ts).alias(ts_out),
    ).select(*l_tagged.columns)  # align column order for the union

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
        *[c for c in u.columns if c not in
          [out_names[c2] for c2 in payload] + [ts_out]],
        *[F.last(out_names[c], ignorenulls=True).over(w).alias(out_names[c])
          for c in payload],
        F.last(ts_out, ignorenulls=True).over(w).alias(ts_out),
    )
    res = carried.filter(F.col("__side") == 1)
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
