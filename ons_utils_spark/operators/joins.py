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
    direction: str = "backward",
) -> SparkDF:
    """As-of join (pandas ``merge_asof`` semantics, all three directions).

    Parameters
    ----------
    on
        Equality key column(s), present in both frames.
    left_ts / right_ts
        Event-time columns (``right_ts`` defaults to ``left_ts``'s name).
    tolerance
        Optional max time distance as an INTERVAL string (e.g. ``'1 hour'``):
        right rows further away than that are not matched.
    suffix
        Appended to right-side column names that collide with left ones.
    direction
        ``backward`` (latest right with ``ts_r <= ts_l``, the default),
        ``forward`` (earliest right with ``ts_r >= ts_l``), or ``nearest``
        (whichever of the two is closer in time; exact ties prefer
        backward, like pandas).

    Notes
    -----
    Plan shape: tag sides → unionByName → ONE window over (key, ts) taking
    ``last(payload, ignorenulls)`` looking back and/or ``first`` looking
    forward → filter left rows. No join node; one shuffle on the key.
    Equal timestamps match in every direction.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be backward, forward, or nearest")
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

    # Inclusive (=) semantics needs direction-specific tie ordering: the
    # backward window must see same-instant right rows BEFORE the left row,
    # the forward window must see them AFTER it. Two window orderings over
    # the same partition key — one shuffle, at most one extra sort.
    back_w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts"), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd_w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts"), F.col("__is_left").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )

    out = unioned
    if direction in ("backward", "nearest"):
        out = out.withColumn("__back", F.last("__payload", ignorenulls=True).over(back_w))
    if direction in ("forward", "nearest"):
        out = out.withColumn("__fwd", F.first("__payload", ignorenulls=True).over(fwd_w))
    out = out.where(F.col("__is_left") == 1)

    # Gap arithmetic at MICROsecond precision: cast('long') truncates
    # timestamps to whole seconds, which makes sub-second tolerances (e.g.
    # '500 milliseconds') degenerate to 0 and resolves all sub-second
    # 'nearest' comparisons as ties (ADVICE r1). Numeric event-time columns
    # keep their native value.
    from pyspark.sql.types import TimestampType

    ts_is_timestamp = isinstance(unioned.schema["__ts"].dataType, TimestampType)

    def _ticks(col: SparkCol) -> SparkCol:
        return F.unix_micros(col) if ts_is_timestamp else col.cast("long")

    if direction == "backward":
        match = F.col("__back")
    elif direction == "forward":
        match = F.col("__fwd")
    else:
        back_gap = _ticks(F.col("__ts")) - _ticks(F.col("__back.__matched_ts"))
        fwd_gap = _ticks(F.col("__fwd.__matched_ts")) - _ticks(F.col("__ts"))
        match = (
            F.when(F.col("__back").isNull(), F.col("__fwd"))
            .when(F.col("__fwd").isNull(), F.col("__back"))
            # Exact tie prefers backward (pandas merge_asof behavior).
            .when(fwd_gap < back_gap, F.col("__fwd"))
            .otherwise(F.col("__back"))
        )
    out = out.withColumn("__match", match)

    if tolerance is not None:
        gap = F.abs(
            _ticks(F.col("__match.__matched_ts")) - _ticks(F.col("__ts"))
        )
        # Interval length in microseconds: epoch + interval, read back.
        # The epoch anchor must be TZ-independent — parsing a '1970-01-01'
        # STRING goes through the session timezone, so unix_micros of it
        # equals the TZ offset, not 0, and the budget silently gains/loses
        # hours under non-UTC sessions. timestamp_seconds(0) is exact epoch
        # regardless of spark.sql.session.timeZone.
        budget = F.unix_micros(
            F.timestamp_seconds(F.lit(0)) + F.expr(f"INTERVAL {tolerance}")
        )
        if not ts_is_timestamp:
            raise ValueError(
                "tolerance as an INTERVAL requires timestamp event-time "
                "columns; numeric event times need a pre-filter instead"
            )
        out = out.withColumn("__match", F.when(gap <= budget, F.col("__match")))

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


def range_join_bucketed(
    left: SparkDF,
    right: SparkDF,
    on: Union[str, Sequence[str], None],
    left_point: str,
    right_start: str,
    right_end: str,
    bucket_width: float,
) -> SparkDF:
    """Large×large point-in-interval join via interval bucketing.

    The theta form (:func:`range_join`) degenerates to a nested-loop when
    neither side broadcasts. Bucketing restores a hash join: intervals are
    exploded into every ``bucket_width`` bucket they overlap, points are
    assigned their single bucket, and the equi-join on (keys, bucket) is
    followed by the exact interval predicate. Each interval adds
    ``ceil(len/width)+1`` rows — pick ``bucket_width`` near the median
    interval length to keep replication ~2x.

    Inner join semantics, identical output to
    ``range_join(left, right, on, ...)``.
    """
    on = list_convert(on or [])
    width = float(bucket_width)

    point_bucket = F.floor(F.col(left_point) / width)
    l_bucketed = left.withColumn("__bucket", point_bucket)

    start_bucket = F.floor(F.col(right_start) / width)
    end_bucket = F.floor(F.col(right_end) / width)
    r_bucketed = right.withColumn(
        "__bucket",
        F.explode(F.sequence(start_bucket.cast("long"), end_bucket.cast("long"))),
    )

    joined = l_bucketed.join(r_bucketed, [*on, "__bucket"])
    predicate = (F.col(left_point) >= F.col(right_start)) & (
        F.col(left_point) < F.col(right_end)
    )
    return joined.where(predicate).drop("__bucket")
