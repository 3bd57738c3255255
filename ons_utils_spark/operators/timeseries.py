"""Time-series resampling: regular per-key time grids with gap filling.

The missing piece between event streams and window functions: windows
aggregate the rows that EXIST, while training/analytics consumers need a
row for every (key, bucket) on a regular grid — zeros for quiet periods,
forward-fills for state-like series. The classic kdb+/Timescale
``resample``/``time_bucket_gapfill`` shape, built Spark-first:

- bucketing is ``date_trunc`` (pure row-local expression, pushed into
  the scan projection);
- the per-key grid is ``sequence(min_bucket, max_bucket, interval)``
  exploded from the SAME aggregate that computed the buckets — no
  second scan, no driver-side calendar;
- the grid left-joins the bucketed aggregate on (key, bucket) — both
  sides hash-partitioned by the same keys, so AQE plans a co-located
  join — and fill policies are a ``coalesce`` (zero) or an
  ``last(ignorenulls)`` window per key (ffill).

At 100 TB: everything shuffles at most twice, keyed by the series key;
grid size is O(keys × buckets), independent of event count, so sparse
high-volume streams (the common case) SHRINK through this operator.
Skewed keys hit the aggregate first, where AQE skew-split applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF, Window, functions as F

_UNITS = ("hour", "day", "week", "month")


def resample(
    df: SparkDF,
    key_col: str,
    ts_col: str,
    value_col: str,
    unit: str = "day",
    fill: str = "zero",
    quantize: int | None = None,
) -> SparkDF:
    """Per-key regular time series → ``(key, bucket, value, n_events,
    filled)``.

    ``value`` is ``sum(value_col)`` per (key, ``date_trunc(unit)``)
    bucket; every key gets a contiguous bucket range from its first to
    its last event. ``fill`` for gap buckets: ``"zero"`` (0.0 — rates /
    counts), ``"ffill"`` (previous bucket's value — state-like series;
    ``n_events`` stays 0), ``"interp"`` (linear interpolation between
    the surrounding observed buckets — sensor-like series; the grid
    always starts and ends on observed buckets, so every gap has both
    neighbours), or ``"null"``. ``filled`` marks synthesized buckets.

    ``quantize`` rounds each bucket's summed value to that many decimals
    BEFORE gap filling (floor-based half-up, which every engine computes
    identically). Interpolating from quantized endpoints makes the
    filled values engine-reproducible — raw double sums differ across
    engines by ulps of partial-aggregation order, and interpolation then
    amplifies those ulps across every gap bucket.
    """
    if unit not in _UNITS:
        raise ValueError(f"unit must be one of {_UNITS}, got {unit!r}")
    if fill not in ("zero", "ffill", "interp", "null"):
        raise ValueError(f"fill must be zero|ffill|interp|null, got {fill!r}")

    bucket = F.date_trunc(unit, F.col(ts_col))
    agg = (
        df.select(
            F.col(key_col).alias("key"),
            bucket.alias("bucket"),
            F.col(value_col).alias("v"),
        )
        .groupBy("key", "bucket")
        .agg(F.sum("v").alias("v"), F.count(F.lit(1)).alias("n_events"))
    )
    if quantize is not None:
        scale = 10**quantize
        agg = agg.withColumn(
            "v", F.floor(F.col("v") * scale + F.lit(0.5)) / scale
        )
    grid = (
        agg.groupBy("key")
        .agg(F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi"))
        .select(
            "key",
            F.explode(
                F.sequence("__lo", "__hi", F.expr(f"interval 1 {unit}"))
            ).alias("bucket"),
        )
    )
    out = grid.join(agg, ["key", "bucket"], "left").select(
        "key",
        "bucket",
        F.col("v").alias("value"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.col("v").isNull().alias("filled"),
    )
    if fill == "zero":
        return out.withColumn("value", F.coalesce("value", F.lit(0.0)))
    if fill == "ffill":
        w = (
            Window.partitionBy("key")
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return out.withColumn(
            "value", F.last("value", ignorenulls=True).over(w)
        )
    if fill == "interp":
        # For each gap bucket: previous/next OBSERVED value and bucket,
        # then the standard two-point interpolation weighted by epoch
        # distance. Two per-key window passes, both on the same shuffle.
        wb = (
            Window.partitionBy("key")
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wf = (
            Window.partitionBy("key")
            .orderBy("bucket")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        obs_bucket = F.when(F.col("value").isNotNull(), F.col("bucket"))
        sec = lambda c: F.col(c).cast("double")  # noqa: E731
        prev_v = F.last("value", ignorenulls=True).over(wb)
        prev_b = F.last(obs_bucket, ignorenulls=True).over(wb).cast("double")
        next_v = F.first("value", ignorenulls=True).over(wf)
        next_b = F.first(obs_bucket, ignorenulls=True).over(wf).cast("double")
        frac = (sec("bucket") - prev_b) / (next_b - prev_b)
        return out.withColumn(
            "value",
            F.when(F.col("value").isNotNull(), F.col("value")).otherwise(
                prev_v + (next_v - prev_v) * frac
            ),
        )
    return out
