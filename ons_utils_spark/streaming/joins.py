"""Stream-stream and stream-batch joins.

The missing piece between windowed aggregation and stateful processing:
correlating two EVENT STREAMS (views↔clicks, orders↔shipments,
impressions↔conversions) within a time bound.

How Spark executes it at scale: both sides shuffle on the equi-keys; each
side's rows are buffered in join state until the OTHER side's watermark
passes the end of the time interval, at which point state is evicted — so
the two watermarks plus the interval bound the state size. Without them an
inner stream-stream join buffers forever; this module makes the bounds
part of the API instead of an afterthought.

The same function works on batch frames (watermarks skipped), so the exact
join logic that runs in the streaming job is oracle-checkable as SQL —
the batch twin IS the correctness contract (plans/queries.py
q_view_to_click_attribution).
"""

from __future__ import annotations

import functools
import operator
from typing import Optional, Sequence, Union

from pyspark.sql import Column as SparkCol, DataFrame as SparkDF, functions as F

from ons_utils_spark.generic import list_convert


def interval_join(
    left: SparkDF,
    right: SparkDF,
    keys: Union[str, Sequence[str]],
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "10 minutes",
    left_watermark: Optional[str] = None,
    right_watermark: Optional[str] = None,
    join_type: str = "inner",
) -> SparkDF:
    """Join rows with equal ``keys`` where ``right_ts`` falls inside
    ``[left_ts + lower, left_ts + upper]``.

    On STREAMING inputs pass both watermarks — Spark requires them (plus
    the time-range conjunct this builds) to bound join state; state for a
    left row is dropped once the right watermark passes
    ``left_ts + upper``. On batch inputs leave them None.

    ``join_type``: ``inner`` streams fully; ``left_outer``/``right_outer``
    are supported by Spark for stream-stream joins with watermarks on both
    sides (NULL-padded results emit only after the watermark closes the
    interval, so outer results trail the data by the watermark delay).

    Column names shared by both sides (beyond ``keys``) must be
    disambiguated by the caller (alias/select before joining) — the same
    rule as any Spark self-join.
    """
    keys = list_convert(keys)
    if left_watermark:
        left = left.withWatermark(left_ts, left_watermark)
    if right_watermark:
        right = right.withWatermark(right_ts, right_watermark)

    key_conds: list[SparkCol] = [left[k] == right[k] for k in keys]
    lo = left[left_ts] + F.expr(f"INTERVAL {lower}")
    hi = left[left_ts] + F.expr(f"INTERVAL {upper}")
    cond = functools.reduce(
        operator.and_, key_conds + [right[right_ts] >= lo, right[right_ts] <= hi]
    )
    joined = left.join(right, cond, join_type)
    # Drop the right side's copy of the equi-keys (they are equal by the
    # join condition; keeping both makes every downstream reference
    # ambiguous).
    for k in keys:
        joined = joined.drop(right[k])
    return joined
