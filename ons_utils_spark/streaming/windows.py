"""Structured Streaming surface: windowed aggregations, sessionization,
stateful dedup — batch/stream agnostic builders.

Extension scope (the reference has zero streaming code — SURVEY.md §2.9).
Every builder takes a DataFrame that may be a batch frame OR a streaming
frame (``spark.readStream``): the transformations are identical, which is
exactly how Structured Streaming is designed. Batch mode doubles as the
oracle-checkable twin (the driver's DuckDB gate runs the batch form —
``q_events_hourly_windows``).

Scale/latency notes:

- watermarks bound the state store: without one, a streaming window agg
  keeps every window open forever;
- ``dropDuplicates`` on a stream without a watermark keeps ALL keys in
  state — always pair it with a watermark + the event-time column in the
  key list;
- shuffle partitions size the state store shards; set
  ``spark.sql.shuffle.partitions`` before starting long-lived queries.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from typing import Optional, Union

from pyspark.sql import Column as SparkCol, DataFrame as SparkDF, SparkSession, functions as F

from ons_utils_spark.generic import list_convert

Aggs = Union[Mapping[str, str], Sequence[SparkCol]]


def _agg_exprs(aggs: Optional[Aggs]) -> list[SparkCol]:
    """Normalize aggs: {'value': 'sum'} dicts or Column sequences; default count."""
    if aggs is None:
        return [F.count(F.lit(1)).alias("n_events")]
    if isinstance(aggs, Mapping):
        exprs = []
        for col, fn in aggs.items():
            exprs.append(getattr(F, fn)(col).alias(f"{fn}_{col}"))
        return exprs
    return list(aggs)


def tumbling_window_agg(
    df: SparkDF,
    ts_col: str,
    duration: str,
    keys: Union[str, Sequence[str], None] = None,
    aggs: Optional[Aggs] = None,
    watermark: Optional[str] = None,
) -> SparkDF:
    """Non-overlapping fixed windows: ``F.window(ts, duration)`` + agg.

    Output has ``window_start``/``window_end`` timestamp columns followed by
    key columns and the aggregates.
    """
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    group_cols = [F.window(ts_col, duration).alias("w"), *list_convert(keys or [])]
    if keys is None:
        group_cols = group_cols[:1]
    return (
        df.groupBy(*group_cols)
        .agg(*_agg_exprs(aggs))
        .withColumn("window_start", F.col("w.start"))
        .withColumn("window_end", F.col("w.end"))
        .drop("w")
    )


def sliding_window_agg(
    df: SparkDF,
    ts_col: str,
    duration: str,
    slide: str,
    keys: Union[str, Sequence[str], None] = None,
    aggs: Optional[Aggs] = None,
    watermark: Optional[str] = None,
) -> SparkDF:
    """Overlapping windows of ``duration`` sliding every ``slide``."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    group_cols = [F.window(ts_col, duration, slide).alias("w"), *list_convert(keys or [])]
    if keys is None:
        group_cols = group_cols[:1]
    return (
        df.groupBy(*group_cols)
        .agg(*_agg_exprs(aggs))
        .withColumn("window_start", F.col("w.start"))
        .withColumn("window_end", F.col("w.end"))
        .drop("w")
    )


def session_window_agg(
    df: SparkDF,
    ts_col: str,
    gap: str,
    keys: Union[str, Sequence[str]],
    aggs: Optional[Aggs] = None,
    watermark: Optional[str] = None,
) -> SparkDF:
    """Session windows closing after ``gap`` of inactivity per key
    (``F.session_window``, Spark 3.2+). Watermark strongly recommended on
    streams — sessions are unbounded state otherwise.
    """
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), *list_convert(keys))
        .agg(*_agg_exprs(aggs))
        .withColumn("session_start", F.col("w.start"))
        .withColumn("session_end", F.col("w.end"))
        .drop("w")
    )


def dedup_events(
    df: SparkDF,
    keys: Union[str, Sequence[str]],
    ts_col: Optional[str] = None,
    watermark: Optional[str] = None,
) -> SparkDF:
    """Drop duplicate events by key.

    On a stream, pass ``ts_col`` + ``watermark`` so state is bounded:
    Spark then discards keys older than the watermark
    (``dropDuplicates`` keeps [key, ts] state only within the watermark).
    """
    keys = list_convert(keys)
    if watermark:
        if not ts_col:
            raise ValueError("watermark requires ts_col")
        df = df.withWatermark(ts_col, watermark)
        return df.dropDuplicates([*keys, ts_col])
    return df.dropDuplicates(keys)


def read_stream(
    spark: SparkSession,
    path: str,
    schema: str,
    fmt: str = "parquet",
    max_files_per_trigger: Optional[int] = None,
) -> SparkDF:
    """File-source stream reader (explicit schema — streams can't infer)."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def run_available_now(
    stream_df: SparkDF,
    table_name: str,
    output_mode: str = "complete",
    timeout_s: int = 120,
):
    """Run a streaming frame to completion on available data → memory sink.

    ``trigger(availableNow=True)`` processes everything currently available
    then stops — the canonical way to test streaming logic and to run
    incremental batch jobs off a stream source. Returns after the query
    terminates; results are in the in-memory table ``table_name``.

    ``output_mode``: use ``complete`` for aggregations (in ``append`` mode a
    final window never emits because the watermark stops advancing with the
    data); use ``append`` for row-wise streams like dedup.
    """
    query = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(timeout_s)
    return query


def running_user_totals(
    df: SparkDF,
    key_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
    state_timeout_ms: int = 0,
) -> SparkDF:
    """Custom stateful operator: cumulative per-key totals across triggers.

    The ``applyInPandasWithState`` path — for stateful logic windows can't
    express (running totals that survive across micro-batches, custom
    eviction, per-key state machines). Each key's state is a
    ``(count, total)`` pair updated per batch; emits one row per key per
    trigger with the lifetime aggregate.

    Works on streaming frames only (batch twin: a plain groupBy sum —
    that's the cross-check the tests use). ``state_timeout_ms`` > 0 evicts
    idle keys (bounds state at 100 TB key cardinality).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{key_col} bigint, n_events bigint, total double"
    state_schema = "n bigint, total double"
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_timeout_ms
        else GroupStateTimeout.NoTimeout
    )

    def update(key, batches, state: "GroupState"):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        if state_timeout_ms:
            state.setTimeoutDuration(state_timeout_ms)
        yield pd.DataFrame({key_col: [key[0]], "n_events": [n], "total": [total]})

    return df.groupBy(key_col).applyInPandasWithState(
        update, out_schema, state_schema, "update", timeout
    )


def transform_with_state_available() -> bool:
    """Whether Spark 4's ``transformWithState`` runtime can run here.

    The API itself ships with PySpark, but its state-server protocol
    needs the ``protobuf`` package at worker runtime — absent in some
    minimal images. Detected eagerly so callers fail at PLAN time with a
    clear signal instead of a crashed streaming query."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def make_dedup_processor(ttl_ms: Optional[int] = None):
    """The ``StatefulProcessor`` behind :func:`stateful_dedup_stream`:
    one boolean ``ValueState`` per key (TTL-evicted when ``ttl_ms`` is
    set); the first row per key is emitted, every later row dropped."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _DedupProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._seen = handle.getValueState(
                "seen", "seen boolean", ttlDurationMs=ttl_ms
            )

        def handleInputRows(self, key, rows, timer_values):
            first = None
            if not self._seen.exists():
                for pdf in rows:
                    if len(pdf):
                        first = pdf.head(1)
                        break
            if first is not None:
                self._seen.update((True,))
                yield first

        def close(self) -> None:
            pass

    return _DedupProcessor()


def stateful_dedup_stream(
    df: SparkDF,
    key_col: str,
    ttl_ms: Optional[int] = None,
) -> SparkDF:
    """Streaming exact dedup on ``key_col``: the FIRST row per key
    passes; later rows — in the same or any later micro-batch — drop.

    Preferred engine: ``transformWithState`` (Spark 4's arbitrary-
    stateful API, successor to ``applyInPandasWithState``) with one
    boolean ``ValueState`` per key; ``ttl_ms`` evicts idle keys, which
    bounds state at 100 TB key cardinality with an explicit, testable
    TTL contract (a key recurring after the TTL counts as new). Requires
    the RocksDB state store provider and the ``protobuf`` package; when
    protobuf is missing (:func:`transform_with_state_available`), falls
    back to ``dropDuplicates`` — identical keep-first semantics, but TTL
    is then unsupported (``ttl_ms`` raises rather than silently keeping
    state forever). Output schema equals the input schema either way.

    Batch twin for tests/oracles: ``df.dropDuplicates([key_col])``.
    """
    if transform_with_state_available():
        return df.groupBy(key_col).transformWithStateInPandas(
            make_dedup_processor(ttl_ms),
            outputStructType=df.schema,
            outputMode="append",
            timeMode="None",
        )
    if ttl_ms is not None:
        raise RuntimeError(
            "stateful_dedup_stream: ttl_ms needs transformWithState, "
            "which needs the 'protobuf' package at worker runtime — "
            "install protobuf or call without ttl_ms"
        )
    return df.dropDuplicates([key_col])


def keep_first(
    df: SparkDF,
    keys: Union[str, Sequence[str]],
    order_by: Union[str, Sequence[str]],
) -> SparkDF:
    """Deterministic keep-first dedup: for each key, the row that comes
    FIRST under ``order_by`` survives; every later row drops.

    This is :func:`stateful_dedup_stream`'s batch twin made
    deterministic: the streaming operator keeps the first row per key in
    ARRIVAL order, and a replayed/backfilled stream arrives in event
    order — so "first by (ts, unique-id)" over the batch table is
    exactly what a replay of that table through the streaming operator
    emits. ``order_by`` should be a total order (include a unique
    tiebreak column) or which row is "first" is undefined.

    Scale: one hash aggregate — ``min_by(struct(all columns),
    struct(order_by))`` — with map-side partial reduction, so the
    shuffle carries one candidate row per key per input partition, NOT
    the whole table. Deliberately NOT a ``row_number() == 1`` window,
    which would shuffle and SORT every row of every key group.
    """
    keys = list_convert(keys)
    order = list_convert(order_by)
    payload = df.columns
    first = F.min_by(
        F.struct(*[F.col(c) for c in payload]),
        F.struct(*[F.col(c) for c in order]),
    ).alias("__first")
    return (
        df.groupBy(*keys)
        .agg(first)
        .select(*[F.col(f"__first.{c}").alias(c) for c in payload])
    )
