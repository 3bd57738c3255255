"""Streaming surface tests.

Strategy: the builders are batch/stream agnostic, so each is checked two
ways — (a) batch semantics against hand-computed expectations, (b) a REAL
Structured Streaming run: file-source stream → transformation →
availableNow trigger → memory sink, asserting the streaming result equals
the batch result of the same builder.
"""

import datetime as dt
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from ons_utils_spark.streaming.windows import (
    dedup_events,
    read_stream,
    run_available_now,
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)

SCHEMA = "event_id bigint, ts timestamp, user_id bigint, value double"


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 10, minute, second)


@pytest.fixture()
def events(spark):
    rows = [
        (1, _ts(0), 100, 1.0),
        (2, _ts(5), 100, 2.0),
        (3, _ts(20), 100, 3.0),
        (4, _ts(21), 200, 4.0),
        (5, _ts(59), 200, 5.0),
        (2, _ts(5), 100, 2.0),  # exact duplicate of event 2
    ]
    return spark.createDataFrame(rows, SCHEMA)


class TestTumblingWindows:
    def test_batch_semantics(self, spark, events):
        out = tumbling_window_agg(
            events, "ts", "10 minutes", aggs={"value": "sum"}
        ).collect()
        by_start = {r["window_start"]: r["sum_value"] for r in out}
        assert by_start[_ts(0)] == 5.0  # events 1, 2, dup-2
        assert by_start[_ts(20)] == 7.0  # events 3, 4
        assert by_start[_ts(50)] == 5.0  # event 5

    def test_keyed(self, spark, events):
        out = tumbling_window_agg(
            events, "ts", "10 minutes", keys="user_id", aggs={"value": "sum"}
        ).collect()
        vals = {(r["window_start"], r["user_id"]): r["sum_value"] for r in out}
        assert vals[(_ts(20), 100)] == 3.0
        assert vals[(_ts(20), 200)] == 4.0


class TestSlidingWindows:
    def test_overlapping_windows(self, spark, events):
        out = sliding_window_agg(
            events, "ts", "20 minutes", "10 minutes", aggs={"value": "count"}
        ).collect()
        # Event at 10:20 belongs to windows starting 10:10 and 10:20.
        starts = {r["window_start"] for r in out}
        assert _ts(10) in starts and _ts(20) in starts


class TestSessionWindows:
    def test_sessions_close_after_gap(self, spark, events):
        out = session_window_agg(
            events, "ts", "10 minutes", keys="user_id", aggs={"value": "count"}
        ).collect()
        user_100 = sorted(
            (r["session_start"], r["count_value"])
            for r in out
            if r["user_id"] == 100
        )
        # User 100: events at 10:00/10:05 (+dup) are one session; 10:20 another.
        assert len(user_100) == 2
        assert user_100[0][1] == 3 and user_100[1][1] == 1


class TestDedup:
    def test_batch_dedup(self, spark, events):
        out = dedup_events(events, "event_id")
        assert out.count() == 5

    def test_watermark_requires_ts(self, events):
        with pytest.raises(ValueError, match="watermark requires ts_col"):
            dedup_events(events, "event_id", watermark="10 minutes")


class TestRealStreamingRun:
    @pytest.fixture()
    def stream_dir(self, spark, events):
        d = tempfile.mkdtemp(prefix="stream_src_")
        events.write.mode("overwrite").parquet(d)
        yield d
        shutil.rmtree(d, ignore_errors=True)

    def test_windowed_agg_stream_matches_batch(self, spark, events, stream_dir):
        stream = read_stream(spark, stream_dir, SCHEMA)
        assert stream.isStreaming
        agg = tumbling_window_agg(
            stream, "ts", "10 minutes", aggs={"value": "sum"},
            watermark="30 minutes",
        )
        run_available_now(agg, "stream_tumbling")
        got = {
            r["window_start"]: r["sum_value"]
            for r in spark.sql("SELECT * FROM stream_tumbling").collect()
        }
        expected = {
            r["window_start"]: r["sum_value"]
            for r in tumbling_window_agg(
                events, "ts", "10 minutes", aggs={"value": "sum"}
            ).collect()
        }
        assert got == expected

    def test_stateful_dedup_stream(self, spark, stream_dir):
        stream = read_stream(spark, stream_dir, SCHEMA)
        deduped = dedup_events(
            stream, ["event_id"], ts_col="ts", watermark="1 hour"
        )
        run_available_now(deduped, "stream_dedup", output_mode="append")
        rows = spark.sql("SELECT * FROM stream_dedup").collect()
        assert sorted(r["event_id"] for r in rows) == [1, 2, 3, 4, 5]

    def test_session_window_stream(self, spark, events, stream_dir):
        stream = read_stream(spark, stream_dir, SCHEMA)
        sessions = session_window_agg(
            stream, "ts", "10 minutes", keys="user_id",
            aggs={"value": "count"}, watermark="2 hours",
        )
        run_available_now(sessions, "stream_sessions")
        got = spark.sql("SELECT * FROM stream_sessions").count()
        expected = session_window_agg(
            events, "ts", "10 minutes", keys="user_id", aggs={"value": "count"}
        ).count()
        assert got == expected


class TestStatefulOperator:
    def test_running_totals_match_batch_sum(self, spark, events, tmp_path):
        from ons_utils_spark.streaming.windows import running_user_totals

        src = str(tmp_path / "events_src")
        events.write.mode("overwrite").parquet(src)
        stream = read_stream(spark, src, SCHEMA)
        totals = running_user_totals(stream, key_col="user_id", value_col="value")
        query = (
            totals.writeStream.format("memory")
            .queryName("stream_state")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination(120)
        got = {
            r["user_id"]: (r["n_events"], r["total"])
            for r in spark.sql(
                # Last emitted row per key = lifetime aggregate.
                """SELECT user_id, n_events, total FROM (
                       SELECT *, row_number() OVER (
                           PARTITION BY user_id ORDER BY n_events DESC) rn
                       FROM stream_state) WHERE rn = 1"""
            ).collect()
        }
        import pyspark.sql.functions as F

        expected = {
            r["user_id"]: (r["n"], r["t"])
            for r in events.groupBy("user_id")
            .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
            .collect()
        }
        assert got == expected


class TestTransformWithStateDedup:
    def test_cross_batch_dedup_two_triggers(self, spark, tmp_path):
        """Streaming keep-first dedup: the first occurrence of a key
        passes, every later occurrence — same batch or a LATER
        checkpointed run — is dropped. Two availableNow runs over a
        growing file source prove the per-key state survives restarts.
        Runs on whichever engine the environment supports
        (transformWithState with protobuf, dropDuplicates without)."""
        from ons_utils_spark.streaming.windows import (
            read_stream,
            stateful_dedup_stream,
        )

        src = str(tmp_path / "src")
        sink = str(tmp_path / "sink")
        ckpt = str(tmp_path / "ckpt")

        batch1 = spark.createDataFrame(
            [
                (1, _ts(0), 100, 1.0),
                (2, _ts(1), 100, 2.0),
                (1, _ts(2), 100, 9.0),  # same-batch duplicate of key 1
            ],
            SCHEMA,
        )
        batch1.coalesce(1).write.mode("append").parquet(src)

        def run_once():
            stream = stateful_dedup_stream(
                read_stream(spark, src, SCHEMA), key_col="event_id"
            )
            q = (
                stream.writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run_once()
        got1 = {r["event_id"] for r in spark.read.parquet(sink).collect()}
        assert got1 == {1, 2}

        # Second run: key 1 recurs (cross-run duplicate), key 3 is new.
        batch2 = spark.createDataFrame(
            [(1, _ts(10), 200, 7.0), (3, _ts(11), 200, 8.0)], SCHEMA
        )
        batch2.coalesce(1).write.mode("append").parquet(src)
        run_once()
        rows = spark.read.parquet(sink).collect()
        assert {r["event_id"] for r in rows} == {1, 2, 3}
        assert len(rows) == 3  # key 1 emitted exactly once across runs
        # The surviving key-1 row came from the FIRST run (the cross-run
        # duplicate carried value 7.0) — proof the state crossed restarts.
        assert {r["value"] for r in rows if r["event_id"] == 1} <= {1.0, 9.0}

    def test_dedup_processor_shape_and_gating(self, spark):
        """The StatefulProcessor is constructible regardless of engine
        availability, and ttl_ms without protobuf fails loudly instead
        of silently keeping state forever."""
        from pyspark.sql.streaming.stateful_processor import StatefulProcessor

        from ons_utils_spark.streaming.windows import (
            make_dedup_processor,
            stateful_dedup_stream,
            transform_with_state_available,
        )

        proc = make_dedup_processor(ttl_ms=1000)
        assert isinstance(proc, StatefulProcessor)
        if not transform_with_state_available():
            src = spark.readStream.format("rate").load()
            with pytest.raises(RuntimeError, match="protobuf"):
                stateful_dedup_stream(src, "value", ttl_ms=1000)


class TestCheckpointedIncrementalRuns:
    def test_two_available_now_runs_process_incrementally(self, spark, tmp_path):
        """Checkpointed file-source stream: a second availableNow run picks
        up ONLY new files (exactly-once over the union of both runs)."""
        src = str(tmp_path / "src")
        sink = str(tmp_path / "sink")
        ckpt = str(tmp_path / "ckpt")

        batch1 = spark.createDataFrame(
            [(1, _ts(0), 100, 1.0), (2, _ts(1), 100, 2.0)], SCHEMA
        )
        batch1.coalesce(1).write.mode("append").parquet(src)

        def run_once():
            stream = read_stream(spark, src, SCHEMA)
            q = (
                stream.writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run_once()
        assert sorted(
            r["event_id"] for r in spark.read.parquet(sink).collect()
        ) == [1, 2]

        batch2 = spark.createDataFrame([(3, _ts(2), 200, 3.0)], SCHEMA)
        batch2.coalesce(1).write.mode("append").parquet(src)
        run_once()
        # No reprocessing of batch1: exactly one output row per source event.
        assert sorted(
            r["event_id"] for r in spark.read.parquet(sink).collect()
        ) == [1, 2, 3]


class TestKeepFirst:
    """keep_first is stateful_dedup_stream's DETERMINISTIC batch twin:
    first row per key under a total order."""

    def _df(self, spark):
        rows = [
            (3, _ts(20), 100, 3.0),
            (1, _ts(0), 100, 1.0),   # first for user 100 by (ts, id)
            (2, _ts(0), 100, 2.0),   # same ts as 1 — id tiebreak loses
            (4, _ts(21), 200, 4.0),  # first for user 200
            (5, _ts(59), 200, 5.0),
        ]
        return spark.createDataFrame(rows, SCHEMA)

    def test_first_by_total_order(self, spark):
        from ons_utils_spark.streaming.windows import keep_first

        got = keep_first(
            self._df(spark), "user_id", ["ts", "event_id"]
        ).collect()
        assert sorted((r["user_id"], r["event_id"]) for r in got) == [
            (100, 1),
            (200, 4),
        ]
        # Full payload of the winning row survives, not just the keys.
        assert {r["event_id"]: r["value"] for r in got} == {1: 1.0, 4: 4.0}

    def test_schema_unchanged(self, spark):
        from ons_utils_spark.streaming.windows import keep_first

        df = self._df(spark)
        assert keep_first(df, "user_id", ["ts", "event_id"]).columns == df.columns

    def test_matches_streaming_replay(self, spark):
        """Replaying the same rows in (ts, event_id) order through the
        STREAMING operator emits exactly what keep_first computes in
        batch — the dedup-across-restarts contract q_stateful_dedup_first
        oracle-checks at registry scale."""
        from ons_utils_spark.streaming.windows import (
            keep_first,
            stateful_dedup_stream,
        )

        df = self._df(spark)
        d = tempfile.mkdtemp(prefix="keepfirst_src_")
        try:
            # File source lists files in order; one file per arrival
            # group, written in event order = replay order.
            ordered = df.orderBy("ts", "event_id").coalesce(1)
            ordered.write.mode("overwrite").parquet(d)
            stream = read_stream(spark, d, SCHEMA)
            deduped = stateful_dedup_stream(stream, "user_id")
            run_available_now(deduped, "keepfirst_stream", output_mode="append")
            got = sorted(
                (r["user_id"], r["event_id"])
                for r in spark.sql("SELECT * FROM keepfirst_stream").collect()
            )
        finally:
            shutil.rmtree(d, ignore_errors=True)
        want = sorted(
            (r["user_id"], r["event_id"])
            for r in keep_first(df, "user_id", ["ts", "event_id"]).collect()
        )
        assert got == want
