"""Stream-stream interval join tests.

Same strategy as test_windows.py: batch semantics against hand-computed
expectations, then a REAL two-stream Structured Streaming run (file
sources → interval_join with watermarks → availableNow → memory sink)
asserting parity with the batch result.
"""

import datetime as dt
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from ons_utils_spark.streaming.joins import interval_join
from ons_utils_spark.streaming.windows import read_stream, run_available_now

VIEW_SCHEMA = "view_id bigint, user_id bigint, view_ts timestamp"
CLICK_SCHEMA = "click_id bigint, user_id bigint, click_ts timestamp"


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 10, minute, second)


@pytest.fixture()
def views(spark):
    return spark.createDataFrame(
        [
            (1, 100, _ts(0)),
            (2, 100, _ts(30)),
            (3, 200, _ts(0)),
        ],
        VIEW_SCHEMA,
    )


@pytest.fixture()
def clicks(spark):
    return spark.createDataFrame(
        [
            (10, 100, _ts(5)),       # joins view 1 (gap 5 min)
            (11, 100, _ts(12)),      # outside view 1's 10-min window
            (12, 100, _ts(31)),      # joins view 2
            (13, 200, _ts(0, 30)),   # joins view 3 (gap 30 s)
            (14, 999, _ts(1)),       # no matching view user
        ],
        CLICK_SCHEMA,
    )


EXPECTED = {(1, 10), (2, 12), (3, 13)}


class TestBatchSemantics:
    def test_inner_within_bounds(self, spark, views, clicks):
        got = interval_join(
            views, clicks, "user_id", "view_ts", "click_ts",
            upper="10 minutes",
        )
        assert {(r["view_id"], r["click_id"]) for r in got.collect()} == EXPECTED

    def test_left_outer_pads_unmatched(self, spark, views, clicks):
        got = interval_join(
            views, clicks.where("click_id != 10"), "user_id",
            "view_ts", "click_ts", upper="10 minutes", join_type="left_outer",
        ).collect()
        by_view = {r["view_id"]: r["click_id"] for r in got}
        assert by_view[1] is None  # its only click removed -> NULL-padded
        assert by_view[2] == 12

    def test_lower_bound_excludes_backward_clicks(self, spark, views, clicks):
        backward = clicks.union(
            clicks.sparkSession.createDataFrame(
                [(15, 100, _ts(29))], CLICK_SCHEMA  # 1 min BEFORE view 2
            )
        )
        got = interval_join(
            views, backward, "user_id", "view_ts", "click_ts",
            upper="10 minutes",
        )
        pairs = {(r["view_id"], r["click_id"]) for r in got.collect()}
        assert (2, 15) not in pairs  # lower bound is 0s after the view

    def test_equi_keys_deduplicated(self, spark, views, clicks):
        out = interval_join(
            views, clicks, "user_id", "view_ts", "click_ts", upper="10 minutes"
        )
        assert out.columns.count("user_id") == 1


class TestStreamStream:
    def test_two_stream_join_matches_batch(self, spark, views, clicks):
        vdir, cdir = tempfile.mkdtemp(), tempfile.mkdtemp()
        try:
            views.write.mode("overwrite").parquet(vdir)
            clicks.write.mode("overwrite").parquet(cdir)
            vstream = read_stream(spark, vdir, VIEW_SCHEMA)
            cstream = read_stream(spark, cdir, CLICK_SCHEMA)
            joined = interval_join(
                vstream, cstream, "user_id", "view_ts", "click_ts",
                upper="10 minutes",
                left_watermark="1 hour", right_watermark="1 hour",
            )
            run_available_now(joined, "vc_join", output_mode="append")
            got = spark.sql("SELECT view_id, click_id FROM vc_join").collect()
            assert {(r["view_id"], r["click_id"]) for r in got} == EXPECTED
        finally:
            shutil.rmtree(vdir, ignore_errors=True)
            shutil.rmtree(cdir, ignore_errors=True)


class TestStreamStaticEnrich:
    def test_stream_joins_static_dimension(self, spark, clicks):
        """Stream-static joins need no watermark or state: the static side
        broadcasts into every micro-batch. The standard enrichment shape
        (event stream x dimension table)."""
        users = spark.createDataFrame(
            [(100, "gold"), (200, "basic")], "user_id bigint, tier string"
        )
        cdir = tempfile.mkdtemp()
        try:
            clicks.write.mode("overwrite").parquet(cdir)
            cstream = read_stream(spark, cdir, CLICK_SCHEMA)
            enriched = cstream.join(F.broadcast(users), "user_id", "left")
            run_available_now(enriched, "enriched_clicks", output_mode="append")
            got = {
                r["click_id"]: r["tier"]
                for r in spark.sql(
                    "SELECT click_id, tier FROM enriched_clicks"
                ).collect()
            }
            assert got == {10: "gold", 11: "gold", 12: "gold",
                           13: "basic", 14: None}
        finally:
            shutil.rmtree(cdir, ignore_errors=True)
