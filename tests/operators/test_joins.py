"""As-of and range join tests."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ons_utils_spark.operators.joins import asof_join, range_join


def _ts(minute):
    return dt.datetime(2024, 1, 1, 10, minute)


@pytest.fixture()
def trades(spark):
    return spark.createDataFrame(
        [
            (1, "A", _ts(5), 100.0),
            (2, "A", _ts(10), 101.0),
            (3, "B", _ts(7), 200.0),
            (4, "C", _ts(9), 300.0),  # key with no quotes at all
        ],
        "trade_id bigint, sym string, ts timestamp, price double",
    )


@pytest.fixture()
def quotes(spark):
    return spark.createDataFrame(
        [
            ("A", _ts(4), 99.5),
            ("A", _ts(10), 100.5),  # equal-ts with trade 2 → must match
            ("B", _ts(8), 199.0),  # after B's only trade → no match
        ],
        "sym string, ts timestamp, quote double",
    )


class TestAsofJoin:
    def test_backward_matches(self, spark, trades, quotes):
        out = {
            r["trade_id"]: r["quote_right"] if "quote_right" in r.asDict() else r["quote"]
            for r in asof_join(trades, quotes, on="sym", left_ts="ts").collect()
        }
        assert out[1] == 99.5  # latest quote before 10:05
        assert out[2] == 100.5  # equal timestamp matches (inclusive)
        assert out[3] is None  # only a LATER quote exists
        assert out[4] is None  # no quotes for key C at all

    def test_left_rows_always_kept(self, spark, trades, quotes):
        assert asof_join(trades, quotes, on="sym", left_ts="ts").count() == 4

    def test_tolerance_drops_stale(self, spark, trades, quotes):
        out = {
            r["trade_id"]: r["quote"]
            for r in asof_join(
                trades, quotes, on="sym", left_ts="ts", tolerance="30 SECOND"
            ).collect()
        }
        assert out[1] is None  # 99.5 is 1 minute stale > 30s
        assert out[2] == 100.5  # equal ts: 0 staleness

    def test_tolerance_is_session_timezone_independent(self, spark, trades, quotes):
        """The tolerance budget must not absorb the session TZ offset.

        ADVICE r2: anchoring the interval at a PARSED '1970-01-01' string
        meant unix_micros(anchor) equalled the TZ offset — under Asia/Tokyo
        a 30 s tolerance became 30 s MINUS 9 h (negative: drops every
        match); under America/New_York it gained 5 h (keeps stale matches).
        timestamp_seconds(0) anchors at exact epoch in any session TZ.
        """
        old = spark.conf.get("spark.sql.session.timeZone")
        expected = {1: None, 2: 100.5}
        try:
            for tz in ("Asia/Tokyo", "America/New_York"):
                spark.conf.set("spark.sql.session.timeZone", tz)
                got = {
                    r["trade_id"]: r["quote"]
                    for r in asof_join(
                        trades, quotes, on="sym", left_ts="ts",
                        tolerance="30 SECOND",
                    ).collect()
                    if r["trade_id"] in expected
                }
                assert got == expected, tz
        finally:
            spark.conf.set("spark.sql.session.timeZone", old)

    def test_subsecond_tolerance_and_nearest(self, spark):
        """Gap arithmetic is microsecond-precise: a 500 ms tolerance keeps a
        300 ms-stale match and drops an 800 ms-stale one, and 'nearest'
        resolves sub-second distances instead of treating them as ties."""
        base = dt.datetime(2024, 1, 1, 10, 0, 0)

        def ms(n):
            return base + dt.timedelta(milliseconds=n)

        trades = spark.createDataFrame(
            [(1, "A", ms(1000)), (2, "B", ms(1000))],
            "trade_id bigint, sym string, ts timestamp",
        )
        quotes = spark.createDataFrame(
            [("A", ms(700), 1.0), ("B", ms(200), 2.0), ("B", ms(1400), 3.0)],
            "sym string, ts timestamp, quote double",
        )
        tol = {
            r["trade_id"]: r["quote"]
            for r in asof_join(
                trades, quotes, on="sym", left_ts="ts",
                tolerance="500 MILLISECOND",
            ).collect()
        }
        assert tol[1] == 1.0  # 300 ms stale, within 500 ms
        assert tol[2] is None  # 800 ms stale, dropped
        near = {
            r["trade_id"]: r["quote"]
            for r in asof_join(
                trades, quotes, on="sym", left_ts="ts", direction="nearest"
            ).collect()
        }
        # B at 1.0 s: backward is 800 ms away, forward 400 ms → forward wins
        # (whole-second truncation would call this a tie and pick backward).
        assert near[2] == 3.0

    def test_collision_suffix(self, spark, trades):
        # Right side carries a 'price' column too → suffixed in the output.
        right = spark.createDataFrame(
            [("A", _ts(0), 1.0)], "sym string, ts timestamp, price double"
        )
        out = asof_join(trades, right, on="sym", left_ts="ts")
        assert "price_right" in out.columns
        row = {r["trade_id"]: r for r in out.collect()}[1]
        assert row["price"] == 100.0 and row["price_right"] == 1.0

    def test_single_shuffle_no_join_node(self, spark, trades, quotes):
        plan = (
            asof_join(trades, quotes, on="sym", left_ts="ts")
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert "Join" not in plan or "unionByName" not in plan  # no join op
        assert plan.count("Union") == 1


class TestRangeJoin:
    @pytest.fixture()
    def points(self, spark):
        return spark.createDataFrame(
            [(1, 5.0), (2, 10.0), (3, 25.0)], "id bigint, x double"
        )

    @pytest.fixture()
    def intervals(self, spark):
        return spark.createDataFrame(
            [("low", 0.0, 10.0), ("high", 10.0, 30.0)],
            "name string, lo double, hi double",
        )

    def test_half_open_interval(self, spark, points, intervals):
        out = {
            r["id"]: r["name"]
            for r in range_join(points, intervals, None, "x", "lo", "hi").collect()
        }
        assert out[1] == "low"
        assert out[2] == "high"  # boundary: start inclusive, end exclusive
        assert out[3] == "high"

    def test_left_join_keeps_unmatched(self, spark, points, intervals):
        pts = points.union(points.sparkSession.createDataFrame([(4, 99.0)], "id bigint, x double"))
        out = range_join(pts, intervals, None, "x", "lo", "hi", how="left")
        row = {r["id"]: r["name"] for r in out.collect()}
        assert row[4] is None

    def test_with_equality_keys(self, spark):
        left = spark.createDataFrame(
            [(1, "a", 5.0), (2, "b", 5.0)], "id bigint, k string, x double"
        )
        right = spark.createDataFrame(
            [("a", 0.0, 10.0, "m1")], "k string, lo double, hi double, tag string"
        )
        out = range_join(left, right, "k", "x", "lo", "hi")
        assert [r["id"] for r in out.collect()] == [1]


class TestRangeJoinBucketed:
    def test_matches_theta_join(self, spark):
        import random

        from ons_utils_spark.operators.joins import range_join, range_join_bucketed

        rng = random.Random(9)
        points = spark.createDataFrame(
            [(i, rng.uniform(0, 100)) for i in range(200)], "id bigint, x double"
        )
        intervals = spark.createDataFrame(
            [
                (j, lo := rng.uniform(0, 90), lo + rng.uniform(1, 15))
                for j in range(40)
            ],
            "iv bigint, lo double, hi double",
        )
        theta = range_join(points, intervals, None, "x", "lo", "hi")
        bucketed = range_join_bucketed(points, intervals, None, "x", "lo", "hi", 10.0)
        t = sorted((r["id"], r["iv"]) for r in theta.collect())
        b = sorted((r["id"], r["iv"]) for r in bucketed.collect())
        assert t == b and len(t) > 0

    def test_is_hash_join_not_nested_loop(self, spark):
        from ons_utils_spark.operators.joins import range_join_bucketed

        points = spark.createDataFrame([(1, 5.0)], "id bigint, x double")
        intervals = spark.createDataFrame([(1, 0.0, 10.0)], "iv bigint, lo double, hi double")
        plan = (
            range_join_bucketed(points, intervals, None, "x", "lo", "hi", 5.0)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "NestedLoop" not in plan and "CartesianProduct" not in plan


class TestAsofDirections:
    def test_forward_matches_next_quote(self, spark, trades, quotes):
        out = {
            r["trade_id"]: r["quote"]
            for r in asof_join(
                trades, quotes, on="sym", left_ts="ts", direction="forward"
            ).collect()
        }
        assert out[1] == 100.5  # next quote at/after 10:05 is 10:10
        assert out[2] == 100.5  # equal ts matches forward too
        assert out[3] == 199.0  # B's quote at 10:08 is after the 10:07 trade
        assert out[4] is None

    def test_nearest_picks_closer_side(self, spark, trades, quotes):
        out = {
            r["trade_id"]: r["quote"]
            for r in asof_join(
                trades, quotes, on="sym", left_ts="ts", direction="nearest"
            ).collect()
        }
        assert out[1] == 99.5   # 10:04 is 1 min back vs 10:10 5 min forward
        assert out[2] == 100.5  # exact match
        assert out[3] == 199.0  # only a forward quote exists
        assert out[4] is None

    def test_invalid_direction_raises(self, trades, quotes):
        with pytest.raises(ValueError, match="backward, forward, or nearest"):
            asof_join(trades, quotes, on="sym", left_ts="ts", direction="sideways")
