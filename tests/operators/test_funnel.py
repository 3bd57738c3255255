"""Funnel and retention-cohort analytics."""

import datetime as dt

import pytest

from ons_utils_spark.operators.funnel import (
    funnel_conversion,
    funnel_steps,
    retention_cohorts,
)

SCHEMA = "user_id bigint, event_type string, ts timestamp"


def _ts(day, hour=0):
    return dt.datetime(2024, 5, day, hour)


@pytest.fixture()
def events(spark):
    rows = [
        # user 1: full ordered funnel
        (1, "view", _ts(1)), (1, "click", _ts(2)), (1, "purchase", _ts(3)),
        # user 2: purchase BEFORE the click → stops after click
        (2, "view", _ts(1)), (2, "purchase", _ts(2)), (2, "click", _ts(3)),
        # user 3: view only
        (3, "view", _ts(1)),
        # user 4: click/purchase but never viewed → not in funnel at all
        (4, "click", _ts(1)), (4, "purchase", _ts(2)),
    ]
    return spark.createDataFrame(rows, SCHEMA)


class TestFunnel:
    def test_strict_order_counts(self, spark, events):
        out = {
            r["step"]: (r["users"], r["conversion"])
            for r in funnel_conversion(
                events, "user_id", "event_type", "ts",
                ["view", "click", "purchase"],
            ).collect()
        }
        assert out["view"] == (3, 1.0)       # users 1, 2, 3
        assert out["click"] == (2, round(2 / 3, 6))   # users 1, 2
        assert out["purchase"] == (1, round(1 / 3, 6))  # user 1 only

    def test_steps_nulls_from_first_missed(self, spark, events):
        rows = {r["user"]: r for r in funnel_steps(
            events, "user_id", "event_type", "ts",
            ["view", "click", "purchase"],
        ).collect()}
        assert rows[1]["t2"] is not None
        assert rows[2]["t1"] is not None and rows[2]["t2"] is None
        assert rows[3]["t1"] is None and rows[3]["t2"] is None
        assert 4 not in rows  # never entered the funnel

    def test_needs_two_steps(self, spark, events):
        with pytest.raises(ValueError, match="at least 2"):
            funnel_conversion(events, "user_id", "event_type", "ts", ["view"])


class TestStateHistory:
    def test_collapses_runs_and_closes_intervals(self, spark):
        from ons_utils_spark.operators.funnel import state_history

        rows = [
            (1, "A", _ts(1)), (1, "A", _ts(2)), (1, "B", _ts(3)),
            (1, "A", _ts(4)),  # A recurs → separate interval
            (2, "C", _ts(1)),
        ]
        df = spark.createDataFrame(rows, SCHEMA.replace("event_type", "state")
                                   .replace("user_id", "user_id"))
        out = sorted(
            (
                (r["key"], r["state"], r["effective_from"].day,
                 r["effective_to"].day if r["effective_to"] else None)
                for r in state_history(df, "user_id", "ts", "state").collect()
            )
        )
        assert out == [
            (1, "A", 1, 3), (1, "A", 4, None), (1, "B", 3, 4),
            (2, "C", 1, None),
        ]

    def test_null_state_is_its_own_state(self, spark):
        from ons_utils_spark.operators.funnel import state_history

        rows = [(1, "A", _ts(1)), (1, None, _ts(2)), (1, "A", _ts(3))]
        df = spark.createDataFrame(rows, "user_id bigint, state string, ts timestamp")
        out = state_history(df, "user_id", "ts", "state").collect()
        assert len(out) == 3  # A, NULL, A — three intervals, not one


class TestRetention:
    def test_weekly_triangle(self, spark):
        # Weeks starting Mon 2024-05-06, 13, 20.
        rows = [
            (1, "x", dt.datetime(2024, 5, 6)),   # cohort w0
            (1, "x", dt.datetime(2024, 5, 14)),  # active w1
            (1, "x", dt.datetime(2024, 5, 21)),  # active w2
            (2, "x", dt.datetime(2024, 5, 7)),   # cohort w0
            (3, "x", dt.datetime(2024, 5, 13)),  # cohort w1
            (3, "x", dt.datetime(2024, 5, 20)),  # active w1+1
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        out = {
            (r["cohort"].date(), r["offset"]): r["users"]
            for r in retention_cohorts(df, "user_id", "ts").collect()
        }
        w0, w1 = dt.date(2024, 5, 6), dt.date(2024, 5, 13)
        assert out[(w0, 0)] == 2
        assert out[(w0, 1)] == 1 and out[(w0, 2)] == 1
        assert out[(w1, 0)] == 1 and out[(w1, 1)] == 1

    def test_bad_unit(self, spark):
        df = spark.createDataFrame([(1, "x", _ts(1))], SCHEMA)
        with pytest.raises(ValueError, match="unit"):
            retention_cohorts(df, "user_id", "ts", unit="month")
