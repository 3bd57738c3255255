"""resample: regular per-key grids with zero/ffill/null gap policies."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ons_utils_spark.operators.timeseries import resample


def _ts(day, hour=12):
    return dt.datetime(2024, 3, day, hour, 0, 0)


@pytest.fixture()
def events(spark):
    rows = [
        # key 1: events on days 1, 1, 4 → grid 1..4 with gaps 2, 3
        (1, _ts(1, 9), 10.0),
        (1, _ts(1, 15), 5.0),
        (1, _ts(4), 2.0),
        # key 2: single day → 1-bucket grid, no gaps
        (2, _ts(2), 7.0),
    ]
    return spark.createDataFrame(rows, "user_id bigint, ts timestamp, value double")


def _by_key_day(rows):
    return {(r["key"], r["bucket"].day): r for r in rows}


class TestResample:
    def test_zero_fill_grid(self, spark, events):
        out = _by_key_day(
            resample(events, "user_id", "ts", "value", fill="zero").collect()
        )
        assert set(out) == {(1, 1), (1, 2), (1, 3), (1, 4), (2, 2)}
        assert out[(1, 1)]["value"] == 15.0 and out[(1, 1)]["n_events"] == 2
        assert out[(1, 2)]["value"] == 0.0 and out[(1, 2)]["filled"]
        assert out[(1, 4)]["value"] == 2.0 and not out[(1, 4)]["filled"]
        assert out[(2, 2)]["value"] == 7.0

    def test_ffill_carries_previous_value(self, spark, events):
        out = _by_key_day(
            resample(events, "user_id", "ts", "value", fill="ffill").collect()
        )
        assert out[(1, 2)]["value"] == 15.0  # carried from day 1
        assert out[(1, 3)]["value"] == 15.0
        assert out[(1, 2)]["n_events"] == 0 and out[(1, 2)]["filled"]
        assert out[(1, 4)]["value"] == 2.0

    def test_null_fill_leaves_gaps_null(self, spark, events):
        out = _by_key_day(
            resample(events, "user_id", "ts", "value", fill="null").collect()
        )
        assert out[(1, 3)]["value"] is None and out[(1, 3)]["filled"]

    def test_hour_unit(self, spark):
        df = spark.createDataFrame(
            [(1, dt.datetime(2024, 3, 1, 10, 5), 1.0),
             (1, dt.datetime(2024, 3, 1, 13, 50), 2.0)],
            "user_id bigint, ts timestamp, value double",
        )
        rows = resample(df, "user_id", "ts", "value", unit="hour").collect()
        hours = sorted(r["bucket"].hour for r in rows)
        assert hours == [10, 11, 12, 13]  # contiguous hourly grid

    def test_interp_linear_between_neighbours(self, spark, events):
        out = _by_key_day(
            resample(events, "user_id", "ts", "value", fill="interp").collect()
        )
        # key 1: day 1 = 15.0, day 4 = 2.0 → days 2, 3 interpolate.
        step = (2.0 - 15.0) / 3
        assert out[(1, 2)]["value"] == pytest.approx(15.0 + step)
        assert out[(1, 3)]["value"] == pytest.approx(15.0 + 2 * step)
        assert out[(1, 1)]["value"] == 15.0 and out[(1, 4)]["value"] == 2.0
        assert out[(1, 2)]["filled"] and not out[(1, 1)]["filled"]

    def test_bad_args_raise(self, spark, events):
        with pytest.raises(ValueError, match="unit"):
            resample(events, "user_id", "ts", "value", unit="minute")
        with pytest.raises(ValueError, match="fill"):
            resample(events, "user_id", "ts", "value", fill="spline")
