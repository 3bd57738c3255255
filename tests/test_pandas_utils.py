"""pandas MultiIndex helper parity tests (reference ``tests/test_pandas.py``)."""

import pandas as pd
import pandas.testing as pdt
import pytest

from ons_utils_spark.pandas_utils import (
    MultiIndexSlicer,
    Stacker,
    convert_level_to_datetime,
    get_index_level_values,
    nested_dict_to_df,
    shifted_within_year_apply,
    shifted_within_year_ffill,
)


class TestNestedDictToDf:
    def test_builds_multiindex(self):
        d = {"a": {"x": 1, "y": 2}, "b": {"x": 3, "y": 4}}
        df = nested_dict_to_df(d, columns=["value"], level_names=["outer", "inner"])
        assert list(df.index.names) == ["outer", "inner"]
        assert df.loc[("a", "y"), "value"] == 2
        assert len(df) == 4

    def test_ragged_depths_padded(self):
        # fill_tuple_keys pads missing levels with None (repeat=False default,
        # matching reference pandas.py:16 + generic.py:28-65).
        d = {"a": {"x": 1}, "b": 9}
        df = nested_dict_to_df(d)
        assert len(df) == 2
        assert ("a", "x") in df.index


class TestStacker:
    def test_round_trip_preserves_columns(self):
        df = pd.DataFrame(
            {
                "period": ["p1", "p1", "p2", "p2"],
                "item": ["i1", "i2", "i1", "i2"],
                "price": [1.0, 2.0, 3.0, 4.0],
            }
        )
        stacker = Stacker(value_cols=["price"], index_cols=["item"])
        wide = stacker.unstack(df)
        assert wide.shape == (2, 2)
        back = stacker.stack(wide)
        pdt.assert_frame_equal(
            back.sort_values(["period", "item"]).reset_index(drop=True),
            df.sort_values(["period", "item"]).reset_index(drop=True),
        )

    def test_stack_before_unstack_raises(self):
        with pytest.raises(RuntimeError):
            Stacker(["a"], ["b"]).stack(pd.DataFrame())


class TestConvertLevelToDatetime:
    def test_converts_one_level(self):
        idx = pd.MultiIndex.from_product(
            [["2021-01-01", "2021-02-01"], ["a"]], names=["month", "item"]
        )
        df = pd.DataFrame({"v": [1, 2]}, index=idx)
        out = convert_level_to_datetime(df, "month")
        assert isinstance(out.index.levels[0], pd.DatetimeIndex)


class TestMultiIndexSlicer:
    def _df(self):
        idx = pd.MultiIndex.from_product(
            [["a", "b"], ["x", "y"], [1, 2]], names=["l1", "l2", "l3"]
        )
        return pd.DataFrame({"v": range(8)}, index=idx)

    def test_slicer_tuple(self):
        slicer = MultiIndexSlicer(self._df(), levels=["l2"])
        assert slicer.get_slicer("x") == (slice(None), "x", slice(None))

    def test_arity_mismatch_raises(self):
        # The reference RETURNS the ValueError (pandas.py:99-101); we raise.
        slicer = MultiIndexSlicer(self._df(), levels=["l2"])
        with pytest.raises(ValueError, match="len args"):
            slicer.get_slicer("x", "extra")


class TestGetIndexLevelValues:
    def test_unique_combinations_in_order(self):
        idx = pd.MultiIndex.from_tuples(
            [("a", 1), ("a", 1), ("b", 2)], names=["g", "n"]
        )
        df = pd.DataFrame({"v": [1, 2, 3]}, index=idx)
        assert get_index_level_values(df, ["g", "n"]) == [("a", 1), ("b", 2)]


class TestShiftedWithinYear:
    def test_ffill_respects_feb_to_jan_span(self):
        idx = pd.to_datetime(
            ["2021-01-01", "2021-02-01", "2021-03-01", "2022-01-01", "2022-02-01"]
        )
        df = pd.DataFrame({"v": [1.0, 2.0, None, None, 5.0]}, index=idx)
        out = shifted_within_year_ffill(df)
        # Mar-2021 (inside the Feb21→Jan22 span) ffills from Feb; Jan-2022
        # belongs to the 2021 span so it also fills; Feb-2022 starts a new span.
        assert out.loc["2021-03-01", "v"] == 2.0
        assert out.loc["2022-01-01", "v"] == 2.0

    def test_apply_with_identity_round_trips_except_first_row(self):
        # shift(-1) then shift(1) loses the first row (NaN) — reference
        # behavior (pandas.py:121-133), preserved.
        idx = pd.to_datetime(["2021-01-01", "2021-02-01", "2021-03-01"])
        df = pd.DataFrame({"v": [1.0, 2.0, 3.0]}, index=idx)
        out = shifted_within_year_apply(df, lambda x: x)
        assert pd.isna(out.iloc[0, 0])
        assert out["v"].tolist()[1:] == [2.0, 3.0]
