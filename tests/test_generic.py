"""Pure-Python helper parity tests (reference ``tests/test_generic.py``)."""

import pytest

from ons_utils_spark.generic import (
    fill_tuple_keys,
    fill_tuples,
    flatten_dict,
    get_key_value_pairs,
    invert_nested_keys,
    is_non_string_sequence,
    list_convert,
    tuple_convert,
    unflatten_dict,
)
from ons_utils_spark.testing import Case, parametrize_cases


class TestFlattenRoundTrip:
    def test_flatten_nested(self):
        assert flatten_dict({"a": {"x": 1, "y": 2}, "b": 3}) == {
            ("a", "x"): 1,
            ("a", "y"): 2,
            ("b",): 3,
        }

    def test_unflatten_inverts_flatten(self):
        nested = {"a": {"x": 1}, "b": {"y": {"z": 2}}}
        assert unflatten_dict(flatten_dict(nested)) == nested


class TestInvertNestedKeys:
    def test_depth_two(self):
        assert invert_nested_keys({"a": {"x": 1}, "b": {"x": 2}}) == {
            "x": {"a": 1, "b": 2}
        }

    def test_depth_three(self):
        result = invert_nested_keys({"a": {"b": {"c": 7}}})
        assert result == {"c": {"b": {"a": 7}}}


class TestGetKeyValuePairs:
    def test_scalar_values(self):
        assert get_key_value_pairs({"a": 1, "b": 2}) == [("a", 1), ("b", 2)]

    def test_sequence_values_explode(self):
        assert get_key_value_pairs({"a": [1, 2], "b": 3}) == [
            ("a", 1),
            ("a", 2),
            ("b", 3),
        ]

    def test_string_values_do_not_explode(self):
        assert get_key_value_pairs({"a": "xy"}) == [("a", "xy")]


class TestFillTuples:
    @parametrize_cases(
        Case(
            "bfill_pads_front_with_none",
            tuples=[("a", "b"), "c"],
            kwargs={},
            expected=[("a", "b"), (None, "c")],
        ),
        Case(
            "ffill_pads_end_with_none",
            tuples=[("a", "b"), "c"],
            kwargs={"fill_method": "ffill"},
            expected=[("a", "b"), ("c", None)],
        ),
        Case(
            "repeat_bfill_repeats_edge",
            tuples=[("a", "b"), "c"],
            kwargs={"repeat": True},
            expected=[("a", "b"), ("c", "c")],
        ),
        Case(
            "explicit_length",
            tuples=["x"],
            kwargs={"length": 3, "repeat": True},
            expected=[("x", "x", "x")],
        ),
        Case(
            "no_sequences_returns_unchanged",
            tuples=["a", "b"],
            kwargs={},
            expected=["a", "b"],
        ),
    )
    def test_fill_tuples(self, tuples, kwargs, expected):
        assert fill_tuples(tuples, **kwargs) == expected

    def test_fill_tuple_keys(self):
        d = {("a", "b"): 1, "c": 2}
        assert fill_tuple_keys(d) == {("a", "b"): 1, (None, "c"): 2}

    def test_fill_tuple_keys_ffill(self):
        d = {("a", "b"): 1, "c": 2}
        assert fill_tuple_keys(d, fill_method="ffill", repeat=True) == {
            ("a", "b"): 1,
            ("c", "c"): 2,
        }


class TestCoercionTrio:
    @parametrize_cases(
        Case("list", obj=[1, 2], expected=True),
        Case("tuple", obj=(1, 2), expected=True),
        Case("string", obj="ab", expected=False),
        Case("set", obj={1, 2}, expected=False),
        Case("scalar", obj=5, expected=False),
        Case("none", obj=None, expected=False),
    )
    def test_is_non_string_sequence(self, obj, expected):
        assert is_non_string_sequence(obj) is expected

    def test_tuple_convert(self):
        assert tuple_convert([1, 2]) == (1, 2)
        assert tuple_convert("ab") == ("ab",)
        assert tuple_convert(None) == (None,)
        assert tuple_convert(5) == (5,)

    def test_list_convert(self):
        assert list_convert((1, 2)) == [1, 2]
        assert list_convert("ab") == ["ab"]
        assert list_convert(None) == [None]
        assert list_convert(5) == [5]


class TestCaseHarness:
    def test_mismatched_kwargs_raise(self):
        with pytest.raises(ValueError, match="same kwargs"):
            parametrize_cases(Case("a", x=1), Case("b", y=2))
