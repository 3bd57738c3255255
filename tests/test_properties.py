"""Property-based tests (hypothesis) for the pure-Python core and the
concat type lattice — coverage the reference's example-based suite lacks
(SURVEY.md §5)."""

from hypothesis import given, settings, strategies as st

from ons_utils_spark.generic import (
    fill_tuples,
    flatten_dict,
    list_convert,
    tuple_convert,
    unflatten_dict,
)
from ons_utils_spark.operators.concat import (
    SPARK_NUMBER_TYPES,
    _get_final_schema,
    _largest_number_dtype,
)

keys = st.text(min_size=1, max_size=5)
leaves = st.integers() | st.text(max_size=5) | st.booleans()


def nested_dicts():
    return st.recursive(
        st.dictionaries(keys, leaves, min_size=1, max_size=4),
        lambda children: st.dictionaries(keys, children | leaves, min_size=1, max_size=4),
        max_leaves=12,
    )


class TestFlattenRoundTrip:
    @given(nested_dicts())
    @settings(max_examples=60)
    def test_unflatten_inverts_flatten(self, d):
        # Drop dicts whose nesting makes a leaf collide with a subtree
        # (flatten of {'a': 1, 'a': {...}} can't occur in a python dict,
        # so the round trip is exact for any dict).
        assert unflatten_dict(flatten_dict(d)) == d


class TestCoercion:
    @given(leaves | st.lists(leaves) | st.tuples(leaves))
    def test_list_convert_always_list(self, obj):
        assert isinstance(list_convert(obj), list)

    @given(leaves | st.lists(leaves))
    def test_tuple_convert_always_tuple(self, obj):
        assert isinstance(tuple_convert(obj), tuple)

    @given(st.lists(leaves | st.tuples(leaves, leaves), min_size=1, max_size=6))
    def test_fill_tuples_equal_lengths(self, objs):
        filled = fill_tuples(objs)
        if any(isinstance(o, tuple) for o in objs):
            lengths = {len(t) for t in filled}
            assert len(lengths) == 1


num_types = st.sampled_from(SPARK_NUMBER_TYPES)


class TestTypeLattice:
    @given(st.lists(num_types, min_size=1, max_size=6))
    def test_largest_is_lattice_minimum_index(self, dtypes):
        result = _largest_number_dtype(dtypes)
        assert result in dtypes
        assert SPARK_NUMBER_TYPES.index(result) == min(
            SPARK_NUMBER_TYPES.index(d) for d in dtypes
        )

    @given(st.lists(num_types, min_size=1, max_size=4))
    def test_string_always_wins(self, dtypes):
        schemas = [{"c": d} for d in dtypes] + [{"c": "string"}]
        assert _get_final_schema(schemas) == [("c", "string")]

    @given(st.lists(num_types, min_size=2, max_size=4))
    def test_widening_order_independent(self, dtypes):
        forward = dict(_get_final_schema([{"c": d} for d in dtypes]))
        backward = dict(_get_final_schema([{"c": d} for d in reversed(dtypes)]))
        assert forward == backward
