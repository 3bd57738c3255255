"""Decorator-factory parity tests (reference ``tests/test_decorators.py``)."""

import pytest

from ons_utils_spark.factories import args_kwargs_transformer_factory
from ons_utils_spark.generic import list_convert

doubler = args_kwargs_transformer_factory(lambda x: x * 2)


class TestTransformerFactory:
    def test_bare_decorator_transforms_all(self):
        @doubler
        def add(a, b):
            return a + b

        assert add(1, 2) == 6
        assert add(a=1, b=2) == 6

    def test_include_limits_to_named_params(self):
        @doubler(include="a")
        def add(a, b):
            return a + b

        assert add(1, 2) == 4
        assert add(a=1, b=2) == 4

    def test_exclude_skips_named_params(self):
        @doubler(exclude=["b"])
        def add(a, b):
            return a + b

        assert add(1, 2) == 4

    def test_include_and_exclude_raise(self):
        with pytest.raises(ValueError, match="only one of include or exclude"):

            @doubler(include="a", exclude="b")
            def add(a, b):
                return a + b

    def test_none_args_not_transformed(self):
        @doubler
        def passthrough(a):
            return a

        assert passthrough(None) is None

    def test_none_kwargs_not_transformed(self):
        @doubler
        def passthrough(a=None):
            return a

        assert passthrough(a=None) is None


class TestToListDecorator:
    def test_to_list(self):
        lister = args_kwargs_transformer_factory(list_convert)

        @lister(include="groups")
        def f(groups, other):
            return groups, other

        assert f("a", "b") == (["a"], "b")
        assert f(groups=("a", "c"), other=1) == (["a", "c"], 1)
