"""Argument-coercion decorators (parity: reference ``ons_utils/decorators.py``).

- ``to_spark_col`` — coerce string args to ``pyspark.sql.Column``;
- ``to_list`` — coerce scalar/str args to lists.

Both are instances of
:func:`ons_utils_spark.factories.args_kwargs_transformer_factory`.
"""

from ons_utils_spark.factories import args_kwargs_transformer_factory
from ons_utils_spark.generic import list_convert
from ons_utils_spark.operators.general import convert_to_spark_col

to_spark_col = args_kwargs_transformer_factory(convert_to_spark_col)
to_list = args_kwargs_transformer_factory(list_convert)

__all__ = ["to_spark_col", "to_list"]
