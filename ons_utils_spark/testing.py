"""Test-suite utilities: tuple-table builders, a Case harness, DF equality.

Parity targets (see SURVEY.md §2.10 / §5):

- tuple-table builders — reference ``ons_utils/testing.py:9-87``
- ``Case`` / ``parametrize_cases`` — reference ``tests/conftest.py:71-154``
- DataFrame equality — the reference uses the ``chispa`` package
  (``tests/pyspark/test_concat.py:2``); that package is not available here, so
  the engine carries its own comparer with the two knobs the reference's tests
  rely on (``ignore_row_order``, ``ignore_nullable``).
"""

from __future__ import annotations

import datetime
from typing import Any, Optional, Sequence

import pandas as pd
import pytest

from pyspark.sql import DataFrame as SparkDF, SparkSession


# ---------------------------------------------------------------------------
# Tuple-table builders
# ---------------------------------------------------------------------------

def to_date(dt: str) -> datetime.date:
    """Parse a date string to a ``datetime.date`` (reference ``testing.py:9-11``)."""
    return pd.Timestamp(dt).date()


def to_datetime(dt: str) -> datetime.datetime:
    """Parse a datetime string to ``datetime.datetime``."""
    return pd.Timestamp(dt).to_pydatetime()


def create_dataframe(data: Sequence[tuple]) -> pd.DataFrame:
    """Tuple-table (first row = header) → pandas DataFrame.

    Parity: reference ``testing.py:14-16``.
    """
    header, *rows = data
    return pd.DataFrame.from_records(rows, columns=header)


def create_spark_df(
    spark: SparkSession,
    data: Sequence[tuple],
    schema: Optional[str] = None,
) -> SparkDF:
    """Tuple-table (first row = header) → Spark DataFrame.

    Parity: reference ``tests/conftest.py:44-49``; ``schema`` (a DDL string)
    takes precedence over the header row when given, matching the explicit
    DDL usage at reference ``test_concat.py:146,156``.
    """
    if schema is not None:
        return spark.createDataFrame(list(data[1:]), schema=schema)
    header, *rows = data
    return spark.createDataFrame(rows, schema=list(header))


def create_multi_column_df(data: Sequence[tuple], column_levels: int) -> pd.DataFrame:
    """Tuple-table with ``column_levels`` header rows → MultiIndex-column df.

    Parity: reference ``testing.py:19-21``.
    """
    columns = pd.MultiIndex.from_tuples(list(zip(*data[:column_levels])))
    return pd.DataFrame.from_records(data[column_levels:], columns=columns)


def create_df_with_multi_indices(
    data: Sequence[tuple],
    column_labels: Sequence[str],
    index_labels: Sequence[str],
) -> pd.DataFrame:
    """Tuple-table → df with MultiIndex rows *and* columns.

    The first ``len(column_labels)`` tuples are column-level headers; they are
    shorter than the data rows by ``len(index_labels)`` leading index cells.
    Parity: reference ``testing.py:24-87``.
    """
    n_col_levels = len(column_labels)
    if n_col_levels == 1:
        column_index: pd.Index = pd.Index(data[0], name=column_labels[0])
    else:
        column_index = pd.MultiIndex.from_tuples(
            list(zip(*data[:n_col_levels])), names=column_labels
        )
    return (
        pd.DataFrame.from_records(data[n_col_levels:])
        .set_index(list(range(len(index_labels))))
        .rename_axis(index_labels)
        .set_axis(column_index, axis=1)
    )


# ---------------------------------------------------------------------------
# DataFrame equality
# ---------------------------------------------------------------------------

class DataFramesNotEqualError(AssertionError):
    """Raised when :func:`assert_df_equality` finds a difference."""


def _schema_tuples(df: SparkDF, ignore_nullable: bool) -> list[tuple]:
    if ignore_nullable:
        return [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    return [(f.name, f.dataType.simpleString(), f.nullable) for f in df.schema.fields]


def _sort_key(row: tuple) -> tuple:
    # None sorts before everything; values compare within (type-name, value)
    # so mixed-type columns don't blow up the sort.
    return tuple((v is not None, type(v).__name__, str(v)) for v in row)


def assert_df_equality(
    actual: SparkDF,
    expected: SparkDF,
    ignore_row_order: bool = False,
    ignore_nullable: bool = True,
    ignore_column_order: bool = False,
) -> None:
    """Assert two Spark DataFrames are equal (schema + collected rows).

    Drop-in for the subset of ``chispa.assert_df_equality`` the reference's
    tests use (SURVEY.md §5). Collects both sides — test-sized data only.
    """
    a_schema = _schema_tuples(actual, ignore_nullable)
    e_schema = _schema_tuples(expected, ignore_nullable)
    if ignore_column_order:
        order = [t[0] for t in sorted(e_schema)]
        actual = actual.select(*order)
        expected = expected.select(*order)
        a_schema = _schema_tuples(actual, ignore_nullable)
        e_schema = _schema_tuples(expected, ignore_nullable)
    if a_schema != e_schema:
        raise DataFramesNotEqualError(
            f"schemas differ:\n  actual:   {a_schema}\n  expected: {e_schema}"
        )

    a_rows = [tuple(r) for r in actual.collect()]
    e_rows = [tuple(r) for r in expected.collect()]
    if ignore_row_order:
        a_rows = sorted(a_rows, key=_sort_key)
        e_rows = sorted(e_rows, key=_sort_key)
    if a_rows != e_rows:
        diff_a = [r for r in a_rows if r not in e_rows][:10]
        diff_e = [r for r in e_rows if r not in a_rows][:10]
        raise DataFramesNotEqualError(
            f"rows differ ({len(a_rows)} actual vs {len(e_rows)} expected):\n"
            f"  only in actual:   {diff_a}\n  only in expected: {diff_e}"
        )


# ---------------------------------------------------------------------------
# Case harness
# ---------------------------------------------------------------------------

class Case:
    """A labeled test case carrying kwargs for a parametrized test.

    Parity: reference ``tests/conftest.py:71-113`` (from the public
    ``pytest-parametrize-cases`` pattern).
    """

    def __init__(self, label: Optional[str] = None, marks=None, **kwargs: Any):
        self.label = label
        self.kwargs = kwargs
        self.marks = marks

    def __repr__(self) -> str:
        return f"Case({self.label!r}, **{self.kwargs!r})"


def parametrize_cases(*cases: Case):
    """Decorator: ``pytest.mark.parametrize`` over :class:`Case` objects.

    All cases must declare the same kwarg names; each case becomes one
    parametrization with its ``label`` as the test id.
    Parity: reference ``tests/conftest.py:116-154``.
    """
    if not cases:
        raise ValueError("at least one Case is required")
    argnames = tuple(cases[0].kwargs.keys())
    params = []
    for case in cases:
        if tuple(case.kwargs.keys()) != argnames:
            raise ValueError(
                f"all cases must have the same kwargs: {argnames} != "
                f"{tuple(case.kwargs.keys())} in {case!r}"
            )
        values = tuple(case.kwargs[name] for name in argnames)
        if len(argnames) == 1:
            values = values[0]
        params.append(
            pytest.param(values, id=case.label, marks=case.marks or ())
            if len(argnames) == 1
            else pytest.param(*values, id=case.label, marks=case.marks or ())
        )
    return pytest.mark.parametrize(",".join(argnames), params)
