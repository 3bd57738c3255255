"""Driver-side pandas MultiIndex reshaping helpers.

Parity: reference ``ons_utils/pandas.py`` (SURVEY.md §2.10), updated for
pandas 2.x (the reference pinned pandas 1.1.5):

- ``MultiIndexSlicer.get_slicer`` **raises** on arity mismatch — the
  reference *returns* the ValueError (``pandas.py:99-101``; SURVEY bug list);
- ``shifted_within_year_apply`` avoids the removed ``groupby(axis=1)`` form
  by transposing;
- ``Stacker.stack`` handles pandas 2.x's stack API.

These are small-data, driver-side tools. Their at-scale Spark analogues:
``nested_dict_to_df`` → ``spark.createDataFrame``; ``Stacker`` →
``groupBy().pivot()`` / ``stack()`` SQL expression;
``shifted_within_year_*`` → window over ``F.year(F.add_months(ts, -1))``.
"""

from __future__ import annotations

import warnings
from typing import Callable, Optional, Sequence

import pandas as pd

from ons_utils_spark.generic import fill_tuple_keys, flatten_dict


def nested_dict_to_df(
    d: dict,
    columns: Optional[list] = None,
    level_names: Optional[list] = None,
) -> pd.DataFrame:
    """Flatten a nested dict into a MultiIndex-ed DataFrame.

    Parity: reference ``pandas.py:9-18``. Ragged nesting depths are
    forward-filled to equal length before indexing.
    """
    flat = fill_tuple_keys(flatten_dict(d), fill_method="ffill")
    index = pd.MultiIndex.from_tuples(flat.keys(), names=level_names)
    return pd.DataFrame(list(flat.values()), index=index, columns=columns)


class Stacker:
    """Unstack → (edit) → stack round-trip that preserves column order.

    Parity: reference ``pandas.py:21-64`` — ``unstack`` records the full
    column order (``self.all_cols``), ``stack`` restores it.
    """

    def __init__(
        self,
        value_cols: list,
        index_cols: list,
        transpose: bool = False,
    ):
        self.value_cols = value_cols
        self.index_cols = index_cols
        self.transpose = transpose
        self.all_cols: Optional[pd.Index] = None

    def unstack(self, df: pd.DataFrame) -> pd.DataFrame:
        """Move ``index_cols`` into the columns, keeping ``value_cols`` as values."""
        self.all_cols = df.columns
        set_cols = [c for c in df.columns if c not in self.value_cols]
        out = df.set_index(set_cols).unstack(self.index_cols)
        return out.T if self.transpose else out

    def stack(self, df: pd.DataFrame) -> pd.DataFrame:
        """Inverse of :meth:`unstack`; restores the original column order."""
        if self.all_cols is None:
            raise RuntimeError("stack() called before unstack()")
        if self.transpose:
            df = df.T
        with warnings.catch_warnings():
            # pandas 2.x deprecation churn around stack(); the legacy
            # behaviour (drop all-NaN combinations) is what we want here.
            warnings.simplefilter("ignore", FutureWarning)
            stacked = df.stack(self.index_cols)
        return stacked.reset_index()[list(self.all_cols)]


def convert_level_to_datetime(df: pd.DataFrame, level, axis: int = 0) -> pd.DataFrame:
    """Convert one level of a MultiIndex axis to DatetimeIndex.

    Parity: reference ``pandas.py:67-79``.
    """
    ax = df.axes[axis]
    new_levels = [
        pd.to_datetime(ax.levels[i]) if name == level else ax.levels[i]
        for i, name in enumerate(ax.names)
    ]
    return df.set_axis(ax.set_levels(new_levels), axis=axis)


class MultiIndexSlicer:
    """Build positional MultiIndex slice tuples for chosen levels.

    Parity: reference ``pandas.py:82-109``, except arity mismatch **raises**
    ``ValueError`` (the reference returns it — SURVEY.md §2.10 bug list).
    """

    def __init__(self, df: pd.DataFrame, levels: Sequence, axis: int = 0):
        self.df = df
        self.levels = levels
        self.axis = axis

    def get_slicer(self, *args) -> tuple:
        if len(args) != len(self.levels):
            raise ValueError(
                f"len args must be same as len self.levels: {len(self.levels)}"
            )
        values = iter(args)
        return tuple(
            next(values) if name in self.levels else slice(None)
            for name in self.df.axes[self.axis].names
        )


def get_index_level_values(df: pd.DataFrame, levels, axis: int = 0) -> list:
    """Distinct combinations of the given MultiIndex levels, in order.

    Parity: reference ``pandas.py:112-118``. Spark analogue:
    ``df.select(*levels).distinct()``.
    """
    return list(
        df.axes[axis].to_frame()[levels].drop_duplicates().itertuples(index=False, name=None)
    )


def shifted_within_year_apply(
    df: pd.DataFrame,
    method: Callable[[pd.DataFrame], pd.DataFrame],
    axis: int = 0,
) -> pd.DataFrame:
    """Apply ``method`` within Feb→Jan+1 year spans along a datetime axis.

    Parity: reference ``pandas.py:121-133`` (shift(-1) → groupby(year) →
    apply → shift(1)), written without the pandas-2-removed
    ``groupby(axis=1)`` form (transpose instead).

    Spark analogue at scale: window partitioned by
    ``F.year(F.add_months(ts, -1))``.
    """
    if axis in (1, "columns"):
        return shifted_within_year_apply(df.T, method, axis=0).T
    shifted = df.shift(-1)
    out = shifted.groupby(shifted.index.year, group_keys=False).apply(method)
    return out.shift(1)


def shifted_within_year_ffill(df: pd.DataFrame, axis: int = 0) -> pd.DataFrame:
    """Forward-fill within Feb→Jan+1 year spans (reference ``pandas.py:136-138``)."""
    return shifted_within_year_apply(df, lambda x: x.ffill(), axis)
