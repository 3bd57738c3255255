"""Schema-coercing multi-DataFrame concatenation with lineage key columns.

The engine's flagship parity operator (reference
``ons_utils/pyspark/concat.py:36-160``; semantics pinned by
``tests/pyspark/test_concat.py``). Re-implemented Spark-3-first:

- schema reconciliation runs on ``df.dtypes`` metadata in pure Python (the
  reference pivots through a driver-side pandas matrix) — **no Spark job** is
  triggered; analysis-time metadata only;
- the rewritten frames union via left-deep ``unionByName``, producing a plain
  Union logical plan that Catalyst flattens and optimizes; lineage keys are
  constant-foldable ``F.lit`` projections;
- at 100 TB this is a metadata-only operation: the union adds no shuffle and
  each child keeps its own partitioning; the only real work is the casts,
  which stay inside whole-stage codegen.

Coercion rules (reference ``concat.py:209-252``, preserved exactly — including
the quirk that ``decimal(10,0)`` outranks ``double``):

1. any ``string`` dtype for a column → the column is string everywhere;
2. else if every frame's dtype (missing → ``'int'``) is a number type →
   the largest number type present, per :data:`SPARK_NUMBER_TYPES` order;
3. else if all present dtypes are equal **and no frame is missing the
   column** → unchanged;
4. otherwise → ``TypeError``.

Missing columns are filled with typed NULLs. A :class:`UnequalSchemaWarning`
is emitted when dtypes (ignoring missing columns) actually differ.
"""

from __future__ import annotations

import functools
import warnings
from collections.abc import Iterable, Mapping, Sequence
from typing import Optional, Union

from pyspark.sql import DataFrame as SparkDF, functions as F

from ons_utils_spark.generic import list_convert

Key = Sequence[Union[str, Sequence[str]]]

#: Spark number dtypes ordered big → small. ``decimal(10,0)`` deliberately
#: outranks ``double`` — a reference quirk parity requires
#: (``concat.py:24-33``; test ``test_concat.py:452-455``).
SPARK_NUMBER_TYPES: tuple[str, ...] = (
    "decimal(10,0)",
    "double",
    "float",
    "bigint",
    "int",
    "smallint",
    "tinyint",
)


class UnequalSchemaWarning(Warning):
    """Emitted when concat input schemas disagree and coercion is attempted."""


def concat(
    frames: Union[Iterable[SparkDF], Mapping[Key, SparkDF]],
    keys: Optional[Key] = None,
    names: Optional[Union[str, Sequence[str]]] = None,
) -> SparkDF:
    """Concatenate Spark DataFrames, coercing schemas, with key columns.

    Parameters
    ----------
    frames
        A sequence (or any iterable, including generators) or mapping of
        DataFrames. For a mapping, its keys become ``keys`` unless ``keys``
        is passed, in which case the mapping is subset (and ordered) by it.
    keys
        One key per frame, identifying it in the output. Keys may have
        multiple parts (tuples); all keys must have equally many parts, and
        the number of parts must equal ``len(names)``.
    names
        Name(s) of the new key column(s), prepended to the output.

    Returns
    -------
    DataFrame
        Lazy union of the (schema-aligned) frames with key columns first.

    Notes
    -----
    Unlike the reference (``concat.py:85`` calls ``len()`` before
    normalizing, so generators raise), any iterable input is accepted —
    SURVEY.md §2.10 flags this as a bug to fix, not replicate.
    """
    if isinstance(frames, (SparkDF, str)):
        raise TypeError(
            "first argument must be an iterable of pyspark DataFrames,"
            f" you passed an object of type '{type(frames)}'"
        )

    if isinstance(frames, Mapping):
        if names is None:
            raise ValueError(
                "when the first argument is a mapping,"
                " the names argument must be given"
            )
        if keys is None:
            keys = list(frames.keys())
        # Subsetting by keys also fixes the frame order.
        frames = [frames[k] for k in keys]
    else:
        frames = list(frames)
        if keys is not None and len(frames) != len(keys):
            raise ValueError(
                "keys must be same length as frames"
                " when frames is a list or tuple"
            )

    if len(frames) == 0:
        raise ValueError("No objects to concatenate")

    for frame in frames:
        if not isinstance(frame, SparkDF):
            raise TypeError(
                f"cannot concatenate object of type '{type(frame)}'; "
                "only pyspark.sql.DataFrame objs are valid"
            )

    schemas = [dict(frame.dtypes) for frame in frames]
    if not _schemas_equal(schemas, warn=True):
        final_schema = _get_final_schema(schemas)
        frames = [_align_frame(frame, final_schema) for frame in frames]

    if not names and not keys:
        return functools.reduce(SparkDF.unionByName, frames)

    names = list_convert(names)
    keys = [list_convert(key) for key in keys]
    if not all(len(key) == len(names) for key in keys):
        raise ValueError("the length of each key must equal the length of names")
    if not all(len(key) == len(keys[0]) for key in keys):
        raise ValueError("all keys must be of equal length")

    keyed_frames = []
    for parts, frame in zip(keys, frames):
        # Prepend in reverse so the first name ends up as the first column.
        for name, part in reversed(tuple(zip(names, parts))):
            frame = frame.select(F.lit(part).alias(name), "*")
        keyed_frames.append(frame)

    return functools.reduce(SparkDF.unionByName, keyed_frames)


def _ordered_columns(schemas: Sequence[Mapping[str, str]]) -> list[str]:
    """Union of column names in order of first appearance across frames."""
    seen: dict[str, None] = {}
    for schema in schemas:
        for name in schema:
            seen.setdefault(name)
    return list(seen)


def _schemas_equal(schemas: Sequence[Mapping[str, str]], warn: bool = False) -> bool:
    """True if all frames share an identical schema (names + dtypes).

    When ``warn=True``, emits :class:`UnequalSchemaWarning` for columns whose
    *present* dtypes actually differ (pure missing-column drift coerces
    silently — reference ``concat.py:273-290``).
    """
    if all(schema == schemas[0] for schema in schemas[1:]):
        return True

    if warn:
        conflicted = {}
        for column in _ordered_columns(schemas):
            dtypes = [s.get(column) for s in schemas]
            if len({d for d in dtypes if d is not None}) > 1:
                conflicted[column] = dtypes
        if conflicted:
            detail = "\n".join(
                f"  {column}: {dtypes}" for column, dtypes in conflicted.items()
            )
            warnings.warn(
                "column dtypes in the schemas are not equal, attempting to"
                f" coerce\n\n{detail}",
                UnequalSchemaWarning,
                stacklevel=3,
            )
    return False


def _get_final_schema(schemas: Sequence[Mapping[str, str]]) -> list[tuple[str, str]]:
    """Resolve the unified (name, dtype) schema across all frames."""
    final: list[tuple[str, str]] = []
    failures: list[str] = []
    for column in _ordered_columns(schemas):
        dtypes = [schema.get(column) for schema in schemas]
        present = [d for d in dtypes if d is not None]
        if "string" in present:
            final.append((column, "string"))
        elif all((d or "int") in SPARK_NUMBER_TYPES for d in dtypes):
            final.append((column, _largest_number_dtype(present)))
        elif None not in dtypes and len(set(present)) == 1:
            final.append((column, present[0]))
        else:
            failures.append(f"  {column}: {dtypes}")
    if failures:
        raise TypeError(
            "Spark column data type mismatch, can't auto-convert between"
            " types. \n\n" + "\n".join(failures)
        )
    return final


def _largest_number_dtype(dtypes: Sequence[str]) -> str:
    """First (largest) member of :data:`SPARK_NUMBER_TYPES` present."""
    return next(dtype for dtype in SPARK_NUMBER_TYPES if dtype in dtypes)


def _align_frame(frame: SparkDF, final_schema: Sequence[tuple[str, str]]) -> SparkDF:
    """Cast/fill ``frame`` to the final schema (reference ``concat.py:163-206``).

    Mismatched columns are cast in place; columns the frame lacks are appended
    as typed NULLs — so the output column order is the first frame's order
    followed by any columns it was missing, same as the reference.
    """
    current = dict(frame.dtypes)
    for column, dtype in final_schema:
        if current.get(column) == dtype:
            continue
        values = F.col(column) if column in current else F.lit(None)
        frame = frame.withColumn(column, values.cast(dtype))
    return frame
