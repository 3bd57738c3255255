"""Skew-mitigation helpers: salted joins and explicit repartitioning.

Part of the 100 TB design surface (SURVEY.md §7): AQE's skew-join splitting
(`spark.sql.adaptive.skewJoin.enabled`, on by default in
:mod:`ons_utils_spark.session`) handles sort-merge skew at runtime; salting
is the explicit fallback for the cases AQE can't fix — a broadcast-ineligible
build side with a handful of hot keys, or skewed aggregations.

How salting works: the skewed (probe) side gets a random salt in
``[0, salt_factor)``; the build side is replicated ``salt_factor`` times,
once per salt value; the join key becomes ``(key, salt)``, spreading each
hot key over ``salt_factor`` tasks. Replication cost × salt_factor on the
small side buys even task sizes on the big side.
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import DataFrame as SparkDF, functions as F

from ons_utils_spark.generic import list_convert


def with_salt(df: SparkDF, salt_factor: int, salt_col: str = "__salt") -> SparkDF:
    """Attach a uniform random salt in ``[0, salt_factor)``.

    Deterministic per row is NOT required for correctness (any distribution
    works); ``rand`` is seeded for reproducible tests.
    """
    return df.withColumn(
        salt_col, (F.rand(seed=42) * salt_factor).cast("int")
    )


def replicate_for_salt(
    df: SparkDF, salt_factor: int, salt_col: str = "__salt"
) -> SparkDF:
    """Replicate every row once per salt value (build side of a salted join)."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)))
    return df.withColumn(salt_col, salts)


def salted_join(
    skewed: SparkDF,
    other: SparkDF,
    on: Union[str, Sequence[str]],
    salt_factor: int = 8,
    how: str = "inner",
) -> SparkDF:
    """Equi-join where ``skewed``'s hot keys are spread over ``salt_factor``
    tasks.

    ``other`` (the smaller / even side) is replicated ``salt_factor`` times;
    result equals ``skewed.join(other, on, how)`` exactly. Supports inner
    and left joins (the skewed side must be the preserved side).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left'")
    on = list_convert(on)
    left = with_salt(skewed, salt_factor)
    right = replicate_for_salt(other, salt_factor)
    out = left.join(right, [*on, "__salt"], how)
    return out.drop("__salt")


def repartition_by_key(
    df: SparkDF,
    cols: Union[str, Sequence[str]],
    num_partitions: int | None = None,
) -> SparkDF:
    """Hash-repartition on key columns (pre-shuffle for repeated co-located
    operations on the same key — pays one shuffle to save N)."""
    cols = [F.col(c) for c in list_convert(cols)]
    if num_partitions:
        return df.repartition(num_partitions, *cols)
    return df.repartition(*cols)
