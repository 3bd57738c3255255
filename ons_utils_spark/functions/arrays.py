"""JVM-side array math via higher-order functions (no Python UDFs).

Built for the similarity-search surface over ``embeddings.embedding``
(``array<float>``). All math is done in ``double`` inside Catalyst
expressions — ``zip_with`` + ``aggregate`` fold — so it runs in whole-stage
codegen with zero Python-worker involvement. The fold is a sequential
left-to-right sum per row, which makes results reproducible (and comparable
with DuckDB's ``list_dot_product`` on ``DOUBLE[]``, which sums in the same
order).

No reference analogue (the reference's only array op is the ``np.diff`` UDF,
``ons_utils/pyspark/udfs.py:7-10``); this is part of the LLM-pipeline
extension surface (SURVEY.md §7 item 7).
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import Column as SparkCol, functions as F


def _as_double_array(col: SparkCol) -> SparkCol:
    return F.transform(col, lambda x: x.cast("double"))


def array_dot(a: Union[str, SparkCol], b: Union[str, SparkCol]) -> SparkCol:
    """Dot product of two numeric array columns, computed in double."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    products = F.zip_with(_as_double_array(a), _as_double_array(b), lambda x, y: x * y)
    return F.aggregate(products, F.lit(0.0), lambda acc, x: acc + x)


def array_l2_norm(a: Union[str, SparkCol]) -> SparkCol:
    """Euclidean norm of a numeric array column."""
    return F.sqrt(array_dot(a, a))


def cosine_similarity(a: Union[str, SparkCol], b: Union[str, SparkCol]) -> SparkCol:
    """Cosine similarity of two numeric array columns (double precision).

    Returns NULL if either vector has zero norm.
    """
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    denom = array_l2_norm(a) * array_l2_norm(b)
    return F.when(denom != 0, array_dot(a, b) / denom)
