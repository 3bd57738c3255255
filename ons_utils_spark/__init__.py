"""ons_utils_spark — a PySpark-native analytics toolkit.

Brand-new Spark-3 implementation of the query/data-processing capabilities of
``ONSdigital/ons_utils`` (reference at /root/reference), extended with a full
relational operator surface, LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns) and streaming — all expressed
through the public DataFrame/SQL API so Catalyst/Tungsten/AQE do the physical
planning.

Public surface (mirrors the reference module layout for auditability; see
SURVEY.md §2 for the file:line parity map):

- :mod:`ons_utils_spark.generic` — pure-Python helpers
  (reference ``ons_utils/generic.py``)
- :mod:`ons_utils_spark.decorators` / :mod:`ons_utils_spark.factories` —
  argument-coercion decorators (reference ``decorators.py`` / ``factories.py``)
- :mod:`ons_utils_spark.operators.concat` — schema-coercing multi-DataFrame
  concat (reference ``ons_utils/pyspark/concat.py``)
- :mod:`ons_utils_spark.operators.general` — column helpers, window specs,
  applyInPandas runner (reference ``ons_utils/pyspark/general.py``)
- :mod:`ons_utils_spark.pandas_utils` — MultiIndex reshaping
  (reference ``ons_utils/pandas.py``)
- :mod:`ons_utils_spark.config` — YAML config + validation
  (reference ``ons_utils/config/``)
- :mod:`ons_utils_spark.testing` — tuple-table builders + Case harness
  (reference ``ons_utils/testing.py``, ``tests/conftest.py``)
- :mod:`ons_utils_spark.operators.dedup/similarity/text/multimodal` — the
  LLM-pipeline extension (new; no reference analogue)
- :mod:`ons_utils_spark.streaming` — Structured Streaming extension (new)
"""

from ons_utils_spark.generic import (
    is_non_string_sequence,
    list_convert,
    tuple_convert,
)
from ons_utils_spark.operators.concat import concat, UnequalSchemaWarning

__all__ = [
    "concat",
    "UnequalSchemaWarning",
    "is_non_string_sequence",
    "list_convert",
    "tuple_convert",
]

__version__ = "0.1.0"
