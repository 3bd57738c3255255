from ons_utils_spark.functions.arrays import (
    array_dot,
    array_l2_norm,
    cosine_similarity,
)
from ons_utils_spark.functions.localrel import local_rows_df

__all__ = [
    "array_dot",
    "array_l2_norm",
    "cosine_similarity",
    "local_rows_df",
]
