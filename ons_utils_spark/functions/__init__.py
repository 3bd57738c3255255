from ons_utils_spark.functions.arrays import (
    array_dot,
    array_l2_norm,
    cosine_similarity,
)

__all__ = ["array_dot", "array_l2_norm", "cosine_similarity"]
