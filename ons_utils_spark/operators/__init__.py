from ons_utils_spark.operators.concat import concat, UnequalSchemaWarning

__all__ = ["concat", "UnequalSchemaWarning"]
