from ons_utils_spark.plans.queries import QUERIES, EngineQuery, register

__all__ = ["QUERIES", "EngineQuery", "register"]
