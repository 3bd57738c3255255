"""Array-math function tests (JVM-side dot/norm/cosine)."""

import math

from pyspark.sql import functions as F

from ons_utils_spark.functions.arrays import (
    array_dot,
    array_l2_norm,
    cosine_similarity,
)


def _pair(spark, a, b):
    return spark.createDataFrame(
        [(a, b)], "a array<float>, b array<float>"
    )


class TestArrayMath:
    def test_dot(self, spark):
        df = _pair(spark, [1.0, 2.0, 3.0], [4.0, 5.0, 6.0])
        assert df.select(array_dot("a", "b").alias("d")).collect()[0]["d"] == 32.0

    def test_norm(self, spark):
        df = _pair(spark, [3.0, 4.0], [0.0, 0.0])
        assert df.select(array_l2_norm("a").alias("n")).collect()[0]["n"] == 5.0

    def test_cosine_identical_is_one(self, spark):
        df = _pair(spark, [0.5, 0.5], [0.5, 0.5])
        v = df.select(cosine_similarity("a", "b").alias("c")).collect()[0]["c"]
        assert math.isclose(v, 1.0)

    def test_cosine_orthogonal_is_zero(self, spark):
        df = _pair(spark, [1.0, 0.0], [0.0, 1.0])
        v = df.select(cosine_similarity("a", "b").alias("c")).collect()[0]["c"]
        assert v == 0.0

    def test_zero_norm_gives_null(self, spark):
        df = _pair(spark, [1.0, 0.0], [0.0, 0.0])
        v = df.select(cosine_similarity("a", "b").alias("c")).collect()[0]["c"]
        assert v is None

    def test_stays_jvm_side(self, spark):
        df = _pair(spark, [1.0], [2.0])
        plan = (
            df.select(cosine_similarity("a", "b"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Python" not in plan
