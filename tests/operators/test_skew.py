"""Salted-join correctness tests."""

import pytest
from pyspark.sql import functions as F

from ons_utils_spark.operators.skew import (
    replicate_for_salt,
    salted_join,
    with_salt,
)
from ons_utils_spark.testing import assert_df_equality


@pytest.fixture()
def skewed(spark):
    # One hot key (90% of rows) + a tail.
    rows = [(1, f"v{i}") for i in range(90)] + [(k, f"t{k}") for k in range(2, 12)]
    return spark.createDataFrame(rows, "k bigint, payload string")


@pytest.fixture()
def dim(spark):
    return spark.createDataFrame(
        [(k, f"name{k}") for k in range(1, 10)], "k bigint, name string"
    )


class TestSaltedJoin:
    def test_inner_equals_plain_join(self, spark, skewed, dim):
        plain = skewed.join(dim, "k")
        salted = salted_join(skewed, dim, "k", salt_factor=4)
        assert_df_equality(
            salted.select("k", "payload", "name"),
            plain.select("k", "payload", "name"),
            ignore_row_order=True,
        )

    def test_left_keeps_unmatched(self, spark, skewed, dim):
        plain = skewed.join(dim, "k", "left")
        salted = salted_join(skewed, dim, "k", how="left", salt_factor=4)
        assert salted.count() == plain.count()
        assert salted.where(F.col("name").isNull()).count() == plain.where(
            F.col("name").isNull()
        ).count()

    def test_unsupported_how_raises(self, skewed, dim):
        with pytest.raises(ValueError, match="inner.*or.*left"):
            salted_join(skewed, dim, "k", how="full")

    def test_salt_spreads_hot_key(self, spark, skewed):
        salts = (
            with_salt(skewed.where(F.col("k") == 1), 8)
            .select("__salt")
            .distinct()
            .count()
        )
        assert salts > 1  # the hot key occupies multiple salt buckets

    def test_replication_factor(self, spark, dim):
        assert replicate_for_salt(dim, 5).count() == dim.count() * 5
