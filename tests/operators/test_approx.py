"""Approximate-aggregate error bounds vs exact values."""

from pyspark.sql import functions as F

from ons_utils_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


class TestApproxAggregates:
    def test_hll_distinct_within_rsd(self, spark):
        li = load_table(spark, SF, "lineitem")
        exact = li.select(F.count_distinct("l_partkey")).collect()[0][0]
        approx = li.select(
            F.approx_count_distinct("l_partkey", rsd=0.02)
        ).collect()[0][0]
        # 3 standard deviations of the configured relative error.
        assert abs(approx - exact) <= max(1, 3 * 0.02 * exact)

    def test_hll_sketches_merge_losslessly(self, spark):
        """Estimate from UNIONED per-group sketches equals the estimate
        of a single sketch over all rows — the mergeability contract
        that makes per-partition sketch storage sound."""
        df = spark.range(20_000).selectExpr("id", "id % 4 AS g")
        merged = (
            df.groupBy("g")
            .agg(F.hll_sketch_agg("id").alias("sk"))
            .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
            .first()["e"]
        )
        direct = df.agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("id")).alias("e")
        ).first()["e"]
        assert merged == direct  # identical sketch state, not just close
        assert abs(merged - 20_000) <= 0.06 * 20_000

    def test_percentile_approx_close_to_exact(self, spark):
        li = load_table(spark, SF, "lineitem")
        exact = li.select(F.percentile("l_quantity", F.lit(0.5))).collect()[0][0]
        approx = li.select(
            F.percentile_approx("l_quantity", F.lit(0.5), F.lit(10000))
        ).collect()[0][0]
        # With accuracy=10000 on ~6k rows the approximation is near-exact.
        assert abs(approx - exact) <= 1.0
