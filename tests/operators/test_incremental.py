"""Incremental aggregate maintenance: merge associativity and shape."""

import pytest
from pyspark.sql import functions as F

from ons_utils_spark.operators.incremental import aggregate_batch, merge_aggregates

KEYS = ["g"]
MEASURES = {"count": ["*"], "sum": ["v"], "min": ["v"], "max": ["v"]}


@pytest.fixture()
def batches(spark):
    rows = [(i, "ab"[i % 2], float(i)) for i in range(30)]
    df = spark.createDataFrame(rows, "id bigint, g string, v double")
    return df, [df.where(F.col("id") < 10),
                df.where((F.col("id") >= 10) & (F.col("id") < 17)),
                df.where(F.col("id") >= 17)]


def _table(df):
    return {
        r["g"]: (r["n"], r["sum_v"], r["min_v"], r["max_v"])
        for r in df.collect()
    }


class TestMergeAggregates:
    def test_batchwise_equals_oneshot(self, spark, batches):
        full, parts = batches
        stored = aggregate_batch(parts[0], KEYS, MEASURES)
        for b in parts[1:]:
            stored = merge_aggregates(
                stored, aggregate_batch(b, KEYS, MEASURES), KEYS, MEASURES
            )
        assert _table(stored) == _table(aggregate_batch(full, KEYS, MEASURES))

    def test_merge_order_invariant(self, spark, batches):
        _, parts = batches
        aggs = [aggregate_batch(b, KEYS, MEASURES) for b in parts]
        forward = merge_aggregates(
            merge_aggregates(aggs[0], aggs[1], KEYS, MEASURES), aggs[2],
            KEYS, MEASURES,
        )
        backward = merge_aggregates(
            merge_aggregates(aggs[2], aggs[1], KEYS, MEASURES), aggs[0],
            KEYS, MEASURES,
        )
        assert _table(forward) == _table(backward)

    def test_new_key_in_late_batch_appears(self, spark):
        a = spark.createDataFrame([(1, "x", 1.0)], "id bigint, g string, v double")
        b = spark.createDataFrame([(2, "y", 5.0)], "id bigint, g string, v double")
        merged = merge_aggregates(
            aggregate_batch(a, KEYS, MEASURES),
            aggregate_batch(b, KEYS, MEASURES),
            KEYS, MEASURES,
        )
        assert _table(merged) == {"x": (1, 1.0, 1.0, 1.0), "y": (1, 5.0, 5.0, 5.0)}

    def test_unknown_measure_raises(self, spark, batches):
        full, _ = batches
        with pytest.raises(ValueError, match="unknown measure"):
            aggregate_batch(full, KEYS, {"median": ["v"]})
        with pytest.raises(ValueError, match="non-empty"):
            aggregate_batch(full, KEYS, {})


class TestTableDiff:
    def _old(self, spark):
        return spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
            "k int, s string, v double",
        )

    def test_classifies_all_three(self, spark):
        from ons_utils_spark.operators.incremental import table_diff

        new = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 99.0), (4, "d", 40.0)],
            "k int, s string, v double",
        )
        got = {
            r["k"]: r["change"]
            for r in table_diff(self._old(spark), new, ["k"]).collect()
        }
        # 1 unchanged (omitted), 2 changed, 3 removed, 4 added
        assert got == {2: "changed", 3: "removed", 4: "added"}

    def test_null_vs_empty_string_distinct(self, spark):
        from ons_utils_spark.operators.incremental import table_diff

        old = spark.createDataFrame([(1, None)], "k int, s string")
        new = spark.createDataFrame([(1, "")], "k int, s string")
        got = table_diff(old, new, ["k"]).collect()
        assert [(r["k"], r["change"]) for r in got] == [(1, "changed")]

    def test_duplicate_row_multiset_changes_detected(self, spark):
        """A plain xor of row digests cancels identical-row PAIRS:
        {A, A, B} → {B} would read unchanged. The multiset fingerprint
        (multiplicity folded into each xor term) must catch it."""
        from ons_utils_spark.operators.incremental import table_diff

        old = spark.createDataFrame(
            [(1, "A"), (1, "A"), (1, "B")], "k int, s string"
        )
        new = spark.createDataFrame([(1, "B")], "k int, s string")
        got = table_diff(old, new, ["k"]).collect()
        assert [(r["k"], r["change"]) for r in got] == [(1, "changed")]

    def test_duplicate_multiplicity_change_detected(self, spark):
        from ons_utils_spark.operators.incremental import table_diff

        old = spark.createDataFrame([(1, "A"), (1, "A")], "k int, s string")
        new = spark.createDataFrame(
            [(1, "A"), (1, "A"), (1, "A"), (1, "A")], "k int, s string"
        )
        got = table_diff(old, new, ["k"]).collect()
        assert [(r["k"], r["change"]) for r in got] == [(1, "changed")]

    def test_identical_duplicate_multiset_unchanged(self, spark):
        from ons_utils_spark.operators.incremental import table_diff

        old = spark.createDataFrame([(1, "A"), (1, "A")], "k int, s string")
        new = spark.createDataFrame([(1, "A"), (1, "A")], "k int, s string")
        assert table_diff(old, new, ["k"]).collect() == []

    def test_compare_cols_subset(self, spark):
        from ons_utils_spark.operators.incremental import table_diff

        new = spark.createDataFrame(
            [(1, "X", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
            "k int, s string, v double",
        )
        # comparing only v: the s change is invisible
        got = table_diff(self._old(spark), new, ["k"], compare_cols=["v"]).collect()
        assert got == []


class TestTableDiffSeparatorCollision:
    def test_boundary_shift_detected(self, spark):
        from ons_utils_spark.operators.incremental import table_diff

        old = spark.createDataFrame([(1, "a\x1fb", "c")], "k int, x string, y string")
        new = spark.createDataFrame([(1, "a", "b\x1fc")], "k int, x string, y string")
        got = table_diff(old, new, ["k"]).collect()
        assert [(r["k"], r["change"]) for r in got] == [(1, "changed")]

    def test_literal_null_sentinel_string_differs_from_null(self, spark):
        from ons_utils_spark.operators.incremental import table_diff

        old = spark.createDataFrame([(1, "NULL")], "k int, s string")
        new = spark.createDataFrame([(1, None)], "k int, s string")
        got = table_diff(old, new, ["k"]).collect()
        assert [(r["k"], r["change"]) for r in got] == [(1, "changed")]
