"""Column-helper / window / applyInPandas parity tests
(reference ``tests/pyspark/test_general.py``)."""

import pandas as pd
import pytest
from pyspark.sql import Column, functions as F

from ons_utils_spark.operators.general import (
    convert_to_spark_col,
    diff,
    get_ddl_schema,
    get_fields,
    get_first_group,
    get_window_spec,
    grouped_apply,
    lookup_join,
    map_col,
    map_column_names,
    to_list,
    transform,
)
from ons_utils_spark.testing import assert_df_equality, create_spark_df


class TestConvertToSparkCol:
    # F.col requires an active session in Spark 4 — take the fixture even
    # though no data is involved, so these tests are order-independent.
    def test_string_becomes_column(self, spark):
        assert isinstance(convert_to_spark_col("a"), Column)

    def test_column_passes_through(self, spark):
        col = F.col("a")
        assert convert_to_spark_col(col) is col

    @pytest.mark.parametrize("bad", [1, 1.5, float("nan"), None, ["a"]])
    def test_other_types_raise(self, bad):
        with pytest.raises(ValueError, match="expecting a string or pyspark column"):
            convert_to_spark_col(bad)


class TestMapCol:
    def test_maps_values_and_nulls_unmatched(self, spark):
        df = create_spark_df(spark, [("code",), (1,), (2,), (9,)])
        result = df.select("code", map_col("code", {1: "one", 2: "two"}).alias("word"))
        expected = create_spark_df(
            spark,
            [("code", "word"), (1, "one"), (2, "two"), (9, None)],
        )
        assert_df_equality(result, expected, ignore_row_order=True)

    def test_sequence_values_become_arrays(self, spark):
        df = create_spark_df(spark, [("k",), ("a",)])
        result = df.select(map_col("k", {"a": [1, 2]}).alias("arr")).collect()
        assert result[0]["arr"] == [1, 2]


class TestLookupJoin:
    def test_matches_map_col_semantics(self, spark):
        df = create_spark_df(spark, [("code",), (1,), (2,), (9,)])
        result = lookup_join(df, "code", {1: "one", 2: "two"}, "word")
        expected = create_spark_df(
            spark,
            [("code", "word"), (1, "one"), (2, "two"), (9, None)],
        )
        assert_df_equality(result, expected, ignore_row_order=True)


class TestMapColumnNames:
    def test_renames_mapped_keeps_rest(self, spark):
        df = create_spark_df(spark, [("a", "b", "c"), (1, 2, 3)])
        result = map_column_names(df, {"a": "x", "c": "z"})
        assert result.columns == ["x", "b", "z"]


class TestWindowSpec:
    def test_partitioned_window_sum(self, spark):
        df = create_spark_df(
            spark,
            [("g", "v"), ("a", 1), ("a", 2), ("b", 10)],
        )
        result = df.withColumn("total", F.sum("v").over(get_window_spec("g")))
        expected = create_spark_df(
            spark,
            [("g", "v", "total"), ("a", 1, 3), ("a", 2, 3), ("b", 10, 10)],
        )
        assert_df_equality(result, expected, ignore_row_order=True)

    def test_global_window(self, spark):
        df = create_spark_df(spark, [("v",), (1,), (2,), (3,)])
        result = df.withColumn("total", F.sum("v").over(get_window_spec()))
        assert {r["total"] for r in result.collect()} == {6}

    def test_ordered_window(self, spark):
        df = create_spark_df(
            spark, [("g", "v"), ("a", 2), ("a", 1), ("b", 5)]
        )
        w = get_window_spec("g", order_by="v")
        result = df.withColumn("rank", F.row_number().over(w))
        rows = {(r["g"], r["v"]): r["rank"] for r in result.collect()}
        assert rows[("a", 1)] == 1 and rows[("a", 2)] == 2


class TestDdlSchemaAndFields:
    def test_get_ddl_schema(self):
        ddl = get_ddl_schema([("a", "int"), ("b", "string")])
        assert ddl == "a int,\nb string"

    def test_get_fields_returns_pairs(self, spark):
        df = create_spark_df(spark, [("a", "b"), (1, "x")])
        assert get_fields(df) == [("a", "bigint"), ("b", "string")]

    def test_get_fields_with_selection_orders(self, spark):
        df = create_spark_df(spark, [("a", "b"), (1, "x")])
        assert get_fields(df, ["b", "a"]) == [("b", "string"), ("a", "bigint")]


class TestToList:
    def test_single_column_flat_list(self, spark):
        df = create_spark_df(spark, [("v",), (1,), (2,)])
        assert sorted(to_list(df)) == [1, 2]

    def test_multi_column_row_lists(self, spark):
        df = create_spark_df(spark, [("a", "b"), (1, "x")])
        assert to_list(df) == [[1, "x"]]


class TestTransform:
    def test_chains_function(self, spark):
        df = create_spark_df(spark, [("v",), (1,), (2,)])
        result = transform(df, lambda d, n: d.where(F.col("v") > n), 1)
        assert result.count() == 1


class TestGetFirstGroup:
    def test_filters_to_first_group(self, spark):
        df = create_spark_df(
            spark,
            [("g", "v"), ("a", 1), ("a", 2), ("b", 3)],
        ).orderBy("g")
        result = get_first_group(df, "g")
        groups = {r["g"] for r in result.collect()}
        assert len(groups) == 1

    def test_handles_quotes_in_values(self, spark):
        # The reference's f-string SQL breaks here; Column predicates don't.
        df = create_spark_df(spark, [("g", "v"), ("o'brien", 1), ("o'brien", 2)])
        assert get_first_group(df, "g").count() == 2


class TestGroupedApply:
    def test_runs_pandas_function_per_group(self, spark):
        df = create_spark_df(
            spark,
            [("g", "v"), ("a", 1.0), ("a", 3.0), ("b", 10.0)],
        )

        def demean(pdf: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"demeaned": pdf["v"] - pdf["v"].mean()})

        result = grouped_apply(df, demean, "g string, demeaned double", "g")
        expected = create_spark_df(
            spark,
            [
                ("g", "demeaned"),
                ("a", -1.0),
                ("a", 1.0),
                ("b", 0.0),
            ],
        )
        assert_df_equality(result, expected, ignore_row_order=True)

    def test_args_kwargs_passed(self, spark):
        df = create_spark_df(spark, [("g", "v"), ("a", 1.0)])

        def scale(pdf, factor, offset=0.0):
            return pd.DataFrame({"scaled": pdf["v"] * factor + offset})

        result = grouped_apply(
            df, scale, "g string, scaled double", "g",
            args=[2.0], kwargs={"offset": 1.0},
        )
        assert result.collect()[0]["scaled"] == 3.0

    def test_keep_index(self, spark):
        df = create_spark_df(spark, [("g", "v"), ("a", 1.0), ("a", 2.0)])

        def agg_with_index(pdf):
            out = pdf.groupby("g")[["v"]].sum()
            out.index.name = "g_idx"
            return out

        result = grouped_apply(
            df, agg_with_index, "g string, g_idx string, v double", "g",
            keep_index=True,
        )
        row = result.collect()[0]
        assert row["g_idx"] == "a" and row["v"] == 3.0

    def test_batched_matches_classic_multi_key(self, spark):
        rows = [("g", "h", "v")] + [
            ("g%d" % (i % 7), "h%d" % (i % 3), float(i)) for i in range(200)
        ]
        df = create_spark_df(spark, rows)

        def share(pdf):
            return pd.DataFrame(
                {"v": pdf["v"], "share": pdf["v"] / pdf["v"].sum()}
            )

        schema = "g string, h string, v double, share double"
        batched = grouped_apply(df, share, schema, ["g", "h"])
        classic = grouped_apply(df, share, schema, ["g", "h"], batched=False)
        assert_df_equality(batched, classic, ignore_row_order=True)

    def test_batched_group_spanning_arrow_batches(self, spark):
        """A group larger than maxRecordsPerBatch must still reach func as
        ONE complete pandas frame (the carry across Arrow batches)."""
        old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "5")
        try:
            rows = [("g", "v")] + [
                ("a" if i < 23 else "b", float(i)) for i in range(30)
            ]
            df = create_spark_df(spark, rows).coalesce(1)

            def group_size(pdf):
                return pd.DataFrame({"n": [len(pdf)], "s": [pdf["v"].sum()]})

            got = {
                r["g"]: (r["n"], r["s"])
                for r in grouped_apply(
                    df, group_size, "g string, n long, s double", "g"
                ).collect()
            }
            assert got == {
                "a": (23, float(sum(range(23)))),
                "b": (7, float(sum(range(23, 30)))),
            }
        finally:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    def test_null_group_key_batched_matches_classic(self, spark):
        """NULL group keys are real groups: the batched path must deliver
        them to func exactly like applyInPandas does (pandas groupby
        dropna default would silently drop them — ADVICE r1)."""
        df = create_spark_df(
            spark,
            [("g", "v"), (None, 5.0), ("a", 1.0), (None, 7.0), ("a", 3.0)],
        )

        def total(pdf):
            return pd.DataFrame({"s": [pdf["v"].sum()]})

        schema = "g string, s double"
        batched = grouped_apply(df, total, schema, "g")
        classic = grouped_apply(df, total, schema, "g", batched=False)
        assert_df_equality(batched, classic, ignore_row_order=True)
        got = {r["g"]: r["s"] for r in batched.collect()}
        assert got == {None: 12.0, "a": 4.0}

    @pytest.mark.parametrize("batched", [True, False])
    def test_python_stage_parallel_under_aqe(self, spark, batched):
        """The Python stage must NOT collapse to one partition under AQE.

        r2 verdict: a count-less ``repartition(*groups)`` is eligible for
        AQE byte-based coalescing; the stage's bytes are tiny while its CPU
        is Python-per-group, so AQE collapsed ~15k groups onto ONE core
        (measured 3.4× slower). The explicit-count repartition is exempt.
        spark_partition_id() read on the stage's own output (before any
        later exchange) reveals the Python stage's real partition count.
        """
        rows = [("g", "v")] + [(f"g{i % 50}", float(i)) for i in range(500)]
        df = create_spark_df(spark, rows)

        def ident(pdf):
            return pdf[["v"]]

        out = grouped_apply(
            df, ident, "g string, v double", "g", batched=batched
        )
        n_parts = (
            out.withColumn("pid", F.spark_partition_id())
            .select("pid")
            .distinct()
            .count()
        )
        assert n_parts > 1


class TestDiff:
    def test_consecutive_differences(self, spark):
        df = spark.createDataFrame([([1.0, 3.0, 6.0],)], "a array<float>")
        result = df.select(diff("a").alias("d")).collect()[0]["d"]
        assert result == [2.0, 3.0]

    def test_short_arrays_give_empty(self, spark):
        df = spark.createDataFrame([([1.0],), ([],)], "a array<float>")
        values = [r["d"] for r in df.select(diff("a").alias("d")).collect()]
        assert values == [[], []]

    def test_null_gives_null(self, spark):
        df = spark.createDataFrame([(None,)], "a array<float>")
        assert df.select(diff("a").alias("d")).collect()[0]["d"] is None

    def test_stays_jvm_side(self, spark):
        # No BatchEvalPython / ArrowEvalPython node: the op must not leave the JVM.
        df = spark.createDataFrame([([1.0, 2.0],)], "a array<float>")
        plan = df.select(diff("a").alias("d"))._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan


class TestRobustOutliers:
    def test_flags_wild_value_not_spread(self, spark):
        from ons_utils_spark.operators.general import robust_outliers

        # Group g: nine values near 10, one wild 1000. Median 10, MAD ~1;
        # the wild row's robust z is huge while normal rows stay small.
        rows = [(i, "g", 9.0 + (i % 3)) for i in range(9)] + [(9, "g", 1000.0)]
        df = spark.createDataFrame(rows, "id bigint, g string, v double")
        out = {r["id"]: r for r in robust_outliers(df, "g", "v").collect()}
        assert out[9]["is_outlier"]
        assert not any(out[i]["is_outlier"] for i in range(9))

    def test_constant_group_has_no_outliers(self, spark):
        from ons_utils_spark.operators.general import robust_outliers

        df = spark.createDataFrame(
            [(i, "c", 5.0) for i in range(4)], "id bigint, g string, v double"
        )
        out = robust_outliers(df, "g", "v").collect()
        assert all(not r["is_outlier"] and r["robust_z"] == 0.0 for r in out)

    def test_null_group_forms_its_own_group(self, spark):
        from ons_utils_spark.operators.general import robust_outliers

        df = spark.createDataFrame(
            [(1, None, 1.0), (2, None, 2.0), (3, None, 100.0), (4, "g", 1.0)],
            "id bigint, g string, v double",
        )
        out = {r["id"]: r for r in robust_outliers(df, "g", "v").collect()}
        assert len(out) == 4  # null-group rows are scored, not dropped
        assert out[3]["is_outlier"]


class TestFkViolations:
    def test_missing_parents_surface(self, spark):
        from ons_utils_spark.operators.general import fk_violations

        child = spark.createDataFrame(
            [(1, 10), (2, 20), (3, 30), (4, None)],
            "id bigint, fk bigint",
        )
        parent = spark.createDataFrame([(10,), (30,)], "pk bigint")
        bad = {r["id"] for r in fk_violations(child, parent, ["fk"], ["pk"]).collect()}
        assert bad == {2, 4}  # missing parent AND the NULL FK

    def test_clean_data_yields_empty(self, spark):
        from ons_utils_spark.operators.general import fk_violations

        child = spark.createDataFrame([(1, 10)], "id bigint, fk bigint")
        parent = spark.createDataFrame([(10,), (11,)], "pk bigint")
        assert fk_violations(child, parent, ["fk"], ["pk"]).count() == 0

    def test_composite_keys_and_arity_guard(self, spark):
        import pytest as _pytest

        from ons_utils_spark.operators.general import fk_violations

        child = spark.createDataFrame(
            [(1, "a", 1), (2, "a", 2)], "id bigint, k1 string, k2 bigint"
        )
        parent = spark.createDataFrame([("a", 1)], "p1 string, p2 bigint")
        bad = {r["id"] for r in fk_violations(
            child, parent, ["k1", "k2"], ["p1", "p2"]).collect()}
        assert bad == {2}
        with _pytest.raises(ValueError, match="align"):
            fk_violations(child, parent, ["k1"], ["p1", "p2"])
