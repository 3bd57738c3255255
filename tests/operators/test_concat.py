"""Flagship `concat` parity tests.

Covers the semantics pinned by the reference's 458-line
``tests/pyspark/test_concat.py`` (SURVEY.md §2/§3.1): list/mapping inputs,
single- and multi-part lineage keys, missing-column null fill, numeric
widening, string coercion, the decimal-tops lattice quirk, warning emission,
and the negative paths.
"""

import warnings

import pytest
from pyspark.sql import functions as F

from ons_utils_spark.operators.concat import (
    SPARK_NUMBER_TYPES,
    UnequalSchemaWarning,
    concat,
    _get_final_schema,
    _largest_number_dtype,
)
from ons_utils_spark.testing import assert_df_equality, create_spark_df


@pytest.fixture()
def french(spark):
    return create_spark_df(
        spark,
        [
            ("name", "tang", "creaminess"),
            ("brie", 1, 4),
            ("roquefort", 5, 2),
        ],
    )


@pytest.fixture()
def greek(spark):
    return create_spark_df(
        spark,
        [
            ("name", "tang", "creaminess"),
            ("feta", 2, 1),
            ("halloumi", 1, 1),
        ],
    )


@pytest.fixture()
def italian_other_cols(spark):
    return create_spark_df(
        spark,
        [
            ("name", "creaminess", "saltiness"),
            ("mozzarella", 4, 3),
            ("ricotta", 5, 1),
        ],
    )


class TestConcatHappyPath:
    def test_plain_union_of_list(self, spark, french, greek):
        result = concat([french, greek])
        expected = create_spark_df(
            spark,
            [
                ("name", "tang", "creaminess"),
                ("brie", 1, 4),
                ("roquefort", 5, 2),
                ("feta", 2, 1),
                ("halloumi", 1, 1),
            ],
        )
        assert_df_equality(result, expected, ignore_row_order=True)

    def test_mapping_input_creates_key_column(self, spark, french, greek):
        result = concat({"french": french, "greek": greek}, names="country")
        expected = create_spark_df(
            spark,
            [
                ("country", "name", "tang", "creaminess"),
                ("french", "brie", 1, 4),
                ("french", "roquefort", 5, 2),
                ("greek", "feta", 2, 1),
                ("greek", "halloumi", 1, 1),
            ],
        )
        assert_df_equality(result, expected, ignore_row_order=True)

    def test_list_input_with_keys(self, spark, french, greek):
        result = concat([french, greek], keys=["fr", "gr"], names="country")
        assert result.columns[0] == "country"
        assert result.where(F.col("country") == "fr").count() == 2

    def test_multi_part_keys(self, spark, french, greek):
        result = concat(
            {("french", "yes"): french, ("greek", "no"): greek},
            names=["country", "tasted"],
        )
        assert result.columns[:2] == ["country", "tasted"]
        expected_keys = {("french", "yes"), ("greek", "no")}
        actual_keys = {
            (r["country"], r["tasted"])
            for r in result.select("country", "tasted").distinct().collect()
        }
        assert actual_keys == expected_keys

    def test_mapping_subset_by_keys(self, spark, french, greek):
        result = concat(
            {"french": french, "greek": greek}, keys=["greek"], names="country"
        )
        assert result.count() == 2
        assert result.select("country").distinct().collect()[0][0] == "greek"

    def test_generator_input_accepted(self, spark, french, greek):
        result = concat(df for df in [french, greek])
        assert result.count() == 4


class TestConcatSchemaCoercion:
    def test_missing_columns_filled_with_typed_nulls(
        self, spark, french, italian_other_cols
    ):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            result = concat([french, italian_other_cols])
        assert set(result.columns) == {"name", "tang", "creaminess", "saltiness"}
        row = result.where(F.col("name") == "mozzarella").collect()[0]
        assert row["tang"] is None
        assert dict(result.dtypes)["saltiness"] == "bigint"
        row = result.where(F.col("name") == "brie").collect()[0]
        assert row["saltiness"] is None

    def test_numeric_widening_int_to_double(self, spark):
        ints = create_spark_df(
            spark, [("breed", "weight"), ("schnauzer", 7), ("chihuahua", 2)]
        )
        doubles = create_spark_df(
            spark, [("breed", "weight"), ("puli", 13.4), ("doberman", 14.8)]
        )
        with pytest.warns(UnequalSchemaWarning):
            result = concat([ints, doubles])
        assert dict(result.dtypes)["weight"] == "double"
        values = {r["weight"] for r in result.collect()}
        assert values == {7.0, 2.0, 13.4, 14.8}

    def test_string_coercion_wins(self, spark):
        strings = create_spark_df(
            spark, [("store_type", "branch"), ("online", "a")]
        )
        numbers = create_spark_df(spark, [("store_type", "branch"), (5, "b")])
        mixed = spark.createDataFrame(
            [(6, 3.2)], schema="store_type bigint, branch double"
        )
        with pytest.warns(UnequalSchemaWarning):
            result = concat([strings, numbers, mixed])
        dtypes = dict(result.dtypes)
        assert dtypes["store_type"] == "string"
        assert dtypes["branch"] == "string"
        assert {r["store_type"] for r in result.collect()} == {"online", "5", "6"}

    def test_decimal_outranks_double_quirk(self):
        # Reference quirk (concat.py:24-33, test_concat.py:452-455).
        assert (
            _largest_number_dtype(["double", "double", "decimal(10,0)"])
            == "decimal(10,0)"
        )
        assert SPARK_NUMBER_TYPES[0] == "decimal(10,0)"

    def test_missing_column_numeric_eligibility_and_widening(self):
        # Missing entries count as 'int' for the all-numeric ELIGIBILITY check
        # only (reference concat.py:224 fillna); the final dtype is the
        # largest among the dtypes actually present.
        schemas = [{"a": "smallint"}, {"b": "tinyint", "a": "smallint"}]
        assert _get_final_schema(schemas) == [("a", "smallint"), ("b", "tinyint")]

    def test_equal_non_numeric_dtypes_pass_through(self, spark):
        t1 = spark.createDataFrame([("2021-01-01",)], "d string").select(
            F.col("d").cast("timestamp")
        )
        t2 = spark.createDataFrame([("2022-01-01",)], "d string").select(
            F.col("d").cast("timestamp")
        )
        result = concat([t1, t2])
        assert result.count() == 2


class TestConcatNegativePaths:
    def test_empty_input_raises(self):
        with pytest.raises(ValueError, match="No objects to concatenate"):
            concat([])

    def test_single_dataframe_raises_type_error(self, french):
        with pytest.raises(TypeError, match="iterable"):
            concat(french)

    def test_non_dataframe_element_raises(self, french):
        with pytest.raises(TypeError, match="cannot concatenate"):
            concat([french, "not a df"])

    def test_mapping_without_names_raises(self, french):
        with pytest.raises(ValueError, match="names argument must be given"):
            concat({"a": french})

    def test_keys_length_mismatch_raises(self, french, greek):
        with pytest.raises(ValueError, match="keys must be same length"):
            concat([french, greek], keys=["only-one"], names="country")

    def test_key_parts_vs_names_mismatch_raises(self, french, greek):
        with pytest.raises(ValueError, match="length of each key"):
            concat(
                [french, greek],
                keys=[("a", "b"), ("c", "d")],
                names="country",
            )

    def test_uncoercible_dtypes_raise(self, spark):
        ts = spark.createDataFrame([("2021-01-01",)], "x string").select(
            F.col("x").cast("timestamp")
        )
        flag = spark.createDataFrame([(True,)], "x boolean")
        with pytest.raises(TypeError, match="data type mismatch"):
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                concat([ts, flag])

    def test_warning_emitted_on_dtype_drift(self, spark):
        a = create_spark_df(spark, [("v",), (1,)])
        b = create_spark_df(spark, [("v",), (1.5,)])
        with pytest.warns(UnequalSchemaWarning, match="attempting to coerce"):
            concat([a, b])
