"""Python Data Source tests: schema, parallel partitions, partition-count
invariance, and source-side filter pushdown."""

import pytest
from pyspark.sql import functions as F

from ons_utils_spark.sources.pysource import (
    SyntheticDocsDataSource,
    SyntheticDocsReader,
)


@pytest.fixture(scope="module", autouse=True)
def registered(spark):
    spark.dataSource.register(SyntheticDocsDataSource)
    # The shared test session may predate the session-default flag.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")


def _read(spark, **options):
    reader = spark.read.format("synthetic_docs")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


class TestSyntheticDocsSource:
    def test_row_count_and_schema(self, spark):
        df = _read(spark, rows=500)
        assert df.count() == 500
        assert df.columns == ["doc_id", "text", "lang", "source", "n_chars"]
        row = df.where(F.col("doc_id") == 7).first()
        assert row["n_chars"] == len(row["text"])

    def test_partition_count_invariance(self, spark):
        a = sorted(_read(spark, rows=300, partitions=2).collect())
        b = sorted(_read(spark, rows=300, partitions=13).collect())
        assert a == b

    def test_reads_are_parallel(self, spark):
        df = _read(spark, rows=1000, partitions=6)
        parts = df.select(F.spark_partition_id().alias("p")).distinct().count()
        assert parts == 6

    def test_seed_changes_content_not_ids(self, spark):
        a = {r["doc_id"]: r["text"] for r in _read(spark, rows=100, seed=1).collect()}
        b = {r["doc_id"]: r["text"] for r in _read(spark, rows=100, seed=2).collect()}
        assert set(a) == set(b) == set(range(100))
        assert a != b

    def test_lang_filter_pushes_to_source(self, spark):
        """The reader object must receive and absorb the lang equality:
        unit-level check of pushFilters plus an end-to-end result match."""
        from pyspark.sql.datasource import EqualTo, GreaterThan

        reader = SyntheticDocsReader({"rows": "100"})
        remaining = list(
            reader.pushFilters(
                [EqualTo(("lang",), "en"), GreaterThan(("doc_id",), 10)]
            )
        )
        assert reader.eq == {"lang": "en"}
        assert [type(f).__name__ for f in remaining] == ["GreaterThan"]

        full = _read(spark, rows=400)
        pushed = _read(spark, rows=400).where(F.col("lang") == "en")
        expect = {r["doc_id"] for r in full.collect() if r["lang"] == "en"}
        assert {r["doc_id"] for r in pushed.collect()} == expect
        assert pushed.count() < 400  # the filter actually selects a subset
