"""Arrow-batched inference tests: scores, lazy per-worker model loading,
and the vectorized (not row-at-a-time) plan shape."""

import math

import pytest
from pyspark.sql import functions as F

from ons_utils_spark.operators.inference import batch_score, default_model_loader


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the cat is on the mat"),
            (2, "zip zap zop"),
            (3, None),
        ],
        "doc_id bigint, text string",
    )


def _expected(text):
    stop = {"the", "a", "and", "of", "to", "in", "is", "on", "for", "with"}
    ts = (text or "").lower().strip().split()
    ratio = (sum(t in stop for t in ts) / len(ts)) if ts else 0.0
    x = 4.0 * ratio + len(text or "") / 1000.0 - 2.0
    return 1.0 / (1.0 + math.exp(-x))


class TestBatchScore:
    def test_default_model_values(self, spark, docs):
        got = {r["doc_id"]: r["score"] for r in batch_score(docs, "text").collect()}
        for doc_id, text in [(1, "the cat is on the mat"), (2, "zip zap zop"), (3, None)]:
            assert got[doc_id] == pytest.approx(_expected(text), abs=1e-12)

    def test_custom_model_and_out_col(self, spark, docs):
        def loader():
            return lambda s: s.fillna("").str.len().astype("float64")

        got = {
            r["doc_id"]: r["n"]
            for r in batch_score(docs, "text", model_loader=loader, out_col="n").collect()
        }
        assert got == {1: 21.0, 2: 11.0, 3: 0.0}

    def test_model_loads_once_per_worker(self, spark):
        """The loader must run once per Python worker, not per batch: with
        1 partition (one worker task) and several Arrow batches forced via
        maxRecordsPerBatch, the load counter accumulator stays at 1."""
        acc = spark.sparkContext.accumulator(0)

        def loader():
            acc.add(1)
            return lambda s: s.str.len().astype("float64")

        old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10")
        try:
            df = (
                spark.range(100)
                .select(F.col("id").cast("string").alias("text"))
                .coalesce(1)
            )
            batch_score(df, "text", model_loader=loader).agg(
                F.sum("score")
            ).collect()
        finally:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
        assert acc.value == 1

    def test_plan_is_arrow_vectorized(self, spark, docs):
        plan = (
            batch_score(docs, "text")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "ArrowEvalPython" in plan
        assert "BatchEvalPython" not in plan
