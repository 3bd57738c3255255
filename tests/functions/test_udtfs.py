"""UDTF + expression chunker tests."""

import pytest
from pyspark.sql import functions as F

from ons_utils_spark.functions.udtfs import ChunkDocument, chunk_expression


class TestChunkDocumentUdtf:
    def test_chunks_with_overlap(self, spark):
        df = ChunkDocument(F.lit("abcdefghij"), F.lit(4), F.lit(2))
        rows = [(r["chunk_idx"], r["chunk"]) for r in df.collect()]
        assert rows == [(0, "abcd"), (1, "cdef"), (2, "efgh"), (3, "ghij")]

    def test_lateral_join_over_table(self, spark):
        docs = spark.createDataFrame(
            [(1, "abcdefgh"), (2, "xy")], "doc_id bigint, text string"
        )
        docs.createOrReplaceTempView("udtf_docs")
        spark.udtf.register("chunk_document", ChunkDocument)
        out = spark.sql(
            """SELECT doc_id, chunk_idx, chunk
               FROM udtf_docs, LATERAL chunk_document(text, 4, 0)"""
        ).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(r["chunk"])
        assert by_doc[1] == ["abcd", "efgh"]
        assert by_doc[2] == ["xy"]

    def test_short_text_single_chunk(self, spark):
        rows = ChunkDocument(F.lit("ab"), F.lit(10), F.lit(2)).collect()
        assert [(r["chunk_idx"], r["chunk"]) for r in rows] == [(0, "ab")]


class TestChunkExpression:
    def test_matches_udtf_output(self, spark):
        texts = ["abcdefghij", "abcdefgh", "xy", "", "a" * 23]
        df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id bigint, text string")
        expr_rows = (
            df.select("id", F.explode(chunk_expression("text", 4, 2)).alias("c"))
            .select("id", "c.chunk_idx", "c.chunk")
            .collect()
        )
        got = {}
        for r in expr_rows:
            got.setdefault(r["id"], []).append(r["chunk"])
        expected = {}
        for i, t in enumerate(texts):
            chunker = ChunkDocument.func()
            expected[i] = [c for _, c in chunker.eval(t, 4, 2)] if t else None
        for i, t in enumerate(texts):
            if t:
                assert got[i] == expected[i], f"text={t!r}"
            else:
                assert i not in got

    def test_stays_jvm_side(self, spark):
        df = spark.createDataFrame([("hello world",)], "text string")
        plan = (
            df.select(F.explode(chunk_expression("text", 5, 1)))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Python" not in plan

    def test_invalid_params_raise(self):
        with pytest.raises(ValueError, match="chunk_size must exceed overlap"):
            chunk_expression("text", 4, 4)
