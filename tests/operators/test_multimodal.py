"""Multimodal-column plumbing tests (binary payloads, mapInPandas stubs)."""

import pytest
from pyspark.sql import functions as F

from ons_utils_spark.operators.multimodal import (
    attach_payload,
    decode_image,
    extract_features,
    payload_meta,
    sample_frames,
)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(1, "hello world"), (2, "x" * 200)], "doc_id bigint, text string"
    )


class TestPayload:
    def test_attach_and_meta(self, spark, docs):
        out = (
            attach_payload(docs, "text")
            .select("doc_id", payload_meta("payload").alias("m"))
            .select("doc_id", "m.n_bytes", "m.digest")
            .collect()
        )
        by_id = {r["doc_id"]: r for r in out}
        assert by_id[1]["n_bytes"] == len("hello world")
        assert by_id[2]["n_bytes"] == 200
        assert len(by_id[1]["digest"]) == 32

    def test_meta_stays_jvm_side(self, spark, docs):
        plan = (
            attach_payload(docs, "text")
            .select(payload_meta("payload"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Python" not in plan


class TestDecodeImage:
    def test_fake_decode_shapes(self, spark, docs):
        out = decode_image(attach_payload(docs, "text"), fake=True).collect()
        row = {r["doc_id"]: r for r in out}[1]
        assert row["width"] >= 1 and row["height"] >= 1
        assert len(row["pixels"]) == row["width"] * row["height"]

    def test_real_decode_raises(self, spark, docs):
        with pytest.raises(Exception, match="codec libraries"):
            decode_image(attach_payload(docs, "text"), fake=False).collect()

    def test_deterministic(self, spark, docs):
        a = decode_image(attach_payload(docs, "text"), fake=True).collect()
        b = decode_image(attach_payload(docs, "text"), fake=True).collect()
        assert sorted(map(str, a)) == sorted(map(str, b))


class TestExtractFeatures:
    def test_normalized_histogram(self, spark, docs):
        out = extract_features(attach_payload(docs, "text"), dim=16).collect()
        for row in out:
            assert len(row["feature"]) == 16
            assert abs(sum(row["feature"]) - 1.0) < 1e-9

    def test_exact_values(self, spark):
        df = spark.createDataFrame([(1, "aa")], "doc_id bigint, text string")
        out = extract_features(attach_payload(df, "text"), dim=16).collect()[0]
        # 'a' = 97; 97 % 16 = 1 → all mass in bucket 1.
        assert out["feature"][1] == 1.0


class TestSampleFrames:
    def test_fake_sampling(self, spark):
        df = spark.createDataFrame(
            [(1, "z" * 640)], "doc_id bigint, text string"
        )
        out = sample_frames(attach_payload(df, "text"), every_n=5, fake=True).collect()
        # 640 bytes → 10 "frames" of 64 bytes; every 5th → indices 0, 5.
        assert sorted(r["frame_idx"] for r in out) == [0, 5]

    def test_real_raises(self, spark):
        df = spark.createDataFrame([(1, "abc")], "doc_id bigint, text string")
        with pytest.raises(Exception, match="codec libraries"):
            sample_frames(attach_payload(df, "text"), fake=False).collect()


class TestResizeImage:
    def test_fake_resize_size_contract(self, spark, docs):
        from ons_utils_spark.operators.multimodal import resize_image

        out = resize_image(attach_payload(docs, "text"), 8, 4, fake=True).collect()
        for row in out:
            assert len(bytes(row["resized"])) == 8 * 4
            assert (row["width"], row["height"]) == (8, 4)

    def test_real_resize_raises(self, spark, docs):
        from ons_utils_spark.operators.multimodal import resize_image

        with pytest.raises(Exception, match="imaging libraries"):
            resize_image(attach_payload(docs, "text"), 8, 4, fake=False).collect()

    def test_deterministic(self, spark, docs):
        from ons_utils_spark.operators.multimodal import resize_image

        a = resize_image(attach_payload(docs, "text"), 4, 4, fake=True).collect()
        b = resize_image(attach_payload(docs, "text"), 4, 4, fake=True).collect()
        assert sorted(map(str, a)) == sorted(map(str, b))


class TestDecodeAudio:
    def test_fake_decode(self, spark, docs):
        from ons_utils_spark.operators.multimodal import decode_audio

        out = {r["doc_id"]: r for r in decode_audio(attach_payload(docs, "text"), fake=True).collect()}
        row = out[1]
        assert row["n_samples"] == len("hello world")
        assert row["sample_rate"] == 16000
        assert all(-1.0 <= s < 1.0 for s in row["samples"])

    def test_real_raises(self, spark, docs):
        from ons_utils_spark.operators.multimodal import decode_audio

        with pytest.raises(Exception, match="codec libraries"):
            decode_audio(attach_payload(docs, "text"), fake=False).collect()
