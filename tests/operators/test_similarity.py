"""Similarity-search operator tests."""

import pytest

from ons_utils_spark.operators.similarity import (
    cosine_topk,
    make_planes,
    srp_topk,
)


def _vectors(spark):
    return spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.9, 0.1, 0.0, 0.0]),
            (3, [0.0, 1.0, 0.0, 0.0]),
            (4, [-1.0, 0.0, 0.0, 0.0]),
            (5, [0.7, 0.7, 0.0, 0.0]),
        ],
        "vec_id bigint, embedding array<float>",
    )


class TestCosineTopk:
    def test_orders_by_similarity(self, spark):
        out = cosine_topk(_vectors(spark), [1.0, 0.0, 0.0, 0.0], k=3).collect()
        assert [r["id"] for r in out] == [1, 2, 5]
        assert out[0]["cos_sim"] == 1.0

    def test_k_limits(self, spark):
        assert cosine_topk(_vectors(spark), [1.0, 0.0, 0.0, 0.0], k=2).count() == 2


class TestSrpTopk:
    def test_subset_of_bucket_and_finds_self(self, spark):
        df = _vectors(spark)
        out = srp_topk(df, [1.0, 0.0, 0.0, 0.0], k=5, n_planes=4).collect()
        ids = [r["id"] for r in out]
        # The query vector equals vector 1, which must land in the query's
        # own bucket and rank first.
        assert ids[0] == 1
        # Opposite vector can never share every hyperplane side.
        assert 4 not in ids

    def test_deterministic_planes(self):
        assert make_planes(4, 8, seed=7) == make_planes(4, 8, seed=7)
        assert make_planes(4, 8, seed=7) != make_planes(4, 8, seed=8)


class TestIvf:
    def test_ivf_recall_against_brute_force(self, spark):
        import random

        from ons_utils_spark.operators.similarity import cosine_topk, ivf_build, ivf_topk

        rng = random.Random(11)
        # Three well-separated clusters in 8-d.
        centers = [[5.0] * 4 + [0.0] * 4, [0.0] * 4 + [5.0] * 4, [2.5] * 8]
        rows = []
        for i in range(90):
            c = centers[i % 3]
            rows.append((i, [v + rng.gauss(0, 0.3) for v in c]))
        df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
        query = centers[0]

        assigned, centroids = ivf_build(df, n_lists=3, seed=1)
        approx = [r["id"] for r in ivf_topk(assigned, centroids, query, k=5, n_probe=1).collect()]
        exact = [r["id"] for r in cosine_topk(df, query, k=5).collect()]
        # With clean clusters and the right probe list, recall is total.
        assert approx == exact

    def test_probe_all_lists_is_exact(self, spark):
        import random

        from ons_utils_spark.operators.similarity import cosine_topk, ivf_build, ivf_topk

        rng = random.Random(5)
        rows = [(i, [rng.uniform(-1, 1) for _ in range(6)]) for i in range(60)]
        df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
        query = rows[0][1]
        assigned, centroids = ivf_build(df, n_lists=4, seed=2)
        approx = [r["id"] for r in ivf_topk(assigned, centroids, query, k=8, n_probe=4).collect()]
        exact = [r["id"] for r in cosine_topk(df, query, k=8).collect()]
        assert approx == exact


class TestQuantization:
    @pytest.fixture()
    def vecs(self, spark):
        return spark.createDataFrame(
            [
                (1, [1.0, -0.5, 0.25, 0.0]),
                (2, [0.001, 0.002, -0.003, 0.004]),
                (3, [0.0, 0.0, 0.0, 0.0]),
            ],
            "vec_id bigint, embedding array<float>",
        )

    def test_roundtrip_error_bounded_by_half_scale(self, spark, vecs):
        from ons_utils_spark.operators.similarity import (
            dequantize_embeddings,
            quantize_embeddings,
        )

        out = dequantize_embeddings(
            quantize_embeddings(vecs, "embedding"), out_col="deq"
        ).collect()
        for r in out:
            orig = [float(x) for x in r["embedding"]]
            assert len(r["q"]) == len(orig)
            for o, d in zip(orig, r["deq"]):
                assert abs(o - d) <= r["scale"] / 2 + 1e-12

    def test_codes_exact_for_known_vector(self, spark, vecs):
        from ons_utils_spark.operators.similarity import quantize_embeddings

        rows = {r["vec_id"]: r for r in quantize_embeddings(vecs, "embedding").collect()}
        # vec 1: scale = 1/127; codes = floor(x*127 + 0.5)
        assert rows[1]["q"] == [127, -63, 32, 0]
        assert rows[1]["scale"] == pytest.approx(1.0 / 127)
        # zero vector: scale 0, all-zero codes (no 0/0 NaN)
        assert rows[3]["scale"] == 0.0 and rows[3]["q"] == [0, 0, 0, 0]

    def test_codes_within_bit_range(self, spark, vecs):
        from ons_utils_spark.operators.similarity import quantize_embeddings

        for bits in (4, 8):
            qmax = (1 << (bits - 1)) - 1
            rows = quantize_embeddings(vecs, "embedding", bits=bits).collect()
            assert all(-qmax <= c <= qmax for r in rows for c in r["q"])

    def test_bad_bits_raises(self, spark, vecs):
        from ons_utils_spark.operators.similarity import quantize_embeddings

        with pytest.raises(ValueError, match="bits"):
            quantize_embeddings(vecs, "embedding", bits=1)
