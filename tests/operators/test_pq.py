"""Tests for product quantization (operators/pq.py)."""

import math

import pytest

from ons_utils_spark.operators import pq


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<float>",
    )


# 8-dim vectors, m=2 subspaces of 4: first half encodes an "x or y"
# pattern, second half an independent "a or b" pattern — so the two
# subspace codebooks must quantize independently.
VECS = [
    [1, 0, 0, 0, 0, 0, 0, 1],
    [1, 0, 0, 0, 0, 0, 1, 0],
    [0, 1, 0, 0, 0, 0, 0, 1],
    [0, 1, 0, 0, 0, 0, 1, 0],
    [1, 0, 0, 0, 0, 0, 0, 1],  # dup of row 0
]


class TestPqBuild:
    def test_codes_shape_and_range(self, spark):
        df = _emb_df(spark, VECS)
        codes, cbs = pq.pq_build(df, dim=8, m=2, k=2, n_iter=1)
        assert len(cbs) == 2 and all(len(cb) == 2 for cb in cbs)
        assert all(len(c) == 4 for cb in cbs for c in cb)
        rows = codes.orderBy("id").collect()
        assert len(rows) == len(VECS)
        assert all(0 <= v < 2 for r in rows for v in r["codes"])

    def test_identical_vectors_identical_codes(self, spark):
        df = _emb_df(spark, VECS)
        codes, _ = pq.pq_build(df, dim=8, m=2, k=2, n_iter=1)
        by_id = {r["id"]: list(r["codes"]) for r in codes.collect()}
        assert by_id[0] == by_id[4]

    def test_subspaces_quantize_independently(self, spark):
        # Rows 0 and 1 share the first half but differ in the second;
        # rows 0 and 2 differ in the first half but share the second.
        df = _emb_df(spark, VECS)
        codes, _ = pq.pq_build(df, dim=8, m=2, k=2, n_iter=1)
        by_id = {r["id"]: list(r["codes"]) for r in codes.collect()}
        assert by_id[0][0] == by_id[1][0]
        assert by_id[0][1] != by_id[1][1]
        assert by_id[0][0] != by_id[2][0]
        assert by_id[0][1] == by_id[2][1]

    def test_blas_encode_matches_literal(self, spark):
        df = _emb_df(spark, VECS)
        lit_codes, lit_cbs = pq.pq_build(
            df, dim=8, m=2, k=2, n_iter=1, method="literal")
        blas_codes, blas_cbs = pq.pq_build(
            df, dim=8, m=2, k=2, n_iter=1, method="blas")
        assert lit_cbs == blas_cbs
        lit = {r["id"]: list(r["codes"]) for r in lit_codes.collect()}
        blas = {r["id"]: list(r["codes"]) for r in blas_codes.collect()}
        assert lit == blas

    def test_bad_geometry_raises(self, spark):
        df = _emb_df(spark, VECS)
        with pytest.raises(ValueError, match="must divide"):
            pq.pq_build(df, dim=8, m=3)


class TestAdc:
    def test_self_query_is_nearest(self, spark):
        df = _emb_df(spark, VECS)
        codes, cbs = pq.pq_build(df, dim=8, m=2, k=2, n_iter=1)
        top = pq.pq_adc_topk(codes, cbs, VECS[1], topk=1).collect()
        assert top[0]["id"] == 1

    def test_adc_equals_exact_distance_to_reconstruction(self, spark):
        """ADC score == exact squared L2 between the query and the
        vector's reconstruction from its codebook entries."""
        df = _emb_df(spark, VECS)
        codes, cbs = pq.pq_build(df, dim=8, m=2, k=2, n_iter=1)
        q = VECS[3]
        scored = {r["id"]: r["adc_dist"]
                  for r in pq.pq_adc_scores(codes, cbs, q).collect()}
        by_id = {r["id"]: list(r["codes"]) for r in codes.collect()}
        for i, code in by_id.items():
            recon = [x for s, c in enumerate(code) for x in cbs[s][c]]
            exact = sum((a - b) ** 2 for a, b in zip(q, recon))
            assert scored[i] == pytest.approx(exact, abs=1e-5)

    def test_wrong_query_dim_raises(self, spark):
        df = _emb_df(spark, VECS)
        codes, cbs = pq.pq_build(df, dim=8, m=2, k=2, n_iter=1)
        with pytest.raises(ValueError, match="query dim"):
            pq.pq_adc_topk(codes, cbs, [1.0, 2.0], topk=1)


class TestIdTypeGenerality:
    def test_blas_encode_preserves_int_id(self, spark):
        """The blas path must accept whatever id type the literal path
        does — it used to hardcode LongType."""
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(VECS)],
            "vec_id int, embedding array<float>",
        )
        codes, _ = pq.pq_build(df, dim=8, m=2, k=2, n_iter=1, method="blas")
        assert dict(codes.dtypes)["id"] == "int"
        assert codes.count() == len(VECS)
