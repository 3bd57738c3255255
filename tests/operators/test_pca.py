"""PCA pre-transform (``similarity.pca_train`` / ``project_vectors`` /
``project_query``): the "reduce, then quantize" axis of the codec
matrix. The eigendecomposition is a declared non-SQL boundary (the OPQ
SVD rule), so the contract is pinned by invariants."""

from __future__ import annotations

import numpy as np
import pytest

from ons_utils_spark.operators import similarity as SIM

DIM, N = 16, 500


@pytest.fixture(scope="module")
def lowrank(spark):
    """Data with intrinsic dimension 4 + small noise: PCA to 4 dims
    must preserve neighbourhoods almost perfectly."""
    rng = np.random.RandomState(5)
    B = rng.randn(4, DIM)
    Z = rng.randn(N, 4) * np.array([4.0, 3.0, 2.0, 1.0])
    X = Z @ B + rng.randn(N, DIM) * 0.01 + rng.randn(DIM) * 2.0
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(N)],
        "vec_id long, embedding array<double>",
    ).localCheckpoint(eager=True)
    return df, X


class TestPcaTrain:
    def test_components_are_orthonormal_and_sign_fixed(
        self, spark, lowrank
    ):
        df, _ = lowrank
        W, mean = SIM.pca_train(df, dim=DIM, out_dim=6)
        Wm = np.asarray(W)
        assert Wm.shape == (6, DIM)
        assert np.allclose(Wm @ Wm.T, np.eye(6), atol=1e-9)
        for row in Wm:
            assert row[np.abs(row).argmax()] > 0
        assert len(mean) == DIM

    def test_captures_the_low_rank_structure(self, spark, lowrank):
        """Projecting intrinsically-4-dim data to 4 dims must keep
        exact-NN neighbourhoods (recall@10 >= 0.95 vs full-dim)."""
        df, X = lowrank
        W, mean = SIM.pca_train(df, dim=DIM, out_dim=4)
        proj = SIM.project_vectors(df, "embedding", W, mean)
        Y = np.stack([
            r["embedding"]
            for r in proj.orderBy("vec_id").collect()
        ])
        hits = tot = 0
        for qi in range(0, N, 50):
            d0 = ((X - X[qi]) ** 2).sum(axis=1); d0[qi] = np.inf
            d1 = ((Y - Y[qi]) ** 2).sum(axis=1); d1[qi] = np.inf
            a = set(np.argsort(d0, kind="stable")[:10].tolist())
            b = set(np.argsort(d1, kind="stable")[:10].tolist())
            hits += len(a & b); tot += 10
        assert hits / tot >= 0.95

    def test_validation(self, spark, lowrank):
        df, _ = lowrank
        with pytest.raises(ValueError, match="out_dim"):
            SIM.pca_train(df, dim=DIM, out_dim=0)
        with pytest.raises(ValueError, match="out_dim"):
            SIM.pca_train(df, dim=DIM, out_dim=DIM + 1)
        with pytest.raises(ValueError, match="max_train"):
            SIM.pca_train(df, dim=DIM, out_dim=4, max_train=10)


class TestProjectVectors:
    def test_matches_the_driver_arithmetic(self, spark, lowrank):
        df, X = lowrank
        W, mean = SIM.pca_train(df, dim=DIM, out_dim=5)
        proj = SIM.project_vectors(df, "embedding", W, mean)
        got = np.stack([
            r["embedding"] for r in proj.orderBy("vec_id").collect()
        ])
        want = (X - np.asarray(mean)) @ np.asarray(W).T
        assert np.allclose(got, want, atol=0)
        q = SIM.project_query([float(x) for x in X[3]], W, mean)
        # gemv (single query) vs gemm (corpus batch) may differ by
        # ulps — query/corpus transform bit-parity is not a contract
        # here (nothing hashes across the two), closeness is
        assert q == pytest.approx(list(want[3]), rel=1e-12)

    def test_guards(self, spark, lowrank):
        df, _ = lowrank
        W, mean = SIM.pca_train(df, dim=DIM, out_dim=4)
        with pytest.raises(ValueError, match="mean dim"):
            SIM.project_vectors(df, "embedding", W, mean[:-1])
        with pytest.raises(ValueError, match="query dim"):
            SIM.project_query([1.0, 2.0], W, mean)
        bad = spark.createDataFrame(
            [(0, None)], "vec_id long, embedding array<double>"
        )
        with pytest.raises(Exception, match="project_vectors"):
            SIM.project_vectors(bad, "embedding", W, mean).collect()

    def test_composes_with_the_sq_codec(self, spark, lowrank):
        """Reduce then quantize: PCA4 + SQ8 serves and the query's own
        row ranks first — the codec-matrix composition end to end."""
        df, X = lowrank
        W, mean = SIM.pca_train(df, dim=DIM, out_dim=4)
        proj = SIM.project_vectors(df, "embedding", W, mean)
        vmin, vmax = SIM.sq_train(proj, dim=4)
        coded = SIM.sq_encode(proj, vmin, vmax)
        q = SIM.project_query([float(x) for x in X[9]], W, mean)
        res = SIM.sq_adc_topk(coded, vmin, vmax, q, topk=5).collect()
        assert res[0]["id"] == 9
