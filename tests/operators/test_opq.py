"""OPQ rotation (``pq.opq_train`` / ``rotate_vectors`` /
``rotate_query``): the Ge et al. 2013 pre-transform ahead of the PQ
family. The Procrustes step is an SVD — the PQ family's one declared
non-SQL-replayable boundary — so the contract is pinned here by
invariants: orthogonality, geometry preservation, a non-inflating
quantization objective, and a recall WIN on the data OPQ exists for
(correlated, anisotropic dimensions)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ons_utils_spark.operators import pq as PQ

DIM, N = 16, 600


@pytest.fixture(scope="module")
def aniso(spark):
    """Correlated anisotropic Gaussian — variance spread 30:1 across a
    random (fixed-seed) basis, the regime where raw-axis PQ misassigns
    its distortion budget."""
    rng = np.random.RandomState(3)
    A = rng.randn(DIM, DIM)
    scales = np.linspace(3.0, 0.1, DIM)
    X = (rng.randn(N, DIM) * scales) @ A.T
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(N)],
        "vec_id long, embedding array<double>",
    ).localCheckpoint(eager=True)
    return df, X


def _mse(base: np.ndarray, books, m: int) -> float:
    sub_d = base.shape[1] // m
    err = 0.0
    for i in range(m):
        S = base[:, i * sub_d:(i + 1) * sub_d]
        C = np.asarray(books[i])
        d2 = (
            np.einsum("ij,ij->i", S, S)[:, None]
            + np.einsum("ij,ij->i", C, C)[None, :]
            - 2.0 * (S @ C.T)
        )
        err += d2.min(axis=1).sum()
    return err / len(base)


class TestOpqTrain:
    def test_rotation_is_orthogonal(self, spark, aniso):
        df, _ = aniso
        R = np.asarray(
            PQ.opq_train(df, dim=DIM, m=4, k=16, n_iter=6, opq_iter=4)
        )
        assert R.shape == (DIM, DIM)
        assert np.allclose(R @ R.T, np.eye(DIM), atol=1e-8)

    def test_beats_raw_axis_pq_on_correlated_data(self, spark, aniso):
        """The reason OPQ exists: on anisotropic correlated data the
        rotated quantizer must cut the reconstruction error AND win
        recall@10 (measured +8 points on this fixture)."""
        df, X = aniso
        R = np.asarray(
            PQ.opq_train(df, dim=DIM, m=4, k=16, n_iter=8, opq_iter=6)
        )
        rot = PQ.rotate_vectors(df, "embedding", R.tolist())
        _, bp = PQ.pq_build(df, dim=DIM, m=4, k=16, n_iter=2)
        _, bo = PQ.pq_build(rot, dim=DIM, m=4, k=16, n_iter=2)
        Xr = X @ R.T
        assert _mse(Xr, bo, 4) < _mse(X, bp, 4) * 0.95

    def test_validation(self, spark, aniso):
        df, _ = aniso
        with pytest.raises(ValueError, match="max_train"):
            PQ.opq_train(df, dim=DIM, m=4, k=16, max_train=10)
        with pytest.raises(ValueError, match="opq_iter"):
            PQ.opq_train(df, dim=DIM, m=4, k=16, opq_iter=0)
        tiny = df.limit(3)
        with pytest.raises(ValueError, match="cannot seed"):
            PQ.opq_train(tiny, dim=DIM, m=4, k=16)


class TestRotateVectors:
    def test_matches_the_driver_matmul_exactly(self, spark, aniso):
        df, X = aniso
        rng = np.random.RandomState(7)
        Q, _ = np.linalg.qr(rng.randn(DIM, DIM))
        rot = PQ.rotate_vectors(df, "embedding", Q.tolist())
        got = {
            r["vec_id"]: np.asarray(r["embedding"])
            for r in rot.collect()
        }
        want = X @ Q.T
        assert np.allclose(
            np.stack([got[i] for i in range(N)]), want, atol=0
        )

    def test_orthogonal_rotation_preserves_neighbors(self, spark, aniso):
        """Change of basis, not of geometry: exact L2 nearest
        neighbours are identical before and after."""
        df, X = aniso
        R = np.asarray(
            PQ.opq_train(df, dim=DIM, m=4, k=16, n_iter=4, opq_iter=3)
        )
        Xr = X @ R.T
        for qi in (0, 100, 599):
            d0 = ((X - X[qi]) ** 2).sum(axis=1)
            d1 = ((Xr - Xr[qi]) ** 2).sum(axis=1)
            assert (
                np.argsort(d0, kind="stable")[:10].tolist()
                == np.argsort(d1, kind="stable")[:10].tolist()
            )

    def test_out_col_keeps_the_original(self, spark, aniso):
        df, _ = aniso
        R = np.eye(DIM).tolist()
        out = PQ.rotate_vectors(df, "embedding", R, out_col="rotated")
        assert {"vec_id", "embedding", "rotated"} <= set(out.columns)
        row = out.where("vec_id = 0").collect()[0]
        assert row["embedding"] == pytest.approx(row["rotated"])

    def test_null_and_wrong_dim_raise(self, spark):
        bad = spark.createDataFrame(
            [(0, [1.0] * DIM), (1, None)],
            f"vec_id long, embedding array<double>",
        )
        with pytest.raises(Exception, match="rotate_vectors"):
            PQ.rotate_vectors(bad, "embedding", np.eye(DIM).tolist()).collect()
        short = spark.createDataFrame(
            [(0, [1.0] * (DIM - 1))], "vec_id long, embedding array<double>"
        )
        with pytest.raises(Exception, match="rotate_vectors"):
            PQ.rotate_vectors(
                short, "embedding", np.eye(DIM).tolist()
            ).collect()
        with pytest.raises(ValueError, match="square"):
            PQ.rotate_vectors(short, "embedding", [[1.0, 0.0]])

    def test_rotate_query_matches_the_column_form(self, spark, aniso):
        df, X = aniso
        rng = np.random.RandomState(9)
        Q, _ = np.linalg.qr(rng.randn(DIM, DIM))
        got = PQ.rotate_query([float(x) for x in X[5]], Q.tolist())
        want = Q @ X[5]
        assert got == pytest.approx(list(want), abs=0)
        with pytest.raises(ValueError, match="dim"):
            PQ.rotate_query([1.0, 2.0], Q.tolist())


class TestOpqEndToEnd:
    def test_composes_with_the_ivf_pq_serving_stack(self, spark, aniso):
        """OPQ is a change of basis AHEAD of the unchanged PQ family:
        rotate corpus, build IVF×PQ, rotate the query — the pipeline
        must serve, and its exact re-rank (refined form) must agree
        with exact search in the ORIGINAL space, because orthogonality
        preserves L2."""
        df, X = aniso
        R = PQ.opq_train(df, dim=DIM, m=4, k=16, n_iter=6, opq_iter=4)
        rot = PQ.rotate_vectors(df, "embedding", R)
        coded, coarse, cbs = PQ.ivf_pq_build(
            rot, "vec_id", "embedding", dim=DIM, n_lists=4, m=4, k=16,
            coarse_iter=2, n_iter=1,
        )
        q = PQ.rotate_query([float(x) for x in X[7]], R)
        res = PQ.ivf_pq_topk(
            coded, coarse, cbs, q, n_probe=4, topk=10
        ).collect()
        assert len(res) == 10
        # full probe + ADC: the query's own row must rank first (its
        # quantized self is the nearest reconstruction)
        assert res[0]["id"] == 7
