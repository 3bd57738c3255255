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


class TestRotationInTheIndexArtifact:
    """OPQ's durable half: the rotation rides the IvfPqIndex, so a
    serving session that loaded the store rotates raw queries and raw
    append batches itself — no side-channel matrix."""

    @pytest.fixture()
    def rotated_store(self, spark, aniso, tmp_path):
        df, X = aniso
        R = PQ.opq_train(df, dim=DIM, m=4, k=16, n_iter=4, opq_iter=3)
        base = df.where("vec_id < 400")
        rot = PQ.rotate_vectors(base, "embedding", R)
        coded, coarse, cbs = PQ.ivf_pq_build(
            rot, "vec_id", "embedding", dim=DIM, n_lists=4, m=4, k=16,
            coarse_iter=2, n_iter=1,
        )
        idx = PQ.make_ivf_pq_index(coarse, cbs, rotation=R)
        path = str(tmp_path / "opq_store")
        PQ.save_ivf_pq_table(coded, idx, path)
        return path, R, df, X

    def test_fingerprint_covers_the_rotation(self, spark, aniso):
        df, _ = aniso
        R = PQ.opq_train(df, dim=DIM, m=4, k=16, n_iter=4, opq_iter=2)
        rot = PQ.rotate_vectors(df, "embedding", R)
        _, coarse, cbs = PQ.ivf_pq_build(
            rot, "vec_id", "embedding", dim=DIM, n_lists=4, m=4, k=16,
            coarse_iter=1, n_iter=1,
        )
        plain = PQ.make_ivf_pq_index(coarse, cbs)
        with_rot = PQ.make_ivf_pq_index(coarse, cbs, rotation=R)
        assert plain.fingerprint != with_rot.fingerprint
        assert with_rot.rotation == [[float(x) for x in r] for r in R]

    def test_non_orthogonal_rotation_refused(self, spark, aniso):
        df, _ = aniso
        rot = PQ.rotate_vectors(df, "embedding", np.eye(DIM).tolist())
        _, coarse, cbs = PQ.ivf_pq_build(
            rot, "vec_id", "embedding", dim=DIM, n_lists=4, m=4, k=16,
            coarse_iter=1, n_iter=1,
        )
        bad = (np.eye(DIM) * 2.0).tolist()
        with pytest.raises(ValueError, match="orthogonal"):
            PQ.make_ivf_pq_index(coarse, cbs, rotation=bad)
        with pytest.raises(ValueError, match="shape"):
            PQ.make_ivf_pq_index(
                coarse, cbs, rotation=np.eye(DIM - 1).tolist()
            )

    def test_roundtrip_append_and_query_raw_inputs(
        self, spark, aniso, rotated_store
    ):
        """A fresh session loads the store, appends a RAW batch, and
        queries with a RAW vector — results must be bit-identical to
        the manual pipeline that rotates everything by hand."""
        path, R, df, X = rotated_store
        PQ.ivf_pq_table_append(df.where("vec_id >= 400"), path, batch_id=0)
        lc, li = PQ.load_ivf_pq_table(spark, path)
        assert li.rotation == [[float(x) for x in r] for r in R]
        q_raw = [float(x) for x in X[450]]
        got = PQ.ivf_pq_query(lc, li, q_raw, n_probe=4, topk=10)
        # manual: rotate the whole corpus, one-shot encode with the
        # same stored geometry, query the rotated vector through the
        # rotation-blind primitive
        rot_all = PQ.rotate_vectors(df, "embedding", R)
        blind = li._replace(rotation=None)
        manual_coded = PQ.ivf_pq_encode(
            rot_all, blind, "vec_id", "embedding"
        ).select("id", "codes", "__list")
        q_rot = PQ.rotate_query(q_raw, R)
        want = PQ.ivf_pq_topk(
            manual_coded, li.coarse_centroids, li.codebooks, q_rot,
            n_probe=4, topk=10, round_dp=li.round_dp,
        )
        assert [tuple(r) for r in got.orderBy("id").collect()] == [
            tuple(r) for r in want.orderBy("id").collect()
        ]
        # the appended query row itself serves (dist ~0 ranks first)
        assert got.collect()[0]["id"] == 450

    def test_batch_topk_rotates_bit_identically_to_singles(
        self, spark, aniso, rotated_store
    ):
        path, R, df, X = rotated_store
        lc, li = PQ.load_ivf_pq_table(spark, path)
        queries = spark.createDataFrame(
            [(i, [float(x) for x in X[i]]) for i in (5, 17)],
            "query_id long, embedding array<double>",
        )
        batch = PQ.ivf_pq_batch_topk(lc, li, queries, n_probe=2, topk=8)
        for qi in (5, 17):
            single = PQ.ivf_pq_query(
                lc, li, [float(x) for x in X[qi]], n_probe=2, topk=8
            )
            got = [
                (r["id"], r["adc_dist"])
                for r in batch.where(f"query_id = {qi}")
                .orderBy("adc_dist", "id").collect()
            ]
            want = [
                (r["id"], r["adc_dist"]) for r in single.collect()
            ]
            assert got == want


class TestSqRotation:
    """The SQ family carries the same durable rotation — the codec
    matrix stays symmetric: one opq_train rotation serves either
    backend's store with raw inputs."""

    def test_roundtrip_append_and_query_raw_inputs(
        self, spark, aniso, tmp_path
    ):
        from ons_utils_spark.operators import similarity as SIM

        df, X = aniso
        R = PQ.opq_train(df, dim=DIM, m=4, k=16, n_iter=4, opq_iter=3)
        base = df.where("vec_id < 400")
        rot = PQ.rotate_vectors(base, "embedding", R)
        coded, coarse, vmin, vmax = SIM.ivf_sq_build(
            rot, dim=DIM, n_lists=4, coarse_iter=2
        )
        idx = SIM.make_sq_index(coarse, vmin, vmax, rotation=R)
        plain = SIM.make_sq_index(coarse, vmin, vmax)
        assert idx.fingerprint != plain.fingerprint
        path = str(tmp_path / "sq_opq")
        SIM.save_sq_table(coded, idx, path)
        SIM.ivf_sq_table_append(
            df.where("vec_id >= 400"), path, batch_id=0
        )
        lc, li = SIM.load_sq_table(spark, path)
        assert li.rotation == [[float(x) for x in r] for r in R]
        q_raw = [float(x) for x in X[450]]
        got = SIM.ivf_sq_query(lc, li, q_raw, n_probe=4, topk=10)
        # manual pipeline: rotate everything by hand, use the
        # rotation-blind primitive
        rot_all = PQ.rotate_vectors(df, "embedding", R)
        blind = li._replace(rotation=None)
        manual = SIM.ivf_sq_encode(
            rot_all, blind, "vec_id", "embedding"
        ).select("id", "codes", "__list")
        q_rot = PQ.rotate_query(q_raw, R)
        want = SIM.ivf_sq_topk(
            manual, li.coarse_centroids, li.vmin, li.vmax, q_rot,
            n_probe=4, topk=10, round_dp=li.round_dp,
        )
        assert [tuple(r) for r in got.orderBy("id").collect()] == [
            tuple(r) for r in want.orderBy("id").collect()
        ]
        assert got.collect()[0]["id"] == 450

    def test_batch_matches_singles(self, spark, aniso, tmp_path):
        from ons_utils_spark.operators import similarity as SIM

        df, X = aniso
        R = PQ.opq_train(df, dim=DIM, m=4, k=16, n_iter=4, opq_iter=2)
        rot = PQ.rotate_vectors(df, "embedding", R)
        coded, coarse, vmin, vmax = SIM.ivf_sq_build(
            rot, dim=DIM, n_lists=4, coarse_iter=2
        )
        idx = SIM.make_sq_index(coarse, vmin, vmax, rotation=R)
        queries = spark.createDataFrame(
            [(i, [float(x) for x in X[i]]) for i in (5, 17)],
            "query_id long, embedding array<double>",
        )
        codesel = coded.select("id", "codes", "__list")
        batch = SIM.ivf_sq_batch_topk(
            codesel, idx, queries, n_probe=2, topk=8
        )
        for qi in (5, 17):
            single = SIM.ivf_sq_query(
                codesel, idx, [float(x) for x in X[qi]],
                n_probe=2, topk=8,
            )
            got = [
                (r["id"], r["adc_dist"])
                for r in batch.where(f"query_id = {qi}")
                .orderBy("adc_dist", "id").collect()
            ]
            want = [(r["id"], r["adc_dist"]) for r in single.collect()]
            assert got == want
