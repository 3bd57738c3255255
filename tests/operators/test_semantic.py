"""Tests for semantic clustering / SemDeDup (operators/semantic.py)."""

import pytest

from ons_utils_spark.operators import semantic


def _emb_df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id bigint, embedding array<float>",
    )


# Two tight groups far apart, plus one isolate. The Knuth-hash seed order
# for ids 0..6 is 0, 5, 2, 4, 1, 6, 3 — so with k=3 the seeds are ids
# 0, 5, 2, placed here one per group (A, B, isolate respectively).
A_IDS, B_IDS, ISO_ID = (0, 1, 4), (3, 5, 6), 2
_VECS = {
    0: [1.0, 0.0, 0.0], 1: [0.999, 0.001, 0.0], 4: [0.998, 0.002, 0.0],
    3: [0.0, 1.0, 0.0], 5: [0.0, 0.999, 0.001], 6: [0.001, 0.998, 0.0],
    2: [0.0, 0.0, 1.0],
}
ROWS = sorted(_VECS.items())


class TestKmeansLloyd:
    def test_partitioning_invariance(self, spark):
        """Decimal-exact centroid sums make the result independent of the
        physical partitioning — the property the operator commits to."""
        df = _emb_df(spark, ROWS)
        _, c1 = semantic.kmeans_lloyd(df.repartition(1), k=3, n_iter=2)
        _, c7 = semantic.kmeans_lloyd(df.repartition(7), k=3, n_iter=2)
        assert c1 == c7

    def test_assignment_covers_all_rows(self, spark):
        df = _emb_df(spark, ROWS)
        assigned, cents = semantic.kmeans_lloyd(df, k=3, n_iter=2)
        assert len(cents) == 3 and all(len(c) == 3 for c in cents)
        got = assigned.select("vec_id", "__cluster").collect()
        assert len(got) == len(ROWS)
        assert all(0 <= r["__cluster"] < 3 for r in got)

    def test_groups_land_in_same_cluster(self, spark):
        df = _emb_df(spark, ROWS)
        assigned, _ = semantic.kmeans_lloyd(df, k=3, n_iter=2)
        by_id = {r["vec_id"]: r["__cluster"] for r in assigned.collect()}
        assert by_id[0] == by_id[1] == by_id[4]
        assert by_id[3] == by_id[5] == by_id[6]
        assert len({by_id[0], by_id[3], by_id[ISO_ID]}) == 3

    def test_empty_cluster_keeps_previous_centroid(self, spark):
        # ids 0,1,2 all seed (k=n=3); two identical seed vectors mean one
        # centroid wins all its points and the twin goes empty — Lloyd's
        # fallback must keep the empty cluster's previous centroid.
        df = _emb_df(spark, [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0])])
        _, cents = semantic.kmeans_lloyd(df, k=3, n_iter=2)
        assert [1.0, 0.0] in cents  # the surviving twin's mean
        assert [0.0, 1.0] in cents
        assert len(cents) == 3

    def test_k_exceeding_rows_raises(self, spark):
        df = _emb_df(spark, ROWS[:2])
        with pytest.raises(ValueError, match="exceeds"):
            semantic.kmeans_lloyd(df, k=5)

    def test_bad_params_raise(self, spark):
        df = _emb_df(spark, ROWS)
        with pytest.raises(ValueError, match="k must be"):
            semantic.kmeans_lloyd(df, k=0)
        with pytest.raises(ValueError, match="n_iter must be"):
            semantic.kmeans_lloyd(df, k=2, n_iter=0)


class TestBlasPath:
    def test_agrees_with_literal(self, spark):
        """The Arrow/BLAS argmin and the codegen-literal argmin give the
        same clusters, centroids and cosines on well-separated data."""
        df = _emb_df(spark, ROWS)
        lit_a, lit_c = semantic.kmeans_lloyd(
            df, k=3, n_iter=2, method="literal", with_cos=True)
        blas_a, blas_c = semantic.kmeans_lloyd(
            df, k=3, n_iter=2, method="blas", with_cos=True)
        assert lit_c == blas_c
        lit_rows = {r["vec_id"]: r for r in lit_a.collect()}
        blas_rows = {r["vec_id"]: r for r in blas_a.collect()}
        for i in lit_rows:
            assert lit_rows[i]["__cluster"] == blas_rows[i]["__cluster"]
            assert lit_rows[i]["__cos"] == pytest.approx(
                blas_rows[i]["__cos"], abs=1e-12)

    def test_semantic_dedup_blas_same_verdicts(self, spark):
        df = _emb_df(spark, ROWS)
        lit = {r["id"]: (r["cluster"], r["kept"]) for r in
               semantic.semantic_dedup(
                   df, k=3, n_iter=2, tau=0.9, method="literal").collect()}
        blas = {r["id"]: (r["cluster"], r["kept"]) for r in
                semantic.semantic_dedup(
                    df, k=3, n_iter=2, tau=0.9, method="blas").collect()}
        assert lit == blas

    def test_auto_routes_to_vector(self, spark):
        # r13 optimization: "auto" is the exact Arrow fold at every k
        # (bit-identical to literal, none of its codegen/interpreted
        # costs); literal and blas stay as explicit opt-ins.
        assert semantic._resolve_method("auto", 16) == "vector"
        assert semantic._resolve_method("auto", 17) == "vector"
        assert semantic._resolve_method("literal", 99) == "literal"
        assert semantic._resolve_method("blas", 2) == "blas"
        with pytest.raises(ValueError, match="method"):
            semantic._resolve_method("fancy", 8)


class TestVectorPath:
    """The ``vector`` assignment engine must be BIT-identical to the
    literal-codegen expression tree — it is what ``auto`` (and therefore
    every oracle-graded query) runs."""

    def test_bit_identical_to_literal(self, spark):
        df = _emb_df(spark, ROWS)
        lit_a, lit_c = semantic.kmeans_lloyd(
            df, k=3, n_iter=2, method="literal", with_cos=True)
        vec_a, vec_c = semantic.kmeans_lloyd(
            df, k=3, n_iter=2, method="vector", with_cos=True)
        assert lit_c == vec_c
        lit_rows = {r["vec_id"]: r for r in lit_a.collect()}
        vec_rows = {r["vec_id"]: r for r in vec_a.collect()}
        assert lit_rows.keys() == vec_rows.keys()
        for i in lit_rows:
            assert lit_rows[i]["__cluster"] == vec_rows[i]["__cluster"]
            # Exact equality, not approx — the contract is bit parity.
            assert lit_rows[i]["__dist"] == vec_rows[i]["__dist"]
            assert lit_rows[i]["__cos"] == vec_rows[i]["__cos"]

    def test_tie_breaks_to_lower_cluster(self, spark):
        # A point exactly equidistant from both seed centroids: literal's
        # struct-ordered array_min picks the lower cluster id; numpy's
        # first-minimum argmin must match.
        rows = [(0, [1.0, 0.0]), (1, [-1.0, 0.0]), (2, [0.0, 1.0])]
        df = _emb_df(spark, rows)
        lit, _ = semantic.kmeans_lloyd(df, k=2, n_iter=1, method="literal")
        vec, _ = semantic.kmeans_lloyd(df, k=2, n_iter=1, method="vector")
        assert ({r["vec_id"]: r["__cluster"] for r in lit.collect()}
                == {r["vec_id"]: r["__cluster"] for r in vec.collect()})

    def test_degenerate_norm_cos_is_null(self, spark):
        # Zero vector: cosine denominator is 0 -> NULL (not NaN), so the
        # row ranks last and never prunes — the literal path's contract.
        rows = [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.0, 0.0])]
        df = _emb_df(spark, rows)
        for method in ("literal", "vector"):
            assigned, _ = semantic.kmeans_lloyd(
                df, k=2, n_iter=1, method=method, with_cos=True)
            by_id = {r["vec_id"]: r["__cos"] for r in assigned.collect()}
            assert by_id[2] is None, method

    def test_semantic_dedup_matches_literal(self, spark):
        df = _emb_df(spark, ROWS)
        lit = {r["id"]: tuple(r) for r in semantic.semantic_dedup(
            df, k=3, n_iter=2, tau=0.9, method="literal").collect()}
        vec = {r["id"]: tuple(r) for r in semantic.semantic_dedup(
            df, k=3, n_iter=2, tau=0.9, method="vector").collect()}
        assert lit == vec
        # And the crafted fixture's expected verdicts hold: near-dups in
        # each tight group are pruned against the group's anchor.
        kept = {i for i, row in vec.items() if row[3]}
        assert ISO_ID in kept
        assert len(kept & set(A_IDS)) == 1 and len(kept & set(B_IDS)) == 1


class TestClusterSummary:
    def test_sizes_sum_to_n(self, spark):
        df = _emb_df(spark, ROWS)
        out = semantic.cluster_summary(df, k=3, n_iter=2).collect()
        assert sum(r["n_members"] for r in out) == len(ROWS)
        assert all(r["centroid_norm"] > 0 for r in out)


class TestSemanticDedup:
    def test_near_identical_pruned(self, spark):
        df = _emb_df(spark, ROWS)
        out = semantic.semantic_dedup(df, k=3, n_iter=2, tau=0.9)
        rows = {r["id"]: r for r in out.collect()}
        assert len(rows) == len(ROWS)  # every input row verdict-ed
        # Each tight group keeps exactly one; the isolate survives.
        kept_a = [i for i in A_IDS if rows[i]["kept"]]
        kept_b = [i for i in B_IDS if rows[i]["kept"]]
        assert len(kept_a) == 1 and len(kept_b) == 1
        assert rows[ISO_ID]["kept"]

    def test_high_tau_keeps_everything(self, spark):
        df = _emb_df(spark, ROWS)
        out = semantic.semantic_dedup(df, k=3, n_iter=2, tau=1.0)
        assert all(r["kept"] for r in out.collect())

    def test_drop_is_cluster_local(self, spark):
        # The isolate is semantically far from both groups; even at a
        # tau of 0 it can only be pruned by its OWN cluster's members.
        df = _emb_df(spark, ROWS)
        out = semantic.semantic_dedup(df, k=3, n_iter=2, tau=0.0)
        rows = {r["id"]: r for r in out.collect()}
        lone = [i for i, r in rows.items() if sum(
            1 for o in rows.values() if o["cluster"] == r["cluster"]) == 1]
        assert all(rows[i]["kept"] for i in lone)


class TestMaxClusterGuard:
    def test_oversized_cluster_raises_with_offender(self, spark):
        df = _emb_df(spark, ROWS)
        with pytest.raises(ValueError, match=r"max_cluster=2.*raise k"):
            semantic.semantic_dedup(
                df, k=3, n_iter=2, tau=0.9, max_cluster=2)

    def test_within_bound_runs(self, spark):
        df = _emb_df(spark, ROWS)
        out = semantic.semantic_dedup(
            df, k=3, n_iter=2, tau=0.9, max_cluster=3)
        assert out.count() == len(ROWS)


class TestDegenerateInputs:
    def test_zero_vector_does_not_nuke_its_cluster(self, spark):
        """A zero-norm embedding's cosine is NULL (not NaN): it must rank
        last in its cluster, never prune others, and never be pruned."""
        rows = ROWS + [(9, [0.0, 0.0, 0.0])]
        df = _emb_df(spark, rows)
        out = {r["id"]: r for r in semantic.semantic_dedup(
            df, k=3, n_iter=2, tau=0.0).collect()}
        assert len(out) == len(rows)
        zero = out[9]
        assert zero["cos_centroid"] is None
        assert zero["kept"]  # NULL cosine can never exceed tau
        # Its cluster-mates survive by the normal tau rule, not en masse
        # NaN pruning: at tau=0 each non-degenerate cluster keeps >= 1.
        clusters = {}
        for r in out.values():
            clusters.setdefault(r["cluster"], []).append(r)
        for members in clusters.values():
            assert any(m["kept"] for m in members)

    def test_zero_vector_blas_matches_literal(self, spark):
        rows = ROWS + [(9, [0.0, 0.0, 0.0])]
        df = _emb_df(spark, rows)
        lit = {r["id"]: (r["cluster"], r["cos_centroid"], r["kept"])
               for r in semantic.semantic_dedup(
                   df, k=3, n_iter=2, tau=0.9, method="literal").collect()}
        blas = {r["id"]: (r["cluster"], r["cos_centroid"], r["kept"])
                for r in semantic.semantic_dedup(
                    df, k=3, n_iter=2, tau=0.9, method="blas").collect()}
        assert lit[9] == blas[9]
        assert lit[9][1] is None

    def test_large_ids_do_not_overflow_seed_hash(self, spark):
        """ids past 2^63/KNUTH used to overflow the bigint seed hash
        (ANSI crash); the decimal path must handle the full id range."""
        base = 2 ** 62
        rows = [(base + i, v) for (i, v) in ROWS]
        df = _emb_df(spark, rows)
        assigned, cents = semantic.kmeans_lloyd(df, k=3, n_iter=1)
        assert assigned.count() == len(rows)
        assert len(cents) == 3

    def test_nan_embedding_does_not_nuke_its_cluster(self, spark):
        """A NaN-component embedding (bad upstream float) must behave
        like the zero vector: NULL cosine, ranks last, prunes nothing."""
        rows = ROWS + [(9, [float("nan"), 0.0, 0.0])]
        df = _emb_df(spark, rows)
        out = {r["id"]: r for r in semantic.semantic_dedup(
            df, k=3, n_iter=2, tau=0.0, method="literal").collect()}
        assert out[9]["cos_centroid"] is None
        assert out[9]["kept"]
        clusters = {}
        for r in out.values():
            clusters.setdefault(r["cluster"], []).append(r)
        for members in clusters.values():
            assert any(m["kept"] for m in members)


class TestSampledTraining:
    def test_full_assignment_against_sample_trained_centroids(self, spark):
        from pyspark.sql import functions as F

        from ons_utils_spark.operators.semantic import (
            _py_dot,
            kmeans_lloyd,
        )

        df = spark.createDataFrame(
            [(i, [float((i * 3) % 5), float((i + 1) % 4)])
             for i in range(24)],
            "vec_id bigint, embedding array<float>",
        )
        assigned, cents = kmeans_lloyd(
            df, k=2, n_iter=1, train_on=0.5, method="literal"
        )
        rows = assigned.collect()
        assert len(rows) == 24  # FULL corpus assigned
        # centroids match training on the explicit hash subset
        subset = df.where(
            F.pmod(F.xxhash64(F.col("vec_id")), F.lit(1_000_000))
            < F.lit(500_000)
        )
        _, cents_subset = kmeans_lloyd(
            subset, k=2, n_iter=1, method="literal"
        )
        assert cents == cents_subset
        # and every row is assigned to its true argmin centroid
        for r in rows:
            v = [float(x) for x in r["embedding"]]
            dists = [
                _py_dot(v, v) + _py_dot(c, c) - 2 * _py_dot(v, c)
                for c in cents
            ]
            assert r["__cluster"] == min(range(2), key=lambda j: (dists[j], j))
