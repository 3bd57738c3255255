"""hard_negatives_blocked tests (operators/similarity.py)."""

import math

from ons_utils_spark.operators.similarity import hard_negatives_blocked


def _rows(spark, vecs):
    # vecs: list of (id, [floats], label)
    return spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    )


def _brute(vecs, k):
    def cos(u, v):
        d = sum(a * b for a, b in zip(u, v))
        nu = math.sqrt(sum(a * a for a in u))
        nv = math.sqrt(sum(a * a for a in v))
        return round(d / (nu * nv), 6)

    out = {}
    for i, u, la in vecs:
        cands = sorted(
            (
                (-cos(u, v), j)
                for j, v, lb in vecs
                if j != i and lb != la
            ),
        )[:k]
        out[i] = [(j, -s, r + 1) for r, (s, j) in enumerate(cands)]
    return out


class TestHardNegatives:
    def test_matches_bruteforce(self, spark):
        import random

        rng = random.Random(7)
        vecs = [
            (i, [rng.gauss(0, 1) for _ in range(8)], i % 3) for i in range(40)
        ]
        got = {}
        res = hard_negatives_blocked(
            _rows(spark, vecs), "vec_id", "embedding", "label", k=4,
            n_blocks=4,
        ).collect()
        for r in res:
            got.setdefault(r["id"], []).append(
                (r["neg_id"], r["cos_sim"], r["rank"])
            )
        # float32 storage: brute-force must use the same truncated values
        import numpy as np

        vecs32 = [
            (i, list(np.array(v, dtype=np.float32).astype(float)), l)
            for i, v, l in vecs
        ]
        expected = _brute(vecs32, 4)
        assert {i: v for i, v in expected.items() if v} == got

    def test_excludes_same_label_and_self(self, spark):
        vecs = [
            (1, [1.0, 0.0], 0),
            (2, [1.0, 0.001], 0),   # same label — never a negative of 1
            (3, [0.9, 0.1], 1),
        ]
        res = hard_negatives_blocked(
            _rows(spark, vecs), "vec_id", "embedding", "label", k=5
        ).collect()
        for r in res:
            assert r["id"] != r["neg_id"]
        negs_of_1 = [r["neg_id"] for r in res if r["id"] == 1]
        assert negs_of_1 == [3]

    def test_rank_contiguous_from_one(self, spark):
        vecs = [(i, [float(i), 1.0], i % 2) for i in range(10)]
        res = hard_negatives_blocked(
            _rows(spark, vecs), "vec_id", "embedding", "label", k=3
        ).collect()
        by_id = {}
        for r in res:
            by_id.setdefault(r["id"], []).append(r["rank"])
        for ranks in by_id.values():
            assert sorted(ranks) == list(range(1, len(ranks) + 1))


class TestZeroNormGuard:
    def test_zero_vector_never_ranks(self, spark):
        vecs = [
            (1, [1.0, 0.0], 0),
            (2, [0.9, 0.1], 1),
            (3, [0.0, 0.0], 1),  # zero norm: cosine undefined
        ]
        res = hard_negatives_blocked(
            _rows(spark, vecs), "vec_id", "embedding", "label", k=5
        ).collect()
        assert all(r["neg_id"] != 3 for r in res)
        assert all(r["id"] != 3 for r in res)
        assert all(not math.isnan(r["cos_sim"]) for r in res)


class TestHardNegativesSrp:
    """hard_negatives_srp — the SRP-bucketed scale path. Approximate by
    construction; on a CLUSTERED fixture (where hard negatives are
    cosine-close to their anchors, the case the operator exists for) it
    must reproduce the exact operator."""

    def _clustered(self, spark):
        import random

        rng = random.Random(11)
        vecs = []
        # 4 well-separated cluster directions in R^8; members get tiny
        # jitter, labels alternate WITHIN a cluster so every anchor's
        # hardest negatives sit in its own cluster (cosine-close → same
        # SRP bucket with high probability).
        centers = [
            [10, 0, 0, 0, 0, 0, 0, 0],
            [0, 10, 0, 0, 0, 0, 0, 0],
            [0, 0, 10, 0, 0, 0, 0, 0],
            [0, 0, 0, 10, 0, 0, 0, 0],
        ]
        vid = 0
        for c in centers:
            for m in range(12):
                v = [x + rng.uniform(-0.3, 0.3) for x in c]
                vecs.append((vid, v, m % 3))
                vid += 1
        return vecs, _rows(spark, vecs)

    def test_matches_exact_on_clustered_fixture(self, spark):
        from ons_utils_spark.operators.similarity import hard_negatives_srp

        vecs, df = self._clustered(spark)
        exact = {
            (r["id"], r["rank"]): (r["neg_id"], r["cos_sim"])
            for r in hard_negatives_blocked(
                df, "vec_id", "embedding", "label", k=3
            ).collect()
        }
        approx = {
            (r["id"], r["rank"]): (r["neg_id"], r["cos_sim"])
            for r in hard_negatives_srp(
                df, "vec_id", "embedding", "label", k=3, dim=8, n_planes=4
            ).collect()
        }
        assert approx == exact and exact

    def test_contract_and_determinism(self, spark):
        from ons_utils_spark.operators.similarity import hard_negatives_srp

        _, df = self._clustered(spark)
        a = sorted(
            map(
                tuple,
                hard_negatives_srp(
                    df, "vec_id", "embedding", "label", k=2, dim=8
                ).collect(),
            )
        )
        b = sorted(
            map(
                tuple,
                hard_negatives_srp(
                    df, "vec_id", "embedding", "label", k=2, dim=8
                ).collect(),
            )
        )
        assert a == b
        labels = {i: l for i, _, l in self._clustered(spark)[0]}
        for (i, n, _s, r) in a:
            assert 1 <= r <= 2 and i != n and labels[i] != labels[n]

    def test_multiprobe_off_is_subset_semantics(self, spark):
        """multiprobe=False probes only the anchor's own bucket — still a
        valid (lower-recall) result with the same contract."""
        from ons_utils_spark.operators.similarity import hard_negatives_srp

        _, df = self._clustered(spark)
        out = hard_negatives_srp(
            df, "vec_id", "embedding", "label", k=2, dim=8, multiprobe=False
        ).collect()
        assert out  # clusters share buckets, so negatives exist
        for r in out:
            assert r["rank"] in (1, 2)


class TestSrpSkewGuard:
    """max_bucket — the bucket-skew guard. Clustered real-world
    embeddings concentrate in a few SRP sign patterns; unguarded, a hot
    bucket is ONE applyInPandas straggler doing a near-full matmul. The
    guard tiles it into (anchor_salt, cand_salt) blocks of bounded side
    size, bit-identically (each pair still meets in exactly one group)."""

    def _one_bucket(self, spark, n=64, dim=8):
        # near-identical vectors (tiny jitter, signs never flip) → every
        # vector lands in the SAME SRP bucket: the pathological hot key.
        import random

        rng = random.Random(3)
        base = [1.0] * dim
        vecs = [
            (
                i,
                [x + rng.uniform(-1e-4, 1e-4) for x in base],
                i % 2,
            )
            for i in range(n)
        ]
        return vecs, _rows(spark, vecs)

    def test_fixture_really_is_one_bucket(self, spark):
        from pyspark.sql import functions as F

        from ons_utils_spark.operators.similarity import (
            make_planes,
            srp_signature,
        )

        _, df = self._one_bucket(spark)
        planes = make_planes(8, n_planes=6, seed=42)
        n_buckets = (
            df.select(srp_signature("embedding", planes).alias("b"))
            .agg(F.countDistinct("b").alias("n"))
            .collect()[0]["n"]
        )
        assert n_buckets == 1

    def test_guarded_matches_unguarded_bit_for_bit(self, spark):
        from ons_utils_spark.operators.similarity import hard_negatives_srp

        _, df = self._one_bucket(spark)
        kw = dict(k=3, dim=8, n_planes=6)
        unguarded = sorted(
            map(
                tuple,
                hard_negatives_srp(
                    df, "vec_id", "embedding", "label",
                    max_bucket=None, **kw
                ).collect(),
            )
        )
        guarded = sorted(
            map(
                tuple,
                hard_negatives_srp(
                    df, "vec_id", "embedding", "label", max_bucket=8, **kw
                ).collect(),
            )
        )
        assert guarded == unguarded and len(guarded) == 64 * 3

    def test_group_sizes_are_bounded(self, spark, monkeypatch):
        """Instrument the BLAS kernel with a per-group size assertion —
        a group whose either side exceeds the salted bound fails the job
        from inside the executor, so the test proves EVERY group the
        plan actually ran was bounded (hash salting is approximate, so
        the bound carries a 3x imbalance allowance)."""
        import ons_utils_spark.operators.similarity as sim

        cap = 8
        real_make = sim._make_local_topk

        def checked_make(k):
            inner = real_make(k)

            def checked(pdf):
                n_a = int((pdf["side"] == "a").sum())
                n_c = int((pdf["side"] == "b").sum())
                if n_a > 3 * cap or n_c > 3 * cap:
                    raise AssertionError(
                        f"unbounded group: {n_a} anchors x {n_c} cands "
                        f"(cap {cap})"
                    )
                return inner(pdf)

            return checked

        monkeypatch.setattr(sim, "_make_local_topk", checked_make)
        _, df = self._one_bucket(spark)
        out = sim.hard_negatives_srp(
            df, "vec_id", "embedding", "label",
            k=2, dim=8, n_planes=6, max_bucket=cap,
        ).collect()
        assert len(out) == 64 * 2
        # and the UNGUARDED plan on the same fixture would have run the
        # full 64x64 in one group — prove the instrumentation would
        # catch it (sanity check on the test itself):
        import pytest as _pytest

        from py4j.protocol import Py4JJavaError

        with _pytest.raises(Exception):
            sim.hard_negatives_srp(
                df, "vec_id", "embedding", "label",
                k=2, dim=8, n_planes=6, max_bucket=None,
            ).collect()

    def test_max_bucket_validation(self, spark):
        import pytest as _pytest

        from ons_utils_spark.operators.similarity import hard_negatives_srp

        _, df = self._one_bucket(spark, n=4)
        with _pytest.raises(ValueError, match="max_bucket"):
            hard_negatives_srp(
                df, "vec_id", "embedding", "label", dim=8, max_bucket=0
            )


class TestSrpMultiTable:
    """n_tables — the recall lever. A single SRP signature misses hard
    negatives whose bucket differs from every probed one; L independent
    plane sets union their candidates, and the reduction dedups pairs
    EXACTLY (a pair can co-bucket in several tables), so ranks stay
    contiguous and (id, neg_id) unique."""

    def _clustered(self, spark):
        t = TestHardNegativesSrp()
        return t._clustered(spark)

    def test_multi_table_is_dup_free_and_contiguous(self, spark):
        from collections import Counter

        from ons_utils_spark.operators.similarity import hard_negatives_srp

        _, df = self._clustered(spark)
        rows = hard_negatives_srp(
            df, "vec_id", "embedding", "label",
            k=3, dim=8, n_planes=4, n_tables=4,
        ).collect()
        pairs = Counter((r["id"], r["neg_id"]) for r in rows)
        assert max(pairs.values()) == 1
        by_anchor = {}
        for r in rows:
            by_anchor.setdefault(r["id"], []).append(r["rank"])
        assert all(
            sorted(v) == list(range(1, len(v) + 1))
            for v in by_anchor.values()
        )

    def test_recall_never_drops_with_more_tables(self, spark):
        """Candidate sets union across tables, so every (anchor, neg)
        pair found at L=1 is found at L=4 — with ranks possibly shifted
        upward only by NEW higher-sim negatives."""
        from ons_utils_spark.operators.similarity import hard_negatives_srp

        _, df = self._clustered(spark)
        kw = dict(k=3, dim=8, n_planes=4, multiprobe=False)
        one = {
            (r["id"], r["neg_id"])
            for r in hard_negatives_srp(
                df, "vec_id", "embedding", "label", n_tables=1, **kw
            ).collect()
        }
        four_rows = hard_negatives_srp(
            df, "vec_id", "embedding", "label", n_tables=4, **kw
        ).collect()
        four_sims = {}
        for r in four_rows:
            four_sims.setdefault(r["id"], []).append(r["cos_sim"])
        # every anchor keeps at least as many (and >= as similar) negs
        one_by_anchor = {}
        for i, n in one:
            one_by_anchor[i] = one_by_anchor.get(i, 0) + 1
        for anchor, cnt in one_by_anchor.items():
            assert len(four_sims.get(anchor, [])) >= cnt

    def test_matches_exact_on_clustered_fixture(self, spark):
        from ons_utils_spark.operators.similarity import hard_negatives_srp

        _, df = self._clustered(spark)
        exact = sorted(
            map(
                tuple,
                hard_negatives_blocked(
                    df, "vec_id", "embedding", "label", k=3
                ).collect(),
            )
        )
        multi = sorted(
            map(
                tuple,
                hard_negatives_srp(
                    df, "vec_id", "embedding", "label",
                    k=3, dim=8, n_planes=4, n_tables=3,
                ).collect(),
            )
        )
        assert multi == exact

    def test_n_tables_validation(self, spark):
        import pytest as _pytest

        from ons_utils_spark.operators.similarity import hard_negatives_srp

        _, df = self._clustered(spark)
        with _pytest.raises(ValueError, match="n_tables"):
            hard_negatives_srp(
                df, "vec_id", "embedding", "label", dim=8, n_tables=0
            )
