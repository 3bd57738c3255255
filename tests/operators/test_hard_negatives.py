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
