"""PageRank tests: pinned against a pure-Python power iteration."""

import pytest

from ons_utils_spark.operators.graph import pagerank


def reference_pagerank(
    edges, iterations, damping, undirected=True, redistribute=False
):
    """Same recurrence in plain Python dicts."""
    es = set(edges)
    if undirected:
        es |= {(b, a) for a, b in es}
    nodes = sorted({a for a, _ in es} | {b for _, b in es})
    out = {v: 0 for v in nodes}
    for a, _ in es:
        out[a] += 1
    n = len(nodes)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        contrib = {v: 0.0 for v in nodes}
        for a, b in es:
            contrib[b] += rank[a] / out[a]
        dm = sum(rank[v] for v in nodes if out[v] == 0) if redistribute else 0.0
        rank = {
            v: (1.0 - damping) / n + damping * (contrib[v] + dm / n)
            for v in nodes
        }
    return dict(rank)


EDGES = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3), (5, 1)]


class TestPagerank:
    def _df(self, spark, edges=EDGES):
        return spark.createDataFrame(edges, "src bigint, dst bigint")

    @pytest.mark.parametrize("iters", [1, 5, 10])
    def test_matches_reference(self, spark, iters):
        got = {
            r["id"]: r["rank"]
            for r in pagerank(self._df(spark), iterations=iters).collect()
        }
        want = reference_pagerank(EDGES, iters, 0.85)
        assert set(got) == set(want)
        for v in want:
            assert got[v] == pytest.approx(want[v], abs=1e-9)

    def test_ranks_sum_to_one(self, spark):
        ranks = [r["rank"] for r in pagerank(self._df(spark), iterations=8).collect()]
        assert sum(ranks) == pytest.approx(1.0, abs=1e-6)

    def test_hub_outranks_leaf(self, spark):
        # Node 1 touches 4 edges, node 5 only one.
        got = {
            r["id"]: r["rank"]
            for r in pagerank(self._df(spark), iterations=10).collect()
        }
        assert got[1] > got[5]

    def test_directed_mode(self, spark):
        # A cycle so no dangling mass even directed.
        cyc = [(1, 2), (2, 3), (3, 1)]
        got = {
            r["id"]: r["rank"]
            for r in pagerank(
                self._df(spark, cyc), iterations=6, undirected=False
            ).collect()
        }
        want = reference_pagerank(cyc, 6, 0.85, undirected=False)
        for v in want:
            assert got[v] == pytest.approx(want[v], abs=1e-9)
        # Symmetric cycle → uniform ranks.
        assert got[1] == pytest.approx(got[2], abs=1e-9)

    def test_directed_destination_only_node_gets_a_rank(self, spark):
        """A node appearing only as a destination (out-degree 0) must be
        IN the node set and receive rank — it used to silently vanish
        (dangling mass still leaks, as documented)."""
        edges = [(1, 2), (2, 1), (1, 3)]
        got = {
            r["id"]: r["rank"]
            for r in pagerank(
                self._df(spark, edges), iterations=4, undirected=False
            ).collect()
        }
        want = reference_pagerank(edges, 4, 0.85, undirected=False)
        assert set(got) == {1, 2, 3}
        for v in want:
            assert got[v] == pytest.approx(want[v], abs=1e-9)

    def test_duplicate_edges_collapse(self, spark):
        dup = EDGES + EDGES[:3]
        got = {
            r["id"]: r["rank"]
            for r in pagerank(self._df(spark, dup), iterations=5).collect()
        }
        want = reference_pagerank(EDGES, 5, 0.85)
        for v in want:
            assert got[v] == pytest.approx(want[v], abs=1e-9)

    def test_validation(self, spark):
        with pytest.raises(ValueError, match="iterations"):
            pagerank(self._df(spark), iterations=0)
        with pytest.raises(ValueError, match="damping"):
            pagerank(self._df(spark), damping=1.0)

    def test_directed_redistribution_conserves_mass(self, spark):
        """r5 verdict ask #4b: with redistribute_dangling=True a directed
        graph WITH dangling nodes keeps Σrank = 1 every run, and matches
        the plain-Python recurrence with the same correction term."""
        # 3 and 4 are dangling (destination-only).
        edges = [(1, 2), (2, 1), (1, 3), (2, 4)]
        got = {
            r["id"]: r["rank"]
            for r in pagerank(
                self._df(spark, edges),
                iterations=6,
                undirected=False,
                redistribute_dangling=True,
            ).collect()
        }
        want = reference_pagerank(
            edges, 6, 0.85, undirected=False, redistribute=True
        )
        assert set(got) == set(want)
        for v in want:
            assert got[v] == pytest.approx(want[v], abs=1e-9)
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
        # Without the correction, the same graph leaks dangling mass.
        leaked = {
            r["id"]: r["rank"]
            for r in pagerank(
                self._df(spark, edges), iterations=6, undirected=False
            ).collect()
        }
        assert sum(leaked.values()) < 1.0 - 1e-3

    def test_redistribution_is_noop_when_undirected(self, spark):
        """Symmetrized graphs have no dangling nodes — the flag must not
        change results (and must not add per-iteration work)."""
        a = {
            r["id"]: r["rank"]
            for r in pagerank(self._df(spark), iterations=5).collect()
        }
        b = {
            r["id"]: r["rank"]
            for r in pagerank(
                self._df(spark), iterations=5, redistribute_dangling=True
            ).collect()
        }
        assert a == b

    def test_reliable_requires_checkpoint_dir(self, spark):
        # No checkpoint dir configured in the test session by default.
        if spark.sparkContext.getCheckpointDir() is not None:
            pytest.skip("session already has a checkpoint dir")
        with pytest.raises(ValueError, match="setCheckpointDir"):
            pagerank(self._df(spark), reliable=True)

    def test_reliable_checkpoint_matches_local(self, spark, tmp_path):
        """r5 verdict ask #4a: reliable=True (FS checkpoints that survive
        executor loss) must produce identical ranks to the default
        localCheckpoint path."""
        # NOTE: a checkpoint dir, once set, stays for the session — the
        # requires-dir test above runs first (definition order) and
        # skips itself if some other test already set one.
        spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
        got = {
            r["id"]: r["rank"]
            for r in pagerank(
                self._df(spark),
                iterations=9,  # crosses the every-4 truncation twice
                reliable=True,
            ).collect()
        }
        want = reference_pagerank(EDGES, 9, 0.85)
        for v in want:
            assert got[v] == pytest.approx(want[v], abs=1e-9)
