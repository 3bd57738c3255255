"""PageRank tests: pinned against a pure-Python power iteration."""

import pytest

from ons_utils_spark.operators.graph import pagerank


def reference_pagerank(edges, iterations, damping, undirected=True):
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
        rank = {
            v: (1.0 - damping) / n + damping * contrib[v] for v in nodes
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
