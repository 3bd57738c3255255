"""Graph operators: PageRank over an edge table.

LLM-data-pipeline extension (no reference twin — the reference has no
graph support): web-crawl corpora carry a link graph, and link-centrality
scores (PageRank) are a standard quality/weighting signal for training
data (e.g. seed-quality propagation, crawl frontier prioritization).
Connected components for dedup clusters live in
:mod:`ons_utils_spark.operators.dedup` (``near_dup_representatives``).

Design for a 100 TB edge list:

- **Power iteration as DataFrame joins** — each iteration is one
  ``edges ⋈ ranks`` shuffle join + one aggregation on ``dst``. No RDDs,
  no GraphX (JVM-only), no driver-side adjacency.
- **Partitioning reuse**: the edge table is repartitioned on ``src`` ONCE
  and persisted; every iteration's join then co-locates with the
  (identically partitioned) ranks table, so per-iteration cost is one
  shuffle of the RANKS side only (O(nodes), not O(edges)).
- **Lineage control**: every 4 iterations the ranks are eagerly
  ``localCheckpoint``-ed, truncating the growing join+agg chain (the
  same cadence pattern as the connected-components loop — un-truncated,
  20 iterations compound into a plan Catalyst re-optimizes
  quadratically). Between checkpoints the chain stays lazy: each
  iteration's ranks feed exactly one consumer, so intermediate caching
  would add write cost without saving any recompute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF, Window, functions as F


def pagerank(
    edges: SparkDF,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
    undirected: bool = True,
) -> SparkDF:
    """PageRank by power iteration → ``(id, rank)``.

    ``rank_{t+1}(v) = (1-d)/N + d · Σ_{u→v} rank_t(u) / outdeg(u)`` over
    the nodes that appear in ``edges`` (isolated nodes aren't in the edge
    table and are excluded; their rank would be the constant ``(1-d)/N``).

    ``undirected=True`` (default) symmetrizes the edge list (each edge
    walks both ways). Besides modeling undirected similarity/link graphs,
    this guarantees every node has out-degree ≥ 1, so no dangling-mass
    redistribution term is needed — with ``undirected=False`` the caller
    must pass a graph whose every DESTINATION also appears as a source
    (i.e. no node is dangling / out-degree 0) or accept that dangling
    mass leaks (documented standard trade; a redistribution term costs
    one extra global aggregate per iteration). Destination-only nodes DO
    receive ranks either way — the node set is src ∪ dst.

    Ranks sum to 1 over the node set (up to float error and dangling
    leak). ``rank`` is returned unrounded; consumers comparing across
    engines should round coarsely enough that each engine's
    sum-order-dependent float error (~1e-13 at thousands of
    contributions) cannot straddle a rounding boundary.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0,1), got {damping}")

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if undirected:
        # Symmetrize with ONE explode, not union(e, swap(e)): a union
        # duplicates the (possibly expensive) upstream edge subtree into
        # each branch — with the degree join that compounded to FIVE
        # upstream executions inside the single cache build (seen in
        # explain); the explode reads the input once.
        e = e.select(
            F.explode(
                F.array(
                    F.struct(F.col("src"), F.col("dst")),
                    F.struct(
                        F.col("dst").alias("src"), F.col("src").alias("dst")
                    ),
                )
            ).alias("e")
        ).select("e.src", "e.dst")
    e = e.distinct()

    # Degree rides WITH each edge row via a window over src — one extra
    # shuffle, NO second consumption of the edge subtree (a groupBy+join
    # would re-execute it). The cached table comes out hash-partitioned
    # on src, which co-locates every iteration's join.
    edges_deg = e.withColumn(
        "deg", F.count(F.lit(1)).over(Window.partitionBy("src"))
    ).persist()

    # Node set = src ∪ dst. After symmetrization src alone covers it; in
    # directed mode destination-only nodes (no out-edges) would otherwise
    # silently drop out of the output (and out of N).
    nodes = edges_deg.select(F.col("src").alias("id"))
    if not undirected:
        nodes = nodes.union(edges_deg.select(F.col("dst").alias("id")))
    nodes = nodes.distinct().persist()
    n_nodes = nodes.agg(F.count(F.lit(1)).alias("n"))
    # 1-row broadcast fold (the established bounded idiom): (1-d)/N and
    # the initial 1/N reach every row without a driver collect.
    ranks = nodes.join(F.broadcast(n_nodes)).select(
        "id", (F.lit(1.0) / F.col("n")).alias("rank")
    )

    for i in range(iterations):
        contribs = (
            edges_deg.join(
                ranks.withColumnRenamed("id", "src"), "src"
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("contrib"))
        )
        new_ranks = (
            nodes.join(contribs, "id", "left")
            .na.fill(0.0, ["contrib"])
            .join(F.broadcast(n_nodes))
            .select(
                "id",
                (
                    (1.0 - damping) / F.col("n")
                    + F.lit(damping) * F.col("contrib")
                ).alias("rank"),
            )
        )
        # Truncate lineage every few iterations (eager, bounded: N rows).
        if (i + 1) % 4 == 0 and i + 1 < iterations:
            new_ranks = new_ranks.localCheckpoint()
        ranks = new_ranks

    return ranks.select("id", "rank")
