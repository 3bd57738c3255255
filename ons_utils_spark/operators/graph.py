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
    redistribute_dangling: bool = False,
    reliable: bool = False,
) -> SparkDF:
    """PageRank by power iteration → ``(id, rank)``.

    ``rank_{t+1}(v) = (1-d)/N + d · Σ_{u→v} rank_t(u) / outdeg(u)`` over
    the nodes that appear in ``edges`` (isolated nodes aren't in the edge
    table and are excluded; their rank would be the constant ``(1-d)/N``).

    ``undirected=True`` (default) symmetrizes the edge list (each edge
    walks both ways). Besides modeling undirected similarity/link graphs,
    this guarantees every node has out-degree ≥ 1, so no dangling mass
    exists. With ``undirected=False``, nodes that only ever appear as
    destinations (out-degree 0, "dangling") absorb rank they never pass
    on; ``redistribute_dangling=True`` adds the standard correction —
    each iteration the dangling nodes' total mass is folded back
    uniformly (``rank_{t+1}(v) += d · dangling_mass_t / N``), so ranks
    sum to exactly 1 every iteration. The term costs one O(nodes)
    aggregate per iteration (a 1-row broadcast fold, same idiom as
    ``n_nodes``) plus a per-iteration eager checkpoint of the ranks
    (the ranks table gains a second consumer; without lineage
    truncation each level's plan would be duplicated into both,
    compounding exponentially between the default every-4 checkpoints).
    With ``redistribute_dangling=False`` dangling mass leaks (the
    documented trade — callers whose graphs have no dangling nodes lose
    nothing). Destination-only nodes DO receive ranks either way — the
    node set is src ∪ dst.

    ``reliable=True`` swaps the default ``localCheckpoint`` lineage
    truncation for RELIABLE checkpoints against the
    ``sparkContext.setCheckpointDir`` location (required to be set; this
    raises otherwise). localCheckpoint stores blocks on executors — an
    executor loss mid-run kills the whole (long) job; reliable
    checkpoints survive executor loss at the cost of a distributed-FS
    write per checkpoint. On a real cluster running 50+ iterations over
    a 100 TB edge list, use ``reliable=True``.

    Ranks sum to 1 over the node set (up to float error, and minus the
    dangling leak when it is not redistributed). ``rank`` is returned
    unrounded; consumers comparing across engines should round coarsely
    enough that each engine's sum-order-dependent float error (~1e-13 at
    thousands of contributions) cannot straddle a rounding boundary.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0,1), got {damping}")
    if reliable:
        sc = edges.sparkSession.sparkContext
        if sc.getCheckpointDir() is None:
            raise ValueError(
                "reliable=True needs a checkpoint directory: call "
                "spark.sparkContext.setCheckpointDir(<fault-tolerant "
                "path>) first (localCheckpoint would not survive "
                "executor loss)"
            )

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
    # N is ONE bounded scalar: collect it once (r13 optimization). The
    # r12 form folded a 1-row n_nodes aggregate back in as a broadcast
    # cross join inside EVERY iteration's rank update — one extra
    # broadcast stage per iteration for a value that never changes. The
    # arithmetic is unchanged bit-for-bit: the same count, the same
    # double division, now as a plan literal.
    n_val = nodes.count()
    if n_val == 0:
        return nodes.select("id", F.lit(0.0).alias("rank"))
    inv_n = F.lit(1.0) / F.lit(float(n_val))
    ranks = nodes.select("id", inv_n.alias("rank"))

    # Dangling mass only exists in directed graphs: after symmetrization
    # every node has out-degree >= 1 by construction.
    redistribute = redistribute_dangling and not undirected
    if redistribute:
        # Nodes with NO out-edges: node set minus the src set. Computed
        # once, persisted — each iteration joins ranks against it.
        dangling = nodes.join(
            edges_deg.select(F.col("src").alias("id")).distinct(),
            "id",
            "left_anti",
        ).persist()

    def _truncate(df: SparkDF) -> SparkDF:
        # Bounded (N rows). localCheckpoint = executor-block storage
        # (fast, dies with an executor); checkpoint = reliable FS write
        # (survives executor loss; dir validated above). The LOCAL form
        # is LAZY (r14): lineage truncation is identical either way —
        # downstream iterations plan against the LogicalRDD whether or
        # not it has materialized — but the eager form paid a dedicated
        # driver-blocking job per truncation, while lazily the next
        # consumer's job computes (and persists) the blocks; with two
        # consumers (redistribute mode) the persist still guarantees
        # compute-once. The RELIABLE form stays eager: a non-eager
        # reliable checkpoint recomputes its whole lineage a second
        # time when the checkpoint file is written.
        return (
            df.checkpoint(eager=True) if reliable
            else df.localCheckpoint(eager=False)
        )

    base_term = F.lit(1.0 - damping) / F.lit(float(n_val))
    for i in range(iterations):
        contribs = (
            edges_deg.join(
                ranks.withColumnRenamed("id", "src"), "src"
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("contrib"))
        )
        if undirected:
            # After symmetrization every node has in-degree >= 1, so
            # ``contribs`` already covers the whole node set — the r12
            # per-iteration ``nodes`` left join + na.fill(0) could never
            # fire and cost one join (plus its exchange/broadcast stage)
            # per iteration for nothing (r13 optimization; same rows,
            # same float arithmetic).
            new_ranks = contribs
        else:
            new_ranks = nodes.join(contribs, "id", "left").na.fill(
                0.0, ["contrib"]
            )
        if redistribute:
            # 1-row broadcast fold of this iteration's dangling mass.
            # ranks is lineage-truncated every iteration in this mode
            # (see below), so its second consumer re-reads a bounded
            # checkpointed relation instead of duplicating the plan.
            dm = ranks.join(dangling, "id").agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm")
            )
            new_ranks = new_ranks.join(F.broadcast(dm)).select(
                "id",
                (
                    base_term
                    + F.lit(damping)
                    * (
                        F.col("contrib")
                        + F.col("dm") / F.lit(float(n_val))
                    )
                ).alias("rank"),
            )
        else:
            new_ranks = new_ranks.select(
                "id",
                (base_term + F.lit(damping) * F.col("contrib")).alias(
                    "rank"
                ),
            )
        # Truncate lineage: every iteration when ranks has two consumers
        # (redistribute mode — fan-out without truncation compounds
        # exponentially), else every few iterations.
        if redistribute or ((i + 1) % 4 == 0 and i + 1 < iterations):
            if i + 1 < iterations:
                new_ranks = _truncate(new_ranks)
        ranks = new_ranks

    return ranks.select("id", "rank")
