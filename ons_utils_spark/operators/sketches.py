"""Mergeable frequency sketches: Count-Min over DataFrames.

LLM-data-pipeline extension (no reference twin). The Count-Min sketch
(Cormode & Muthukrishnan 2005) answers "how often does key X appear?"
over a stream/corpus in ``depth × width`` counters, with one-sided error:
``exact ≤ estimate ≤ exact + ε·N`` (w.h.p., ε ≈ e/width). Unlike exact
per-key counts its size is INDEPENDENT of key cardinality, and two
sketches of disjoint batches merge by cell-wise addition — the property
that makes it the right structure for incremental corpus statistics
(per-shard sketches roll up losslessly, like the mergeable HLL and
incremental-aggregate patterns elsewhere in this repo).

Representation: a DataFrame ``(d, b, cnt)`` — row per non-empty cell.
Hashing is ``xxhash64(d, key)`` (Spark's multi-arg chaining: the row
index hashed with seed 42 seeds the key hash), bucketed by ``pmod`` into
a power-of-two ``width`` so an external auditor using UNSIGNED 64-bit
arithmetic (the DuckDB oracle, ``plans/oracle_xxh64.py``) computes the
identical cells.

Scale: the build is one explode(depth) + a (depth × width)-key partial
aggregate — the shuffle is bounded by the SKETCH size, not the data;
estimation broadcast-joins the (≤ depth·width)-row sketch against the
probe keys. No driver collect anywhere.
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import DataFrame as SparkDF, functions as F


def _cell_array(key_col: str, depth: int, width: int):
    """The depth (d, b) cells of one key — the ONE place the hashing
    scheme lives (build, weighted build, and estimate all use it)."""
    return F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("d"),
                F.pmod(
                    F.xxhash64(F.lit(i).cast("bigint"), F.col(key_col)),
                    F.lit(width),
                ).cast("int").alias("b"),
            )
            for i in range(depth)
        ]
    )


def _cells(
    df: SparkDF,
    key_col: str,
    depth: int,
    width: int,
    carry: "list[str] | None" = None,
) -> SparkDF:
    # NULL keys are dropped: Spark's xxhash64 SKIPS null arguments, so a
    # NULL key would otherwise hash as a phantom fixed cell per depth row
    # — diverging from any external auditor that excludes NULLs (the
    # DuckDB oracle does) and polluting whatever real key shares the
    # cell.
    out = df.where(F.col(key_col).isNotNull()).select(
        *(carry or []), F.explode(_cell_array(key_col, depth, width)).alias("x")
    )
    return out.select(*(carry or []), "x.d", "x.b")


def _validate(depth: int, width: int) -> None:
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    if width < 2 or width & (width - 1):
        # Power of two: unsigned % width == pmod(signed, width) since
        # width divides 2^64 — any other modulus diverges from an
        # unsigned-arithmetic auditor on negative hashes.
        raise ValueError(f"width must be a power of two >= 2, got {width}")


def count_min_build(
    df: SparkDF,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    weight_col: Union[str, None] = None,
) -> SparkDF:
    """Build a Count-Min sketch of ``key_col`` → ``(d, b, cnt)`` rows.

    ``weight_col`` counts each row that many times — pass a
    pre-aggregated ``(key, count)`` table to build the sketch from key
    frequencies without a second scan of the raw data (bit-identical to
    building from the raw rows; pinned in tests). NULL keys are dropped
    on build AND estimate (a NULL has no frequency; Spark's xxhash64
    skips null args, which would otherwise mint a phantom cell).

    Merge sketches of disjoint batches with :func:`count_min_merge`;
    query with :func:`count_min_estimate` (same depth/width everywhere).
    """
    _validate(depth, width)
    if weight_col is None:
        return (
            _cells(df, key_col, depth, width)
            .groupBy("d", "b")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
    return (
        _cells(
            df.withColumn("__w", F.col(weight_col)), key_col, depth, width,
            carry=["__w"],
        )
        .groupBy("d", "b")
        .agg(F.sum("__w").alias("cnt"))
    )


def count_min_merge(*sketches: SparkDF) -> SparkDF:
    """Cell-wise sum of sketches built with identical depth/width —
    exactly the sketch of the concatenated inputs (pinned in tests)."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "b").agg(F.sum("cnt").alias("cnt"))


def count_min_estimate(
    sketch: SparkDF,
    keys: SparkDF,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> SparkDF:
    """Estimate each probe key's count → ``(key, est)``.

    ``est = min over d of cell(d, b_d(key))`` with absent cells read as 0.
    Guarantees ``exact ≤ est`` always and ``est ≤ exact + ε·N`` w.h.p. —
    the bound the registered query's oracle checks alongside recomputing
    the cells bit-for-bit.
    """
    _validate(depth, width)
    probes = keys.select(F.col(key_col).alias("key")).distinct()
    probe_cells = _cells(probes, "key", depth, width, carry=["key"])
    return (
        probe_cells.join(F.broadcast(sketch), ["d", "b"], "left")
        .na.fill(0, ["cnt"])
        .groupBy("key")
        .agg(F.min("cnt").alias("est"))
    )


def sketch_append_batch(
    batch: SparkDF,
    key_col: str,
    sketch_path: str,
    depth: int = 4,
    width: int = 1024,
    batch_id: "int | None" = None,
) -> None:
    """Write one batch's Count-Min cells into an append-only sketch store.

    Mergeability makes the durable format trivial and crash-safe: the
    store is the UNION of per-batch cell deltas (no read-modify-write
    window); :func:`load_sketch` re-aggregates on read. Compact whenever
    the delta count grows (rewrite with ``load_sketch(...).write`` —
    cell-wise sums are associative, so any compaction schedule yields the
    same sketch).

    The store has ONE layout regardless of caller: every delta lands
    under a ``batch_id=<id>`` partition directory. Streaming callers pass
    their ``foreachBatch`` batch id; batch callers (``batch_id=None``)
    append under the sentinel partition ``batch_id=-1``. A single layout
    means batch appends and streaming replays can share one
    ``sketch_path`` without producing a store that partition discovery
    reads inconsistently (the pre-r6 hazard: plain root-level appends
    mixed with partitioned writes).

    With ``batch_id``, the write REPLACES exactly that batch's partition
    (static overwrite of ``batch_id=<id>/``) — replaying a checkpointed
    micro-batch replaces its own deltas instead of double-counting them,
    making the at-least-once foreachBatch contract effectively
    exactly-once (the standard idempotent-sink recipe). The write recipe
    (sentinel partition, replay overwrite, legacy-layout guard) is
    shared with the Bloom store via
    :func:`ons_utils_spark.sources.store.partitioned_delta_append`.
    """
    from ons_utils_spark.sources.store import partitioned_delta_append

    sk = count_min_build(batch, key_col, depth, width)
    partitioned_delta_append(sk, sketch_path, batch_id=batch_id)


def load_sketch(spark, sketch_path: str) -> SparkDF:
    """Read an append-only sketch store back as ONE sketch (cell sums)."""
    raw = spark.read.parquet(sketch_path)
    return count_min_merge(raw.select("d", "b", "cnt"))


# ---------------------------------------------------------------------------
# Bottom-k (KMV) sketch: mergeable distinct-count + deterministic samples
# ---------------------------------------------------------------------------

#: Exact 2^64 as the unsigned-hash range (and the signed->unsigned shift).
_U64 = 18446744073709551616


def _unsigned_order(h):
    """Sort keys giving the UNSIGNED order of a signed xxhash64 value:
    non-negative longs (unsigned 0..2^63-1) sort before negative ones
    (unsigned 2^63..2^64-1), each group in signed ascending order."""
    return [(h < 0).cast("int").asc(), h.asc()]


def bottomk_sketch(df: SparkDF, key_col: str, k: int = 1024) -> SparkDF:
    """Bottom-k (KMV) sketch of a key column: the ``k`` unsigned-smallest
    DISTINCT ``xxhash64`` values, as ``(h)`` signed bigints.

    Mergeable by construction — ``bottomk(A ∪ B)`` equals the bottom-k
    of the two sketches' union (pinned in tests), so shards sketch
    independently and a coordinator folds ≤ k·shards rows. Plans as
    hash-distinct + TakeOrderedAndProject: per-partition top-k heaps, no
    global sort, ≤ k rows ever cross the wire per shard. NULL keys are
    excluded (COUNT DISTINCT semantics).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    h = F.xxhash64(F.col(key_col))
    return (
        df.where(F.col(key_col).isNotNull())
        .select(h.alias("h"))
        .distinct()
        .orderBy(*_unsigned_order(F.col("h")))
        .limit(k)
    )


def kmv_distinct(sketch: SparkDF, k: int) -> SparkDF:
    """Distinct-count estimate from a bottom-k sketch: one row
    ``(n_sketch, est)``.

    With the sketch saturated (``n_sketch == k``) the estimator is
    ``(k−1) / R_k`` where ``R_k`` = the k-th smallest hash normalized to
    (0,1) — i.e. ``(k−1)·2^64 / u_k`` with ``u_k`` the unsigned k-th
    minimum (Bar-Yossef et al. 2002). Below saturation the sketch IS the
    distinct set, so the exact ``n_sketch`` is returned. The unsigned
    value is reconstructed in exact decimal so the one double rounding
    happens identically in Spark and the SQL oracle.
    """
    # 2^64 exceeds a long literal — route the shift through a string cast.
    shift = F.lit(str(_U64)).cast("decimal(38,0)")
    u = F.col("h").cast("decimal(38,0)") + F.when(
        F.col("h") < 0, shift
    ).otherwise(F.lit(0).cast("decimal(38,0)"))
    agg = sketch.agg(
        F.count(F.lit(1)).alias("n_sketch"),
        F.max(u).alias("__uk"),  # the k-th minimum = max of the sketch
    )
    est = F.when(
        F.col("n_sketch") < k, F.col("n_sketch").cast("double")
    ).otherwise(
        F.lit(float((k - 1) * _U64)) / F.col("__uk").cast("double")
    )
    return agg.select("n_sketch", F.round(est, 4).alias("est"))


def hash_sample(df: SparkDF, key_col: str, n: int = 1024) -> SparkDF:
    """Deterministic pseudo-random sample: the rows whose ``xxhash64``
    of ``key_col`` is unsigned-smallest — reproducible across runs,
    partitionings and engines (no ``rand()``), mergeable like the KMV
    sketch. Ties on hash break by the key itself. Plans as
    TakeOrderedAndProject.

    ``key_col`` must be UNIQUE per row for the determinism contract to
    cover the whole row: rows sharing a key value have identical sort
    keys, and which of them survives a LIMIT boundary is
    partition-dependent (their other columns differ). Sample on the
    table's primary key.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    h = F.xxhash64(F.col(key_col))
    return (
        df.where(F.col(key_col).isNotNull())
        .orderBy(*_unsigned_order(h), F.col(key_col).asc())
        .limit(n)
    )


def sample_quantiles(
    df: SparkDF,
    key_col: str,
    val_col: str,
    probs=(0.1, 0.25, 0.5, 0.75, 0.9, 0.99),
    n: int = 1024,
    round_dp: int = 6,
) -> SparkDF:
    """Quantile estimates from a deterministic ``hash_sample`` →
    ``(prob, q_est)`` rows.

    The population quantile is estimated by the sample's exact quantile
    (lower / "disc" interpolation: sorted sample index
    ``floor(p·(m−1))``) — error is O(1/√n) in rank, independent of the
    corpus size, which is the whole point at 100 TB: the full table is
    never sorted; only ``n`` rows leave the scan (TakeOrderedAndProject),
    and the quantile extraction is one bounded single-row aggregate.
    """
    sample = hash_sample(df, key_col, n).select(
        F.col(val_col).cast("double").alias("__v")
    )
    one = sample.agg(F.sort_array(F.collect_list("__v")).alias("__arr"))
    arr = F.col("__arr")
    m = F.size(arr)
    rows = [
        F.struct(
            F.lit(float(p)).alias("prob"),
            # Empty input (or all-NULL values): m == 0 would index the
            # array at 0 and throw — emit NULL estimates instead.
            F.when(
                m > 0,
                F.round(
                    F.element_at(
                        arr,
                        (F.floor(F.lit(float(p)) * (m - 1)) + 1).cast("int"),
                    ),
                    round_dp,
                ),
            ).alias("q_est"),
        )
        for p in probs
    ]
    return one.select(F.explode(F.array(*rows)).alias("r")).select(
        "r.prob", "r.q_est"
    )


def bottomk_sketch_grouped(
    df: SparkDF, group_cols, key_col: str, k: int = 256
) -> SparkDF:
    """Per-group bottom-k (KMV) sketches in ONE pass:
    ``(group..., h)`` with ≤ ``k`` rows per group.

    The group-wise form of :func:`bottomk_sketch` — distinct
    ``(group, hash)`` pairs, then a rank-≤-k filter per group (window
    PARTITIONED by the group, never global). Each group's rows obey the
    same merge law as the global sketch. At scale this is the shape that
    matters: one shuffle keyed by group answers "distinct users per
    domain/day" for every group at once, with ≤ k rows per group
    surviving.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    from pyspark.sql import Window

    if isinstance(group_cols, str):
        group_cols = [group_cols]
    h = F.xxhash64(F.col(key_col))
    d = (
        df.where(F.col(key_col).isNotNull())
        .select(*group_cols, h.alias("h"))
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy(*_unsigned_order(F.col("h")))
    return (
        d.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_distinct_grouped(sketch: SparkDF, group_cols, k: int) -> SparkDF:
    """Per-group distinct-count estimates from grouped bottom-k sketches:
    ``(group..., n_sketch, est)`` — the same estimator (and the same
    exact-decimal unsigned reconstruction) as :func:`kmv_distinct`,
    one row per group.
    """
    if isinstance(group_cols, str):
        group_cols = [group_cols]
    shift = F.lit(str(_U64)).cast("decimal(38,0)")
    u = F.col("h").cast("decimal(38,0)") + F.when(
        F.col("h") < 0, shift
    ).otherwise(F.lit(0).cast("decimal(38,0)"))
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_sketch"),
        F.max(u).alias("__uk"),
    )
    est = F.when(
        F.col("n_sketch") < k, F.col("n_sketch").cast("double")
    ).otherwise(
        F.lit(float((k - 1) * _U64)) / F.col("__uk").cast("double")
    )
    return agg.select(*group_cols, "n_sketch", F.round(est, 4).alias("est"))


def kmv_append_batch(
    batch: SparkDF,
    key_col: str,
    store_path: str,
    k: int = 1024,
    batch_id: "int | None" = None,
) -> None:
    """Write one batch's bottom-k sketch into an append-only KMV store.

    Same durable recipe as the Count-Min and Bloom stores
    (:func:`ons_utils_spark.sources.store.partitioned_delta_append`):
    every delta lands under a ``batch_id=<id>`` partition (sentinel
    ``-1`` for batch callers), a streaming replay statically overwrites
    exactly its own partition — at-least-once ``foreachBatch`` becomes
    effectively exactly-once because bottom-k union is MERGEABLE and
    idempotent (re-folding identical hash rows changes nothing).
    :func:`load_kmv` re-folds on read; compaction is a rewrite with the
    loader's output.
    """
    from ons_utils_spark.sources.store import partitioned_delta_append

    sk = bottomk_sketch(batch, key_col, k)
    partitioned_delta_append(sk, store_path, batch_id=batch_id)


def load_kmv(spark, store_path: str, k: int) -> SparkDF:
    """Fold an append-only KMV store back into ONE bottom-k sketch.

    The merge law (``bottomk(A ∪ B)`` = bottom-k of the sketches' union)
    means the store can hold any number of per-batch deltas — the fold is
    distinct + unsigned-order + LIMIT k over ≤ k·batches rows.
    """
    raw = spark.read.parquet(store_path).select("h")
    return (
        raw.distinct()
        .orderBy(*_unsigned_order(F.col("h")))
        .limit(k)
    )
