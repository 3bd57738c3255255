"""Deterministic sampling, splitting, capping, and corpus mixing.

LLM-data-pipeline extension (no reference analogue — SURVEY.md §7 item 7):
the dataset-assembly half of a pre-training pipeline needs reproducible
subsetting — train/val/test splits, per-domain caps, per-source mixture
rates — where "reproducible" means the SAME row lands in the SAME subset
on any cluster size, any partitioning, any run. Spark's ``df.sample`` is
seed-AND-partition dependent, so it cannot give that guarantee; instead
every decision here derives from the md5 of the row's key: the first four
hex chars form a bucket in [0, 65536), and a fraction ``f`` keeps buckets
below ``floor(f * 65536)``. md5 hex output is identical across engines,
which also makes every operator ANSI-SQL-oracle-checkable.

At 100 TB: ``hash_sample`` / ``hash_split`` / ``weighted_mixture`` are
row-local projections + filters — zero shuffle, pushed into the scan like
any predicate, linear in executors. ``cap_per_group`` is one window
shuffle on the group key (the same shuffle the equivalent groupBy would
pay); for heavy skew pre-filter with ``hash_sample`` first.
"""

from __future__ import annotations

from typing import Mapping, Sequence, Union

from pyspark.sql import Column as SparkCol, DataFrame as SparkDF, Window, functions as F

from ons_utils_spark.generic import list_convert

#: Bucket space: first 4 hex chars of the md5 → 65536 buckets, so fraction
#: granularity is 1/65536 ≈ 0.0015%.
BUCKETS = 1 << 16


def hash_bucket(key: Union[str, SparkCol], salt: str = "") -> SparkCol:
    """The 4-hex-char sampling bucket of ``key`` (lowercase, comparable
    lexicographically against :func:`hex_threshold` outputs)."""
    key = F.col(key) if isinstance(key, str) else key
    return F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 4)


def hex_threshold(fraction: float) -> str:
    """Lexicographic threshold ``t``: ``bucket < t`` keeps
    ``floor(fraction * 65536) / 65536`` of keys. ``fraction >= 1`` returns
    a sentinel above every hex bucket."""
    if not 0.0 <= fraction:
        raise ValueError(f"fraction must be >= 0, got {fraction}")
    if fraction >= 1.0:
        return "g"  # 'g' > 'f' — lexicographically above every bucket
    return format(int(fraction * BUCKETS), "04x")


def hash_sample(
    df: SparkDF,
    key: Union[str, SparkCol],
    fraction: float,
    salt: str = "",
) -> SparkDF:
    """Keep a deterministic ``fraction`` of rows, decided by ``md5(key)``.

    Unlike ``df.sample`` the result is a pure filter: stable across runs,
    partitionings, and engines, and Catalyst pushes it into the scan.
    ``salt`` decorrelates independent samples over the same key.
    """
    return df.where(hash_bucket(key, salt) < F.lit(hex_threshold(fraction)))


def group_sample(
    df: SparkDF,
    group_col: str,
    key: Union[str, SparkCol],
    k: int,
    salt: str = "",
) -> SparkDF:
    """Deterministic uniform ``k``-sample PER GROUP (stratified sampling).

    The ``k`` rows whose ``md5(salt, key)`` sort lowest within each group
    survive — a pure function of the data, so the same rows are chosen on
    any cluster size, partitioning, or engine (unlike per-group
    ``df.sample``, which is neither exact-k nor reproducible across
    partitionings). Ties in the 128-bit md5 are broken by the key itself,
    so selection is total. Changing ``salt`` draws an independent sample.
    Groups smaller than ``k`` keep all their rows.

    One shuffle on the group key; the per-group order is a window
    row_number, never a global sort. The standard "cap every stratum at
    k examples" step of training-data assembly (balancing sources,
    languages, label classes).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    key = F.col(key) if isinstance(key, str) else key
    clash = {"__gs_h", "__gs_k", "__gs_rn"} & set(df.columns)
    if clash:
        raise ValueError(
            f"group_sample uses temp column(s) {sorted(clash)} which "
            "already exist in the input — rename them first"
        )
    w = Window.partitionBy(group_col).orderBy("__gs_h", "__gs_k")
    return (
        df.withColumn("__gs_h", F.md5(F.concat(F.lit(salt), key.cast("string"))))
        .withColumn("__gs_k", key.cast("string"))
        .withColumn("__gs_rn", F.row_number().over(w))
        .where(F.col("__gs_rn") <= k)
        .drop("__gs_h", "__gs_k", "__gs_rn")
    )


def weighted_group_sample(
    df: SparkDF,
    group_col: str,
    key: Union[str, SparkCol],
    weight_col: str,
    k: int,
    salt: str = "",
) -> SparkDF:
    """Deterministic weighted ``k``-sample without replacement per group
    (Efraimidis-Spirakis A-ES, 2006 — public algorithm).

    Each row draws a deterministic uniform ``u`` in (0, 1) from
    ``md5(salt, key)`` (first 12 hex digits over 16^12) and ranks by
    ``u^(1/w)``; the top ``k`` per group win. This reproduces weighted
    sampling without replacement exactly: a row's inclusion probability
    is proportional to its weight among the remaining rows at each
    draw. Deterministic across partitionings and engines (md5 and IEEE
    ``pow`` agree everywhere); new ``salt`` = independent draw.
    Non-positive weights never win (rank pinned to 0). One shuffle on
    the group key, per-group window — the weighted twin of
    :func:`group_sample`.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    key = F.col(key) if isinstance(key, str) else key
    clash = {"__ws_r", "__ws_k", "__ws_rn"} & set(df.columns)
    if clash:
        raise ValueError(
            f"weighted_group_sample uses temp column(s) {sorted(clash)} "
            "which already exist in the input — rename them first"
        )
    # u in (0, 1): 12 hex chars -> 48-bit int over 2^48; +1 avoids u=0.
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 12),
            16,
            10,
        ).cast("double")
        + 1.0
    ) / F.lit(float(16**12 + 1))
    rank = F.when(
        F.col(weight_col) > 0, F.pow(u, 1.0 / F.col(weight_col))
    ).otherwise(F.lit(0.0))
    w = Window.partitionBy(group_col).orderBy(
        F.col("__ws_r").desc(), "__ws_k"
    )
    return (
        df.withColumn("__ws_r", rank)
        .withColumn("__ws_k", key.cast("string"))
        .withColumn("__ws_rn", F.row_number().over(w))
        # rank 0 = non-positive weight: excluded even when the group has
        # fewer than k positive-weight rows (the documented contract).
        .where((F.col("__ws_rn") <= k) & (F.col("__ws_r") > 0))
        .drop("__ws_r", "__ws_k", "__ws_rn")
    )


def split_thresholds(weights: Mapping[str, float]) -> list:
    """``[(label, upper_hex_threshold_exclusive)]`` for :func:`hash_split`,
    from cumulative normalized weights; the last label gets the sentinel.
    Exposed so oracle SQL can be built from the exact same boundaries."""
    if not weights:
        raise ValueError("weights must be non-empty")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to > 0")
    labels = list(weights)
    out, cum = [], 0.0
    for label in labels[:-1]:
        cum += weights[label] / total
        out.append((label, hex_threshold(cum)))
    out.append((labels[-1], "g"))
    return out


def hash_split(
    df: SparkDF,
    key: Union[str, SparkCol],
    weights: Mapping[str, float],
    split_col: str = "split",
    salt: str = "",
) -> SparkDF:
    """Assign every row a deterministic split label (e.g. train/val/test).

    ``weights`` maps label → relative weight (normalized internally; dict
    order defines the bucket ranges). Adds ``split_col``; same row → same
    label forever, on any cluster.
    """
    bucket = hash_bucket(key, salt)
    thresholds = split_thresholds(weights)
    expr = None
    for label, upper in thresholds[:-1]:
        cond = bucket < F.lit(upper)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    last = F.lit(thresholds[-1][0])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def _hash32(key: Union[str, SparkCol], salt: str = "") -> SparkCol:
    """32-bit integer bucket of ``md5(salt, key)`` (bigint column).

    Shared by :func:`training_order` and :func:`kfold`: 32 bits keep
    modular assignments balanced for any modulus (16 bits gave up to 2:1
    skew whenever the modulus didn't divide 65536).
    """
    key = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def kfold(
    df: SparkDF,
    key: Union[str, SparkCol],
    k: int = 5,
    fold_col: str = "fold",
    salt: str = "",
) -> SparkDF:
    """Assign every row a deterministic cross-validation fold in ``[0, k)``.

    Like :func:`training_order`'s shard, the fold derives from 32 bits of
    ``md5(salt, key)`` — stable across runs, cluster sizes, and
    partitionings, so fold ``i``'s holdout set is reproducible anywhere
    (and a different ``salt`` gives an independent folding). Row-local
    projection, zero shuffle; folds are balanced to within 32-bit-hash
    uniformity for any ``k``.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    return df.withColumn(
        fold_col, F.pmod(_hash32(key, salt), F.lit(k)).cast("int")
    )


def cap_per_group(
    df: SparkDF,
    groups: Union[str, Sequence[str]],
    order_by: Union[str, Sequence[str]],
    n: int,
) -> SparkDF:
    """Keep at most ``n`` rows per group, the first ``n`` by ``order_by``.

    The per-domain / per-source document cap of web-corpus pipelines.
    One shuffle on the group keys; ``order_by`` should be a unique key
    (e.g. the doc id) so the cap is deterministic.
    """
    groups = list_convert(groups)
    order_by = list_convert(order_by)
    w = Window.partitionBy(*groups).orderBy(*order_by)
    rn = "__cap_rn"
    return df.withColumn(rn, F.row_number().over(w)).where(F.col(rn) <= n).drop(rn)


def weighted_mixture(
    df: SparkDF,
    key: Union[str, SparkCol],
    group_col: str,
    rates: Mapping[str, float],
    default_rate: float = 1.0,
    salt: str = "",
) -> SparkDF:
    """Per-group deterministic sampling rates — corpus mixing.

    ``rates`` maps a ``group_col`` value (language, source, domain tier) to
    the fraction of its rows to keep; unlisted groups keep
    ``default_rate``. This is the "sample Common Crawl at 30%, keep books
    at 100%" mixture step, as one row-local filter: the per-group
    threshold is a constant-folded CASE, so the plan stays a single
    pushed-down predicate — no join, no shuffle.
    """
    bucket = hash_bucket(key, salt)
    threshold = None
    for value, rate in rates.items():
        cond = F.col(group_col) == F.lit(value)
        t = F.lit(hex_threshold(rate))
        threshold = F.when(cond, t) if threshold is None else threshold.when(cond, t)
    default = F.lit(hex_threshold(default_rate))
    threshold = default if threshold is None else threshold.otherwise(default)
    return df.where(bucket < threshold)


def temperature_mixture(
    df: SparkDF,
    key: Union[str, SparkCol],
    group_col: str,
    temperature: float,
    salt: str = "",
) -> SparkDF:
    """Temperature-scaled corpus mixture: DATA-DRIVEN per-group rates.

    Where :func:`weighted_mixture` takes explicit rates, this derives them
    from the observed group sizes so the kept corpus's group shares follow
    ``n_g^(1/temperature)`` — the standard multilingual/multi-source
    rebalancing rule: ``temperature=1`` keeps everything (natural
    distribution), higher temperatures flatten dominance (the common-crawl-
    swamps-everything fix), lower temperatures sharpen it. Keep rates are
    ``r_g = (n_g / n_anchor) ** (1/temperature - 1)``, anchored so the
    most-upweighted group keeps 100% and every other rate is < 1 — pure
    deterministic downsampling (no row duplication): the anchor is the
    SMALLEST group when flattening (T > 1), the largest when sharpening.

    Plan: one count aggregate over ``group_col`` (tiny), a 1-row anchor
    fold, and a broadcast join of |groups| rates back onto the corpus —
    the corpus itself is scanned once and filtered row-locally against its
    md5 bucket, so the decision is reproducible on any partitioning, like
    every sampler here.
    """
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    exponent = 1.0 / temperature - 1.0
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    # Anchor via a window over the COUNTS table, not a separate 1-row
    # aggregate of it: a second aggregate subtree makes Catalyst duplicate
    # the whole upstream pipeline per consumer (the shared-subtree
    # column-pruning trap — measured 2.3x on the composed LLM pipeline).
    # The window is a single partition over |groups| rows — bounded small,
    # the build_vocab idiom.
    anchor_agg = F.min("__n") if temperature >= 1 else F.max("__n")
    rates = counts.select(
        group_col,
        F.pow(
            F.col("__n").cast("double")
            / anchor_agg.over(Window.partitionBy()),
            exponent,
        ).alias("__rate"),
    )
    bucket_int = F.conv(hash_bucket(key, salt), 16, 10).cast("long")
    # Null-safe join: a NULL group is its own group on the groupBy side,
    # so it must match its own rate here too — a plain equi-join would
    # silently drop every NULL-group row (the percentile_length_cap
    # lesson, r4 advice).
    rates = rates.withColumnRenamed(group_col, "__tm_key")
    return (
        df.join(
            F.broadcast(rates),
            F.col(group_col).eqNullSafe(F.col("__tm_key")),
        )
        .where(bucket_int < F.col("__rate") * BUCKETS)
        .drop("__rate", "__tm_key")
    )


def training_order(
    df: SparkDF,
    key: Union[str, SparkCol],
    n_shards: int,
    salt: str = "",
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> SparkDF:
    """Deterministic global shuffle for training-data ordering.

    Assigns every row a ``shard`` in ``[0, n_shards)`` and a 0-based
    ``pos`` within its shard, both derived purely from ``md5(salt, key)``
    — the SAME row gets the SAME (shard, pos) on any cluster size, any
    partitioning, any run, and changing ``salt`` produces an independent
    permutation (one salt per epoch is the standard trick). Reading shards
    in order then yields a reproducible pseudorandom pass over the corpus.

    At 100 TB: one shuffle on the shard key; each shard sorts its own
    rows independently (window ordered within the shard partition — never
    a global sort). Ties in the 128-bit md5 are broken by the key itself,
    so ``pos`` is total and stable.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    clash = {"__h", "__k"} & set(df.columns)
    if clash:
        raise ValueError(
            f"training_order uses temp column(s) {sorted(clash)} which "
            "already exist in the input — rename them first"
        )
    key = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    w = Window.partitionBy(shard_col).orderBy("__h", "__k")
    return (
        df.withColumn("__h", h)
        .withColumn("__k", key.cast("string"))
        .withColumn(
            shard_col,
            F.pmod(_hash32(key, salt), F.lit(n_shards)).cast("int"),
        )
        .withColumn(pos_col, (F.row_number().over(w) - 1).cast("bigint"))
        .drop("__h", "__k")
    )


def negative_pairs(
    df: SparkDF,
    id_col: str,
    k: int = 1,
    n_shards: int = 32,
    salt: str = "",
) -> SparkDF:
    """Deterministic pseudo-random negative pairs: ``(id, neg_id)`` with
    ~``k`` partners per row — the uniform-negative counterpart to
    hard-negative mining (contrastive training needs both).

    Construction — the ring join: rows hash into ``n_shards`` shards
    (md5-derived, so any engine reproduces it); within a shard, rows are
    ordered by an independent md5 key and row ``i`` pairs with rows
    ``(i + 1) .. (i + k)`` modulo the shard size. Because both shard
    assignment and intra-shard order are hash-derived, partners are
    pseudo-random; because they are DERIVED, the same corpus gives the
    same pairs on any cluster, partitioning, or engine — no
    ``rand()``, no global index. Change ``salt`` for an independent
    draw per epoch.

    Cost: one shuffle on the shard key (window rank + count), then a
    self-join on ``(shard, position)`` — both sides already hash-
    partitioned by shard. Exactly ``k`` partners per row except in
    shards with ≤ ``k`` rows, where wrap-around self/duplicate pairs
    are dropped (use more shards than ``corpus/1000`` and this never
    happens).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    sid = F.col(id_col).cast("string")
    # 32-bit hash (shared _hash32): 16 bits gave up to 2:1 shard skew for
    # any n_shards not dividing 65536, which biases the pair sampling.
    shard = F.pmod(_hash32(sid, salt + "s"), F.lit(n_shards))
    order_key = F.md5(F.concat(F.lit(salt + "o"), sid))
    base = df.select(
        F.col(id_col).alias("id"),
        shard.alias("__shard"),
        order_key.alias("__ok"),
    )
    w = Window.partitionBy("__shard").orderBy("__ok", "id")
    wc = Window.partitionBy("__shard")
    ranked = base.select(
        "id",
        "__shard",
        (F.row_number().over(w) - 1).alias("__pos"),
        F.count(F.lit(1)).over(wc).alias("__cnt"),
    )
    left = ranked.select(
        "id",
        "__shard",
        "__cnt",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.lit(k)),
                lambda d: F.pmod(F.col("__pos") + d, F.col("__cnt")),
            )
        ).alias("__ppos"),
    )
    right = ranked.select(
        F.col("id").alias("neg_id"),
        F.col("__shard").alias("__rshard"),
        F.col("__pos").alias("__rpos"),
    )
    return (
        left.join(
            right,
            (F.col("__shard") == F.col("__rshard"))
            & (F.col("__ppos") == F.col("__rpos")),
        )
        .where(F.col("id") != F.col("neg_id"))
        .select("id", "neg_id")
        .distinct()
    )
