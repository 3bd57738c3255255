"""Semantic (embedding-space) clustering and deduplication.

LLM-data-pipeline extension (no reference analogue — the reference's only
array op is the ``np.diff`` UDF, ``ons_utils/pyspark/udfs.py:7-10``).
Implements the SemDeDup recipe (Abbas et al., 2023, arXiv:2303.09540):
cluster the corpus's embeddings with k-means, then prune near-identical
documents *within* each cluster — the clustering bounds the quadratic
pairwise phase to cluster-sized blocks, which is what makes semantic
dedup tractable at corpus scale.

Determinism is a design goal, not an accident:

- **Init**: the ``k`` seed vectors are the rows with the smallest
  ``(id * 2654435761) mod 2^32`` (Knuth multiplicative hash) — a
  pseudo-random but fully reproducible spread, fetched with
  ``ORDER BY … LIMIT k`` (planned as TakeOrderedAndProject: per-partition
  top-k, no global sort, a bounded k-row collect).
- **Centroid means** are computed by summing in ``decimal(38,18)`` —
  exact, *order-independent* arithmetic — then dividing in double and
  rounding to ``round_dp``. The result is bit-identical regardless of
  partitioning, task scheduling, or engine (the DuckDB oracle reproduces
  it exactly); a plain double ``avg`` would drift in the last ulp with
  reduction order and could flip a boundary assignment.
- **Distances** use the dot-product form ``|v|² + |c|² − 2·v·c`` where
  every dot product is a sequential left-to-right fold
  (:func:`ons_utils_spark.functions.arrays.array_dot`), matching DuckDB's
  ``list_dot_product`` bit-for-bit. Ties break toward the lower cluster
  id via struct-ordered ``array_min``.

Scale story (100 TB): each Lloyd iteration is one scan with a k-way
argmin over *broadcast literal* centroids (whole-stage codegen, no
shuffle), plus one ``posexplode`` aggregation keyed ``(cluster, dim)``
(partial-aggregated; k·d result rows — a bounded driver collect).
``n_iter`` is small and fixed. The SemDeDup phase self-joins only within
clusters, so its cost is Σ|cluster|² — choose ``k ≈ n / target_cluster``
to bound it (the paper uses k in the tens of thousands for billions of
docs); profile skew first with the ``(cluster, n_members)`` summary.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

from pyspark.sql import DataFrame as SparkDF, Window, functions as F

from ons_utils_spark.functions.arrays import array_dot
from ons_utils_spark.functions.localrel import local_rows_df

#: Knuth's multiplicative-hash constant (2^32 / golden ratio), public domain.
KNUTH_HASH = 2654435761


def _py_dot(a: Sequence[float], b: Sequence[float]) -> float:
    """Sequential left-to-right dot product — matches the engines' folds."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


#: Largest k routed to the literal-codegen assignment under method="auto"
#: through r13's build rounds. Kept for callers that explicitly compare
#: the historical routing; "auto" now resolves to the exact Arrow path
#: (see :func:`_resolve_method`).
AUTO_LITERAL_MAX_K = 16


def _resolve_method(method: str, k: int) -> str:
    """``auto`` → ``"vector"``: the Arrow-batched exact fold.

    r13 optimization (guide §4.1/§4.2): the ``literal`` path pays three
    per-query costs that grow with k·d — ~70 py4j round trips per
    centroid literal array at plan-build time, Janino compilation of the
    resulting expression tree, and (decisive) INTERPRETED evaluation:
    ``zip_with``/``aggregate`` are CodegenFallback expressions, so every
    dot product walks boxed lambda evaluators (~60 µs per 64-dim dot —
    measured 1.3 s vs 0.33 s for one 2000-row assignment). The
    ``vector`` path computes the identical arithmetic (dimension-major
    sequential folds — bit-identical, see :func:`_assign_vector`) as a
    handful of numpy ufuncs per Arrow batch. ``literal`` and ``blas``
    remain as explicit opt-ins (the SQL-transparent plan and the
    large-k GEMM speed respectively).
    """
    if method == "auto":
        return "vector"
    if method not in ("literal", "blas", "vector"):
        raise ValueError(
            f"method must be auto|literal|blas|vector, got {method!r}"
        )
    return method


def _assign_literal(
    df: SparkDF, vec_col: str, cents: List[List[float]], with_cos: bool = False
) -> SparkDF:
    """Add ``__cluster``/``__dist`` = argmin over broadcast centroid literals.

    Requires a precomputed ``__vv`` column (``v·v``). The per-centroid
    distance is ``__vv + c·c − 2·(v·c)``; the argmin is a struct-ordered
    ``array_min`` so ties go to the lower cluster id deterministically.
    Every dot is the sequential fold — this is the bit-exact path the
    SQL oracle replays. Zero shuffle, whole-stage codegen; right for
    k ≲ 16 (expression size is linear in k·d, and Janino compile time
    dominates beyond that — use the ``blas`` path).

    With ``with_cos`` also attaches ``__cos`` (cosine to the assigned
    centroid) via a flat ``element_at`` over per-cluster cosines — a
    nested when/coalesce chain here is quadratic for the optimizer and
    hangs planning beyond k≈16.
    """
    entries = []
    for j, c in enumerate(cents):
        clit = F.array(*[F.lit(float(x)) for x in c])
        cc = _py_dot(c, c)
        dist = F.col("__vv") + F.lit(cc) - 2 * array_dot(F.col(vec_col), clit)
        entries.append(F.struct(dist.alias("d"), F.lit(j).alias("j")))
    best = F.array_min(F.array(*entries))
    out = df.withColumn("__cluster", best["j"]).withColumn("__dist", best["d"])
    if with_cos:
        cos_exprs = []
        for c in cents:
            clit = F.array(*[F.lit(float(x)) for x in c])
            cc = _py_dot(c, c)
            denom = F.sqrt(F.col("__vv")) * F.sqrt(F.lit(cc))
            # Degenerate-norm guard (all-zero OR NaN-component embedding):
            # 0/0 and NaN/x are NaN, which Spark sorts ABOVE every number
            # and compares greater than any tau — one degenerate vector
            # would rank first and "prune" its whole cluster. NULL
            # instead: ranks last (DESC NULLS LAST), never prunes, never
            # pruned. NaN must be caught explicitly — NaN != 0 is TRUE.
            ok = ~F.isnan(denom) & (denom != 0)
            cos_exprs.append(
                F.when(ok, array_dot(F.col(vec_col), clit) / denom)
            )
        out = out.withColumn(
            "__cos", F.element_at(F.array(*cos_exprs), F.col("__cluster") + 1)
        )
    return out


def _assign_blas(
    df: SparkDF, vec_col: str, cents: List[List[float]], with_cos: bool = False
) -> SparkDF:
    """Arrow-batched argmin against the full centroid matrix — the
    large-k scale path (SemDeDup-realistic k is 10⁴–10⁵).

    One ``mapInPandas`` pass: per batch, a single ``X @ Cᵀ`` BLAS matmul
    (b×d by d×k) gives every distance via ``vv + cc − 2G``; ``argmin``
    takes the first minimum, matching the literal path's low-id
    tie-break. Zero shuffle; the centroid matrix (k·d doubles — 50 MB at
    k=10⁵, d=64) ships once per task via the closure. Trades the literal
    path's bit-reproducibility for k-scalability: BLAS reduction order
    differs from the sequential fold in the last ulp, so an assignment
    can flip only between near-exactly equidistant centroids.
    """
    import numpy as np
    from pyspark.sql.types import (
        DoubleType, IntegerType, StructField, StructType,
    )

    C = np.asarray(cents, dtype=np.float64)
    cc = np.einsum("ij,ij->i", C, C)
    sqrt_cc = np.sqrt(cc)

    fields = list(df.schema.fields) + [
        StructField("__cluster", IntegerType()),
        StructField("__dist", DoubleType()),
    ]
    if with_cos:
        fields.append(StructField("__cos", DoubleType()))
    schema = StructType(fields)

    def gen(batches):
        for pdf in batches:
            pdf = pdf.copy()
            if len(pdf) == 0:
                pdf["__cluster"] = np.array([], dtype="int32")
                pdf["__dist"] = np.array([], dtype="float64")
                if with_cos:
                    pdf["__cos"] = np.array([], dtype="float64")
                yield pdf
                continue
            X = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            vv = pdf["__vv"].to_numpy(dtype=np.float64)
            G = X @ C.T
            d2 = vv[:, None] + cc[None, :] - 2.0 * G
            j = d2.argmin(axis=1)
            rows = np.arange(len(j))
            pdf["__cluster"] = j.astype("int32")
            pdf["__dist"] = d2[rows, j]
            if with_cos:
                import pandas as pd

                denom = np.sqrt(vv) * sqrt_cc[j]
                # Same zero-norm contract as the literal path: NULL (not
                # NaN) so a degenerate vector sorts last and never prunes.
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = G[rows, j] / denom
                # pd.array maps NaN -> <NA> in the nullable dtype, which
                # Arrow ships to Spark as NULL.
                pdf["__cos"] = pd.array(
                    np.where(denom == 0, np.nan, cos), dtype="Float64"
                )
            yield pdf

    return df.mapInPandas(gen, schema)


def _assign_vector(
    df: SparkDF, vec_col: str, cents: List[List[float]], with_cos: bool = False
) -> SparkDF:
    """Arrow-batched argmin with the literal path's EXACT arithmetic —
    the default (``auto``) assignment engine.

    Bit-identical to :func:`_assign_literal` (pinned in tests): dot
    products accumulate dimension-major (``pq._fold_dots`` — one multiply
    rounding + one add rounding per step, numpy never fuses them into an
    FMA), distances are ``(vv + c·c) − 2·G`` with the same association,
    per-centroid ``c·c`` comes from the same driver-side
    :func:`_py_dot`, ``sqrt`` is IEEE-correctly-rounded in both engines,
    and ``argmin`` takes the FIRST minimum — the struct-ordered
    ``array_min``'s lower-cluster-id tie-break. Zero codegen, zero py4j
    literal plumbing, and the per-element interpreted-lambda cost of the
    ``zip_with``/``aggregate`` fold is replaced by d ufunc passes per
    batch.

    Only ``(vec, __vv)`` cross the Python boundary (guide §4.1: project
    before the opaque stage); every other column stays in the JVM. NaN
    distances rank above every finite value (Spark's total order); a
    vector with a NaN component has NaN ``__vv`` and follows the same
    NULL-cosine contract as the literal path. (Sole divergence from the
    literal path: a row mixing ±Inf distances with NaN distances can
    tie-break differently — unreachable without |v|² overflow.)
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType, IntegerType, StructField, StructType,
    )

    from ons_utils_spark.operators.pq import _fold_dots

    C = np.asarray(cents, dtype=np.float64)
    cc = np.asarray([_py_dot(c, c) for c in cents], dtype=np.float64)
    sqrt_cc = np.sqrt(cc)

    fields = [
        StructField("__cluster", IntegerType()),
        StructField("__dist", DoubleType()),
    ]
    if with_cos:
        fields.append(StructField("__cos", DoubleType()))
    out_type = StructType(fields)

    # Wrapped via pandas_udf(fn, type), not type hints: Spark 4.1's
    # hint inference rejects the Series->DataFrame (struct) signature.
    def _assign_fn(vec, vv):
        n = len(vec)
        if n == 0:
            out = {
                "__cluster": np.array([], dtype="int32"),
                "__dist": np.array([], dtype="float64"),
            }
            if with_cos:
                out["__cos"] = np.array([], dtype="float64")
            return pd.DataFrame(out)
        X = np.asarray(vec.tolist(), dtype=np.float64)
        v = vv.to_numpy(dtype=np.float64)
        G = _fold_dots(X, C)
        d2 = (v[:, None] + cc[None, :]) - 2.0 * G
        # NaN sorts ABOVE every number in Spark's total order; numpy's
        # argmin would instead return the first NaN. +inf reproduces the
        # ordering for every reachable input (all-NaN rows fall back to
        # cluster 0 under both rules).
        j = np.where(np.isnan(d2), np.inf, d2).argmin(axis=1)
        rows = np.arange(n)
        out = {"__cluster": j.astype("int32"), "__dist": d2[rows, j]}
        if with_cos:
            denom = np.sqrt(v) * sqrt_cc[j]
            # Same degenerate-norm contract as the literal path: NULL
            # (not NaN) when the denominator is zero or NaN, so the row
            # ranks last and never prunes (pd.array maps NaN -> <NA>).
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = G[rows, j] / denom
            out["__cos"] = pd.array(
                np.where(denom == 0, np.nan, cos), dtype="Float64"
            )
        return pd.DataFrame(out)

    # asNondeterministic: guide §4.4 — a downstream filter referencing a
    # UDF-derived field (e.g. a join's isnotnull(__cluster) constraint)
    # is otherwise pushed below the projection WITH A COPY of the UDF,
    # evaluating the assignment twice per row (seen in
    # q_kmeans_clusters' plan). The function is pure; the marker only
    # stops the optimizer duplicating or reordering it.
    _assign_udf = F.pandas_udf(_assign_fn, out_type).asNondeterministic()
    res = df.withColumn("__a", _assign_udf(F.col(vec_col), F.col("__vv")))
    keep = [c for c in df.columns]
    cols = keep + ["__a.__cluster", "__a.__dist"]
    if with_cos:
        cols.append("__a.__cos")
    return res.select(*cols)


def _assign(
    df: SparkDF,
    vec_col: str,
    cents: List[List[float]],
    method: str,
    with_cos: bool = False,
) -> SparkDF:
    fn = {
        "literal": _assign_literal,
        "blas": _assign_blas,
        "vector": _assign_vector,
    }[method]
    return fn(df, vec_col, cents, with_cos)


def resolve_train(
    df: SparkDF,
    train_on: "SparkDF | float | None",
    id_col: str,
) -> SparkDF:
    """Resolve the TRAINING slice for centroid/codebook fitting.

    ``None`` → the full input (exact-replay default). A DataFrame →
    used as-is (e.g. a pre-materialized 100k-vector sample). A float in
    (0, 1] → a deterministic, partitioning-invariant id-hash sample:
    ``xxhash64(id) mod 1e6 < frac·1e6`` — unlike ``df.sample``, whose
    per-partition Bernoulli draw changes membership whenever the
    partitioning does, this picks the SAME rows on any cluster layout
    (and replays in SQL, the package's xxh64-chain oracle trick).

    This is how the documented 100 TB practice is expressed: codebooks
    and centroids need ~100k vectors, not the corpus — train on the
    slice, then assign/encode the full input with the fitted model.
    """
    if train_on is None:
        return df
    if isinstance(train_on, SparkDF):
        return train_on
    frac = float(train_on)
    if not 0.0 < frac <= 1.0:
        raise ValueError(
            f"train_on fraction must be in (0, 1], got {train_on!r}"
        )
    return df.where(
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(1_000_000))
        < F.lit(int(round(frac * 1_000_000)))
    )


def kmeans_lloyd(
    df: SparkDF,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 2,
    round_dp: int = 6,
    method: str = "auto",
    with_cos: bool = False,
    train_on: "SparkDF | float | None" = None,
) -> Tuple[SparkDF, List[List[float]]]:
    """Deterministic distributed Lloyd k-means, DataFrame-native.

    Returns ``(assigned, centroids)``: ``assigned`` is the input plus
    ``__vv`` (squared norm), ``__cluster`` and ``__dist`` (squared L2 to
    the final centroid; plus ``__cos``, cosine to it, when ``with_cos``);
    ``centroids`` is the driver-side ``list[list[float]]`` (index =
    cluster id), each recomputed mean rounded to ``round_dp``.

    ``method``: ``"vector"`` (= ``"auto"``) = Arrow-batched exact-fold
    argmin, bit-exact vs the SQL oracle at any k; ``"literal"`` =
    codegen argmin over literal centroids (the same arithmetic as a
    Catalyst expression tree — plan-transparent but interpreted, k ≲ 16
    only); ``"blas"`` = matmul argmin, trading bit-reproducibility
    (ulp-level assignment ties may differ) for large-k GEMM speed. The
    centroid means are decimal-exact and order-independent under EVERY
    method.

    Unlike ``pyspark.ml`` KMeans (used by :func:`similarity.ivf_build`,
    where approximate centroids are fine), every step here is exactly
    reproducible — see the module docstring. An empty cluster keeps its
    previous centroid (standard Lloyd fallback), which the SQL oracle
    mirrors with a left join against the prior iteration.

    ``train_on`` (see :func:`resolve_train`) restricts seed selection
    and the Lloyd iterations to a training slice; the returned
    ``assigned`` frame still covers the FULL input, assigned to the
    sample-trained centroids. This is the 100 TB shape — centroids need
    ~100k vectors, not the corpus — and it stays deterministic: a
    fraction samples by id hash, so the fitted centroids are themselves
    reproducible.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    method = _resolve_method(method, k)

    vecs = df.withColumn("__vv", array_dot(F.col(vec_col), F.col(vec_col)))
    train = resolve_train(df, train_on, id_col)
    tvecs = (
        vecs
        if train is df
        else train.withColumn("__vv", array_dot(F.col(vec_col), F.col(vec_col)))
    )

    # Exact decimal arithmetic: id * KNUTH overflows int64 for ids past
    # ~3.5e9 (crashing under Spark 4's default ANSI mode, silently
    # wrapping otherwise) — decimal(38,0) holds the full 2^63 · 2^32
    # product, and the oracle does the same in HUGEINT.
    h = (
        F.col(id_col).cast("decimal(38,0)") * F.lit(KNUTH_HASH)
    ) % F.lit(2**32)
    seed_rows = (
        tvecs.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
        .orderBy(h.asc(), F.col(id_col).asc())
        .limit(k)
        .collect()
    )
    if len(seed_rows) < k:
        raise ValueError(
            f"k={k} exceeds the number of training rows ({len(seed_rows)})"
        )
    cents: List[List[float]] = [[float(x) for x in r.vec] for r in seed_rows]

    for _ in range(n_iter):
        assigned = _assign(tvecs, vec_col, cents, method)
        # Exact decimal sums -> order-independent means (see module doc).
        means = (
            assigned.select("__cluster", F.posexplode(F.col(vec_col)).alias("pos", "val"))
            .groupBy("__cluster", "pos")
            .agg(
                F.round(
                    F.sum(F.col("val").cast("double").cast("decimal(38,18)"))
                    .cast("double")
                    / F.count(F.lit(1)),
                    round_dp,
                ).alias("v")
            )
            .groupBy("__cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "v"))),
                    lambda s: s["v"],
                ).alias("cvec")
            )
            .collect()
        )
        new = {r["__cluster"]: [float(x) for x in r["cvec"]] for r in means}
        cents = [new.get(j, cents[j]) for j in range(k)]

    return _assign(vecs, vec_col, cents, method, with_cos), cents


def cluster_summary(
    df: SparkDF,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 2,
    round_dp: int = 6,
    method: str = "auto",
    train_on: "SparkDF | float | None" = None,
) -> SparkDF:
    """Per-cluster profile → ``(cluster, n_members, centroid_norm)``.

    ``centroid_norm`` is the L2 norm of the (rounded, deterministic)
    final centroid — a drift/degeneracy signal; ``n_members`` is the
    skew profile to consult before the quadratic SemDeDup phase.
    ``train_on`` passes through to :func:`kmeans_lloyd` — sizes still
    count the FULL input against the sample-trained centroids.
    """
    assigned, cents = kmeans_lloyd(
        df, id_col, vec_col, k, n_iter, round_dp, method=method,
        train_on=train_on,
    )
    spark = df.sparkSession
    # Round via F.round (half away from zero, matching DuckDB's round in
    # the oracle) — Python's round() is half-to-even and would diverge on
    # an exact tie at the (round_dp+1)-th decimal.
    norms = local_rows_df(
        spark,
        [(j, math.sqrt(_py_dot(c, c))) for j, c in enumerate(cents)],
        "cluster int, __norm_raw double",
    ).select(
        "cluster", F.round(F.col("__norm_raw"), round_dp).alias("centroid_norm")
    )
    sizes = assigned.groupBy(F.col("__cluster").alias("cluster")).agg(
        F.count(F.lit(1)).alias("n_members")
    )
    return (
        sizes.join(F.broadcast(norms), "cluster")
        .select("cluster", "n_members", "centroid_norm")
    )


def semantic_dedup(
    df: SparkDF,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 2,
    tau: float = 0.7,
    round_dp: int = 6,
    method: str = "auto",
    max_cluster: int = None,
) -> SparkDF:
    """SemDeDup (Abbas et al., 2023): within-cluster semantic pruning.

    Rank each cluster's members by cosine-to-centroid descending (ties by
    id ascending); a document is dropped when ANY earlier-ranked member of
    its cluster has cosine similarity ``> tau`` with it (the paper's
    non-cascading greedy — the keep-set keeps cluster "anchors" and prunes
    semantic repeats). Returns every input row as
    ``(id, cluster, cos_centroid, kept)``.

    Both cosines are rounded to ``round_dp`` *before* the comparison so
    the keep/drop frontier is bit-stable across engines. The pairwise
    phase joins only within a cluster (cost Σ|cluster|², by design — see
    module doc for sizing ``k``); the window is partitioned by cluster,
    never global.

    ``max_cluster`` is the skew guard for that quadratic phase (the same
    hazard class as ``fuzzy.py``'s ``max_bucket``): when set, any cluster
    larger than it raises BEFORE the self-join runs, naming the offender
    — one straggler task doing a near-full pairwise block is the failure
    mode on lopsided embedding spaces. The check reads the already-
    checkpointed rank table (one tiny aggregate, no extra corpus scan).
    Remedy: raise ``k`` (splits clusters) — profile with
    :func:`cluster_summary` first.
    """
    assigned, _ = kmeans_lloyd(
        df, id_col, vec_col, k, n_iter, round_dp, method=method, with_cos=True
    )

    w = Window.partitionBy("cluster").orderBy(
        F.col("cos_centroid").desc(), F.col("id").asc()
    )
    ranked = (
        assigned.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("vec"),
            "__vv",
            F.col("__cluster").alias("cluster"),
            F.round(F.col("__cos"), round_dp).alias("cos_centroid"),
        )
        .withColumn("rnk", F.row_number().over(w))
        # Materialized once: three consumers follow (both sides of the
        # within-cluster self-join and the verdict join) — without this
        # each would re-scan and re-rank the corpus.
        .localCheckpoint(eager=True)
    )

    if max_cluster is not None:
        oversized = (
            ranked.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") > max_cluster)
            .orderBy(F.col("n").desc())
            .limit(5)
            .collect()
        )
        if oversized:
            worst = ", ".join(f"cluster {r['cluster']}={r['n']}" for r in oversized)
            raise ValueError(
                f"cluster size exceeds max_cluster={max_cluster} ({worst}); "
                f"raise k (currently {k}) to split them — profile with "
                "cluster_summary()"
            )

    # Pairwise phase: ONE grouped Arrow pass per cluster instead of the
    # r12 within-cluster self-join + interpreted per-pair cosine fold
    # (zip_with/aggregate are CodegenFallback — measured ~8 s of
    # interpreted lambda evaluation over 250k pairs at sf0.1, vs <0.5 s
    # for the same arithmetic as dimension-major numpy folds; guide
    # §4.2). Arithmetic is BIT-IDENTICAL: pq._fold_dots accumulates each
    # pair's dot product in the fold's IEEE add order, sqrt/×/÷ are
    # correctly rounded in both engines, and max over earlier-ranked
    # cosines commutes with the (monotone) round-then-compare — a member
    # is dropped iff round(max cos, dp) > tau iff ANY pair passes. The
    # ROUNDING itself stays in Spark (F.round's HALF_UP on the exact
    # double), so the keep/drop frontier is the oracle's, untouched.
    # Pairs with a zero-or-NaN denominator yield NULL cosine in the join
    # form (WHERE-discarded); here they are simply never candidates for
    # the max — same outcome. Memory per task is O(block × |cluster|)
    # via row-blocked folds, never |cluster|²; |cluster| itself is the
    # max_cluster-guarded quantity, exactly as for the old join.
    from pyspark.sql.types import DoubleType, StructField, StructType

    id_type = ranked.schema["id"].dataType
    out_schema = StructType(
        [StructField("id", id_type), StructField("__max_cos", DoubleType())]
    )

    def _cluster_max_cos(pdf):
        import numpy as np
        import pandas as pd

        from ons_utils_spark.operators.pq import _fold_dots

        pdf = pdf[pdf["vec"].notna()]
        empty = pd.DataFrame(
            {
                "id": pdf["id"].iloc[:0],
                "__max_cos": np.array([], dtype="float64"),
            }
        )
        if len(pdf) < 2:
            return empty
        # Position in rnk order stands in for rnk itself (row_number is
        # unique per cluster; dropping NULL-vec rows — which can neither
        # drop nor be dropped — preserves relative order).
        pdf = pdf.sort_values("rnk")
        V = np.asarray(pdf["vec"].tolist(), dtype=np.float64)
        vv = pdf["__vv"].to_numpy(dtype=np.float64)
        sq = np.sqrt(vv)
        m = len(pdf)
        best = np.full(m, -np.inf)
        block = 1024
        cols = np.arange(m)[None, :]
        for lo in range(0, m, block):
            hi = min(lo + block, m)
            g = _fold_dots(V[lo:hi], V)
            denom = sq[lo:hi, None] * sq[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = g / denom
            mask = (
                (cols < np.arange(lo, hi)[:, None])
                & ~np.isnan(denom)
                & (denom != 0)
            )
            best[lo:hi] = np.where(mask, cos, -np.inf).max(axis=1)
        emit = best > -np.inf
        return pd.DataFrame(
            {"id": pdf["id"].to_numpy()[emit], "__max_cos": best[emit]}
        )

    n_part = df.sparkSession.sparkContext.defaultParallelism
    dropped = (
        ranked.select("cluster", "rnk", "id", "vec", "__vv")
        # Explicit-count repartition: AQE-proof partitioning the groupBy
        # reuses (the plan-audit rule for Python-CPU grouped stages).
        .repartition(n_part, "cluster")
        .groupBy("cluster")
        .applyInPandas(_cluster_max_cos, out_schema)
        .where(F.round(F.col("__max_cos"), round_dp) > tau)
        .select("id")
        .distinct()
    )

    return (
        ranked.join(dropped.withColumn("__dropped", F.lit(True)), "id", "left")
        .select(
            "id",
            "cluster",
            "cos_centroid",
            (~F.coalesce(F.col("__dropped"), F.lit(False))).alias("kept"),
        )
    )
