"""Similarity search over embedding columns: brute-force cosine top-k and a
random-hyperplane-LSH bucketed variant.

LLM-data-pipeline extension (SURVEY.md §7 item 7). The embedding column is
``array<float>``; all math happens in double via the JVM-side helpers in
:mod:`ons_utils_spark.functions.arrays`.

Scale story:

- **brute-force top-k**: one pass over all vectors, per-partition heap via
  ``ORDER BY … LIMIT k`` (Spark plans TakeOrderedAndProject — no global
  sort, no full shuffle). The right baseline, and exact.
- **SRP-LSH**: sign-pattern of ``n_planes`` random hyperplane projections
  buckets similar vectors together; search only the query's bucket(s).
  Sub-linear candidate generation for repeated queries at 10⁹+ vectors;
  recall is tunable with ``n_planes`` (fewer planes → bigger buckets) and
  multi-probe.
"""

from __future__ import annotations

import random
from typing import Sequence

from pyspark.sql import DataFrame as SparkDF, functions as F

from ons_utils_spark.functions.arrays import array_dot, cosine_similarity


def cosine_topk(
    df: SparkDF,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> SparkDF:
    """Exact top-``k`` rows by cosine similarity to ``query_vec``.

    Returns ``(id, cos_sim)`` ordered by similarity desc (ties broken by
    id asc, so results are deterministic).
    """
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.round(cosine_similarity(F.col(vec_col), q), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), "id")
        .limit(k)
    )


def srp_signature(vec_col, planes: Sequence[Sequence[float]]):
    """Sign pattern of random-hyperplane projections → ``bigint`` bucket id.

    bit_i = 1 iff ``vec · plane_i > 0``. With ``len(planes)`` ≤ 63 the
    pattern packs into one bigint.
    """
    col = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    acc = F.lit(0).cast("bigint")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(v)) for v in plane])
        bit = F.when(array_dot(col, p) > 0, F.shiftleft(F.lit(1).cast("bigint"), i)).otherwise(
            F.lit(0).cast("bigint")
        )
        acc = acc.bitwiseOR(bit)
    return acc


def make_planes(dim: int, n_planes: int = 8, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (Gaussian components)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def srp_topk(
    df: SparkDF,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
) -> SparkDF:
    """Approximate top-``k``: score only vectors in the query's SRP bucket.

    At scale the bucketed table would be written partitioned by the bucket
    id (partition pruning turns the probe into a single-partition scan);
    here the bucket filter is pushed into the scan as a predicate on the
    computed signature. Recall < 1 by construction — verify against
    :func:`cosine_topk` when tuning.
    """
    dim = len(query_vec)
    planes = make_planes(dim, n_planes=n_planes, seed=seed)
    q_bucket = 0
    for i, plane in enumerate(planes):
        if sum(float(a) * float(b) for a, b in zip(query_vec, plane)) > 0:
            q_bucket |= 1 << i

    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        df.withColumn("__bucket", srp_signature(vec_col, planes))
        .where(F.col("__bucket") == q_bucket)
        .select(
            F.col(id_col).alias("id"),
            F.round(cosine_similarity(F.col(vec_col), q), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), "id")
        .limit(k)
    )


def ivf_build(
    df: SparkDF,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    seed: int = 42,
):
    """Build an IVF (inverted-file) index: KMeans centroids + assignments.

    Returns ``(assigned_df, centroids)`` where ``assigned_df`` adds a
    ``__list`` column (nearest-centroid id) and ``centroids`` is the
    driver-side ``list[(list_id, center_vector)]``.

    At scale the assigned table is written partitioned by ``__list`` so a
    probe scans only ``n_probe`` partitions (partition pruning). Uses
    ``pyspark.ml`` KMeans — distributed fit, broadcast centroids for
    assignment.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        array_to_vector(F.transform(F.col(vec_col), lambda x: x.cast("double"))).alias(
            "features"
        ),
    )
    model = KMeans(k=n_lists, seed=seed, featuresCol="features").fit(vecs)
    assigned = (
        model.transform(vecs)
        .withColumnRenamed("prediction", "__list")
        .select("id", "vec", "__list")
    )
    centroids = [(i, list(map(float, c))) for i, c in enumerate(model.clusterCenters())]
    return assigned, centroids


def ivf_topk(
    assigned: SparkDF,
    centroids,
    query_vec,
    k: int = 10,
    n_probe: int = 4,
) -> SparkDF:
    """Approximate top-``k`` from an IVF index: score only the ``n_probe``
    lists whose centroids are nearest the query.

    Recall grows with ``n_probe`` (``n_probe == n_lists`` degenerates to the
    exact brute-force scan). The list filter is a pushdown-able predicate —
    with a ``__list``-partitioned table it prunes whole partitions.
    """
    import math

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb) if na and nb else 0.0

    q = [float(v) for v in query_vec]
    probe_lists = [
        lid for lid, _ in sorted(centroids, key=lambda c: -cos(q, c[1]))[:n_probe]
    ]

    q_col = F.array(*[F.lit(v) for v in q])
    return (
        assigned.where(F.col("__list").isin(probe_lists))
        .select(
            "id",
            F.round(cosine_similarity(F.col("vec"), q_col), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), "id")
        .limit(k)
    )


def quantize_embeddings(
    df: SparkDF,
    vec_col: str = "embedding",
    bits: int = 8,
    q_col: str = "q",
    scale_col: str = "scale",
) -> SparkDF:
    """Symmetric per-vector scalar quantization of an embedding column.

    Adds ``scale_col`` (``max(|v_i|) / (2^(bits-1) - 1)``, double) and
    ``q_col`` (``array<int>`` of ``floor(v_i / scale + 0.5)`` — floor-based
    half-up rounding, which every SQL engine computes identically, unlike
    bare ``round`` whose tie mode differs between engines). Dequantize as
    ``q_i * scale``; max elementwise reconstruction error is ``scale / 2``.

    At 100 TB this is the storage/IO play: int8 vectors are 4× smaller
    than float32 on disk and over the shuffle, and ANN candidate
    generation (SRP buckets, IVF lists) works on the quantized form,
    reserving full-precision re-scoring for the final candidates. Pure
    row-local projection — zero shuffle. Zero vectors get scale 0 and
    all-zero codes (the ``greatest`` guard avoids 0/0).
    """
    if not 2 <= bits <= 16:
        raise ValueError(f"bits must be in [2, 16], got {bits}")
    qmax = float((1 << (bits - 1)) - 1)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    amax = F.array_max(F.transform(v, F.abs))
    # Materialize the scale as a COLUMN before building the codes: Spark's
    # subexpression elimination skips lambda bodies, so inlining the
    # array_max subtree into the transform would re-evaluate the O(d) max
    # once PER ELEMENT — O(d²) per vector on this hot path.
    out = df.withColumn(scale_col, amax / F.lit(qmax))
    safe = F.greatest(F.col(scale_col), F.lit(1e-300))
    codes = F.transform(
        v, lambda x: F.floor(x / safe + F.lit(0.5)).cast("int")
    )
    return out.withColumn(q_col, codes)


def dequantize_embeddings(
    df: SparkDF,
    q_col: str = "q",
    scale_col: str = "scale",
    out_col: str = "embedding",
) -> SparkDF:
    """Inverse of :func:`quantize_embeddings`: ``out_i = q_i * scale``
    (``array<double>``)."""
    return df.withColumn(
        out_col,
        F.transform(F.col(q_col), lambda x: x.cast("double") * F.col(scale_col)),
    )
