"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

LLM-data-pipeline extension (SURVEY.md §7 item 7). Architecture per operator,
with its 100 TB story:

- **exact**: hash the dedup key map-side (16-byte shuffle key instead of the
  whole document), then keep one representative per hash. One shuffle.
- **n-gram Jaccard (exact pairs)**: inverted-index self-join on shingles.
  Exact but O(sum of postings²) in the worst case — ``max_df`` caps the
  document frequency of a shingle (drops stop-shingles), which is the
  standard skew guard: without it one ubiquitous shingle creates a
  quadratic hot partition.
- **MinHash+LSH**: signature → band → bucket-join. Sub-quadratic candidate
  generation; candidates are then verified with exact Jaccard. Tune
  ``num_hashes``/``bands`` for the recall/cost point.
- **SimHash**: 64-bit sketch; Hamming-≤k pairs found by pigeonhole banding
  (k+1 bands ⇒ any pair within k shares a band).
- **embedding cosine**: exact all-pairs — a pure-Catalyst expression form
  for small sets, and a blocked numpy-matmul ``applyInPandas`` form
  (Arrow + BLAS) that is ~13x faster from ~10³ vectors up; SRP-LSH in
  :mod:`ons_utils_spark.operators.similarity` for candidate generation
  beyond that.

Text sketches are DataFrame ops + higher-order array expressions — no
Python in the hot path; the one deliberate Python boundary is the blocked
matmul, where BLAS beats per-pair Catalyst expressions by an order of
magnitude (dense linear algebra is the canonical Pandas-UDF case).
"""

from __future__ import annotations

import random
from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame as SparkDF, Window, functions as F

from ons_utils_spark.generic import list_convert
from ons_utils_spark.functions.localrel import local_rows_df
from ons_utils_spark.operators.text import shingle_hash64

#: Mersenne prime 2^31 - 1: modulus for the universal-hash family used by
#: MinHash permutations (standard construction, see Broder 1997). 31-bit so
#: ``a * h + b`` stays well inside a signed 64-bit long — Spark 4 runs in
#: ANSI mode, where bigint overflow throws instead of wrapping.
_MERSENNE_31 = (1 << 31) - 1


def triangular_pairs(items_col: str, fields: Optional[Sequence[str]] = None):
    """The postings-list pair-emission idiom, shared by every sketch here
    (jaccard/minhash/simhash candidates, the fuzzy join): given a SORTED
    array column of bucket members, emit the C(k,2) ordered pairs as a
    flat struct array — ``(id_a, id_b)`` for scalar members, or
    ``(f_a, f_b for each f in fields)`` for struct members. Sortedness of
    the input array is what makes ``*_a < *_b`` fall out of the
    triangular slice.
    """
    def pair(x, y):
        if fields is None:
            return F.struct(x.alias("id_a"), y.alias("id_b"))
        cols = []
        for f in fields:
            cols += [x[f].alias(f"{f}_a"), y[f].alias(f"{f}_b")]
        return F.struct(*cols)

    return F.flatten(
        F.transform(
            items_col,
            lambda x, i: F.transform(
                F.slice(items_col, i + 2, F.size(items_col) - i - 1),
                lambda y: pair(x, y),
            ),
        )
    )


def explode_pairs(
    df: SparkDF, items_col: str, fields: Optional[Sequence[str]] = None
) -> SparkDF:
    """DataFrame-level triangular pair emission — the r13 replacement
    for ``explode(triangular_pairs(...))`` at every candidate-generation
    site.

    Emits EXACTLY the pairs the expression form does — every
    ``(items[i], items[j])`` with ``i < j`` of the (sorted) bucket
    array, duplicate elements included — as a struct column ``p`` with
    the same field names (``id_a``/``id_b``, or ``f_a``/``f_b`` per
    requested field). The expression form builds the pair array through
    ``transform``/``slice``/``flatten`` — higher-order functions are
    CodegenFallback, so a 1M-pair bucket table pays ~3.5 s of
    interpreted lambda evaluation and per-slice array allocation
    (measured, q_fuzzy_name_pairs at sf0.1). This form is two
    codegen'd ``posexplode`` Generates with an ``ib > ia`` filter:
    same C(k,2) output, streamed through whole-stage codegen. The
    bucket/grouping columns are dropped (no caller reads them past
    pair emission).
    """

    def pair(x, y):
        if fields is None:
            return F.struct(x.alias("id_a"), y.alias("id_b"))
        cols = []
        for f in fields:
            cols += [x[f].alias(f"{f}_a"), y[f].alias(f"{f}_b")]
        return F.struct(*cols)

    return (
        df.select(
            F.col(items_col).alias("__items"),
            F.posexplode(F.col(items_col)).alias("__ia", "__a"),
        )
        .select("__ia", "__a", F.posexplode("__items").alias("__ib", "__b"))
        .where(F.col("__ib") > F.col("__ia"))
        .select(pair(F.col("__a"), F.col("__b")).alias("p"))
    )


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(
    df: SparkDF,
    cols: Union[str, Sequence[str]],
    id_col: Optional[str] = None,
) -> SparkDF:
    """Keep one row per distinct value of ``cols``.

    With ``id_col``, the kept row is the one with the smallest id
    (deterministic); without, an arbitrary row wins (``dropDuplicates`` —
    cheaper, no window). The dedup key is hashed map-side so the shuffle
    moves a 16-byte digest, not the full column value.
    """
    cols = list_convert(cols)
    if id_col is None:
        return df.dropDuplicates(cols)
    key = F.md5(F.concat_ws("\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols]))
    w = Window.partitionBy(key).orderBy(F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard pairs (inverted-index join)
# ---------------------------------------------------------------------------

def jaccard_pairs(
    df: SparkDF,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_df: Optional[int] = None,
) -> SparkDF:
    """Exact near-duplicate pairs by n-gram-shingle Jaccard similarity.

    Returns ``(id_a, id_b, jaccard)`` with ``id_a < id_b`` and
    ``jaccard >= threshold``. Inverted-index plan: explode distinct
    shingles, self-join on the shingle, count shared shingles per pair,
    compute ``|∩| / (|A| + |B| - |∩|)``.

    ``max_df`` drops shingles appearing in more than that many documents
    before the join — the skew guard that keeps the self-join sub-quadratic
    on real corpora. (Dropping a shingle both docs contain can only lower
    the estimated Jaccard, so results stay a subset — document the recall
    contract when you use it.)
    """
    return (
        _pair_shingle_counts(df, id_col, text_col, n, max_df)
        .withColumn(
            "jaccard",
            F.round(
                F.col("shared").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("shared")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _pair_shingle_counts(
    df: SparkDF,
    id_col: str,
    text_col: str,
    n: int,
    max_df: Optional[int],
) -> SparkDF:
    """Shared-shingle counts per candidate pair:
    ``(id_a, id_b, shared, sz_a, sz_b)`` with ``id_a < id_b`` — the common
    core of :func:`jaccard_pairs` and :func:`containment_pairs`, which
    differ only in the score they derive from these counts.

    POSTINGS-LIST formulation: group (id, set size) per shingle and emit
    the C(k,2) pairs per posting — ONE corpus scan and one shuffle,
    measured ~45% faster than the equivalent self-join (which scans and
    shingles the corpus twice). Shingles travel as 64-bit hashes
    (shingle_hash64): set overlap only needs shingle identity, and an
    8-byte group key keeps the postings shuffle ~3x smaller than trigram
    strings.

    The set size rides WITH the id through the postings (an 8-byte
    passenger on each exploded row), so no separate ``sizes`` aggregate
    and no joins back to it — the r3 form computed sizes from a second
    tokenize pass over the corpus and joined it in twice. To attach
    ``size(grams)`` next to ``explode(grams)`` without CollapseProject
    inlining the whole shingle pipeline into BOTH expressions, the grams
    array is materialized behind a single-row explode barrier first
    (Generate nodes are optimizer barriers), then sized and exploded.
    """
    grams = df.select(
        F.col(id_col).alias("id"),
        # Barrier 1: materialize the shingle array once per doc.
        F.explode(F.array(shingle_hash64(text_col, n=n))).alias("g"),
    )
    shingled = grams.select(
        "id",
        F.size("g").alias("sz"),
        # Barrier 2: fan out to one row per shingle, sz riding along.
        F.explode("g").alias("sh"),
    )

    posts = shingled.groupBy("sh").agg(
        F.sort_array(F.collect_list(F.struct("id", "sz"))).alias("ids")
    )
    if max_df is not None:
        # The skew guard is mandatory at web scale for this formulation:
        # a stop-shingle's posting list is otherwise unbounded.
        posts = posts.where(F.size("ids") <= max_df)

    return (
        explode_pairs(posts.where(F.size("ids") > 1), "ids", ["id", "sz"])
        .groupBy("p.id_a", "p.id_b", "p.sz_a", "p.sz_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .select("id_a", "id_b", "shared", "sz_a", "sz_b")
    )


def containment_pairs(
    df: SparkDF,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_df: Optional[int] = None,
) -> SparkDF:
    """Partial-duplicate pairs by n-gram-shingle CONTAINMENT.

    ``containment = |A ∩ B| / min(|A|, |B|)`` — 1.0 when the smaller
    document's shingle set is entirely inside the larger's. This is the
    signal Jaccard misses: a paragraph quoted inside a much longer page
    has high containment but low Jaccard (the union is dominated by the
    long side), so resemblance-based dedup keeps both. Broder (1997)
    distinguishes exactly these two notions (resemblance vs containment).

    Returns ``(id_a, id_b, containment)``, ``id_a < id_b``,
    ``containment >= threshold``. Same postings-list plan and cost model
    as :func:`jaccard_pairs` (shared core: :func:`_pair_shingle_counts` —
    one scan, one shuffle, C(k,2) per posting, ``max_df`` as the mandatory
    web-scale skew guard; dropping a shared shingle can only lower the
    score, so results stay a subset).
    """
    return (
        _pair_shingle_counts(df, id_col, text_col, n, max_df)
        .withColumn(
            "containment",
            F.round(
                F.col("shared").cast("double") / F.least("sz_a", "sz_b"), 6
            ),
        )
        .where(F.col("containment") >= threshold)
        .select("id_a", "id_b", "containment")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _minhash_params(num_hashes: int, seed: int) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [
        (rng.randrange(1, _MERSENNE_31), rng.randrange(0, _MERSENNE_31))
        for _ in range(num_hashes)
    ]


def _min_lane_exprs(
    num_hashes: int, seed: int, col: str = "h", premod: bool = False
) -> list[Column]:
    """The 64 (by default) ``min((a_i·h + b_i) mod p)`` aggregate lanes.

    Built as ``F.expr`` strings, not nested Column calls: each lane is ONE
    py4j round-trip instead of ~8, which cuts ~0.4 s of driver-side plan
    construction per query build (measured at 64 lanes) — the build runs
    inside every bench timing and inside every interactive call. Same
    arithmetic, bit-identical signatures (cross-checked against the Column
    form in tests). Packing lanes three-per-long the way
    :func:`simhash_sketches` packs its vote counters does NOT apply here:
    ``sum`` distributes over disjoint bit-fields, ``min`` does not.

    ``premod=True`` drops the inner ``pmod(h, p)``: the caller has already
    projected the hash into [0, p) ONCE before the aggregate, instead of
    every lane redundantly reducing it (64 pmods of generated code and
    runtime per input row saved — r5 first-run profiling showed the lane
    aggregate's codegen size is a real cost).
    """
    p = _MERSENNE_31
    src = col if premod else f"pmod({col}, {p})"
    return [
        F.expr(f"min(pmod({src} * {a}L + {b}L, {p}))").alias(f"_m{i}")
        for i, (a, b) in enumerate(_minhash_params(num_hashes, seed))
    ]


def _sig_from_hset_udf(num_hashes: int, seed: int):
    """Arrow-vectorized MinHash signature from a document's distinct
    shingle-hash set — bit-identical to the 64-lane aggregate
    (:func:`_min_lane_exprs`), computed AFTER the ``collect_set``
    instead of inside the hash aggregate.

    Exactness: ``min`` over the distinct set equals ``min`` over the
    multiset of shingle rows; each lane is the same integer arithmetic
    (``(pmod(h, p)·a + b) mod p`` — int64 products stay < 2⁶², numpy's
    ``%`` is the non-negative Python remainder = Spark's ``pmod``).
    Pinned against :func:`minhash_signatures` in tests.

    Why (r13, guide §4.2/§1.2): in carry-verify mode the aggregate must
    ship every distinct ``h`` anyway (``hset`` powers exact-Jaccard
    verification), so the 64 min-lanes added 64 expression evaluations
    per shingle ROW inside the hash aggregate — and, worse, its
    dominant cost at bench scale was Janino-compiling the 64-buffer
    aggregate (~3 s of q_dedup_minhash's first run). With the lanes
    derived from ``hset`` the aggregate is a plain ``collect_set`` and
    the lane math runs as ~64 vectorized ufunc passes per Arrow batch.
    Marked nondeterministic so a pushed-down filter cannot duplicate
    the stage (guide §4.4).
    """
    import numpy as np

    params = _minhash_params(num_hashes, seed)
    A = np.asarray([a for a, _ in params], dtype=np.int64)
    B = np.asarray([b for _, b in params], dtype=np.int64)
    p = np.int64(_MERSENNE_31)

    def fn(hset):
        import numpy as np
        import pandas as pd

        n_docs = len(hset)
        if n_docs == 0:
            return pd.Series([], dtype=object)
        sizes = np.fromiter((len(x) for x in hset), dtype=np.int64,
                            count=n_docs)
        flat = np.concatenate([np.asarray(x, dtype=np.int64) for x in hset])
        hm = flat % p
        offsets = np.zeros(n_docs, dtype=np.int64)
        np.cumsum(sizes[:-1], out=offsets[1:])
        out = np.empty((n_docs, num_hashes), dtype=np.int64)
        for i in range(num_hashes):
            out[:, i] = np.minimum.reduceat((hm * A[i] + B[i]) % p, offsets)
        return pd.Series(list(out))

    return F.pandas_udf(fn, "array<bigint>").asNondeterministic()


def _band_hash_exprs(bands: int, rows: int, lane) -> list[Column]:
    """One flat ``xxhash64(xxhash64(…0L, lane₀), lane₁)…`` chain per band.

    Semantically identical to folding the band's signature slice through
    ``F.aggregate(slice(sig, …), 0L, (acc, x) -> xxhash64(acc, x))`` —
    two-arg ``xxhash64(a, b)`` chains exactly like the fold — but the
    flat form generates a fraction of the code: no array construction, no
    slice, no higher-order-function lambda plumbing per band. r5 profiled
    q_dedup_minhash's first-run cost to per-query-shape codegen; this is
    one of the two shrink levers (the other: ``premod`` lanes).
    ``lane(i)`` returns the SQL text of signature lane ``i``.
    """
    out = []
    for j in range(bands):
        acc = "cast(0 as bigint)"
        for k in range(rows):
            acc = f"xxhash64({acc}, {lane(j * rows + k)})"
        out.append(F.expr(acc).alias(f"_bh{j}"))
    return out


def plan_lsh_bands(
    threshold: float,
    num_hashes: int = 64,
    resolution: int = 200,
) -> dict:
    """Pick the band count for :func:`minhash_lsh_pairs` at a Jaccard
    ``threshold`` — pure driver-side arithmetic, no Spark.

    For ``b`` bands of ``r = num_hashes/b`` rows, a pair with true Jaccard
    ``s`` becomes a candidate with probability ``p(s) = 1-(1-s^r)^b`` (the
    LSH S-curve, Broder/MMDS construction). The ideal curve is a step at
    the threshold; this returns the divisor ``b`` minimizing the summed
    deviation — expected candidate rate below the threshold (wasted
    verification) plus expected miss rate above it (lost recall). Since
    verification makes precision exact, false positives only cost compute
    while false negatives cost RESULTS — the miss side is weighted double.

    Returns ``{"bands", "rows", "fp_area", "fn_area"}``; areas are the
    mean S-curve deviation on each side of the threshold (0..1).
    """
    if not 0 < threshold < 1:
        raise ValueError(f"threshold must be in (0,1), got {threshold}")
    best = None
    for bands in range(1, num_hashes + 1):
        if num_hashes % bands:
            continue
        rows = num_hashes // bands
        fp = fn = 0.0
        n_lo = n_hi = 0
        for i in range(resolution):
            s = (i + 0.5) / resolution
            p = 1.0 - (1.0 - s**rows) ** bands
            if s < threshold:
                fp += p
                n_lo += 1
            else:
                fn += 1.0 - p
                n_hi += 1
        fp_area = fp / max(n_lo, 1)
        fn_area = fn / max(n_hi, 1)
        err = fp_area + 2.0 * fn_area
        if best is None or err < best[0]:
            best = (err, bands, rows, fp_area, fn_area)
    _, bands, rows, fp_area, fn_area = best
    return {
        "bands": bands,
        "rows": rows,
        "fp_area": round(fp_area, 6),
        "fn_area": round(fn_area, 6),
    }


def shingle_hashes(
    df: SparkDF,
    id_col: str,
    text_col: str,
    n: int = 3,
    distinct: bool = True,
) -> SparkDF:
    """``(id, h)`` rows: one 64-bit hash per shingle, exploded.

    The explode (a Generate node) is a hard optimizer barrier, so the
    tokenize→shingle→hash pipeline runs exactly ONCE per document — sketch
    operators then aggregate over these rows with map-side partial
    aggregation. (Computing k sketch lanes as k column expressions instead
    makes CollapseProject duplicate the whole shingle pipeline k times —
    measured ~50x slower.) Hashing happens INSIDE the shingle construction
    (:func:`shingle_hash64` chains per-token xxhash64) so no shingle string
    is ever allocated.
    """
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(shingle_hash64(text_col, n=n, distinct=distinct)).alias("h"),
    )


def minhash_signatures(
    df: SparkDF,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    seed: int = 42,
) -> SparkDF:
    """MinHash signatures → ``(id, sig array<bigint>)``, one row per doc.

    Classic distributed formulation: explode shingle hashes, then one
    hash-aggregate computing ``min((a_i * h + b_i) mod p)`` for each of the
    ``num_hashes`` permutations (Broder 1997). Partial aggregation makes the
    shuffle O(docs × num_hashes) regardless of document length. Documents
    with no shingles produce no row.
    """
    hashes = shingle_hashes(df, id_col, text_col, n=n).select(
        "id", F.expr(f"pmod(h, {_MERSENNE_31})").alias("hm")
    )
    mins = _min_lane_exprs(num_hashes, seed, col="hm", premod=True)
    return (
        hashes.groupBy("id")
        .agg(*mins)
        .select("id", F.array(*[f"_m{i}" for i in range(num_hashes)]).alias("sig"))
    )


def oph_minhash_signatures(
    df: SparkDF,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    seed: int = 42,
) -> SparkDF:
    """One-permutation-hashing MinHash signatures → ``(id, sig)``.

    The classic-literature alternative to :func:`minhash_signatures`
    (Li, Owen & Zhang, NIPS 2012): instead of evaluating ``num_hashes``
    independent permutations per shingle, ONE hash partitions the
    shingle space into ``num_hashes`` buckets (``pmod(h, k)``) and each
    lane is the minimum RAW hash within its bucket. MEASURED CAVEAT
    (scale_probe's ``oph_signatures`` vs ``minhash_signatures``, 10× at
    sf0.1): on this engine at k=64 the classic fused 64-lane aggregate
    is ~1.8× FASTER — whole-stage codegen amortizes the permutation
    arithmetic into a tight per-row loop, while OPH's two-level
    ``(id, bucket)`` hash aggregate pays a per-row grouping-key probe
    that outweighs the arithmetic it saves (and a 64-lane conditional
    single-level form was no faster than classic either). OPH's regime
    is large ``num_hashes`` (≥ 256, where classic's per-row work keeps
    growing and OPH's does not) or engines without fused aggregate
    codegen; below that, prefer :func:`minhash_signatures`. Empty
    buckets (short documents) are filled by CIRCULAR DENSIFICATION
    (Shrivastava & Li, ICML 2014): lane ``i`` borrows the value of the
    next non-empty bucket to its right, wrapping — a deterministic,
    engine-reproducible rule (the 2017 "optimal densification" variant
    reduces variance for very short docs at the cost of an extra hash;
    the circular rule keeps the whole operator a pure Catalyst
    expression). Collision probability per densified lane approximates
    Jaccard with variance slightly above classic MinHash for documents
    with ≪ ``num_hashes`` shingles — for those, classic signatures are
    the right tool; OPH exists for the long-document regime where the
    64× per-shingle saving dominates.

    ``num_hashes`` must be a power of two so the signed ``pmod``
    bucketing equals an external auditor's unsigned modulus (the DuckDB
    oracle recomputes every lane bit-for-bit). ``seed`` is accepted for
    signature-family symmetry but unused: OPH's single permutation IS
    the shingle hash itself. Documents with no shingles produce no row.
    """
    if num_hashes < 2 or num_hashes & (num_hashes - 1):
        raise ValueError(
            f"num_hashes must be a power of two >= 2, got {num_hashes}"
        )
    k = num_hashes
    # Two-level aggregate — the shape that actually realizes OPH's
    # saving. A 64-lane `min(CASE WHEN bucket = i ...)` aggregate would
    # still evaluate 64 conditional updates per shingle row (probe: no
    # faster than classic); grouping by (id, bucket) instead touches ONE
    # min buffer per row, and the second level reduces the already-tiny
    # O(docs × k) bucket-min rows.
    bucket_mins = (
        shingle_hashes(df, id_col, text_col, n=n)
        .groupBy("id", F.pmod("h", F.lit(k)).alias("b"))
        .agg(F.min("h").alias("v"))
    )
    sparse = bucket_mins.groupBy("id").agg(
        F.expr("map_from_entries(collect_list(struct(b, v)))").alias("__m")
    )
    # Sparse map → dense k-array (nulls where the bucket was empty), then
    # circular densification as one expression: duplicate the lane array
    # and, for each lane, take the first non-null in its forward window
    # of k entries (always non-empty: >= 1 shingle => >= 1 filled lane).
    build = (
        f"transform(sequence(0, {k - 1}), i -> element_at(__m, i))"
    )
    dense = (
        f"transform(sequence(0, {k - 1}), i -> "
        f"element_at(filter(slice(__arr2, i + 1, {k}), "
        f"x -> x IS NOT NULL), 1))"
    )
    return (
        sparse.withColumn("__sparse", F.expr(build))
        .withColumn("__arr2", F.expr("concat(__sparse, __sparse)"))
        .select("id", F.expr(dense).alias("sig"))
    )


def minhash_lsh_pairs(
    df: Optional[SparkDF] = None,
    id_col: str = "id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    seed: int = 42,
    index: Optional[SparkDF] = None,
    verify: str = "carry",
) -> SparkDF:
    """Near-duplicate pairs via MinHash LSH with exact-Jaccard verification.

    Candidate generation: the signature is cut into ``bands`` bands of
    ``num_hashes // bands`` rows; docs sharing any band hash become
    candidates (one explode + self-join on ``(band_idx, band_hash)``).
    Verification: exact Jaccard via ``array_intersect`` / ``array_union``
    over the 64-bit shingle-HASH sets (identical to string-set Jaccard
    barring a ~2⁻⁶⁴-probability hash collision), collected in the SAME
    aggregation pass that builds the signatures — the corpus is scanned and
    shingled exactly once. Pass a precomputed :func:`minhash_index` via
    ``index=`` (instead of ``df``) to skip even that scan — the path an
    ingest pipeline uses to reuse ONE signature computation across
    intra-batch dedup, the corpus join, and the index update.

    Returns ``(id_a, id_b, jaccard)``, ``id_a < id_b``,
    ``jaccard >= threshold``. Probabilistic recall (tune ``bands`` up for
    higher recall at the given threshold); precision is exact thanks to the
    verify step.

    Memory model of the verify path (``verify="carry"``, the default):
    ``base`` carries each document's full distinct shingle-hash set
    (``hset``) through the shuffle — 8 bytes per distinct shingle ≈ 8 x
    O(doc tokens) per row, i.e. ~8 KB for a 1k-token web page, independent
    of corpus size. That is what makes verification one cheap join instead
    of a corpus re-scan, and it is the right trade up to ~10⁹ docs (~10 TB
    of shuffle at web-page sizes, spread over the cluster). Beyond that, or
    for book-length documents, ``verify="rescan"`` flips the economics:
    ``base`` carries ONLY the fixed-width band hashes (the per-doc shuffle
    payload stops growing with document length), candidates are emitted
    from the band join alone and materialized (they are just id pairs),
    and the two shingle sets are re-derived by a SECOND ``shingle_hashes``
    scan restricted to candidate ids via a semi-join pushed below the
    shingle pipeline — O(candidate docs) extra compute instead of
    O(corpus x doc length) extra shuffle bytes. Both modes return the
    identical pair set. ``rescan`` requires ``df`` (the corpus must be
    re-readable; a precomputed ``index`` already paid for ``hset``).
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    if (df is None) == (index is None):
        raise ValueError("pass exactly one of `df` or `index`")
    if verify not in ("carry", "rescan"):
        raise ValueError(f"verify must be 'carry' or 'rescan', got {verify!r}")
    if verify == "rescan" and index is not None:
        raise ValueError("verify='rescan' needs `df` — an index already carries hset")
    rows = num_hashes // bands

    if index is not None:
        # Precomputed (id, sig, hset) — e.g. a persisted/filtered
        # minhash_index. Must have been built with the same
        # n/num_hashes/seed; skips the corpus scan entirely. Band hashes
        # come from the stored signature lanes — the identical flat
        # xxhash64 chain as the df path, just reading element_at(sig, i)
        # instead of the aggregate's _m{i} columns, so a df-built run and
        # an index-built run bucket identically.
        base = index.select(
            "id",
            *_band_hash_exprs(
                bands, rows, lambda i: f"element_at(sig, {i + 1})"
            ),
            "hset",
        )
    else:
        # pmod(h, p) projected ONCE before the aggregate (premod) — not
        # re-reduced inside each of the 64 lanes. `h` rides along only
        # when the verify step needs the original shingle-hash set.
        if verify == "carry":
            # Carry mode ships every distinct shingle hash through the
            # aggregate anyway (hset powers verification), so the
            # signature lanes derive from hset AFTER a plain
            # collect_set aggregate — one Arrow pass instead of 64
            # min-lanes inside the hash aggregate, and ~3 s less Janino
            # per fresh plan (r13; see _sig_from_hset_udf). Band hashes
            # read element_at(sig, ·) exactly like the index path, so
            # df-built and index-built runs still bucket identically.
            base = (
                shingle_hashes(df, id_col, text_col, n=n)
                .groupBy("id")
                .agg(F.collect_set("h").alias("hset"))
                .withColumn(
                    "sig", _sig_from_hset_udf(num_hashes, seed)(F.col("hset"))
                )
                .select(
                    "id",
                    *_band_hash_exprs(
                        bands, rows, lambda i: f"element_at(sig, {i + 1})"
                    ),
                    "hset",
                )
            )
        else:
            # Rescan mode carries no hset, so the lanes must come from
            # the aggregate itself — the fused 64-lane + band-hash
            # projection shape (r5), unchanged.
            hashes = shingle_hashes(df, id_col, text_col, n=n).select(
                "id",
                F.expr(f"pmod(h, {_MERSENNE_31})").alias("hm"),
            )
            mins = _min_lane_exprs(num_hashes, seed, col="hm", premod=True)
            base = (
                hashes.groupBy("id")
                .agg(*mins)
                .select(
                    "id",
                    *_band_hash_exprs(bands, rows, lambda i: f"_m{i}"),
                )
            )
        if verify == "carry":
            # Materialize (id, band hashes, hset) ONCE. Without this,
            # Catalyst column-prunes each of the three consumers (banding
            # needs the band hashes; each verify side needs hset) into
            # its own specialized aggregate — the executed plan then
            # scans and re-shingles the corpus THREE times (seen in
            # explain; the "one pass" this docstring promises never
            # materialized). The persist is the same per-corpus-version
            # cost a stored minhash_index pays, and being LAZY it adds
            # no extra job: the first stage that needs base caches it,
            # later consumers read the cache (an eager localCheckpoint
            # here cost the first-run channel a separate barrier job).
            base = base.persist()

    banded = base.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band_idx"),
                        F.col(f"_bh{j}").alias("band_hash"),
                    )
                    for j in range(bands)
                ]
            )
        ).alias("band"),
    ).select("id", "band.band_idx", "band.band_hash")

    # Candidates via the POSTINGS-LIST form (same idiom as jaccard_pairs):
    # group ids per (band_idx, band_hash) bucket and emit C(k,2) pairs.
    # One banded subtree instead of a self-joined pair of them — the
    # pre-r2 self-join recomputed the signature aggregate for each side
    # (4 parquet scans in the executed plan; this form has 3). Pair
    # emission lands on the same task either way (same bucket key), so
    # skew behavior is unchanged.
    cand = (
        explode_pairs(
            banded.groupBy("band_idx", "band_hash")
            .agg(F.sort_array(F.collect_list("id")).alias("ids"))
            .where(F.size("ids") > 1),
            "ids",
        )
        .select("p.id_a", "p.id_b")
        .distinct()
    )

    if verify == "rescan":
        # Materialize the candidate pairs (tiny: two ids per row) so the
        # expensive scan+signature subtree is not executed once per
        # downstream reference; the checkpoint also truncates the plan the
        # second corpus scan joins against.
        cand = cand.localCheckpoint()
        cand_ids = (
            cand.select(F.col("id_a").alias("__cid"))
            .union(cand.select(F.col("id_b").alias("__cid")))
            .distinct()
        )
        # Semi-join BELOW the shingle pipeline: only candidate documents
        # are re-tokenized, and only their shingle sets ever shuffle.
        restricted = df.join(
            cand_ids, F.col(id_col) == F.col("__cid"), "left_semi"
        )
        sets = (
            shingle_hashes(restricted, id_col, text_col, n=n)
            .groupBy("id")
            .agg(F.collect_set("h").alias("sh_set"))
        )
    else:
        sets = base.select("id", F.col("hset").alias("sh_set"))
    verified = (
        cand.join(sets.select(F.col("id").alias("id_a"), F.col("sh_set").alias("set_a")), "id_a")
        .join(sets.select(F.col("id").alias("id_b"), F.col("sh_set").alias("set_b")), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("set_a", "set_b")).cast("double")
                / F.size(F.array_union("set_a", "set_b")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_sketches(
    df: SparkDF,
    id_col: str,
    text_col: str,
    n: int = 2,
) -> SparkDF:
    """64-bit SimHash per document → ``(id, sh bigint)``.

    Charikar's sketch: each shingle votes +1/−1 per bit position of its
    xxhash64; the sign of each position's total becomes that bit.
    Documents with no shingles produce no row.

    The 64 vote counters are PACKED three-per-long in 21-bit fields:
    each shingle adds its bit ``i`` (0/1) at offset ``21·(i mod 3)`` of
    pack ``i div 3``, so after one hash-aggregate of 22 ``sum`` lanes
    (plus a shingle count) field ``i`` holds the set-bit count ``c_i``,
    and the vote sign is ``2·c_i > n_shingles``. Versus the naive 64-sum
    aggregate this compiles a third of the expressions and shuffles a
    third of the counter bytes — measured 3.1× faster first run (codegen
    dominates) and 27% faster steady-state at sf0.1, bit-identical
    sketches. Field capacity: 2²¹ ≈ 2M shingles per document (multi-MB
    text) — chunk anything larger before sketching (the fields would
    otherwise overflow silently).
    """
    hashes = shingle_hashes(df, id_col, text_col, n=n, distinct=False)
    # Lanes and the unpack chain are built as F.expr STRINGS: the nested
    # Column construction spent ~600 py4j round-trips (~1.4 s of
    # driver-side build on EVERY call); one parse call per lane plus one
    # for the whole 64-term unpack cuts that to ~0.3 s, bit-identical
    # (integer arithmetic is construction-independent; cross-checked in
    # tests and by the DuckDB oracle's full value hash).
    packs = []
    for p in range(22):
        terms = [
            f"shiftleft(shiftright(h, {i}) & 1, {21 * j})"
            for j, i in ((j, 3 * p + j) for j in range(3))
            if i < 64
        ]
        packs.append(F.expr(f"sum({' + '.join(terms)})").alias(f"_p{p}"))
    agg = hashes.groupBy("id").agg(*packs, F.count(F.lit(1)).alias("_n"))

    # Bit 63 of a signed long is the sign bit: its contribution is LONG_MIN
    # in two's complement (1 << 63 doesn't fit a bigint literal, hence the
    # MIN_LONG-by-subtraction spelling).
    fields = []
    for i in range(64):
        p, j = divmod(i, 3)
        c = f"(shiftrightunsigned(_p{p}, {21 * j}) & {(1 << 21) - 1})"
        value = (
            "(CAST(-9223372036854775807 AS BIGINT) - CAST(1 AS BIGINT))"
            if i == 63
            else f"CAST({1 << i} AS BIGINT)"
        )
        fields.append(
            f"(CASE WHEN 2 * {c} > _n THEN {value} ELSE CAST(0 AS BIGINT) END)"
        )
    return agg.select("id", F.expr(" | ".join(fields)).alias("sh"))


def simhash_pairs(
    df: SparkDF,
    id_col: str,
    text_col: str,
    n: int = 2,
    max_hamming: int = 3,
) -> SparkDF:
    """Pairs whose SimHashes differ by ≤ ``max_hamming`` bits.

    Pigeonhole banding: the 64-bit sketch is cut into ``max_hamming + 1``
    chunks; any pair within the Hamming budget must agree on at least one
    chunk, so a self-join on (chunk_idx, chunk_value) finds ALL such pairs
    (exact recall), then ``bit_count(xor)`` verifies.
    """
    hashed = simhash_sketches(df, id_col, text_col, n=n)
    return hamming_pairs(hashed, max_hamming=max_hamming)


def hamming_pairs(
    hashed: SparkDF,
    max_hamming: int = 3,
    id_col: str = "id",
    hash_col: str = "sh",
) -> SparkDF:
    """All pairs of a 64-bit-sketch table within a Hamming budget →
    ``(id_a, id_b, hamming)`` — the pigeonhole banding factored out of
    :func:`simhash_pairs` so ANY 64-bit perceptual sketch family can
    reuse it (text SimHash, image dHash): the sketch is cut into
    ``max_hamming + 1`` chunks; any pair within the budget must agree
    on at least one chunk (exact recall), candidates come from
    postings-list buckets per (chunk_idx, chunk_value), and
    ``bit_count(xor)`` verifies."""
    if not 0 <= max_hamming <= 63:
        raise ValueError(
            f"max_hamming must be in [0, 63], got {max_hamming}"
        )
    chunks = max_hamming + 1
    width = 64 // chunks

    hashed = hashed.select(
        F.col(id_col).alias("id"), F.col(hash_col).alias("sh")
    )

    def _chunk(i: int):
        # max_hamming=0 → ONE 64-bit chunk: the mask (1<<64)−1 overflows
        # a long literal, and the chunk IS the sketch — exact-duplicate
        # grouping.
        if width == 64:
            return F.col("sh")
        return (
            F.shiftrightunsigned(F.col("sh"), i * width)
            .bitwiseAND(F.lit((1 << width) - 1))
        )

    # Chunk positions unrolled in Python: Spark's shift functions take only
    # literal ints for the shift amount, and `chunks` is tiny (max_hamming+1).
    banded = hashed.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_idx"),
                        _chunk(i).alias("chunk_val"),
                    )
                    for i in range(chunks)
                ]
            )
        ).alias("c"),
    ).select("id", "sh", "c.chunk_idx", "c.chunk_val")

    # POSTINGS-LIST form (the same idiom as jaccard/minhash candidate
    # generation): group (id, sketch) per chunk bucket and emit C(k,2)
    # pairs per bucket. One banded subtree instead of a self-joined pair
    # of them — the self-join form computed the whole sketch aggregate
    # twice (two corpus scans in the executed plan). sort_array on the
    # (id, sh) structs orders by id, so id_a < id_b falls out of the
    # triangular emission.
    pairs = (
        explode_pairs(
            banded.groupBy("chunk_idx", "chunk_val")
            .agg(
                F.sort_array(F.collect_list(F.struct("id", "sh"))).alias(
                    "items"
                )
            )
            .where(F.size("items") > 1),
            "items",
            ["id", "sh"],
        )
        .select(
            "p.id_a",
            "p.id_b",
            F.bit_count(F.col("p.sh_a").bitwiseXOR(F.col("p.sh_b"))).alias(
                "hamming"
            ),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
    return pairs


# ---------------------------------------------------------------------------
# Embedding near-dup
# ---------------------------------------------------------------------------

def embedding_near_dup_pairs(
    df: SparkDF,
    id_col: str,
    vec_col: str,
    threshold: float = 0.99,
) -> SparkDF:
    """Exact near-duplicate pairs by embedding cosine ≥ ``threshold``.

    Pure-Catalyst all-pairs (self cross join with ``id_a < id_b``) — exact,
    zero Python, right up to ~10³ vectors. For larger sets use
    :func:`embedding_near_dup_pairs_blocked` (numpy matmul over block
    pairs — ~50x faster at 10³-10⁶ vectors) or SRP-LSH candidates from
    :mod:`ons_utils_spark.operators.similarity`.
    """
    # Pre-compute the double-cast vector and its norm ONCE PER ROW on each
    # join side — inside the pair loop only the dot product remains. Leaving
    # norms in the post-join expression makes the nested-loop join recompute
    # them per PAIR (measured ~15x slower). The formula stays dot/(na*nb),
    # bit-identical to computing cosine per pair.
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    prepared = df.select(
        F.col(id_col).alias("id"),
        vec_d.alias("vec"),
        F.sqrt(F.aggregate(
            F.zip_with(vec_d, vec_d, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )).alias("norm"),
    )
    a = prepared.select(
        F.col("id").alias("id_a"), F.col("vec").alias("vec_a"), F.col("norm").alias("norm_a")
    )
    b = prepared.select(
        F.col("id").alias("id_b"), F.col("vec").alias("vec_b"), F.col("norm").alias("norm_b")
    )
    dot = F.aggregate(
        F.zip_with("vec_a", "vec_b", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    denom = F.col("norm_a") * F.col("norm_b")
    cos = F.when(denom != 0, dot / denom)
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", F.round(cos, 6))
        .where(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def embedding_near_dup_pairs_blocked(
    df: SparkDF,
    id_col: str,
    vec_col: str,
    threshold: float = 0.99,
    n_blocks: int = 8,
) -> SparkDF:
    """Exact all-pairs cosine ≥ ``threshold`` via blocked numpy matmul.

    Dense linear algebra is the one hot path where Catalyst expressions
    genuinely lose (per-pair array allocation, no SIMD): here each vector is
    hashed into one of ``n_blocks`` blocks, every block PAIR becomes one
    ``applyInPandas`` group, and the group computes the full cosine matrix
    with one float64 BLAS matmul, emitting only pairs above threshold.

    Cost model at scale: rows are replicated ~``n_blocks``/2 times through
    ONE shuffle; each task is an O((n/B)² · d) matmul. Choose
    ``n_blocks ≈ sqrt(total_vectors / rows_per_task_target)`` so tasks stay
    cache-friendly. Exact result — same contract as
    :func:`embedding_near_dup_pairs`.
    """
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    # Preserve the caller's id type through the Arrow boundary — hardcoding
    # bigint here corrupted/rejected string ids while the unblocked twin
    # accepted them (ADVICE r1).
    id_ddl = df.schema[id_col].dataType.simpleString()
    block = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int")
    data = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"), block.alias("block")
    )

    # Tag each vector with every block-pair group it participates in: a
    # vector in block b is side "a" of pairs (b, j>=b) and side "b" of
    # pairs (i<=b, b) — one row-local explode of a computed membership
    # array. (The pre-r4 form built the same rows from a block_pairs
    # dim table via two broadcast joins + union — three codegen subtrees
    # and a broadcast build that dominated FIRST-run latency; the explode
    # is a single subtree with identical output.)
    b = F.col("block")
    memberships = F.concat(
        F.transform(
            F.sequence(b, F.lit(n_blocks - 1)),
            lambda j: F.struct(
                b.alias("block_a"), j.alias("block_b"), F.lit("a").alias("side")
            ),
        ),
        F.transform(
            F.sequence(F.lit(0), b),
            lambda i: F.struct(
                i.alias("block_a"), b.alias("block_b"), F.lit("b").alias("side")
            ),
        ),
    )
    tagged = data.select(
        "id", "vec", F.explode(memberships).alias("m")
    ).select("m.block_a", "m.block_b", "id", "vec", "m.side")

    out_schema = f"id_a {id_ddl}, id_b {id_ddl}, cos_sim double"

    def block_cosine(pdf: pd.DataFrame) -> pd.DataFrame:
        same_block = pdf["block_a"].iloc[0] == pdf["block_b"].iloc[0]
        a = pdf[pdf["side"] == "a"].drop_duplicates("id")
        b = pdf[pdf["side"] == "b"].drop_duplicates("id")
        if a.empty or b.empty:
            return pd.DataFrame(columns=["id_a", "id_b", "cos_sim"])
        ids_a = a["id"].to_numpy()
        ids_b = b["id"].to_numpy()
        mat_a = np.array(a["vec"].tolist(), dtype=np.float64)
        mat_b = np.array(b["vec"].tolist(), dtype=np.float64)
        mat_a /= np.linalg.norm(mat_a, axis=1, keepdims=True)
        mat_b /= np.linalg.norm(mat_b, axis=1, keepdims=True)
        sims = mat_a @ mat_b.T
        ia, ib = np.nonzero(np.round(sims, 6) >= threshold)
        id_a, id_b = ids_a[ia], ids_b[ib]
        keep = id_a < id_b if same_block else id_a != id_b
        lo = np.minimum(id_a, id_b)[keep]
        hi = np.maximum(id_a, id_b)[keep]
        return pd.DataFrame(
            {"id_a": lo, "id_b": hi, "cos_sim": np.round(sims[ia, ib], 6)[keep]}
        )

    # Explicit-count repartition: the matmul stage is Python-CPU-heavy while
    # its shuffle BYTES are modest, so a count-less exchange is eligible for
    # AQE byte-based coalescing — which can collapse the 36 block-pair
    # groups onto one core and serialize the BLAS work. Explicit-count
    # repartitions are never AQE-coalesced, and the hash-clustering on the
    # group keys lets Catalyst elide the groupBy's own exchange.
    n_parts = spark.sparkContext.defaultParallelism
    return (
        tagged.repartition(n_parts, "block_a", "block_b")
        .groupBy("block_a", "block_b")
        .applyInPandas(block_cosine, out_schema)
    )


def minhash_index(
    df: SparkDF,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    seed: int = 42,
) -> SparkDF:
    """The persistable MinHash index of a corpus: ``(id, sig, hset)``.

    ``sig`` is the :func:`minhash_signatures` array and ``hset`` the
    distinct shingle-hash set used for exact-Jaccard verification. Compute
    this ONCE per corpus version, write it out (ideally bucketed —
    ``sources/write.py``), and feed it to :func:`minhash_lsh_join` via
    ``right_index=`` on every ingest — the corpus is then never
    re-shingled. The index must be rebuilt with the same
    ``n``/``num_hashes``/``seed`` the join will use.
    """
    # Same r13 shape as minhash_lsh_pairs' carry mode: the aggregate is
    # a plain collect_set (hset must ship regardless) and the lanes
    # derive from it in one Arrow pass — bit-identical signatures
    # (pinned vs minhash_signatures), ~3 s less Janino per fresh plan.
    return (
        shingle_hashes(df, id_col, text_col, n=n)
        .groupBy("id")
        .agg(F.collect_set("h").alias("hset"))
        .withColumn(
            "sig", _sig_from_hset_udf(num_hashes, seed)(F.col("hset"))
        )
        .select("id", "sig", "hset")
    )


def minhash_lsh_join(
    left: Optional[SparkDF] = None,
    right: Optional[SparkDF] = None,
    id_col: str = "id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    seed: int = 42,
    right_index: Optional[SparkDF] = None,
    left_index: Optional[SparkDF] = None,
    verify: str = "carry",
) -> SparkDF:
    """Near-duplicate pairs BETWEEN two corpora (incremental dedup).

    The bipartite twin of :func:`minhash_lsh_pairs`: candidates are pairs
    (one doc from ``left``, one from ``right``) sharing any LSH band
    bucket; each candidate is verified with exact Jaccard over the
    shingle-hash sets. Returns ``(id_left, id_right, jaccard)`` with
    ``jaccard >= threshold``.

    This is the operator an INCREMENTAL pipeline runs every ingest: dedup
    the new batch (``left``) against the already-cleaned corpus — passed
    either as raw documents (``right``) or, the scale path, as a
    PRECOMPUTED :func:`minhash_index` (``right_index=``): then the
    per-batch cost is O(batch) + one bucket join against the stored
    index, and the 100 TB corpus is never re-shingled or self-paired.
    ``left_index=`` does the same for the batch side, letting an ingest
    pipeline compute the batch's signatures once and reuse them here.
    Both sides must use the same ``n``/``num_hashes``/``bands``/``seed``
    — Broder MinHash only estimates Jaccard between signatures drawn with
    the SAME permutations.

    ``verify="carry"`` (default) joins the candidate pairs straight
    against both sides' full ``(id, hset)`` tables — every indexed doc's
    shingle set rides the verify shuffle. ``verify="restrict"``
    materializes the candidate id pairs (tiny) and semi-join-filters
    BOTH sides down to candidate ids before the set join: per-ingest
    shuffle drops from O(corpus × doc length) to O(candidates × doc
    length) — the right economics once the stored index dwarfs the
    per-batch candidate set. Identical output (pinned in tests).
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    if (right is None) == (right_index is None):
        raise ValueError("pass exactly one of `right` or `right_index`")
    if (left is None) == (left_index is None):
        raise ValueError("pass exactly one of `left` or `left_index`")
    if verify not in ("carry", "restrict"):
        raise ValueError(f"verify must be 'carry' or 'restrict', got {verify!r}")
    rows = num_hashes // bands

    def side(df: SparkDF) -> SparkDF:
        # Cached once (lazily): banding and the verify join both consume
        # this, and Catalyst would otherwise column-prune each consumer
        # into its own corpus re-scan (see minhash_lsh_pairs).
        return minhash_index(
            df, id_col, text_col, n=n, num_hashes=num_hashes, seed=seed
        ).persist()

    def banded(base: SparkDF) -> SparkDF:
        # Flat per-band xxhash64 chains over the stored signature lanes —
        # same values as the old slice+fold form, a fraction of the
        # generated code (see _band_hash_exprs).
        return base.select(
            "id",
            *_band_hash_exprs(
                bands, rows, lambda i: f"element_at(sig, {i + 1})"
            ),
        ).select(
            "id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("band_idx"),
                            F.col(f"_bh{j}").alias("band_hash"),
                        )
                        for j in range(bands)
                    ]
                )
            ).alias("band"),
        ).select("id", "band.band_idx", "band.band_hash")

    lbase = left_index if left_index is not None else side(left)
    rbase = right_index if right_index is not None else side(right)
    cand = (
        banded(lbase).alias("l")
        .join(
            banded(rbase).alias("r"),
            ["band_idx", "band_hash"],
        )
        .select(F.col("l.id").alias("id_left"), F.col("r.id").alias("id_right"))
        .distinct()
    )
    lsets = lbase.select(F.col("id").alias("id_left"), F.col("hset").alias("set_l"))
    rsets = rbase.select(F.col("id").alias("id_right"), F.col("hset").alias("set_r"))
    if verify == "restrict":
        # Materialize the (tiny) candidate pairs so the band-join subtree
        # runs once, then cut both set tables down to candidate ids
        # before their hsets ever shuffle.
        cand = cand.localCheckpoint()
        lsets = lsets.join(
            cand.select("id_left").distinct(), "id_left", "left_semi"
        )
        rsets = rsets.join(
            cand.select("id_right").distinct(), "id_right", "left_semi"
        )
    return (
        cand.join(lsets, "id_left")
        .join(rsets, "id_right")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("set_l", "set_r")).cast("double")
                / F.size(F.array_union("set_l", "set_r")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_left", "id_right", "jaccard")
    )


def near_dup_representatives(
    ids: SparkDF,
    pairs: SparkDF,
    id_col: str = "id",
    max_iterations: int = 20,
    driver_threshold: int = 1_000_000,
) -> SparkDF:
    """Resolve near-duplicate PAIRS into kept representatives per cluster.

    ``pairs`` is any near-dup pair table (``id_a``, ``id_b`` — e.g. from
    :func:`minhash_lsh_pairs`); connected components are computed by
    iterative min-label propagation and each document maps to its cluster's
    minimum id. Returns ``(id, rep_id)`` for every id in ``ids`` — rows
    with ``id == rep_id`` are the keepers.

    The edge list is materialized once (eager checkpoint — also pins the
    upstream pair pipeline) and then resolved by whichever strategy fits
    its measured size — the corpus itself never feeds the loop, only the
    pairs do, and near-dup pair counts are orders of magnitude below
    corpus row counts:

    - ``<= driver_threshold`` edges (default 1M ≈ 16 MB of id pairs;
      pass ``driver_threshold=0`` to force the distributed path):
      union-find ON THE DRIVER — one collect of the checkpointed edge
      list, O(E α(E)) pointer chasing, one ``createDataFrame`` back.
      The same small-side-materialization economics as a broadcast join;
      a distributed fixpoint loop on an edge list this size is pure
      scheduling overhead (measured ~1.6 s PER probe iteration of tiny
      shuffle stages vs ~0.3 s total driver-side at sf0.1).
    - larger: distributed large-star/small-star contraction. Each
      iteration runs TWO alternations as one job (alternations needed =
      O(log diameter); LSH near-cliques finish in 2-3); the convergence
      signature is computed by the SAME job that materializes each
      iteration's lazy checkpoint, so the driver never touches row data
      and pays one round-trip per two alternations.

    If a pathological component survives ``max_iterations`` distributed
    iterations unconverged, a ``RuntimeWarning`` is emitted — the
    returned labels are then a valid REFINEMENT (every labelled subset is
    within one true cluster, so no false merges) but some clusters keep
    more than one representative.
    """
    import warnings

    # Everything below runs over PAIRED nodes only. Docs in no pair (the
    # overwhelming majority of a real corpus — near-dup rates are a few
    # percent) can never change label, so they stay out of the loop
    # entirely and get ``rep_id = id`` from ONE final left join. The first
    # eager checkpoint (on E) materializes the upstream pair pipeline
    # (scan → shingle → sketch → band → verify) exactly once — without it
    # every round re-executes the whole pipeline from source (measured
    # 4.4× end-to-end at sf0.1; at 100 TB it is `rounds` extra corpus
    # scans).
    # Connected components by LARGE-STAR / SMALL-STAR alternation (Kiveris
    # et al., "Connected Components in MapReduce and Beyond" — the design
    # behind GraphX/GraphFrames connectedComponents), not plain label
    # propagation. Propagation moves the min label ONE graph hop per round
    # (O(diameter) rounds — measured 11 rounds on a sf0.1
    # semantic-similarity graph whose components are chains); the star
    # operations REWIRE edges toward each neighborhood's minimum, which
    # provably converges in O(log²) rounds (O(log) in practice) and
    # SHRINKS the edge set as components collapse into stars. At
    # convergence every component is a star centered on its minimum id —
    # the edge list IS the label table.
    def _large_star(e: SparkDF) -> SparkDF:
        # For each node u: every LARGER neighbor attaches to
        # m(u) = min(neighborhood(u) ∪ {u}).
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        return (
            sym.where(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )

    def _small_star(e: SparkDF) -> SparkDF:
        # Orient each edge large→small; every SMALLER neighbor (and u
        # itself) attaches to the minimum of u's smaller neighborhood.
        dn = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).where(F.col("u") != F.col("v"))
        mins = dn.groupBy("u").agg(F.min("v").alias("m"))
        return (
            dn.join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(mins.select(F.col("u"), F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    E = (
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    # Small-edge-list fast path: resolve on the driver. The count is a
    # cheap aggregate over the already-checkpointed edges; the collect is
    # bounded by driver_threshold rows of two ids.
    if driver_threshold and E.count() <= driver_threshold:
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = root, parent[x]
            return root

        for u, v in E.collect():
            ru, rv = find(u), find(v)
            if ru != rv:
                # Union by MIN id — the representative contract.
                lo, hi = (ru, rv) if ru < rv else (rv, ru)
                parent[hi] = lo
        spark = ids.sparkSession
        label_rows = [(x, find(x)) for x in list(parent)]
        labels = local_rows_df(
            spark, label_rows,
            E.select(F.col("u").alias("id"), F.col("v").alias("rep_id")).schema,
        )
        out = ids.select(F.col(id_col).alias("id")).join(
            F.broadcast(labels.select("id", F.col("rep_id").alias("__rep"))),
            "id",
            "left",
        )
        return out.select(
            "id", F.coalesce(F.col("__rep"), F.col("id")).alias("rep_id")
        )

    converged = False
    prev_sig = None
    for _ in range(max_iterations):
        # TWO large/small alternations per probe: LSH near-cliques
        # converge in 2-3 alternations, so probing after every single one
        # paid a synchronous driver round-trip per alternation (r3 verdict).
        # The extra alternation on an already-collapsed edge list is
        # nearly free; halving the probe count halves the driver barriers.
        E = _small_star(_large_star(_small_star(_large_star(E)))).localCheckpoint(
            eager=False
        )
        # Fixpoint test: the edge multiset is stable. The signature rides
        # the SAME job that materializes the lazy checkpoint — one tiny
        # aggregate (count plus an order-insensitive xxhash64 fold), zero
        # extra jobs per iteration.
        sig = tuple(
            E.agg(
                F.count(F.lit(1)), F.bit_xor(F.xxhash64("u", "v"))
            ).collect()[0]
        )
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        warnings.warn(
            f"near_dup_representatives did not converge within "
            f"{max_iterations} iterations — labels are a refinement "
            f"(no false merges) but some clusters retain multiple "
            f"representatives. Raise max_iterations.",
            RuntimeWarning,
            stacklevel=2,
        )
    # At the fixpoint E holds (child, root) star edges; roots map to
    # themselves.
    labels = (
        E.select(F.col("u").alias("id"), F.col("v").alias("rep_id"))
        .union(
            E.select(F.col("v").alias("id"), F.col("v").alias("rep_id"))
        )
        .distinct()
    )
    # Re-attach isolated docs: anything not in a pair is its own
    # representative. The converged paired-label table is small, so this
    # is a broadcast-eligible join against the full id set.
    out = ids.select(F.col(id_col).alias("id")).join(
        labels.select(F.col("id"), F.col("rep_id").alias("__rep")), "id", "left"
    )
    return out.select(
        "id", F.coalesce(F.col("__rep"), F.col("id")).alias("rep_id")
    )
