"""Corpus-preparation operators for training-data pipelines: benchmark
decontamination, sequence packing, and PII/pattern redaction.

These are the post-dedup steps of a large-scale LLM data pipeline
(LLM-data-pipeline extension; no reference twin — the reference stops at
generic table utilities, see SURVEY.md §2.10):

- **decontaminate**: drop (or flag) corpus documents sharing any n-gram
  with an evaluation benchmark — the standard "n-gram collision" test-set
  decontamination used for LLM training corpora (n of 8-13 words in
  practice). 100 TB story: benchmarks are tiny (MBs), so their distinct
  n-gram set broadcast-joins against the exploded corpus grams — the
  corpus is scanned once, never shuffled, and the semi-join reduces
  map-side to a Bloom-like membership probe.
- **pack_sequences**: concatenate documents (deterministic order) and cut
  the stream into fixed token-budget training sequences, assigning each
  document the sequence its first token lands in. 100 TB story: packing is
  windowed WITHIN partition groups (e.g. source shard) — one shuffle on
  the group key, no global order, sequences named (group, seq_no) so
  groups pack independently and in parallel.
- **redact_patterns**: regexp-based redaction (emails, phones, IPs, SSNs
  by default) with per-pattern match counts. Pure row-local Catalyst
  projections — zero shuffle, scales linearly.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence, Union

from pyspark.sql import DataFrame as SparkDF, Window, functions as F

from ons_utils_spark.generic import list_convert
from ons_utils_spark.functions.localrel import local_rows_df
from ons_utils_spark.operators.text import shingle_hash64, tokenize

#: Default redaction patterns. Deliberately lookahead-free so the same
#: pattern runs identically under Java regex (Spark) and RE2 (DuckDB,
#: many log pipelines) — portability matters more than cleverness here.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+\d[\d. -]{7,}\d",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
}


def decontaminate(
    corpus: SparkDF,
    benchmark: SparkDF,
    id_col: str,
    text_col: str,
    bench_text_col: Optional[str] = None,
    n: int = 8,
    mode: str = "drop",
    broadcast: bool = True,
) -> SparkDF:
    """Remove/flag corpus docs sharing any ``n``-gram with ``benchmark``.

    ``mode='drop'`` returns the clean corpus; ``mode='flag'`` returns the
    full corpus plus a boolean ``contaminated`` column. N-grams travel as
    64-bit hashes (:func:`shingle_hash64`) on both sides, so membership is
    an 8-byte equi-join key.

    ``broadcast=True`` (default) broadcasts the benchmark's distinct gram
    set — right for real benchmarks (≤ millions of grams): the corpus-side
    semi join then runs map-side with zero corpus shuffle. Set False for a
    giant right side and let AQE pick the strategy.
    """
    if mode not in ("drop", "flag"):
        raise ValueError(f"mode must be 'drop' or 'flag', got {mode!r}")
    bench_text = bench_text_col or text_col
    bench_grams = (
        benchmark.select(F.explode(shingle_hash64(bench_text, n=n)).alias("g"))
        .distinct()
    )
    if broadcast:
        bench_grams = F.broadcast(bench_grams)

    doc_grams = corpus.select(
        F.col(id_col).alias("__cid"),
        F.explode(shingle_hash64(text_col, n=n)).alias("g"),
    )
    contaminated = (
        doc_grams.join(bench_grams, "g", "left_semi").select("__cid").distinct()
    )
    if mode == "drop":
        return corpus.join(
            contaminated, corpus[id_col] == contaminated["__cid"], "left_anti"
        )
    return corpus.join(
        contaminated.withColumn("contaminated", F.lit(True)),
        corpus[id_col] == contaminated["__cid"],
        "left",
    ).drop("__cid").fillna({"contaminated": False})


def _validate_bloom_params(m_bits: int, k: int) -> None:
    if m_bits < 64 or m_bits & (m_bits - 1):
        raise ValueError(f"m_bits must be a power of two >= 64, got {m_bits}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")


#: Filters at or below this many bits probe through the VECTORIZED Arrow
#: path: the dense word array (m_bits/8 bytes — 8 MiB at this cap)
#: collects to the driver and ships in the UDF closure, once per task.
#: Larger filters keep the broadcast-join + row-local ``exists`` form,
#: whose memory story (one JVM broadcast row, no Python copy per worker)
#: is the right one for the ~GB filters the docstring advertises.
_BLOOM_VECTOR_MAX_BITS = 1 << 26

# XXH64 prime constants (public xxHash spec) — the same values
# plans/oracle_xxh64.py replays in SQL.
_XXP1 = 11400714785074694791
_XXP2 = 14029467366897019727
_XXP3 = 1609587929392839161
_XXP4 = 9650029242287828579
_XXP5 = 2870177450012600261
_M64 = 1 << 64


def _xxh64_long_py(value: int, seed: int) -> int:
    """Spark's ``xxhash64`` of ONE bigint under ``seed`` — XXH64's
    length-8 path (hashLong), plain-Python ints. Bit-identical to the
    JVM (pinned against ``F.xxhash64`` in tests); multi-arg calls chain
    by feeding the running hash back as the next argument's seed."""
    mask = _M64 - 1

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (64 - r))) & mask

    k1 = rotl((value & mask) * _XXP2 & mask, 31) * _XXP1 & mask
    h = ((seed & mask) + _XXP5 + 8) & mask
    h ^= k1
    h = (rotl(h, 27) * _XXP1 + _XXP4) & mask
    h ^= h >> 33
    h = h * _XXP2 & mask
    h ^= h >> 29
    h = h * _XXP3 & mask
    h ^= h >> 32
    return h


def _bloom_probe_udf(words, m_bits: int, k: int):
    """Arrow-vectorized Bloom membership over per-doc gram-hash arrays —
    bit-identical to the row-local ``exists(__grams, g -> …)`` JVM
    expression it replaces on the small-filter path (r13, guide §4.2:
    the higher-order ``exists`` is CodegenFallback, so the probe ran as
    interpreted per-gram lambda evaluation — the dominant steady cost of
    q_decontaminate_bloom).

    ``words`` is the dense uint64 word array (length ``m_bits/64``).
    Per gram ``g`` the k probe positions are
    ``pmod(xxhash64(cast(j as bigint), g), m_bits)`` — Spark's chained
    xxhash64 is ``hashLong(g, hashLong(j, 42))``, reproduced here as
    ~k vectorized uint64 ufunc passes (wraparound multiply = the JVM's
    overflow semantics; numpy's ``%`` on int64 with a positive divisor
    is exactly ``pmod``). NULL gram arrays yield NULL (``exists`` on a
    NULL array is NULL); empty ones yield false. Marked
    nondeterministic so drop-mode's pushed-down ``NOT contaminated``
    filter cannot duplicate the stage (guide §4.4).
    """
    import numpy as np
    import pandas as pd

    seeds = [_xxh64_long_py(j, 42) for j in range(k)]
    n_words_local = int(m_bits // 64)
    if len(words) != n_words_local:
        raise ValueError(
            f"dense bloom array has {len(words)} words, expected "
            f"{n_words_local} for m_bits={m_bits}"
        )

    def fn(grams):
        n = len(grams)
        vals = grams.to_numpy(dtype=object, copy=False)
        null = np.fromiter((g is None for g in vals), dtype=bool, count=n)
        sizes = np.fromiter(
            (0 if g is None else len(g) for g in vals),
            dtype=np.int64, count=n,
        )
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(sizes, out=offsets[1:])
        total = int(offsets[-1])
        if total == 0:
            return pd.Series(
                [None if nu else False for nu in null], dtype=object
            )
        flat = np.concatenate(
            [np.asarray(g, dtype=np.int64) for g in vals if g is not None
             and len(g)]
        ).view(np.uint64)
        hit = np.ones(total, dtype=bool)
        with np.errstate(over="ignore"):
            for s in seeds:
                # hashLong(g, seed_j): one rotl-multiply chain + fmix.
                h = flat * np.uint64(_XXP2)
                h = (h << np.uint64(31)) | (h >> np.uint64(33))
                h = h * np.uint64(_XXP1)
                h = np.uint64((s + _XXP5 + 8) & (_M64 - 1)) ^ h
                h = (h << np.uint64(27)) | (h >> np.uint64(37))
                h = h * np.uint64(_XXP1) + np.uint64(_XXP4)
                h ^= h >> np.uint64(33)
                h = h * np.uint64(_XXP2)
                h ^= h >> np.uint64(29)
                h = h * np.uint64(_XXP3)
                h ^= h >> np.uint64(32)
                pos = h.view(np.int64) % np.int64(m_bits)
                bit = (
                    words[pos >> np.int64(6)]
                    >> (pos & np.int64(63)).astype(np.uint64)
                ) & np.uint64(1)
                hit &= bit != 0
        csum = np.zeros(total + 1, dtype=np.int64)
        np.cumsum(hit, out=csum[1:])
        any_hit = csum[offsets[1:]] > csum[offsets[:-1]]
        return pd.Series(
            [None if null[i] else bool(any_hit[i]) for i in range(n)],
            dtype=object,
        )

    return F.pandas_udf(fn, "boolean").asNondeterministic()


def bloom_build(
    df: SparkDF,
    text_col: str,
    n: int = 2,
    m_bits: int = 1 << 20,
    k: int = 4,
) -> SparkDF:
    """Sparse Bloom filter of ``df``'s n-gram hashes → ``(word, bits)``.

    Sizing: the standard bound ``fpr = (1 - e^(-k*n/m))^k`` holds for
    the seed-chained probe scheme — measured 0.019 vs theoretical 0.022
    at n=1000 grams, m=8192, k=4 (pinned within 3x by
    ``tests/operators/test_corpus.py::TestBloomFprCalibration``). Pick
    ``m_bits ≈ 10 * expected distinct grams`` for ~1% FPR at ``k=4``.

    The build side of :func:`decontaminate_bloom`, exposed so a pipeline
    can compute the filter ONCE per reference-set version (or maintain
    it incrementally — :func:`bloom_append_batch`) and reuse it across
    ingests via ``filter_words=``. Each distinct gram hash sets ``k``
    bit positions (``pmod(xxhash64(j, g), m_bits)``, the Count-Min
    seed-chain scheme); positions fold into 64-bit words with a
    ``bit_or`` aggregate, so the output is ≤ ``m_bits/64`` rows however
    large ``df`` is. Bit OR is associative, commutative, and IDEMPOTENT
    — filters of overlapping batches merge losslessly and replays
    cannot corrupt the store.
    """
    _validate_bloom_params(m_bits, k)
    probes = (
        df.select(F.explode(shingle_hash64(text_col, n=n)).alias("g"))
        .distinct()
        .select(
            F.explode(
                F.array(
                    *[
                        F.pmod(
                            F.xxhash64(F.lit(j).cast("bigint"), F.col("g")),
                            F.lit(m_bits),
                        )
                        for j in range(k)
                    ]
                )
            ).alias("pos")
        )
    )
    return (
        probes.select(
            F.expr("pos DIV 64").alias("word"),
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("bits"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(bits)").alias("bits"))
    )


def bloom_append_batch(
    batch: SparkDF,
    text_col: str,
    bloom_path: str,
    n: int = 2,
    m_bits: int = 1 << 20,
    k: int = 4,
    batch_id: "int | None" = None,
) -> None:
    """Write one batch's Bloom word deltas into an append-only store.

    Same durable layout as the Count-Min store
    (``operators/sketches.py::sketch_append_batch``) — both delegate to
    :func:`ons_utils_spark.sources.store.partitioned_delta_append`:
    every delta lands under a ``batch_id=<id>`` partition (sentinel
    ``-1`` for batch callers); a streaming replay overwrites exactly its
    own partition — though for a Bloom filter even a plain double-append
    is HARMLESS (bit OR is idempotent), the shared layout keeps the two
    stores operationally identical. :func:`load_bloom` merges on read.
    """
    from ons_utils_spark.sources.store import partitioned_delta_append

    _validate_bloom_params(m_bits, k)
    words = bloom_build(batch, text_col, n=n, m_bits=m_bits, k=k)
    partitioned_delta_append(words, bloom_path, batch_id=batch_id)


def load_bloom(spark, bloom_path: str) -> SparkDF:
    """Read a Bloom word-delta store back as ONE sparse filter
    (``(word, bits)``, bit-OR of every delta) — feed it to
    :func:`decontaminate_bloom` via ``filter_words=``."""
    raw = spark.read.parquet(bloom_path)
    return (
        raw.select("word", "bits")
        .groupBy("word")
        .agg(F.expr("bit_or(bits)").alias("bits"))
    )


def decontaminate_bloom(
    corpus: SparkDF,
    benchmark: Optional[SparkDF] = None,
    id_col: str = "id",
    text_col: str = "text",
    bench_text_col: Optional[str] = None,
    n: int = 2,
    m_bits: int = 1 << 20,
    k: int = 4,
    mode: str = "drop",
    filter_words: Optional[SparkDF] = None,
) -> SparkDF:
    """:func:`decontaminate` for benchmark/reference sets too big to
    broadcast as a gram list — membership goes through a Bloom filter of
    FIXED size ``m_bits``, built and probed entirely as DataFrame ops
    (the hand-built version of Spark's internal runtime-filter idiom;
    ``bloom_filter_agg`` is not exposed as a public function).

    Build: the benchmark's distinct n-gram hashes explode into ``k``
    probe positions each (``pmod(xxhash64(j, g), m_bits)`` — the same
    seed-chain scheme as the Count-Min sketch, so an external auditor
    reproduces every position), positions fold into 64-bit words with a
    ``bit_or`` aggregate (≤ ``m_bits/64`` rows however large the
    benchmark is), and the dense word array ships as ONE broadcast row.
    Probe: each corpus document tests its grams row-locally — ``k``
    bit-lookups per gram against the broadcast array, zero corpus
    shuffle, zero corpus-side join.

    Guarantees: NO false negatives (every truly contaminated doc is
    flagged — Bloom filters never miss an inserted element); false
    positives drop clean docs at rate ``≈ (1 - e^(-k·n_grams/m_bits))^k``
    — size ``m_bits ≈ 1.44 · k · n_grams`` for ~2^-k. The decision is
    DETERMINISTIC given the inputs (xxhash64 is seedless-stable and bit
    OR is order-independent), so results are reproducible across
    partitionings, engines, and an external SQL auditor — false
    positives included. ``m_bits`` must be a power of two (signed
    ``pmod`` equals the auditor's unsigned modulus only then).

    Trade vs :func:`decontaminate`: the exact operator broadcasts 8 B ×
    |distinct grams| (fine to ~10⁸ grams); this one broadcasts
    ``m_bits/8`` bytes regardless — decontaminating a corpus against a
    BILLION-gram reference (e.g. the training set itself) needs ~2³³
    bloom bits = 1 GB where the exact gram list would be 8+ GB and
    broadcast-infeasible.

    Pass ``filter_words=`` (a sparse ``(word, bits)`` table from
    :func:`bloom_build` or :func:`load_bloom`) instead of ``benchmark``
    to reuse a precomputed / incrementally-maintained filter — the
    reference set is then never re-shingled per ingest. It must have
    been built with the same ``n`` / ``m_bits`` / ``k``.
    """
    if mode not in ("drop", "flag"):
        raise ValueError(f"mode must be 'drop' or 'flag', got {mode!r}")
    _validate_bloom_params(m_bits, k)
    if (benchmark is None) == (filter_words is None):
        raise ValueError("pass exactly one of `benchmark` or `filter_words`")
    n_words = m_bits // 64

    if filter_words is not None:
        # Prebuilt/incrementally-maintained filter (bloom_build /
        # load_bloom). Must have been built with the same n/m_bits/k.
        word_bits = filter_words
    else:
        word_bits = bloom_build(
            benchmark.select(
                F.col(bench_text_col or text_col).alias("__btext")
            ),
            "__btext",
            n=n,
            m_bits=m_bits,
            k=k,
        )
    if m_bits <= _BLOOM_VECTOR_MAX_BITS:
        # Small-filter fast path (r13, guide §4.2): the sparse words
        # collect to the driver (≤ m_bits/64 rows — a config-bounded
        # collect, 128 KiB at the default m_bits=2^20) and the probe
        # runs as one vectorized Arrow pass per corpus partition —
        # ONLY the gram-hash column crosses the Python boundary. The
        # membership decision is bit-identical to the `exists` form
        # below (pinned in tests). OR-fold on fill: bloom_build/
        # load_bloom already emit one row per word, but a raw delta
        # store's duplicates merge losslessly here too (bit OR is the
        # filter's own idempotent merge rule).
        import numpy as np

        words = np.zeros(n_words, dtype=np.uint64)
        for r in word_bits.collect():
            words[int(r["word"])] |= np.uint64(int(r["bits"]) & (_M64 - 1))
        probe = _bloom_probe_udf(words, m_bits, k)
        flagged = corpus.withColumn(
            "contaminated", probe(shingle_hash64(text_col, n=n))
        )
        if mode == "drop":
            return flagged.where(~F.col("contaminated")).drop("contaminated")
        return flagged

    # Dense word array as ONE row: range ⟕ sparse words, then an ordered
    # fold (array_sort on (word, bits) structs — deterministic without a
    # single-partition sort). Bounded by m_bits/64 entries, same
    # economics as a broadcast join's build side.
    dense = (
        corpus.sparkSession.range(n_words)
        .withColumnRenamed("id", "word")
        .join(word_bits, "word", "left")
        .na.fill({"bits": 0})
    )
    bf = dense.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(word, bits))),"
            " x -> x.bits)"
        ).alias("__bf")
    )

    # Row-local membership: contaminated iff ANY gram has ALL k bloom
    # bits set. One expression, no corpus-side explode/join/shuffle.
    def bit_hit(j: int) -> str:
        pos = f"pmod(xxhash64(cast({j} as bigint), g), {m_bits}L)"
        return (
            f"(element_at(__bf, CAST(({pos}) DIV 64 AS INT) + 1)"
            f" & shiftleft(1L, CAST(({pos}) % 64 AS INT))) <> 0L"
        )

    hit_all = " AND ".join(bit_hit(j) for j in range(k))
    flagged = (
        corpus.join(F.broadcast(bf))
        .withColumn("__grams", shingle_hash64(text_col, n=n))
        .withColumn("contaminated", F.expr(f"exists(__grams, g -> {hit_all})"))
        .drop("__bf", "__grams")
    )
    if mode == "drop":
        return flagged.where(~F.col("contaminated")).drop("contaminated")
    return flagged


def contaminated_spans(
    corpus: SparkDF,
    benchmark: SparkDF,
    id_col: str,
    text_col: str,
    bench_text_col: Optional[str] = None,
    n: int = 4,
) -> SparkDF:
    """WHERE each corpus document overlaps the benchmark → merged token
    spans ``(id, span_start, span_end)`` (0-based, end-exclusive).

    :func:`decontaminate` answers "does this doc overlap at all" and
    drops whole documents; real pipelines usually want SURGICAL removal
    — redact just the overlapping passage and keep the rest (the
    span-level analogue, pairing with :func:`span_dedup`). Each corpus
    n-gram POSITION whose gram hash appears in the benchmark becomes a
    hit; overlapping/adjacent hit windows (each covering ``n`` tokens)
    merge into maximal islands, so a verbatim quoted paragraph comes
    back as ONE span however many grams it spans.

    Scale: the benchmark's distinct gram hashes broadcast (like
    :func:`decontaminate`); the corpus-side join is a map-side
    broadcast semi join on positional gram rows (no corpus shuffle);
    island-merging is one window per document over its HIT rows only —
    partitioned by doc id, bounded by hits per doc, never a global
    window. Docs with no overlap produce no row.
    """
    bench_text = bench_text_col or text_col
    bench_grams = (
        benchmark.select(F.explode(shingle_hash64(bench_text, n=n)).alias("g"))
        .distinct()
    )
    hits = (
        corpus.select(
            F.col(id_col).alias("id"),
            F.posexplode(
                shingle_hash64(text_col, n=n, distinct=False)
            ).alias("pos", "g"),
        )
        .join(F.broadcast(bench_grams), "g", "left_semi")
    )
    return _merge_hit_islands(hits, n)


def _merge_hit_islands(hits: SparkDF, n: int) -> SparkDF:
    """Merge per-document hit POSITIONS (each covering ``n`` tokens) into
    maximal ``(id, span_start, span_end)`` islands — the reduction shared
    by :func:`contaminated_spans` (hits vs a benchmark) and
    :func:`self_dedup_spans` (hits vs the rest of the corpus).

    Island detection over sorted hit positions: a hit starts a new span
    iff it begins after the previous hit's window [p, p+n) ends
    (positions ascend, so the latest previous hit has the furthest end —
    the lag test is transitive). One window per document over its HIT
    rows only — partitioned by doc id, bounded by hits per doc, never a
    global window.
    """
    w = Window.partitionBy("id").orderBy("pos")
    new_span = (
        F.lag("pos").over(w).isNull()
        | (F.col("pos") > F.lag("pos").over(w) + F.lit(n))
    ).cast("int")
    grp = F.sum(new_span).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        hits.withColumn("__grp", grp)
        .groupBy("id", "__grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(n)).alias("span_end"),
        )
        .select("id", "span_start", "span_end")
    )


# Max candidate-gram rows the hot-gram guard will broadcast (8-byte
# hashes; ~50 MB collected at this cap, well under executor/driver
# headroom). Above it the verdict joins run as shuffle joins — exact
# either way, the cap only picks the physical strategy.
_HOT_BROADCAST_CAP = 2_000_000


def _split_hot_verdict(
    grams: SparkDF,
    min_docs: int,
    max_df: int,
) -> "tuple[SparkDF | None, SparkDF]":
    """The hot-gram skew guard shared by :func:`self_dedup_spans` and
    :func:`self_dedup_spans_incremental`.

    A boilerplate gram (license header, nav stub) carried by millions of
    documents would make the per-gram verdict window ONE partition — a
    single task buffering every occurrence. But any gram that hot needs
    no window at all: its verdict is a bounded AGGREGATE (``min(id)``
    keeper + a ≥ ``min_docs`` carrier test), and groupBy aggregates are
    skew-safe by construction — map-side partial combine means no
    reducer ever materializes a hot gram's rows, only its partials.

    Hot grams are DETECTED from a deterministic row sample, not a full
    per-gram count — an exact detection aggregate over every gram was
    measured ~5× the whole operator's cost at the 100× probe scale
    (disjoint-token corpora are all-distinct grams, so the "partial"
    combine degenerates to a full second shuffle). The sample keeps
    detection ~free: rate ``1/S`` with ``S = clamp(max_df/64, 1, 128)``
    (``xxhash64(g, id, pos)`` — row-level, partitioning-invariant,
    replayable), candidate threshold ``max_df/(4S)`` sampled hits. A
    gram at the ``max_df`` boundary expects ``≥ 64`` sampled hits, 4×
    the threshold, so it escapes detection with probability
    ``≤ e^−18`` (Chernoff) — and for ``max_df < 128`` the rate is 1/1,
    i.e. detection is exact. Candidates get their verdict from an exact
    aggregate over ALL their rows, so routing never changes results —
    only which path computes them.

    Returns ``(hot_flags, cold)``:

    - ``(None, grams)`` when NO candidate exists — the caller should
      run its plain window over the full (checkpointed) gram table;
      the clean-corpus fast path, one driver-side emptiness probe.
    - ``hot_flags``: every gram row of a candidate gram, with
      ``__keeper`` (min id over ALL carriers) and ``__hotdup`` (exact
      cross-doc duplicate verdict) attached — rows of non-duplicate
      candidates (e.g. one document repeating itself ≥ ``max_df``
      times) carry ``__hotdup = false``.
    - ``cold``: the remaining ``(id, pos, g)`` rows; every gram here
      has < ``max_df`` occurrences w.h.p. (exactly, when ``S == 1``),
      so a per-gram window over ``cold`` buffers ~``max_df`` rows per
      partition key at worst.

    ``grams`` is localCheckpoint-ed (eager) because it feeds detection
    and both output branches — without it each consumer would re-scan
    the corpus and re-hash every shingle. The candidate broadcast is
    bounded by construction (≤ ``4·|grams| / max_df`` grams can clear
    the sampled threshold) but that bound is CORPUS-relative: a
    quadrillion-gram corpus at the default ``max_df`` clears it with
    hundreds of millions of candidates. The candidate COUNT is
    therefore measured (the detection aggregate already ran — counting
    its output is ~free), and past ``_HOT_BROADCAST_CAP`` rows the
    verdict joins fall back to plain shuffle joins instead of failing
    with an opaque broadcast/driver OOM — same exact results, one paid
    shuffle. Raising ``max_df`` with corpus size keeps the fast
    broadcast path.
    """
    grams = grams.localCheckpoint(eager=True)
    S = max(1, min(128, max_df // 64))
    thresh = max_df if S == 1 else max(1, max_df // (S * 4))
    sample = (
        grams
        if S == 1
        else grams.where(
            F.pmod(F.xxhash64("g", "id", "pos"), F.lit(S)) < F.lit(1)
        )
    )
    # Checkpoint BEFORE counting: cand feeds the count, the verdict
    # join, and (via hot) the tag join — uncheckpointed, each consumer
    # would re-run the detection aggregate (the count alone would pay
    # it once and the join again). One shuffle over the (already
    # checkpointed) gram table, materialized once — and the candidate
    # COUNT is observed on that same materialization (r13), not paid as
    # a separate driver-blocking job over the checkpointed rows.
    from pyspark.sql import Observation

    obs = Observation()
    cand = (
        sample.groupBy("g")
        .agg(F.count(F.lit(1)).alias("__sc"))
        .where(F.col("__sc") >= thresh)
        .select("g")
        .observe(obs, F.count(F.lit(1)).alias("__n"))
        .localCheckpoint(eager=True)
    )
    from ons_utils_spark.functions.observed import get_observed

    n_cand = get_observed(
        obs, fallback_df=cand,
        fallback_aggs=[F.count(F.lit(1)).alias("__n")],
    )["__n"]
    if n_cand == 0:
        return None, grams
    if n_cand <= _HOT_BROADCAST_CAP:
        hint = F.broadcast
    else:
        def hint(d):
            return d
    aggs = [F.min("id").alias("__keeper"), F.max("id").alias("__maxid")]
    if min_docs > 2:
        aggs.append(F.countDistinct("id").alias("__ndocs"))
    per_gram = grams.join(hint(cand), "g").groupBy("g").agg(*aggs)
    hot_dup = (
        (F.col("__ndocs") >= min_docs)
        if min_docs > 2
        else (F.col("__keeper") != F.col("__maxid"))
    )
    hot = per_gram.select("g", "__keeper", hot_dup.alias("__hotdup"))
    tagged = grams.join(hint(hot), "g", "left")
    hot_flags = tagged.where(F.col("__hotdup").isNotNull())
    cold = tagged.where(F.col("__hotdup").isNull()).select("id", "pos", "g")
    return hot_flags, cold


def self_dedup_spans(
    df: SparkDF,
    id_col: str,
    text_col: str,
    n: int = 8,
    min_docs: int = 2,
    max_df: "int | None" = 10_000,
) -> SparkDF:
    """Passages duplicated ACROSS documents at ANY token alignment →
    merged spans ``(id, span_start, span_end)`` covering every
    occurrence OUTSIDE the keeper document.

    :func:`span_dedup` cuts documents into FIXED non-overlapping
    windows, so a duplicated passage straddling a window boundary slips
    through. This is the arbitrary-alignment version (the practical
    Spark form of suffix-array exact-substring dedup, Lee et al. 2022):
    every positional ``n``-gram whose hash occurs in ≥ ``min_docs``
    distinct documents is a hit in every NON-keeper document carrying
    it (keeper = smallest ``id`` among carriers, so one copy of the
    content deterministically survives), and hit windows merge into
    maximal islands. Any duplicated run of ``m ≥ n`` tokens is a union
    of duplicated n-grams, so islands cover exactly the tokens that
    appear verbatim elsewhere, at full length, whatever the alignment.
    Feed the spans to :func:`apply_span_redaction` (``replacement=None``
    drops the tokens) to materialize the deduplicated corpus.

    Scale: positional grams shuffle ONCE by gram hash (bounded 8-byte
    keys, never raw passages) and the per-gram verdict is a WINDOW over
    that same shuffle — no groupBy + join-back, no second corpus scan
    (the join-back form the r8 plan audit flagged as a redundant scan).
    Island-merging is a per-document window over hit rows only. At the
    default ``min_docs=2`` the duplicate test is ``min(id) != max(id)``
    — no distinct-count pass; ``min_docs > 2`` pays a per-gram
    ``collect_set`` (document that threshold's cost before raising it
    on a hot-gram corpus).

    ``max_df`` (default 10 000) is the hot-gram skew guard — the same
    hazard class bounded everywhere else in this package (``max_df`` in
    the postings ops, ``max_bucket`` in fuzzy/SRP, ``max_cluster`` in
    semantic dedup): a boilerplate gram in millions of documents would
    otherwise become ONE window partition sorted and buffered by a
    single task. Grams with ≥ ``max_df`` occurrences take a bounded
    aggregate verdict instead (:func:`_split_hot_verdict`); only cold
    grams — per-partition row count < ``max_df`` by construction — take
    the row-wise window. The split is exact, not approximate: both
    paths compute the same keeper/duplicate verdict, pinned in tests.
    ``max_df=None`` disables the guard (single-window path, no
    checkpoint — marginally cheaper on corpora known to be free of
    boilerplate grams).
    """
    if min_docs < 2:
        raise ValueError(
            f"min_docs must be >= 2 (got {min_docs}) — a passage needs "
            "at least two distinct carrier documents to be a cross-doc "
            "duplicate"
        )
    grams = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            shingle_hash64(text_col, n=n, distinct=False)
        ).alias("pos", "g"),
    )
    if max_df is None:
        hits = _window_verdict_hits(grams, min_docs)
    else:
        hot_flags, cold = _split_hot_verdict(grams, min_docs, max_df)
        if hot_flags is None:
            hits = _window_verdict_hits(cold, min_docs)
        else:
            hot_hits = hot_flags.where(
                F.col("__hotdup") & (F.col("id") != F.col("__keeper"))
            ).select("id", "pos")
            hits = hot_hits.unionByName(_window_verdict_hits(cold, min_docs))
    return _merge_hit_islands(hits, n)


def _window_verdict_hits(grams: SparkDF, min_docs: int) -> SparkDF:
    """Row-wise per-gram duplicate verdict over ``(id, pos, g)`` rows —
    the cold path: one window over the gram shuffle, ``min(id)`` keeper,
    non-keeper carriers of a ≥ ``min_docs``-document gram are hits."""
    wg = Window.partitionBy("g")
    keeper = F.min("id").over(wg)
    duplicated = (
        (F.size(F.collect_set("id").over(wg)) >= min_docs)
        if min_docs > 2
        else (keeper != F.max("id").over(wg))
    )
    return (
        grams.withColumn("__dup", duplicated & (F.col("id") != keeper))
        .where("__dup")
        .select("id", "pos")
    )


def gram_index(
    df: SparkDF, id_col: str, text_col: str, n: int = 8
) -> SparkDF:
    """The persistable gram index behind incremental exact-substring
    dedup: ``(g, keeper, n)`` — every distinct positional n-gram hash
    with the smallest carrier id, stamped with the shingle size it was
    built at (constant column, RLE-compresses to nothing in parquet;
    :func:`self_dedup_spans_incremental` validates it, because an index
    built at one ``n`` probed at another silently matches NOTHING).
    Build once per corpus version; at scale, write it BUCKETED by ``g``
    (``sources/write.py``) so every ingest's membership join is
    co-located, no index shuffle per batch."""
    out = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(shingle_hash64(text_col, n=n)).alias("g"),
        )
        .groupBy("g")
        .agg(F.min("id").alias("keeper"))
        .withColumn("n", F.lit(int(n)))
    )
    # Known-single-n by construction: tag so consumers skip the
    # distinct-stamp validation aggregate (it would re-run this frame's
    # full groupBy just to read a literal).
    out._ons_gram_index_n = int(n)
    return out


def gram_index_append_batch(
    batch: SparkDF,
    id_col: str,
    text_col: str,
    store_path: str,
    n: int = 8,
    batch_id: "int | None" = None,
) -> None:
    """Append one batch's gram→keeper deltas to a durable gram-index
    store — the third consumer of the shared partitioned delta layout
    (``sources/store.py::partitioned_delta_append``, alongside the
    Count-Min and Bloom stores). min() is the merge, so any interleaving
    of batch appends and streaming replays merges losslessly;
    :func:`load_gram_index` re-aggregates on read."""
    from ons_utils_spark.sources.store import partitioned_delta_append

    deltas = gram_index(batch, id_col, text_col, n=n)
    partitioned_delta_append(deltas, store_path, batch_id=batch_id)


def load_gram_index(spark, store_path: str) -> SparkDF:
    """Read a gram-index delta store back as ONE index (min keeper per
    gram, the recorded ``n`` carried through) — feed it to
    :func:`self_dedup_spans_incremental`, which validates ``n``."""
    raw = spark.read.parquet(store_path)
    stamp = _assert_single_n(raw)
    out = (
        raw.select("g", "keeper", "n")
        .groupBy("g")
        .agg(F.min("keeper").alias("keeper"), F.min("n").alias("n"))
    )
    if stamp is not None:
        # Validated against the RAW store (a cheap RLE column scan) —
        # tag so per-ingest consumers don't re-run the validation as a
        # full aggregate over this grouped frame.
        out._ons_gram_index_n = stamp
    return out


def _assert_single_n(index: SparkDF) -> "int | None":
    """Validate an index's ``n`` stamp is a SINGLE value and return it
    (``None`` when the index is empty or unstamped). A store
    accidentally appended at two shingle sizes would otherwise fold to
    ``min(n)`` per gram and pass or fail downstream validation
    nondeterministically while its grams silently match nothing — so a
    mix raises, naming every ``n`` found. Partly-unstamped rows (NULL
    mixed with a value — a legacy writer's partition) raise too, with
    the NULL called out rather than an opaque sort TypeError. One
    aggregate over the stamp column only (constant, RLE — a
    metadata-cheap scan over the raw store; index CONSTRUCTORS tag
    their frames so consumers skip this, see
    :func:`self_dedup_spans_incremental`)."""
    if "n" not in index.columns:
        return None
    vals = [r["n"] for r in index.select("n").distinct().collect()]
    stamps = sorted(v for v in vals if v is not None)
    if len(stamps) > 1 or (stamps and None in vals):
        shown = stamps + (["NULL"] if None in vals else [])
        raise ValueError(
            f"gram index mixes shingle sizes n={shown} — an index is "
            "only valid at ONE n (hashes chained at different sizes "
            "match nothing); rebuild the store at a single n"
        )
    return stamps[0] if stamps else None


def self_dedup_spans_incremental(
    batch: SparkDF,
    index: SparkDF,
    id_col: str,
    text_col: str,
    n: int = 8,
    max_df: "int | None" = 10_000,
) -> SparkDF:
    """:func:`self_dedup_spans` for an INGEST batch against an already-
    indexed corpus: spans of batch passages that appear verbatim in any
    indexed document (at any alignment) or in a lower-id document of the
    batch itself.

    ``index`` is a ``(g, keeper)`` table from :func:`gram_index` /
    :func:`load_gram_index`. Provided batch ids exceed every indexed id
    (monotone ingest ids — the normal case), the result is EXACTLY
    ``self_dedup_spans(indexed ∪ batch)`` restricted to batch documents
    (pinned in tests): a gram present in the index makes every batch
    occurrence a non-keeper hit; a gram new to this batch falls back to
    the within-batch keeper rule. Per-ingest cost is O(batch grams) +
    one membership join against the index — the 100 TB corpus is never
    re-shingled (bucketed index → co-located join, see
    :func:`gram_index`).

    If ``index`` carries the ``n`` stamp (every index this module
    builds does), it is validated against this call's ``n`` — hashes
    chained at different shingle sizes silently match NOTHING, so a
    mismatch would otherwise report a duplicate-free batch. Frames from
    :func:`gram_index` / :func:`load_gram_index` carry a
    known-validated tag, so the per-ingest check is a Python attribute
    read; a foreign index frame pays one DISTINCT-stamp aggregate (not
    an arbitrary row), so a store accidentally appended at two sizes
    raises deterministically, naming both values.

    ``max_df`` guards the within-batch keeper window against hot grams
    exactly as in :func:`self_dedup_spans`; the index membership join
    needs no guard — its build side carries one row per gram, so
    sort-merge streams the hot gram's batch rows without buffering and
    AQE can split the partition.
    """
    stamp = getattr(index, "_ons_gram_index_n", None)
    if stamp is None:
        stamp = _assert_single_n(index)
    if stamp is not None and stamp != n:
        raise ValueError(
            f"gram index was built at n={stamp} but this "
            f"call probes at n={n} — rebuild the index or pass the "
            "matching n (mismatched shingle sizes match nothing)"
        )
    if "n" in index.columns:
        index = index.drop("n")
    grams = batch.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            shingle_hash64(text_col, n=n, distinct=False)
        ).alias("pos", "g"),
    )
    hot_flags = None
    if max_df is not None:
        hot_flags, grams = _split_hot_verdict(grams, 2, max_df)
    wg = Window.partitionBy("g")
    batch_keeper = F.min("id").over(wg)
    batch_dup = batch_keeper != F.max("id").over(wg)
    flagged = grams.withColumn(
        "__bhit", batch_dup & (F.col("id") != batch_keeper)
    ).select("id", "pos", "g", "__bhit")
    if hot_flags is not None:
        flagged = hot_flags.select(
            "id",
            "pos",
            "g",
            (F.col("__hotdup") & (F.col("id") != F.col("__keeper"))).alias(
                "__bhit"
            ),
        ).unionByName(flagged)
    hits = (
        flagged.join(
            index.select("g", F.col("keeper").alias("__prior")), "g", "left"
        )
        .where(F.col("__prior").isNotNull() | F.col("__bhit"))
        .select("id", "pos")
    )
    return _merge_hit_islands(hits, n)


def apply_span_redaction(
    corpus: SparkDF,
    spans: SparkDF,
    id_col: str,
    text_col: str,
    replacement: "Optional[str]" = "[redacted]",
    broadcast_spans: bool = True,
) -> SparkDF:
    """Apply a ``(id, span_start, span_end)`` table (e.g. from
    :func:`contaminated_spans` or :func:`self_dedup_spans`) to the
    corpus: each span's tokens are replaced by ONE ``replacement``
    marker, everything else survives verbatim — the redaction half of
    surgical decontamination (the whole-document alternative is
    :func:`decontaminate`). ``replacement=None`` drops the span's
    tokens outright instead of leaving a marker — the dedup semantics
    (remove the duplicated passage, keep no trace).

    Returns the corpus with ``text_col`` rewritten. Docs with no spans
    keep their ORIGINAL text byte-for-byte; affected docs are rebuilt
    from :func:`tokenize`'s tokens (lowercased, single-spaced — the
    redaction coordinate system), so only contaminated docs pay the
    normalization. Token indices are 0-based, end-exclusive, the same
    coordinates :func:`contaminated_spans` emits. Overlapping spans are
    legal (each covered token drops once; a marker lands at every
    span_start that survives its own coverage test).

    Scale: spans aggregate to one small array per AFFECTED doc and join
    back on the doc id; the rewrite is one row-local expression (per
    token: an ``exists`` over that doc's few spans). No corpus-side
    explode, no second corpus scan. ``broadcast_spans=True`` (default)
    hints the aggregated span table to the broadcast side so the corpus
    never shuffles — contamination is a few percent of a real corpus,
    so the per-doc span arrays fit on the executors. Disable it only
    when the span table itself is corpus-scale (e.g. redacting from a
    machine-generated span feed), where a broadcast would OOM the
    driver and a shuffled hash join is the right plan.
    """
    sp = spans.groupBy(F.col("id").alias("__sid")).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__spans")
    )
    if broadcast_spans:
        sp = F.broadcast(sp)
    joined = corpus.join(
        sp, corpus[id_col] == F.col("__sid"), "left"
    ).drop("__sid")
    # Per token index i: a replacement marker where a span starts (NULL
    # when dropping), NULL (dropped) where covered but not a start, the
    # token otherwise. The marker travels as a BOUND literal column —
    # never spliced into an expression string, so any replacement text
    # (quotes, backslashes) survives regardless of the session's
    # escapedStringLiterals parsing mode.
    marker = (
        F.lit(None).cast("string") if replacement is None
        else F.lit(replacement)
    )

    def _per_token(t, i):
        spans_arr = F.col("__spans")
        starts = F.exists(spans_arr, lambda s: s["span_start"] == i)
        covered = F.exists(
            spans_arr,
            lambda s: (i >= s["span_start"]) & (i < s["span_end"]),
        )
        return (
            F.when(starts, marker)
            .when(covered, F.lit(None).cast("string"))
            .otherwise(t)
        )

    rewrite = F.concat_ws(
        " ",
        F.filter(
            F.transform(F.col("__toks"), _per_token),
            lambda x: x.isNotNull(),
        ),
    )
    return (
        joined.withColumn(
            "__spans",
            F.coalesce(
                F.col("__spans"),
                F.array().cast(
                    "array<struct<span_start:int,span_end:int>>"
                ),
            ),
        )
        .withColumn("__toks", tokenize(F.col(text_col)))
        .withColumn(
            text_col,
            F.when(F.size("__spans") == 0, F.col(text_col)).otherwise(
                rewrite
            ),
        )
        .drop("__spans", "__toks")
    )


def pack_sequences(
    df: SparkDF,
    id_col: str,
    text_col: str,
    budget: int,
    partition_by: Union[str, Sequence[str]],
) -> SparkDF:
    """Assign documents to fixed token-budget training sequences.

    Documents are laid out in ``id_col`` order within each ``partition_by``
    group, token counts (whitespace) accumulate, and the stream is cut
    every ``budget`` tokens — GPT-style "concatenate then chunk" packing
    where a document may straddle a boundary; it belongs to the sequence
    containing its FIRST token. Output adds ``n_tokens``, ``seq_no`` (per
    group, 0-based) and ``seq_offset`` (token offset within the sequence).

    The window is partitioned, never global: each group (corpus shard,
    source, dump) packs independently, so the only shuffle is on the group
    key and parallelism equals the number of groups. For skewed groups,
    pre-split them (salt into ``partition_by``) — packing semantics allow
    any grouping that is stable between runs.
    """
    parts = list_convert(partition_by)
    n_tokens = F.size(tokenize(text_col))
    w = Window.partitionBy(*parts).orderBy(id_col)
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("__start")
    return (
        df.withColumn("n_tokens", n_tokens)
        .withColumn("__start", start)
        .withColumn("seq_no", F.floor(F.col("__start") / budget))
        .withColumn("seq_offset", F.col("__start") % budget)
        .drop("__start")
    )


def redact_patterns(
    df: SparkDF,
    text_col: str,
    patterns: Optional[Mapping[str, str]] = None,
    replacement: str = "[{name}]",
    out_col: Optional[str] = None,
    counts: bool = True,
) -> SparkDF:
    """Redact regex ``patterns`` from ``text_col`` (default: PII).

    Each pattern is replaced by ``replacement`` (``{name}`` interpolated,
    e.g. ``[email]``) in declaration order; with ``counts=True`` a
    ``<name>_count`` column records how many matches each document had
    BEFORE redaction. Everything is a row-local projection
    (``regexp_replace`` / ``regexp_count``) — zero shuffle, linear scale.
    """
    patterns = dict(patterns) if patterns is not None else dict(PII_PATTERNS)
    out_col = out_col or text_col
    result = df
    if counts:
        for name, pat in patterns.items():
            result = result.withColumn(
                f"{name}_count", F.regexp_count(F.col(text_col), F.lit(pat))
            )
    redacted = F.col(text_col)
    for name, pat in patterns.items():
        redacted = F.regexp_replace(
            redacted, pat, replacement.format(name=name)
        )
    return result.withColumn(out_col, redacted)


def build_vocab(
    df: SparkDF,
    text_col: str,
    k: int = 10_000,
    min_count: int = 1,
) -> SparkDF:
    """Corpus top-``k`` vocabulary: ``(token, n_occurrences, token_id)``.

    Tokens are ranked by occurrence count (ties broken lexicographically so
    ids are deterministic across runs and engines); ``token_id`` is the
    dense 0-based rank. The standard first step of tokenizer/embedding
    training over a corpus.

    At 100 TB: the explode + count is a partial-aggregated shuffle on the
    token (distinct-token cardinality, not corpus size). The global top-k
    is ``orderBy().limit(k)`` — planned as TakeOrderedAndProject, per-
    partition heaps + one k-row merge, never a full sort. Only the final
    k-row frame (bounded, small) passes through a single-partition
    row_number window to mint ids.
    """
    counts = (
        df.select(F.explode(tokenize(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .where(F.col("n_occurrences") >= min_count)
        .orderBy(F.col("n_occurrences").desc(), "token")
        .limit(k)
    )
    order = Window.orderBy(F.col("n_occurrences").desc(), "token")
    return counts.withColumn(
        "token_id", (F.row_number().over(order) - F.lit(1)).cast("bigint")
    )


def oov_stats(
    df: SparkDF,
    vocab: SparkDF,
    id_col: str,
    text_col: str,
    token_col: str = "token",
) -> SparkDF:
    """Per-document out-of-vocabulary rate against ``vocab``.

    Returns ``(id_col, n_tokens, oov_ratio)`` where ``oov_ratio`` is the
    fraction of token OCCURRENCES (not distinct tokens) absent from
    ``vocab[token_col]`` — the filter signal used to drop boilerplate/
    non-target-language docs before tokenizer training.

    At 100 TB: vocabularies are small (≤ millions of rows) and broadcast;
    the exploded corpus left-joins map-side with zero corpus shuffle, then
    re-aggregates on the document id — one shuffle keyed by document.
    """
    toks = df.select(
        F.col(id_col), F.explode(tokenize(text_col)).alias("__tok")
    )
    marked = toks.join(
        F.broadcast(vocab.select(F.col(token_col).alias("__tok")).distinct())
        .withColumn("__in_vocab", F.lit(1)),
        "__tok",
        "left",
    )
    return (
        marked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (
                1.0
                - F.sum(F.coalesce(F.col("__in_vocab"), F.lit(0)))
                / F.count(F.lit(1))
            ).alias("oov_ratio"),
        )
    )


def span_dedup(
    df: SparkDF,
    id_col: str,
    text_col: str,
    span_tokens: int = 16,
    min_count: int = 2,
) -> SparkDF:
    """Remove passages duplicated ACROSS the corpus (C4-style line/span
    dedup, generalized to fixed token windows for corpora without line
    structure).

    Documents are cut into non-overlapping ``span_tokens``-token spans
    (last span may be short). A span whose occurrence count across the
    whole corpus reaches ``min_count`` is boilerplate: every occurrence
    is dropped EXCEPT those in the document with the smallest id among
    its carriers (deterministic keeper, so the content survives exactly
    once). Unique spans pass through. Returns
    ``(id, clean_text, n_spans, n_kept)`` for every document that keeps
    at least one span, with ``clean_text`` the kept spans re-joined in
    original order.

    100 TB story: one scan cuts spans; span stats are a partial-aggregated
    shuffle keyed by the span's md5 (32-byte bounded key, never the raw
    passage); the verdict joins back on the same key (co-partitioned —
    Catalyst reuses the exchange) and documents reassemble with one
    shuffle on the doc id. No global sort, no driver data. md5 (not
    xxhash64) so the DuckDB oracle computes the identical key.
    """
    toks = tokenize(F.col(text_col))
    n_spans = F.ceil(F.size(toks) / F.lit(span_tokens)).cast("int")
    # Guarded: Spark's sequence(0, -1) is DESCENDING, so an empty doc
    # must yield an empty span array, not a phantom span.
    span_arr = F.when(
        n_spans > 0,
        F.transform(
            F.sequence(F.lit(0), n_spans - 1),
            lambda s: F.struct(
                s.alias("pos"),
                F.concat_ws(
                    " ", F.slice(toks, s * span_tokens + 1, span_tokens)
                ).alias("span"),
            ),
        ),
    ).otherwise(F.array().cast(f"array<struct<pos:int,span:string>>"))
    # n_spans rides each exploded row so no separate per-doc count
    # aggregate re-scans the corpus — the same passenger trick as
    # _pair_shingle_counts, including its chained explode barrier
    # (projecting size(arr) next to explode(arr) would otherwise make
    # CollapseProject evaluate the span construction twice per row).
    arr_once = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array(span_arr)).alias("g"),
    )
    spans = arr_once.select(
        "id",
        F.size("g").cast("bigint").alias("n_spans"),
        F.explode("g").alias("sp"),
    ).select("id", "n_spans", "sp.pos", "sp.span", F.md5("sp.span").alias("k"))

    stats = spans.groupBy("k").agg(
        F.count(F.lit(1)).alias("cnt"), F.min("id").alias("keeper")
    )
    kept = (
        spans.join(stats, "k")
        .where((F.col("cnt") < min_count) | (F.col("id") == F.col("keeper")))
    )
    return (
        kept.groupBy("id", "n_spans")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "span"))).alias("ps"),
            F.count(F.lit(1)).alias("n_kept"),
        )
        .select(
            "id",
            F.concat_ws(
                " ", F.transform("ps", lambda x: x["span"])
            ).alias("clean_text"),
            "n_spans",
            "n_kept",
        )
    )


def percentile_length_cap(
    df: SparkDF,
    group_col: str,
    length_col: str,
    p: float = 0.9,
) -> SparkDF:
    """Keep rows at or below their group's exact ``p``-quantile of
    ``length_col`` (linear interpolation — Spark ``percentile``, DuckDB/
    Postgres ``quantile_cont``/``percentile_cont`` agree on the value).

    The per-group cutoff is computed in ONE pass over the groups (exact
    percentile aggregate, partial-merged) and broadcast back — the corpus
    itself is never shuffled, so the filter is a map-side join + compare.
    Used to clip pathological long-tail documents per language/source
    before packing. Returns the surviving rows plus a ``__cap`` column
    with the group's cutoff.
    """
    if not 0.0 <= p <= 1.0:
        raise ValueError(f"p must be in [0, 1], got {p}")
    caps = df.groupBy(group_col).agg(
        F.expr(f"percentile({length_col}, {p!r})").alias("__cap")
    )
    # Null-safe equi-join so a NULL group forms its own group (matching
    # the groupBy side, where NULL is already a key) instead of silently
    # dropping those rows through a null-rejecting equi-join.
    joined = df.join(
        F.broadcast(caps.withColumnRenamed(group_col, "__cap_key")),
        F.col(group_col).eqNullSafe(F.col("__cap_key")),
    ).drop("__cap_key")
    return joined.where(F.col(length_col) <= F.col("__cap"))


def vocab_coverage(
    df: SparkDF,
    text_col: str,
    ks: Sequence[int] = (100, 1_000, 10_000),
) -> SparkDF:
    """Vocabulary coverage curve: ``(k, coverage)`` — the fraction of all
    token OCCURRENCES a top-``k`` frequency vocabulary covers, for each
    requested ``k``. The tokenizer-sizing question ("is 32k enough for
    this corpus?") answered in one job.

    Same cost model as :func:`build_vocab`: token counting is a partial-
    aggregated shuffle on the token; the global top-``max(ks)`` is
    TakeOrderedAndProject; only that bounded frame crosses the single-
    partition cumulative-sum window. Total occurrences come from the
    aggregated counts (1-row broadcast fold) — one corpus scan.

    A requested ``k`` larger than the number of distinct tokens is
    CLAMPED: the row is emitted with the full-vocabulary coverage (1.0 by
    construction), so "does a 32k vocab cover this corpus?" answers
    ``(32000, 1.0)`` on a 31-token corpus instead of silently returning
    no row. Every requested ``k`` therefore produces exactly one output
    row — EXCEPT on a corpus with zero tokens (empty/whitespace texts),
    where there is no vocabulary to rank against and the result is empty.
    The clamp rank is a 1-row bounded aggregate over the top frame — the
    same broadcast-fold idiom as the total.
    """
    ks = sorted(set(int(k) for k in ks))
    if not ks or ks[0] < 1:
        raise ValueError(f"ks must be positive ints, got {ks}")
    counts = (
        df.select(F.explode(tokenize(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # Total occurrences from a ROW-LOCAL size() over the corpus, not a
    # second aggregate over `counts` — two differently-pruned consumers
    # of the counts subtree would make Catalyst duplicate the whole
    # explode+shuffle per consumer (the shared-subtree trap); the
    # row-local sum costs one cheap scan and no shuffle.
    total = df.agg(
        F.sum(F.size(tokenize(text_col))).alias("__total")
    )
    top = counts.orderBy(F.col("n").desc(), "token").limit(ks[-1])
    order = Window.orderBy(F.col("n").desc(), "token")
    ranked = top.select(
        "n",
        F.row_number().over(order).alias("k"),
        F.sum("n").over(
            order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("__cum"),
    )
    # `ranked` is bounded by max(ks) rows; its max rank is the vocabulary
    # size whenever that is smaller. The last-rank marker comes from a
    # second window over the SAME single-partition bounded frame — not a
    # separate aggregate over `ranked`, which would give the counts
    # subtree two differently-pruned consumers (the shared-subtree trap
    # above: Catalyst would duplicate the corpus scan per consumer).
    ranked = ranked.withColumn(
        "__is_last",
        F.col("k") == F.max("k").over(Window.partitionBy()),
    )
    req = local_rows_df(
        df.sparkSession, [(int(k),) for k in ks], "k_req int"
    )
    # Exact match for k ≤ vocab size; the last rank stands in for any
    # oversized k (its coverage is 1.0 by construction). Both sides of
    # the nested-loop join are bounded: |ranked| ≤ max(ks), |req| = |ks|.
    return (
        ranked.join(
            F.broadcast(req),
            (F.col("k") == F.col("k_req"))
            | (F.col("__is_last") & (F.col("k_req") > F.col("k"))),
        )
        .join(F.broadcast(total))
        .select(
            F.col("k_req").alias("k"),
            F.round(F.col("__cum") / F.col("__total"), 6).alias("coverage"),
        )
        .orderBy("k")
    )


def dsir_log_weights(
    df: SparkDF,
    target: SparkDF,
    id_col: str,
    text_col: str,
    n: int = 2,
    buckets: int = 4096,
    alpha: float = 1.0,
    round_to: int = 4,
) -> SparkDF:
    """DSIR importance log-weights: how much more target-like than
    corpus-like each document's hashed n-gram profile is.

    Data Selection via Importance Resampling (Xie et al., NeurIPS 2023):
    fit two bag-of-hashed-n-grams unigram models — one on a small
    TARGET-domain sample, one on the RAW corpus — and weight each corpus
    document by its log likelihood ratio::

        log w(d) = Σ_{g ∈ grams(d)} [ln p̂_target(b(g)) − ln p̂_raw(b(g))]

    where ``b(g)`` hashes each n-gram into one of ``buckets`` buckets
    (``pmod(shingle_hash64, buckets)``) and both distributions use add-α
    smoothing: ``p̂(b) = (count(b) + α) / (total + α·buckets)``. Sampling
    proportionally to ``exp(log w)`` (see :func:`dsir_resample`) then
    yields corpus data distributed like the target domain.

    Returns ``(id, log_weight)``, one row per document with ≥ n tokens
    (shingle-less documents produce no row), ``log_weight`` rounded to
    ``round_to`` decimals. The default (4) is deliberately COARSE
    relative to the values' magnitude (|log w| ~ 1-20 on real corpora):
    the sum's float error depends on each engine's summation order
    (~1e-12 absolute over hundreds of log terms), so any cross-engine
    hash comparison needs a rounding grid that error cannot straddle —
    at 1e-4 the per-value straddle probability is ~1e-8 vs ~1e-6 at the
    previous 6 decimals, while 1e-4 resolution on a log-likelihood-ratio
    stays fully discriminative.

    Scale: the bucket-count tables are tiny (≤ ``buckets`` rows) and
    lazily persisted — their totals are folded back as 1-row broadcast
    joins against the CACHED table, not a re-aggregation of the corpus
    (the shared-subtree trap). The corpus is scanned twice (distribution
    build + per-doc scoring — the audit's allowed budget) and the target
    once; the per-doc score is one broadcast hash join (≤ ``buckets``
    rows) plus a partial-aggregated sum, so nothing quadratic and no
    driver collect anywhere. ``buckets`` must be a power of two so the
    signed ``pmod`` here equals the unsigned modulus an external auditor
    (the DuckDB oracle) computes.
    """
    if buckets < 2 or buckets & (buckets - 1):
        raise ValueError(f"buckets must be a power of two >= 2, got {buckets}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")

    def gram_buckets(d: SparkDF) -> SparkDF:
        return d.select(
            F.col(id_col).alias("id"),
            F.explode(shingle_hash64(text_col, n=n, distinct=False)).alias("h"),
        ).select("id", F.pmod(F.col("h"), F.lit(buckets)).alias("b"))

    raw_counts = (
        gram_buckets(df).groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    ).persist()
    tgt_counts = (
        gram_buckets(target).groupBy("b").agg(F.count(F.lit(1)).alias("ct"))
    ).persist()
    raw_total = raw_counts.agg(F.sum("cr").alias("tr"))
    tgt_total = tgt_counts.agg(F.sum("ct").alias("tt"))

    ab = float(alpha) * buckets
    ratio = (
        raw_counts.join(tgt_counts, "b", "left")
        .na.fill(0, ["ct"])
        .join(F.broadcast(raw_total))
        .join(F.broadcast(tgt_total))
        .select(
            "b",
            (
                F.log(F.col("ct") + F.lit(float(alpha)))
                - F.log(F.col("tt") + F.lit(ab))
                - F.log(F.col("cr") + F.lit(float(alpha)))
                + F.log(F.col("tr") + F.lit(ab))
            ).alias("lr"),
        )
    )
    return (
        gram_buckets(df)
        .join(F.broadcast(ratio), "b")
        .groupBy("id")
        .agg(F.round(F.sum("lr"), round_to).alias("log_weight"))
    )


def dsir_resample(
    df: SparkDF,
    target: SparkDF,
    id_col: str,
    text_col: str,
    k: int,
    n: int = 2,
    buckets: int = 4096,
    alpha: float = 1.0,
    salt: str = "dsir",
) -> SparkDF:
    """Draw ``k`` documents ~ importance weights via the Gumbel top-k
    trick — the selection step of DSIR.

    ``argmax_k [log w(d) + Gumbel(0,1)]`` is a sample WITHOUT replacement
    proportional to ``w(d)`` (Gumbel-max); the Gumbel noise here is
    deterministic — ``-ln(-ln(u))`` with ``u`` the md5-uniform of
    ``(salt, id)`` (the same engine-portable determinism as the sampling
    module, sampling.py:9-13) — so the same k documents are selected on
    any cluster, any partitioning, any engine.

    Returns ``(id, log_weight)`` for the ``k`` selected documents. The
    global top-k is TakeOrderedAndProject (bounded k frame, no global
    sort).
    """
    w = dsir_log_weights(
        df, target, id_col, text_col, n=n, buckets=buckets, alpha=alpha
    )
    # 12 hex digits → uniform in (0, 1]; +1 in the numerator keeps u > 0
    # so ln(u) is finite, and u = 1 gives gumbel = -ln(-ln(1)) = +inf with
    # probability 16^-12 — rejected by re-salting if it ever matters.
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), F.col("id").cast("string"))), 1, 12),
            16,
            10,
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(16**12))
    key = F.col("log_weight") + (-F.log(-F.log(u)))
    return (
        w.withColumn("__k", key)
        .orderBy(F.col("__k").desc(), "id")
        .limit(k)
        .select("id", "log_weight")
    )
