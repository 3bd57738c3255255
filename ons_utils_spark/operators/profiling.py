"""Data-profiling operators: heavy-hitter keys and per-column statistics.

Pipeline hygiene at 100 TB starts with knowing the data's shape: which join
keys are skewed (heavy hitters — the inputs to salting / AQE-skew
decisions in :mod:`ons_utils_spark.operators.skew`), and what each
column's null rate / cardinality / range looks like before a schema
contract is trusted.
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import DataFrame as SparkDF, functions as F

from ons_utils_spark.generic import list_convert
from ons_utils_spark.functions.localrel import local_rows_df


def heavy_hitters(
    df: SparkDF,
    cols: Union[str, Sequence[str]],
    min_share: float = 0.01,
) -> SparkDF:
    """Keys of ``cols`` carrying at least ``min_share`` of all rows.

    Returns ``(*cols, n, share)`` — exact counts, descending ``n``. Plan:
    one hash-aggregate over the key (map-side partial combine, shuffle =
    |distinct keys|), then the total row count is derived from THOSE
    aggregated counts (a 1-row re-aggregate broadcast back as a
    nested-loop fold) — the input is scanned exactly once. The output is
    what skew mitigation consumes: keys above ~1% of a 10¹² -row table are
    exactly the ones a salted join or AQE skew-split must handle.
    """
    cols = list_convert(cols)
    counts = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("__total"))
    return (
        counts.join(F.broadcast(total))
        .where(F.col("n") >= min_share * F.col("__total"))
        .select(
            *cols,
            "n",
            F.round(F.col("n") / F.col("__total"), 6).alias("share"),
        )
        .orderBy(F.col("n").desc(), *cols)
    )


def histogram(
    df: SparkDF,
    col: str,
    bins: int = 10,
    lo: float | None = None,
    hi: float | None = None,
) -> SparkDF:
    """Equal-width histogram of a numeric column: ``(bucket, lo_edge,
    hi_edge, n)``, ascending by bucket; empty buckets are omitted.

    With ``lo``/``hi`` unset the range comes from a 1-row min/max
    aggregate broadcast back as a nested-loop fold (one extra pass; pass
    explicit bounds to skip it). Bucketing is row-local double arithmetic
    — ``floor((x - lo) / (hi - lo) * bins)`` clamped so ``x == hi`` lands
    in the last bucket — then one |bins|-key hash aggregate. NULLs and
    out-of-range rows are dropped.
    """
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    x = F.col(col).cast("double")
    data = df.select(x.alias("__x")).where(F.col("__x").isNotNull())
    if lo is None or hi is None:
        # Derive ONLY the missing bound(s) — a caller-supplied bound must
        # never be silently replaced by the data's (a half-open range like
        # lo=0 is how you exclude negatives).
        bounds = data.agg(
            F.min("__x").alias("__lo"), F.max("__x").alias("__hi")
        )
        data = data.join(F.broadcast(bounds))
        lo_c = F.col("__lo") if lo is None else F.lit(float(lo))
        hi_c = F.col("__hi") if hi is None else F.lit(float(hi))
    else:
        lo_c, hi_c = F.lit(float(lo)), F.lit(float(hi))
    width = (hi_c - lo_c) / bins
    # width == 0 (constant column / lo == hi): everything lands in bucket
    # 0 rather than vanishing into a NULL division.
    bucket = (
        F.when(width == 0, F.lit(0))
        .otherwise(
            F.least(F.lit(bins - 1), F.floor((F.col("__x") - lo_c) / width))
        )
        .cast("int")
    )
    return (
        data.where((F.col("__x") >= lo_c) & (F.col("__x") <= hi_c))
        .select(
            bucket.alias("bucket"),
            (lo_c + bucket * width).alias("lo_edge"),
            (lo_c + (bucket + 1) * width).alias("hi_edge"),
        )
        .groupBy("bucket", "lo_edge", "hi_edge")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bucket")
    )


def profile_columns(
    df: SparkDF,
    cols: Union[str, Sequence[str], None] = None,
) -> SparkDF:
    """One profile row per column: ``(col_name, n, n_null, n_distinct,
    min_value, max_value)`` with the extrema rendered as strings.
    (``col_name`` rather than ``column`` — the latter is a reserved word
    in most SQL dialects, which would force quoting on every consumer.)

    Exact (not sketched): one aggregate computes every column's stats in a
    single pass — the multiple COUNT(DISTINCT)s expand the input
    (Catalyst's Expand: one copy per distinct-aggregate), so cost is
    ~|cols| × scan. That is the right trade for a deliberate profiling
    job; for continuous monitoring swap ``approx_count_distinct`` in (one
    pass, no Expand) — the schema stays identical.
    """
    from pyspark.sql.types import MapType

    cols = list(df.columns) if cols is None else list_convert(cols)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        if isinstance(df.schema[c].dataType, MapType):
            # Maps are not orderable/hashable in Spark SQL: count_distinct
            # and min/max would fail the WHOLE aggregate. Profile what is
            # profileable (n, nulls) and null the rest, instead of letting
            # one map column kill every other column's stats.
            aggs += [
                F.count(c).alias(f"__nn_{c}"),
                F.lit(None).cast("bigint").alias(f"__nd_{c}"),
                F.lit(None).cast("string").alias(f"__min_{c}"),
                F.lit(None).cast("string").alias(f"__max_{c}"),
            ]
            continue
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    # Melt the single wide row into one row per column — |cols| rows total,
    # a driver-side-free pivot via explode of a struct array.
    melted = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col("__n").alias("n"),
                        (F.col("__n") - F.col(f"__nn_{c}")).alias("n_null"),
                        F.col(f"__nd_{c}").alias("n_distinct"),
                        F.col(f"__min_{c}").alias("min_value"),
                        F.col(f"__max_{c}").alias("max_value"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    )
    return melted.select("p.*")


def constraint_audit(
    df: SparkDF,
    checks: "dict[str, object]" = None,
    unique: "Sequence[Union[str, Sequence[str]]]" = (),
) -> SparkDF:
    """Data-contract audit: one row per rule — ``(rule, n_violations)``.

    ``checks`` maps rule name → a VIOLATION predicate Column (true = the
    row breaks the contract), e.g. ``{"price_positive": F.col("price")
    <= 0}``; ``unique`` lists key columns (or column tuples) that must be
    row-unique. The dbt-tests / Great-Expectations shape, evaluated
    engine-side in ONE pass over the input: row-local rules fold into a
    single aggregate (``sum(case when violated)``), and each uniqueness
    rule adds only a ``count(*) - count(distinct keys)`` lane to the SAME
    aggregate — no joins, no second scan, shuffle bounded by the distinct
    aggregates' Expand. Run it before publishing any 100 TB table; alert
    on any ``n_violations > 0``.
    """
    checks = checks or {}
    aggs = []
    names = []
    for name, cond in checks.items():
        aggs.append(
            F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(f"__v_{len(names)}")
        )
        names.append(name)
    for key in unique:
        cols = [key] if isinstance(key, str) else list(key)
        label = "unique(" + ", ".join(cols) + ")"
        # surplus duplicate rows = count(fully-non-null keys) - count
        # (distinct keys). Both sides must skip NULL-keyed rows (count
        # distinct already does; a bare count(*) would book every NULL
        # row as a duplicate) — NULL keys are a not-null rule's job.
        all_set = F.col(cols[0]).isNotNull()
        for c in cols[1:]:
            all_set = all_set & F.col(c).isNotNull()
        non_null = F.when(all_set, 1)
        aggs.append(
            (F.count(non_null) - F.count_distinct(*[F.col(c) for c in cols]))
            .cast("bigint")
            .alias(f"__v_{len(names)}")
        )
        names.append(label)
    if not names:
        raise ValueError("constraint_audit needs at least one check")
    one = df.agg(*aggs)
    melted = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(n).alias("rule"),
                        F.col(f"__v_{i}").alias("n_violations"),
                    )
                    for i, n in enumerate(names)
                ]
            )
        ).alias("p")
    )
    return melted.select("p.*")


def group_percentiles(
    df: SparkDF,
    group_col: str,
    value_col: str,
    ps: Sequence[float] = (0.5, 0.9, 0.99),
) -> SparkDF:
    """Exact interpolated percentiles per group: ``(group, p, value)`` —
    the latency-band / length-distribution report (p50/p90/p99).

    Spark's ``percentile`` is the exact linear-interpolation quantile
    (``quantile_cont`` in DuckDB/Postgres terms), computed as ONE
    partial-merged aggregate per group — all requested ``ps`` ride the
    same aggregation pass, then melt row-locally to the long shape.
    Exact quantiles buffer each group's values on the reducer; for
    10⁹-row groups switch to ``percentile_approx`` (same call shape,
    bounded memory, documented error).
    """
    ps = [float(p) for p in ps]
    if not ps or any(not 0 <= p <= 1 for p in ps):
        raise ValueError(f"ps must be fractions in [0,1], got {ps}")
    aggs = [
        F.percentile(value_col, F.lit(p)).alias(f"__p{i}")
        for i, p in enumerate(ps)
    ]
    one = df.groupBy(group_col).agg(*aggs)
    return (
        one.select(
            group_col,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(p).alias("p"),
                            F.round(F.col(f"__p{i}"), 6).alias("value"),
                        )
                        for i, p in enumerate(ps)
                    ]
                )
            ).alias("q"),
        )
        .select(group_col, "q.p", "q.value")
        .orderBy(group_col, "p")
    )


def equi_depth_histogram(df: SparkDF, col: str, bins: int = 10) -> SparkDF:
    """Equi-depth (quantile) histogram: ``(bucket, lo_edge, hi_edge, n)``
    with ~equal ROW counts per bucket — the histogram skewed data needs
    (an equal-width histogram of a long-tailed column puts 99% of rows in
    bucket 0).

    One pass computes the ``bins - 1`` interior boundaries (exact
    ``percentile`` with linear interpolation — the same formula DuckDB's
    ``quantile_cont`` uses, cross-checked bit-equal) plus global min/max
    as a 1-row aggregate; the row-local bucket assignment
    ``#{boundaries ≤ x}`` and a |bins|-key hash aggregate follow. Exact
    duplicates around a boundary can make neighbouring buckets uneven
    (ties all land in the upper bucket — deterministic, engine-portable);
    heavy skew can leave interior buckets empty (omitted, like
    :func:`histogram`). NULLs are dropped.

    Scale: Spark's exact ``percentile`` buffers a per-distinct-value
    counts map that is merged onto ONE task, so memory is O(distinct
    values of ``col``) — fine for low-cardinality columns at any row
    count, but an OOM risk on a high-cardinality double column well
    before billions of DISTINCT values (~10⁸ is a practical ceiling).
    Beyond that, switch to ``percentile_approx`` (t-digest sketch):
    mergeable, bounded memory at any cardinality, at the cost of the
    oracle-exact boundaries.
    """
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    x = F.col(col).cast("double")
    data = df.select(x.alias("__x")).where(F.col("__x").isNotNull())
    if bins == 1:
        # percentile() of an empty probability array yields NULL, which
        # would poison the boundary-count; one bucket needs no boundary.
        qs = F.array().cast("array<double>").alias("__qs")
        bounds = data.agg(
            F.min("__x").alias("__lo"), F.max("__x").alias("__hi")
        ).select(qs, "__lo", "__hi")
    else:
        probs = F.array(*[F.lit(i / bins) for i in range(1, bins)])
        bounds = data.agg(
            F.percentile("__x", probs).alias("__qs"),
            F.min("__x").alias("__lo"),
            F.max("__x").alias("__hi"),
        )
    bucket = F.size(
        F.filter("__qs", lambda q: q <= F.col("__x"))
    ).alias("bucket")
    lo_edge = F.when(F.col("bucket") == 0, F.col("__lo")).otherwise(
        F.element_at("__qs", F.col("bucket"))
    )
    hi_edge = F.when(F.col("bucket") == bins - 1, F.col("__hi")).otherwise(
        F.element_at("__qs", F.col("bucket") + 1)
    )
    return (
        data.join(F.broadcast(bounds))
        .select("__x", "__qs", "__lo", "__hi", bucket)
        .groupBy("bucket")
        .agg(
            F.round(F.first(lo_edge), 6).alias("lo_edge"),
            F.round(F.first(hi_edge), 6).alias("hi_edge"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("bucket")
    )


def psi_drift(
    ref: SparkDF,
    cur: SparkDF,
    col: str,
    bins: int = 10,
    eps: float = 1e-6,
    round_dp: int = 6,
) -> SparkDF:
    """Population Stability Index between two snapshots of a column.

    The scorecard-monitoring drift gate: bin edges are equal-width from
    the REFERENCE snapshot's min/max, both snapshots are histogrammed
    onto them, and each bin contributes
    ``(p_cur' − p_ref') · ln(p_cur'/p_ref')`` where ``p' = max(p, eps)``
    floors empty bins. Returns one row per bin — ``(bucket, n_ref,
    n_cur, p_ref, p_cur, psi_term)``, all ``bins`` buckets present even
    when empty — so the consumer reads the shift's location, not just
    ``sum(psi_term)`` (rule of thumb: < 0.1 stable, 0.1–0.25 moderate,
    > 0.25 shifted).

    Current-snapshot rows OUTSIDE the reference range clamp into the
    edge bins — drift mass must be counted, not dropped (dropping it is
    the classic silent-PSI bug). NULLs and NaNs are excluded on both
    sides (a reference NaN would otherwise poison the min/max bounds).
    An empty, all-NULL/NaN, or CONSTANT reference raises — zero-width
    bins would fold every row into one bucket and score any shift 0.

    Scale: one min/max pass over the reference (1-row broadcast fold),
    one |bins|-key partial aggregate per side, joins against a
    ``spark.range(bins)`` frame, and one bounded 2-value totals collect
    over the checkpointed |bins|-row counts table — no global window, no
    unbounded collect; both corpora are scanned exactly once each.
    """
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")

    spark = ref.sparkSession
    # NaN is excluded like NULL on BOTH sides — a single NaN in the
    # reference would otherwise poison the bounds (Spark max() ranks NaN
    # above every double), make width NaN, and fold every row of both
    # snapshots into bucket 0: PSI = 0 under any shift, silently.
    valid = lambda c: c.isNotNull() & ~F.isnan(c)  # noqa: E731
    rx = ref.select(F.col(col).cast("double").alias("__x")).where(
        valid(F.col("__x"))
    )
    cx = cur.select(F.col(col).cast("double").alias("__x")).where(
        valid(F.col("__x"))
    )
    # 1-row frame consumed by BOTH bucketize passes — materialized once
    # so neither re-derives the min/max scan (and the final plan reads
    # the snapshot, not the reference corpus).
    bounds = rx.agg(
        F.min("__x").alias("__lo"), F.max("__x").alias("__hi")
    ).localCheckpoint(eager=True)
    # An empty/all-NULL snapshot cannot anchor bins (NULL bounds would
    # silently clamp everything into the top bucket) or normalize shares
    # (0/0 -> NaN psi_terms a drift gate would swallow) — fail loudly.
    # A CONSTANT reference (min == max) is the same failure wearing a
    # different hat: zero-width bins fold both snapshots into bucket 0,
    # so arbitrarily large shifts score PSI = 0 — exactly the class of
    # failure the gate exists to catch.
    b_row = bounds.first()
    if b_row["__lo"] is None:
        raise ValueError(
            f"reference snapshot has no non-null {col!r} rows — "
            "PSI bins cannot be anchored"
        )
    if b_row["__lo"] == b_row["__hi"]:
        raise ValueError(
            f"reference snapshot of {col!r} is constant "
            f"(min == max == {b_row['__lo']}) — equal-width PSI bins "
            "cannot be anchored and any shift would silently score 0; "
            "treat the column as categorical (psi_drift_categorical) "
            "instead"
        )

    def bucketize(data: SparkDF, n_col: str) -> SparkDF:
        d = data.join(F.broadcast(bounds))
        # width > 0 is guaranteed by the constant-reference guard above.
        width = (F.col("__hi") - F.col("__lo")) / bins
        raw = F.floor((F.col("__x") - F.col("__lo")) / width)
        b = (
            F.greatest(F.lit(0), F.least(F.lit(bins - 1), raw))
            .cast("int")
        )
        return d.select(b.alias("bucket")).groupBy("bucket").agg(
            F.count(F.lit(1)).alias(n_col)
        )

    n_ref = bucketize(rx, "n_ref")
    n_cur = bucketize(cx, "n_cur")
    frame = spark.range(bins).select(F.col("id").cast("int").alias("bucket"))
    counts = (
        frame.join(n_ref, "bucket", "left")
        .join(n_cur, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
        # |bins| rows, two consumers (totals fold + output) — without
        # this both snapshots are scanned twice.
        .localCheckpoint(eager=True)
    )
    return _psi_terms(counts, "bucket", col, eps, round_dp)


def _psi_terms(
    counts: SparkDF, key_col: str, col: str, eps: float, round_dp: int
) -> SparkDF:
    """Shared PSI tail: eps-floored shares + log terms over a
    (checkpointed) ``(key, n_ref, n_cur)`` counts table.

    The totals come from ONE driver-side aggregate over the tiny counts
    frame and fold in as literals — this both serves the empty-current
    guard (an empty CURRENT snapshot, e.g. a pipeline outage, would make
    every p_cur 0/0 = NaN, the silent-PSI failure) and keeps the final
    plan join-free.
    """
    tr, tc = counts.agg(F.sum("n_ref"), F.sum("n_cur")).first()
    if not tc:
        raise ValueError(
            f"current snapshot has no non-null {col!r} rows — "
            "PSI is undefined"
        )
    p_ref = F.greatest(F.col("n_ref") / F.lit(float(tr)), F.lit(float(eps)))
    p_cur = F.greatest(F.col("n_cur") / F.lit(float(tc)), F.lit(float(eps)))
    return counts.select(
        key_col,
        "n_ref",
        "n_cur",
        F.round(p_ref, round_dp).alias("p_ref"),
        F.round(p_cur, round_dp).alias("p_cur"),
        F.round((p_cur - p_ref) * F.log(p_cur / p_ref), round_dp).alias(
            "psi_term"
        ),
    ).orderBy(key_col)


def psi_drift_categorical(
    ref: SparkDF,
    cur: SparkDF,
    col: str,
    top_n: int = 20,
    eps: float = 1e-6,
    round_dp: int = 6,
    other_label: str = "__other__",
) -> SparkDF:
    """PSI between two snapshots of a CATEGORICAL column.

    The category space is anchored to the REFERENCE snapshot: its
    ``top_n`` most frequent values (ties broken by value, so the anchor
    set is deterministic) each get a bin; everything else — including
    categories that only appear in the current snapshot — folds into
    ``other_label``, so new-category drift mass is counted, not dropped
    (the categorical analogue of psi_drift's edge-bin clamping). Returns
    ``(category, n_ref, n_cur, p_ref, p_cur, psi_term)``, one row per
    anchor category plus the fold-in bin, all present even when empty.

    If ``other_label`` itself lands in the anchor set the call raises
    (its bin would double-count the fold-in mass) — pass a different
    ``other_label``. A non-anchor category valued exactly ``other_label``
    folds in silently like any other non-anchor value.

    Scale: ONE count aggregate over the reference (the checkpointed
    per-category count table serves both the top-n anchor collect and
    the n_ref fold), one count aggregate over the current snapshot, then
    row-local CASE folding — no global window, no unbounded collect.
    NULL categories are excluded on both sides.
    """
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")

    spark = ref.sparkSession
    rx = ref.select(F.col(col).cast("string").alias("__c")).where(
        F.col("__c").isNotNull()
    )
    cx = cur.select(F.col(col).cast("string").alias("__c")).where(
        F.col("__c").isNotNull()
    )
    # One scan of the reference: the per-category count table is
    # distinct-categories-sized and feeds BOTH the anchor collect and
    # the n_ref fold below.
    ref_counts = (
        rx.groupBy("__c")
        .agg(F.count(F.lit(1)).alias("__n"))
        .localCheckpoint(eager=True)
    )
    anchors = [
        r["__c"]
        for r in ref_counts.orderBy(
            F.col("__n").desc(), F.col("__c").asc()
        )
        .limit(top_n)
        .collect()
    ]
    if not anchors:
        raise ValueError(
            f"reference snapshot has no non-null {col!r} rows — "
            "PSI categories cannot be anchored"
        )
    if other_label in anchors:
        raise ValueError(
            f"anchor category {other_label!r} collides with the fold-in "
            "bin label — pass a different other_label"
        )

    def fold(c):
        return F.when(c.isin(anchors), c).otherwise(F.lit(other_label))

    n_ref = (
        ref_counts.select(fold(F.col("__c")).alias("category"), "__n")
        .groupBy("category")
        .agg(F.sum("__n").alias("n_ref"))
    )
    n_cur = (
        cx.select(fold(F.col("__c")).alias("category"))
        .groupBy("category")
        .agg(F.count(F.lit(1)).alias("n_cur"))
    )
    frame = local_rows_df(
        spark, [(c,) for c in anchors] + [(other_label,)],
        "category string",
    )
    counts = (
        frame.join(n_ref, "category", "left")
        .join(n_cur, "category", "left")
        .select(
            "category",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
        .localCheckpoint(eager=True)
    )
    return _psi_terms(counts, "category", col, eps, round_dp)
