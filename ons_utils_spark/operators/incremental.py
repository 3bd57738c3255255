"""Incremental aggregate maintenance: fold new data into stored
aggregates without rescanning history.

The 100 TB pattern behind every "daily rollup" table: keep the aggregate
table keyed by the group columns with MERGEABLE measures (sum, count,
min, max — and anything derivable from them, like avg), aggregate ONLY
the new batch, and merge. History is never rescanned; per-ingest cost is
O(batch) + one shuffle of O(groups-touched) rows. Algebraic measures
only — a true median needs a sketch (see ``q_hll_mergeable`` for the
distinct-count analogue).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame as SparkDF, functions as F

#: Measure name → (per-batch aggregate, merge aggregate). Merge reuses
#: the same function for sum/min/max (they are semigroup ops); count
#: merges by SUM of partial counts.
_MEASURES = {
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
    "count": (lambda c: F.count(F.lit(1)), F.sum),
}


def aggregate_batch(
    batch: SparkDF,
    keys: Sequence[str],
    measures: dict[str, Sequence[str]],
) -> SparkDF:
    """Partial aggregate of one batch → one row per key combination.

    ``measures`` maps measure name (``sum``/``min``/``max``/``count``)
    to the value columns it applies to (``count`` takes ``["*"]``).
    Output columns are ``{measure}_{col}`` (``n`` for count), the exact
    shape :func:`merge_aggregates` consumes and produces — so a stored
    aggregate table can be merged again and again.
    """
    aggs = []
    for name, cols in measures.items():
        if name not in _MEASURES:
            raise ValueError(f"unknown measure {name!r}; use {sorted(_MEASURES)}")
        per_batch, _ = _MEASURES[name]
        for c in cols:
            alias = "n" if name == "count" else f"{name}_{c}"
            aggs.append(per_batch(c).alias(alias))
    if not aggs:
        raise ValueError("measures must be non-empty")
    return batch.groupBy(*keys).agg(*aggs)


def merge_aggregates(
    stored: SparkDF,
    batch_agg: SparkDF,
    keys: Sequence[str],
    measures: dict[str, Sequence[str]],
) -> SparkDF:
    """Merge a batch's partial aggregate into the stored aggregate table.

    Union + re-aggregate with each measure's MERGE function (sum/min/max
    merge with themselves; counts merge by summing) — associative and
    commutative, so any batch arrival order and any grouping of batches
    yields the identical table (pinned in tests against a one-shot
    aggregate over the concatenated data). Both inputs must have the
    :func:`aggregate_batch` column shape.
    """
    aggs = []
    for name, cols in measures.items():
        if name not in _MEASURES:
            raise ValueError(f"unknown measure {name!r}; use {sorted(_MEASURES)}")
        _, merge = _MEASURES[name]
        for c in cols:
            alias = "n" if name == "count" else f"{name}_{c}"
            aggs.append(merge(alias).alias(alias))
    return stored.unionByName(batch_agg).groupBy(*keys).agg(*aggs)


def table_diff(
    old: SparkDF,
    new: SparkDF,
    keys: "Sequence[str]",
    compare_cols: "Sequence[str] | None" = None,
) -> SparkDF:
    """CDC-style diff of two table versions: ``(*keys, change)`` with
    ``change`` ∈ ``added`` / ``removed`` / ``changed`` (unchanged rows
    are omitted — at 100 TB they are the overwhelming majority and
    nobody wants them materialized).

    ``compare_cols`` defaults to every shared non-key column. Plan: each
    side reduces to ``(keys, md5 fingerprint of the compared columns)``
    map-side — the full-outer join that classifies changes then shuffles
    only keys + 32-byte digests, never the row payloads. Cells are
    digested INDIVIDUALLY before combining, so values containing any
    separator byte cannot collide across column boundaries, and NULL
    fingerprints as a non-hex token no string value can produce. The same
    fingerprint expression is recomputable by an external engine to audit
    the diff.

    Multiple rows per key: version tables should be key-unique; if not,
    the fingerprint aggregates per key as a true MULTISET digest — row
    digests are first counted per distinct row, then the per-key
    fingerprint is the order-insensitive xor of ``xxhash64(digest,
    multiplicity)``. A plain xor of row digests would cancel PAIRS of
    identical rows ({A, A, B} → {B} reads unchanged); folding the
    multiplicity into each term makes any change of the row multiset
    change the fingerprint (up to hash collision, ~2⁻⁶⁴).
    """
    keys = list(keys)
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in keys]
    compare_cols = list(compare_cols)

    def fingerprint(df: SparkDF) -> SparkDF:
        # Per-CELL digests, then hash the concatenation: raw values
        # concatenated with a separator can collide across column
        # boundaries when the data itself contains the separator
        # (('a\\x1fb','c') vs ('a','b\\x1fc')). Each token here is either
        # a 32-char lowercase-hex digest or the literal 'NULL' — 'N' is
        # not a hex character, so the token stream parses unambiguously
        # and NULL can never collide with any string value.
        cells = [
            F.coalesce(F.md5(F.col(c).cast("string")), F.lit("NULL"))
            for c in compare_cols
        ]
        row_fp = F.md5(F.concat(*cells)) if cells else F.lit("")
        return (
            df.select(*keys, row_fp.alias("__fp"))
            # Multiset digest in two partial-aggregating steps: count each
            # distinct row digest per key, then xor hashes that include
            # the multiplicity. Both aggregates map-side combine, and for
            # the key-unique contract case the first groupBy is already
            # the full reduction.
            .groupBy(*keys, "__fp")
            .agg(F.count(F.lit(1)).alias("__mult"))
            .groupBy(*keys)
            .agg(F.bit_xor(F.xxhash64("__fp", "__mult")).alias("__fp"))
        )

    o = fingerprint(old).withColumnRenamed("__fp", "__fp_old")
    n = fingerprint(new).withColumnRenamed("__fp", "__fp_new")
    joined = o.join(n, keys, "full_outer")
    change = (
        F.when(F.col("__fp_old").isNull(), F.lit("added"))
        .when(F.col("__fp_new").isNull(), F.lit("removed"))
        .when(F.col("__fp_old") != F.col("__fp_new"), F.lit("changed"))
    )
    return (
        joined.withColumn("change", change)
        .where(F.col("change").isNotNull())
        .select(*keys, "change")
    )
