"""Fuzzy (edit-distance) matching: exact ed ≤ k self-join for short strings.

Entity-resolution workhorse: find all pairs of names / titles / codes within
Levenshtein distance ``k`` without the O(n²) all-pairs scan. Candidate
generation uses **k-deletion neighborhoods** (the FastSS scheme, Bocek et
al. 2007): every string emits each variant obtainable by deleting at most
``k`` characters; two strings within edit distance ``k`` ALWAYS share at
least one variant, so a postings-list self-join on the variant finds every
true pair (exact recall), and a final ``levenshtein`` check makes precision
exact too.

Why not chunk-based blocking (PassJoin)? Chunks break down on corpora with
a long shared prefix — e.g. ids like ``Customer#000000042``, where one
chunk of EVERY string is the literal prefix and its posting list is the
whole corpus (quadratic candidates). Deletion variants key on the whole
string minus k characters, so a bucket holds only strings that agree on
everything else — bucket sizes track true-duplicate density, not prefix
sharing.

Cost model: a string of length L emits ~``C(L, k)`` variants (L+1 for k=1,
~L²/2 for k=2) — this is a SHORT-STRING operator (names, titles, SKUs;
up to ~100 chars at k=1, ~40 at k=2), not a document operator (for
documents use the shingle/MinHash family in
:mod:`ons_utils_spark.operators.dedup`). Variants travel as xxhash64
digests, so the postings shuffle is 8 bytes per variant regardless of
string length; hashing can only MERGE buckets (never split), so recall is
unaffected, and the ~2⁻⁶⁴ false-bucket chance is removed by the verify
step. One shuffle total: the text rides the postings as the payload, so
verification happens in the pair-emission projection with no join back to
the corpus.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame as SparkDF, functions as F

from ons_utils_spark.operators.dedup import explode_pairs


def _deletion_variants(s: Column) -> Column:
    """All strings obtainable from ``s`` by deleting at most ONE character
    (including ``s`` itself), as an array. Row-local Catalyst expression."""
    return F.transform(
        F.sequence(F.lit(0), F.length(s)),
        lambda i: F.when(i == 0, s).otherwise(
            F.concat(s.substr(F.lit(1), i - 1), s.substr(i + 1, F.length(s)))
        ),
    )


def edit_distance_pairs(
    df: SparkDF,
    id_col: str,
    text_col: str,
    max_distance: int = 1,
    max_bucket: Optional[int] = None,
) -> SparkDF:
    """All pairs with ``levenshtein(text_a, text_b) <= max_distance``.

    Returns ``(id_a, id_b, distance)`` with ``id_a < id_b``. Exact (full
    recall and precision) via deletion-neighborhood candidates + verify;
    see module docstring for the cost model. ``max_distance`` must be 1 or
    2 — beyond that the neighborhood size makes a different algorithm (or
    the shingle family) the right tool.

    ``max_bucket`` optionally drops variant buckets larger than the given
    size — the skew guard for corpora with thousands of IDENTICAL strings
    (their full-string bucket is quadratic in the duplicate count; exact
    dedup should collapse those first). Dropping a bucket can only lose
    pairs whose every shared variant is that popular, so results stay a
    subset; leave unset for exact results.
    """
    if max_distance not in (1, 2):
        raise ValueError(
            f"max_distance must be 1 or 2, got {max_distance} — for larger "
            "budgets use shingle-based similarity (operators/dedup)"
        )
    variants = _deletion_variants(F.col("t"))
    if max_distance == 2:
        variants = F.flatten(F.transform(variants, _deletion_variants))
    # Dedup at BOTH k: a run of m identical characters yields the same
    # deletion variant m times, and each duplicate would otherwise be a
    # full (id, t, vh) shuffle row that collect_set discards later.
    variants = F.array_distinct(variants)

    # Rename FIRST, in its own projection: deriving the variants in the
    # same select that mints the "t" alias makes Spark read the reference
    # as a lateral column alias (an analyzer error when the input column
    # is itself named "t").
    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))
    posts = (
        base.select("id", "t", F.explode(variants).alias("v"))
        .select("id", "t", F.xxhash64("v").alias("vh"))
        .groupBy("vh")
        .agg(
            F.sort_array(F.collect_set(F.struct("id", "t"))).alias("items")
        )
        .where(F.size("items") > 1)
    )
    if max_bucket is not None:
        posts = posts.where(F.size("items") <= max_bucket)

    # Triangular pair emission per bucket — the postings idiom shared with
    # jaccard/minhash/simhash candidates (sort_array ordered by id, so
    # id_a < id_b falls out of the emission order).
    cand = (
        explode_pairs(posts, "items", ["id", "t"])
        .select("p.id_a", "p.id_b", "p.t_a", "p.t_b")
        # If one id appears with multiple distinct texts, collect_set keeps
        # both (id, t) structs and the triangular emission can produce an
        # id_a == id_b pair — drop those so the id_a < id_b contract holds
        # even on non-unique id columns.
        .where(F.col("id_a") != F.col("id_b"))
    )
    # Threshold-bounded levenshtein: early-exits and returns -1 above the
    # budget, so verification cost per pair is O(k * min_len), not O(L²).
    #
    # VERIFY BEFORE the multi-variant dedup (r13, guide §2.3 — shuffle
    # fewer bytes): the distinct used to run FIRST, shuffling every
    # candidate pair (~956k rows at sf0.1, each carrying both text
    # payloads) so that false candidates could be deduped before the
    # cheap bounded levenshtein discarded them anyway. Filtering first
    # is map-side, so only TRUE pairs (a few hundred rows) reach the
    # distinct's exchange. A pair sharing several variants verifies
    # once per shared variant (≤ L duplicates, O(k·L) each) — far
    # cheaper than shuffling every false candidate's strings. Same
    # rows out: distance is a pure function of (t_a, t_b), so
    # dedup-then-verify ≡ verify-then-dedup on (id_a, id_b, t_a, t_b).
    dist = F.levenshtein("t_a", "t_b", max_distance)
    return (
        cand.withColumn("distance", dist)
        .where(F.col("distance") >= 0)
        .distinct()
        .select("id_a", "id_b", "distance")
    )
