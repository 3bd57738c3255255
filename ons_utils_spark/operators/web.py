"""Web-corpus operators: URL canonicalization and URL-keyed dedup.

Web-crawl pipelines dedup pages by URL before any content hashing — the
same page is typically fetched under many textually-distinct URLs (scheme
case, ``www.`` prefix, default ports, tracking query params, param order,
fragments). Canonicalizing first removes the bulk of exact re-fetches for
the cost of a row-local string expression, long before the (much more
expensive) content-hash or near-dup passes run.

Everything here is a pure Catalyst expression — zero Python, zero shuffle;
the only shuffle in :func:`url_dedup` is the final keep-one-per-key
aggregate on the (already short) canonical URL. At 100 TB this is the
cheapest dedup stage by far and always runs first.

The canonicalization contract (documented here because downstream dedup
keys on its exact output):

1. trim; strip the ``#fragment``;
2. lowercase the scheme and authority (host/port) — NOT the path or query,
   which are case-sensitive per RFC 3986;
3. drop a leading ``www.`` host label;
4. drop default ports (``:80`` for http, ``:443`` for https);
5. drop tracking query parameters (``utm_*``, ``gclid``, ``fbclid``,
   ``ref``) and sort the surviving parameters byte-lexicographically
   (RFC 3986 declares no query-order semantics; sorting makes param order
   canonical);
6. strip trailing slashes from the path;
7. re-assemble, omitting ``?`` when no parameters survive.
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import Column, DataFrame as SparkDF, functions as F

from ons_utils_spark.operators.general import convert_to_spark_col as _col

#: Query parameters dropped by canonicalization: the common client-side
#: tracking params that never change server-side content.
TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|ref)(=|$)"


def canonicalize_url(url: Union[str, Column]) -> Column:
    """Canonical form of ``url`` per the module contract — a Column.

    Row-local Catalyst expression (regexps + one array sort); safe in any
    hot path. Malformed input degrades gracefully: a string with no
    ``scheme://authority`` prefix passes through steps 5-7 only (its
    "authority" is empty, so nothing is lowercased away).
    """
    u = F.regexp_replace(F.trim(_col(url)), "#.*$", "")
    # scheme://authority — the case-insensitive part (RFC 3986 §6.2.2.1).
    pre = F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*)", 1)
    rest = F.substring(u, F.length(pre) + 1, F.length(u))
    pre = F.lower(pre)
    pre = F.regexp_replace(pre, r"://www\.", "://")
    pre = F.regexp_replace(pre, r"^(http://[^/?#:]*):80$", r"$1")
    pre = F.regexp_replace(pre, r"^(https://[^/?#:]*):443$", r"$1")

    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.regexp_replace(path, "/+$", "")
    # Everything after the FIRST '?' — a '?' later in the string is part
    # of the query value, not a second delimiter (RFC 3986 allows it raw).
    query = F.when(
        F.instr(rest, "?") > 0,
        rest.substr(F.instr(rest, "?") + 1, F.length(rest)),
    ).otherwise(F.lit(""))

    params = F.sort_array(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qs = F.array_join(params, "&")
    return F.concat(
        pre,
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )


def url_dedup(
    df: SparkDF,
    url_col: str,
    id_col: str,
    canonical_col: str = "canonical_url",
) -> SparkDF:
    """Keep one row per canonical URL — the smallest ``id_col`` wins.

    Returns the kept rows with ``canonical_col`` appended plus ``n_dupes``
    (how many input rows collapsed into this one; 1 = unique). One shuffle,
    keyed on the canonical URL string. At crawl scale the canonical URL is
    a short key and near-unique, so the aggregate is skew-free; pages
    crawled millions of times (front pages) are exactly the rows this
    collapses, and a single hot key still fits one task's aggregation
    buffer because only (min_id, count) is carried — the row payload is
    re-attached by the id join afterwards.
    """
    tagged = df.withColumn(canonical_col, canonicalize_url(url_col))
    keepers = tagged.groupBy(canonical_col).agg(
        F.min(id_col).alias(id_col),
        F.count(F.lit(1)).alias("n_dupes"),
    )
    # Join on BOTH (id, canonical): with id alone, an id that is the min
    # for canonical A but also appears on a row with canonical B would
    # re-attach the B row to A's keeper — duplicate canonicals would
    # survive mislabeled. The composite key needs no id-uniqueness
    # assumption.
    return tagged.join(keepers, [id_col, canonical_col], "inner")


def url_host(url: Union[str, Column]) -> Column:
    """The lowercased host of ``url`` (authority minus userinfo and
    port) — the key a domain blocklist matches on. Empty string for
    strings with no ``scheme://authority`` prefix."""
    auth = F.regexp_extract(
        _col(url), r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]*)", 1
    )
    # userinfo@host:port → host
    host = F.regexp_replace(auth, r"^.*@", "")
    host = F.regexp_replace(host, r":\d+$", "")
    return F.lower(host)


def domain_suffixes(host: Union[str, Column]) -> Column:
    """All registrable suffixes of a host, longest first:
    ``a.b.example.com`` → ``[a.b.example.com, b.example.com,
    example.com, com]``. A blocklist entry blocks a host iff it appears
    in this array — the standard suffix-match semantics (blocking
    ``example.com`` must block every subdomain). Row-local (hosts have
    a handful of labels); empty host → empty array."""
    parts = F.filter(F.split(_col(host), r"\."), lambda p: p != "")
    n = F.size(parts)
    # Guarded: Spark's sequence(1, 0) is DESCENDING ([1, 0]) and the
    # resulting slice(parts, 0, 0) throws INVALID_PARAMETER_VALUE — the
    # same pitfall corpus.py guards on empty docs. An empty host
    # (schemeless/malformed URL) must yield an empty array, not abort
    # the job.
    return F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.array_join(F.slice(parts, i, n), "."),
        ),
    ).otherwise(F.array().cast("array<string>"))


def domain_filter(
    df: SparkDF,
    url_col: str,
    domains: SparkDF,
    id_col: str,
    mode: str = "block",
) -> SparkDF:
    """Filter rows by a domain list with SUFFIX matching: ``mode=
    "block"`` drops every row whose URL host is the listed domain or
    any subdomain of it; ``mode="allow"`` keeps only those.

    ``domains`` is a one-column DataFrame of lowercase domains (column
    name ``domain``); ``id_col`` must identify rows (the hit set joins
    back on it). Scale: a slim ``(id, suffix)`` projection explodes
    each host to its ≤ ~10 suffixes and EQUI-semi-joins the broadcast
    domain list map-side — an ``array_contains`` join predicate would
    be a BroadcastNestedLoopJoin, |corpus| × |blocklist| comparisons,
    catastrophic at the 10⁴-10⁶ entries real blocklists have. The
    matched-id set (the blocked minority of a real crawl) then
    anti/semi-joins the full rows; AQE turns that join broadcast at
    runtime when the hit set is small, and the exploded branch carries
    only the id + a short string, never the payload columns.
    """
    if mode not in ("block", "allow"):
        raise ValueError(f"mode must be 'block' or 'allow', got {mode!r}")
    suffixes = domain_suffixes(url_host(F.col(url_col)))
    sfx_rows = df.select(
        F.col(id_col).alias("__id"), F.explode(suffixes).alias("__sfx")
    )
    hits = (
        sfx_rows.join(
            F.broadcast(domains.select(F.col("domain").alias("__sfx"))),
            "__sfx",
            "left_semi",
        )
        .select("__id")
        .distinct()
    )
    return df.join(
        hits,
        df[id_col] == hits["__id"],
        "left_semi" if mode == "allow" else "left_anti",
    )
