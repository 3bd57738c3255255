"""URL canonicalization / dedup tests (operators/web.py)."""

import pytest

from ons_utils_spark.operators.web import canonicalize_url, url_dedup


def _canon(spark, url):
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(canonicalize_url("url").alias("c")).collect()[0]["c"]


class TestCanonicalizeUrl:
    @pytest.mark.parametrize(
        "raw, expected",
        [
            # scheme + host lowercase, path case preserved
            ("HTTP://Ex.COM/Path", "http://ex.com/Path"),
            # www. stripped
            ("https://www.ex.com/a", "https://ex.com/a"),
            ("https://WWW.ex.com/a", "https://ex.com/a"),
            # default ports stripped; explicit ports kept
            ("http://ex.com:80/a", "http://ex.com/a"),
            ("https://ex.com:443/a", "https://ex.com/a"),
            ("http://ex.com:8080/a", "http://ex.com:8080/a"),
            ("https://ex.com:80/a", "https://ex.com:80/a"),
            # fragment stripped
            ("https://ex.com/a#sec2", "https://ex.com/a"),
            # tracking params dropped, remainder sorted
            (
                "https://ex.com/a?utm_source=x&b=2&a=1&ref=feed",
                "https://ex.com/a?a=1&b=2",
            ),
            ("https://ex.com/a?gclid=99&fbclid=7", "https://ex.com/a"),
            # bare `ref` (no =) dropped; `referrer=` kept (prefix must not
            # over-match)
            ("https://ex.com/a?ref&referrer=z", "https://ex.com/a?referrer=z"),
            # trailing slashes stripped
            ("https://ex.com/a/", "https://ex.com/a"),
            ("https://ex.com/a//", "https://ex.com/a"),
            ("https://ex.com/", "https://ex.com"),
            # '?' inside a value is data, not a second delimiter
            ("https://ex.com/a?q=x?y", "https://ex.com/a?q=x?y"),
            # whitespace trimmed
            ("  https://ex.com/a ", "https://ex.com/a"),
            # no scheme: authority rules don't apply, query rules do
            ("not a url?utm_source=x", "not a url"),
        ],
    )
    def test_contract(self, spark, raw, expected):
        assert _canon(spark, raw) == expected

    def test_plan_is_python_free(self, spark):
        df = spark.createDataFrame([("https://x.com/a",)], "url string")
        plan = df.select(
            canonicalize_url("url")
        )._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan


class TestUrlDedup:
    def test_min_id_wins_and_counts(self, spark):
        df = spark.createDataFrame(
            [
                (3, "https://ex.com/a?utm_source=x"),
                (1, "HTTP://other.com/b"),
                (2, "https://www.ex.com/a"),
            ],
            "id long, url string",
        )
        rows = {
            r["id"]: r
            for r in url_dedup(df, "url", "id").collect()
        }
        assert set(rows) == {1, 2}
        assert rows[2]["n_dupes"] == 2
        assert rows[2]["canonical_url"] == "https://ex.com/a"
        assert rows[1]["n_dupes"] == 1

    def test_original_columns_kept(self, spark):
        df = spark.createDataFrame(
            [(1, "https://ex.com/a", "en")], "id long, url string, lang string"
        )
        out = url_dedup(df, "url", "id")
        assert set(out.columns) == {
            "id", "url", "lang", "canonical_url", "n_dupes"
        }
        assert out.collect()[0]["lang"] == "en"


class TestDomainFilter:
    """domain_filter — suffix-matched block/allow lists, the first-pass
    crawl filter (blocking example.com must block every subdomain)."""

    def _frames(self, spark):
        rows = [
            (1, "https://spam.example.com/page"),
            (2, "https://example.com/root"),
            (3, "https://notexample.com/safe"),       # NOT a subdomain
            (4, "http://user:pw@deep.a.example.com:8080/x"),
            (5, "https://other.org/fine"),
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, url string")
        block = spark.createDataFrame([("example.com",)], "domain string")
        return df, block

    def test_block_drops_domain_and_subdomains_only(self, spark):
        from ons_utils_spark.operators.web import domain_filter

        df, block = self._frames(spark)
        kept = {r["doc_id"] for r in domain_filter(df, "url", block, "doc_id").collect()}
        assert kept == {3, 5}

    def test_allow_is_the_complement(self, spark):
        from ons_utils_spark.operators.web import domain_filter

        df, block = self._frames(spark)
        kept = {
            r["doc_id"]
            for r in domain_filter(df, "url", block, "doc_id", mode="allow").collect()
        }
        assert kept == {1, 2, 4}

    def test_suffix_semantics(self, spark):
        from pyspark.sql import functions as F

        from ons_utils_spark.operators.web import domain_suffixes, url_host

        row = (
            spark.createDataFrame(
                [("http://u@a.b.example.com:8080/x?q=1",)], "url string"
            )
            .select(
                url_host("url").alias("h"),
                domain_suffixes(url_host("url")).alias("s"),
            )
            .collect()[0]
        )
        assert row["h"] == "a.b.example.com"
        assert list(row["s"]) == [
            "a.b.example.com", "b.example.com", "example.com", "com",
        ]

    def test_broadcast_and_no_corpus_shuffle(self, spark):
        from ons_utils_spark.operators.web import domain_filter

        df, block = self._frames(spark)
        plan = (
            domain_filter(df, "url", block, "doc_id")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_mode_validation(self, spark):
        import pytest as _pytest

        from ons_utils_spark.operators.web import domain_filter

        df, block = self._frames(spark)
        with _pytest.raises(ValueError, match="mode"):
            domain_filter(df, "url", block, "doc_id", mode="deny")


class TestDomainFilterMalformedUrls:
    def test_hostless_urls_do_not_crash_and_are_not_blocked(self, spark):
        """A schemeless/malformed URL has no host — it must pass a
        blocklist untouched (empty suffix array), not abort the job
        (sequence(1,0) is descending in Spark; the slice would throw)."""
        from ons_utils_spark.operators.web import domain_filter

        df = spark.createDataFrame(
            [
                (1, "not-a-url"),
                (2, "example.com/no-scheme"),
                (3, "mailto:user@example.com"),
                (4, "https://spam.example.com/x"),
            ],
            "doc_id bigint, url string",
        )
        block = spark.createDataFrame([("example.com",)], "domain string")
        kept = {
            r["doc_id"]
            for r in domain_filter(df, "url", block, "doc_id").collect()
        }
        assert kept == {1, 2, 3}
