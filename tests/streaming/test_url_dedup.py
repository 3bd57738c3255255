"""Streaming URL dedup: canonicalize_url + stateful keep-first dedup.

The crawl-frontier composition: an ingest stream of fetched pages dedups
on the CANONICAL URL, so textually-distinct re-fetches (tracking params,
www., default ports, param order) collapse to one kept row — state
persists across checkpointed runs like any keyed streaming dedup.
"""

from ons_utils_spark.operators.web import canonicalize_url
from ons_utils_spark.streaming.windows import read_stream, stateful_dedup_stream

SCHEMA = "page_id long, url string"


class TestStreamingUrlDedup:
    def test_canonical_dedup_across_two_runs(self, spark, tmp_path):
        src = str(tmp_path / "src")
        sink = str(tmp_path / "sink")
        ckpt = str(tmp_path / "ckpt")

        batch1 = spark.createDataFrame(
            [
                (1, "https://ex.com/a?utm_source=x"),
                (2, "HTTP://other.com/b"),
                # same-batch duplicate of page 1's canonical form
                (3, "https://www.ex.com/a"),
            ],
            SCHEMA,
        )
        batch1.coalesce(1).write.mode("append").parquet(src)

        def run_once():
            stream = read_stream(spark, src, SCHEMA).withColumn(
                "canonical_url", canonicalize_url("url")
            )
            deduped = stateful_dedup_stream(stream, key_col="canonical_url")
            q = (
                deduped.writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run_once()
        rows = spark.read.parquet(sink).collect()
        assert {r["canonical_url"] for r in rows} == {
            "https://ex.com/a",
            "http://other.com/b",
        }
        assert len(rows) == 2

        # Second run: canonical duplicate of page 1 again (new variant),
        # plus a genuinely new page.
        batch2 = spark.createDataFrame(
            [
                (4, "https://ex.com:443/a#frag"),
                (5, "https://new.com/c"),
            ],
            SCHEMA,
        )
        batch2.coalesce(1).write.mode("append").parquet(src)
        run_once()
        rows = spark.read.parquet(sink).collect()
        assert len(rows) == 3  # the re-fetch stayed dropped across runs
        assert {r["canonical_url"] for r in rows} == {
            "https://ex.com/a",
            "http://other.com/b",
            "https://new.com/c",
        }
        # the kept ex.com/a row is from the FIRST run, not the re-fetch
        kept = [r for r in rows if r["canonical_url"] == "https://ex.com/a"]
        assert kept[0]["page_id"] in (1, 3)
