"""Python Data Source tests: schema, parallel partitions, partition-count
invariance, and source-side filter pushdown."""

import pytest
from pyspark.sql import functions as F

from ons_utils_spark.sources.pysource import (
    SyntheticDocsDataSource,
    SyntheticDocsReader,
)


@pytest.fixture(scope="module", autouse=True)
def registered(spark):
    spark.dataSource.register(SyntheticDocsDataSource)
    # The shared test session may predate the session-default flag.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")


def _read(spark, **options):
    reader = spark.read.format("synthetic_docs")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


class TestSyntheticDocsSource:
    def test_row_count_and_schema(self, spark):
        df = _read(spark, rows=500)
        assert df.count() == 500
        assert df.columns == ["doc_id", "text", "lang", "source", "n_chars"]
        row = df.where(F.col("doc_id") == 7).first()
        assert row["n_chars"] == len(row["text"])

    def test_partition_count_invariance(self, spark):
        a = sorted(_read(spark, rows=300, partitions=2).collect())
        b = sorted(_read(spark, rows=300, partitions=13).collect())
        assert a == b

    def test_reads_are_parallel(self, spark):
        df = _read(spark, rows=1000, partitions=6)
        parts = df.select(F.spark_partition_id().alias("p")).distinct().count()
        assert parts == 6

    def test_seed_changes_content_not_ids(self, spark):
        a = {r["doc_id"]: r["text"] for r in _read(spark, rows=100, seed=1).collect()}
        b = {r["doc_id"]: r["text"] for r in _read(spark, rows=100, seed=2).collect()}
        assert set(a) == set(b) == set(range(100))
        assert a != b

    def test_lang_filter_pushes_to_source(self, spark):
        """The reader object must receive and absorb the lang equality:
        unit-level check of pushFilters plus an end-to-end result match."""
        from pyspark.sql.datasource import EqualTo, GreaterThan

        reader = SyntheticDocsReader({"rows": "100"})
        remaining = list(
            reader.pushFilters(
                [EqualTo(("lang",), "en"), GreaterThan(("doc_id",), 10)]
            )
        )
        assert reader.eq == {"lang": "en"}
        assert [type(f).__name__ for f in remaining] == ["GreaterThan"]

        full = _read(spark, rows=400)
        pushed = _read(spark, rows=400).where(F.col("lang") == "en")
        expect = {r["doc_id"] for r in full.collect() if r["lang"] == "en"}
        assert {r["doc_id"] for r in pushed.collect()} == expect
        assert pushed.count() < 400  # the filter actually selects a subset


class TestSyntheticDocsStream:
    def test_checkpointed_runs_drain_stream_to_batch_equality(
        self, spark, tmp_path
    ):
        """Repeated availableNow runs against one checkpoint drain the
        capped stream incrementally (a simple stream reader snapshots one
        prefetched batch per run); the union of all micro-batches must
        equal the batch source's rows exactly — ids AND text."""
        from ons_utils_spark.sources.pysource import SyntheticDocsStreamDataSource

        spark.dataSource.register(SyntheticDocsStreamDataSource)
        out = str(tmp_path / "out")
        seen = 0
        for _ in range(5):  # 250 rows / 100-row batches → 3 effective runs
            stream = (
                spark.readStream.format("synthetic_docs_stream")
                .option("rows", 250)
                .option("rows_per_batch", 100)
                .load()
            )
            q = (
                stream.writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", str(tmp_path / "ckpt"))
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            n = spark.read.parquet(out).count()
            if n == seen:
                break
            seen = n
        got = {
            r["doc_id"]: r["text"]
            for r in spark.read.parquet(out).collect()
        }
        want = {
            r["doc_id"]: r["text"]
            for r in _read(spark, rows=250).collect()
        }
        assert got == want

    def test_replay_between_offsets_is_exact(self, spark):
        from ons_utils_spark.sources.pysource import SyntheticDocsStreamReader

        reader = SyntheticDocsStreamReader({"rows": "50", "rows_per_batch": "20"})
        rows1, off1 = reader.read(reader.initialOffset())
        first = list(rows1)
        assert off1 == {"next": 20} and len(first) == 20
        replay = list(reader.readBetweenOffsets({"next": 0}, {"next": 20}))
        assert replay == first
        # Capped: reading past the end yields nothing and a stable offset.
        rows_end, off_end = reader.read({"next": 50})
        assert list(rows_end) == [] and off_end == {"next": 50}


class TestManifestParquetWriter:
    def test_write_stages_files_and_commits_manifest(self, spark, tmp_path):
        import json
        import os

        from ons_utils_spark.sources.pysource import ManifestParquetDataSource

        spark.dataSource.register(ManifestParquetDataSource)
        out = str(tmp_path / "sink")
        df = spark.range(100).selectExpr("id", "id * 2 AS doubled").repartition(4)
        df.write.format("manifest_parquet").option("path", out).mode(
            "append"
        ).save()

        manifest = json.load(open(os.path.join(out, "_manifest.json")))
        assert manifest["total_rows"] == 100
        assert len(manifest["files"]) == 4
        listed = {f["path"] for f in manifest["files"]}
        on_disk = {p for p in os.listdir(out) if p.endswith(".parquet")}
        assert listed == on_disk  # manifest covers exactly the staged files

        back = spark.read.parquet(out)
        assert back.count() == 100
        assert {r["doubled"] for r in back.collect()} == {2 * i for i in range(100)}

    def test_missing_path_option_raises(self, spark, tmp_path):
        from ons_utils_spark.sources.pysource import ManifestParquetWriter

        with pytest.raises(ValueError, match="path"):
            ManifestParquetWriter({}, None)

    def test_empty_partitions_write_typed_files(self, spark, tmp_path):
        """A 0-row task must still stage a correctly-TYPED parquet file —
        a null-typed footer would break schema merge on read."""
        import os

        from ons_utils_spark.sources.pysource import ManifestParquetDataSource

        spark.dataSource.register(ManifestParquetDataSource)
        out = str(tmp_path / "sink2")
        # 2 rows over 8 partitions → at least 6 empty write tasks.
        df = spark.range(2).selectExpr("id", "CAST(id AS STRING) AS s").repartition(8)
        df.write.format("manifest_parquet").option("path", out).mode(
            "append"
        ).save()
        back = spark.read.parquet(out)
        assert back.count() == 2
        assert dict(back.dtypes) == {"id": "bigint", "s": "string"}

    def test_append_accumulates_and_commit_sweeps_orphans(self, spark, tmp_path):
        """Second append extends the manifest (first job's files survive);
        an unreported orphan part file is swept at commit."""
        import json
        import os

        from ons_utils_spark.sources.pysource import ManifestParquetDataSource

        spark.dataSource.register(ManifestParquetDataSource)
        out = str(tmp_path / "sink3")
        df1 = spark.range(10).selectExpr("id").repartition(2)
        df1.write.format("manifest_parquet").option("path", out).mode("append").save()
        # Simulate a crashed task's orphan: staged file, no commit message.
        orphan = os.path.join(out, "part-deadbeef.parquet")
        open(orphan, "wb").write(b"not a real parquet")
        df2 = spark.range(10, 25).selectExpr("id").repartition(2)
        df2.write.format("manifest_parquet").option("path", out).mode("append").save()

        manifest = json.load(open(os.path.join(out, "_manifest.json")))
        assert manifest["total_rows"] == 25
        assert not os.path.exists(orphan)
        back = spark.read.parquet(out)
        assert {r["id"] for r in back.collect()} == set(range(25))

    def test_torn_commit_never_exposes_partial_output(self, spark, tmp_path, monkeypatch):
        """Kill the driver at each dangerous point inside commit() and
        prove a manifest-following reader sees either the OLD generation
        or the NEW one — never a truncated manifest or a manifest whose
        files were already deleted.
        """
        import json
        import os

        from pyspark.sql.types import LongType, StructField, StructType

        from ons_utils_spark.sources.pysource import ManifestParquetWriter

        schema = StructType([StructField("id", LongType())])
        out = str(tmp_path / "sink_torn")

        def run_job(values, overwrite):
            w = ManifestParquetWriter({"path": out}, schema, overwrite=overwrite)
            msg = w.write(iter([(v,) for v in values]))
            w.commit([msg])
            return msg

        def read_via_manifest():
            manifest = json.load(open(os.path.join(out, "_manifest.json")))
            got = set()
            for f in manifest["files"]:
                p = os.path.join(out, f["path"])
                assert os.path.exists(p), f"manifest references deleted file {p}"
                got |= {r["id"] for r in spark.read.parquet(p).collect()}
            return got

        run_job([1, 2, 3], overwrite=False)
        assert read_via_manifest() == {1, 2, 3}

        # Crash 1: during the manifest swap — os.replace never happens.
        w2 = ManifestParquetWriter({"path": out}, schema, overwrite=True)
        msg2 = w2.write(iter([(10,), (11,)]))
        real_replace = os.replace
        monkeypatch.setattr(os, "replace", lambda *a: (_ for _ in ()).throw(OSError("crash")))
        with pytest.raises(OSError):
            w2.commit([msg2])
        monkeypatch.setattr(os, "replace", real_replace)
        # Old generation fully intact: manifest parses, files all present.
        assert read_via_manifest() == {1, 2, 3}

        # Crash 2: after the swap, mid-sweep — os.remove dies first call.
        w3 = ManifestParquetWriter({"path": out}, schema, overwrite=True)
        msg3 = w3.write(iter([(20,), (21,)]))
        monkeypatch.setattr(os, "remove", lambda *a: (_ for _ in ()).throw(OSError("crash")))
        with pytest.raises(OSError):
            w3.commit([msg3])
        monkeypatch.setattr(os, "remove", os.unlink)
        # New generation visible and complete; stale files are mere orphans.
        assert read_via_manifest() == {20, 21}

        # A clean retry converges: next overwrite commit sweeps everything.
        run_job([30], overwrite=True)
        assert read_via_manifest() == {30}
        on_disk = {p for p in os.listdir(out) if p.endswith(".parquet")}
        manifest = json.load(open(os.path.join(out, "_manifest.json")))
        assert on_disk == {f["path"] for f in manifest["files"]}

    def test_overwrite_replaces_previous_commit(self, spark, tmp_path):
        import json
        import os

        from ons_utils_spark.sources.pysource import ManifestParquetDataSource

        spark.dataSource.register(ManifestParquetDataSource)
        out = str(tmp_path / "sink4")
        spark.range(10).write.format("manifest_parquet").option("path", out).mode(
            "append"
        ).save()
        spark.range(100, 103).write.format("manifest_parquet").option(
            "path", out
        ).mode("overwrite").save()
        manifest = json.load(open(os.path.join(out, "_manifest.json")))
        assert manifest["total_rows"] == 3
        back = spark.read.parquet(out)
        assert {r["id"] for r in back.collect()} == {100, 101, 102}


class TestZeroRows:
    def test_zero_row_source_reads_empty(self, spark):
        df = _read(spark, rows=0)
        assert df.count() == 0
        assert df.columns[0] == "doc_id"
