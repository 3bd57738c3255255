"""The shared append-only partitioned delta store
(``sources/store.py::partitioned_delta_append``) — the one write recipe
behind the Count-Min store (``operators/sketches.py``) and the Bloom
store (``operators/corpus.py``). Replay/accumulation semantics are also
covered end-to-end through those callers
(``tests/operators/test_sketches.py::TestDurableStore``,
``tests/streaming/``); this file pins the helper's own contract:
layouts, guards, and the legacy-store raise."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ons_utils_spark.sources.store import partitioned_delta_append


@pytest.fixture()
def delta(spark):
    return spark.createDataFrame([(0, 7), (1, 9)], "word bigint, bits bigint")


class TestLayout:
    def test_batch_caller_lands_under_sentinel_partition(
        self, spark, delta, tmp_path
    ):
        path = str(tmp_path / "store")
        partitioned_delta_append(delta, path)
        assert (tmp_path / "store" / "batch_id=-1").is_dir()
        got = spark.read.parquet(path)
        assert got.count() == 2
        assert set(got.select("batch_id").distinct().toPandas()["batch_id"]) == {-1}

    def test_streaming_caller_lands_under_its_own_partition(
        self, spark, delta, tmp_path
    ):
        path = str(tmp_path / "store")
        partitioned_delta_append(delta, path, batch_id=3)
        assert (tmp_path / "store" / "batch_id=3").is_dir()
        assert spark.read.parquet(path).count() == 2

    def test_replay_replaces_only_its_own_partition(self, spark, delta, tmp_path):
        path = str(tmp_path / "store")
        partitioned_delta_append(delta, path)  # sentinel
        partitioned_delta_append(delta, path, batch_id=0)
        # replay batch 0 with HALF the rows — batch 0 shrinks, sentinel intact
        partitioned_delta_append(delta.limit(1), path, batch_id=0)
        got = spark.read.parquet(path)
        assert got.where(F.col("batch_id") == 0).count() == 1
        assert got.where(F.col("batch_id") == -1).count() == 2

    def test_empty_replay_truncates_the_partition(self, spark, delta, tmp_path):
        path = str(tmp_path / "store")
        partitioned_delta_append(delta, path, batch_id=5)
        partitioned_delta_append(delta.limit(0), path, batch_id=5)
        assert spark.read.parquet(path).count() == 0


class TestGuards:
    def test_delta_may_not_carry_a_batch_id_column(self, spark, delta, tmp_path):
        poisoned = delta.withColumn("batch_id", F.lit(9))
        with pytest.raises(ValueError, match="batch_id"):
            partitioned_delta_append(poisoned, str(tmp_path / "store"))

    def test_negative_batch_id_is_reserved(self, spark, delta, tmp_path):
        """batch_id=-1 is the batch-caller sentinel; a streaming caller
        passing a negative id would unconditionally overwrite it and
        silently destroy every accumulated batch-mode delta."""
        with pytest.raises(ValueError, match="reserved"):
            partitioned_delta_append(delta, str(tmp_path / "store"), batch_id=-1)

    def test_legacy_root_level_store_raises_before_corruption(
        self, spark, delta, tmp_path
    ):
        """A pre-partitioned-layout store (plain appends → data files at
        the root) must be rejected: mixing root files with batch_id=
        dirs corrupts partition discovery."""
        path = str(tmp_path / "legacy")
        delta.write.mode("append").parquet(path)  # legacy plain append
        with pytest.raises(ValueError, match="root-level"):
            partitioned_delta_append(delta, path)

    def test_commit_markers_do_not_trip_the_legacy_guard(
        self, spark, delta, tmp_path
    ):
        """_SUCCESS / dotfiles at the root are commit markers, not data —
        a healthy partitioned store keeps accepting appends."""
        path = str(tmp_path / "store")
        partitioned_delta_append(delta, path)  # writes _SUCCESS at root
        assert (tmp_path / "store" / "_SUCCESS").exists()
        partitioned_delta_append(delta, path, batch_id=0)
        got = spark.read.parquet(path)
        assert got.count() == 4

    def test_missing_path_is_a_fresh_store(self, spark, delta, tmp_path):
        partitioned_delta_append(delta, str(tmp_path / "brand_new"))
        assert spark.read.parquet(str(tmp_path / "brand_new")).count() == 2


class TestCompaction:
    """compact_store — the maintenance half: a long-running store's
    per-batch partition dirs collapse to one sentinel partition holding
    the loader's merged aggregate (mergeable deltas make any compaction
    schedule equivalent)."""

    def _filled_sketch(self, spark, tmp_path, n_batches=4):
        from ons_utils_spark.operators.sketches import sketch_append_batch

        path = str(tmp_path / "sk")
        for b in range(n_batches):
            batch = spark.createDataFrame(
                [(b * 10 + i,) for i in range(20)], "k bigint"
            )
            sketch_append_batch(batch, "k", path, 4, 256, batch_id=b)
        return path

    def test_compaction_preserves_the_sketch(self, spark, tmp_path):
        from ons_utils_spark.operators.sketches import load_sketch
        from ons_utils_spark.sources.store import compact_store

        path = self._filled_sketch(spark, tmp_path)
        before = sorted(map(tuple, load_sketch(spark, path).collect()))
        compact_store(load_sketch(spark, path), path)
        after = sorted(map(tuple, load_sketch(spark, path).collect()))
        assert after == before
        # one partition directory left, holding the merged cells
        parts = [
            p.name
            for p in (tmp_path / "sk").iterdir()
            if p.name.startswith("batch_id=")
        ]
        assert parts == ["batch_id=-1"]

    def test_missing_store_raises_before_staging(self, spark, tmp_path):
        """Compacting a never-created store fails up front with a clear
        error — not an opaque pyarrow move() failure after the staged
        rewrite was already written and left behind."""
        import pytest

        from ons_utils_spark.sources.store import compact_store

        merged = spark.createDataFrame([(1, 2)], "a int, b int")
        missing = str(tmp_path / "never_created")
        with pytest.raises(ValueError, match="store does not exist"):
            compact_store(merged, missing)
        assert not (tmp_path / "never_created.__compact_tmp").exists()

    def test_store_keeps_accepting_appends_after_compaction(
        self, spark, tmp_path
    ):
        from ons_utils_spark.operators.sketches import (
            count_min_build,
            load_sketch,
            sketch_append_batch,
        )
        from ons_utils_spark.sources.store import compact_store

        path = self._filled_sketch(spark, tmp_path, n_batches=2)
        compact_store(load_sketch(spark, path), path)
        extra = spark.createDataFrame([(999,)] * 5, "k bigint")
        sketch_append_batch(extra, "k", path, 4, 256, batch_id=7)
        got = sorted(map(tuple, load_sketch(spark, path).collect()))
        everything = spark.createDataFrame(
            [(b * 10 + i,) for b in range(2) for i in range(20)]
            + [(999,)] * 5,
            "k bigint",
        )
        want = sorted(
            map(tuple, count_min_build(everything, "k", 4, 256).collect())
        )
        assert got == want

    def test_compaction_preserves_the_bloom_filter(self, spark, tmp_path):
        from ons_utils_spark.operators.corpus import (
            bloom_append_batch,
            load_bloom,
        )
        from ons_utils_spark.sources.store import compact_store

        path = str(tmp_path / "bloom")
        for b in range(3):
            docs = spark.createDataFrame(
                [(i, f"tok{b} tok{b + 1} tok{i}") for i in range(10)],
                "id bigint, text string",
            )
            bloom_append_batch(docs, "text", path, m_bits=4096, batch_id=b)
        before = sorted(map(tuple, load_bloom(spark, path).collect()))
        compact_store(load_bloom(spark, path), path)
        after = sorted(map(tuple, load_bloom(spark, path).collect()))
        assert after == before

    def test_rejects_raw_store_reads(self, spark, tmp_path):
        """Passing the raw partitioned read (still carrying batch_id)
        instead of the loader's merged output must raise — compacting
        unmerged deltas under one partition would be fine semantically
        but the batch_id column would collide with the layout's."""
        import pytest as _pytest

        from ons_utils_spark.sources.store import compact_store

        path = self._filled_sketch(spark, tmp_path, n_batches=2)
        raw = spark.read.parquet(path)
        with _pytest.raises(ValueError, match="loader"):
            compact_store(raw, path)


class TestCompactionCrashSafety:
    """The rename-aside promotion recipe (shared with compact_files):
    crash debris from a previous compaction is repaired on entry instead
    of wedging or losing the store."""

    def _store(self, spark, tmp_path):
        delta = spark.createDataFrame(
            [(0, 7), (1, 9)], "word bigint, bits bigint"
        )
        path = str(tmp_path / "store")
        partitioned_delta_append(delta, path)
        return path, delta

    def test_recovers_crash_between_renames(self, spark, tmp_path):
        """Aside present + store missing = the aside IS the live store."""
        import shutil

        from ons_utils_spark.sources.store import compact_store

        path, delta = self._store(spark, tmp_path)
        before = sorted(map(tuple, spark.read.parquet(path).collect()))
        shutil.move(path, path + ".__old")  # simulate the crash window
        compact_store(
            spark.createDataFrame([(0, 7), (1, 9)], "word bigint, bits bigint"),
            path,
        )
        got = spark.read.parquet(path)
        assert sorted(
            map(tuple, got.select("word", "bits").collect())
        ) == [(0, 7), (1, 9)]
        assert not (tmp_path / "store.__old").exists()

    def test_clears_superseded_aside(self, spark, tmp_path):
        """Aside AND store present = crash after promotion; the aside is
        stale and must not block the next compaction."""
        import shutil

        from ons_utils_spark.sources.store import compact_store

        path, delta = self._store(spark, tmp_path)
        shutil.copytree(path, path + ".__old")
        compact_store(delta, path)
        assert spark.read.parquet(path).count() == 2
        assert not (tmp_path / "store.__old").exists()

    def test_relative_local_path_resolves(self):
        """pyarrow's from_uri rejects empty-scheme relatives; the
        resolver must absolutize them instead of crashing (callers
        should still prefer absolute paths — the JVM write side
        resolves relatives against ITS working dir, which can differ
        from Python's after an os.chdir)."""
        import os

        from pyarrow import fs as pafs

        from ons_utils_spark.sources.store import _resolve_fs

        filesystem, resolved = _resolve_fs("some/rel_store")
        assert isinstance(filesystem, pafs.LocalFileSystem)
        assert resolved == os.path.abspath("some/rel_store")

    def test_s3a_alias_maps_to_pyarrow_s3(self):
        from ons_utils_spark.sources.store import _resolve_fs

        try:
            filesystem, resolved = _resolve_fs("s3a://bucket/key/path")
        except OSError:
            import pytest as _pytest

            _pytest.skip("no S3 region resolution in this environment")
        assert resolved == "bucket/key/path"
