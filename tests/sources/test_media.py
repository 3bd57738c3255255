"""File-based media ingestion (sources/media.py::read_media_dir) — the
binaryFile first mile into the multimodal operators."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from operators.test_multimodal import make_bmp, make_png  # noqa: E402


def _write_files(tmp_path):
    pixels = [[(255, 0, 0), (0, 255, 0)], [(1, 2, 3), (4, 5, 6)]]
    (tmp_path / "a.png").write_bytes(make_png(2, 2, pixels))
    (tmp_path / "b.bmp").write_bytes(make_bmp(2, 2, pixels))
    (tmp_path / "notes.txt").write_text("not media")
    return pixels


class TestReadMediaDir:
    def test_reads_payloads_with_stable_ids(self, spark, tmp_path):
        from ons_utils_spark.sources.media import read_media_dir

        _write_files(tmp_path)
        df = read_media_dir(spark, str(tmp_path))
        rows = {r["path"].rsplit("/", 1)[-1]: r for r in df.collect()}
        assert set(rows) == {"a.png", "b.bmp", "notes.txt"}
        assert rows["a.png"]["length"] == len(bytes(rows["a.png"]["payload"]))
        # ids deterministic across reads
        again = {
            r["path"].rsplit("/", 1)[-1]: r["doc_id"]
            for r in read_media_dir(spark, str(tmp_path)).collect()
        }
        assert {k: r["doc_id"] for k, r in rows.items()} == again

    def test_glob_prunes_at_listing_time(self, spark, tmp_path):
        from ons_utils_spark.sources.media import read_media_dir

        _write_files(tmp_path)
        df = read_media_dir(spark, str(tmp_path), glob="*.png")
        assert [r["path"].rsplit("/", 1)[-1] for r in df.collect()] == ["a.png"]

    def test_max_bytes_filters(self, spark, tmp_path):
        from ons_utils_spark.sources.media import read_media_dir

        _write_files(tmp_path)
        small = read_media_dir(spark, str(tmp_path), max_bytes=10)
        assert [r["path"].rsplit("/", 1)[-1] for r in small.collect()] == [
            "notes.txt"
        ]

    def test_end_to_end_decode_from_files(self, spark, tmp_path):
        """Real files on disk → binaryFile scan → magic-byte dispatched
        decode — the full multimodal first mile."""
        from ons_utils_spark.operators.multimodal import decode_image
        from ons_utils_spark.sources.media import read_media_dir

        _write_files(tmp_path)
        media = read_media_dir(spark, str(tmp_path), glob="*.{png,bmp}")
        decoded = decode_image(media, fake=False).collect()
        assert len(decoded) == 2
        for r in decoded:
            assert (r["width"], r["height"], r["channels"]) == (2, 2, 3)
            assert list(r["pixels"])[:6] == [255, 0, 0, 0, 255, 0]

    def test_id_from_path(self, spark, tmp_path):
        from ons_utils_spark.sources.media import read_media_dir

        _write_files(tmp_path)
        df = read_media_dir(spark, str(tmp_path), glob="*.txt", id_from="path")
        assert df.collect()[0]["doc_id"].endswith("notes.txt")
