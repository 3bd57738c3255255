"""File-based media ingestion — the missing first mile of the multimodal
pipeline (``operators/multimodal.py`` starts from a ``payload`` binary
column; this module produces that column from real files).

Built on Spark's built-in ``binaryFile`` source (JVM-side directory
listing, predicate-pushdown on path/length/modificationTime, streaming-
capable via ``readStream`` with the same schema) — no Python in the scan
path. LLM-data-pipeline extension (the reference's I/O surface stops at
CSV/Hive reads, SURVEY.md §2.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF, SparkSession, functions as F


def read_media_dir(
    spark: SparkSession,
    path: str,
    glob: "str | None" = None,
    max_bytes: "int | None" = None,
    id_from: str = "path_hash",
) -> SparkDF:
    """Read a directory of media files → ``(doc_id, path, length,
    mod_time, payload)``.

    ``glob`` filters filenames JVM-side (``pathGlobFilter`` — pruned at
    listing time, unmatched files are never opened); ``max_bytes``
    pushes a length predicate into the scan (``binaryFile`` supports
    length/path pushdown), protecting executors from a stray
    multi-gigabyte file inflating one task. ``id_from``:

    - ``"path_hash"`` (default): ``xxhash64(path)`` — deterministic,
      join-ready 64-bit id independent of listing order (content-change
      detection belongs to ``mod_time``/``payload_meta``, not the id).
    - ``"path"``: keep the path string itself as ``doc_id``.

    The payload column feeds :func:`ons_utils_spark.operators.multimodal.
    decode_image` / ``payload_meta`` / ``extract_features`` unchanged.
    At 100 TB the pattern is the same read with ``readStream`` +
    ``maxFilesPerTrigger`` so shards decode incrementally as they land.
    """
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.where(F.col("length") <= max_bytes)
    if id_from == "path_hash":
        doc_id = F.xxhash64("path")
    elif id_from == "path":
        doc_id = F.col("path")
    else:
        raise ValueError(f"id_from must be 'path_hash' or 'path', got {id_from!r}")
    return df.select(
        doc_id.alias("doc_id"),
        "path",
        "length",
        F.col("modificationTime").alias("mod_time"),
        F.col("content").alias("payload"),
    )
