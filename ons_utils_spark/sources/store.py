"""Append-only partitioned delta stores — the shared durable layout
behind the incrementally-maintained sketches (Count-Min in
``operators/sketches.py``, Bloom in ``operators/corpus.py``).

One recipe, one layout: every delta lands under a ``batch_id=<id>``
partition directory (sentinel ``-1`` for batch callers); a streaming
replay statically overwrites exactly its own partition, making the
at-least-once ``foreachBatch`` contract effectively exactly-once for any
MERGEABLE delta type (cell sums, bit ORs). Loaders re-aggregate on read;
compaction is a rewrite with the loader's output (associativity makes
any compaction schedule equivalent).

LLM-data-pipeline extension (no reference twin — the reference's I/O
surface stops at CSV/Hive reads, SURVEY.md §2.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF, functions as F


def _root_level_data_files(path: str) -> "list[str]":
    """Data files sitting at the store ROOT (outside any ``batch_id=``
    partition directory) — the pre-r6 plain-append layout. Empty list if
    the path doesn't exist or holds only partition dirs + commit markers.

    Uses ``pyarrow.fs`` (public API — SURVEY §1.1 bars the
    ``spark._jvm``/``_jsc`` escape hatch, which is also absent under
    Spark Connect). ``FileSystem.from_uri`` resolves local paths,
    ``file://``, ``s3://``, ``hdfs://`` alike, matching the swap logic
    in :func:`ons_utils_spark.sources.write.merge_overwrite`.
    """
    from pyarrow import fs as pafs

    filesystem, resolved = pafs.FileSystem.from_uri(path)
    root = filesystem.get_file_info(resolved)
    if root.type == pafs.FileType.NotFound:
        return []
    offenders = []
    selector = pafs.FileSelector(resolved, recursive=False)
    for info in filesystem.get_file_info(selector):
        if info.type == pafs.FileType.Directory:
            continue
        if info.base_name.startswith(("_", ".")):
            continue
        offenders.append(info.base_name)
    return offenders


def partitioned_delta_append(
    delta: SparkDF,
    path: str,
    batch_id: "int | None" = None,
) -> None:
    """Write one batch's mergeable deltas into an append-only store.

    ``batch_id=None`` (batch caller): append under the sentinel
    partition ``batch_id=-1``. With ``batch_id`` (a ``foreachBatch``
    micro-batch id): REPLACE exactly that batch's partition via a static
    overwrite of ``<path>/batch_id=<id>/`` — a replayed checkpointed
    micro-batch replaces its own deltas instead of double-counting them
    (the standard idempotent-sink recipe). The overwrite is
    unconditional: a replay whose deltas come out EMPTY still truncates
    the partition, so stale rows from the first attempt cannot survive
    (dynamic-partition overwrite would have written nothing and left
    them in place).

    Raises if the store has root-level data files — the pre-r6 plain
    append layout. Mixing the two layouts corrupts partition discovery
    (root files and ``batch_id=`` dirs can't coexist in one parquet
    partition scheme), so a legacy store must be migrated ONCE before
    its first partitioned append: read it and rewrite through this
    function (merge-on-read makes the rewrite lossless)::

        legacy = spark.read.parquet(path).select(<delta columns>)
        partitioned_delta_append(legacy, new_path)   # lands at batch_id=-1

    ``delta`` must not itself contain a ``batch_id`` column, and a
    streaming ``batch_id`` must be non-negative (negative ids collide
    with the batch-caller sentinel partition ``batch_id=-1``, and the
    unconditional overwrite would silently destroy every accumulated
    batch-mode delta).
    """
    if "batch_id" in delta.columns:
        raise ValueError(
            "delta already has a 'batch_id' column — the store layout "
            "owns that name"
        )
    if batch_id is not None and int(batch_id) < 0:
        raise ValueError(
            f"batch_id must be >= 0 (got {batch_id}) — negative ids are "
            "reserved for the batch-caller sentinel partition batch_id=-1"
        )
    offenders = _root_level_data_files(path)
    if offenders:
        raise ValueError(
            f"store at {path!r} has {len(offenders)} root-level data "
            f"file(s) (e.g. {offenders[0]!r}) — a pre-partitioned-layout "
            "store. Migrate once before appending: read the legacy "
            "store, select the delta columns, and rewrite it through "
            "partitioned_delta_append at a fresh path (merge-on-read "
            "makes the rewrite lossless); then retire the legacy path."
        )
    if batch_id is None:
        (
            delta.withColumn("batch_id", F.lit(-1))
            .write.mode("append")
            .partitionBy("batch_id")
            .parquet(path)
        )
        return
    delta.write.mode("overwrite").parquet(f"{path}/batch_id={int(batch_id)}")


def compact_store(merged: SparkDF, path: str) -> None:
    """Rewrite a delta store as ONE merged delta — the maintenance half
    of the append-only contract.

    Long-running stores accumulate one partition directory per batch
    (a year of 5-minute micro-batches is ~10⁵ directories), and at some
    point partition DISCOVERY — not the merge-on-read aggregation —
    dominates load time. Because every delta type this layout stores is
    mergeable (cell sums, bit ORs), compaction is semantically free:
    pass the loader's output (``load_sketch`` / ``load_bloom``) and the
    store collapses to a single sentinel partition holding the same
    aggregate; associativity makes any compaction schedule equivalent.

    The rewrite stages next to the store and promotes via directory
    swap (the :func:`ons_utils_spark.sources.write.merge_overwrite`
    recipe) so a crash mid-compaction cannot leave a half-written
    store; readers between the delete and the move see a missing path,
    not corrupt data — documented non-atomic, like every plain-parquet
    swap in this repo (an ACID table format is the production answer).

    ``merged`` must be DERIVED FROM the store at ``path`` via the
    loader — the caller materializes it BEFORE the swap deletes its
    input (this function forces that with a local checkpoint if the
    plan is still lazy).
    """
    if "batch_id" in merged.columns:
        raise ValueError(
            "merged delta already has a 'batch_id' column — pass the "
            "loader's output, not the raw store read"
        )
    # Cut lineage BEFORE touching the directory the plan reads from:
    # a lazy plan re-scanned after the swap would read its own output
    # (or nothing). localCheckpoint materializes to executor storage.
    merged = merged.localCheckpoint(eager=True)
    staging = path.rstrip("/") + ".__compact_tmp"
    (
        merged.withColumn("batch_id", F.lit(-1))
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .parquet(staging)
    )
    from pyarrow import fs as pafs

    filesystem, dst = pafs.FileSystem.from_uri(path)
    _, src = pafs.FileSystem.from_uri(staging)
    filesystem.delete_dir(dst)
    try:
        filesystem.move(src, dst)
    except Exception as exc:
        raise IOError(
            f"compact_store: compacted store staged at {staging} but "
            f"promoting it to {path} failed — recover manually"
        ) from exc
