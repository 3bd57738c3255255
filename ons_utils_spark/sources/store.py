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


def _resolve_fs(path: str):
    """``(pyarrow filesystem, resolved path)`` for ``path``.

    Public API only (SURVEY §1.1 bars the ``spark._jvm``/``_jsc`` escape
    hatch, which is also absent under Spark Connect). Bridges the two
    gaps between Hadoop path conventions and
    ``pyarrow.fs.FileSystem.from_uri``: the Hadoop S3 scheme aliases
    (``s3a://``/``s3n://``) map to pyarrow's ``s3://``, and RELATIVE
    local paths resolve to absolute (``from_uri`` rejects an empty
    scheme). Schemeless paths resolve against the LOCAL filesystem — on
    a cluster whose ``fs.defaultFS`` is HDFS, pass the full
    ``hdfs://namenode/...`` URI (pyarrow's HDFS support resolves it).
    """
    import os
    import re

    from pyarrow import fs as pafs

    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://", path)
    if m:
        scheme = m.group(1).lower()
        if scheme in ("s3a", "s3n"):
            path = "s3://" + path[len(m.group(0)):]
    else:
        path = os.path.abspath(path)
    return pafs.FileSystem.from_uri(path)


def _root_level_data_files(path: str) -> "list[str]":
    """Data files sitting at the store ROOT (outside any ``batch_id=``
    partition directory) — the pre-r6 plain-append layout. Empty list if
    the path doesn't exist or holds only partition dirs + commit markers.
    """
    from pyarrow import fs as pafs

    filesystem, resolved = _resolve_fs(path)
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


def compact_store(
    merged: SparkDF,
    path: str,
    partition_cols: "tuple[str, ...]" = ("batch_id",),
) -> None:
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

    The rewrite stages next to the store and promotes via RENAME-ASIDE
    (the :func:`ons_utils_spark.sources.write.compact_files` recipe, not
    delete-then-move): the live directory renames to ``<path>.__old``
    (metadata-only), the staged store renames in, then the aside
    deletes. A crash in any window leaves the data recoverable — this
    function repairs the debris of a previous crashed run on entry
    (aside present + store missing ⇒ restore the aside; both present ⇒
    the aside is superseded, delete it) — and a failed promotion rolls
    the original back. Still not ACID (a reader racing the two renames
    can see a missing path for one metadata-op window); an ACID table
    format is the production answer, as ``sources/write.py`` notes.

    ``merged`` must be DERIVED FROM the store at ``path`` via the
    loader — the caller materializes it BEFORE the swap moves its
    input (this function forces that with a local checkpoint if the
    plan is still lazy).

    ``partition_cols`` is the store's physical partitioning, always
    led by ``batch_id`` (the sentinel layout); stores with a second
    pruning level — the IVF×PQ serving table's ``__list`` — pass
    ``("batch_id", "__list")`` so the compacted rewrite keeps the
    probe-pruning directory structure.

    **Streaming replay caveat**: compaction folds every ``batch_id``
    partition into the sentinel, so a checkpointed ``foreachBatch``
    REPLAY of a compacted batch can no longer overwrite its own
    partition — it appends a second copy. For min/OR-merged stores
    (gram index, Bloom) that is harmless (idempotent merge); for
    SUM-merged stores (Count-Min cells) it double-counts. Compact a
    Count-Min store only while its streaming writer is stopped and its
    checkpoint has advanced past every batch being compacted.
    """
    from pyarrow import fs as pafs

    if "batch_id" in merged.columns:
        raise ValueError(
            "merged delta already has a 'batch_id' column — pass the "
            "loader's output, not the raw store read"
        )
    filesystem, dst = _resolve_fs(path)
    aside = dst.rstrip("/") + ".__old"
    # Repair debris from a previous crashed compaction FIRST.
    if filesystem.get_file_info(aside).type != pafs.FileType.NotFound:
        if filesystem.get_file_info(dst).type == pafs.FileType.NotFound:
            filesystem.move(aside, dst)  # crashed between renames
        else:
            filesystem.delete_dir(aside)  # crashed before cleanup
    # Fail BEFORE the staged rewrite: moving a missing live store would
    # otherwise surface as an opaque pyarrow error only after the
    # staging directory was fully written (and left behind).
    if filesystem.get_file_info(dst).type == pafs.FileType.NotFound:
        raise ValueError(
            f"store does not exist at {path!r} — compact_store rewrites "
            "an existing delta store; create it with an append first"
        )
    # Cut lineage BEFORE touching the directory the plan reads from:
    # a lazy plan re-scanned after the swap would read its own output
    # (or nothing). localCheckpoint materializes to executor storage.
    if partition_cols[:1] != ("batch_id",):
        raise ValueError(
            f"partition_cols must lead with 'batch_id' (got "
            f"{partition_cols!r}) — the sentinel layout is the store "
            "contract"
        )
    merged = merged.localCheckpoint(eager=True)
    staging = path.rstrip("/") + ".__compact_tmp"
    (
        merged.withColumn("batch_id", F.lit(-1))
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(staging)
    )
    _, src = _resolve_fs(staging)
    filesystem.move(dst, aside)
    try:
        filesystem.move(src, dst)
    except Exception as exc:
        try:
            filesystem.move(aside, dst)
            recovered = "original store restored"
        except Exception:  # noqa: BLE001
            recovered = f"original preserved at {aside} — recover manually"
        raise IOError(
            f"compact_store: compacted store staged at {staging} but "
            f"promoting it to {path} failed — {recovered}"
        ) from exc
    filesystem.delete_dir(aside)
