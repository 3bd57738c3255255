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


def read_two_stores(spark, path_a: str, schema_a, path_b: str, schema_b):
    """Collect TWO small parquet stores in ONE Spark job →
    ``(rows_a, rows_b)``, each a list of Rows in the store's own schema.

    The index loaders previously collected ``meta/`` and ``vectors/``
    as two sequential driver-blocking jobs; for stores this size
    (one row + index-geometry rows) the job latency dwarfs the read, so
    the pair is folded into a single scan over both directories (r14,
    r13 verdict ask #1). Requirements: the two schemas' column-name sets
    must not overlap ambiguously (shared names would merge), and both
    schemas are EXPLICIT — no footer-merging job, and a column missing
    from older files reads as NULL exactly like a per-store read with
    that schema would. Rows are attributed to their store by the scan's
    ``_metadata.file_path``.
    """
    from pyspark.sql import Row
    from pyspark.sql.types import StructType

    sa = (
        schema_a if isinstance(schema_a, StructType)
        else StructType.fromDDL(schema_a)
    )
    sb = (
        schema_b if isinstance(schema_b, StructType)
        else StructType.fromDDL(schema_b)
    )
    names_a = [f.name for f in sa.fields]
    union = StructType(
        list(sa.fields)
        + [f for f in sb.fields if f.name not in set(names_a)]
    )
    names_b = [f.name for f in sb.fields]
    rows = (
        spark.read.schema(union)
        .parquet(path_a, path_b)
        .select("*", F.col("_metadata.file_path").alias("__src"))
        .collect()
    )
    # Normalize separators so the prefix test is path-shape agnostic.
    prefix_a = _resolve_fs(path_a)[1].rstrip("/") + "/"
    rows_a, rows_b = [], []
    for r in rows:
        src = r["__src"]
        target = rows_a if prefix_a in src else rows_b
        names = names_a if target is rows_a else names_b
        target.append(Row(**{n: r[n] for n in names}))
    return rows_a, rows_b


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
    repair_swap_debris(path)
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
    promote_staged_store(path, staging, what="compact_store")


def repair_swap_debris(path: str) -> None:
    """Repair the debris a crashed rename-aside promotion may have left
    at ``path`` — run on ENTRY by every operation that promotes a
    staged rewrite (:func:`compact_store`, the BM25 vacuum): aside
    present + live missing ⇒ the crash hit between the two renames,
    restore the aside; both present ⇒ the aside is superseded debris,
    delete it."""
    from pyarrow import fs as pafs

    filesystem, dst = _resolve_fs(path)
    aside = dst.rstrip("/") + ".__old"
    if filesystem.get_file_info(aside).type != pafs.FileType.NotFound:
        if filesystem.get_file_info(dst).type == pafs.FileType.NotFound:
            filesystem.move(aside, dst)  # crashed between renames
        else:
            filesystem.delete_dir(aside)  # crashed before cleanup


def promote_staged_store(path: str, staging: str, what: str) -> None:
    """Swap a FULLY-WRITTEN staged directory in place of the live one
    via rename-aside (live → ``.__old``, staged → live, drop the
    aside) — two metadata ops, crash-recoverable at every window by
    :func:`repair_swap_debris`, rollback on a failed promotion. The
    caller must have finished writing ``staging`` and must not hold
    lazy plans over ``path`` (checkpoint first)."""
    filesystem, dst = _resolve_fs(path)
    _, src = _resolve_fs(staging)
    aside = dst.rstrip("/") + ".__old"
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
            f"{what}: rewritten store staged at {staging} but "
            f"promoting it to {path} failed — {recovered}"
        ) from exc
    filesystem.delete_dir(aside)


def dir_exists(path: str) -> bool:
    """True iff ``path`` resolves to an existing directory — the shared
    probe the tombstone-aware loaders use to decide whether a store has
    pending deletes without paying a Spark read on the common
    (tombstone-free) path."""
    from pyarrow import fs as pafs

    filesystem, resolved = _resolve_fs(path)
    return (
        filesystem.get_file_info(resolved).type == pafs.FileType.Directory
    )


def append_tombstones(ids: SparkDF, path: str, batch_id: int) -> None:
    """Record one delete batch in a store's tombstone substore.

    Tombstones are the delete half of the append-only contract: a row
    ``(id)`` under ``batch_id=<id>`` meaning *every data row for this id
    written at or before this point is dead*. Loaders fold them into a
    per-id high-water mark (:func:`load_tombstone_watermarks`) and
    filter with :func:`apply_tombstones`; compaction/vacuum applies
    them physically and clears the substore.

    ``batch_id`` is REQUIRED and non-negative — a delete only means
    something relative to an ordering of appends, and the sentinel
    partition (``-1``, base saves) is exactly the point with no order.
    Batch callers pass any value ≥ the newest batch they want the
    delete to cover (``0`` for a never-appended store); streaming
    callers pass the micro-batch id, which makes a checkpointed replay
    statically overwrite its own tombstone partition — exactly-once,
    the same rule as data appends. Deleting an id the store never held
    is legal (a tombstone is a filter, not a lookup); re-appending an
    id at a LATER batch_id resurrects it (delete-then-reinsert is how
    an update is expressed).
    """
    if batch_id is None or int(batch_id) < 0:
        raise ValueError(
            f"tombstones require an explicit non-negative batch_id "
            f"(got {batch_id}) — a delete is only meaningful relative "
            "to the append order, and the sentinel partition has none. "
            "Pass a value >= the newest data batch the delete should "
            "cover (0 for a store that was only base-saved)."
        )
    if ids.columns != ["id"]:
        raise ValueError(
            f"tombstone batch must be exactly one 'id' column (got "
            f"{ids.columns}) — project before appending"
        )
    if ids.where(F.col("id").isNull()).limit(1).count():
        raise ValueError(
            "tombstone batch holds a NULL id — a NULL never equi-joins, "
            "so the delete would silently not happen; fix the batch "
            "upstream"
        )
    partitioned_delta_append(ids, path, batch_id=int(batch_id))


def load_tombstone_watermarks(spark, path: str) -> "SparkDF | None":
    """Fold a tombstone substore → ``(id, __dead_upto)`` — the max
    tombstone ``batch_id`` per id, or ``None`` if the store has no
    tombstone directory (the common fast path: loaders skip the join
    entirely). NULL ids in the substore raise — a NULL watermark would
    silently match nothing in the anti-filter and resurrect the row."""
    if not dir_exists(path):
        return None
    tombs = spark.read.parquet(path)
    bad = tombs.where(F.col("id").isNull()).limit(1).count()
    if bad:
        raise ValueError(
            f"tombstone store at {path!r} holds NULL ids — a NULL never "
            "equi-joins, so the dead rows would silently keep serving; "
            "the store was written outside append_tombstones (which "
            "refuses NULLs) and must be repaired manually"
        )
    return tombs.groupBy("id").agg(
        F.max("batch_id").alias("__dead_upto")
    )


def apply_tombstones(
    rows: SparkDF, watermarks: "SparkDF | None", id_col: str = "id"
) -> SparkDF:
    """Filter a batch-partitioned data read down to its LIVE rows: a row
    survives iff no tombstone for its id was issued at or after the
    row's own ``batch_id`` (``__dead_upto >= batch_id`` kills — so a
    tombstone at batch 5 erases the base save (-1) and batches ≤ 5,
    while a re-append at batch 7 serves again). ``rows`` must still
    carry its ``batch_id`` column; the watermark side is one folded row
    per deleted id — broadcast, so the filter is a map-side join, never
    a shuffle of the data read."""
    if watermarks is None:
        return rows
    if "batch_id" not in rows.columns:
        raise ValueError(
            "apply_tombstones needs the data read's batch_id column — "
            "read the store raw (before projecting the layout away)"
        )
    wm = watermarks.withColumnRenamed("id", "__tomb_id")
    return (
        rows.join(
            F.broadcast(wm),
            rows[id_col] == wm["__tomb_id"],
            "left",
        )
        .where(
            F.col("__dead_upto").isNull()
            | (F.col("__dead_upto") < F.col("batch_id"))
        )
        .drop("__tomb_id", "__dead_upto")
    )
