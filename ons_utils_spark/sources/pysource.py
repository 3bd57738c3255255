"""A Spark 4 Python Data Source: deterministic synthetic document corpus.

Demonstrates the modern PySpark extension point for CUSTOM CONNECTORS
(``pyspark.sql.datasource`` — the Python counterpart of the DataSource V2
API the JVM connectors use), with the two properties a production source
must get right:

- **Partition-parallel reads.** ``partitions()`` splits the id range into
  ``partitions`` independent slices; Spark schedules one task per slice,
  so generation (or, in a real connector, fetching) scales with executors.
- **Partition-count invariance.** Every row derives ONLY from its
  ``doc_id`` and the ``seed`` option — never from which partition emits
  it — so the SAME dataset comes back whatever the parallelism (asserted
  in tests; the property that makes re-partitioning a pure tuning knob).
- **Filter pushdown.** ``pushFilters`` accepts ``lang = '<x>'`` /
  ``source = '<x>'`` equality filters and generation skips non-matching
  rows at the source, returning the rest to Spark for post-evaluation —
  the same contract JVM sources implement for parquet PushedFilters.

Register and read::

    from ons_utils_spark.sources.pysource import SyntheticDocsDataSource
    spark.dataSource.register(SyntheticDocsDataSource)
    df = (spark.read.format("synthetic_docs")
          .option("rows", 100_000).option("partitions", 64).load())

Use cases: deterministic load/scale fixtures (the 10× probes in
``tools/scale_probe.py`` replicate parquet in-plan; this source generates
arbitrary row counts without any input files) and a template for real
Python connectors (REST APIs, queue drains) where the data genuinely
lives behind Python.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    InputPartition,
    SimpleDataSourceStreamReader,
    DataSourceWriter,
    WriterCommitMessage,
)

_LANGS = ("en", "de", "fr", "es", "it")
_WORDS = (
    "key agg row scan slow fast table value part hash merge batch sort "
    "join filter shuffle spill codegen vector column page block stripe "
    "index bloom stat delta queue stream state window trigger commit"
).split()


def _doc(doc_id: int, seed: int) -> tuple:
    """The one row for ``doc_id`` — pure function of (doc_id, seed)."""
    h = hashlib.md5(f"{seed}:{doc_id}".encode()).digest()
    lang = _LANGS[h[0] % len(_LANGS)]
    source = f"src{h[1] % 20}"
    n_tokens = 20 + h[2] % 80
    words = [
        _WORDS[h[3 + i % 12] % len(_WORDS)]
        + (str(i % 7) if h[(5 + i) % 16] % 3 == 0 else "")
        for i in range(n_tokens)
    ]
    text = " ".join(words)
    return (doc_id, text, lang, source, len(text))


class SyntheticDocsDataSource(DataSource):
    """``format("synthetic_docs")`` — options: rows, partitions, seed."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return (
            "doc_id bigint, text string, lang string, source string, "
            "n_chars bigint"
        )

    def reader(self, schema) -> "SyntheticDocsReader":
        return SyntheticDocsReader(self.options)


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.num_partitions = int(options.get("partitions", 8))
        self.seed = int(options.get("seed", 42))
        self.eq: dict[str, str] = {}

    def pushFilters(self, filters):
        """Accept ONE lang/source equality each; everything else — including
        a second, conflicting equality on the same attribute — goes back to
        Spark for post-evaluation (absorbing both and keeping only the last
        would return rows that violate the first)."""
        for f in filters:
            if (
                isinstance(f, EqualTo)
                and f.attribute[0] in ("lang", "source")
                and self.eq.get(f.attribute[0], f.value) == f.value
            ):
                self.eq[f.attribute[0]] = f.value
            else:
                yield f

    def partitions(self):
        n = max(1, self.num_partitions)
        bounds = [self.rows * i // n for i in range(n + 1)]
        parts = [
            InputPartition((lo, hi))
            for lo, hi in zip(bounds, bounds[1:])
            if hi > lo
        ]
        # rows=0: an EMPTY partition list makes PySpark call read(None);
        # return one empty slice so the scan yields an empty DataFrame.
        return parts or [InputPartition((0, 0))]

    def read(self, partition):
        lo, hi = partition.value
        want_lang = self.eq.get("lang")
        want_source = self.eq.get("source")
        for doc_id in range(lo, hi):
            row = _doc(doc_id, self.seed)
            if want_lang is not None and row[2] != want_lang:
                continue
            if want_source is not None and row[3] != want_source:
                continue
            yield row


class SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batched reads over the same deterministic id space.

    Offsets are plain ``{"next": <first unread doc_id>}`` dicts; each
    ``read`` serves at most ``rows_per_batch`` ids and advances the
    offset, stopping at the ``rows`` cap. ``readBetweenOffsets`` replays
    any (start, end) slice EXACTLY — rows are pure functions of
    (doc_id, seed), which is what makes the source replayable and the
    stream's exactly-once contract hold across restarts.
    """

    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.batch = int(options.get("rows_per_batch", 100))
        self.seed = int(options.get("seed", 42))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = int(start["next"])
        # max(lo, ...): if a checkpointed offset exceeds a SHRUNK rows cap,
        # serve nothing rather than regress the offset — structured
        # streaming requires monotonically non-decreasing offsets.
        hi = max(lo, min(lo + self.batch, self.rows))
        return (
            iter([_doc(i, self.seed) for i in range(lo, hi)]),
            {"next": hi},
        )

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [_doc(i, self.seed) for i in range(int(start["next"]), int(end["next"]))]
        )


class SyntheticDocsStreamDataSource(DataSource):
    """``readStream.format("synthetic_docs_stream")`` — the streaming twin
    of :class:`SyntheticDocsDataSource` (same schema, same rows)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs_stream"

    def schema(self) -> str:
        return (
            "doc_id bigint, text string, lang string, source string, "
            "n_chars bigint"
        )

    def simpleStreamReader(self, schema) -> SyntheticDocsStreamReader:
        return SyntheticDocsStreamReader(self.options)


@dataclass
class _PartitionFile(WriterCommitMessage):
    """One task's staged output: (path, row count). Must be picklable."""

    path: str
    rows: int


class ManifestParquetWriter(DataSourceWriter):
    """Two-phase parquet writer: stage per-task files, commit a manifest.

    Each task writes its rows to a uniquely-named parquet file via
    pyarrow and returns a :class:`_PartitionFile` commit message; only
    ``commit`` — which runs ONCE on the driver after every task
    succeeded — writes ``_manifest.json`` listing the finished files and
    total rows. Readers that trust only manifest-listed files therefore
    never see a partial write: the job's visibility flips atomically
    with the manifest, the same commit-protocol shape JVM sources and
    table formats use.

    The manifest IS the commit contract: ``commit`` stages the new
    manifest to a temp file and ``os.replace``-renames it into place, so
    a crash at any point leaves either the previous manifest (with every
    file it references still on disk) or the new one — never a torn
    manifest and never a manifest naming deleted data. A task that
    crashes AFTER staging its file but BEFORE returning its commit
    message leaves an orphan ``abort`` cannot know about (abort removes
    only the files reported in commit messages) — so ``commit`` also
    sweeps unlisted ``part-*.parquet``, strictly AFTER the rename
    (single concurrent writer per directory assumed, as with any
    non-locking table layout). Plain ``spark.read.parquet(dir)``
    readers, which ignore manifests, should only be pointed at
    directories whose last job committed.
    """

    #: Rows buffered per staged row-group — bounds worker memory at
    #: O(chunk), not O(partition), for arbitrarily large input partitions.
    CHUNK_ROWS = 65536

    def __init__(self, options, schema, overwrite: bool = False):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("manifest_parquet requires a 'path' option")
        self.schema = schema
        self.overwrite = overwrite

    def write(self, iterator):
        import os
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        # Explicit Arrow schema from the Spark schema: an EMPTY partition
        # must still write correctly-typed (not null-typed) columns, or
        # readers fail to merge its footer with the non-empty files'.
        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(self.schema)
        os.makedirs(self.path, exist_ok=True)
        fname = os.path.join(self.path, f"part-{uuid.uuid4().hex}.parquet")
        cols = self.schema.fieldNames()

        def flush(writer, buffered):
            table = pa.table(
                {c: [row[i] for row in buffered] for i, c in enumerate(cols)},
                schema=arrow_schema,
            )
            writer.write_table(table)

        n = 0
        buffered = []
        with pq.ParquetWriter(fname, arrow_schema) as writer:
            for row in iterator:
                buffered.append(row)
                if len(buffered) >= self.CHUNK_ROWS:
                    flush(writer, buffered)
                    n += len(buffered)
                    buffered = []
            if buffered:
                flush(writer, buffered)
                n += len(buffered)
        return _PartitionFile(path=fname, rows=n)

    def commit(self, messages):
        import json
        import os

        # Cumulative manifest: appends extend the committed file list, so
        # the manifest always describes the WHOLE directory. An OVERWRITE
        # job starts the list fresh — the sweep below then removes every
        # previously-committed file along with any orphans.
        manifest_path = os.path.join(self.path, "_manifest.json")
        files = []
        if not self.overwrite and os.path.exists(manifest_path):
            with open(manifest_path) as fh:
                files = json.load(fh)["files"]
        files += [
            {"path": os.path.basename(m.path), "rows": m.rows}
            for m in messages
            if m is not None
        ]
        manifest = {"files": files, "total_rows": sum(f["rows"] for f in files)}
        # Stage the manifest beside its final path and os.replace() it in:
        # the rename is atomic on POSIX, so a reader either sees the old
        # manifest (old files still present — the sweep hasn't run yet) or
        # the new one, never a truncated file.
        tmp_path = manifest_path + ".tmp"
        with open(tmp_path, "w") as fh:
            json.dump(manifest, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp_path, manifest_path)
        # Only after the new manifest is durable, sweep unreferenced files:
        # orphans staged by tasks that crashed before reporting a commit
        # message, and (in overwrite mode) the prior generation. A crash
        # between the rename and this loop leaves extra files on disk but
        # never a manifest pointing at deleted data.
        listed = {f["path"] for f in files}
        for name in os.listdir(self.path):
            if name.startswith("part-") and name.endswith(".parquet") and name not in listed:
                os.remove(os.path.join(self.path, name))

    def abort(self, messages):
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class ManifestParquetDataSource(DataSource):
    """``df.write.format("manifest_parquet").option("path", dir)`` sink."""

    @classmethod
    def name(cls) -> str:
        return "manifest_parquet"

    def writer(self, schema, overwrite: bool) -> ManifestParquetWriter:
        return ManifestParquetWriter(self.options, schema, overwrite)
