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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    InputPartition,
    SimpleDataSourceStreamReader,
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
        """Accept lang/source equality; everything else goes back to Spark."""
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute[0] in ("lang", "source"):
                self.eq[f.attribute[0]] = f.value
            else:
                yield f

    def partitions(self):
        n = max(1, self.num_partitions)
        bounds = [self.rows * i // n for i in range(n + 1)]
        return [
            InputPartition((lo, hi))
            for lo, hi in zip(bounds, bounds[1:])
            if hi > lo
        ]

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
        hi = min(lo + self.batch, self.rows)
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
