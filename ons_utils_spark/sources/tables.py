"""Parquet star-schema sources (TESTDATA.md tables).

The reference has zero read/write paths of its own (SURVEY.md §2.1 — it only
introspects Hive catalogs). This module is the engine's scan layer: parquet
via ``spark.read.parquet`` so Catalyst gets predicate pushdown, column pruning
and partition pruning for free. At 100 TB the same call reads a partitioned
directory tree; nothing here assumes single files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

#: Table names present in every scale-factor directory.
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Small dimension tables a planner should always broadcast in joins.
BROADCAST_TABLES: frozenset[str] = frozenset({"region", "nation", "supplier", "part", "customer"})


def _nanos_timestamp_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark can't read those
    natively. Footer-only metadata probe (one file), no data read."""
    import pyarrow.dataset as ds
    import pyarrow as pa

    schema = ds.dataset(path, format="parquet").schema
    return [
        f.name
        for f in schema
        if isinstance(f.type, pa.TimestampType) and f.type.unit == "ns"
    ]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one star-schema table from ``sf_dir``.

    Accepts either ``<dir>/<name>.parquet`` (driver layout) or a
    ``<dir>/<name>/`` partitioned directory (production layout).

    Timestamps are normalized to TIMESTAMP (instant) semantics in a
    UTC-pinned session, whatever physical type the files carry:

    * **µs/ms naive** (``isAdjustedToUTC=false`` — what the test generator
      writes): Spark 3.4+ infers TIMESTAMP_NTZ by default, which half the
      engine's expressions (``cast(ts as long)``, ``unix_micros``, range
      windows) reject. We disable ``spark.sql.parquet.inferTimestampNTZ``
      *before* the read so the scan itself yields TIMESTAMP — no extra
      Project, so timestamp predicates still push down to the footer. A
      defensive cast covers sessions where the conf is unavailable.
    * **ns** (which Spark's reader rejects with PARQUET_TYPE_ILLEGAL):
      read as raw int64 via ``spark.sql.legacy.parquet.nanosAsLong`` and
      converted in-plan (``timestamp_micros(ts div 1000)`` — integer
      division; DuckDB applies the same truncation on ns parquet). The
      probe is footer-only metadata, O(1) regardless of data size.

    Under a UTC session the instant's field values equal the naive values a
    UTC-naive engine (the DuckDB oracle) sees, so both conventions agree.
    """
    file_path = os.path.join(sf_dir, f"{name}.parquet")
    dir_path = os.path.join(sf_dir, name)
    path = file_path if os.path.exists(file_path) else dir_path

    try:
        # Session-level, like nanosAsLong below: must be set before the
        # scan is planned for the reader to emit TIMESTAMP over naive µs.
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:  # noqa: BLE001 — conf may be locked; cast below instead
        pass

    ns_cols: list[str] = []
    try:
        ns_cols = _nanos_timestamp_columns(path)
    except Exception:  # noqa: BLE001 — fall back to a plain read
        pass
    if not ns_cols:
        df = spark.read.parquet(path)
        ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
        for c in ntz:
            df = df.withColumn(c, F.col(c).cast("timestamp"))
        return df

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # timestamp_micros produces an instant (TIMESTAMP, not NTZ); pin the
    # session to UTC so collect/display/window math agrees with engines
    # that treat these values as naive UTC (the DuckDB oracle). No-op on
    # UTC machines.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    """Load several tables as a dict keyed by table name."""
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register every table as a temp view so ``spark.sql`` queries run."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
