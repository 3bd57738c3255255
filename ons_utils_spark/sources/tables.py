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

    Nanosecond-precision timestamp columns (which Spark's parquet reader
    rejects with PARQUET_TYPE_ILLEGAL) are read as raw int64 via
    ``spark.sql.legacy.parquet.nanosAsLong`` and converted to microsecond
    timestamps in-plan (``timestamp_micros(ts div 1000)`` — integer division;
    DuckDB applies the same truncation when it reads ns parquet). The probe
    is footer-only metadata, so this stays O(1) regardless of data size.
    """
    file_path = os.path.join(sf_dir, f"{name}.parquet")
    dir_path = os.path.join(sf_dir, name)
    path = file_path if os.path.exists(file_path) else dir_path

    ns_cols: list[str] = []
    try:
        ns_cols = _nanos_timestamp_columns(path)
    except Exception:  # noqa: BLE001 — fall back to a plain read
        pass
    if not ns_cols:
        return spark.read.parquet(path)

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
