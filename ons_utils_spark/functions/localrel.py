"""Driver-local DataFrame construction without the 32-partition tax.

``spark.createDataFrame(list, schema)`` parallelizes the rows into
``defaultParallelism`` pickled Python partitions. Every downstream
consumer that executes the relation in few tasks (a ``coalesce(1)``
index write, a broadcast build, a collect-bounded candidate join) then
pays one **sequential** Python-worker round-trip *per partition* — on
``local[32]`` that is ~150 ms × 32 ≈ 5 s for a 72-row index payload
(measured: a two-file ``save_ivf_pq_index`` cost 10.5 s of which the
actual parquet bytes were milliseconds). On a cluster the same shape
schedules 32 near-empty tasks per consumer.

The fix is one line at the source: parallelize the driver rows into a
SINGLE partition. The values, schema handling and pickle semantics are
identical to the list path (``createDataFrame(list)`` itself calls
``parallelize`` — just with the default slice count); only the
partition count changes, which for contract-bounded driver-side
payloads (index artifacts, query workloads, candidate lists) is the
right layout at any scale.
"""

from __future__ import annotations

from typing import Any, Iterable

from pyspark.sql import DataFrame, SparkSession


def local_rows_df(
    spark: SparkSession,
    rows: Iterable[Any],
    schema,
    num_slices: int = 1,
) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` as ``num_slices``
    partitions (default ONE) instead of ``defaultParallelism``.

    Use for small driver-side payloads that downstream operators read
    in few tasks. ``schema`` is a DDL string or ``StructType`` — it is
    REQUIRED (no sampling-based inference on an RDD input, and these
    call sites should be explicit about types anyway).
    """
    if schema is None:
        raise ValueError(
            "local_rows_df requires an explicit schema (DDL string or "
            "StructType)"
        )
    rows = rows if isinstance(rows, list) else list(rows)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, num_slices), schema
    )
