"""SparkSession builder tuned for this engine.

The reference pinned Spark 2.4-era configs (legacy Arrow IPC flags, 12 shuffle
partitions, external shuffle service — ``/root/reference/ons_utils/config/
validation.py:352-364``). On Spark 3/4 the equivalents are AQE + Arrow-native
pandas UDFs; shuffle partitioning is sized to the local core count and then
coalesced at runtime by AQE. Session timezone is pinned to UTC so results are
comparable with UTC-naive engines (DuckDB oracle).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Defaults applied by :func:`get_session`. Callers can override any of them.
DEFAULT_CONFIGS: dict[str, str] = {
    # AQE: runtime coalescing of shuffle partitions, skew-join splitting and
    # dynamic join-strategy switching — the scale story for 100 TB plans.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow transfer for every pandas interchange (toPandas, applyInPandas).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # UTC everywhere: parquet timestamps are instants; the DuckDB oracle is
    # UTC-naive. Without this the session picks up the machine TZ.
    "spark.sql.session.timeZone": "UTC",
    # Read naive (isAdjustedToUTC=false) parquet timestamps as TIMESTAMP
    # instants, not TIMESTAMP_NTZ — NTZ rejects cast-to-long/unix_micros/
    # range-window arithmetic used throughout the engine, and under a UTC
    # session the two conventions carry identical field values anyway.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # Let Python Data Sources (sources/pysource.py) receive pushed filters —
    # off by default in Spark 4.1 while the API stabilizes.
    "spark.sql.python.filterPushdown.enabled": "true",
    # Don't drag the full 20MB+ UI stack up for library use.
    "spark.ui.enabled": "false",
    # Broadcast threshold: dimension tables (region/nation/customer at test
    # SFs) should broadcast; AQE re-checks at runtime with actual sizes.
    "spark.sql.autoBroadcastJoinThreshold": "64MB",
}


def _default_local_heap() -> str:
    """Local-mode driver-heap default: 8g, clamped to ~50% of physical
    memory so small hosts/CI containers never request a heap the OS
    cannot back (the JVM would be OOM-killed mid-bench instead of
    degrading gracefully). Whole-GiB floor of the clamp, minimum 1g
    (Spark's own default)."""
    try:
        with open("/proc/meminfo") as fh:
            for line in fh:
                if line.startswith("MemTotal:"):
                    total_gib = int(line.split()[1]) / (1024 * 1024)
                    break
            else:
                return "8g"
    except OSError:
        return "8g"
    return f"{max(1, min(8, int(total_gib // 2)))}g"


def get_session(
    app_name: str = "ons_utils_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_configs: dict[str, str] | None = None,
) -> SparkSession:
    """Return (building if needed) a SparkSession with engine defaults.

    Parameters
    ----------
    app_name
        Spark application name.
    master
        Master URL. Defaults to ``local[$SPARK_GRAFT_CPUS]`` (env var, falling
        back to ``local[*]``). On a real cluster, pass nothing and let
        spark-submit own the master.
    shuffle_partitions
        Initial shuffle partition count. Defaults to the local parallelism for
        local masters (AQE coalesces further at runtime). On a 1000-executor
        cluster you'd set this to ~2-3x total cores instead.
    extra_configs
        Overrides/additions applied after :data:`DEFAULT_CONFIGS`.
    """
    builder = SparkSession.builder.appName(app_name)

    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    builder = builder.master(master)

    configs = dict(DEFAULT_CONFIGS)
    if master.startswith("local"):
        # Local mode puts the driver AND every executor thread in ONE
        # JVM whose default heap is 1g — measured borderline for a
        # 32-core run with broadcast builds + checkpoint blocks: the
        # full bench intermittently dies with "Not enough memory to
        # build and broadcast the table" (reproduced at 2-of-3 trials
        # on an otherwise idle 125 GiB host, and equally at the
        # pre-optimization commit — a long-standing latent flake, not
        # a regression). Size the combined heap explicitly;
        # $SPARK_GRAFT_DRIVER_MEM overrides. Only applies when the
        # session is being CREATED (a live session's JVM keeps its
        # heap) and never on a real cluster, where spark-submit owns
        # driver/executor sizing. The default is CLAMPED to ~half of
        # physical memory (r13 advice): an unconditional 8g on a <8 GiB
        # CI container would let the heap grow past physical RAM and
        # trade the broadcast flake for OS OOM kills.
        configs["spark.driver.memory"] = os.environ.get(
            "SPARK_GRAFT_DRIVER_MEM", _default_local_heap()
        )
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus else (os.cpu_count() or 8)
    configs["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_configs:
        configs.update(extra_configs)
    for key, value in configs.items():
        builder = builder.config(key, value)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
