"""Repeat-time individual registry queries to cut through machine noise.

The per-round bench machine's speed varies run-to-run by 2-4x, so a single
timing cannot distinguish a plan change from noise. This tool runs each
named query K times inside ONE warmed session and prints min/median — the
MIN is the best estimate of the plan's intrinsic cost (noise only ever adds
time), the median shows steady-state.

Usage: python tools/qtime.py [-k 5] [--sf DIR] q_name [q_name ...]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("-k", type=int, default=5)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from ons_utils_spark.plans.queries import QUERIES
    from ons_utils_spark.session import get_session
    from ons_utils_spark.sources.tables import load_table

    spark = get_session(app_name="qtime")
    spark.range(1000).count()
    load_table(spark, args.sf, "region").groupBy("r_name").count().collect()
    n_workers = spark.sparkContext.defaultParallelism

    def _warm(batches):
        import numpy as np

        (np.ones((8, 8)) @ np.ones((8, 8))).sum()
        for pdf in batches:
            yield pdf.groupby("id", sort=False).sum().reset_index()

    spark.range(n_workers * 4).repartition(n_workers).mapInPandas(
        _warm, "id long"
    ).count()

    for name in args.queries:
        q = QUERIES[name]
        runs = []
        for _ in range(args.k):
            t0 = time.perf_counter()
            q.spark(spark, args.sf).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        print(
            f"{name}: min={min(runs):.3f} med={statistics.median(runs):.3f} "
            f"runs={[round(r, 3) for r in runs]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
