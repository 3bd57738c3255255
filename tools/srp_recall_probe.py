"""SRP recall probe (r7 verdict ask #3): measure recall@k of
``hard_negatives_srp`` against the exact ``hard_negatives_blocked``
ground truth on a 10x-replicated embeddings fixture, sweeping
``n_planes`` x ``multiprobe``.

Speed was measured in r6 (SCALING.md §second decade); this probe
answers the OTHER half of the scale-path claim — how much recall the
bucketing gives up, and which default buys >=0.9 recall@5.

Fixture: the sf0.1 ``embeddings`` table (2 000 clustered 64-d vectors)
replicated 10x with deterministic per-copy jitter (element-wise
``0.02 * sin(...)`` — keeps copies distinct so the ground truth has no
mass ties, preserves the clustered geometry that makes bucketing hard).

Usage: python tools/srp_recall_probe.py [factor] [sf_dir]
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
K = 5


def main() -> None:
    from pyspark.sql import DataFrame, functions as F

    from ons_utils_spark.operators.similarity import (
        hard_negatives_blocked,
        hard_negatives_srp,
    )
    from ons_utils_spark.session import get_session
    from ons_utils_spark.sources.tables import load_table

    spark = get_session(
        app_name="srp_recall_probe",
        extra_configs={"spark.driver.memory": "24g"},
    )
    spark.range(1000).count()

    base = load_table(spark, SF_DIR, "embeddings")
    copies = []
    for i in range(FACTOR):
        jitter = (
            f"transform(embedding, (x, j) -> float(x + 0.02 * "
            f"sin(vec_id * 31 + j * 7 + {i} * 13)))"
        )
        copies.append(
            base.select(
                (F.col("vec_id") + F.lit(i * 1_000_000_000)).alias("vec_id"),
                F.expr(jitter).alias("embedding"),
                "label",
            )
        )
    df = functools.reduce(DataFrame.unionByName, copies)
    df = df.repartition(spark.sparkContext.defaultParallelism).persist()
    n = df.count()
    print(f"fixture: {n} vectors ({FACTOR}x {SF_DIR})", flush=True)

    t0 = time.time()
    exact = (
        hard_negatives_blocked(df, "vec_id", "embedding", "label", k=K)
        .groupBy("id")
        .agg(F.collect_set("neg_id").alias("truth"))
        .persist()
    )
    n_anchors = exact.count()
    print(f"ground truth: {n_anchors} anchors [{time.time()-t0:.1f}s]", flush=True)

    # sweep axis 1: planes x multiprobe at one table (bucket granularity)
    # sweep axis 2: n_tables at the best single-table point (recall lever)
    grid = [(p, mp, 1) for p in (4, 6, 8, 10) for mp in (True, False)]
    grid += [(4, True, L) for L in (2, 3, 4, 6)]
    grid += [(6, True, L) for L in (4, 8)]
    results = []
    for n_planes, multiprobe, n_tables in grid:
        t0 = time.time()
        approx = (
            hard_negatives_srp(
                df, "vec_id", "embedding", "label",
                k=K, dim=64, n_planes=n_planes, multiprobe=multiprobe,
                n_tables=n_tables,
            )
            .groupBy("id")
            .agg(F.collect_set("neg_id").alias("found"))
        )
        # recall@k averaged over ALL anchors (an anchor the approx
        # path missed entirely counts 0, via the left join)
        row = (
            exact.join(approx, "id", "left")
            .select(
                (
                    F.size(
                        F.array_intersect(
                            "truth",
                            F.coalesce(
                                "found", F.array().cast("array<bigint>")
                            ),
                        )
                    )
                    / F.size("truth")
                ).alias("r")
            )
            .agg(F.avg("r").alias("recall"))
            .collect()[0]
        )
        rec = {
            "n_planes": n_planes,
            "multiprobe": multiprobe,
            "n_tables": n_tables,
            "recall_at_5": round(row["recall"], 4),
            "sec": round(time.time() - t0, 1),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)
    print(json.dumps({"n": n, "k": K, "sweep": results}))


if __name__ == "__main__":
    main()
