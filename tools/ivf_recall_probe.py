"""IVF recall probe (r8, companion to srp_recall_probe.py): measure
recall@k of ``ivf_topk`` against the exact ``cosine_topk`` over a set of
query vectors, sweeping ``n_probe`` — the IVF recall/cost dial.

Fixture: same 10x-jittered embeddings replica as the SRP probe (20k
clustered 64-d vectors). Queries: every 800th vector (25 queries),
jittered once more so no query is exactly in the index.

Usage: python tools/ivf_recall_probe.py [factor] [sf_dir]
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
K = 10
N_LISTS = 32


def main() -> None:
    import math

    from pyspark.sql import DataFrame, functions as F

    from ons_utils_spark.operators.similarity import (
        cosine_topk,
        ivf_build,
        ivf_topk,
    )
    from ons_utils_spark.session import get_session
    from ons_utils_spark.sources.tables import load_table

    spark = get_session(
        app_name="ivf_recall_probe",
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
            )
        )
    df = functools.reduce(DataFrame.unionByName, copies)
    df = df.repartition(spark.sparkContext.defaultParallelism).persist()
    n = df.count()
    print(f"fixture: {n} vectors ({FACTOR}x {SF_DIR})", flush=True)

    t0 = time.time()
    assigned, centroids = ivf_build(df, n_lists=N_LISTS)
    assigned = assigned.persist()
    assigned.count()
    print(f"ivf index: {N_LISTS} lists [{time.time()-t0:.1f}s]", flush=True)

    # Queries sit BETWEEN stored vectors (pairwise midpoints of distinct
    # stored rows, plus each vector alone re-jittered): a query inside a
    # cluster is trivially answered by one list, so the boundary
    # midpoints are what actually exercise the n_probe dial.
    qrows = (
        df.where(F.col("vec_id") % 800 == 3)
        .select("vec_id", "embedding")
        .collect()
    )
    queries = [
        [x + 0.01 * math.sin(17 * j + r["vec_id"]) for j, x in enumerate(r["embedding"])]
        for r in qrows
    ]
    queries += [
        [(a + b) / 2 for a, b in zip(qrows[i]["embedding"], qrows[i + 1]["embedding"])]
        for i in range(len(qrows) - 1)
    ]
    print(f"{len(queries)} query vectors", flush=True)

    truth = [
        {r["id"] for r in cosine_topk(df, q, k=K).collect()} for q in queries
    ]

    results = []
    for n_probe in (1, 2, 4, 8, 16):
        t0 = time.time()
        hits = 0
        worst = 1.0
        for q, t in zip(queries, truth):
            got = {
                r["id"]
                for r in ivf_topk(
                    assigned, centroids, q, k=K, n_probe=n_probe
                ).collect()
            }
            r_one = len(got & t) / K
            hits += len(got & t)
            worst = min(worst, r_one)
        rec = {
            "n_probe": n_probe,
            "n_lists": N_LISTS,
            "recall_at_10": round(hits / (K * len(queries)), 4),
            "worst_query": round(worst, 4),
            "sec": round(time.time() - t0, 1),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)
    print(json.dumps({"n": n, "k": K, "sweep": results}))


if __name__ == "__main__":
    main()
