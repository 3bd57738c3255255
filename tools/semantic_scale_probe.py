"""Scale-decade probe for the r8 embedding families: semantic_dedup and
PQ encode at 1× vs 10× corpus size.

The SemDeDup contract is that k grows with the corpus (k ≈ n /
target_cluster), which holds the per-cluster pairwise block constant —
so end-to-end time should scale ~linearly in n, not quadratically.
This probe measures exactly that: the sf0.1 embeddings (2,000 × 64-d)
vs the same table replicated 10× with deterministic jitter (the
srp_recall_probe fixture recipe), with k scaled 10× alongside.

Usage: python tools/semantic_scale_probe.py [factor] [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"


def main() -> None:
    from pyspark.sql import functions as F

    from ons_utils_spark.operators import pq, semantic
    from ons_utils_spark.session import get_session

    spark = get_session(app_name="semantic_scale_probe")
    spark.range(1000).count()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n1 = emb.count()

    # 10x fixture: deterministic per-copy jitter keeps copies distinct
    # while preserving the clustered geometry (srp_recall_probe recipe).
    copies = spark.range(FACTOR).select(F.col("id").alias("copy"))
    big = (
        emb.crossJoin(F.broadcast(copies))
        .select(
            (F.col("vec_id") * FACTOR + F.col("copy")).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x: x + 0.02 * F.sin(F.col("copy") * 7.0 + x * 13.0),
            ).cast("array<float>").alias("embedding"),
        )
        .repartition(32)
        .localCheckpoint(eager=True)
    )
    n10 = big.count()

    out = {}
    for name, frame, n, k in (
        ("semdedup_1x", emb, n1, 32),
        (f"semdedup_{FACTOR}x", big, n10, 32 * FACTOR),
    ):
        t0 = time.time()
        kept = (
            semantic.semantic_dedup(
                frame, k=k, n_iter=2, tau=0.4, method="blas"
            )
            .where("kept")
            .count()
        )
        out[name] = {"n": n, "k": k, "sec": round(time.time() - t0, 2),
                     "kept": kept}
        print(json.dumps({name: out[name]}), flush=True)

    for name, frame, n in (
        ("pq_encode_1x", emb, n1),
        (f"pq_encode_{FACTOR}x", big, n10),
    ):
        t0 = time.time()
        codes, _ = pq.pq_build(
            frame, dim=64, m=8, k=64, n_iter=1, method="blas"
        )
        cnt = codes.count()
        out[name] = {"n": n, "sec": round(time.time() - t0, 2), "rows": cnt}
        print(json.dumps({name: out[name]}), flush=True)

    a, b = out["semdedup_1x"]["sec"], out[f"semdedup_{FACTOR}x"]["sec"]
    out["semdedup_ratio"] = round(b / a, 2)
    a, b = out["pq_encode_1x"]["sec"], out[f"pq_encode_{FACTOR}x"]["sec"]
    out["pq_encode_ratio"] = round(b / a, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
