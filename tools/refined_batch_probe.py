"""Refined-batch probe: one `ivf_pq_batch_topk_refined` job vs
sequential `ivf_pq_topk_refined` calls for the same query workload —
the refined analogue of the r10 batch-ANN measurement (same sf0.1
corpus, 32 corpus-drawn queries, n_probe=2, topk=10, refine_factor=4).

Per query the two paths are bit-identical (pinned in
`TestIvfPqBatchRefined`); this probe measures the JOB-structure win:
sequential refine pays TWO driver round-trips per query (the ADC
shortlist collect + the re-rank job), the batch pays two total.

Usage: python tools/refined_batch_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_QUERIES = 32
TOPK = 10
REFINE = 4
N_PROBE = 2


def main() -> None:
    from pyspark.sql import functions as F

    from ons_utils_spark.operators import pq
    from ons_utils_spark.session import get_session

    spark = get_session(app_name="refined_batch_probe")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    spark.range(1000).count()  # warm

    coded, coarse, cbs = pq.ivf_pq_build(
        emb, dim=64, n_lists=16, m=16, k=256, coarse_iter=2, n_iter=2,
        method="blas",
    )
    coded = coded.localCheckpoint(eager=True)
    idx = pq.make_ivf_pq_index(coarse, cbs)

    qrows = (
        emb.orderBy("vec_id").limit(N_QUERIES)
        .select("vec_id", "embedding").collect()
    )
    queries = spark.createDataFrame(
        [(r["vec_id"], [float(x) for x in r["embedding"]]) for r in qrows],
        "query_id bigint, embedding array<double>",
    )

    t0 = time.time()
    seq_n = 0
    for r in qrows:
        seq_n += len(
            pq.ivf_pq_topk_refined(
                coded, coarse, cbs,
                [float(x) for x in r["embedding"]], emb,
                n_probe=N_PROBE, topk=TOPK, refine_factor=REFINE,
            ).collect()
        )
    seq_s = time.time() - t0

    t0 = time.time()
    batch_rows = pq.ivf_pq_batch_topk_refined(
        coded, idx, queries, emb,
        n_probe=N_PROBE, topk=TOPK, refine_factor=REFINE,
    ).collect()
    batch_s = time.time() - t0

    assert len(batch_rows) == seq_n, (len(batch_rows), seq_n)
    print(json.dumps({
        "config": f"IVF16,PQ m=16,k=256, {N_QUERIES} queries, "
                  f"topk={TOPK}, refine_factor={REFINE}",
        "sequential_s": round(seq_s, 2),
        "batch_s": round(batch_s, 2),
        "speedup": round(seq_s / batch_s, 1),
        "rows": seq_n,
    }))


if __name__ == "__main__":
    main()
