"""PQ recall probe: measure recall@k of ADC ranking against the exact
L2 ground truth, sweeping (m, k_codes) configs.

Product quantization trades distance fidelity for a 32-64x smaller
serving footprint; this probe quantifies the trade on the real sf0.1
embeddings (2,000 clustered 64-d vectors): for each of N_QUERIES query
vectors drawn from the table, compare the ADC top-K id set against the
exact squared-L2 top-K (self excluded on both sides).

Usage: python tools/pq_recall_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
K = 10
N_QUERIES = 50
CONFIGS = [
    (4, 16, 1), (4, 64, 2), (8, 16, 1), (8, 64, 2), (8, 256, 2),
    (16, 256, 2),  # SCALING.md's stated default (rerank recall 1.0 @ 16x)
]


def main() -> None:
    import numpy as np

    from ons_utils_spark.operators import pq
    from ons_utils_spark.session import get_session

    spark = get_session(app_name="pq_recall_probe")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([list(map(float, r["embedding"])) for r in rows])
    n, dim = X.shape
    order = np.argsort(ids)
    ids, X = ids[order], X[order]

    rng = np.random.default_rng(42)
    q_idx = rng.choice(n, size=N_QUERIES, replace=False)

    # Exact ground truth (numpy; the probe grades recall, not speed).
    vv = np.einsum("ij,ij->i", X, X)
    results = {}
    for m, k_codes, n_iter in CONFIGS:
        t0 = time.time()
        codes_df, cbs = pq.pq_build(
            emb, dim=dim, m=m, k=k_codes, n_iter=n_iter, method="blas"
        )
        code_rows = codes_df.collect()
        by_id = {r["id"]: list(r["codes"]) for r in code_rows}
        C = [np.asarray(cb) for cb in cbs]
        codes = np.array([by_id[i] for i in ids])
        build_s = time.time() - t0

        sub_d = dim // m
        hits = 0
        rerank_hits = 0  # truth@10 found within the ADC top-100
        for qi in q_idx:
            q = X[qi]
            exact = vv + vv[qi] - 2.0 * (X @ q)
            exact[qi] = np.inf
            truth = set(ids[np.argsort(exact)[:K]])
            # ADC: per-subspace LUT then gather.
            adc = np.zeros(n)
            for s in range(m):
                qs = q[s * sub_d:(s + 1) * sub_d]
                lut = np.einsum("ij,ij->i", C[s], C[s]) + qs @ qs \
                    - 2.0 * (C[s] @ qs)
                adc += lut[codes[:, s]]
            adc[qi] = np.inf
            adc_order = np.argsort(adc)
            got = set(ids[adc_order[:K]])
            hits += len(truth & got)
            rerank_hits += len(truth & set(ids[adc_order[:10 * K]]))
        recall = hits / (K * N_QUERIES)
        rerank_recall = rerank_hits / (K * N_QUERIES)
        bits = m * int(np.ceil(np.log2(k_codes)))
        results[f"m={m},k={k_codes},iters={n_iter}"] = {
            "recall@10": round(recall, 3),
            "recall@10_in_adc100": round(rerank_recall, 3),
            "code_bits": bits,
            "compression_vs_f32": round(dim * 32 / bits, 1),
            "build_s": round(build_s, 1),
        }
        print(json.dumps({f"m={m},k={k_codes},iters={n_iter}":
                          results[f"m={m},k={k_codes},iters={n_iter}"]}),
              flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
