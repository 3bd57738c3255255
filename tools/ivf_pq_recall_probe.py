"""IVF×PQ recall probe: recall@10 of the probed-list ADC scan against
the exact COSINE top-10 (the contract `similarity.cosine_topk` serves),
sweeping n_probe at the PQ config SCALING.md states as the default for
this data shape (m=16, k=256 + rerank).

The probe grades the COMPOSITION: how much recall does list pruning
give up on top of PQ's own quantization loss, and does the ADC top-100
rerank window still capture the truth set. Build is the real operator
(`pq.ivf_pq_build`, deterministic Lloyd coarse + per-subspace
codebooks); query-side scoring is numpy replaying exactly the operator
arithmetic (probe lists by squared L2 to coarse centroids, LUT-gather
ADC over probed rows only), because 50 queries × 8 configs through
Spark would measure scheduling, not recall.

Two fixtures, because list pruning's value is entirely a function of
cluster structure: the raw sf embeddings (weakly separated near-unit
vectors — the stress case) and, with ``--clustered``, the same
10×-jittered replica the IVF/SRP recall probes use (each vector gets 9
near-copies — the dedup/near-dup retrieval shape IVF exists for).

Usage: python tools/ivf_pq_recall_probe.py [sf_dir] [--clustered]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

CLUSTERED = "--clustered" in sys.argv
RESIDUAL = "--residual" in sys.argv
# L2-normalize at ingest: exact-L2 and cosine orderings coincide on the
# unit sphere, so the refined re-rank's metric-mismatch gap must close.
NORMALIZED = "--normalized" in sys.argv
_pos = [a for a in sys.argv[1:] if not a.startswith("--")]
SF_DIR = _pos[0] if _pos else "/root/testdata/sf0.1"
K = 10
N_QUERIES = 50
import os

N_LISTS = 32 if CLUSTERED else 16  # match the r8 IVF probe's 20k sizing
M = int(os.environ.get("IVFPQ_M", 16))
K_CODES = int(os.environ.get("IVFPQ_K", 256))
N_ITER = 2
PROBES = (1, 2, 4, 8, N_LISTS)


def main() -> None:
    import numpy as np

    from ons_utils_spark.operators import pq
    from ons_utils_spark.session import get_session

    spark = get_session(app_name="ivf_pq_recall_probe")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    if CLUSTERED:
        from pyspark.sql import DataFrame, functions as F
        import functools

        copies = []
        for i in range(10):
            jitter = (
                f"transform(embedding, (x, j) -> float(x + 0.02 * "
                f"sin(vec_id * 31 + j * 7 + {i} * 13)))"
            )
            copies.append(emb.select(
                (F.col("vec_id") * 10 + i).alias("vec_id"),
                F.expr(jitter).alias("embedding"),
            ))
        emb = functools.reduce(DataFrame.unionByName, copies)

    if NORMALIZED:
        from pyspark.sql import functions as F

        emb = emb.select(
            "vec_id",
            F.expr(
                "transform(embedding, x -> float(x / "
                "sqrt(aggregate(zip_with(transform(embedding, "
                "y -> cast(y as double)), transform(embedding, "
                "y -> cast(y as double)), (a, b) -> a * b), 0d, "
                "(acc, v) -> acc + v))))"
            ).alias("embedding"),
        )

    t0 = time.time()
    coded, coarse, cbs = pq.ivf_pq_build(
        emb, dim=64, n_lists=N_LISTS, m=M, k=K_CODES,
        coarse_iter=2, n_iter=N_ITER, method="blas",
        by_residual=RESIDUAL,
    )
    rows = coded.collect()
    build_s = time.time() - t0

    raw = {r["vec_id"]: list(map(float, r["embedding"]))
           for r in emb.collect()}
    ids = np.array(sorted(raw))
    X = np.array([raw[i] for i in ids])
    n, dim = X.shape
    by_id = {r["id"]: (list(r["codes"]), r["__list"]) for r in rows}
    codes = np.array([by_id[i][0] for i in ids])
    lists = np.array([by_id[i][1] for i in ids])
    C = [np.asarray(cb) for cb in cbs]
    G = np.asarray(coarse)
    sub_d = dim // M

    norms = np.sqrt(np.einsum("ij,ij->i", X, X))
    rng = np.random.default_rng(42)
    q_idx = rng.choice(n, size=N_QUERIES, replace=False)

    results = {}
    for n_probe in PROBES:
        hits = rerank_hits = refined_hits = cand_total = 0
        for qi in q_idx:
            q = X[qi]
            cos = (X @ q) / (norms * norms[qi])
            cos[qi] = -np.inf
            truth = set(ids[np.argsort(-cos)[:K]])
            gd = np.einsum("ij,ij->i", G, G) + q @ q - 2.0 * (G @ q)
            probe = set(np.lexsort((np.arange(N_LISTS), gd))[:n_probe])
            mask = np.isin(lists, list(probe))
            mask[np.searchsorted(ids, ids[qi])] = False
            adc = np.zeros(n)
            if RESIDUAL:
                # IVFADC: one LUT per (probed list, subspace) from the
                # query residual q − coarse_centroid[list].
                for lst in probe:
                    lmask = mask & (lists == lst)
                    if not lmask.any():
                        continue
                    qr = q - G[lst]
                    for s in range(M):
                        qs = qr[s * sub_d:(s + 1) * sub_d]
                        lut = (np.einsum("ij,ij->i", C[s], C[s])
                               + qs @ qs - 2.0 * (C[s] @ qs))
                        adc[lmask] += lut[codes[lmask, s]]
            else:
                for s in range(M):
                    qs = q[s * sub_d:(s + 1) * sub_d]
                    lut = (np.einsum("ij,ij->i", C[s], C[s]) + qs @ qs
                           - 2.0 * (C[s] @ qs))
                    adc += lut[codes[:, s]]
            adc[~mask] = np.inf
            n_cand = int(mask.sum())
            # Cap both windows at the candidate count: argsort ranks
            # the inf (never-scanned) rows after the candidates, and
            # counting those as "captured" would inflate recall
            # whenever a probe returns fewer than 10*K candidates.
            order = np.argsort(adc)
            hits += len(truth & set(ids[order[:min(K, n_cand)]]))
            window = order[:min(10 * K, n_cand)]
            rerank_hits += len(truth & set(ids[window]))
            # What ivf_pq_topk_refined actually returns: the window
            # re-ranked by EXACT squared L2, cut to K. (Truth is cosine;
            # the gap between refined and in-window recall is the
            # L2-vs-cosine metric mismatch on unnormalized vectors.)
            diff = X[window] - q
            d2 = np.einsum("ij,ij->i", diff, diff)
            refined = window[np.lexsort((ids[window], d2))[:K]]
            refined_hits += len(truth & set(ids[refined]))
            cand_total += n_cand
        results[f"n_probe={n_probe}"] = {
            "recall@10": round(hits / (K * N_QUERIES), 3),
            "recall@10_in_adc100": round(rerank_hits / (K * N_QUERIES), 3),
            "refined_recall@10": round(refined_hits / (K * N_QUERIES), 3),
            "avg_candidates": round(cand_total / N_QUERIES, 1),
            "scan_fraction": round(cand_total / N_QUERIES / n, 3),
        }
        print(json.dumps({f"n_probe={n_probe}": results[f"n_probe={n_probe}"]}),
              flush=True)
    label = f"IVF{N_LISTS},PQ m={M},k={K_CODES}" + (
        ",residual" if RESIDUAL else ""
    ) + (",normalized" if NORMALIZED else "")
    print(json.dumps({"config": label,
                      "build_s": round(build_s, 1), "results": results}))


if __name__ == "__main__":
    main()
