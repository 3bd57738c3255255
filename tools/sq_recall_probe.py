"""SQ8 recall probe: recall@10 of the trained scalar quantizer's ADC
scan (`similarity.sq_train/sq_encode/sq_adc_topk`) against BOTH truth
orderings — exact squared L2 (the metric SQ ADC approximates) and exact
cosine (`cosine_topk`'s contract) — on the raw sf embeddings, next to
PQ at the default m=16/k=256 geometry for a codec-family comparison at
matched corpus.

Build is the real operator (Spark trains min/max and encodes); scoring
is numpy replaying the operator arithmetic (decode + squared L2),
because 50 queries through Spark would measure scheduling, not recall.

Usage: python tools/sq_recall_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

IVF = "--ivf" in sys.argv
RESIDUAL = "--residual" in sys.argv
BITS = 8
if "--bits" in sys.argv:
    BITS = int(sys.argv[sys.argv.index("--bits") + 1])
_pos = [a for a in sys.argv[1:] if not a.startswith("--")]
if "--bits" in sys.argv:
    _pos = [a for a in _pos if a != str(BITS)]
SF_DIR = _pos[0] if _pos else "/root/testdata/sf0.1"
K = 10
N_QUERIES = 50
N_LISTS = 16
PROBES = (1, 2, 4, 8, N_LISTS)


def main() -> None:
    import numpy as np

    from ons_utils_spark.operators import similarity as sim
    from ons_utils_spark.session import get_session

    spark = get_session(app_name="sq_recall_probe")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    t0 = time.time()
    lists = None
    if IVF:
        coded_df, coarse, vmin, vmax = sim.ivf_sq_build(
            emb, dim=64, n_lists=N_LISTS, coarse_iter=2, bits=BITS,
            by_residual=RESIDUAL,
        )
        rows_ = coded_df.collect()
        coded = {r["id"]: list(r["codes"]) for r in rows_}
        lists = {r["id"]: r["__list"] for r in rows_}
    else:
        vmin, vmax = sim.sq_train(emb, dim=64)
        coded = {
            r["id"]: list(r["codes"])
            for r in sim.sq_encode(emb, vmin, vmax, bits=BITS).collect()
        }
    build_s = time.time() - t0

    raw = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.collect()
    }
    ids = np.array(sorted(raw))
    X = np.array([raw[i] for i in ids])
    C = np.array([coded[i] for i in ids], dtype=np.float64)
    mn = np.array(vmin)
    levels = (1 << BITS) - 1
    d = np.array([
        (hi - lo) / levels if hi > lo else 0.0
        for lo, hi in zip(vmin, vmax)
    ])
    Xhat = mn + C * d  # decoded grid points, the vectors ADC "sees"
    # Residual build: the decoded value is a RESIDUAL — reconstruct the
    # vector by adding the row's coarse centroid back (scoring q vs
    # c[L]+decode(code) == scoring (q − c[L]) vs decode(code)).
    if IVF and RESIDUAL:
        import numpy as _np

        _G = _np.asarray([[float(x) for x in c] for c in coarse])
        _L = _np.array([lists[i] for i in ids])
        Xhat = _G[_L] + Xhat
    n = len(ids)
    norms = np.sqrt(np.einsum("ij,ij->i", X, X))
    rng = np.random.default_rng(42)
    q_idx = rng.choice(n, size=N_QUERIES, replace=False)

    if IVF:
        import numpy as _np

        L = _np.array([lists[i] for i in ids])
        G = _np.asarray(
            [[float(x) for x in c] for c in coarse]
        )
        results = {}
        for n_probe in PROBES:
            hits = cand_total = 0
            for qi in q_idx:
                q = X[qi]
                cos = (X @ q) / (norms * norms[qi])
                cos[qi] = -_np.inf
                truth = set(ids[_np.argsort(-cos)[:K]])
                gd = (_np.einsum("ij,ij->i", G, G) + q @ q
                      - 2.0 * (G @ q))
                probe = set(
                    _np.lexsort((_np.arange(N_LISTS), gd))[:n_probe]
                )
                mask = _np.isin(L, list(probe))
                mask[_np.searchsorted(ids, ids[qi])] = False
                dh = Xhat - q
                adc = _np.einsum("ij,ij->i", dh, dh)
                adc[~mask] = _np.inf
                n_cand = int(mask.sum())
                got = set(ids[_np.argsort(adc)[:min(K, n_cand)]])
                hits += len(truth & got)
                cand_total += n_cand
            results[f"n_probe={n_probe}"] = {
                "recall@10": round(hits / (K * N_QUERIES), 3),
                "scan_fraction": round(cand_total / N_QUERIES / n, 3),
            }
            print(json.dumps(
                {f"n_probe={n_probe}": results[f"n_probe={n_probe}"]}
            ), flush=True)
        print(json.dumps({
            "config": f"IVF{N_LISTS},SQ{BITS}"
                      + (",residual" if RESIDUAL else ""),
            "build_s": round(build_s, 1),
            "n": int(n), "results": results,
        }))
        return

    hits_l2 = hits_cos = 0
    max_rel_dist_err = 0.0
    for qi in q_idx:
        q = X[qi]
        diff = X - q
        d2 = np.einsum("ij,ij->i", diff, diff)
        d2[qi] = np.inf
        truth_l2 = set(ids[np.argsort(d2)[:K]])
        cos = (X @ q) / (norms * norms[qi])
        cos[qi] = -np.inf
        truth_cos = set(ids[np.argsort(-cos)[:K]])
        dh = Xhat - q
        adc = np.einsum("ij,ij->i", dh, dh)
        adc[qi] = np.inf
        got = set(ids[np.argsort(adc)[:K]])
        hits_l2 += len(truth_l2 & got)
        hits_cos += len(truth_cos & got)
        finite = d2 != np.inf
        max_rel_dist_err = max(
            max_rel_dist_err,
            float(np.max(np.abs(adc[finite] - d2[finite])
                         / np.maximum(d2[finite], 1e-12))),
        )
    print(json.dumps({
        "config": f"SQ{BITS} per-dim trained grid "
                  f"({round(32 / BITS, 1)}x vs float32)",
        "build_s": round(build_s, 1),
        "n": int(n),
        "recall@10_vs_exact_L2": round(hits_l2 / (K * N_QUERIES), 3),
        "recall@10_vs_exact_cosine": round(hits_cos / (K * N_QUERIES), 3),
        "max_relative_distance_error": round(max_rel_dist_err, 5),
    }))


if __name__ == "__main__":
    main()
