"""OPQ recall probe: does the learned rotation beat raw-axis PQ on the
real embeddings, and by how much?

For each (m, k) config: train plain PQ on the raw vectors and the same
PQ on OPQ-rotated vectors (rotation from ``pq.opq_train`` — orthogonal,
so exact L2 geometry and therefore the ground truth are identical), and
compare ADC recall@K against the exact top-K. Also prints the
quantization objective (mean squared reconstruction error) both ways —
OPQ should reduce it even when recall saturates.

Usage: python tools/opq_recall_probe.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
K = 10
N_QUERIES = 50
CONFIGS = [(4, 16, 1), (8, 16, 1), (8, 64, 2)]


def main() -> None:
    import numpy as np

    from ons_utils_spark.operators import pq
    from ons_utils_spark.session import get_session

    spark = get_session(app_name="opq_recall_probe")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    X = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    n, dim = X.shape
    qidx = list(range(0, n, max(1, n // N_QUERIES)))[:N_QUERIES]

    def exact_topk(base: "np.ndarray", qi: int) -> set:
        d2 = ((base - base[qi]) ** 2).sum(axis=1)
        d2[qi] = np.inf
        return set(np.argsort(d2, kind="stable")[:K].tolist())

    def adc_recall(coded, books, base: "np.ndarray") -> float:
        # Codes collected ONCE, ADC replayed vectorized — the probe
        # measures recall, not Spark; one query's Spark-vs-numpy ADC
        # parity is already pinned by the PQ oracle queries.
        m = len(books)
        sub_d = dim // m
        got_rows = sorted(
            ((r["id"], r["codes"]) for r in coded.collect())
        )
        codes = np.asarray([c for _, c in got_rows], dtype=np.int64)
        mats = [np.asarray(cb, dtype=np.float64) for cb in books]
        hits = 0
        for qi in qidx:
            q = base[qi]
            dist = np.zeros(len(codes))
            for i in range(m):
                s = q[i * sub_d:(i + 1) * sub_d]
                lut = (
                    np.einsum("ij,ij->i", mats[i], mats[i])
                    + s @ s
                    - 2.0 * (mats[i] @ s)
                )
                dist += lut[codes[:, i]]
            dist[qi] = np.inf
            got = set(np.argsort(dist, kind="stable")[:K].tolist())
            hits += len(exact_topk(base, qi) & got)
        return hits / (K * len(qidx))

    def mse(base: "np.ndarray", books) -> float:
        m = len(books)
        sub_d = dim // m
        err = 0.0
        for i in range(m):
            S = base[:, i * sub_d:(i + 1) * sub_d]
            C = np.asarray(books[i])
            d2 = (
                np.einsum("ij,ij->i", S, S)[:, None]
                + np.einsum("ij,ij->i", C, C)[None, :]
                - 2.0 * (S @ C.T)
            )
            err += d2.min(axis=1).sum()
        return err / len(base)

    for m, k, n_iter in CONFIGS:
        t0 = time.time()
        R = pq.opq_train(
            emb, dim=dim, m=m, k=k, n_iter=max(4, n_iter * 4), opq_iter=6
        )
        t_train = time.time() - t0
        Rm = np.asarray(R)
        rot = pq.rotate_vectors(emb, "embedding", R)
        Xr = X @ Rm.T
        cp, bp = pq.pq_build(emb, dim=dim, m=m, k=k, n_iter=n_iter)
        co, bo = pq.pq_build(rot, dim=dim, m=m, k=k, n_iter=n_iter)
        r_plain = adc_recall(cp, bp, X)
        r_opq = adc_recall(co, bo, Xr)
        print(
            f"m={m} k={k}: recall@{K} plain={r_plain:.3f} "
            f"opq={r_opq:.3f} | mse plain={mse(X, bp):.4f} "
            f"opq={mse(Xr, bo):.4f} | opq_train {t_train:.1f}s"
        )


if __name__ == "__main__":
    main()
