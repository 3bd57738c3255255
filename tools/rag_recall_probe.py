"""Measure the RAG serving path's retrieval quality honestly.

The ANN half of `q_rag_ingest_retrieve` serves hash-embedded chunks
through IVF×SQ (4 lists, probe 2, SQ8) — two lossy steps stack: IVF
pruning (unprobed lists never scored) and the SQ codec (decoded-grid
distances). This probe quantifies both against ground truth at the
pipeline's own parameters: sample K chunks as queries, compute exact
squared-L2 top-10 over the RAW hash embeddings (brute force — the
baseline the brief names), then the served IVF×SQ top-10, and report
mean recall@10 plus the codec-only recall (full scan, no pruning) so
the loss attributes to the right stage.

Usage: python tools/rag_recall_probe.py [sf_dir] [n_queries]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from ons_utils_spark.operators import similarity as _sim  # noqa: E402
from ons_utils_spark.operators import text as _text  # noqa: E402
from ons_utils_spark.plans.queries import (  # noqa: E402
    _RAG_CHUNK, _RAG_DIM, _RAG_LISTS, _RAG_OVERLAP, _RAG_PROBE,
)
from ons_utils_spark.session import get_session  # noqa: E402
from ons_utils_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    topk = 10

    spark = get_session(app_name="rag_recall_probe")
    docs = load_table(spark, sf_dir, "documents")
    emb = _text.hash_embed(
        _text.chunk_documents(
            docs, "doc_id", "text",
            chunk_tokens=_RAG_CHUNK, overlap=_RAG_OVERLAP,
        ).select(
            (F.col("id") * 1000 + F.col("chunk_id")).cast("long")
            .alias("vec_id"),
            "chunk_text",
        ),
        "chunk_text", dim=_RAG_DIM,
    ).select("vec_id", "embedding").localCheckpoint(eager=True)

    coded, coarse, vmin, vmax = _sim.ivf_sq_build(
        emb, dim=_RAG_DIM, n_lists=_RAG_LISTS, coarse_iter=2,
    )
    idx = _sim.make_sq_index(coarse, vmin, vmax)
    coded = coded.localCheckpoint(eager=True)

    # deterministic query sample: every ceil(n/n_q)-th chunk by id
    ids = [r["vec_id"] for r in emb.select("vec_id").orderBy("vec_id").collect()]
    step = max(len(ids) // n_q, 1)
    q_ids = ids[::step][:n_q]
    qrows = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.where(F.col("vec_id").isin(q_ids)).collect()
    }

    import numpy as np

    rows = emb.collect()
    mat = np.array([[float(x) for x in r["embedding"]] for r in rows])
    all_ids = np.array([r["vec_id"] for r in rows])

    def exact_topk(q):
        d = ((mat - np.array(q)) ** 2).sum(axis=1)
        order = np.lexsort((all_ids, d))
        # squared L2 between integer count vectors is INTEGER-valued,
        # so ties are massive; also return the 10th-best distance so
        # tie-aware recall can count any equally-near result correct.
        return (
            set(all_ids[order[:topk]].tolist()),
            float(d[order[topk - 1]]),
            {int(i): float(x) for i, x in zip(all_ids, d)},
        )

    served_hits = codec_hits = 0
    served_tie_hits = 0
    queries = spark.createDataFrame(
        [(int(i), qrows[i]) for i in q_ids],
        "query_id bigint, embedding array<double>",
    )
    served = _sim.ivf_sq_batch_topk(
        coded, idx, queries, n_probe=_RAG_PROBE, topk=topk
    ).collect()
    full = _sim.ivf_sq_batch_topk(
        coded, idx, queries, n_probe=_RAG_LISTS, topk=topk
    ).collect()
    by_q: "dict[int, set]" = {}
    for r in served:
        by_q.setdefault(r["query_id"], set()).add(r["id"])
    by_q_full: "dict[int, set]" = {}
    for r in full:
        by_q_full.setdefault(r["query_id"], set()).add(r["id"])
    for qid in q_ids:
        truth, kth_dist, dist_of = exact_topk(qrows[qid])
        got = by_q.get(qid, set())
        served_hits += len(truth & got)
        codec_hits += len(truth & by_q_full.get(qid, set()))
        served_tie_hits += sum(
            1 for i in got if dist_of.get(int(i), float("inf")) <= kth_dist
        )

    denom = len(q_ids) * topk
    print(json.dumps({
        "sf_dir": sf_dir,
        "n_chunks": len(all_ids),
        "n_queries": len(q_ids),
        "dim": _RAG_DIM,
        "config": f"IVF{_RAG_LISTS},SQ8 probe {_RAG_PROBE}",
        "recall_at_10_served": round(served_hits / denom, 3),
        "recall_at_10_codec_only (full probe)": round(
            codec_hits / denom, 3
        ),
        "recall_at_10_served_tie_aware": round(
            served_tie_hits / denom, 3
        ),
    }))


if __name__ == "__main__":
    main()
