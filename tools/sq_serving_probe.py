"""Measure the r12 SQ-serving-parity additions against their
alternatives, on the real sf0.1 tables:

1. **Maintenance**: growing an IVF×SQ serving table by a 10 % batch via
   `ivf_sq_table_append` (stored-index encode, one batch_id partition)
   vs rebuilding + re-saving the whole store.
2. **Batch serving**: one `ivf_sq_batch_topk` job for an N-query
   workload vs N sequential `ivf_sq_query` driver round-trips.
3. **Indexed PRF**: `bm25_prf_topk_indexed` (both stages + expansion
   mining from the index) vs the corpus-scan `bm25_prf_topk`.

Numbers land in SCALING.md §SQ serving parity (r12).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import shutil  # noqa: E402
import tempfile  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from ons_utils_spark.operators import similarity as sim  # noqa: E402
from ons_utils_spark.operators import text  # noqa: E402
from ons_utils_spark.session import get_session  # noqa: E402
from ons_utils_spark.sources.tables import load_table  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main() -> None:
    spark = get_session(app_name="sq_serving_probe")
    spark.range(1000).count()
    emb = load_table(spark, SF_DIR, "embeddings").localCheckpoint(eager=True)
    n = emb.count()
    cut = int(n * 0.9)
    print(f"corpus: {n} vectors; base {cut}, batch {n - cut}")

    # --- 1. append vs rebuild -------------------------------------------
    base = emb.where(F.col("vec_id") < cut)
    t0 = time.perf_counter()
    coded, coarse, vmin, vmax = sim.ivf_sq_build(
        base, dim=64, n_lists=16, coarse_iter=2
    )
    idx = sim.make_sq_index(coarse, vmin, vmax)
    store = tempfile.mkdtemp(prefix="sq_probe_")
    sim.save_sq_table(coded, idx, store)
    t_base = time.perf_counter() - t0
    print(f"base build+save ({cut} vecs): {t_base:.2f}s")

    t0 = time.perf_counter()
    sim.ivf_sq_table_append(
        emb.where(F.col("vec_id") >= cut), store, batch_id=0
    )
    t_append = time.perf_counter() - t0

    t0 = time.perf_counter()
    coded2, coarse2, vmin2, vmax2 = sim.ivf_sq_build(
        emb, dim=64, n_lists=16, coarse_iter=2
    )
    idx2 = sim.make_sq_index(coarse2, vmin2, vmax2)
    store2 = tempfile.mkdtemp(prefix="sq_probe_rebuild_")
    sim.save_sq_table(coded2, idx2, store2)
    t_rebuild = time.perf_counter() - t0
    print(
        f"append 10% batch: {t_append:.2f}s vs full rebuild+save "
        f"{t_rebuild:.2f}s -> {t_rebuild / t_append:.1f}x"
    )

    # --- 2. batch vs sequential serving ---------------------------------
    lc, li = sim.load_sq_table(spark, store)
    lc = lc.localCheckpoint(eager=True)
    qids = list(range(0, 64))
    qrows = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.where(F.col("vec_id").isin(qids)).collect()
    }
    t0 = time.perf_counter()
    for qid in qids:
        sim.ivf_sq_query(lc, li, qrows[qid], n_probe=4, topk=10).collect()
    t_seq = time.perf_counter() - t0
    qdf = spark.createDataFrame(
        [(q, qrows[q]) for q in qids],
        "query_id bigint, embedding array<double>",
    )
    t0 = time.perf_counter()
    sim.ivf_sq_batch_topk(lc, li, qdf, n_probe=4, topk=10).collect()
    t_batch = time.perf_counter() - t0
    print(
        f"{len(qids)} queries: sequential {t_seq:.2f}s vs batch "
        f"{t_batch:.2f}s -> {t_seq / t_batch:.1f}x"
    )
    shutil.rmtree(store, ignore_errors=True)
    shutil.rmtree(store2, ignore_errors=True)

    # --- 3. indexed PRF vs scan PRF -------------------------------------
    docs = load_table(spark, SF_DIR, "documents").localCheckpoint(eager=True)
    terms = ["vector", "stream", "merge"]
    t0 = time.perf_counter()
    scan = text.bm25_prf_topk(
        docs, "doc_id", "text", terms, topk=10, fb_docs=10, fb_terms=5
    ).collect()
    t_scan = time.perf_counter() - t0
    t0 = time.perf_counter()
    postings, stats = text.bm25_index_build(docs, "doc_id", "text")
    t_build = time.perf_counter() - t0
    t0 = time.perf_counter()
    idxd = text.bm25_prf_topk_indexed(
        postings, stats, terms, topk=10, fb_docs=10, fb_terms=5
    ).collect()
    t_idx = time.perf_counter() - t0
    assert [tuple(r) for r in idxd] == [tuple(r) for r in scan], "parity!"
    print(
        f"PRF: scan-form {t_scan:.2f}s vs indexed {t_idx:.2f}s "
        f"(one-off index build {t_build:.2f}s) -> {t_scan / t_idx:.1f}x "
        "per query profile, bit-identical results"
    )
    spark.stop()


if __name__ == "__main__":
    main()
