"""Physical-plan audit: flag scale anti-patterns across the query registry.

Checks every query's executed plan for: cartesian products, row-at-a-time
Python eval (BatchEvalPython — Arrow-batched ArrowEvalPython/FlatMapGroups
are fine), global single-partition windows/sorts without a preceding limit,
scans that read every column (no pruning), and Python map stages
(``MapInPandas`` / ``FlatMapGroupsInPandas``) fed by an AQE-coalescible
exchange. That last one is the r2 ``grouped_apply`` bug: a count-less
``repartition(*cols)`` / plain ``groupBy`` exchange is ``ENSURE_REQUIREMENTS``
or ``REPARTITION_BY_COL`` — AQE's byte-based coalescing may collapse it to
ONE partition when shuffle bytes are small, serializing a Python-CPU-heavy
stage onto one core (measured 3.4×). Only ``REPARTITION_BY_NUM``
(explicit-count) exchanges are exempt from coalescing.

Exit 1 if any NEW red flag appears (known, justified exceptions are listed).

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

#: (query, pattern) pairs that are understood and acceptable.
ALLOWED = {
    # 1-row / literal-table broadcast nested loop joins (not a scale risk):
    ("q_similarity_scores", "BroadcastNestedLoopJoin"),
    ("q_similarity_topk", "BroadcastNestedLoopJoin"),
    ("q_range_join", "BroadcastNestedLoopJoin"),
    # tfidf folds the 1-row corpus-size aggregate into the plan as a
    # broadcast cross join against a single-row side (r1 ask #6) — the
    # nested loop runs once per partition against one row.
    ("q_tfidf_top_terms", "BroadcastNestedLoopJoin"),
    # same idiom: the Q11-style global average folds into the plan as a
    # broadcast cross join against a single-row aggregate.
    ("q_heavy_revenue_parts", "BroadcastNestedLoopJoin"),
    # Q15-style global max folded back as a 1-row broadcast cross join.
    ("q_top_revenue_supplier", "BroadcastNestedLoopJoin"),
    # build_vocab mints ids with a single-partition row_number — but its
    # input is the k-row output of TakeOrderedAndProject (bounded small),
    # not the corpus, so the single partition is by construction tiny.
    ("q_build_vocab", "global"),
    ("q_oov_ratio", "global"),
    ("q_rich_idle_customers", "BroadcastNestedLoopJoin"),
    # 1-row broadcast cross joins: the merged-HLL estimate row and the
    # IVF harness's query vector.
    ("q_hll_mergeable", "BroadcastNestedLoopJoin"),
    ("q_similarity_ivf", "BroadcastNestedLoopJoin"),
    # r4 additions of the established 1-row bounds/total broadcast fold
    # (profiling.py:74-77, corpus.py:445) — same idiom as tfidf above: the
    # nested loop's build side is a single aggregate row.
    ("q_heavy_hitters", "BroadcastNestedLoopJoin"),
    # BM25 folds the 1-row (N, avgdl) corpus aggregate into the scoring
    # plan — the same bounded fold idiom as tfidf/heavy_hitters. The
    # indexed form folds the same 1-row stats table read from the
    # persisted index store; curation inherits the fold from bm25_topk.
    ("q_bm25_topk", "BroadcastNestedLoopJoin"),
    ("q_bm25_batch", "BroadcastNestedLoopJoin"),
    ("q_bm25_indexed", "BroadcastNestedLoopJoin"),
    # The deletes and CDC forms serve through the same indexed scorer —
    # the identical 1-row folded-stats broadcast (tombstone watermark
    # filters are equi-joins, checkpointed away before serving).
    ("q_bm25_indexed_deletes", "BroadcastNestedLoopJoin"),
    ("q_bm25_cdc_upsert", "BroadcastNestedLoopJoin"),
    # PRF's stage-2 (expanded-query) scan is the same bm25_scores fold;
    # stage 1 hides behind the contract-bounded collects, stage 2's
    # 1-row stats broadcast lands in the final plan. The indexed form's
    # stage 2 folds the same 1-row stats table.
    ("q_bm25_prf", "BroadcastNestedLoopJoin"),
    ("q_bm25_prf_indexed", "BroadcastNestedLoopJoin"),
    # The batch form's final plan is stage 2's batch indexed scorer —
    # the same 1-row stats fold.
    ("q_bm25_prf_batch", "BroadcastNestedLoopJoin"),
    # Hybrid RRF inherits the lexical half's 1-row stats fold; the
    # fusion itself is equi-joins over k-row ranked lists. The SQ-
    # backend variant inherits the identical lexical half.
    ("q_hybrid_retrieval", "BroadcastNestedLoopJoin"),
    ("q_hybrid_retrieval_sq", "BroadcastNestedLoopJoin"),
    # The RAG ingest-to-serve composition serves its lexical half
    # through the same batch indexed scorer — the identical 1-row
    # folded-stats broadcast cross join, over the CHUNK corpus.
    ("q_rag_ingest_retrieve", "BroadcastNestedLoopJoin"),
    ("q_price_histogram", "BroadcastNestedLoopJoin"),
    ("q_vocab_coverage", "BroadcastNestedLoopJoin"),
    # The temperature-mixture anchor window runs over the |groups|-row
    # counts table (sampling.py:322-334) — bounded small by construction,
    # the same idiom ALLOWED for q_build_vocab. llm_data_pipeline inherits
    # it as its final mixture stage.
    ("q_temperature_mixture", "global"),
    ("q_llm_data_pipeline", "global"),
    # DSIR folds the two distribution totals back as 1-row broadcasts
    # against the persisted (≤ buckets)-row count tables — the same
    # bounded fold idiom as tfidf/heavy_hitters above.
    ("q_dsir_weights", "BroadcastNestedLoopJoin"),
    # PageRank folds the 1-row node count into every iteration's
    # (1-d)/N term — same bounded idiom. The directed variant adds a
    # second 1-row fold per iteration (the dangling-mass total).
    ("q_pagerank", "BroadcastNestedLoopJoin"),
    ("q_pagerank_directed", "BroadcastNestedLoopJoin"),
    # Equi-depth histogram folds its 1-row (boundaries, min, max)
    # aggregate back over the data — same bounded idiom.
    ("q_equi_depth_histogram", "BroadcastNestedLoopJoin"),
    # Count-Min folds the 1-row total (for the bound check) back over
    # the 10-row probe result — same bounded idiom.
    ("q_count_min_sketch", "BroadcastNestedLoopJoin"),
    # Bloom decontamination ships the dense bloom word array as ONE
    # broadcast row the whole corpus cross-joins against — the same
    # bounded 1-row fold idiom (corpus.py::decontaminate_bloom; the row
    # is m_bits/8 bytes by construction, a config, not data-sized).
    ("q_decontaminate_bloom", "BroadcastNestedLoopJoin"),
    # all-pairs near-dup candidate stage is intentionally quadratic in the
    # expression variant; the registered query uses the blocked matmul.
}

_PY_STAGE = re.compile(r"\b(MapInPandas|FlatMapGroupsInPandas)\b")
_SCAN_PATH = re.compile(r"file:[^\],\s]+\.parquet")

#: Queries allowed to scan the SAME file 3+ times because each scan reads
#: a DISJOINT filtered slice (union-of-segments shapes), not the same
#: rows redundantly.
TRIPLE_SCAN_OK = {
    "q_concat_with_keys",
    "q_concat_schema_coercion",
    "q_incremental_agg",  # three year-sliced arrival batches of orders
    # benchmark slice + two corpus passes (gram-derive ids, anti-join
    # output) — the id-based anti-join design, not redundant recompute.
    "q_decontaminate",
    # same shape: benchmark slice + corpus positional-gram pass + the
    # corpus pass the span table joins back onto for the rewrite.
    "q_redacted_corpus",
    # three step-sliced scans, one per funnel step type — disjoint rows.
    "q_funnel_conversion",
    # exact median, then MAD of residuals, then scoring: a genuinely
    # three-pass exact statistic.
    "q_robust_outliers",
    # Harness artifact: the query synthesizes the "new" table version from
    # three disjoint slices of orders (plans/queries.py, q_table_diff); in
    # production the two versions are distinct files and each is scanned
    # once.
    "q_table_diff",
    # Harness artifact: the TARGET sample is a filtered slice of the same
    # documents file, so its one distribution-build scan shares the path
    # with the corpus's two (distribution + scoring). In production the
    # target is a separate small dataset: 2 corpus scans + 1 target scan.
    "q_dsir_weights",
}


def _iter_seq(seq):
    """Iterate a py4j-wrapped Scala Seq."""
    for i in range(seq.size()):
        yield seq.apply(i)


def _identity_hash(jobj) -> int:
    """``System.identityHashCode`` of a py4j-wrapped JVM object.

    The same CachedRDDBuilder INSTANCE is shared by every
    InMemoryRelation over one cache, so its identity hash is a stable
    per-cache token — unlike ``hashCode()``, which is structural and
    could collide across two genuinely distinct caches in one plan.
    Falls back to 0 (keeping only the structural component) if no active
    JVM gateway is reachable.
    """
    try:
        from pyspark import SparkContext

        jvm = SparkContext._active_spark_context._jvm  # noqa: SLF001
        return jvm.java.lang.System.identityHashCode(jobj)
    except Exception:  # noqa: BLE001
        return 0


def real_scan_counts(df) -> dict[str, int]:
    """Count REAL parquet scans per path — a semantic traversal of the
    JVM physical-plan tree, not the plan text.

    Plan TEXT double-counts in three ways the text can't reliably
    distinguish: (a) a lazily-persisted cache prints its child (with its
    FileScan) once per consumer while runtime builds it once; (b) a
    materialized cache's AdaptiveSparkPlan prints BOTH final and initial
    plans; (c) ``== Final Plan ==`` sections RESET indentation, so
    indent-based subtree walks leak cached content into the outer scope
    (this broke on pagerank's nested-cache loop plans). The tree walk
    instead: dedupes ``InMemoryTableScan`` targets by their
    ``CachedRDDBuilder`` (one count per distinct cache, however many
    consumers or nesting levels), follows AdaptiveSparkPlan to its
    CURRENT plan only, and does not recurse into ``Reused*`` nodes
    (a reused exchange/subquery executes zero extra scans).
    """
    counts: dict[str, int] = {}
    seen_caches: set[tuple[int, int]] = set()

    def record_scan(node) -> None:
        try:
            # Semantic: the scan's root paths. The toString() fallback
            # below is NOT reliable — FileSourceScan truncates its
            # Location metadata at spark.sql.maxMetadataStringLength
            # (100 chars), silently dropping long paths.
            paths = node.relation().location().rootPaths()
            for p in _iter_seq(paths):
                key = p.toString()
                counts[key] = counts.get(key, 0) + 1
            return
        except Exception:  # noqa: BLE001
            pass
        m = _SCAN_PATH.search(node.toString().splitlines()[0])
        if m:
            counts[m.group(0)] = counts.get(m.group(0), 0) + 1

    def walk(node) -> None:
        cls = node.getClass().getSimpleName()
        if cls.startswith("Reused"):
            return
        if cls == "FileSourceScanExec":
            record_scan(node)
            # No return: fall through to the subqueries loop below — a
            # scan can carry DPP/scalar-subquery partition filters whose
            # plans scan OTHER tables.
        elif cls == "InMemoryTableScanExec":
            rel = node.relation()
            # Identity-stable dedup key: CachedRDDBuilder.hashCode() is
            # STRUCTURAL, so two genuinely distinct caches could collide
            # and silently undercount scans. System.identityHashCode of
            # the builder object is per-instance (the builder is shared
            # by every InMemoryRelation over the same cache), so distinct
            # caches never merge; pairing it with the structural hash
            # keeps the key unique even across identityHashCode's own
            # (astronomically unlikely) collisions.
            builder = rel.cacheBuilder()
            key = (_identity_hash(builder), builder.hashCode())
            if key not in seen_caches:
                seen_caches.add(key)
                walk(rel.cachedPlan())
            return
        elif cls == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
            return
        elif cls.endswith("QueryStageExec"):
            walk(node.plan())
            return
        else:
            for child in _iter_seq(node.children()):
                walk(child)
        try:
            for sub in _iter_seq(node.subqueries()):
                walk(sub)
        except Exception:  # noqa: BLE001 — not all nodes expose subqueries
            pass

    walk(df._jdf.queryExecution().executedPlan())
    return counts


def redundant_scans(df) -> list[str]:
    """Same parquet path REALLY scanned 3+ times in one executed plan.

    Two scans are common and usually fine (self-joins, build+probe); three
    or more of the SAME path is how the r4 MinHash bug looked — a shared
    aggregate column-pruned into per-consumer copies, silently
    re-scanning (and recomputing everything above the scan) once per
    consumer. Materialize the shared table (localCheckpoint / persist)
    instead.  Counting is cache-aware (see :func:`real_scan_counts`)."""
    return [
        f"redundant-scan {p.rsplit('/', 1)[-1]} x{c}"
        for p, c in real_scan_counts(df).items()
        if c >= 3
    ]


def _indent(line: str) -> int:
    return len(line) - len(line.lstrip(" :+-"))


def coalescible_python_stages(plan: str) -> list[str]:
    """Python map stages whose feeding shuffle AQE may coalesce to 1 partition.

    Walks the plan-tree text: for each MapInPandas/FlatMapGroupsInPandas
    line, the first deeper-indented Exchange below it is its input shuffle.
    ``REPARTITION_BY_NUM`` (explicit count) is AQE-proof; ``SinglePartition``
    or a hash exchange tagged ``ENSURE_REQUIREMENTS``/``REPARTITION_BY_COL``
    is coalescible and gets flagged. A Python stage with NO exchange child
    (narrow map over the scan) inherits the scan parallelism — fine.
    """
    lines = plan.splitlines()
    flagged = []
    for i, line in enumerate(lines):
        m = _PY_STAGE.search(line)
        if not m:
            continue
        depth = _indent(line)
        for below in lines[i + 1:]:
            if "Exchange" in below and "BroadcastExchange" not in below:
                if "SinglePartition" in below:
                    flagged.append(f"{m.group(1)} fed by single-partition exchange")
                elif "REPARTITION_BY_NUM" not in below:
                    flagged.append(
                        f"{m.group(1)} fed by AQE-coalescible exchange "
                        f"(use an explicit-count repartition)"
                    )
                break
            if below.strip() and _indent(below) <= depth:
                break  # left the node's subtree: narrow Python map, fine
    return flagged


def audit(spark, sf_dir: str = SF_DIR) -> list[tuple[str, str]]:
    """Audit every registered query's executed plan; return (name, flags) failures."""
    from ons_utils_spark.plans.queries import QUERIES

    failures = []
    for name, q in QUERIES.items():
        try:
            df = q.spark(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"plan build failed: {e}"))
            print(f"FAIL  {name}: plan build failed: {e}")
            continue
        flags = []
        if "CartesianProduct" in plan:
            flags.append("CartesianProduct")
        if "BatchEvalPython" in plan:
            flags.append("BatchEvalPython (row-at-a-time Python)")
        if re.search(r"Window .*\n.*SinglePartition", plan):
            flags.append("global single-partition window")
        if "BroadcastNestedLoopJoin" in plan and (name, "BroadcastNestedLoopJoin") not in ALLOWED:
            flags.append("BroadcastNestedLoopJoin")
        flags.extend(coalescible_python_stages(plan))
        if name not in TRIPLE_SCAN_OK:
            flags.extend(redundant_scans(df))
        flags = [f for f in flags if (name, f.split()[0]) not in ALLOWED]
        if flags:
            failures.append((name, ", ".join(flags)))
            print(f"FLAG  {name}: {', '.join(flags)}")
        else:
            print(f"ok    {name}")
    print(f"\n{len(failures)} flagged" if failures else "\nall plans clean")
    return failures


def main() -> int:
    from ons_utils_spark.session import get_session

    spark = get_session(app_name="plan_audit", master="local[4]", shuffle_partitions=4)
    return 1 if audit(spark) else 0


if __name__ == "__main__":
    raise SystemExit(main())
