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
    # three step-sliced scans, one per funnel step type — disjoint rows.
    "q_funnel_conversion",
    # exact median, then MAD of residuals, then scoring: a genuinely
    # three-pass exact statistic.
    "q_robust_outliers",
}


def redundant_scans(plan: str) -> list[str]:
    """Same parquet path appearing 3+ times in one executed plan.

    Two scans are common and usually fine (self-joins, build+probe); three
    or more of the SAME path is how the r4 MinHash bug looked — a shared
    aggregate column-pruned into per-consumer copies, silently
    re-scanning (and recomputing everything above the scan) once per
    consumer. Materialize the shared table (localCheckpoint / persist)
    instead."""
    counts: dict[str, int] = {}
    for mt in _SCAN_PATH.findall(plan):
        counts[mt] = counts.get(mt, 0) + 1
    return [
        f"redundant-scan {p.rsplit('/', 1)[-1]} x{c}"
        for p, c in counts.items()
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


def main() -> int:
    from ons_utils_spark.plans.queries import QUERIES
    from ons_utils_spark.session import get_session

    spark = get_session(app_name="plan_audit", master="local[4]", shuffle_partitions=4)
    failures = []
    for name, q in QUERIES.items():
        try:
            df = q.spark(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"plan build failed: {e}"))
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
            flags.extend(redundant_scans(plan))
        flags = [f for f in flags if (name, f.split()[0]) not in ALLOWED]
        if flags:
            failures.append((name, ", ".join(flags)))
            print(f"FLAG  {name}: {', '.join(flags)}")
        else:
            print(f"ok    {name}")
    print(f"\n{len(failures)} flagged" if failures else "\nall plans clean")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
