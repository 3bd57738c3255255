"""Dump ``.explain("formatted")`` for named registry queries to files.

Usage: python tools/dump_plans.py <sf_dir> <out_dir> <query> [<query>...]

Writes ``<out_dir>/<query>.txt`` for each name. Queries whose construction
runs driver-side jobs (trainings, store builds) run them here too — the
dumped text is the FINAL DataFrame's formatted plan, the same surface
``tools/plan_audit.py`` audits.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from ons_utils_spark.plans.queries import QUERIES  # noqa: E402
from ons_utils_spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir, out = sys.argv[1], Path(sys.argv[2])
    names = sys.argv[3:]
    out.mkdir(parents=True, exist_ok=True)
    spark = get_session(app_name="dump_plans")
    spark.range(1000).count()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for n in names:
        df = QUERIES[n].spark(spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(mode)
        (out / f"{n}.txt").write_text(txt)
        print("wrote", out / f"{n}.txt", flush=True)


if __name__ == "__main__":
    main()
