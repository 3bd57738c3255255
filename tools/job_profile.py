"""Per-job profile of one registry query: job count, per-job wall time,
and the job description/group, from the Spark event log.

The flagships' remaining cost is many small driver-blocking jobs (store
protocol phases), which per-stage UI timings can't attribute without a
live UI. This runs ONE query with the event log enabled, then parses
SparkListenerJobStart/JobEnd for (job id, description, wall ms) so the
job tail is visible and attributable.

Usage: python tools/job_profile.py q_name [q_name ...] [--sf DIR] [-k 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("-k", type=int, default=2, help="runs per query; all runs logged")
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    evdir = tempfile.mkdtemp(prefix="sparkev_")

    from ons_utils_spark.plans.queries import QUERIES
    from ons_utils_spark.session import get_session

    spark = get_session(
        app_name="job_profile",
        extra_configs={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.range(1000).count()
    from ons_utils_spark.sources.tables import load_table

    load_table(spark, args.sf, "region").groupBy("r_name").count().collect()
    n_workers = spark.sparkContext.defaultParallelism

    def _warm(batches):
        import numpy as np

        (np.ones((256, 256)) @ np.ones((256, 256))).sum()
        for pdf in batches:
            yield pdf.groupby("id", sort=False).sum().reset_index()

    spark.range(n_workers * 4).repartition(n_workers).mapInPandas(
        _warm, "id long"
    ).count()

    for name in args.queries:
        q = QUERIES[name]
        for i in range(args.k):
            spark.sparkContext.setJobGroup(f"prof_{name}_{i}", name)
            t0 = time.perf_counter()
            q.spark(spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            print(
                f"RUN {name} #{i}: {time.perf_counter() - t0:.3f}s",
                flush=True,
            )
            spark.catalog.clearCache()
    app_id = spark.sparkContext.applicationId
    spark.stop()

    # Parse the event log: job start/end + description + group.
    log_path = None
    for p in Path(evdir).iterdir():
        if app_id in p.name:
            log_path = p
            break
    if log_path is None:
        print(f"no event log found in {evdir}", file=sys.stderr)
        sys.exit(1)
    if log_path.is_dir():  # Spark 4 rolling event-log layout
        lines = []
        for f in sorted(log_path.iterdir()):
            if f.name.startswith("events_"):
                lines.extend(open(f))
    else:
        lines = list(open(log_path))
    starts: dict[int, dict] = {}
    rows = []
    for line in lines:
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        if ev.get("Event") == "SparkListenerJobStart":
            props = ev.get("Properties", {}) or {}
            infos = ev.get("Stage Infos", []) or []
            names = [i.get("Stage Name", "") for i in infos]
            # The job's RESULT stage callsite is the most recent stage
            # (highest id) — the earlier ones are reused/parent stages.
            name = names[-1] if names else ""
            starts[ev["Job ID"]] = {
                "t0": ev["Submission Time"],
                "desc": props.get("spark.job.description", ""),
                "group": props.get("spark.jobGroup.id", ""),
                "stages": len(ev.get("Stage IDs", [])),
                "callsite": name[:110],
            }
        elif ev.get("Event") == "SparkListenerJobEnd":
            jid = ev["Job ID"]
            if jid in starts:
                s = starts[jid]
                rows.append(
                    (
                        jid,
                        s["group"],
                        (ev["Completion Time"] - s["t0"]) / 1000.0,
                        s["stages"],
                        s["callsite"],
                        s["desc"],
                    )
                )
    for grp in sorted({r[1] for r in rows if r[1].startswith("prof_")}):
        grows = [r for r in rows if r[1] == grp]
        total = sum(r[2] for r in grows)
        print(f"\n== {grp}: {len(grows)} jobs, {total:.3f}s job-wall ==")
        for jid, _, dur, nst, cs, desc in grows:
            print(f"  job {jid:4d} {dur:7.3f}s stages={nst:2d} {cs}  {desc[:60]}")
    print(f"\nevent log: {log_path}")


if __name__ == "__main__":
    main()
