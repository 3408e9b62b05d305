"""Per-job profile of one suite query (optimization rounds).

Usage: python tools/profile_query.py [--sf DIR] [--runs N] name [name ...]

Runs each named suite query warm+N timed (bench methodology: count()
forces the full plan), with the Spark UI enabled, and prints the
per-job wall-clock breakdown of the LAST timed run from the UI REST
API — job description, duration, stage/task counts — so optimization
targets the jobs that actually cost time instead of the plan we
imagine. Also prints total per run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from automated_data_pipeline_spark.session import get_spark
    from automated_data_pipeline_spark.suite import all_specs

    spark = get_spark(
        "adp-profile", extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4049"}
    )
    ui = "http://localhost:4049"
    app_id = spark.sparkContext.applicationId
    specs = {s.name: s for s in all_specs()}

    for name in args.names:
        fn = specs[name].fn
        fn(spark, args.sf).count()  # warm
        times = []
        first_job_after_warm = None
        for i in range(args.runs):
            if i == args.runs - 1:
                jobs = json.load(
                    urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs")
                )
                first_job_after_warm = max((j["jobId"] for j in jobs), default=-1)
            t0 = time.time()
            fn(spark, args.sf).count()
            times.append(time.time() - t0)
        jobs = json.load(
            urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs")
        )
        new = [j for j in jobs if j["jobId"] > (first_job_after_warm or -1)]
        new.sort(key=lambda j: j["jobId"])
        print(f"\n=== {name}: runs={['%.2f' % t for t in times]} "
              f"(last-run jobs: {len(new)})")
        for j in new:
            t0 = j.get("submissionTime", "")
            t1 = j.get("completionTime", "")
            dur = ""
            try:
                from datetime import datetime

                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                d0 = datetime.strptime(t0.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
                d1 = datetime.strptime(t1.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
                dur = f"{(d1 - d0).total_seconds():6.2f}s"
            except Exception:
                dur = "?"
            desc = (j.get("description") or j.get("name") or "")[:110]
            print(f"  job {j['jobId']:4d} {dur} tasks={j.get('numTasks', 0):4d} {desc}")


if __name__ == "__main__":
    main()
