#!/usr/bin/env python
"""Deterministic cost-structure profile per query: number of Spark jobs,
stages and tasks one evaluation triggers (count() action, after a
warm-up). Wall-clock on this sandbox is bursty-noisy; job/stage/task
counts are load-independent and directly bound the scheduling floor
(each job ≈ 0.1-0.3 s of fixed cost at local[32]).

Usage: python scripts/opt_jobprofile.py [--sf DIR] query [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from incremental_github_data_pipeline_spark.queries import load_all
    from incremental_github_data_pipeline_spark.session import get_spark

    registry = load_all()
    spark = get_spark(app_name="opt-jobprofile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    for name in args.queries:
        fn = registry[name].fn
        fn(spark, args.sf).count()  # warm-up
        before_jobs = set(tracker.getJobIdsForGroup(None) or [])
        sc.setJobGroup(f"profile-{name}", name)
        fn(spark, args.sf).count()
        sc.setJobGroup(None, None)
        jobs = set(tracker.getJobIdsForGroup(f"profile-{name}") or [])
        n_stages = 0
        n_tasks = 0
        for j in jobs:
            ji = tracker.getJobInfo(j)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None and si.numTasks > 0:
                    n_stages += 1
                    n_tasks += si.numTasks
        print(json.dumps({
            "query": name,
            "jobs": len(jobs),
            "stages": n_stages,
            "tasks": n_tasks,
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
