#!/usr/bin/env python
"""r16: measure the EXTRA_LANES serving paths (x_bm25_serving,
x_hybrid_serving, ...) with the bench methodology (setup untimed,
warm-up + median-of-3 timed runs) plus a job/stage/task profile per
lane — the x lanes have no registry entry, so opt_measure.py cannot
time them.

Usage: python scripts/opt_serving.py [--sf DIR] [lane ...]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("lanes", nargs="*")
    args = ap.parse_args()

    import bench
    from incremental_github_data_pipeline_spark.session import get_spark

    lanes = {name: (setup, run) for name, setup, run in bench.EXTRA_LANES}
    names = args.lanes or list(lanes)

    spark = get_spark(app_name="opt-serving")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    for name in names:
        setup, run = lanes[name]
        state = setup(spark, args.sf)  # untimed
        run(spark, state)  # warm-up
        passes = []
        for p in range(3):
            sc.setJobDescription(f"{name}: pass {p}")
            t0 = time.time()
            run(spark, state)
            passes.append(time.time() - t0)
        sc.setJobDescription(None)
        sc.setJobGroup(f"profile-{name}", name)
        run(spark, state)
        sc.setJobGroup(None, None)
        jobs = set(tracker.getJobIdsForGroup(f"profile-{name}") or [])
        n_stages = n_tasks = 0
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
            "lane": name,
            "med_sec": round(statistics.median(passes), 3),
            "jobs": len(jobs),
            "stages": n_stages,
            "tasks": n_tasks,
        }), flush=True)
    import shutil

    for tmp in bench._BENCH_TMP:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
