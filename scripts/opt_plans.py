#!/usr/bin/env python
"""Dump `.explain("formatted")` for a list of queries into
plans/r15/<query>_<tag>.txt (no timing — evidence capture for
OPTIMIZATION_r15.md).

Usage: python scripts/opt_plans.py --tree /path --tag before q1 q2 ...
"""

from __future__ import annotations

import argparse
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tree", default=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    ap.add_argument("--tag", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    sys.path.insert(0, args.tree)
    from incremental_github_data_pipeline_spark.queries import load_all
    from incremental_github_data_pipeline_spark.session import get_spark

    out_dir = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r15",
    )
    os.makedirs(out_dir, exist_ok=True)
    registry = load_all()
    spark = get_spark(app_name=f"opt-plans-{args.tag}")
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in args.queries:
        try:
            df = registry[name].fn(spark, args.sf)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as ex:  # noqa: BLE001
            plan = f"ERROR {type(ex).__name__}: {ex}"
        with open(os.path.join(out_dir, f"{name}_{args.tag}.txt"), "w") as fh:
            fh.write(plan)
        print("wrote", name, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
