#!/usr/bin/env python
"""Blocked-linkage scale sweep (r10 — sweep 18): the new
``operators/linkage.blocked_linkage`` family's 100 TB claim is that
the block-key equi-join makes candidate count OUTPUT-SENSITIVE —
Σ_b |L_b|·|R_b| instead of |L|·|R| — and that wall tracks candidates,
not the cross product. This script links L vs R at growing sizes with
a fixed block-key domain (so candidates grow linearly in |L| when |R|
per block is held) and with block cardinality swept (so the same data
gets cheaper as blocking gets finer), measuring candidate count and
wall for each.

Usage: python scripts/scale_linkage.py [SCALES...]   (default: 1 10 50)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_L = 20_000
N_R = 5_000


def main() -> None:
    scales = [int(a) for a in sys.argv[1:]] or [1, 10, 50]
    from pyspark.sql import functions as F

    from incremental_github_data_pipeline_spark.operators.linkage import (
        FieldComparator,
        blocked_linkage,
    )
    from incremental_github_data_pipeline_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    comps = [
        FieldComparator("name", "name", "name", agree=2000, disagree=-500,
                        mode="suffix:4"),
        FieldComparator("qty", "qty", "qty", agree=1000, disagree=-200,
                        mode="abs_diff:10"),
    ]

    def frames(n_l: int, n_blocks: int):
        left = spark.range(n_l).select(
            F.col("id").alias("left_id"),
            (F.col("id") % n_blocks).alias("blk"),
            F.format_string("e%07d", (F.col("id") % 9973)).alias("name"),
            (F.col("id") % 1000).alias("qty"),
        )
        right = spark.range(N_R).select(
            F.col("id").alias("right_id"),
            (F.col("id") % n_blocks).alias("blk"),
            F.format_string("e%07d", (F.col("id") % 9973)).alias("name"),
            ((F.col("id") * 7) % 1000).alias("qty"),
        )
        return left, right

    print("== |L| sweep at 1,000 blocks (candidates grow linearly in |L|)")
    for scale in scales:
        n_l = BASE_L * scale
        left, right = frames(n_l, 1_000)
        out = blocked_linkage(left, right, ["blk"], comps, 2500, -600)

        def run():
            # force the comparator + score lanes, not just the join:
            # count() alone would let Catalyst prune every CASE lane
            r = out.agg(
                F.count(F.lit(1)).alias("n"), F.sum("score").alias("s")
            ).collect()[0]
            return r["n"]

        run()  # warm-up
        walls = []
        for _ in range(3):
            t0 = time.time()
            n_cand = run()
            walls.append(time.time() - t0)
        cross = n_l * N_R
        print(
            f"  |L|={n_l:9,d}: candidates {n_cand:12,d} "
            f"({n_cand / cross:.4%} of cross product)  "
            f"wall {statistics.median(walls):6.2f} s"
        )

    print("== block-cardinality sweep at fixed |L| (finer blocking → fewer candidates)")
    n_l = BASE_L * scales[-1]
    for n_blocks in (100, 1_000, 10_000):
        left, right = frames(n_l, n_blocks)
        out = blocked_linkage(left, right, ["blk"], comps, 2500, -600)

        def run():
            r = out.agg(
                F.count(F.lit(1)).alias("n"), F.sum("score").alias("s")
            ).collect()[0]
            return r["n"]

        run()
        walls = []
        for _ in range(3):
            t0 = time.time()
            n_cand = run()
            walls.append(time.time() - t0)
        print(
            f"  blocks={n_blocks:6,d}: candidates {n_cand:12,d}  "
            f"wall {statistics.median(walls):6.2f} s"
        )

    spark.stop()


if __name__ == "__main__":
    main()
