#!/usr/bin/env python
"""Round-9 operator sweep: measure the three new scale claims.

A — k-core: "rounds = peeling depth, not |V|". The same quadratic
    generation rule at N ∈ {400, 4k, 40k} keeps the degree structure
    (and therefore the peel depth) roughly constant while the graph
    grows 100×; wall should track |E| — one degree aggregate + two
    semi-joins per round — not rounds × something super-linear. The
    script computes the TRUE peel depth driver-side from the same
    closed-form edges and asserts the Spark core matches it exactly.

B — Theil-Sen: "pairs are O(grid²) BY CONTRACT". Grid lengths
    g ∈ {200, 600, 1800} (9× pairs per step); wall should track the
    pair count — the visible reason the operator takes pre-aggregated
    series and bounds g by a parameter, never by raw data volume.

C — HLL ingest: "state is groups × 2^p regardless of input". Sketch
    1×/10×/100× more keys through hll_registers; state row count must
    stay ≤ 2^p per group while wall stays scan-bound, and the estimate
    error stays inside the 1.04/√m band's neighborhood.

Usage: python scripts/scale_round9_ops.py
"""

from __future__ import annotations

import collections
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, reps: int = 3) -> float:
    fn()  # warm-up
    return statistics.median(
        [(lambda t0: (fn(), time.time() - t0)[1])(time.time()) for _ in range(reps)]
    )


def main() -> None:
    from pyspark.sql import functions as F

    from incremental_github_data_pipeline_spark.operators.graph import k_core
    from incremental_github_data_pipeline_spark.operators.incremental_agg import (
        hll_estimate,
        hll_registers,
    )
    from incremental_github_data_pipeline_spark.operators.timeseries import (
        theil_sen_slope,
    )
    from incremental_github_data_pipeline_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    print("== A: k-core (k=4, quadratic edge maps)")
    for n in (400, 4_000, 40_000):
        nodes = spark.range(n).select(F.col("id").alias("node"))
        parts = [
            nodes.select(
                F.col("node").alias("src"),
                ((F.col("node") * F.col("node") + 3) % n).alias("dst"),
            ),
            nodes.select(
                F.col("node").alias("src"),
                ((F.col("node") * 7 + 1) % n).alias("dst"),
            ),
            nodes.select(
                F.col("node").alias("src"),
                ((F.col("node") * F.col("node") * 3 + 11) % n).alias("dst"),
            ),
        ]
        e = parts[0].unionAll(parts[1]).unionAll(parts[2]).filter(
            F.col("src") != F.col("dst")
        ).distinct()
        # driver-side truth: peel depth + core size from the same rule
        adj = collections.defaultdict(set)
        for i in range(n):
            for d in ((i * i + 3) % n, (i * 7 + 1) % n, (i * i * 3 + 11) % n):
                if d != i:
                    adj[i].add(d)
                    adj[d].add(i)
        alive = set(adj)
        rounds = 0
        while True:
            drop = {
                v for v in alive if sum(1 for u in adj[v] if u in alive) < 4
            }
            if not drop:
                break
            alive -= drop
            rounds += 1
        wall = timed(lambda: k_core(e, 4).count())
        got = k_core(e, 4).count()
        assert got == len(alive), (got, len(alive))
        print(
            f"  N={n:6d}: core {got:6d} ({100 * got // max(n, 1)}%), "
            f"TRUE peel rounds {rounds}, wall {wall:6.2f} s"
        )

    print("== B: Theil-Sen (pairs = g(g-1)/2 per key, 4 keys)")
    for g in (200, 600, 1_800):
        pts = spark.range(4 * g).select(
            (F.col("id") % 4).cast("string").alias("k"),
            (F.col("id") / 4).cast("long").alias("x"),
            ((F.col("id") / 4) * 3 + (F.col("id") % 17)).cast("long").alias("y"),
        )
        wall = timed(lambda: theil_sen_slope(pts, "k", "x", "y").count())
        print(
            f"  g={g:5d}: pairs/key {g * (g - 1) // 2:9,d}, wall {wall:6.2f} s"
        )

    print("== C: HLL registers (p=8 -> 256 registers/group, 4 groups)")
    for n in (10_000, 100_000, 1_000_000):
        df = spark.range(n).select(
            (F.col("id") % 4).cast("string").alias("g"),
            (F.col("id") * 7 + 1).alias("k"),
        )
        wall = timed(lambda: hll_registers(df, "g", "k", p=8).count())
        regs = hll_registers(df, "g", "k", p=8)
        n_state = regs.count()
        est = {
            r["g"]: r["hll_est"]
            for r in hll_estimate(regs, "g", p=8).collect()
        }
        err = max(abs(v - n / 4) / (n / 4) for v in est.values())
        print(
            f"  n={n:9,d}: state rows {n_state:4d} (cap 1024), "
            f"max |err| {100 * err:4.1f}%, wall {wall:6.2f} s"
        )

    spark.stop()


if __name__ == "__main__":
    main()
