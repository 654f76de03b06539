#!/usr/bin/env python
"""Twentieth sweep (VERDICT r10 task 7) — graph-loop scale: the three
PageRank variants and k-core are the four most expensive bench rows,
and their cost model is rounds × per-round-shuffle. Two claims to
measure on 1M/4M/16M-edge power-law graphs:

1. PER-ROUND COST IS FLAT: wall(iters=6) − wall(iters=2) over 4 rounds
   gives the marginal round; the per-round localCheckpoint contract
   says it must not grow with the round index (no lineage blow-up),
   and the executed-plan length at iters=6 must stay within a small
   constant of iters=2.
2. ROUNDS SCALE LINEARLY IN EDGES: one aggregate shuffle per round →
   per-round wall should track edge count, not worse. The dangling /
   weighted / personalized variants each price one extra bounded step
   per round (a 1-row aggregate broadcast, a per-edge multiply, a
   seed-membership CASE) — their overhead vs the base loop should be
   a constant factor, not a new asymptotic.

k-core's peel is data-dependent in round count: the sweep records
rounds implicitly via wall and the survivor count (the k-core is
unique, so survivor counts double-check the generator's determinism).

Usage: python scripts/scale_graph_loops.py [EDGE_COUNTS...]
       (default: 1000000 4000000 16000000)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from incremental_github_data_pipeline_spark.operators.graph import (  # noqa: E402
    k_core,
    pagerank_integer,
)
from incremental_github_data_pipeline_spark.session import get_spark  # noqa: E402


def make_graph(spark, n_edges: int):
    """Hub-heavy directed graph (dst = floor(n·u^4) concentrates
    in-links on low ids) with a deterministic 1..5 edge weight —
    the same power-law shape as scripts/scale_graph.py."""
    n_nodes = max(1000, n_edges // 10)
    u = (
        F.pmod(F.xxhash64(F.col("id"), F.lit(7)), F.lit(1_000_000))
        / 1_000_000.0
    )
    edges = (
        spark.range(n_edges)
        .select(
            F.pmod(F.xxhash64("id"), F.lit(n_nodes)).alias("src"),
            F.floor(F.lit(n_nodes) * F.pow(u, F.lit(4.0)))
            .cast("long")
            .alias("dst"),
            (1 + F.pmod(F.xxhash64("id", F.lit(3)), F.lit(5))).alias("w"),
        )
        .filter(F.col("src") != F.col("dst"))
        .localCheckpoint()  # pin: timed runs read materialized edges
    )
    return edges, n_nodes


def timed(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


def main() -> None:
    edge_counts = [int(a) for a in sys.argv[1:]] or [
        1_000_000, 4_000_000, 16_000_000,
    ]
    spark = get_spark(app_name="scale-graph-loops")
    spark.sparkContext.setLogLevel("ERROR")
    mid = edge_counts[len(edge_counts) // 2]
    for n_edges in edge_counts:
        edges, n_nodes = make_graph(spark, n_edges)
        real_edges = edges.count()

        variants = {
            "base": dict(),
            "dangling": dict(redistribute_dangling=True),
        }
        if n_edges == mid:
            # variant overhead is a per-round constant — measure it
            # once at the middle scale instead of paying 16M x 4
            variants["weighted"] = dict(weight="w")
            variants["ppr"] = dict(seeds=[0, 1, 2, 3, 4])
        out = [f"edges={real_edges} nodes={n_nodes}"]
        for name, kw in variants.items():
            t2 = timed(
                lambda: pagerank_integer(edges, n_nodes, iters=2, **kw)
                .count()
            )
            t6 = timed(
                lambda: pagerank_integer(edges, n_nodes, iters=6, **kw)
                .count()
            )
            p2 = len(
                pagerank_integer(edges, n_nodes, iters=2, **kw)
                ._jdf.queryExecution().executedPlan().toString()
            )
            p6 = len(
                pagerank_integer(edges, n_nodes, iters=6, **kw)
                ._jdf.queryExecution().executedPlan().toString()
            )
            out.append(
                f"{name}: iters=2 {t2:.2f}s iters=6 {t6:.2f}s "
                f"per-round {(t6 - t2) / 4:.2f}s plan {p2}->{p6}B"
            )
        tk = timed(lambda: k_core(edges, 3).count())
        survivors = k_core(edges, 3).count()
        out.append(f"kcore3: wall {tk:.2f}s survivors {survivors}")
        print(" | ".join(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
