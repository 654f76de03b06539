#!/usr/bin/env python
"""Graph-family scale sweep (VERDICT r4 task 6): replicate a skewed
(power-law-ish) synthetic graph at 1x/10x/50x and measure

- PageRank per-iteration cost (wall for iters=1 vs iters=5, so the
  derived per-round number excludes the one-time scan/degree setup),
- triangle counting's wedge-join growth, with the naive wedge bound
  sum C(deg,2) next to the ORIENTED bound sum C(outdeg,2) the
  min-degree orientation actually pays — the claim in
  operators/graph.py:100 made measurable.

The generator is hub-heavy by construction: dst = floor(n * u^4) for
uniform u concentrates in-links on low ids (node 0 is the hub), the
shape that makes an unoriented wedge join blow up as deg(hub)^2.

Usage: python scripts/scale_graph.py [SCALES...]   (default: 1 10 50)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from incremental_github_data_pipeline_spark.operators.graph import (  # noqa: E402
    pagerank_integer,
    triangle_count,
)
from incremental_github_data_pipeline_spark.session import get_spark  # noqa: E402

BASE_NODES = 20_000
BASE_EDGES = 200_000


def make_graph(spark, scale: int):
    n_nodes = BASE_NODES * scale
    n_edges = BASE_EDGES * scale
    u = (F.pmod(F.xxhash64(F.col("id"), F.lit(7)), F.lit(1_000_000))
         / 1_000_000.0)
    edges = (
        spark.range(n_edges)
        .select(
            F.pmod(F.xxhash64("id"), F.lit(n_nodes)).alias("src"),
            F.floor(F.lit(n_nodes) * F.pow(u, F.lit(4.0)))
            .cast("long")
            .alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .localCheckpoint()  # pin the graph so every timed run reads
        # the same materialized edges, not a re-generation
    )
    return edges, n_nodes


def wedge_bounds(edges) -> tuple[int, int]:
    """(naive sum C(deg,2), oriented sum C(outdeg,2)) over the
    canonical undirected edge set — mirrors triangle_count's
    orientation to quantify what it saves."""
    und = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("n"))
        .unionAll(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    naive = deg.agg(
        F.sum(F.expr("d * (d - 1) div 2")).alias("w")
    ).collect()[0]["w"]
    ranked = (
        und.join(deg.withColumnRenamed("n", "a").withColumnRenamed("d", "da"), "a")
        .join(deg.withColumnRenamed("n", "b").withColumnRenamed("d", "db"), "b")
    )
    lo_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    outdeg = (
        ranked.select(
            F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("u")
        )
        .groupBy("u")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    oriented = outdeg.agg(
        F.sum(F.expr("d * (d - 1) div 2")).alias("w")
    ).collect()[0]["w"]
    return int(naive), int(oriented)


def main() -> None:
    scales = [int(a) for a in sys.argv[1:]] or [1, 10, 50]
    spark = get_spark(app_name="scale-graph")
    spark.sparkContext.setLogLevel("ERROR")
    for scale in scales:
        edges, n_nodes = make_graph(spark, scale)
        n_edges = edges.count()

        t0 = time.time()
        pagerank_integer(edges, n_nodes, iters=1).count()
        t1 = time.time() - t0
        t0 = time.time()
        pagerank_integer(edges, n_nodes, iters=5).count()
        t5 = time.time() - t0
        per_round = (t5 - t1) / 4

        naive_w, oriented_w = wedge_bounds(edges)
        t0 = time.time()
        n_tri = triangle_count(edges).count()
        t_tri = time.time() - t0

        print(
            f"scale={scale}x nodes={n_nodes} edges={n_edges} | "
            f"pagerank iters=1 {t1:.2f}s iters=5 {t5:.2f}s "
            f"per-round {per_round:.2f}s | "
            f"triangles={n_tri} wall={t_tri:.2f}s "
            f"wedges naive={naive_w} oriented={oriented_w} "
            f"(x{naive_w / max(oriented_w, 1):.1f} saved)",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
