"""operators.graph — PageRank and triangle counting on known graphs
(the oracle queries in queries/ext_graph.py cover the bulk path)."""

from __future__ import annotations

from itertools import combinations

from incremental_github_data_pipeline_spark.operators.graph import (
    pagerank_integer,
    triangle_count,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_triangles_complete_k4(spark):
    k4 = _edges(spark, list(combinations(range(4), 2)))
    got = sorted(tuple(r) for r in triangle_count(k4).collect())
    assert got == [(0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)]


def test_triangles_cycle_has_none(spark):
    c5 = _edges(spark, [(i, (i + 1) % 5) for i in range(5)])
    assert triangle_count(c5).count() == 0


def test_triangles_ignore_direction_duplicates_and_self_loops(spark):
    messy = _edges(
        spark,
        [(0, 1), (1, 0), (1, 2), (2, 0), (0, 2), (2, 2), (1, 2)],
    )
    got = [tuple(r) for r in triangle_count(messy).collect()]
    assert got == [(0, 1, 2)]


def test_pagerank_two_cycle_fixed_point(spark):
    # 0 <-> 1: the uniform start is the exact fixed point of the
    # integer recurrence (base 75e9 + 85% of 500e9 = 500e9).
    e = _edges(spark, [(0, 1), (1, 0)])
    ranks = {r["node"]: r["rank"] for r in pagerank_integer(e, 2, iters=3).collect()}
    assert ranks == {0: 500_000_000_000, 1: 500_000_000_000}


def test_pagerank_star_concentrates_on_hub(spark):
    e = _edges(spark, [(1, 0), (2, 0), (3, 0)])
    ranks = {r["node"]: r["rank"] for r in pagerank_integer(e, 4, iters=5).collect()}
    base = 15 * 10**12 // (100 * 4)
    # leaves have no in-links: they sit exactly on the teleport floor
    assert ranks[1] == ranks[2] == ranks[3] == base
    assert ranks[0] > 3 * base  # the hub holds the accumulated mass
    assert len(ranks) == 4
