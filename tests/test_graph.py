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


def test_pagerank_dangling_redistribution_conserves_mass(spark):
    """r10: on a star whose hub is a SINK (1->0, 2->0, 3->0), the
    simplified variant leaks the hub's mass every round; with
    redistribute_dangling the total stays at the scale (up to the
    bounded integral-division remainders) and the hub's mass flows
    back to everyone."""
    e = _edges(spark, [(1, 0), (2, 0), (3, 0)])
    scale = 10**12
    drop = pagerank_integer(e, 4, iters=5, scale=scale)
    keep = pagerank_integer(
        e, 4, iters=5, scale=scale, redistribute_dangling=True
    )
    t_drop = sum(r["rank"] for r in drop.collect())
    t_keep = sum(r["rank"] for r in keep.collect())
    # simplified variant has leaked a large share of the mass
    assert t_drop < 0.8 * scale
    # redistribution conserves it: each round loses at most
    # n_nodes remainders from the div n share + div 100 damping
    assert t_keep > 0.999 * scale
    assert t_keep <= scale
    ranks = {r["node"]: r["rank"] for r in keep.collect()}
    base = 15 * scale // (100 * 4)
    # leaves now hold MORE than the teleport floor (the hub's mass
    # comes back to them), and the hub still dominates
    assert all(ranks[i] > base for i in (1, 2, 3))
    assert ranks[0] > ranks[1]


def test_personalized_pagerank_concentrates_near_seeds(spark):
    """r10: on a path 0 -> 1 -> 2 -> 3 with seed {0}, rank must decay
    with distance from the seed, non-seeds hold no teleport floor, and
    mass is conserved when dangling redistribution is on."""
    e = _edges(spark, [(0, 1), (1, 2), (2, 3)])
    scale = 10**12
    ranks = {
        r["node"]: r["rank"]
        for r in pagerank_integer(
            e, 4, iters=8, scale=scale, seeds=[0],
            redistribute_dangling=True,
        ).collect()
    }
    assert ranks[0] > ranks[1] > ranks[2] > ranks[3]
    total = sum(ranks.values())
    assert total > 0.999 * scale
    # uniform vs personalized must genuinely differ
    uni = {
        r["node"]: r["rank"]
        for r in pagerank_integer(
            e, 4, iters=8, scale=scale, redistribute_dangling=True
        ).collect()
    }
    assert uni != ranks
    import pytest as _pytest

    with _pytest.raises(ValueError, match="non-empty"):
        pagerank_integer(e, 4, seeds=[])


def test_weighted_pagerank_follows_the_heavy_edge(spark):
    """r10: 0 splits rank 9:1 between 1 and 2 — node 1 must outrank
    node 2; unit weights must NOT equal the unweighted variant
    bit-for-bit (shared div deg vs per-edge div remainders), and
    non-positive weights fail loudly."""
    import pytest as _pytest

    e = spark.createDataFrame(
        [(0, 1, 9), (0, 2, 1), (1, 0, 1), (2, 0, 1)],
        "src long, dst long, w long",
    )
    ranks = {
        r["node"]: r["rank"]
        for r in pagerank_integer(e, 3, iters=5, weight="w").collect()
    }
    assert ranks[1] > ranks[2]
    bad = spark.createDataFrame(
        [(0, 1, 0), (1, 0, 1)], "src long, dst long, w long"
    )
    with _pytest.raises(Exception, match="positive"):
        pagerank_integer(bad, 2, iters=1, weight="w").collect()


def test_kcore_peels_tail_into_empty_or_core(spark):
    """K4 with a pendant path: the 3-core is exactly the K4 (peeling
    the path takes TWO rounds — each removal exposes the next), and the
    4-core of the same graph is empty."""
    from incremental_github_data_pipeline_spark.operators.graph import k_core

    k4 = list(combinations(range(4), 2))
    path = [(3, 4), (4, 5)]  # 5 peels first, then 4 would drop below 3
    e = _edges(spark, k4 + path)
    got = {(r["node"], r["degree"]) for r in k_core(e, 3).collect()}
    assert got == {(0, 3), (1, 3), (2, 3), (3, 3)}
    assert k_core(e, 4).count() == 0


def test_kcore_direction_and_duplicates_ignored(spark):
    from incremental_github_data_pipeline_spark.operators.graph import k_core

    tri = [(0, 1), (1, 0), (1, 2), (2, 0), (0, 0), (2, 0)]
    got = {(r["node"], r["degree"]) for r in k_core(_edges(spark, tri), 2).collect()}
    assert got == {(0, 2), (1, 2), (2, 2)}


def test_kcore_reports_core_degrees_not_input_degrees(spark):
    """Node 0's input degree is 5, but inside the 2-core (the square
    0-1-2-3) its degree is 2 — the reported degree must be the induced
    one."""
    from incremental_github_data_pipeline_spark.operators.graph import k_core

    square = [(0, 1), (1, 2), (2, 3), (3, 0)]
    pendants = [(0, 10), (0, 11), (0, 12)]
    got = {
        (r["node"], r["degree"])
        for r in k_core(_edges(spark, square + pendants), 2).collect()
    }
    assert got == {(0, 2), (1, 2), (2, 2), (3, 2)}


def test_label_propagation_two_triangles_and_a_bridge(spark):
    """r11: deterministic synchronous LPA — each triangle collapses to
    its smallest reachable label; the single bridge edge is outvoted,
    so the communities stay separate."""
    from incremental_github_data_pipeline_spark.operators.graph import (
        label_propagation,
    )

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10), (2, 10)],
        "src long, dst long",
    )
    got = {
        r["node"]: r["label"]
        for r in label_propagation(edges, iters=3).collect()
    }
    assert got[0] == got[1] == got[2]
    assert got[10] == got[11] == got[12]
    assert got[0] != got[10]


def test_label_propagation_direction_and_duplicates_ignored(spark):
    from incremental_github_data_pipeline_spark.operators.graph import (
        label_propagation,
    )

    a = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    b = spark.createDataFrame(
        [(1, 0), (2, 1), (2, 1), (0, 1)], "src long, dst long"
    )
    ra = sorted(tuple(r) for r in label_propagation(a, iters=2).collect())
    rb = sorted(tuple(r) for r in label_propagation(b, iters=2).collect())
    assert ra == rb


def test_label_propagation_plan_stays_flat(spark):
    """The per-round localCheckpoint contract: the final plan must not
    grow with the iteration count (the pagerank_integer discipline)."""
    from incremental_github_data_pipeline_spark.operators.graph import (
        label_propagation,
    )

    edges = spark.range(200).selectExpr(
        "id AS src", "(id * 7 + 1) % 200 AS dst"
    )
    p2 = len(
        label_propagation(edges, iters=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    p5 = len(
        label_propagation(edges, iters=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert p5 < p2 * 3, f"plan grows with iterations: {p2} -> {p5}"


# ---------------------------------------------------------------------------
# HITS hubs/authorities
# ---------------------------------------------------------------------------


def test_hits_star_separates_hub_from_authorities(spark):
    from incremental_github_data_pipeline_spark.operators.graph import hits_integer

    # node 0 links to 1, 2, 3: 0 is the pure hub, 1-3 the authorities
    star = _edges(spark, [(0, 1), (0, 2), (0, 3)])
    got = {r["node"]: (r["hub"], r["auth"]) for r in
           hits_integer(star, 4, iters=3, scale=10**6).collect()}
    assert got[0][0] == 10**6 and got[0][1] == 0  # all hub mass
    for v in (1, 2, 3):
        assert got[v][0] == 0
        assert abs(got[v][1] - 333333) <= 1  # authority mass split 3 ways


def test_hits_hand_computed_two_hub_graph(spark):
    from incremental_github_data_pipeline_spark.operators.graph import hits_integer

    # 0->2, 1->2, 1->3: authority mass concentrates on 2; hub 1 (two
    # out-links onto both authorities) beats hub 0
    e = _edges(spark, [(0, 2), (1, 2), (1, 3)])
    got = {r["node"]: (r["hub"], r["auth"]) for r in
           hits_integer(e, 4, iters=3, scale=10**6).collect()}
    assert got[1][0] > got[0][0] > 0
    assert got[2][1] > got[3][1] > 0
    # L1 normalization: each vector sums to ~scale (integral-division
    # remainders only ever lose a few ppm)
    assert sum(h for h, _ in got.values()) >= 10**6 - 4
    assert sum(a for _, a in got.values()) >= 10**6 - 4
    assert sum(h for h, _ in got.values()) <= 10**6
    assert sum(a for _, a in got.values()) <= 10**6


def test_hits_empty_edges_all_zero(spark):
    from incremental_github_data_pipeline_spark.operators.graph import hits_integer

    e = _edges(spark, [(0, 1)]).filter("src > 99")
    got = {r["node"]: (r["hub"], r["auth"]) for r in
           hits_integer(e, 3, iters=2).collect()}
    assert got == {0: (0, 0), 1: (0, 0), 2: (0, 0)}


def test_hits_overflow_guard():
    import pytest as _pytest

    from incremental_github_data_pipeline_spark.operators.graph import hits_integer

    with _pytest.raises(ValueError, match="int64"):
        hits_integer(None, 10**7, scale=10**12)


# ---------------------------------------------------------------------------
# link prediction
# ---------------------------------------------------------------------------


def test_link_prediction_hand_computed_path(spark):
    from incremental_github_data_pipeline_spark.operators.graph import (
        link_prediction,
    )

    # path 0-1-2 plus 1-3: non-adjacent pairs through hub 1 (deg 3):
    # (0,2), (0,3), (2,3) each share exactly neighbor 1
    e = _edges(spark, [(0, 1), (1, 2), (1, 3)])
    got = {(r["node_a"], r["node_b"]): r for r in
           link_prediction(e).collect()}
    assert set(got) == {(0, 2), (0, 3), (2, 3)}
    for r in got.values():
        assert r["common_neighbors"] == 1
        assert r["ra_ppm"] == 1000000 // 3  # 1/deg(1)
        # deg(a)=deg(b)=1, union = 1+1-1
        assert r["jaccard_ppm"] == 1000000


def test_link_prediction_excludes_existing_edges(spark):
    from incremental_github_data_pipeline_spark.operators.graph import (
        link_prediction,
    )

    # triangle: every distance-2 pair is already adjacent -> no rows
    e = _edges(spark, [(0, 1), (1, 2), (0, 2)])
    assert link_prediction(e).count() == 0


def test_link_prediction_max_wedge_degree_drops_hub_paths(spark):
    from incremental_github_data_pipeline_spark.operators.graph import (
        link_prediction,
    )

    # hub 9 connects 0..4 (deg 5); side chain 0-5-1 (deg(5)=2)
    pairs = [(9, i) for i in range(5)] + [(0, 5), (5, 1)]
    e = _edges(spark, pairs)
    full = {(r["node_a"], r["node_b"]): r["ra_ppm"] for r in
            link_prediction(e).collect()}
    # (0,1) reachable via 9 (1/5) and via 5 (1/2)
    assert full[(0, 1)] == 1000000 // 5 + 1000000 // 2
    capped = {(r["node_a"], r["node_b"]): r["ra_ppm"] for r in
              link_prediction(e, max_wedge_degree=2).collect()}
    assert capped[(0, 1)] == 1000000 // 2  # hub wedge excluded
    assert (2, 3) in full and (2, 3) not in capped


def test_bfs_levels_chain_and_budget(spark):
    from incremental_github_data_pipeline_spark.operators.graph import (
        bfs_levels,
    )

    # directed chain 0->1->2->3->4, plus an unreachable island 5->6
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (5, 6)])
    got = {
        r["node"]: r["level"]
        for r in bfs_levels(e, 7, seeds=[0], rounds=3).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: None, 5: None, 6: None}
    # budget 10 reaches node 4; islands stay NULL
    got10 = {
        r["node"]: r["level"]
        for r in bfs_levels(e, 7, seeds=[0], rounds=10).collect()
    }
    assert got10[4] == 4 and got10[5] is None


def test_bfs_levels_multi_seed_takes_nearest_and_directedness(spark):
    from incremental_github_data_pipeline_spark.operators.graph import (
        bfs_levels,
    )

    # 0->1->2->3 and 5->3: node 3 is 1 hop from seed 5, not 3 from 0;
    # edges are DIRECTED, so seed 5 does not reach 1 backwards
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (5, 3)])
    got = {
        r["node"]: r["level"]
        for r in bfs_levels(e, 6, seeds=[0, 5], rounds=4).collect()
    }
    assert got[3] == 1
    assert got[1] == 1 and got[2] == 2
    assert got[4] is None
    # zero rounds: seeds only
    z = {
        r["node"]: r["level"]
        for r in bfs_levels(e, 6, seeds=[0, 5], rounds=0).collect()
    }
    assert z == {0: 0, 5: 0, 1: None, 2: None, 3: None, 4: None}
    import pytest as _pytest
    with _pytest.raises(ValueError, match="seed"):
        bfs_levels(e, 6, seeds=[], rounds=1)
