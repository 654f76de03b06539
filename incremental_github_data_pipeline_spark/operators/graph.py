"""Graph analytics operators: integer-exact PageRank and degree-ordered
triangle counting.

No counterpart in the reference (`/root/reference` has no graph
processing); [EXT] per SURVEY.md §2.10 — the link-analysis /
graph-structure capability class (page quality for crawl corpora,
dedup-cluster structure, citation graphs). Companion to the
connected-components operator in ``operators/dedup.py``.

Cross-engine exactness: PageRank here runs in SCALED INTEGER
arithmetic — every per-iteration value is ``bigint`` and every division
is integral (``div``), so ranks are bit-identical in any engine that
repeats the recurrence, with no float summation order anywhere. That is
what makes an ITERATIVE algorithm certifiable against a SQL oracle
(the same trick as the ADPCM recursive-CTE decoder).

Scale shape (100 TB): each PageRank iteration is one shuffle (the
contribution aggregate on ``dst``) plus an edge–rank equi-join on
``src``; lineage is truncated per round with ``localCheckpoint`` like
the distributed connected-components loop, so plan size stays constant
in the iteration count. Triangle counting orients every edge from the
lower-(degree, id) endpoint to the higher one, which bounds the
wedge join by Σ min-degree² instead of Σ degree² — the standard
skew-proofing for power-law graphs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from incremental_github_data_pipeline_spark.operators.core import sized_range

__all__ = [
    "bfs_levels",
    "hits_integer",
    "k_core",
    "link_prediction",
    "label_propagation",
    "pagerank_integer",
    "triangle_count",
]


def _idiv(col, divisor: int):
    """Exact integral division (floor toward zero on non-negatives).
    ``a div b`` stays in long arithmetic — ``(a / b).cast(long)`` would
    detour through a double, whose rounding can flip the quotient near
    integer boundaries."""
    return F.expr(f"{col} div {divisor}")


def pagerank_integer(
    edges: DataFrame,
    n_nodes: int,
    iters: int = 5,
    scale: int = 10**12,
    damping_pct: int = 85,
    src: str = "src",
    dst: str = "dst",
    redistribute_dangling: bool = False,
    seeds: Sequence[int] | None = None,
    weight: str | None = None,
) -> DataFrame:
    """PageRank over ``iters`` synchronous iterations in scaled-integer
    arithmetic: ranks start at ``scale div n``, and each round applies

        r'(v) = ((100-d)*scale) div (100*n)
                + (d * (Σ_{u→v} (r(u) div deg(u)) [+ D div n])) div 100

    with every operation integral — order-independent and therefore
    bit-reproducible across engines.

    ``redistribute_dangling`` (r10): real crawl graphs have many sinks
    (pages with no out-links), and the simplified variant silently
    leaks their rank mass every round. With the flag on, each round
    adds ``D div n`` to every node's in-mass, where ``D`` is the total
    rank held by out-degree-0 nodes — the standard uniform
    redistribution, kept integer-exact (r16: D folds into the SAME
    contribution aggregate via a dst = −1 sentinel key and broadcasts
    back via crossJoin — no extra per-round aggregate, no driver
    collect, no float).
    Off by default for recurrence-compatibility with the certified
    ``q_graph_pagerank`` oracle; integral-division remainders
    dissipate the same way in any engine replaying either recurrence.

    ``seeds`` (r10) switches to PERSONALIZED PageRank: the teleport
    mass — and, when ``redistribute_dangling`` is on, the dangling
    mass — flows only to the seed set instead of uniformly, so ranks
    measure proximity TO THE SEEDS (the related-items / topic-focused
    crawl-frontier primitive). The recurrence stays integer-exact:
    seed base = ((100−d)·scale) div (100·|S|), dangling share =
    D div |S| on seeds, both zero elsewhere; the initial vector also
    concentrates on the seeds (PPR's standard start). ``seeds`` is a
    model-sized list (it IS the personalization), broadcast as a
    literal IN-set — never a driver collect of data.

    ``weight`` (r10) names a POSITIVE-INTEGER edge-weight column:
    node u sends ``(r(u)·w(u→v)) div W(u)`` along each edge, with
    ``W(u)`` its total out-weight — link-strength-aware rank (crawl
    frequency, citation counts, co-occurrence). The recurrence stays
    integral: rank × weight is exact, one div per edge, and the
    unweighted path is exactly ``weight=None`` (not weight≡1, whose
    per-edge remainders would differ from the shared ``div deg``).

    Returns ``(node, rank)`` for all ``n_nodes`` nodes (ids 0..n-1),
    including nodes with no in-links (they hold the teleport floor —
    zero for non-seeds under personalization).

    One aggregate shuffle per iteration — the dangling variant rides
    the SAME shuffle via the sentinel key; per-round
    ``localCheckpoint`` keeps the plan flat, exactly like the
    distributed connected-components loop it sits beside.
    """
    spark = edges.sparkSession
    if weight is not None:
        e = edges.select(
            F.col(src).alias("src"),
            F.col(dst).alias("dst"),
            F.col(weight).cast("long").alias("w"),
        )
        deg = e.groupBy("src").agg(F.sum("w").alias("deg"))
        # loud guard: a zero/negative weight silently leaks rank mass,
        # so fail per-row instead (same inline-assert discipline as
        # timeseries._floor_div_expr)
        contrib_expr = (
            "(rank * w + ifnull(assert_true(w > 0, "
            "'pagerank edge weight must be positive'), 0)) div deg"
        )
    else:
        e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        contrib_expr = "rank div deg"
    nodes = sized_range(spark, n_nodes).select(F.col("id").alias("node"))
    if seeds is not None:
        seeds = sorted(set(int(s) for s in seeds))
        if not seeds:
            raise ValueError("seeds must be non-empty when given")
        n_targets = len(seeds)
        is_target = F.col("node").isin(seeds)
    else:
        n_targets = n_nodes
        is_target = F.lit(True)
    base_val = ((100 - damping_pct) * scale) // (100 * n_targets)
    base_col = F.when(is_target, F.lit(base_val)).otherwise(F.lit(0))
    ranks = nodes.select(
        "node",
        F.when(is_target, F.lit(scale // n_targets))
        .otherwise(F.lit(0))
        .alias("rank"),
    )
    # r15 (guide §2.4): deg is STATIC — joining it inside the loop made
    # every round re-run the degree aggregate and pay an extra join.
    # Materialize (src, dst[, w], deg) once; each round is then one
    # rank join + one contribution aggregate, the theoretical minimum.
    # Same for the dangling-node set: membership never changes between
    # rounds, only the rank mass it holds does.
    if iters > 0:
        e_deg = e.join(deg, "src").localCheckpoint(eager=True)
        dang_nodes = (
            nodes.join(
                deg.withColumnRenamed("src", "node"), "node", "left_anti"
            ).localCheckpoint(eager=True)
            if redistribute_dangling
            else None
        )
    # r16 (VERDICT r15 task 5, guide §2.4): the dangling sum is FUSED
    # into the contribution aggregate via a sentinel key (dst = −1)
    # instead of running as its own per-round aggregate job: the
    # dangling ranks union into the same (dst, c) stream, ONE groupBy
    # computes every node's in-mass AND the total dangling mass D
    # (at the sentinel), and the tiny result is eager-checkpointed so
    # its two consumers (the 1-row broadcast and the node join) read
    # one materialization. ranks is now scanned ONCE per round (the
    # old shape scanned it separately for the semi-join aggregate).
    # Arithmetic is IDENTICAL: D = Σ rank over the static dangling
    # set, share = D div n_targets — integral div of the same integral
    # sum, so every remainder lands exactly where the old recurrence
    # put it, and each per-node mass is the same bigint. A constant
    # (−1, 0) seed row keeps the sentinel group present when the
    # dangling set is empty (the old aggregate's coalesce(sum, 0)).
    sent_seed = (
        sized_range(spark, 1).select(
            F.lit(-1).cast("long").alias("dst"),
            F.lit(0).cast("long").alias("c"),
        )
        if redistribute_dangling
        else None
    )
    for _ in range(iters):
        contrib = e_deg.join(
            ranks.withColumnRenamed("node", "src"), "src"
        ).select("dst", F.expr(contrib_expr).alias("c"))
        if redistribute_dangling:
            sent = ranks.join(dang_nodes, "node", "left_semi").select(
                F.lit(-1).cast("long").alias("dst"), F.col("rank").alias("c")
            )
            in_mass = (
                contrib.unionByName(sent)
                .unionByName(sent_seed)
                .groupBy("dst")
                .agg(F.sum("c").alias("in_mass"))
                .localCheckpoint(eager=True)  # ≤ n_nodes+1 rows, 2 readers
            )
            dang = in_mass.filter(F.col("dst") == -1).select(
                F.expr(f"in_mass div {n_targets}").alias("_dshare")
            )
            joined = nodes.join(
                in_mass.filter(F.col("dst") != -1).withColumnRenamed(
                    "dst", "node"
                ),
                "node",
                "left",
            ).crossJoin(F.broadcast(dang))
            mass = F.coalesce(F.col("in_mass"), F.lit(0)) + F.when(
                is_target, F.col("_dshare")
            ).otherwise(F.lit(0))
        else:
            joined = nodes.join(
                contrib.groupBy("dst")
                .agg(F.sum("c").alias("in_mass"))
                .withColumnRenamed("dst", "node"),
                "node",
                "left",
            )
            mass = F.coalesce(F.col("in_mass"), F.lit(0))
        ranks = (
            joined.withColumn("_mass", mass)
            .select(
                "node",
                (
                    base_col + _idiv(f"({damping_pct} * _mass)", 100)
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Exact triangle enumeration on an undirected graph given as a
    directed edge list (direction and duplicates ignored; self-loops
    dropped). Returns one row per triangle ``(a, b, c)`` with
    ``a < b < c`` under the degree-then-id total order's RELABELING —
    i.e. columns are the ordered original node ids.

    Algorithm: canonicalize to one row per undirected edge, orient each
    edge from the endpoint that is smaller under (degree, id) to the
    larger, then one self-join builds wedges (u→v, u→w with v < w under
    the same order) and one membership join closes them. Orientation
    bounds wedge fan-out by the SMALLER endpoint degree — on power-law
    graphs that turns the hub's deg² blow-up into deg·min_deg.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
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
    ranked = (
        und.join(deg.withColumnRenamed("n", "a").withColumnRenamed("d", "da"), "a")
        .join(deg.withColumnRenamed("n", "b").withColumnRenamed("d", "db"), "b")
    )
    lo_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = ranked.select(
        F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(lo_first, F.col("da")).otherwise(F.col("db")).alias("du"),
        F.when(lo_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    ).localCheckpoint(eager=False)
    # ^ three consumers (both wedge sides + the closing join) would each
    # replay the dedup + two degree joins; one edge-list materialization
    # replaces 3x recomputation — the same multi-use-frame discipline as
    # the PageRank loop.
    l_ = oriented.select(
        F.col("u"), F.col("v").alias("w1"), F.col("dv").alias("dw1")
    )
    r_ = oriented.select(
        F.col("u"), F.col("v").alias("w2"), F.col("dv").alias("dw2")
    )
    wedges = l_.join(r_, "u").filter(
        (F.col("dw1") < F.col("dw2"))
        | ((F.col("dw1") == F.col("dw2")) & (F.col("w1") < F.col("w2")))
    )
    closed = wedges.join(
        oriented.select(
            F.col("u").alias("w1"), F.col("v").alias("w2")
        ),
        ["w1", "w2"],
    )
    return closed.select(
        F.least("u", "w1", "w2").alias("a"),
        F.expr(
            "if(u > least(u, w1, w2) and u < greatest(u, w1, w2), u, "
            "if(w1 > least(u, w1, w2) and w1 < greatest(u, w1, w2), w1, w2))"
        ).alias("b"),
        F.greatest("u", "w1", "w2").alias("c"),
    )


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 100,
) -> DataFrame:
    """The k-core of an undirected graph (direction/duplicates of the
    input edge list ignored, self-loops dropped): the maximal induced
    subgraph in which every vertex has degree ≥ k, computed by the
    standard peel — repeatedly delete vertices of degree < k until none
    remain. Returns ``(node, degree)`` with each survivor's degree
    INSIDE the core. The result is deterministic (the k-core is unique
    regardless of deletion order), which is what makes an iterative
    peel certifiable against a SQL oracle that unrolls the rounds.

    Scale shape: each round is one degree aggregate (shuffle on the
    symmetrized edge key) plus two semi-joins restricting edges to
    surviving endpoints, with a per-round ``localCheckpoint`` keeping
    the plan O(1)-deep — the same iterative-lineage discipline as
    :func:`pagerank_integer`. Rounds needed = peeling depth (O(log n)
    on real graphs, bounded by degeneracy ordering length, NOT by n);
    the loop stops at the first round that deletes nothing. The only
    driver-side values are the per-round survivor counts (1-number
    aggregates, the same gate as the PageRank round counter)."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionAll(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    alive = sym
    n_prev = None
    for _ in range(max_rounds):
        deg = alive.groupBy("a").agg(F.count(F.lit(1)).alias("degree"))
        # r15: lazy checkpoints — the count() gate right below (and the
        # next round's gate, for `alive`) forces materialization anyway,
        # so the eager form only added a dedicated job per frame per
        # round (3 jobs/round -> 1). `keep` is materialized by its own
        # count() BEFORE both semi-joins consume it, so the sibling-
        # consumer double-compute hazard does not apply here.
        keep = deg.filter(F.col("degree") >= k).localCheckpoint(eager=False)
        n = keep.count()
        if n == 0:
            return keep.select(F.col("a").alias("node"), "degree")
        if n == n_prev:
            return keep.select(F.col("a").alias("node"), "degree")
        n_prev = n
        nodes = keep.select("a")
        alive = (
            alive.join(nodes, "a", "left_semi")
            .join(nodes.withColumnRenamed("a", "b"), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint(eager=False)
        )
    raise RuntimeError(f"k_core did not converge in {max_rounds} rounds")


def label_propagation(
    edges: DataFrame,
    iters: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Synchronous label propagation (r11) — the cheap community
    detector: labels start as node ids, and each round every node
    adopts the MOST FREQUENT label among its neighbors, ties broken by
    the smallest label. The deterministic tie rule is what makes the
    async algorithm's randomness disappear: a fixed round count +
    deterministic argmax is replayable by an unrolled SQL recurrence,
    the same certification trick as the PageRank lanes. (Classic LPA
    converges asynchronously with random tie-breaks; the synchronous
    deterministic variant can oscillate on bipartite structures, which
    a FIXED iteration count also makes reproducible rather than
    divergent.)

    Direction/duplicates of the input are ignored (labels flow both
    ways); self-loops dropped; isolated nodes don't appear in the edge
    list and therefore keep their own label trivially. Returns
    ``(node, label)``.

    Scale shape: one (node, label) count aggregate + one per-node
    argmax per round — two key shuffles per round over the edge list,
    per-round ``localCheckpoint`` keeping the plan flat (the
    pagerank_integer contract; the argmax is a ``max(struct(cnt,
    -label))``, no window over the full edge list)."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionAll(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = sym.select(F.col("a").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    for _ in range(iters):
        neigh = sym.join(
            labels.withColumnRenamed("node", "b"), "b"
        ).groupBy(F.col("a").alias("node"), "label").agg(
            F.count(F.lit(1)).alias("_cnt")
        )
        labels = (
            neigh.groupBy("node")
            .agg(
                F.max(
                    F.struct(
                        F.col("_cnt"),
                        (-F.col("label")).alias("_neg"),
                        F.col("label"),
                    )
                ).alias("_m")
            )
            .select("node", F.col("_m.label").alias("label"))
            # r15: lazy — each round's labels have exactly one consumer
            # (the next round's neighbor join), so the eager form only
            # added one dedicated materialization job per round; the
            # plan stays flat either way (the checkpoint RDD truncates
            # lineage at creation).
            .localCheckpoint(eager=False)
        )
    return labels


def hits_integer(
    edges: DataFrame,
    n_nodes: int,
    iters: int = 3,
    scale: int = 10**6,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """HITS hubs-and-authorities over ``iters`` synchronous rounds in
    scaled-integer arithmetic — the query-independent link-analysis
    pair to :func:`pagerank_integer` (authorities = pages good to
    link TO, hubs = pages good at linking OUT; the classic curation
    signal for directory-ish crawl corpora).

    Each round is the textbook mutual recurrence with L1 (sum)
    normalization made integral:

        a_raw(v) = Σ_{u→v} h(u);  a(v) = (a_raw(v)·scale) div Σ a_raw
        h_raw(u) = Σ_{u→v} a(v);  h(u) = (h_raw(u)·scale) div Σ h_raw

    Every step is integer arithmetic — the normalizing sums are 1-row
    broadcast aggregates (the dangling-mass pattern from
    ``pagerank_integer``), never driver collects, and integral division
    makes the fixpoint trajectory bit-identical in any engine replaying
    the recurrence. ``scale`` defaults to 10⁶ (ppm of the L1 mass).
    Overflow posture: raw sums are bounded by |E|·scale (NOT n·scale —
    dense graphs exceed int64 long before the node count does), so the
    per-round aggregates and the normalize multiply run in
    DECIMAL(38,0) lanes (bound |E|·scale² ≤ 10³⁸); only the final
    ``div`` result (≤ scale) comes back as bigint. The assert below
    additionally refuses scales where even the decimal headroom could
    be pressured.

    Two aggregate shuffles per round (dst then src) plus two 1-row
    broadcasts; per-round ``localCheckpoint`` keeps the plan flat.
    Returns ``(node, hub, auth)`` for all ``n_nodes`` nodes.
    """
    if n_nodes * scale * scale > 9 * 10**18:
        raise ValueError(
            "scale too large: n*scale^2 must stay within int64"
        )
    if iters < 1:
        # ADVICE r15: iters=0 would leave auths undefined at the final
        # join; the defined starting vector is hubs-only, so reject.
        raise ValueError("hits_integer requires iters >= 1")
    spark = edges.sparkSession
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = sized_range(spark, n_nodes).select(F.col("id").alias("node"))
    hubs = nodes.select("node", F.lit(scale).alias("hub"))

    def _normalize(raw: DataFrame, col: str) -> DataFrame:
        # greatest(·, 1): an all-zero vector (possible only on an empty
        # edge set) must normalize to zeros, not NULL-divide.
        # DECIMAL(38,0) lanes throughout: the raw sums are bounded by
        # |E|·scale (not n·scale), so on dense graphs both the 1-row L1
        # sum and the normalize multiply can exceed int64 — decimal
        # accumulation makes the bound |E|·scale² ≤ 10³⁸ instead, and
        # the final `div` result is ≤ scale, always bigint-safe.
        # r15: raw feeds BOTH the 1-row total (a broadcast job under
        # AQE) and the normalize projection — one lazy checkpoint stops
        # the edge-join + aggregate from running twice per normalize.
        raw = raw.localCheckpoint(eager=False)
        total = raw.agg(
            F.greatest(
                F.coalesce(
                    F.sum(F.col(col).cast("decimal(38,0)")),
                    F.lit(0).cast("decimal(38,0)"),
                ),
                F.lit(1).cast("decimal(38,0)"),
            ).alias("_tot")
        )
        return (
            raw.crossJoin(F.broadcast(total))
            .select(
                "node",
                F.expr(
                    f"(cast({col} as decimal(38,0)) * {scale}) div _tot"
                ).alias(col),
            )
        )

    # r15 (guide §2.4): the loop runs SPARSE — hub/auth frames carry
    # only nodes that actually receive mass (every edge endpoint is
    # covered by construction: a dst always has an in-link, a src an
    # out-link), so the per-round `nodes` completion joins are gone.
    # Absent nodes hold exactly 0 in the dense recurrence ((0·scale)
    # div tot = 0) and 0 contributes nothing to the L1 totals or the
    # edge joins, so the trajectory is bit-identical; the final select
    # re-completes to all n_nodes with the same zeros.
    auths = None
    for _ in range(iters):
        a_raw = (
            e.join(hubs.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(
                F.sum(F.col("hub").cast("decimal(38,0)")).alias("auth")
            )
        )
        auths = _normalize(a_raw, "auth")
        h_raw = (
            e.join(auths.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(
                F.sum(F.col("auth").cast("decimal(38,0)")).alias("hub")
            )
        )
        hubs = _normalize(h_raw, "hub")
    zero = F.lit(0).cast("long")
    return (
        nodes.join(hubs, "node", "left")
        .join(auths, "node", "left")
        .select(
            "node",
            F.coalesce("hub", zero).alias("hub"),
            F.coalesce("auth", zero).alias("auth"),
        )
    )


def link_prediction(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_wedge_degree: int | None = None,
) -> DataFrame:
    """Neighborhood-based link prediction on the undirected view of the
    graph: for every non-adjacent pair ``(a < b)`` at distance 2,
    three integer-exact scores —

    - ``common_neighbors``: |N(a) ∩ N(b)| (the baseline);
    - ``ra_ppm``: the Resource Allocation index Σ_{z∈N(a)∩N(b)}
      1/deg(z) as Σ (10⁶ div deg(z)) — RA is the strongest of the
      classic local indices on most benchmarks, and unlike
      Adamic–Adar's ``1/ln deg`` it needs no irrational function, so
      it stays certifiable;
    - ``jaccard_ppm``: |N(a)∩N(b)|·10⁶ div |N(a)∪N(b)|.

    Plan shape: direction/duplicates collapsed, one wedge self-join on
    the shared neighbor ``z`` (the same key triangle_count wedges on),
    one (a, b) aggregate, one left_anti against the edge set to keep
    only NEW candidate links. The wedge count through a hub z is
    deg(z)² — inherent to the semantics, and the reason
    ``max_wedge_degree`` exists: on power-law graphs, excluding
    super-hub intermediaries (whose RA contribution 10⁶ div deg is ~0
    anyway) bounds the join at a documented, tiny score deficit.
    Default None = exact.
    """
    # und feeds three lanes (degrees, adjacency, the existing-edge
    # anti-join) and deg three more — materialize each once instead of
    # re-deriving the edge scan per lane (the q_doc_contained lesson);
    # both are edge-/node-bounded, the frames the CC and k-core loops
    # already checkpoint
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.groupBy(F.col("a").alias("z"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=True)
    )
    adj = und.select(F.col("b").alias("z"), F.col("a").alias("n")).join(
        deg, "z"
    )
    if max_wedge_degree is not None:
        adj = adj.filter(F.col("deg") <= max_wedge_degree)
    left = adj.select(
        "z", F.col("n").alias("na"), F.col("deg").alias("dz")
    )
    right = adj.select("z", F.col("n").alias("nb"))
    wedges = left.join(right, "z").filter(F.col("na") < F.col("nb"))
    scored = wedges.groupBy(
        F.col("na").alias("node_a"), F.col("nb").alias("node_b")
    ).agg(
        F.count(F.lit(1)).alias("common_neighbors"),
        F.sum(F.expr("1000000 div dz")).alias("ra_ppm"),
    )
    dega = deg.select(F.col("z").alias("node_a"), F.col("deg").alias("_da"))
    degb = deg.select(F.col("z").alias("node_b"), F.col("deg").alias("_db"))
    existing = und.select(
        F.col("a").alias("node_a"), F.col("b").alias("node_b")
    )
    return (
        scored.join(existing, ["node_a", "node_b"], "left_anti")
        .join(dega, "node_a")
        .join(degb, "node_b")
        .select(
            "node_a",
            "node_b",
            F.col("common_neighbors").cast("long").alias(
                "common_neighbors"
            ),
            F.col("ra_ppm").cast("long").alias("ra_ppm"),
            F.expr(
                "common_neighbors * 1000000 div "
                "(_da + _db - common_neighbors)"
            )
            .cast("long")
            .alias("jaccard_ppm"),
        )
    )


_BFS_INF = 10**9  # sentinel: unreached within the round budget


def bfs_levels(
    edges: DataFrame,
    n_nodes: int,
    seeds: list,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Multi-source BFS levels (r12): distance of every node from the
    NEAREST seed following directed edges, exact up to ``rounds`` hops
    — the reachability/decontamination primitive (how far does a
    flagged document's influence travel through the link graph?) and
    the freshness-propagation kernel.

    Min-plus label relaxation, the same iterative discipline as
    :func:`pagerank_integer`: dist₀ = 0 on seeds, ∞ elsewhere; each
    round dist'(v) = min(dist(v), min_{u→v} dist(u) + 1). After r
    rounds every node at true distance ≤ r is exact (relaxation
    reaches level k in round k); nodes beyond the budget come back
    NULL rather than a wrong number. All-integer, so the whole
    trajectory replays in any engine as an unrolled recurrence.

    Scale shape: ``rounds`` × (one aggregate shuffle on the node key +
    one broadcast-ready seed literal), per-round ``localCheckpoint``
    keeps the plan flat (sweep-20 contract); the frontier never
    materializes driver-side and seeds are a model-sized IN-set.
    Returns ``(node, level)`` for all ``n_nodes`` nodes.
    """
    if rounds < 0:
        raise ValueError("rounds must be non-negative")
    if not seeds:
        raise ValueError("bfs_levels needs a non-empty seed set")
    spark = edges.sparkSession
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = sized_range(spark, n_nodes).select(F.col("id").alias("node"))
    seed_set = ", ".join(str(int(s)) for s in seeds)
    dist = nodes.select(
        "node",
        F.when(F.expr(f"node IN ({seed_set})"), F.lit(0))
        .otherwise(F.lit(_BFS_INF))
        .cast("long")
        .alias("level"),
    ).localCheckpoint(eager=False)
    for _ in range(rounds):
        relaxed = (
            e.join(
                dist.withColumnRenamed("node", "src").withColumnRenamed(
                    "level", "_sl"
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min(F.col("_sl") + 1).alias("_in"))
        )
        dist = (
            dist.join(relaxed, "node", "left")
            .select(
                "node",
                F.least(
                    "level", F.coalesce("_in", F.lit(_BFS_INF))
                ).alias("level"),
            )
            .localCheckpoint(eager=False)
        )
    return dist.select(
        "node",
        F.when(F.col("level") < _BFS_INF, F.col("level")).alias("level"),
    )
