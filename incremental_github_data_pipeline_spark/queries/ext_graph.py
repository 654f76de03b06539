"""[EXT] Graph analytics queries (`operators/graph.py`): integer-exact
PageRank and triangle counting over a deterministic synthetic graph.

The graph derives from ``range(N)`` with modular-arithmetic edge
functions, so DuckDB rebuilds the identical edge list with no data
dependency — the same closed-form-content trick the media codec queries
use. No reference counterpart (`/root/reference` has no graph ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incremental_github_data_pipeline_spark.operators import graph as g_ops
from incremental_github_data_pipeline_spark.operators.core import sized_range
from incremental_github_data_pipeline_spark.queries import register

N = 400
SCALE = 10**12
ITERS = 5
# (mult, add) per edge function: i -> (i*mult + add) % N
EDGE_FNS = [(7, 1), (13, 5), (29, 11), (3, 200)]

_EDGE_SQL = (
    "SELECT DISTINCT src, dst FROM (\n"
    + "\n      UNION ALL ".join(
        f"SELECT node AS src, (node*{m}+{a}) % {N} AS dst FROM nodes"
        for m, a in EDGE_FNS
    )
    + "\n    ) WHERE src <> dst"
)


def _edges(spark: SparkSession) -> DataFrame:
    nodes = sized_range(spark, N).select(F.col("id").alias("node"))
    parts = [
        nodes.select(
            F.col("node").alias("src"),
            ((F.col("node") * m + a) % N).alias("dst"),
        )
        for m, a in EDGE_FNS
    ]
    e = parts[0]
    for p in parts[1:]:
        e = e.unionAll(p)
    return e.filter(F.col("src") != F.col("dst")).distinct()


def _pagerank_oracle() -> str:
    base = (100 - 85) * SCALE // (100 * N)
    steps = []
    for t in range(1, ITERS + 1):
        prev = f"r{t - 1}"
        steps.append(
            f"""r{t} AS (
      SELECT n.node,
             {base} + (85 * COALESCE(m.s, 0)) // 100 AS rank
      FROM nodes n LEFT JOIN (
        SELECT e.dst AS node, SUM(r.rank // deg.d) AS s
        FROM e JOIN {prev} r ON r.node = e.src
               JOIN deg ON deg.src = e.src
        GROUP BY 1) m USING (node)
    )"""
        )
    return f"""
    WITH nodes AS (SELECT range AS node FROM range({N})),
    e AS (
      {_EDGE_SQL}
    ),
    deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY 1),
    r0 AS (SELECT node, {SCALE // N} AS rank FROM nodes),
    {",".join(steps)}
    SELECT CAST(node AS BIGINT) AS node, CAST(rank AS BIGINT) AS rank
    FROM r{ITERS} ORDER BY node
    """


@register(
    "q_graph_pagerank",
    oracle=_pagerank_oracle(),
    doc="PageRank, 5 synchronous iterations, certified EXACTLY against "
    "SQL: every value is a scaled bigint and every division integral "
    "(Spark `div` / DuckDB `//` — never a double detour), so the "
    "iterative float algorithm becomes order-independent integer "
    "arithmetic that any engine reproduces bit-for-bit; the oracle "
    "unrolls the recurrence as five CTE stages. Physical shape "
    "(operators/graph.pagerank_integer): one contribution-aggregate "
    "shuffle per round, edge-rank equi-join on src, per-round "
    "localCheckpoint keeping the plan flat — the same iterative "
    "discipline as the distributed connected-components loop.",
)
def q_graph_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    return g_ops.pagerank_integer(_edges(spark), N, iters=ITERS, scale=SCALE).orderBy(
        "node"
    )


def _pagerank_weighted_oracle() -> str:
    """Unrolled weighted recurrence: node u sends (r(u)·w) // W(u)
    along each edge, W(u) = Σ out-weights, w = (src·3 + dst·7) % 5 + 1."""
    base = (100 - 85) * SCALE // (100 * N)
    steps = []
    for t in range(1, ITERS + 1):
        prev = f"r{t - 1}"
        steps.append(
            f"""r{t} AS (
      SELECT n.node,
             {base} + (85 * COALESCE(m.s, 0)) // 100 AS rank
      FROM nodes n LEFT JOIN (
        SELECT e.dst AS node, SUM((r.rank * e.w) // wd.wsum) AS s
        FROM e JOIN {prev} r ON r.node = e.src
               JOIN wd ON wd.src = e.src
        GROUP BY 1) m USING (node)
    )"""
        )
    return f"""
    WITH nodes AS (SELECT range AS node FROM range({N})),
    e0 AS (
      {_EDGE_SQL}
    ),
    e AS (SELECT src, dst, (src * 3 + dst * 7) % 5 + 1 AS w FROM e0),
    wd AS (SELECT src, SUM(w) AS wsum FROM e GROUP BY 1),
    r0 AS (SELECT node, {SCALE // N} AS rank FROM nodes),
    {",".join(steps)}
    SELECT CAST(node AS BIGINT) AS node, CAST(rank AS BIGINT) AS rank
    FROM r{ITERS} ORDER BY node
    """


@register(
    "q_graph_pagerank_weighted",
    oracle=_pagerank_weighted_oracle(),
    doc="WEIGHTED PageRank (r10, operators/graph.pagerank_integer"
    "(weight=…)): each node distributes rank in proportion to "
    "positive integer edge weights — (r(u)·w) div W(u) per edge with "
    "W(u) the total out-weight — the link-strength-aware variant "
    "(crawl frequency, citation counts, co-occurrence). Weights here "
    "are the deterministic (src·3 + dst·7) % 5 + 1, so DuckDB "
    "rebuilds them; the oracle unrolls five weighted rounds. "
    "Zero/negative weights fail loudly via an inline assert (the "
    "_floor_div_expr discipline), never leak mass silently.",
)
def q_graph_pagerank_weighted(spark: SparkSession, sf: str) -> DataFrame:
    e = _edges(spark).withColumn(
        "w", (F.col("src") * 3 + F.col("dst") * 7) % 5 + 1
    )
    return g_ops.pagerank_integer(
        e, N, iters=ITERS, scale=SCALE, weight="w"
    ).orderBy("node")


def _pagerank_dangling_oracle() -> str:
    """Unrolled recurrence over the SINK-BEARING graph (edges only from
    nodes not divisible by 5, so 80 of 400 nodes are dangling): each
    round adds ``(Σ dangling rank) // N`` to every node's in-mass
    before damping."""
    base = (100 - 85) * SCALE // (100 * N)
    edge_sql = _EDGE_SQL.replace(
        "WHERE src <> dst", "WHERE src <> dst AND src % 5 <> 0"
    )
    steps = []
    for t in range(1, ITERS + 1):
        prev = f"r{t - 1}"
        steps.append(
            f"""d{t} AS (
      SELECT COALESCE(SUM(rank), 0) // {N} AS share
      FROM {prev} WHERE node NOT IN (SELECT src FROM deg)
    ),
    r{t} AS (
      SELECT n.node,
             {base} + (85 * (COALESCE(m.s, 0) + d.share)) // 100 AS rank
      FROM nodes n LEFT JOIN (
        SELECT e.dst AS node, SUM(r.rank // deg.d) AS s
        FROM e JOIN {prev} r ON r.node = e.src
               JOIN deg ON deg.src = e.src
        GROUP BY 1) m USING (node)
      CROSS JOIN d{t} d
    )"""
        )
    return f"""
    WITH nodes AS (SELECT range AS node FROM range({N})),
    e AS (
      {edge_sql}
    ),
    deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY 1),
    r0 AS (SELECT node, {SCALE // N} AS rank FROM nodes),
    {",".join(steps)}
    SELECT CAST(node AS BIGINT) AS node, CAST(rank AS BIGINT) AS rank
    FROM r{ITERS} ORDER BY node
    """


@register(
    "q_graph_pagerank_dangling",
    oracle=_pagerank_dangling_oracle(),
    doc="PageRank WITH dangling-mass redistribution (operators/graph."
    "pagerank_integer(redistribute_dangling=True)) over a graph where "
    "a fifth of the nodes are genuine sinks (edges only from nodes "
    "not divisible by 5): each round a 1-row aggregate sums the rank "
    "held by out-degree-0 nodes and every node receives D div n extra "
    "in-mass before damping — the uniform redistribution real crawl "
    "graphs need (rank mass otherwise leaks every round). Still "
    "integer-exact end-to-end; the oracle unrolls five rounds with a "
    "per-round dangling-share CTE. Physical shape: the base loop plus "
    "one broadcast 1-row frame per round — no driver collect.",
)
def q_graph_pagerank_dangling(spark: SparkSession, sf: str) -> DataFrame:
    e = _edges(spark).filter(F.col("src") % 5 != 0)
    return g_ops.pagerank_integer(
        e, N, iters=ITERS, scale=SCALE, redistribute_dangling=True
    ).orderBy("node")


def _ppr_oracle() -> str:
    """Unrolled personalized-PageRank recurrence over the sink-bearing
    graph: teleport AND dangling mass flow only to the 8 seed nodes
    (node % 50 = 0), so both the base and the per-round dangling share
    carry a seed-membership CASE."""
    n_seeds = len(range(0, N, 50))
    base = (100 - 85) * SCALE // (100 * n_seeds)
    edge_sql = _EDGE_SQL.replace(
        "WHERE src <> dst", "WHERE src <> dst AND src % 5 <> 0"
    )
    steps = []
    for t in range(1, ITERS + 1):
        prev = f"r{t - 1}"
        steps.append(
            f"""d{t} AS (
      SELECT COALESCE(SUM(rank), 0) // {n_seeds} AS share
      FROM {prev} WHERE node NOT IN (SELECT src FROM deg)
    ),
    r{t} AS (
      SELECT n.node,
             CASE WHEN n.node % 50 = 0 THEN {base} ELSE 0 END
             + (85 * (COALESCE(m.s, 0)
                + CASE WHEN n.node % 50 = 0 THEN d.share ELSE 0 END))
               // 100 AS rank
      FROM nodes n LEFT JOIN (
        SELECT e.dst AS node, SUM(r.rank // deg.d) AS s
        FROM e JOIN {prev} r ON r.node = e.src
               JOIN deg ON deg.src = e.src
        GROUP BY 1) m USING (node)
      CROSS JOIN d{t} d
    )"""
        )
    return f"""
    WITH nodes AS (SELECT range AS node FROM range({N})),
    e AS (
      {edge_sql}
    ),
    deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY 1),
    r0 AS (
      SELECT node,
             CASE WHEN node % 50 = 0 THEN {SCALE // n_seeds} ELSE 0 END
               AS rank
      FROM nodes
    ),
    {",".join(steps)}
    SELECT CAST(node AS BIGINT) AS node, CAST(rank AS BIGINT) AS rank
    FROM r{ITERS} ORDER BY node
    """


@register(
    "q_graph_ppr",
    oracle=_ppr_oracle(),
    doc="PERSONALIZED PageRank (r10, operators/graph.pagerank_integer"
    "(seeds=…, redistribute_dangling=True)): teleport mass, dangling "
    "mass and the initial vector all concentrate on an 8-node seed "
    "set (node % 50 = 0) over the sink-bearing graph, so ranks "
    "measure proximity TO THE SEEDS — the related-items / "
    "topic-focused crawl-frontier primitive. Same integer-exact "
    "recurrence and per-round localCheckpoint as the base loop; the "
    "oracle unrolls five rounds with seed-membership CASEs in the "
    "base and the per-round dangling-share lanes. Seeds are a "
    "model-sized literal IN-set — personalization input, never a "
    "data collect.",
)
def q_graph_ppr(spark: SparkSession, sf: str) -> DataFrame:
    e = _edges(spark).filter(F.col("src") % 5 != 0)
    return g_ops.pagerank_integer(
        e,
        N,
        iters=ITERS,
        scale=SCALE,
        redistribute_dangling=True,
        seeds=list(range(0, N, 50)),
    ).orderBy("node")


@register(
    "q_graph_triangles",
    oracle=f"""
    WITH nodes AS (SELECT range AS node FROM range({N})),
    e0 AS (
      {_EDGE_SQL}
    ),
    und AS (
      SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
      FROM e0
    )
    SELECT CAST(e1.a AS BIGINT) AS a, CAST(e1.b AS BIGINT) AS b,
           CAST(e2.b AS BIGINT) AS c
    FROM und e1
    JOIN und e2 ON e2.a = e1.b
    JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    ORDER BY a, b, c
    """,
    doc="Exact triangle enumeration (operators/graph.triangle_count): "
    "each undirected edge oriented from its (degree, id)-smaller "
    "endpoint, wedges built by one self-join on the low vertex, closed "
    "by one membership join — fan-out bounded by the SMALLER endpoint "
    "degree, the skew-proofing that keeps power-law hubs from deg² "
    "blow-up at scale. Output is the numerically-sorted (a,b,c) "
    "triangle list, representation-independent, so the oracle "
    "enumerates the classic a<b<c three-way join instead and must "
    "match row-for-row.",
)
def q_graph_triangles(spark: SparkSession, sf: str) -> DataFrame:
    return (
        g_ops.triangle_count(_edges(spark))
        .select(
            F.col("a").cast("long").alias("a"),
            F.col("b").cast("long").alias("b"),
            F.col("c").cast("long").alias("c"),
        )
        .orderBy("a", "b", "c")
    )


# k-core needs degree VARIANCE to peel non-trivially; the PageRank graph
# is near-8-regular (every node one in/out edge per function), so the
# core query uses quadratic edge maps — (i²+3) % N collides, giving a
# skewed degree distribution with a 3-round peel to a 366-node 4-core.
KCORE_K = 4
KCORE_FNS_SQL = [
    "(node*node + 3) % {n}",
    "(node*7 + 1) % {n}",
    "(3*node*node + 11) % {n}",
]
_KCORE_ROUNDS = 6  # measured peel depth is 3; unroll double for margin


def _kcore_edges(spark: SparkSession) -> DataFrame:
    nodes = sized_range(spark, N).select(F.col("id").alias("node"))
    parts = [
        nodes.select(
            F.col("node").alias("src"),
            ((F.col("node") * F.col("node") + 3) % N).alias("dst"),
        ),
        nodes.select(
            F.col("node").alias("src"),
            ((F.col("node") * 7 + 1) % N).alias("dst"),
        ),
        nodes.select(
            F.col("node").alias("src"),
            ((F.col("node") * F.col("node") * 3 + 11) % N).alias("dst"),
        ),
    ]
    e = parts[0]
    for p in parts[1:]:
        e = e.unionAll(p)
    return e.filter(F.col("src") != F.col("dst")).distinct()


def _kcore_oracle() -> str:
    fns = [f.format(n=N) for f in KCORE_FNS_SQL]
    edge_sql = (
        "SELECT DISTINCT src, dst FROM (\n"
        + "\n      UNION ALL ".join(
            f"SELECT node AS src, {f} AS dst FROM nodes" for f in fns
        )
        + "\n    ) WHERE src <> dst"
    )
    steps = []
    for t in range(1, _KCORE_ROUNDS + 1):
        steps.append(
            f"""p{t} AS (
      SELECT a AS node FROM (
        SELECT u.a, COUNT(*) AS c FROM und u
        WHERE u.a IN (SELECT node FROM p{t - 1})
          AND u.b IN (SELECT node FROM p{t - 1})
        GROUP BY u.a) WHERE c >= {KCORE_K}
    )"""
        )
    return f"""
    WITH nodes AS (SELECT range AS node FROM range({N})),
    e0 AS (
      {edge_sql}
    ),
    und AS (
      SELECT DISTINCT a, b FROM (
        SELECT src AS a, dst AS b FROM e0
        UNION ALL SELECT dst, src FROM e0)
    ),
    p0 AS (SELECT node FROM nodes),
    {",".join(steps)}
    SELECT CAST(u.a AS BIGINT) AS node, CAST(COUNT(*) AS BIGINT) AS degree
    FROM und u
    WHERE u.a IN (SELECT node FROM p{_KCORE_ROUNDS})
      AND u.b IN (SELECT node FROM p{_KCORE_ROUNDS})
    GROUP BY u.a ORDER BY node
    """


@register(
    "q_graph_kcore",
    oracle=_kcore_oracle(),
    doc="k-core decomposition (operators/graph.k_core): iterative peel "
    "of degree<k vertices to the unique maximal induced subgraph with "
    "min degree ≥ k — the standard graph-density filter (spam/link-farm "
    "triage on crawl graphs). Deletion-order independence makes the "
    "iterative algorithm oracle-certifiable: DuckDB unrolls 6 peel "
    "rounds (measured depth 3) over the same closed-form quadratic "
    "edge set and must reproduce the surviving (node, core-degree) "
    "rows exactly. Physical shape: one degree-aggregate shuffle + two "
    "edge-restriction semi-joins per round, per-round localCheckpoint "
    "keeping the plan flat; rounds = peeling depth, not |V|.",
)
def q_graph_kcore(spark: SparkSession, sf: str) -> DataFrame:
    return (
        g_ops.k_core(_kcore_edges(spark), k=KCORE_K)
        .select(
            F.col("node").cast("long").alias("node"),
            F.col("degree").cast("long").alias("degree"),
        )
        .orderBy("node")
    )


LP_ITERS = 3


def _label_prop_oracle() -> str:
    """Unrolled synchronous LPA recurrence: each round every node takes
    the most frequent neighbor label, ties to the smallest label."""
    steps = []
    for t in range(1, LP_ITERS + 1):
        prev = f"l{t - 1}"
        steps.append(
            f"""l{t} AS (
      SELECT node, label FROM (
        SELECT u.a AS node, r.label,
               ROW_NUMBER() OVER (
                 PARTITION BY u.a
                 ORDER BY COUNT(*) DESC, r.label ASC) AS rn
        FROM und u JOIN {prev} r ON r.node = u.b
        GROUP BY u.a, r.label) WHERE rn = 1
    )"""
        )
    return f"""
    WITH nodes AS (SELECT range AS node FROM range({N})),
    e AS (
      {_EDGE_SQL}
    ),
    und AS (
      SELECT DISTINCT a, b FROM (
        SELECT src AS a, dst AS b FROM e
        UNION ALL SELECT dst AS a, src AS b FROM e
      ) WHERE a <> b
    ),
    l0 AS (SELECT DISTINCT a AS node, a AS label FROM und),
    {",".join(steps)}
    SELECT CAST(node AS BIGINT) AS node, CAST(label AS BIGINT) AS label
    FROM l{LP_ITERS} ORDER BY node
    """


@register(
    "q_graph_label_prop",
    oracle=_label_prop_oracle(),
    doc="Label propagation communities (r11, operators/graph."
    "label_propagation): 3 synchronous rounds, each node adopting the "
    "most frequent neighbor label with ties to the smallest label — "
    "the deterministic tie rule turns classic LPA's randomness into "
    "an unrolled SQL recurrence DuckDB replays exactly (the PageRank "
    "certification trick applied to the cheap community detector). "
    "Physical shape: two key shuffles per round (neighbor-label count "
    "+ per-node struct-argmax, no window over the edge list), "
    "per-round localCheckpoint keeping the plan flat.",
)
def q_graph_label_prop(spark: SparkSession, sf: str) -> DataFrame:
    return g_ops.label_propagation(_edges(spark), iters=LP_ITERS).orderBy(
        "node"
    )


HITS_SCALE = 10**6
HITS_ITERS = 3


def _hits_oracle() -> str:
    rounds = []
    prev_h = "h0"
    for t in range(1, HITS_ITERS + 1):
        rounds.append(
            f"""a{t}r AS (
      SELECT n.node, COALESCE(m.s, 0) AS raw
      FROM nodes n LEFT JOIN (
        SELECT e.dst AS node, SUM(h.hub) AS s
        FROM e JOIN {prev_h} h ON h.node = e.src GROUP BY 1) m
      USING (node)
    ),
    a{t} AS (
      SELECT node, (raw * {HITS_SCALE}) //
             GREATEST((SELECT SUM(raw) FROM a{t}r), 1) AS auth
      FROM a{t}r
    ),
    h{t}r AS (
      SELECT n.node, COALESCE(m.s, 0) AS raw
      FROM nodes n LEFT JOIN (
        SELECT e.src AS node, SUM(a.auth) AS s
        FROM e JOIN a{t} a ON a.node = e.dst GROUP BY 1) m
      USING (node)
    ),
    h{t} AS (
      SELECT node, (raw * {HITS_SCALE}) //
             GREATEST((SELECT SUM(raw) FROM h{t}r), 1) AS hub
      FROM h{t}r
    )"""
        )
        prev_h = f"h{t}"
    return f"""
    WITH nodes AS (SELECT range AS node FROM range({N})),
    e AS (
      {_EDGE_SQL}
    ),
    h0 AS (SELECT node, {HITS_SCALE} AS hub FROM nodes),
    {",".join(rounds)}
    SELECT CAST(n.node AS BIGINT) AS node,
           CAST(h.hub AS BIGINT) AS hub,
           CAST(a.auth AS BIGINT) AS auth
    FROM nodes n
    JOIN h{HITS_ITERS} h USING (node)
    JOIN a{HITS_ITERS} a USING (node)
    ORDER BY node
    """


@register(
    "q_graph_hits",
    oracle=_hits_oracle(),
    doc="HITS hubs and authorities (r11, operators/graph.hits_integer)"
    " — the query-independent link-analysis pair to PageRank, in "
    "scaled-integer arithmetic with L1 normalization as one integral "
    "division per node per half-round (the irrational L2 norm is "
    "exactly what keeps classic HITS out of certified lanes; the L1 "
    "variant is the standard convex-combination form). Each round is "
    "two aggregate shuffles (dst then src) plus two 1-row broadcast "
    "normalizing sums — no driver collect, per-round localCheckpoint; "
    "the oracle unrolls all three rounds and every hub/auth value "
    "hash-compares bit-for-bit.",
)
def q_graph_hits(spark: SparkSession, sf: str) -> DataFrame:
    res = g_ops.hits_integer(
        _edges(spark), N, iters=HITS_ITERS, scale=HITS_SCALE
    )
    return res.select(
        F.col("node").cast("long").alias("node"),
        F.col("hub").cast("long").alias("hub"),
        F.col("auth").cast("long").alias("auth"),
    ).orderBy("node")


@register(
    "q_graph_link_pred",
    oracle=f"""
    WITH nodes AS (SELECT range AS node FROM range({N})),
    e AS (
      {_EDGE_SQL}
    ),
    und AS (
      SELECT src AS a, dst AS b FROM e
      UNION
      SELECT dst AS a, src AS b FROM e
    ),
    deg AS (SELECT a AS z, COUNT(*) AS deg FROM und GROUP BY 1),
    adj AS (SELECT b AS z, a AS n FROM und),
    wed AS (
      SELECT l.z, l.n AS na, r.n AS nb
      FROM adj l JOIN adj r ON l.z = r.z AND l.n < r.n
    ),
    sc AS (
      SELECT na AS node_a, nb AS node_b, COUNT(*) AS cn,
             SUM(1000000 // d.deg) AS ra
      FROM wed JOIN deg d ON d.z = wed.z GROUP BY 1, 2
    ),
    fresh AS (
      SELECT sc.* FROM sc
      LEFT JOIN und ON und.a = sc.node_a AND und.b = sc.node_b
      WHERE und.a IS NULL
    )
    SELECT CAST(node_a AS BIGINT) AS node_a,
           CAST(node_b AS BIGINT) AS node_b,
           CAST(cn AS BIGINT) AS common_neighbors,
           CAST(ra AS BIGINT) AS ra_ppm,
           CAST(cn * 1000000 // (da.deg + db.deg - cn) AS BIGINT)
             AS jaccard_ppm
    FROM fresh
    JOIN deg da ON da.z = fresh.node_a
    JOIN deg db ON db.z = fresh.node_b
    ORDER BY ra_ppm DESC, common_neighbors DESC, node_a, node_b
    LIMIT 200
    """,
    doc="Neighborhood link prediction (r11, operators/graph."
    "link_prediction): common-neighbor count, Resource Allocation "
    "index as Σ 10^6 div deg(z) (RA instead of Adamic–Adar precisely "
    "because 1/deg needs no irrational ln — certifiable), and Jaccard "
    "ppm, for every non-adjacent distance-2 pair. One wedge self-join "
    "on the shared neighbor (the triangle_count key), one pair "
    "aggregate, one left_anti against the edge set; the top-200 by "
    "(ra, cn, pair) is a total order, so the ranked head "
    "hash-compares exactly.",
)
def q_graph_link_pred(spark: SparkSession, sf: str) -> DataFrame:
    res = g_ops.link_prediction(_edges(spark))
    return (
        res.orderBy(
            F.desc("ra_ppm"),
            F.desc("common_neighbors"),
            "node_a",
            "node_b",
        )
        .limit(200)
        .select(
            F.col("node_a").cast("long"),
            F.col("node_b").cast("long"),
            "common_neighbors",
            "ra_ppm",
            "jaccard_ppm",
        )
    )


@register(
    "q_graph_assortativity",
    oracle=f"""
    WITH nodes AS (SELECT range AS node FROM range({N})),
    e AS (
      {_EDGE_SQL}
    ),
    und AS (
      SELECT src AS a, dst AS b FROM e
      UNION
      SELECT dst AS a, src AS b FROM e
    ),
    deg AS (SELECT a AS z, CAST(COUNT(*) AS BIGINT) AS deg
            FROM und GROUP BY 1),
    pairs AS (
      SELECT da.deg AS x, db.deg AS y
      FROM und JOIN deg da ON da.z = und.a JOIN deg db ON db.z = und.b
    ),
    ag AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n1,
             CAST(SUM(x) AS HUGEINT) AS sx,
             CAST(SUM(y) AS HUGEINT) AS sy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(y AS HUGEINT) * y) AS syy,
             SUM(CAST(x AS HUGEINT) * y) AS sxy
      FROM pairs
    )
    SELECT CAST(n1 AS BIGINT) AS n,
           CAST(CASE WHEN (n1*sxx - sx*sx) > 0 THEN
             (((n1*sxy - sx*sy) * 1000000 + (n1*sxx - sx*sx) * {10**10})
              // (n1*sxx - sx*sx) - {10**10}) END AS BIGINT) AS beta_ppm,
           CAST(CASE WHEN (n1*sxx - sx*sx) > 0 THEN
             (((sy * (n1*sxx - sx*sx) - sx * (n1*sxy - sx*sy)) * 1000000
               + (n1 * (n1*sxx - sx*sx)) * {10**10})
              // (n1 * (n1*sxx - sx*sx)) - {10**10}) END AS BIGINT)
             AS alpha_ppm,
           CAST(CASE WHEN (n1*sxx - sx*sx) > 0 AND (n1*syy - sy*sy) > 0
             THEN ((((n1*sxy - sx*sy) * 1000000 + (n1*sxx - sx*sx) * {10**10})
                    // (n1*sxx - sx*sx) - {10**10})
                 * (((n1*sxy - sx*sy) * 1000000 + (n1*syy - sy*sy) * {10**10})
                    // (n1*syy - sy*sy) - {10**10})
                 + 1000000 * {10**10}) // 1000000 - {10**10}
             END AS BIGINT) AS r2_ppm
    FROM ag
    """,
    doc="Degree assortativity (r11) — do high-degree nodes link to "
    "high-degree nodes? The standard mixing diagnostic, computed as "
    "OLS over the (deg(a), deg(b)) pairs of every directed edge of "
    "the undirected view: positive slope = assortative (social-graph "
    "shape), negative = disassortative (web/hub shape). Pure "
    "COMPOSITION of the certified pieces — the undirected/degree "
    "frames of link_prediction and operators.timeseries.ols_integer "
    "(both slopes' product = the squared degree correlation, the "
    "certifiable stand-in for Newman's sqrt-bearing r). One degree "
    "aggregate + two broadcast joins + the 6-sum OLS aggregate.",
)
def q_graph_assortativity(spark: SparkSession, sf: str) -> DataFrame:
    from incremental_github_data_pipeline_spark.operators.timeseries import (
        ols_integer,
    )

    e = _edges(spark)
    und = (
        e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .union(e.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = und.groupBy(F.col("a").alias("z")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    pairs = (
        und.join(deg.withColumnRenamed("z", "a"), "a")
        .withColumnRenamed("deg", "x")
        .join(
            deg.select(F.col("z").alias("b"), F.col("deg").alias("y")),
            "b",
        )
        .select(F.lit("g").alias("k"), "x", "y")
    )
    return ols_integer(pairs, "k", "x", "y").drop("k")


BFS_ROUNDS = 3
BFS_SEEDS = [s for s in range(N) if s % 97 == 0]
_BFS_INF = 10**9


def _bfs_oracle() -> str:
    """Unrolled min-plus relaxation: the same recurrence bfs_levels
    runs, one CTE stage per round, sentinel INF for unreached."""
    steps = []
    for t in range(1, BFS_ROUNDS + 1):
        prev = f"d{t - 1}"
        steps.append(
            f"""d{t} AS (
      SELECT n.node,
             LEAST(p.level, COALESCE(m.minin, {_BFS_INF})) AS level
      FROM nodes n
      JOIN {prev} p USING (node)
      LEFT JOIN (
        SELECT e.dst AS node, MIN(p.level + 1) AS minin
        FROM e JOIN {prev} p ON p.node = e.src
        GROUP BY 1
      ) m USING (node)
    )"""
        )
    return f"""
    WITH nodes AS (SELECT range AS node FROM range({N})),
    e AS ({_EDGE_SQL}),
    d0 AS (
      SELECT node,
             CASE WHEN node % 97 = 0 THEN 0 ELSE {_BFS_INF} END AS level
      FROM nodes
    ),
    {",".join(steps)}
    SELECT CAST(node AS BIGINT) AS node,
           CAST(CASE WHEN level < {_BFS_INF} THEN level END AS BIGINT)
             AS level
    FROM d{BFS_ROUNDS} ORDER BY node
    """


@register(
    "q_graph_bfs",
    oracle=_bfs_oracle(),
    doc="Multi-source BFS levels (r12, operators/graph.bfs_levels): "
    "distance from the nearest seed (every 97th node) following "
    "directed edges, exact up to 3 hops, NULL beyond the budget — the "
    "reachability/decontamination primitive (how far a flagged page's "
    "influence travels through the link graph). Min-plus label "
    "relaxation with a sentinel-INF integer lane, so the whole "
    "trajectory unrolls as CTE stages and hash-compares exactly, "
    "including the unreached-NULL frontier. One aggregate shuffle per "
    "round + per-round localCheckpoint (the sweep-20 flat-plan "
    "contract shared by all four iterative graph loops).",
)
def q_graph_bfs(spark: SparkSession, sf: str) -> DataFrame:
    return g_ops.bfs_levels(
        _edges(spark), N, seeds=BFS_SEEDS, rounds=BFS_ROUNDS
    ).orderBy("node")
