"""[EXT] Privacy / governance audit queries (`operators/privacy.py`):
k-anonymity and l-diversity over the customer table's quasi-identifier
classes, plus the suppression transform that enforces the gate.

No reference counterpart (`/root/reference` has no governance surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incremental_github_data_pipeline_spark.operators import privacy as pv
from incremental_github_data_pipeline_spark.queries import register
from incremental_github_data_pipeline_spark.queries.relational import T

_K = 10
_L = 2


@register(
    "q_privacy_kanon",
    oracle=f"""
    SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
           c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS class_size,
           CAST(COUNT(DISTINCT c_acctbal < 0) AS BIGINT) AS n_sensitive,
           COUNT(*) < {_K} AS k_violation,
           COUNT(DISTINCT c_acctbal < 0) < {_L} AS l_violation
    FROM customer
    GROUP BY c_nationkey, c_mktsegment
    ORDER BY c_nationkey, c_mktsegment
    """,
    doc="k-anonymity + l-diversity audit (operators/privacy."
    "k_anonymity_report): one row per (nation, market-segment) "
    "quasi-identifier class with its size, distinct sensitive values "
    "(account-in-debt flag) and the k/l violation verdicts — the "
    "release gate a training-data pipeline runs before publishing "
    "derived user data. One map-combined group-by on the quasi tuple; "
    "exact distinct counts (a gate must not approximate its own "
    "pass/fail).",
)
def q_privacy_kanon(spark: SparkSession, sf: str) -> DataFrame:
    report = pv.k_anonymity_report(
        T(spark, sf, "customer").withColumn(
            "_in_debt", F.col("c_acctbal") < 0
        ),
        ["c_nationkey", "c_mktsegment"],
        k=_K,
        sensitive_col="_in_debt",
        l=_L,
    )
    return report.select(
        "c_nationkey",
        "c_mktsegment",
        "class_size",
        "n_sensitive",
        "k_violation",
        "l_violation",
    ).orderBy("c_nationkey", "c_mktsegment")


@register(
    "q_privacy_suppress",
    oracle=f"""
    WITH big AS (
      SELECT c_nationkey, c_mktsegment
      FROM customer GROUP BY 1, 2 HAVING COUNT(*) >= {_K}
    )
    SELECT CAST(c.c_nationkey AS BIGINT) AS c_nationkey,
           c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(c.c_custkey) AS BIGINT) AS min_custkey,
           CAST(MAX(c.c_custkey) AS BIGINT) AS max_custkey
    FROM customer c
    JOIN big USING (c_nationkey, c_mktsegment)
    GROUP BY c.c_nationkey, c.c_mktsegment
    ORDER BY c.c_nationkey, c.c_mktsegment
    """,
    doc="k-anonymity ENFORCEMENT by suppression (operators/privacy."
    "suppress_small_classes): rows in sub-k quasi-identifier classes "
    "are dropped via a class-size semi-join on the same key as the "
    "audit shuffle; the compared output is the per-class row count + "
    "custkey range of the released table, so a wrongly kept or "
    "dropped class breaks the hash.",
)
def q_privacy_suppress(spark: SparkSession, sf: str) -> DataFrame:
    released = pv.suppress_small_classes(
        T(spark, sf, "customer"), ["c_nationkey", "c_mktsegment"], k=_K
    )
    return (
        released.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("c_custkey").alias("min_custkey"),
            F.max("c_custkey").alias("max_custkey"),
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )


_GK = 25


@register(
    "q_privacy_generalize",
    oracle=f"""
    WITH l0 AS (
      SELECT n.n_name AS geo, c.c_mktsegment AS seg
      FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    ),
    l1 AS (
      SELECT r.r_name AS geo, c.c_mktsegment AS seg
      FROM customer c
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
    ),
    l2 AS (SELECT '*' AS geo, c_mktsegment AS seg FROM customer),
    v0 AS (SELECT COUNT(*) AS v FROM (
      SELECT 1 FROM l0 GROUP BY geo, seg HAVING COUNT(*) < {_GK})),
    v1 AS (SELECT COUNT(*) AS v FROM (
      SELECT 1 FROM l1 GROUP BY geo, seg HAVING COUNT(*) < {_GK})),
    lvl AS (
      SELECT CASE WHEN (SELECT v FROM v0) = 0 THEN 0
                  WHEN (SELECT v FROM v1) = 0 THEN 1
                  ELSE 2 END AS level
    )
    SELECT geo, seg,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST((SELECT level FROM lvl) AS BIGINT) AS level
    FROM (
      SELECT geo, seg FROM l0 WHERE (SELECT level FROM lvl) = 0
      UNION ALL
      SELECT geo, seg FROM l1 WHERE (SELECT level FROM lvl) = 1
      UNION ALL
      SELECT geo, seg FROM l2 WHERE (SELECT level FROM lvl) = 2
    )
    GROUP BY geo, seg ORDER BY geo, seg
    """,
    doc="k-anonymity by GENERALIZATION (operators/privacy."
    "generalize_to_k): the geo quasi-identifier climbs a fixed ladder "
    "— nation → region → '*' — until every (geo, segment) class "
    "reaches k=25; resolution is spent instead of rows (the "
    "suppression trade's other side). The chosen level is "
    "data-dependent, and the ORACLE replays the same adaptive "
    "decision (violation counts at each level as scalar subqueries), "
    "so the compare stays exact across testdata regenerations. One "
    "class-size aggregate + 1-row gate per level.",
)
def q_privacy_generalize(spark: SparkSession, sf: str) -> DataFrame:
    customer = T(spark, sf, "customer")
    nation = T(spark, sf, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = T(spark, sf, "region").select("r_regionkey", "r_name")

    base = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("geo"),
            F.col("c_mktsegment").alias("seg"),
            "n_regionkey",
        )
    )

    def to_region(df: DataFrame) -> DataFrame:
        return df.join(
            F.broadcast(region), df.n_regionkey == region.r_regionkey
        ).select(
            F.col("r_name").alias("geo"), "seg", "n_regionkey"
        )

    def to_star(df: DataFrame) -> DataFrame:
        return df.select(F.lit("*").alias("geo"), "seg", "n_regionkey")

    from incremental_github_data_pipeline_spark.operators.privacy import (
        generalize_to_k,
    )

    released, level, _resid = generalize_to_k(
        base, ["geo", "seg"], k=_GK, ladder=[to_region, to_star]
    )
    return (
        released.groupBy("geo", "seg")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("level", F.lit(level).cast("long"))
        .orderBy("geo", "seg")
    )


_T_PPM = 60_000


@register(
    "q_privacy_tcloseness",
    oracle=f"""
    WITH cls AS (
      SELECT c_mktsegment AS seg, COUNT(*) AS n FROM customer GROUP BY 1
    ),
    g AS (
      SELECT c_nationkey AS v, COUNT(*) AS gc FROM customer GROUP BY 1
    ),
    tot AS (SELECT COUNT(*) AS nt FROM customer),
    mm AS (SELECT COUNT(*) AS m FROM g),
    pc AS (
      SELECT c_mktsegment AS seg, c_nationkey AS v, COUNT(*) AS c
      FROM customer GROUP BY 1, 2
    ),
    grid AS (
      SELECT cls.seg, cls.n, g.v, g.gc, COALESCE(pc.c, 0) AS c
      FROM cls CROSS JOIN g
      LEFT JOIN pc ON pc.seg = cls.seg AND pc.v = g.v
    ),
    cum AS (
      SELECT seg, n,
             SUM(CAST(c AS HUGEINT) * tot.nt - CAST(gc AS HUGEINT) * n)
               OVER (PARTITION BY seg ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
      FROM grid CROSS JOIN tot
    ),
    agg AS (
      SELECT seg, MAX(n) AS class_size, SUM(ABS(cum)) AS s
      FROM cum GROUP BY seg
    )
    SELECT agg.seg AS c_mktsegment,
           CAST(agg.class_size AS BIGINT) AS class_size,
           CAST(agg.s * 1000000 // (CAST(agg.class_size AS HUGEINT)
                * tot.nt * (mm.m - 1)) AS BIGINT) AS emd_ppm,
           agg.s * 1000000 // (CAST(agg.class_size AS HUGEINT)
                * tot.nt * (mm.m - 1)) > {_T_PPM} AS t_violation
    FROM agg CROSS JOIN tot CROSS JOIN mm
    ORDER BY c_mktsegment
    """,
    doc="t-closeness audit (r11, operators/privacy.t_closeness_report) "
    "— the third rung of the release ladder after k-anonymity and "
    "l-diversity: per market-segment class, the ordered-metric Earth "
    "Mover's Distance between the class's nation distribution and the "
    "table's, as an exact integer ppm lane (cross-multiplied counts "
    "through DECIMAL, prefix sums over the ordered value grid, one "
    "integral division at the end — DuckDB replays it digit-exact "
    "with HUGEINT). Flags the SKEWED class that k/l both pass: "
    "membership alone leaks when a class's sensitive distribution "
    "diverges from the population's. Audit grid is classes x "
    "sensitive domain — governance-sized, never fact-sized.",
)
def q_privacy_tcloseness(spark: SparkSession, sf: str) -> DataFrame:
    report = pv.t_closeness_report(
        T(spark, sf, "customer"),
        ["c_mktsegment"],
        "c_nationkey",
        t_ppm=_T_PPM,
        ordered=True,
    )
    return report.orderBy("c_mktsegment")


_DP_CASE = (
    "CASE WHEN r < 256 THEN 0 WHEN r < 512 THEN 1 WHEN r < 640 THEN 2 "
    "WHEN r < 704 THEN 3 WHEN r < 736 THEN 4 WHEN r < 752 THEN 5 "
    "WHEN r < 760 THEN 6 WHEN r < 764 THEN 7 ELSE 8 END"
)


@register(
    "q_privacy_dp_counts",
    oracle=f"""
    WITH c AS (
      SELECT user_id % 50 AS grp, COUNT(*) AS n
      FROM events GROUP BY 1
    ),
    h AS (
      SELECT grp, n,
             (grp * 2654435761 + 7 * 97531) % 2147483648 AS h
      FROM c
    ),
    m AS (
      SELECT grp, n, h % 768 AS r,
             CASE WHEN (h // 768) % 2 = 0 THEN 1 ELSE -1 END AS sgn
      FROM h
    )
    SELECT CAST(grp AS BIGINT) AS grp,
           CAST(GREATEST(0, n + sgn * ({_DP_CASE})) AS BIGINT)
             AS n_noisy
    FROM m ORDER BY grp
    """,
    doc="Differentially-private-shaped noisy release counts (r12, "
    "operators/privacy.dp_noisy_counts): per-group counts plus "
    "truncated discrete Laplace noise (two-sided geometric, alpha = "
    "1/2 i.e. epsilon = ln 2, magnitudes clipped at 8 — the bounded-"
    "geometric mechanism production DP libraries ship), clamped at "
    "zero. The noise is deterministic pseudo-noise per (group, seed): "
    "a Knuth multiplicative hash drives an exact inverse-CDF walk "
    "over a denominator-768 integer lattice (alpha = 1/2 makes every "
    "tail dyadic — no float, no transcendental), so the oracle "
    "replays every noisy count bit-for-bit; determinism per seed is "
    "also what blocks the re-run averaging attack. Fourth rung of "
    "the release ladder (k-anon -> l-div -> t-closeness -> noisy "
    "aggregates). One map-combined aggregate; noise is column math "
    "on the 50-row group frame.",
)
def q_privacy_dp_counts(spark: SparkSession, sf: str) -> DataFrame:
    from incremental_github_data_pipeline_spark.operators.privacy import (
        dp_noisy_counts,
    )

    ev = T(spark, sf, "events").select(
        F.pmod(F.col("user_id"), F.lit(50)).alias("grp")
    )
    return dp_noisy_counts(ev, "grp", seed=7).orderBy("grp")
