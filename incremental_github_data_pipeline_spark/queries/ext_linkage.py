"""[EXT] Record-linkage queries (`operators/linkage.py`): blocked
Fellegi–Sunter entity resolution across the customer and supplier
tables — the cross-source "is this the same entity" primitive a
training-data pipeline runs on authors/users/publishers arriving from
multiple crawls.

No reference counterpart (`/root/reference` has no linkage surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incremental_github_data_pipeline_spark.operators.linkage import (
    FieldComparator,
    blocked_linkage,
)
from incremental_github_data_pipeline_spark.queries import register
from incremental_github_data_pipeline_spark.queries.relational import T

# scaled-integer Fellegi–Sunter weights (what fs_weights(m, u) would
# emit for plausible m/u at scale 1000) — fixed so the certified lane
# is pure integer arithmetic
_W_NAME_A, _W_NAME_D = 2807, -152
_W_BAL_A, _W_BAL_D = 1585, -415
_UPPER, _LOWER = 3000, -400


@register(
    "q_linkage_blocked",
    oracle=f"""
    WITH pairs AS (
      SELECT c.c_custkey AS left_id, s.s_suppkey AS right_id,
             CASE WHEN substring(c.c_name, -4, 4)
                       = substring(s.s_name, -4, 4)
                  THEN 1 ELSE 0 END AS name4_agree,
             CASE WHEN ABS(c.c_acctbal - s.s_acctbal) <= 500
                  THEN 1 ELSE 0 END AS bal_agree
      FROM customer c JOIN supplier s ON c.c_nationkey = s.s_nationkey
      WHERE c.c_custkey < 300
    ),
    scored AS (
      SELECT *,
             (CASE WHEN name4_agree = 1
                   THEN {_W_NAME_A} ELSE {_W_NAME_D} END
              + CASE WHEN bal_agree = 1
                     THEN {_W_BAL_A} ELSE {_W_BAL_D} END) AS score
      FROM pairs
    )
    SELECT CAST(left_id AS BIGINT) AS left_id,
           CAST(right_id AS BIGINT) AS right_id,
           CAST(name4_agree AS BIGINT) AS name4_agree,
           CAST(bal_agree AS BIGINT) AS bal_agree,
           CAST(score AS BIGINT) AS score,
           CASE WHEN score >= {_UPPER} THEN 'match'
                WHEN score <= {_LOWER} THEN 'non_match'
                ELSE 'possible' END AS verdict
    FROM scored ORDER BY left_id, right_id
    """,
    doc="Blocked Fellegi–Sunter record linkage (r10, operators/"
    "linkage.blocked_linkage): customer × supplier candidates exist "
    "only within a nation block (the quadratic-to-linear reduction "
    "blocking exists for — an ordinary equi-join Catalyst plans like "
    "any other), then two codegen'd field comparators (name "
    "4-suffix — the zero-padded entity number, |acctbal diff| <= 500) add caller-fixed scaled-integer "
    "agreement/disagreement weights and the summed score classifies "
    "match / possible / non-match — the original model's clerical-"
    "review band. Weights are integers by design (float log-ratios "
    "live in the off-lane fs_weights helper), so every lane is "
    "bit-reproducible and the oracle replays pair set, per-field "
    "agreement, score and verdict exactly.",
)
def q_linkage_blocked(spark: SparkSession, sf: str) -> DataFrame:
    cust = (
        T(spark, sf, "customer")
        .filter(F.col("c_custkey") < 300)
        .select(
            F.col("c_custkey").alias("left_id"),
            F.col("c_nationkey").alias("nation"),
            F.col("c_name").alias("name_l"),
            F.col("c_acctbal").alias("bal_l"),
        )
    )
    supp = T(spark, sf, "supplier").select(
        F.col("s_suppkey").alias("right_id"),
        F.col("s_nationkey").alias("nation"),
        F.col("s_name").alias("name_r"),
        F.col("s_acctbal").alias("bal_r"),
    )
    comparators = [
        FieldComparator(
            "name4", "name_l", "name_r",
            agree=_W_NAME_A, disagree=_W_NAME_D, mode="suffix:4",
        ),
        FieldComparator(
            "bal", "bal_l", "bal_r",
            agree=_W_BAL_A, disagree=_W_BAL_D, mode="abs_diff:500",
        ),
    ]
    return blocked_linkage(
        cust, supp, ["nation"], comparators, upper=_UPPER, lower=_LOWER
    ).orderBy("left_id", "right_id")


@register(
    "q_linkage_best_match",
    oracle=f"""
    WITH pairs AS (
      SELECT c.c_custkey AS left_id, s.s_suppkey AS right_id,
             CASE WHEN substring(c.c_name, -4, 4)
                       = substring(s.s_name, -4, 4)
                  THEN 1 ELSE 0 END AS name4_agree,
             CASE WHEN ABS(c.c_acctbal - s.s_acctbal) <= 500
                  THEN 1 ELSE 0 END AS bal_agree
      FROM customer c JOIN supplier s ON c.c_nationkey = s.s_nationkey
      WHERE c.c_custkey < 300
    ),
    scored AS (
      SELECT left_id, right_id,
             (CASE WHEN name4_agree = 1
                   THEN {_W_NAME_A} ELSE {_W_NAME_D} END
              + CASE WHEN bal_agree = 1
                     THEN {_W_BAL_A} ELSE {_W_BAL_D} END) AS score
      FROM pairs
    ),
    best AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY left_id ORDER BY score DESC, right_id) AS rnk
      FROM scored
    )
    SELECT CAST(left_id AS BIGINT) AS left_id,
           CAST(right_id AS BIGINT) AS right_id,
           CAST(score AS BIGINT) AS score,
           CASE WHEN score >= {_UPPER} THEN 'match'
                WHEN score <= {_LOWER} THEN 'non_match'
                ELSE 'possible' END AS verdict
    FROM best WHERE rnk = 1 ORDER BY left_id
    """,
    doc="Best-match ASSIGNMENT over the blocked linkage (r10): each "
    "left entity keeps only its highest-scoring candidate "
    "(deterministic (score desc, right_id) tie-break — a window "
    "top-1 per left key, the standard step between pairwise scoring "
    "and survivorship). One row per left entity with the winning "
    "right id, score and verdict; the oracle replays scoring AND the "
    "assignment window exactly.",
)
def q_linkage_best_match(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    pairs = q_linkage_blocked(spark, sf)  # register() returns fn as-is
    w = Window.partitionBy("left_id").orderBy(
        F.desc("score"), F.asc("right_id")
    )
    return (
        pairs.withColumn("_rnk", F.row_number().over(w))
        .filter(F.col("_rnk") == 1)
        .select("left_id", "right_id", "score", "verdict")
        .orderBy("left_id")
    )
