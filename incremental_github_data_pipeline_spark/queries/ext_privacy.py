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
