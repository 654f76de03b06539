"""[EXT] Temporal-join queries (operators.temporal) over the events
stream table, both oracle-checked — DuckDB speaks ASOF JOIN natively
and the band join is plain inequality SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incremental_github_data_pipeline_spark.operators.temporal import (
    as_of_join,
    range_join,
)
from incremental_github_data_pipeline_spark.queries import register
from incremental_github_data_pipeline_spark.sources.readers import read_table as T


@register(
    "q_asof_join",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    v AS (
      SELECT user_id, ts AS view_ts, MAX(event_id) AS view_id
      FROM events WHERE event_type = 'view' GROUP BY user_id, ts
    )
    SELECT p.event_id, p.user_id, p.ts,
           v.view_id AS asof_view_id, v.view_ts AS asof_view_ts
    FROM p ASOF LEFT JOIN v
      ON p.user_id = v.user_id AND p.ts >= v.view_ts
    ORDER BY p.event_id
    """,
    doc="As-of join (operators.temporal.as_of_join): for every purchase, "
    "the latest preceding view by the same user. Union + single "
    "key-shuffle + running last() window — no range explosion.",
)
def q_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_id"))
        .select("user_id", F.col("ts").alias("view_ts"), "view_id")
    )
    return as_of_join(
        purchases,
        views,
        on=["user_id"],
        left_ts="ts",
        right_ts="view_ts",
        right_cols=["view_id", "view_ts"],
        prefix="asof_",
    ).orderBy("event_id")


@register(
    "q_range_join_count",
    oracle="""
    SELECT a.event_id, a.user_id, CAST(COUNT(b.event_id) AS BIGINT) AS n_views
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') a
    LEFT JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view') b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts - INTERVAL 1 HOUR AND b.ts <= a.ts
    GROUP BY a.event_id, a.user_id
    ORDER BY a.event_id
    """,
    doc="Range/band join (operators.temporal.range_join): views within "
    "the hour preceding each error, per user. Band→bucket equi-join "
    "(each left row probes ≤2 buckets) instead of a theta join.",
)
def q_range_join_count(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "events")
    errors = e.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    views = e.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    pairs = range_join(
        errors,
        views,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        lower_s=-3600.0,
        upper_s=0.0,
        right_cols=["event_id"],
        prefix="v_",
    )
    counts = pairs.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("_n")
    )
    return (
        errors.join(counts, "event_id", "left")
        .select(
            "event_id",
            "user_id",
            F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_views"),
        )
        .orderBy("event_id")
    )
