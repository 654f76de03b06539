"""[EXT] Temporal-join queries (operators.temporal) over the events
stream table, both oracle-checked — DuckDB speaks ASOF JOIN natively
and the band join is plain inequality SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incremental_github_data_pipeline_spark.operators import temporal
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


@register(
    "q_interval_overlap",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, event_type,
             epoch_us(ts) AS s_us,
             epoch_us(ts) + CAST(FLOOR(value * 10) AS BIGINT) * 1000000 AS e_us
      FROM events
    ),
    l AS (SELECT * FROM e WHERE user_id % 2 = 0 AND s_us < e_us),
    r AS (SELECT * FROM e WHERE user_id % 2 = 1 AND s_us < e_us)
    SELECT l.event_type AS event_type, CAST(COUNT(*) AS BIGINT) AS n_overlaps
    FROM l JOIN r
      ON l.event_type = r.event_type AND l.s_us < r.e_us AND r.s_us < l.e_us
    GROUP BY l.event_type ORDER BY l.event_type
    """,
    doc="Interval-overlap join (operators.temporal.interval_join): "
    "events become [ts, ts + floor(value*10)s) activity intervals; "
    "overlapping pairs across the two user halves are counted per "
    "event type. Bucketized equi-join (never a theta join) with "
    "dedup-free single-bucket match ownership — the overlap's start "
    "bucket owns the pair, so no dropDuplicates shuffle. Half-open "
    "semantics: empty intervals (end <= start) match nothing, pinned "
    "on both sides.",
)
def q_interval_overlap(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "events")
    end_ts = F.timestamp_micros(
        F.unix_micros(F.col("ts"))
        + F.floor(F.col("value") * 10).cast("long") * 1_000_000
    )
    iv = e.select("event_id", "user_id", "event_type", F.col("ts").alias("s"), end_ts.alias("e"))
    left = iv.filter(F.col("user_id") % 2 == 0)
    right = iv.filter(F.col("user_id") % 2 == 1)
    joined = temporal.interval_join(
        left,
        right,
        on=["event_type"],
        left_start="s",
        left_end="e",
        right_start="s",
        right_end="e",
        right_cols=["event_id"],
        bucket_s=3600.0,
    )
    return (
        joined.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_overlaps"))
        .orderBy("event_type")
    )


@register(
    "q_conversion_window",
    oracle="""
    WITH s AS (
      SELECT event_id, user_id, ts
      FROM events WHERE event_type = 'signup'
    ),
    p AS (
      SELECT user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    nxt AS (
      SELECT s.event_id, s.user_id,
             MIN(p.ts) AS p_ts
      FROM s LEFT JOIN p
        ON p.user_id = s.user_id AND p.ts >= s.ts
      GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_signups,
           CAST(SUM(CASE WHEN p_ts IS NOT NULL
                          AND epoch_us(p_ts) - epoch_us(s.ts)
                              <= 86400000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
           CAST(SUM(CASE WHEN p_ts IS NOT NULL
                          AND epoch_us(p_ts) - epoch_us(s.ts)
                              <= 86400000000
                         THEN epoch_us(p_ts) - epoch_us(s.ts)
                         ELSE 0 END) AS BIGINT) AS sum_gap_us
    FROM nxt JOIN s USING (event_id, user_id)
    GROUP BY user_id ORDER BY user_id
    """,
    doc="Conversion-within-window analytics: for every signup event, "
    "the NEXT purchase by the same user within 24h — a forward as-of "
    "join with a tolerance bound (operators.temporal.as_of_join "
    "tolerance_s, pandas merge_asof semantics). The tolerance is "
    "evaluated in exact microsecond integers after the window fill "
    "(no extra shuffle); per-user conversion counts and summed "
    "conversion gaps are exact int64 lanes. The oracle takes the "
    "min-over-candidates route; both must agree on every gap. The "
    "classic product-analytics attribution query at event-log scale: "
    "one shuffle on user_id, cost independent of the window length.",
)
def q_conversion_window(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "events")
    signups = e.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    joined = as_of_join(
        signups,
        purchases,
        ["user_id"],
        "ts",
        "p_ts",
        ["p_ts"],
        direction="forward",
        tolerance_s=86400.0,
    )
    gap = F.unix_micros(F.col("asof_p_ts")) - F.unix_micros(F.col("ts"))
    return (
        joined.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_signups"),
            F.sum(
                F.when(F.col("asof_p_ts").isNotNull(), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_converted"),
            F.sum(
                F.when(F.col("asof_p_ts").isNotNull(), gap).otherwise(0)
            )
            .cast("long")
            .alias("sum_gap_us"),
        )
        .orderBy("user_id")
    )


@register(
    "q_stream_join_attribution",
    oracle="""
    WITH i AS (
      SELECT event_id AS impression_id, user_id, ts AS imp_ts
      FROM events WHERE event_type = 'view'
    ),
    c AS (
      SELECT event_id AS click_id, user_id, ts AS click_ts
      FROM events WHERE event_type = 'click'
    )
    SELECT i.impression_id, i.user_id, i.imp_ts,
           c.click_id, c.click_ts,
           CAST(epoch_us(c.click_ts) - epoch_us(i.imp_ts) AS BIGINT)
             AS delay_us
    FROM i LEFT JOIN c
      ON i.user_id = c.user_id
     AND c.click_ts >= i.imp_ts
     AND c.click_ts <= i.imp_ts + INTERVAL 30 MINUTE
    ORDER BY i.impression_id, c.click_id
    """,
    doc="Click/impression attribution — the batch twin of the "
    "watermarked stream-stream left-outer join "
    "(streaming.attribution_join): every view pairs with each "
    "same-user click landing within 30 minutes after it; "
    "never-converted views emit one NULL-click row. The SAME operator "
    "call runs streaming (watermarks + time-banded state cleanup keep "
    "join state bounded by rate x horizon) and batch (this plan) — "
    "stream==batch across a checkpoint restart is pinned in "
    "tests/test_streaming.py. One equi-shuffle on user_id; the time "
    "band prunes pairs inside the join, never materializing the "
    "per-user cross product. Reference n/a (batch-only, "
    "transform.py:492-497).",
)
def q_stream_join_attribution(spark: SparkSession, sf: str) -> DataFrame:
    from incremental_github_data_pipeline_spark.streaming import attribution_join

    e = T(spark, sf, "events")
    impressions = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("impression_id"),
        "user_id",
        F.col("ts").alias("imp_ts"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    return attribution_join(
        impressions,
        clicks,
        on="user_id",
        imp_ts="imp_ts",
        click_ts="click_ts",
        horizon="30 minutes",
        how="left_outer",
    ).orderBy("impression_id", "click_id")


@register(
    "q_stream_session_attribution",
    oracle="""
    WITH i AS (
      SELECT event_id AS impression_id, user_id, ts AS imp_ts
      FROM events WHERE event_type = 'view'
    ),
    c AS (
      SELECT user_id, ts, event_id
      FROM events WHERE event_type = 'click'
    ),
    marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts >= LAG(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM c
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sid
      FROM marked
    ),
    agg AS (
      SELECT user_id,
             MIN(ts) AS session_start, MAX(ts) AS session_end,
             CAST(COUNT(*) AS BIGINT) AS n_session_events
      FROM sess GROUP BY user_id, sid
    )
    SELECT i.impression_id, i.user_id, i.imp_ts,
           s.session_start, s.session_end, s.n_session_events,
           CAST(epoch_us(s.session_start) - epoch_us(i.imp_ts) AS BIGINT)
             AS delay_us
    FROM i LEFT JOIN agg s
      ON i.user_id = s.user_id
     AND s.session_start >= i.imp_ts
     AND s.session_start <= i.imp_ts + INTERVAL 30 MINUTE
    ORDER BY i.impression_id, s.session_start
    """,
    doc="Session-window attribution — the batch twin of "
    "streaming.session_attribution (VERDICT r7 task 8): clicks "
    "collapse into 30-min-gap sessions per user (strict "
    "session_window boundary: an event exactly gap after its "
    "predecessor opens a NEW session), then every view pairs with "
    "each same-user session STARTING within 30 minutes after it — "
    "attribution by visit, not by raw click, so one session never "
    "counts as many conversions. The SAME operator call runs "
    "streaming as two chained stateful operators (watermarked "
    "session_window agg feeding the watermarked time-banded "
    "stream-stream join; both states bounded by rate x horizon) — "
    "stream==batch across a checkpoint restart is pinned in "
    "tests/test_streaming.py. Batch plan: one shuffle on user_id "
    "shared by the lag window and the session agg, then the "
    "equi-join's band prunes inside the join. Reference n/a "
    "(batch-only, transform.py:492-497).",
)
def q_stream_session_attribution(spark: SparkSession, sf: str) -> DataFrame:
    from incremental_github_data_pipeline_spark.streaming import (
        session_attribution,
    )

    e = T(spark, sf, "events")
    impressions = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("impression_id"),
        "user_id",
        F.col("ts").alias("imp_ts"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    return (
        session_attribution(
            impressions,
            clicks,
            on="user_id",
            imp_ts="imp_ts",
            ts_col="ts",
            gap="30 minutes",
            horizon="30 minutes",
            how="left_outer",
            tiebreak_col="event_id",
        )
        .orderBy("impression_id", "session_start")
    )
