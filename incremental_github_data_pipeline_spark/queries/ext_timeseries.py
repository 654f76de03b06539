"""[EXT] Time-series query surface over the ``events`` table
(`operators/timeseries.py`): fixed-grid gap-fill resampling, weighted
moving averages, time-weighted averages, exact z-score outliers.

No reference counterpart (`/root/reference` is batch ELT with no
time-series operators); this is the hypertable-rollup capability class
from SURVEY.md §2.10. Every query keeps its value lane in exact integer
cents (``ROUND(value*100)``) so aggregates hash-match DuckDB, and any
double output is a single IEEE operation over exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incremental_github_data_pipeline_spark.operators import timeseries as ts_ops
from incremental_github_data_pipeline_spark.queries import register
from incremental_github_data_pipeline_spark.sources.readers import read_table as T

# Hourly exact-cent rollup shared by the grid queries: one map-combined
# aggregate (5 types x ~720 hours out), the pre-aggregation step every
# resample/rollup runs before gridding.
_HOURLY_SQL = """
    WITH h AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    )
"""


def _hourly(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "events")
        .groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )


@register(
    "q_ts_resample_ffill",
    oracle=_HOURLY_SQL
    + """,
    b AS (SELECT event_type, MIN(hr) AS lo, MAX(hr) AS hi FROM h GROUP BY 1),
    g AS (SELECT event_type,
                 unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS grid_ts
          FROM b),
    j AS (SELECT g.event_type, g.grid_ts, h.cents
          FROM g LEFT JOIN h
            ON h.event_type = g.event_type AND h.hr = g.grid_ts)
    SELECT event_type, grid_ts,
           CAST(LAST_VALUE(cents IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY grid_ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS filled_cents,
           cents IS NULL AS is_gap
    FROM j ORDER BY event_type, grid_ts
    """,
    doc="Gap-fill resampling (the time-series store's LOCF operation): "
    "hourly exact-cent revenue per event type onto a dense hourly grid, "
    "missing hours forward-filled from the last observation and flagged "
    "is_gap. Physical shape (operators/timeseries.resample_ffill): "
    "per-key bounds aggregate -> sequence/explode grid (output-"
    "sensitive, generated AFTER the tiny bounds agg) -> one window "
    "shuffle on the series key. The oracle reproduces the grid with "
    "unnest(generate_series) + an IGNORE NULLS running last_value.",
)
def q_ts_resample_ffill(spark: SparkSession, sf: str) -> DataFrame:
    grid = ts_ops.resample_ffill(
        _hourly(spark, sf), "event_type", "hr", "cents"
    )
    return grid.select(
        "event_type",
        "grid_ts",
        F.col("value").cast("long").alias("filled_cents"),
        "is_gap",
    ).orderBy("event_type", "grid_ts")


@register(
    "q_ts_moving_avg",
    oracle=_HOURLY_SQL
    + """,
    w AS (
      SELECT event_type, hr, cents,
             CAST(4*cents + 3*LAG(cents, 1) OVER win
                  + 2*LAG(cents, 2) OVER win + LAG(cents, 3) OVER win
                  AS BIGINT) AS wma_num
      FROM h WINDOW win AS (PARTITION BY event_type ORDER BY hr)
    )
    SELECT event_type, hr, cents, wma_num,
           CAST(wma_num AS DOUBLE) / 10.0 AS wma
    FROM w ORDER BY event_type, hr
    """,
    doc="Linear-decay weighted moving average (weights 4,3,2,1 over the "
    "last 4 hourly buckets; NULL during warm-up — null lag propagates "
    "identically in both engines). The numerator stays an exact int64 "
    "cent lane; wma is one IEEE division of an exact integer by 10.0 — "
    "portable, unlike any float accumulation. One window shuffle on "
    "the series key (operators/timeseries.weighted_moving_avg).",
)
def q_ts_moving_avg(spark: SparkSession, sf: str) -> DataFrame:
    out = ts_ops.weighted_moving_avg(
        _hourly(spark, sf), "event_type", "hr", "cents", k=4
    )
    return out.select(
        "event_type", "hr", "cents", "wma_num", "wma"
    ).orderBy("event_type", "hr")


@register(
    "q_ts_time_weighted",
    oracle="""
    WITH c AS (
      SELECT event_type, event_id, ts,
             CAST(ROUND(value * 100) AS BIGINT) AS v
      FROM events
    ),
    s AS (
      SELECT event_type, v,
             epoch_us(LEAD(ts) OVER (PARTITION BY event_type
                                     ORDER BY ts, event_id))
               - epoch_us(ts) AS dt
      FROM c
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_obs,
           CAST(SUM(dt) AS BIGINT) AS sum_dt_us,
           CAST(SUM(v * dt) AS BIGINT) AS twap_num,
           CAST(CAST(SUM(v * dt) AS BIGINT) AS DOUBLE)
             / CAST(CAST(SUM(dt) AS BIGINT) AS DOUBLE) AS twap
    FROM s GROUP BY event_type ORDER BY event_type
    """,
    doc="Time-weighted average (TWAP): each observation's cent value "
    "held until the next observation, weighted by the interval length "
    "in microseconds (unix_micros/epoch_us — integer lanes, no "
    "fractional-second floats); the last observation per key carries "
    "no weight. Numerator and denominator are exact int64 sums; twap "
    "is the single closing IEEE division. LEAD is made deterministic "
    "by the (ts, event_id) compound order. One window shuffle + one "
    "map-combined aggregate (operators/timeseries.time_weighted_avg).",
)
def q_ts_time_weighted(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "events").select(
        "event_type",
        "event_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    return ts_ops.time_weighted_avg(
        c, "event_type", "ts", "v", "event_id"
    ).orderBy("event_type")


@register(
    "q_ts_zscore_outliers",
    oracle="""
    WITH c AS (
      SELECT event_type, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS v
      FROM events
    ),
    m AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v) AS BIGINT) AS s,
             CAST(SUM(v * v) AS DECIMAL(19,0)) AS ss
      FROM c GROUP BY 1
    ),
    o AS (
      SELECT c.event_type, c.event_id,
             CAST(m.n * c.v - m.s AS DECIMAL(19,0)) AS dev,
             CAST(m.n AS DECIMAL(19,0)) * CAST(4 * m.ss AS DECIMAL(19,0))
               - CAST(2 * m.s AS DECIMAL(19,0))
                 * CAST(2 * m.s AS DECIMAL(19,0)) AS rhs
      FROM c JOIN m USING (event_type)
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN dev * dev > rhs THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers,
           CAST(MIN(event_id) FILTER (WHERE dev * dev > rhs) AS BIGINT)
             AS min_outlier_id,
           CAST(MAX(event_id) FILTER (WHERE dev * dev > rhs) AS BIGINT)
             AS max_outlier_id
    FROM o GROUP BY 1 ORDER BY 1
    """,
    doc="Anomaly detection: rows more than 2 population standard "
    "deviations from their group mean — certified WITHOUT any float "
    "step by rearranging |v-mean| > z*stddev into the exact integer "
    "comparison (n*v - s)^2 > z^2*(n*ss - s^2), evaluated in DECIMAL "
    "(the squares exceed int64). The oracle folds z=2 into the lanes "
    "as n*(4ss) - (2s)^2 to respect DuckDB's strict decimal-width "
    "rules. min/max outlier ids pin MEMBERSHIP, not just counts. "
    "Physical shape (operators/timeseries.zscore_outliers): one "
    "map-combined moments aggregate (3 numbers/group) broadcast back "
    "onto the scan — the fact table shuffles zero times.",
)
def q_ts_zscore_outliers(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "events").select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    flagged = ts_ops.zscore_outliers(c, "event_type", "v", z_num=2, z_den=1)
    out = F.col("is_outlier")
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(out.cast("long")).alias("n_outliers"),
            F.min(F.when(out, F.col("event_id"))).alias("min_outlier_id"),
            F.max(F.when(out, F.col("event_id"))).alias("max_outlier_id"),
        )
        .orderBy("event_type")
    )


@register(
    "q_ts_winsorize",
    oracle="""
    WITH h AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT event_type, hr, cents,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY cents) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM h
    ),
    lo AS (
      SELECT event_type, cents AS lo_fence FROM ranked
      WHERE rn = GREATEST(1, (50000 * n + 999999) // 1000000)
    ),
    hi AS (
      SELECT event_type, cents AS hi_fence FROM ranked
      WHERE rn = GREATEST(1, (950000 * n + 999999) // 1000000)
    )
    SELECT r.event_type, r.hr, CAST(r.cents AS BIGINT) AS cents,
           CAST(lo.lo_fence AS BIGINT) AS lo_fence,
           CAST(hi.hi_fence AS BIGINT) AS hi_fence,
           CAST(LEAST(GREATEST(r.cents, lo.lo_fence), hi.hi_fence)
                AS BIGINT) AS winsorized,
           LEAST(GREATEST(r.cents, lo.lo_fence), hi.hi_fence)
             <> r.cents AS clipped
    FROM ranked r JOIN lo USING (event_type) JOIN hi USING (event_type)
    ORDER BY r.event_type, r.hr
    """,
    doc="Per-key winsorization (r10, operators.timeseries.winsorize): "
    "hourly cents clamp to the key's 5th/95th percentile FENCES, both "
    "quantiles SELECTIONS (row_number = ceil(q*n), an actual data "
    "value — the mad_outliers lower-median discipline), so the "
    "transform is integer-exact and the oracle replays rank, fences, "
    "clamp and the clipped flag verbatim. The heavy-tail-taming "
    "cleaning step that keeps rows instead of dropping them; one "
    "key-window shuffle + broadcast fence joins.",
)
def q_ts_winsorize(spark: SparkSession, sf: str) -> DataFrame:
    out = ts_ops.winsorize(
        _hourly(spark, sf), "event_type", "cents",
        lo_ppm=50_000, hi_ppm=950_000,
    )
    return out.select(
        "event_type", "hr", "cents", "lo_fence", "hi_fence",
        "winsorized", "clipped",
    ).orderBy("event_type", "hr")


_B10 = 10**10  # the operators' _FDIV_OFFSET, restated for the oracle
# lvl' expression appears twice in the recursive step (tr' needs it and
# SQL cannot reference a same-SELECT alias) — build it once here
_HW_LVL = f"(((3 * x.cents * 100 + 7 * (r.lvl + r.tr)) + 10 * {_B10}) // 10 - {_B10})"


@register(
    "q_ts_holt_linear",
    oracle=f"""
    WITH RECURSIVE h AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ),
    x AS (
      SELECT event_type, hr, cents,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                     ORDER BY hr) AS BIGINT) AS i
      FROM h
    ),
    r AS (
      SELECT event_type, hr, i, cents,
             cents * 100 AS lvl, CAST(0 AS BIGINT) AS tr,
             CAST(NULL AS BIGINT) AS fitted
      FROM x WHERE i = 1
      UNION ALL
      SELECT x.event_type, x.hr, x.i, x.cents,
             {_HW_LVL},
             ((2 * ({_HW_LVL} - r.lvl) + 8 * r.tr) + 10 * {_B10})
               // 10 - {_B10},
             r.lvl + r.tr
      FROM x JOIN r ON x.event_type = r.event_type AND x.i = r.i + 1
    )
    SELECT event_type, hr, CAST(cents AS BIGINT) AS cents,
           CAST(lvl AS BIGINT) AS level_s,
           CAST(tr AS BIGINT) AS trend_s,
           CAST(fitted AS BIGINT) AS fitted_s
    FROM r ORDER BY event_type, hr
    """,
    doc="Holt linear-trend double exponential smoothing (r10, "
    "operators.timeseries.holt_linear): lvl0 = 100·x0, tr0 = 0, then "
    "fit = lvl + tr, lvl' = fdiv(3·100·x + 7·fit, 10), tr' = "
    "fdiv(2·(lvl'−lvl) + 8·tr, 10) — alpha 0.3 / beta 0.2 smoothing "
    "with every step an offset floor division, so levels, trends AND "
    "one-step-ahead fits are bit-identical in any engine replaying "
    "the recurrence (the oracle is a recursive CTE; the offset makes "
    "NEGATIVE trends engine-safe, which plain EWMA's non-negative "
    "contract cannot). The short-horizon forecasting primitive: an "
    "h-step forecast from the last row is lvl + h·tr. Sequential in "
    "time, parallel across keys — one key shuffle + Arrow fold over "
    "the hourly pre-aggregate.",
)
def q_ts_holt_linear(spark: SparkSession, sf: str) -> DataFrame:
    out = ts_ops.holt_linear(
        _hourly(spark, sf), "event_type", "hr", "cents",
        alpha=(3, 10), beta=(2, 10), scale=100,
    )
    return out.select(
        "event_type", "hr", "cents", "level_s", "trend_s", "fitted_s"
    ).orderBy("event_type", "hr")


@register(
    "q_ts_ewma",
    oracle="""
    WITH RECURSIVE h AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ),
    x AS (
      SELECT event_type, hr, cents,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                     ORDER BY hr) AS BIGINT) AS i
      FROM h
    ),
    r AS (
      SELECT event_type, hr, i, cents, cents AS ewma FROM x WHERE i = 1
      UNION ALL
      SELECT x.event_type, x.hr, x.i, x.cents,
             (3 * x.cents + 7 * r.ewma) // 10
      FROM x JOIN r ON x.event_type = r.event_type AND x.i = r.i + 1
    )
    SELECT event_type, hr, CAST(cents AS BIGINT) AS cents,
           CAST(ewma AS BIGINT) AS ewma
    FROM r ORDER BY event_type, hr
    """,
    doc="Integer EWMA (operators.timeseries.ewma_integer): r0 = x0, "
    "r' = (3x + 7r) div 10 — alpha = 0.3 smoothing with every step "
    "integral, so the smoothed series is bit-identical in any engine "
    "replaying the recurrence (the certifiable-iteration trick of "
    "integer PageRank / the ADPCM decoder; the oracle replays it as a "
    "recursive CTE). Sequential in time, parallel across keys: one "
    "key shuffle + an Arrow-batched per-key fold over the hourly "
    "pre-aggregate.",
)
def q_ts_ewma(spark: SparkSession, sf: str) -> DataFrame:
    out = ts_ops.ewma_integer(
        _hourly(spark, sf), "event_type", "hr", "cents", num=3, den=10
    )
    return out.select("event_type", "hr", "cents", "ewma").orderBy(
        "event_type", "hr"
    )


@register(
    "q_ts_anomaly_mad",
    oracle="""
    WITH h AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT event_type, cents,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cents)
               AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM h
    ),
    med AS (
      SELECT event_type, cents AS med, CAST(n AS BIGINT) AS n
      FROM m WHERE rn = (n + 1) // 2
    ),
    d AS (
      SELECT h.event_type, ABS(h.cents - med.med) AS dev, med.med, med.n
      FROM h JOIN med ON h.event_type = med.event_type
    ),
    dm AS (
      SELECT event_type, dev,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dev)
               AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS cnt
      FROM d
    ),
    mad AS (
      SELECT event_type, dev AS mad FROM dm WHERE rn = (cnt + 1) // 2
    )
    SELECT d.event_type, d.n,
           CAST(d.med AS BIGINT) AS med,
           CAST(mad.mad AS BIGINT) AS mad,
           CAST(SUM(CASE WHEN d.dev > 5 * mad.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM d JOIN mad ON d.event_type = mad.event_type
    GROUP BY d.event_type, d.n, d.med, mad.mad
    ORDER BY d.event_type
    """,
    doc="Median-absolute-deviation outliers (operators.timeseries."
    "mad_outliers): med and MAD are LOWER medians — selections at "
    "row_number (n+1) div 2, actual data values, integer-exact and "
    "engine-portable where interpolated medians are not; outlier ⇔ "
    "|x−med| > 5·MAD. Robust to the asymmetric spikes that wreck "
    "mean/stddev z-scores (q_ts_zscore_outliers is the parametric "
    "twin). Two key-window shuffles + broadcast stat joins.",
)
def q_ts_anomaly_mad(spark: SparkSession, sf: str) -> DataFrame:
    out = ts_ops.mad_outliers(_hourly(spark, sf), "event_type", "cents", k=5)
    return out.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        "med",
        "mad",
        "n_outliers",
    ).orderBy("event_type")


@register(
    "q_ts_cusum",
    oracle="""
    WITH h AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT event_type, cents,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cents)
               AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM h
    ),
    med AS (
      SELECT event_type, cents AS med FROM m WHERE rn = (n + 1) // 2
    ),
    c AS (
      SELECT h.event_type, h.hr, h.cents, med.med,
             SUM(h.cents - med.med - med.med // 20) OVER w AS c_pos,
             SUM(med.med - med.med // 20 - h.cents) OVER w AS c_neg
      FROM h JOIN med ON h.event_type = med.event_type
      WINDOW w AS (PARTITION BY h.event_type ORDER BY h.hr
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    s AS (
      SELECT event_type, hr, cents, med,
             c_pos - LEAST(0, MIN(c_pos) OVER w) AS s_pos,
             c_neg - LEAST(0, MIN(c_neg) OVER w) AS s_neg
      FROM c
      WINDOW w AS (PARTITION BY event_type ORDER BY hr
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, hr, CAST(cents AS BIGINT) AS cents,
           CAST(med AS BIGINT) AS med,
           CAST(s_pos AS BIGINT) AS s_pos,
           CAST(s_neg AS BIGINT) AS s_neg,
           s_pos > med AS alarm_pos,
           s_neg > med AS alarm_neg
    FROM s ORDER BY event_type, hr
    """,
    doc="CUSUM change-point detection (operators.timeseries."
    "cusum_alarms): Page's S = max(0, S' + drift) recurrence via the "
    "exact prefix identity S_t = C_t - min(0, min_{j<=t} C_j), so the "
    "sequential-looking detector is two window passes — running sum, "
    "then running min — planned by Catalyst as ONE key shuffle, no "
    "stateful fold. Per-key reference level = the cents median "
    "(low-median (n+1)//2, the q_ts_anomaly_mad convention), slack = "
    "med//20, alarm threshold = med — all integer, so the statistic "
    "and both alarm flags are bit-identical across engines. No-reset "
    "monitoring variant (alarms persist while the shift persists), "
    "stated honestly in the operator docstring.",
)
def q_ts_cusum(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    h = _hourly(spark, sf)
    w = Window.partitionBy("event_type").orderBy("cents")
    med = (
        h.select(
            "event_type",
            "cents",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1))
            .over(Window.partitionBy("event_type"))
            .alias("n"),
        )
        .filter(F.col("rn") == F.floor((F.col("n") + 1) / 2))
        .select("event_type", F.col("cents").alias("med"))
    )
    staged = h.join(med, "event_type").select(
        "event_type",
        "hr",
        "cents",
        "med",
        (F.col("med") / 20).cast("long").alias("slk"),
    )
    out = ts_ops.cusum_alarms(
        staged,
        "event_type",
        "hr",
        "cents",
        "med",
        slack="slk",
        threshold="med",
    )
    return out.select(
        "event_type", "hr", "cents", "med",
        "s_pos", "s_neg", "alarm_pos", "alarm_neg",
    ).orderBy("event_type", "hr")


_B = 10**10  # _FDIV_OFFSET twin — keep the SQL text in lockstep


@register(
    "q_ts_seasonal",
    oracle=f"""
    WITH h AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ),
    base AS (
      SELECT event_type, hr, cents, cents * 10000 AS vs,
             (ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hr) - 1)
               % 24 AS phase,
             SUM(cents * 10000) OVER (
               PARTITION BY event_type ORDER BY hr
               ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS tsum,
             COUNT(*) OVER (
               PARTITION BY event_type ORDER BY hr
               ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS tcnt
      FROM h
    ),
    trended AS (
      SELECT *, ((tsum + tcnt * {_B}) // tcnt) - {_B} AS trend_s
      FROM base
    ),
    seas AS (
      SELECT event_type, phase,
             ((SUM(vs - trend_s) + COUNT(*) * {_B}) // COUNT(*)) - {_B}
               AS seasonal_s
      FROM trended GROUP BY 1, 2
    )
    SELECT t.event_type, t.hr, CAST(t.cents AS BIGINT) AS val,
           CAST(t.phase AS BIGINT) AS phase,
           CAST(t.trend_s AS BIGINT) AS trend_s,
           CAST(s.seasonal_s AS BIGINT) AS seasonal_s,
           CAST(t.vs - t.trend_s - s.seasonal_s AS BIGINT) AS resid_s
    FROM trended t JOIN seas s USING (event_type, phase)
    ORDER BY t.event_type, t.hr
    """,
    doc="Additive seasonal decomposition (operators/timeseries."
    "seasonal_decompose): value = trend + seasonal + residual over the "
    "hourly grid with a daily (period-24) cycle — centered 25-row "
    "moving-average trend, per-(key, phase) detrended means, all in "
    "scaled-integer arithmetic with offset floor divisions, so the "
    "whole decomposition hash-matches DuckDB replaying the identical "
    "window algebra. One key-window shuffle + one broadcast-joined "
    "(key x 24)-row seasonal aggregate.",
)
def q_ts_seasonal(spark: SparkSession, sf: str) -> DataFrame:
    out = ts_ops.seasonal_decompose(
        _hourly(spark, sf), "event_type", "hr", "cents", period=24
    )
    return out.select(
        "event_type",
        "hr",
        "val",
        F.col("phase").cast("long").alias("phase"),
        "trend_s",
        "seasonal_s",
        "resid_s",
    ).orderBy("event_type", "hr")


_HWF_LVL = (
    f"(((3 * d.y + 7 * (r.lvl + r.tr)) + 10 * {_B}) // 10 - {_B})"
)


@register(
    "q_ts_forecast_seasonal",
    oracle=f"""
    WITH RECURSIVE h AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ),
    base AS (
      SELECT event_type, hr, cents, cents * 10000 AS vs,
             (ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hr) - 1)
               % 24 AS phase,
             SUM(cents * 10000) OVER (
               PARTITION BY event_type ORDER BY hr
               ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS tsum,
             COUNT(*) OVER (
               PARTITION BY event_type ORDER BY hr
               ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS tcnt
      FROM h
    ),
    trended AS (
      SELECT *, ((tsum + tcnt * {_B}) // tcnt) - {_B} AS trend_s
      FROM base
    ),
    seas AS (
      SELECT event_type, phase,
             ((SUM(vs - trend_s) + COUNT(*) * {_B}) // COUNT(*)) - {_B}
               AS seasonal_s
      FROM trended GROUP BY 1, 2
    ),
    dec AS (
      SELECT t.event_type, t.hr, t.phase,
             ROW_NUMBER() OVER (
               PARTITION BY t.event_type ORDER BY t.hr) AS i,
             t.vs - s.seasonal_s AS y
      FROM trended t JOIN seas s USING (event_type, phase)
    ),
    r AS (
      SELECT event_type, hr, i, y AS lvl, CAST(0 AS BIGINT) AS tr
      FROM dec WHERE i = 1
      UNION ALL
      SELECT d.event_type, d.hr, d.i,
             {_HWF_LVL},
             ((2 * ({_HWF_LVL} - r.lvl) + 8 * r.tr) + 10 * {_B})
               // 10 - {_B}
      FROM dec d JOIN r ON d.event_type = r.event_type AND d.i = r.i + 1
    ),
    last AS (
      SELECT r.event_type, r.lvl, r.tr, d.phase
      FROM r JOIN dec d
        ON d.event_type = r.event_type AND d.i = r.i
      WHERE r.i = (SELECT MAX(i) FROM dec dd
                   WHERE dd.event_type = r.event_type)
    )
    SELECT l.event_type, hz.h,
           CAST(l.lvl + hz.h * l.tr + s2.seasonal_s AS BIGINT)
             AS forecast_s
    FROM last l
    CROSS JOIN (SELECT CAST(range + 1 AS BIGINT) AS h FROM range(3)) hz
    JOIN seas s2 ON s2.event_type = l.event_type
                AND s2.phase = (l.phase + hz.h) % 24
    ORDER BY l.event_type, hz.h
    """,
    doc="Seasonal short-horizon FORECAST (r10) — the composition the "
    "module's pieces exist for: seasonal_decompose strips the daily "
    "cycle, holt_linear (scale=1) smooths the deseasonalized "
    "level+trend, and the h-step forecast re-adds the seasonal "
    "component of the FUTURE phase: forecast_h = lvl + h·tr + "
    "seasonal((last_phase + h) mod 24), h = 1..3. Every lane is the "
    "offset-floor-div integer arithmetic of its parts, so the oracle "
    "replays decomposition, recursion and re-seasonalization "
    "end-to-end (negative deseasonalized values and trends are safe "
    "by the offset). Physical shape: the decomposition's one "
    "key-window shuffle (checkpointed once — the "
    "q_ts_seasonal_anomaly discipline), the Holt Arrow fold, then "
    "key-count-sized frames only.",
)
def q_ts_forecast_seasonal(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    dec = (
        ts_ops.seasonal_decompose(
            _hourly(spark, sf), "event_type", "hr", "cents", period=24
        )
        .select(
            "event_type", "hr", "phase",
            (F.col("trend_s") + F.col("resid_s")).alias("y"),
            "seasonal_s",
        )
        .localCheckpoint(eager=True)
    )
    hw = ts_ops.holt_linear(
        dec.select("event_type", "hr", "y"),
        "event_type", "hr", "y",
        alpha=(3, 10), beta=(2, 10), scale=1,
    )
    wd = Window.partitionBy("event_type").orderBy(F.desc("hr"))
    last_hw = (
        hw.withColumn("_rn", F.row_number().over(wd))
        .filter(F.col("_rn") == 1)
        .select("event_type", "level_s", "trend_s")
    )
    last_phase = (
        dec.withColumn("_rn", F.row_number().over(wd))
        .filter(F.col("_rn") == 1)
        .select("event_type", F.col("phase").alias("last_phase"))
    )
    seas = dec.groupBy("event_type", "phase").agg(
        F.max("seasonal_s").alias("seasonal_s")
    )
    # r16: 3 rows need 1 partition, not defaultParallelism near-empty
    # ones (every consumer stage schedules a task per partition)
    horizons = spark.range(1, 4, 1, 1).select(F.col("id").alias("h"))
    fut = (
        last_hw.join(last_phase, "event_type")
        .crossJoin(F.broadcast(horizons))
        .withColumn("phase", (F.col("last_phase") + F.col("h")) % 24)
    )
    return (
        fut.join(F.broadcast(seas), ["event_type", "phase"])
        .select(
            "event_type",
            "h",
            (
                F.col("level_s")
                + F.col("h") * F.col("trend_s")
                + F.col("seasonal_s")
            ).alias("forecast_s"),
        )
        .orderBy("event_type", "h")
    )


@register(
    "q_ts_theil_sen",
    oracle=f"""
    WITH h AS (
      SELECT event_type,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS x,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.event_type, a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2,
             (((b.y - a.y) * 10000 + (b.x - a.x) * {_B}) // (b.x - a.x))
               - {_B} AS slope_s
      FROM h a JOIN h b
        ON a.event_type = b.event_type AND a.x < b.x
    ),
    ranked AS (
      SELECT event_type, slope_s,
             ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY slope_s, x1, x2) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS np
      FROM pairs
    ),
    n AS (SELECT event_type, COUNT(*) AS n_points FROM h GROUP BY 1)
    SELECT r.event_type, CAST(n.n_points AS BIGINT) AS n_points,
           CAST(r.np AS BIGINT) AS n_pairs,
           CAST(r.slope_s AS BIGINT) AS slope_s
    FROM ranked r JOIN n USING (event_type)
    WHERE r.rn = (r.np + 1) // 2
    ORDER BY r.event_type
    """,
    doc="Theil-Sen robust trend (operators/timeseries.theil_sen_slope): "
    "lower-median of all pairwise slopes per key over the hourly grid "
    "(x = epoch hours, y = cents), slopes as offset scaled-integer "
    "floor divisions with a deterministic (slope, x1, x2) median pick "
    "— bit-identical across engines, 29% breakdown point vs one "
    "outlier dragging least squares. Pairs are O(grid^2) per key BY "
    "DESIGN — the operator contract is pre-aggregated series, so pair "
    "count is bounded by the grid parameter, not data volume; one "
    "key-shuffled self-join.",
)
def q_ts_theil_sen(spark: SparkSession, sf: str) -> DataFrame:
    h = _hourly(spark, sf).select(
        "event_type",
        (F.unix_timestamp("hr") / 3600).cast("long").alias("x"),
        F.col("cents").alias("y"),
    )
    return (
        ts_ops.theil_sen_slope(h, "event_type", "x", "y")
        .select(
            "event_type",
            "n_points",
            F.col("n_pairs").cast("long").alias("n_pairs"),
            "slope_s",
        )
        .orderBy("event_type")
    )


@register(
    "q_ts_seasonal_anomaly",
    oracle=f"""
    WITH h AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ),
    base AS (
      SELECT event_type, hr, cents, cents * 10000 AS vs,
             (ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hr) - 1)
               % 24 AS phase,
             SUM(cents * 10000) OVER (
               PARTITION BY event_type ORDER BY hr
               ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS tsum,
             COUNT(*) OVER (
               PARTITION BY event_type ORDER BY hr
               ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS tcnt
      FROM h
    ),
    trended AS (
      SELECT *, ((tsum + tcnt * {_B}) // tcnt) - {_B} AS trend_s
      FROM base
    ),
    seas AS (
      SELECT event_type, phase,
             ((SUM(vs - trend_s) + COUNT(*) * {_B}) // COUNT(*)) - {_B}
               AS seasonal_s
      FROM trended GROUP BY 1, 2
    ),
    resid AS (
      SELECT t.event_type, t.hr,
             t.vs - t.trend_s - s.seasonal_s AS r
      FROM trended t JOIN seas s USING (event_type, phase)
    ),
    med AS (
      SELECT event_type, r AS med FROM (
        SELECT event_type, r,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY r) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM resid) WHERE rn = (n + 1) // 2
    ),
    mad AS (
      SELECT d.event_type, d.dev AS mad FROM (
        SELECT r.event_type, ABS(r.r - m.med) AS dev,
               ROW_NUMBER() OVER (PARTITION BY r.event_type
                                  ORDER BY ABS(r.r - m.med)) AS rn,
               COUNT(*) OVER (PARTITION BY r.event_type) AS n
        FROM resid r JOIN med m USING (event_type)) d
      WHERE d.rn = (d.n + 1) // 2
    )
    SELECT r.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(m.med) AS BIGINT) AS med_resid_s,
           CAST(MIN(a.mad) AS BIGINT) AS mad_resid_s,
           CAST(SUM(CASE WHEN ABS(r.r - m.med) > 6 * a.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
    FROM resid r JOIN med m USING (event_type) JOIN mad a USING (event_type)
    GROUP BY r.event_type ORDER BY r.event_type
    """,
    doc="Seasonality-adjusted anomaly detection — the composition the "
    "decomposition exists for: seasonal_decompose residuals flagged "
    "by the robust MAD rule (|resid − median| > 6·MAD), so a spike at "
    "3am is judged against 3am's norm, not the daily average. Pure "
    "integer algebra end-to-end (scaled residuals, lower-median "
    "row_number picks), one more key-window pass over the "
    "decomposition's output — no new shuffle of the fact.",
)
def q_ts_seasonal_anomaly(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    # The decomposition (window + aggregate + broadcast join over the
    # events fact) feeds three lanes (median, deviations, MAD) —
    # materialize it ONCE, same discipline as mad_outliers
    # (operators/timeseries.py): without the checkpoint each lane
    # re-derives it from the raw scan (the first cut planned 8 fact
    # scans; at 100 TB that is 8 reads of the fact where 1 suffices).
    # The frame is the pre-aggregated hours × event_types grid —
    # bounded, safe to pin.
    dec = (
        ts_ops.seasonal_decompose(
            _hourly(spark, sf), "event_type", "hr", "cents", period=24
        )
        .select("event_type", "hr", F.col("resid_s").alias("r"))
        .localCheckpoint(eager=True)
    )
    wk = Window.partitionBy("event_type")
    med = (
        dec.withColumn(
            "_rn", F.row_number().over(wk.orderBy("r"))
        )
        .withColumn("_n", F.count(F.lit(1)).over(wk))
        .filter(F.col("_rn") == F.expr("(_n + 1) div 2"))
        .select("event_type", F.col("r").alias("med"))
    )
    # devs feeds two consumers (the MAD median lane and the final
    # aggregate) — pin it too so the broadcast join runs once.
    devs = (
        dec.join(F.broadcast(med), "event_type")
        .withColumn("_dev", F.abs(F.col("r") - F.col("med")))
        .localCheckpoint(eager=True)
    )
    mad = (
        devs.withColumn("_rn", F.row_number().over(wk.orderBy("_dev")))
        .withColumn("_n", F.count(F.lit(1)).over(wk))
        .filter(F.col("_rn") == F.expr("(_n + 1) div 2"))
        .select("event_type", F.col("_dev").alias("mad"))
    )
    return (
        devs.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("med").alias("med_resid_s"),
            F.min("mad").alias("mad_resid_s"),
            F.sum(
                (F.col("_dev") > 6 * F.col("mad")).cast("long")
            ).alias("n_anomalies"),
        )
        .orderBy("event_type")
    )


@register(
    "q_ts_acf",
    oracle=_HOURLY_SQL
    + """,
    st AS (
      SELECT event_type, COUNT(*) AS n, SUM(cents) AS s FROM h GROUP BY 1
    ),
    y AS (
      SELECT h.event_type, hr, (st.n * cents - st.s) AS y,
             ROW_NUMBER() OVER (
               PARTITION BY h.event_type ORDER BY hr) AS rn
      FROM h JOIN st USING (event_type)
    ),
    p AS (
      SELECT a.event_type, l.lag,
             COUNT(b.y) AS n_pairs,
             SUM(CAST(a.y AS HUGEINT) * b.y) AS ck
      FROM y a CROSS JOIN (SELECT unnest(range(1, 7)) AS lag) l
      LEFT JOIN y b
        ON b.event_type = a.event_type AND b.rn = a.rn + l.lag
      GROUP BY 1, 2
    ),
    c0 AS (
      SELECT event_type, SUM(CAST(y AS HUGEINT) * y) AS c0
      FROM y GROUP BY 1
    )
    SELECT p.event_type,
           CAST(p.lag AS BIGINT) AS lag,
           CAST(p.n_pairs AS BIGINT) AS n_pairs,
           CASE WHEN c0.c0 > 0 THEN CAST(
             (p.ck * 1000000 + c0.c0 * 10000000000) // c0.c0
             - 10000000000 AS BIGINT) END AS rho_ppm
    FROM p JOIN c0 USING (event_type)
    ORDER BY p.event_type, p.lag
    """,
    doc="Autocorrelation function (r11, operators/timeseries."
    "acf_integer): per event type, lags 1..6 over the hourly revenue "
    "series — the seasonality DETECTOR run before committing to a "
    "seasonal_decompose period. The biased estimator rho_k = c_k/c_0 "
    "kept integer-exact: y_t = n*x_t - S makes the centered products "
    "integers, DECIMAL(38,0) absorbs the squares, and one offset "
    "floor division lands rho as ppm (negative correlations floor "
    "identically in Spark div and DuckDB // thanks to the offset). "
    "NULL for a constant series (c_0 = 0: undefined, not zero). One "
    "stats aggregate + one ordered window carrying 6 leads + one "
    "aggregate per key — no self-join of the fact, no explode.",
)
def q_ts_acf(spark: SparkSession, sf: str) -> DataFrame:
    from incremental_github_data_pipeline_spark.operators.timeseries import (
        acf_integer,
    )

    return acf_integer(
        _hourly(spark, sf), "event_type", "hr", "cents", max_lag=6
    ).orderBy("event_type", "lag")


# Holt–Winters recursive-step expressions: lvl' feeds tr' and seas' in
# the same SELECT, so it is inlined (SQL cannot reference a same-SELECT
# alias) — built once here like _HW_LVL above
_HWS_YS = "(x.cents * 100)"
_HWS_LVL = (
    f"(((3 * ({_HWS_YS} - r.seas[1]) + 7 * (r.lvl + r.tr))"
    f" + 10 * {_B10}) // 10 - {_B10})"
)
_HWS_TR = (
    f"(((2 * ({_HWS_LVL} - r.lvl) + 8 * r.tr) + 10 * {_B10})"
    f" // 10 - {_B10})"
)
_HWS_SEAS = (
    f"(((3 * ({_HWS_YS} - {_HWS_LVL}) + 7 * r.seas[1])"
    f" + 10 * {_B10}) // 10 - {_B10})"
)


@register(
    "q_ts_holt_winters",
    oracle=f"""
    WITH RECURSIVE h AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ),
    x AS (
      SELECT event_type, hr, cents,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                     ORDER BY hr) AS BIGINT) AS i
      FROM h
    ),
    lvl0 AS (
      -- COUNT(*) here is LEAST(24, per-key rows): holt_winters inits
      -- with init_n = min(period, n), so a short key must divide by
      -- its actual row count, not a hardcoded 24 (keys shorter than
      -- the period also never enter the recursion: the seed at i=24
      -- finds no i=25 row, leaving only init-branch output — matching
      -- the operator's init-only treatment)
      SELECT event_type,
             CAST((SUM(cents * 100) + COUNT(*) * {_B10}) // COUNT(*)
                  - {_B10} AS BIGINT) AS lvl
      FROM x WHERE i <= 24 GROUP BY 1
    ),
    seas0 AS (
      SELECT x.event_type,
             list(CAST(x.cents * 100 - l.lvl AS BIGINT)
                  ORDER BY x.i) AS seas
      FROM x JOIN lvl0 l USING (event_type)
      WHERE x.i <= 24 GROUP BY 1
    ),
    r AS (
      SELECT l.event_type, CAST(NULL AS TIMESTAMP) AS hr,
             CAST(0 AS BIGINT) AS cents, CAST(24 AS BIGINT) AS i,
             l.lvl AS lvl, CAST(0 AS BIGINT) AS tr, s.seas AS seas,
             CAST(NULL AS BIGINT) AS seas_set,
             CAST(NULL AS BIGINT) AS fitted
      FROM lvl0 l JOIN seas0 s USING (event_type)
      UNION ALL
      SELECT x.event_type, x.hr, x.cents, x.i,
             CAST({_HWS_LVL} AS BIGINT),
             CAST({_HWS_TR} AS BIGINT),
             r.seas[2:] || [CAST({_HWS_SEAS} AS BIGINT)],
             CAST({_HWS_SEAS} AS BIGINT),
             CAST(r.lvl + r.tr + r.seas[1] AS BIGINT)
      FROM x JOIN r ON x.event_type = r.event_type AND x.i = r.i + 1
    )
    SELECT event_type, hr, cents,
           lvl AS level_s, tr AS trend_s,
           seas_set AS seas_s, fitted AS fitted_s
    FROM r WHERE i > 24
    UNION ALL
    SELECT x.event_type, x.hr, x.cents,
           l.lvl, CAST(0 AS BIGINT),
           CAST(x.cents * 100 - l.lvl AS BIGINT),
           CAST(NULL AS BIGINT)
    FROM x JOIN lvl0 l USING (event_type) WHERE x.i <= 24
    ORDER BY event_type, hr
    """,
    doc="Holt–Winters additive triple exponential smoothing (r11, "
    "operators.timeseries.holt_winters) — the forecasting ladder's "
    "top rung, period 24 over the hourly grid: first-cycle init "
    "(lvl = fdiv(Σ, 24), seas = deviations, fitted NULL), then the "
    "textbook level/trend/seasonal mutual recurrence with every lane "
    "an offset floor division. Unlike the frozen-seasonality "
    "decompose-then-Holt composite, HW re-learns the daily profile "
    "every cycle. The oracle carries the 24-slot seasonal STATE as a "
    "list column in a recursive CTE (seas[2:] || [new] per step) — "
    "level, trend, the seasonal update AND the one-step fit all "
    "hash-compare bit-for-bit. One key shuffle + Arrow fold.",
)
def q_ts_holt_winters(spark: SparkSession, sf: str) -> DataFrame:
    out = ts_ops.holt_winters(
        _hourly(spark, sf), "event_type", "hr", "cents",
        period=24, alpha=(3, 10), beta=(2, 10), gamma=(3, 10),
        scale=100,
    )
    return out.select(
        "event_type", "hr", "cents",
        "level_s", "trend_s", "seas_s", "fitted_s",
    ).orderBy("event_type", "hr")


def _ccf_oracle(max_lag: int = 3) -> str:
    leads = ",\n             ".join(
        f"lead(v, {k}) OVER w AS v{k}, lead(u, {k}) OVER w AS u{k}"
        for k in range(1, max_lag + 1)
    )
    aggs = ",\n             ".join(
        f"SUM(u * v{k}) AS cp{k}, SUM(u{k} * v) AS cm{k}, "
        f"COUNT(v{k}) AS np{k}"
        for k in range(1, max_lag + 1)
    )

    def fdiv(c: str, den: str) -> str:
        return (
            f"CAST(CASE WHEN {den} > 0 THEN "
            f"({c} * 1000000 + {den} * {_B10}) // {den} - {_B10} "
            f"END AS BIGINT)"
        )

    lanes = [
        f"SELECT pair, CAST(0 AS BIGINT) AS lag, np0 AS n_pairs, "
        f"{fdiv('c0', 'cxx')} AS beta_ppm, "
        f"{fdiv('c0', 'cyy')} AS gamma_ppm FROM ag"
    ]
    for k in range(1, max_lag + 1):
        lanes.append(
            f"SELECT pair, CAST({k} AS BIGINT), np{k}, "
            f"{fdiv(f'cp{k}', 'cxx')}, {fdiv(f'cp{k}', 'cyy')} FROM ag"
        )
        lanes.append(
            f"SELECT pair, CAST(-{k} AS BIGINT), np{k}, "
            f"{fdiv(f'cm{k}', 'cxx')}, {fdiv(f'cm{k}', 'cyy')} FROM ag"
        )
    union = "\nUNION ALL\n".join(lanes)
    return f"""
    WITH h AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY 1, 2
    ),
    p AS (
      SELECT 'click~view' AS pair, a.hr, a.cents AS x, b.cents AS y
      FROM h a JOIN h b ON a.hr = b.hr
      WHERE a.event_type = 'click' AND b.event_type = 'view'
      UNION ALL
      SELECT 'error~purchase', a.hr, a.cents, b.cents
      FROM h a JOIN h b ON a.hr = b.hr
      WHERE a.event_type = 'error' AND b.event_type = 'purchase'
    ),
    st AS (
      SELECT pair, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy
      FROM p GROUP BY 1
    ),
    uv AS (
      SELECT p.pair, p.hr,
             CAST(st.n * p.x - st.sx AS HUGEINT) AS u,
             CAST(st.n * p.y - st.sy AS HUGEINT) AS v
      FROM p JOIN st USING (pair)
    ),
    ld AS (
      SELECT pair, u, v,
             {leads}
      FROM uv WINDOW w AS (PARTITION BY pair ORDER BY hr)
    ),
    ag AS (
      SELECT pair, SUM(u*u) AS cxx, SUM(v*v) AS cyy, SUM(u*v) AS c0,
             COUNT(*) AS np0,
             {aggs}
      FROM ld GROUP BY 1
    )
    SELECT * FROM ({union})
    ORDER BY pair, lag
    """


@register(
    "q_ts_ccf",
    oracle=_ccf_oracle(),
    doc="Cross-correlation function (r11, operators.timeseries."
    "ccf_integer) — ACF's two-series sibling, the lead/lag discoverer "
    "between paired hourly metrics: per lag k in [-3, 3], the two "
    "lagged REGRESSION slopes beta = c_xy(k)·10^6 fdiv c_xx and gamma "
    "= c_xy(k)·10^6 fdiv c_yy — Pearson's r needs an irrational "
    "square root, but beta·gamma IS r² exactly, so squared "
    "correlation thresholds and argmax-|beta| lead/lag picks stay "
    "certifiable. Integer centering u = n·x − Sx through "
    "DECIMAL(38,0)/HUGEINT, offset floor divisions, negative lags "
    "via the mirrored lead products. One stats aggregate + one "
    "ordered window carrying both series' leads, no self-join.",
)
def q_ts_ccf(spark: SparkSession, sf: str) -> DataFrame:
    # the hourly pre-aggregate feeds four filter lanes (2 pairs x 2
    # sides) — materialize its time-grid-bounded rows once instead of
    # re-running the events scan per lane (the q_doc_contained lesson)
    h = _hourly(spark, sf).localCheckpoint(eager=True)

    def pair(name: str, ta: str, tb: str) -> DataFrame:
        a = h.filter(F.col("event_type") == ta).select(
            "hr", F.col("cents").alias("x")
        )
        b = h.filter(F.col("event_type") == tb).select(
            "hr", F.col("cents").alias("y")
        )
        return a.join(b, "hr").select(
            F.lit(name).alias("pair"), "hr", "x", "y"
        )

    series = pair("click~view", "click", "view").unionByName(
        pair("error~purchase", "error", "purchase")
    )
    return ts_ops.ccf_integer(
        series, "pair", "hr", "x", "y", max_lag=3
    ).orderBy("pair", "lag")


def _ols_oracle() -> str:
    cxy = "(n1 * sxy - sx * sy)"
    cxx = "(n1 * sxx - sx * sx)"
    cyy = "(n1 * syy - sy * sy)"
    beta = f"(({cxy} * 1000000 + {cxx} * {_B10}) // {cxx} - {_B10})"
    gamma = f"(({cxy} * 1000000 + {cyy} * {_B10}) // {cyy} - {_B10})"
    alpha = (
        f"(((sy * {cxx} - sx * {cxy}) * 1000000 + (n1 * {cxx}) * {_B10})"
        f" // (n1 * {cxx}) - {_B10})"
    )
    return f"""
    WITH h AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY 1, 2
    ),
    p AS (
      SELECT 'click~view' AS pair, a.cents AS x, b.cents AS y
      FROM h a JOIN h b ON a.hr = b.hr
      WHERE a.event_type = 'click' AND b.event_type = 'view'
      UNION ALL
      SELECT 'error~purchase', a.cents, b.cents
      FROM h a JOIN h b ON a.hr = b.hr
      WHERE a.event_type = 'error' AND b.event_type = 'purchase'
    ),
    ag AS (
      SELECT pair, CAST(COUNT(*) AS HUGEINT) AS n1,
             CAST(SUM(x) AS HUGEINT) AS sx,
             CAST(SUM(y) AS HUGEINT) AS sy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(y AS HUGEINT) * y) AS syy,
             SUM(CAST(x AS HUGEINT) * y) AS sxy
      FROM p GROUP BY 1
    )
    SELECT pair, CAST(n1 AS BIGINT) AS n,
           CAST(CASE WHEN {cxx} > 0 THEN {beta} END AS BIGINT)
             AS beta_ppm,
           CAST(CASE WHEN {cxx} > 0 THEN {alpha} END AS BIGINT)
             AS alpha_ppm,
           CAST(CASE WHEN {cxx} > 0 AND {cyy} > 0 THEN
                (({beta}) * ({gamma}) + 1000000 * {_B10})
                  // 1000000 - {_B10} END AS BIGINT) AS r2_ppm
    FROM ag ORDER BY pair
    """


@register(
    "q_ts_ols",
    oracle=_ols_oracle(),
    doc="Per-key OLS linear regression (r11, operators.timeseries."
    "ols_integer): slope, intercept and R² between paired hourly "
    "metrics with every output ONE offset floor division — the "
    "textbook formulas cleared of early divisions via integer "
    "centered cross terms (n·Σxy − Σx·Σy) in DECIMAL(38,0)/HUGEINT; "
    "R² = beta·gamma needs no irrational sqrt (Pearson's r does, and "
    "stays out of certified lanes). One 6-sum map-combined aggregate "
    "per key, no window, no self-join.",
)
def q_ts_ols(spark: SparkSession, sf: str) -> DataFrame:
    # same four-lane consumption as q_ts_ccf: one materialization
    h = _hourly(spark, sf).localCheckpoint(eager=True)

    def pair(name: str, ta: str, tb: str) -> DataFrame:
        a = h.filter(F.col("event_type") == ta).select(
            "hr", F.col("cents").alias("x")
        )
        b = h.filter(F.col("event_type") == tb).select(
            "hr", F.col("cents").alias("y")
        )
        return a.join(b, "hr").select(
            F.lit(name).alias("pair"), "x", "y"
        )

    series = pair("click~view", "click", "view").unionByName(
        pair("error~purchase", "error", "purchase")
    )
    return ts_ops.ols_integer(series, "pair", "x", "y").orderBy("pair")
