"""[EXT] Data-quality drift queries (`operators/quality.py`): schema-
key presence tracking over a JSON payload — the upstream-broke-their-
export detector.

No reference counterpart (`/root/reference` validates fixed schemas
only). The payload is synthesized from the events table with
deterministic per-key presence rules (``to_json`` omits NULL struct
fields), so DuckDB can recompute every presence count in closed form
WITHOUT serializing JSON — the oracle replays the rules, the Spark
lane proves ``json_object_keys`` + explode + grid + lag machinery
extracts exactly what the rules injected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incremental_github_data_pipeline_spark.operators.quality import (
    schema_drift_report,
    volume_gate,
)
from incremental_github_data_pipeline_spark.queries import register
from incremental_github_data_pipeline_spark.queries.relational import T

_SHIFT_PPM = 100_000


@register(
    "q_schema_drift",
    oracle=f"""
    WITH e AS (
      SELECT CAST(ts AS DATE) AS win, event_id, event_type, user_id, value
      FROM events
    ),
    counts AS (
      SELECT win, COUNT(*) AS n_rows,
             SUM(CASE WHEN value IS NOT NULL THEN 1 ELSE 0 END) AS k_v,
             SUM(CASE WHEN event_type IN ('click', 'view')
                       AND user_id IS NOT NULL THEN 1 ELSE 0 END) AS k_uid,
             SUM(CASE WHEN event_id % 3 = 0
                       AND event_type IS NOT NULL THEN 1 ELSE 0 END) AS k_et,
             SUM(CASE WHEN win >= DATE '2024-01-15'
                       AND value IS NOT NULL THEN 1 ELSE 0 END) AS k_v2,
             SUM(CASE WHEN win < DATE '2024-01-10'
                      THEN 1 ELSE 0 END) AS k_legacy
      FROM e GROUP BY 1
    ),
    long AS (
      SELECT win, n_rows, 'v' AS key, k_v AS n_present FROM counts
      UNION ALL SELECT win, n_rows, 'uid', k_uid FROM counts
      UNION ALL SELECT win, n_rows, 'et', k_et FROM counts
      UNION ALL SELECT win, n_rows, 'v2', k_v2 FROM counts
      UNION ALL SELECT win, n_rows, 'legacy', k_legacy FROM counts
    ),
    ppm AS (
      SELECT win, key, n_rows, n_present,
             n_present * 1000000 // n_rows AS present_ppm
      FROM long
    ),
    lagd AS (
      SELECT *, LAG(present_ppm) OVER (
        PARTITION BY key ORDER BY win) AS prev_ppm
      FROM ppm
    )
    SELECT win, key,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_present AS BIGINT) AS n_present,
           CAST(present_ppm AS BIGINT) AS present_ppm,
           CAST(prev_ppm AS BIGINT) AS prev_ppm,
           CASE WHEN prev_ppm IS NULL THEN 'baseline'
                WHEN prev_ppm = 0 AND present_ppm > 0 THEN 'new'
                WHEN prev_ppm > 0 AND present_ppm = 0 THEN 'dropped'
                WHEN ABS(present_ppm - prev_ppm) > {_SHIFT_PPM}
                  THEN 'shifted'
                ELSE 'stable' END AS status
    FROM lagd ORDER BY win, key
    """,
    doc="Schema-drift audit (r10, operators/quality."
    "schema_drift_report): per (day, key) presence over a JSON "
    "payload whose keys appear by deterministic rules — uid only on "
    "click/view rows, et on every third event, v2 BORN on Jan 15 "
    "(status 'new'), legacy DYING on Jan 10 (status 'dropped') — so "
    "the full machinery (json_object_keys, explode, the "
    "window x key-universe grid that keeps vanished keys visible, "
    "integer-ppm ratios, per-key lag, the five-way verdict) is "
    "replayed by DuckDB from the rules alone, no JSON serialization "
    "in the oracle. The upstream-broke-their-export detector: the "
    "failure mode it catches is silent NULL floods, not errors. "
    "DATA DEPENDENCY (r10 ADVICE): both engines enumerate keys "
    "OBSERVED in >=1 window — the fixture's dying key still appears "
    "in early windows, so both lanes see it; a key absent from the "
    "ENTIRE frame is invisible to the default (pass key_universe for "
    "registry-pinned audits, tested in test_quality.py).",
)
def q_schema_drift(spark: SparkSession, sf: str) -> DataFrame:
    ev = T(spark, sf, "events")
    payload = F.to_json(
        F.struct(
            F.col("value").alias("v"),
            F.when(
                F.col("event_type").isin("click", "view"), F.col("user_id")
            ).alias("uid"),
            F.when(F.col("event_id") % 3 == 0, F.col("event_type")).alias(
                "et"
            ),
            F.when(
                F.to_date("ts") >= F.lit("2024-01-15").cast("date"),
                F.col("value"),
            ).alias("v2"),
            F.when(
                F.to_date("ts") < F.lit("2024-01-10").cast("date"), F.lit(1)
            ).alias("legacy"),
        )
    )
    staged = ev.select(
        F.to_date("ts").alias("day"), payload.alias("payload")
    )
    return (
        schema_drift_report(
            staged, "payload", "day", shift_ppm=_SHIFT_PPM
        )
        .select(
            F.col("win"),
            "key",
            "n_rows",
            "n_present",
            "present_ppm",
            "prev_ppm",
            "status",
        )
        .orderBy("win", "key")
    )


@register(
    "q_volume_gate",
    oracle="""
    WITH counts AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n_rows
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT event_type, day, n_rows,
             list(n_rows) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS prior
      FROM counts
    ),
    g AS (
      SELECT event_type, day, n_rows,
             CASE WHEN prior IS NULL OR len(prior) < 7 THEN NULL
                  ELSE list_sort(prior)[(len(prior) + 1) // 2]
             END AS trailing_median
      FROM m
    ),
    d AS (
      SELECT *,
             CASE WHEN trailing_median IS NOT NULL
                  THEN (n_rows - trailing_median) * 1000000
                       // trailing_median END AS dev_ppm
      FROM g
    )
    SELECT event_type, day,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(trailing_median AS BIGINT) AS trailing_median,
           CAST(dev_ppm AS BIGINT) AS dev_ppm,
           CASE WHEN trailing_median IS NULL THEN 'warmup'
                WHEN dev_ppm < -300000 THEN 'drop'
                WHEN dev_ppm > 300000 THEN 'spike'
                ELSE 'ok' END AS status
    FROM d ORDER BY event_type, day
    """,
    doc="Volume-anomaly gate (r10, operators/quality.volume_gate): "
    "per (event_type, day) row counts vs the LOWER MEDIAN of the "
    "previous 7 days — a selection from a sorted at-most-7-element "
    "array (collect_list over the moving frame: exact, bounded, "
    "integer), deviations as integral ppm, warmup until a full "
    "baseline exists. The ingest circuit breaker that catches a "
    "half-delivered day or a double-loaded feed before it trains "
    "into a model; the oracle replays the moving-median selection "
    "and every verdict via DuckDB's list window.",
)
def q_volume_gate(spark: SparkSession, sf: str) -> DataFrame:
    ev = T(spark, sf, "events").select(
        "event_type", F.to_date("ts").alias("day")
    )
    out = volume_gate(
        ev, "day", key_cols="event_type",
        trailing=7, drop_ppm=300_000, spike_ppm=300_000,
    )
    return out.select(
        "event_type", "day", "n_rows", "trailing_median",
        "dev_ppm", "status",
    ).orderBy("event_type", "day")


def _profile_col_oracle(name: str, expr: str) -> str:
    """One column's profile block (shared CTE shape): value histogram,
    deterministic top pick, HUGEINT-exact Gini ppm."""
    return f"""
    SELECT '{name}' AS "column",
           (SELECT COUNT(*) FROM orders) AS n_rows,
           (SELECT COUNT(*) FROM orders WHERE ({expr}) IS NULL) AS n_null,
           (SELECT COUNT(*) FROM orders WHERE ({expr}) IS NULL) * 1000000
             // (SELECT COUNT(*) FROM orders) AS null_ppm,
           (SELECT COUNT(*) FROM (
              SELECT CAST({expr} AS VARCHAR) v FROM orders
              WHERE ({expr}) IS NOT NULL GROUP BY 1)) AS n_distinct,
           (SELECT v FROM (
              SELECT CAST({expr} AS VARCHAR) v, COUNT(*) n FROM orders
              WHERE ({expr}) IS NOT NULL GROUP BY 1)
            ORDER BY n DESC, v LIMIT 1) AS top_value,
           (SELECT n FROM (
              SELECT CAST({expr} AS VARCHAR) v, COUNT(*) n FROM orders
              WHERE ({expr}) IS NOT NULL GROUP BY 1)
            ORDER BY n DESC, v LIMIT 1) AS top_count,
           (SELECT n FROM (
              SELECT CAST({expr} AS VARCHAR) v, COUNT(*) n FROM orders
              WHERE ({expr}) IS NOT NULL GROUP BY 1)
            ORDER BY n DESC, v LIMIT 1) * 1000000
             // (SELECT COUNT(*) FROM orders
                 WHERE ({expr}) IS NOT NULL) AS top_share_ppm,
           (SELECT 1000000 - (SUM(n::HUGEINT * n) * 1000000)
                   // (SUM(n)::HUGEINT * SUM(n)) FROM (
              SELECT CAST({expr} AS VARCHAR) v, COUNT(*) n FROM orders
              WHERE ({expr}) IS NOT NULL GROUP BY 1)) AS gini_ppm
    """


_PROFILE_COLS = [
    ("o_orderstatus", "o_orderstatus"),
    ("o_custkey", "o_custkey"),
    (
        "prio_nullable",
        "CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderpriority END",
    ),
]


@register(
    "q_column_profile",
    oracle="""
    SELECT CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_null AS BIGINT) AS n_null,
           CAST(null_ppm AS BIGINT) AS null_ppm,
           CAST(n_distinct AS BIGINT) AS n_distinct,
           CAST(gini_ppm AS BIGINT) AS gini_ppm,
           CAST(top_count AS BIGINT) AS top_count,
           CAST(top_share_ppm AS BIGINT) AS top_share_ppm,
           top_value, "column"
    FROM ("""
    + "\nUNION ALL\n".join(
        _profile_col_oracle(n, e) for n, e in _PROFILE_COLS
    )
    + """)
    ORDER BY "column"
    """,
    doc="Per-column data-profiling audit (r11, operators/quality."
    "column_profile): null counts + ppm, exact distinct count, the "
    "most frequent value with a deterministic smallest-value "
    "tie-break (min over (-count, value) structs — no window), and "
    "Gini impurity 1 − Σ(cᵢ/n)² in ppm — Gini over Shannon entropy "
    "deliberately, because ln is irrational and Gini is one exact "
    "DECIMAL(38,0) fraction with a floor `div` both engines evaluate "
    "identically. One value-histogram shuffle per column, 1-row "
    "aggregate each, never a row collect; the planted-null lane "
    "(orderkey % 7) proves the null accounting.",
)
def q_column_profile(spark: SparkSession, sf: str) -> DataFrame:
    from incremental_github_data_pipeline_spark.operators.quality import (
        column_profile,
    )

    orders = T(spark, sf, "orders").select(
        "o_orderstatus",
        "o_custkey",
        F.when(F.col("o_orderkey") % 7 == 0, None)
        .otherwise(F.col("o_orderpriority"))
        .alias("prio_nullable"),
    )
    return column_profile(
        orders, ["o_orderstatus", "o_custkey", "prio_nullable"]
    ).orderBy("column")


_LAYOUT_TABLES = ["customer", "events", "lineitem", "orders"]


@register(
    "q_parquet_layout",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT regexp_extract(file_name, '([^/]+)$', 1) AS file_name,
           CAST(row_group_id AS INTEGER) AS row_group,
           CAST(MAX(row_group_num_rows) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_columns,
           CAST(SUM(total_compressed_size) AS BIGINT)
             AS n_bytes_compressed
    FROM parquet_metadata('/root/testdata/sf0.01/{t}.parquet')
    GROUP BY 1, 2"""
        for t in _LAYOUT_TABLES
    )
    + "\nORDER BY file_name, row_group",
    doc="Parquet physical-layout audit (r11, operators/quality."
    "parquet_layout) — the compaction/row-group-sizing input: per row "
    "group, row count, column count and the summed column-chunk "
    "compressed bytes, read from FOOTERS ONLY via pyarrow distributed "
    "one path per task (auditing a lake costs footer I/O, no data "
    "pages, no shuffle). The oracle is DuckDB's own parquet_metadata "
    "over the same files — two independent parquet footer readers "
    "agreeing byte-for-byte on spec-defined fields. Oracle paths pin "
    "the driver's sf0.01 contract; the Spark side follows the given "
    "sf dir (bench runs it at sf0.1 rows-only).",
)
def q_parquet_layout(spark: SparkSession, sf: str) -> DataFrame:
    from incremental_github_data_pipeline_spark.operators.quality import (
        parquet_layout,
    )

    paths = [f"{sf}/{t}.parquet" for t in _LAYOUT_TABLES]
    return parquet_layout(spark, paths).orderBy("file_name", "row_group")
