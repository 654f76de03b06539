"""[EXT] Multimodal-column queries (operators.multimodal).

The media table is generated deterministically in-process
(make_fake_media — same rows every run, every engine), because the
driver test directories carry no binary media table. Its METADATA is a
pure function of the row index (kind = i%3, width = 64+i, duration_ms =
1000*i — multimodal.py make_fake_media), so the metadata-only queries
get real DuckDB oracles that regenerate the table from ``range(n)`` —
no binary codec needed, fully independent of the Spark code path. Only
the payload-decoding query (q_media_features) stays rows-only: its
feature math runs through the stubbed codec, engine-specific by design,
pinned instead by tests/test_multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incremental_github_data_pipeline_spark.operators.multimodal import (
    extract_features,
    frame_sample_plan,
    make_fake_media,
    metadata_profile,
)
from incremental_github_data_pipeline_spark.queries import register

# DuckDB twin of make_fake_media(n=256)'s metadata columns (payload
# omitted — the queries below are metadata-only by contract).
_FAKE_MEDIA_SQL = """
    media AS (
      SELECT i AS media_id,
             CASE CAST(i % 3 AS INTEGER) WHEN 0 THEN 'image'
                  WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
             64 + i AS width, 48 + i AS height, 1000 * i AS duration_ms
      FROM range(256) t(i)
    )
"""


@register(
    "q_media_features",
    doc="Binary-payload decode/feature-extract via Arrow-batched "
    "mapInPandas (deterministic stub decoder), aggregated per kind.",
)
def q_media_features(spark: SparkSession, sf: str) -> DataFrame:
    media = make_fake_media(spark, n=256)
    feats = extract_features(media, dim=8, fake=True)
    return (
        feats.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.sum(F.element_at("feature", 1)), 6).alias("f0_sum"),
        )
        .orderBy("kind")
    )


@register(
    "q_media_metadata_profile",
    oracle=f"""
    WITH {_FAKE_MEDIA_SQL}
    SELECT kind, COUNT(*) AS n,
           AVG(CAST(width AS DOUBLE)) AS avg_width,
           CAST(MAX(duration_ms) AS BIGINT) AS max_duration_ms
    FROM media GROUP BY kind ORDER BY kind
    """,
    doc="Metadata-only profile over the media table — plan must not "
    "read the binary payload column (parquet column pruning). Oracle "
    "regenerates the deterministic metadata from range(256) in DuckDB.",
)
def q_media_metadata_profile(spark: SparkSession, sf: str) -> DataFrame:
    return metadata_profile(make_fake_media(spark, n=256))


@register(
    "q_media_frame_plan",
    oracle=f"""
    WITH {_FAKE_MEDIA_SQL}
    SELECT media_id,
           CAST(floor((duration_ms - 1) / 5000.0) AS BIGINT) + 1 AS n_frames,
           CAST(floor((duration_ms - 1) / 5000.0) AS BIGINT) * 5000 AS last_ts_ms
    FROM media WHERE kind = 'video' ORDER BY media_id
    """,
    doc="Video frame-sampling plan: distributed explode of per-media "
    "sample timestamps (the scalable half of frame extraction). Oracle "
    "derives frame counts in closed form from the deterministic "
    "metadata: sequence(0, duration-1, step) has floor((d-1)/step)+1 "
    "elements (every video row has duration >= 2000 > 0).",
)
def q_media_frame_plan(spark: SparkSession, sf: str) -> DataFrame:
    media = make_fake_media(spark, n=256)
    return (
        frame_sample_plan(media, every_ms=5000)
        .groupBy("media_id")
        .agg(F.count(F.lit(1)).alias("n_frames"), F.max("ts_ms").alias("last_ts_ms"))
        .orderBy("media_id")
    )
