"""[EXT] Multimodal-column queries (operators.multimodal).

The media table is generated deterministically in-process
(make_fake_media — same rows every run, every engine), because the
driver test directories carry no binary media table. No DuckDB oracle:
the decode is engine-specific plumbing → rows-only checks, with the
determinism itself pinned by tests/test_multimodal.py.
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
    doc="Metadata-only profile over the media table — plan must not "
    "read the binary payload column (parquet column pruning).",
)
def q_media_metadata_profile(spark: SparkSession, sf: str) -> DataFrame:
    return metadata_profile(make_fake_media(spark, n=256))


@register(
    "q_media_frame_plan",
    doc="Video frame-sampling plan: distributed explode of per-media "
    "sample timestamps (the scalable half of frame extraction).",
)
def q_media_frame_plan(spark: SparkSession, sf: str) -> DataFrame:
    media = make_fake_media(spark, n=256)
    return (
        frame_sample_plan(media, every_ms=5000)
        .groupBy("media_id")
        .agg(F.count(F.lit(1)).alias("n_frames"), F.max("ts_ms").alias("last_ts_ms"))
        .orderBy("media_id")
    )
