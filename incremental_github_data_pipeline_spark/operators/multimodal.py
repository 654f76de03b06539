"""[EXT] Multimodal columns (SURVEY.md §2.10): image/audio/video as
opaque ``binary`` payloads + typed metadata structs.

The Spark-side plumbing here is real and tested — schema, partition
strategy, Arrow batch shape through ``mapInPandas`` — while the actual
codec work is stubbed: this container ships no image/audio libraries, so
decoders raise ``NotImplementedError`` unless ``fake=True``, which
substitutes a deterministic synthetic decode (shape-correct, seed-stable)
so the distributed pipeline around the codec is exercisable end-to-end.

At 100 TB: binary payloads dominate row size, so (a) media tables are
partitioned by a content-size bucket to keep Arrow batches bounded,
(b) metadata-only queries never touch the binary column (parquet column
pruning — confirm ``ReadSchema`` excludes it), and (c) decode stages run
``mapInPandas`` with small ``maxRecordsPerBatch`` to cap executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def make_fake_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for tests: payload bytes are
    seeded by media_id, so every run (and every engine) sees identical
    content."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = bytes([(i * 31 + j * 7 + seed) % 256 for j in range(128 + i)])
        rows.append(
            (i, kind, payload, f"application/x-fake-{kind}", 64 + i, 48 + i, 1000 * i)
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real codec: fold payload bytes into a
    fixed-size feature vector. Replace with PIL/librosa/ffmpeg decode in
    a real deployment."""
    acc = [0] * dim
    for j, byte in enumerate(payload or b""):
        acc[j % dim] = (acc[j % dim] + byte) % 997
    return [float(x) / 997.0 for x in acc]


def extract_features(
    media: DataFrame, dim: int = 8, fake: bool = False
) -> DataFrame:
    """Decode/feature-extract stage over ``mapInPandas``: Arrow-batched,
    one Python worker pass, output schema fixed (FEATURE_SCHEMA).

    ``fake=False`` raises NotImplementedError per batch — the honest
    stub: this container has no media codecs (see module docstring).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "media decode requires codec libraries not present in "
                    "this environment; pass fake=True for the deterministic "
                    "test decoder"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "feature": pdf["payload"].map(lambda p: _fake_decode(p, dim)),
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def metadata_profile(media: DataFrame) -> DataFrame:
    """Metadata-only aggregate — must *not* read the payload column
    (verify: ReadSchema in .explain excludes ``payload``)."""
    return (
        media.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(F.col("width").cast("double")).alias("avg_width"),
            F.max("duration_ms").alias("max_duration_ms"),
        )
        .orderBy("kind")
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per (media_id, ts_ms)
    to decode — the distributed part of frame extraction. The decode
    itself is the stubbed stage above; the explode is what must scale."""
    video = media.filter(F.col("kind") == "video")
    return video.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("ts_ms"),
    )
