"""[EXT] Multimodal columns (SURVEY.md §2.10): image/audio/video as
opaque ``binary`` payloads + typed metadata structs.

Decode is REAL for every format with a public, dependency-free codec:
- ``image/bmp`` — 24-bit uncompressed BMP, parsed header-first with
  numpy (row padding, bottom-up raster, pixel-data offset honored);
- ``audio/wav`` — 16-bit PCM via the stdlib ``wave`` module;
- ``video/x-raw-rgb`` — a trivial length-prefixed raw-RGB frame
  container (what uncompressed AVI is, minus chunk bookkeeping).
Formats that genuinely require external codec libraries (JPEG/MP3/H.264
— not present in this container) keep the honest ``NotImplementedError``
stub; ``fake=True`` substitutes a deterministic synthetic decode so the
distributed plumbing is exercisable for those too.

At 100 TB: binary payloads dominate row size, so (a) media tables are
partitioned by a content-size bucket to keep Arrow batches bounded,
(b) metadata-only queries never touch the binary column (parquet column
pruning — confirm ``ReadSchema`` excludes it), and (c) decode stages run
``mapInPandas`` with small ``maxRecordsPerBatch`` to cap executor memory.
"""

from __future__ import annotations

import io
import struct
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
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


def _real_feature(mime: str, payload: bytes, dim: int) -> list[float]:
    """Fixed-dim feature vector from a REAL decode. Image: channel means
    + gray std + horizontal-gradient energy. Audio: RMS, zero-crossing
    rate, coarse FFT band magnitudes (numpy rfft). Video: frame count,
    temporal-difference energy, channel means of the middle frame."""
    v = np.zeros(dim, dtype=np.float64)
    if mime == "image/bmp":
        px = decode_bmp(payload).astype(np.float64)
        gray = px.mean(axis=2)
        v[0:3] = px.reshape(-1, 3).mean(axis=0) / 255.0
        v[3] = gray.std() / 255.0
        if gray.shape[1] > 1:
            v[4] = np.abs(np.diff(gray, axis=1)).mean() / 255.0
    elif mime == "audio/wav":
        _, s = decode_wav(payload)
        x = s.astype(np.float64) / 32768.0
        v[0] = float(np.sqrt((x**2).mean()))
        v[1] = float((np.diff(np.signbit(x)) != 0).mean())
        mags = np.abs(np.fft.rfft(x))
        bands = np.array_split(mags, max(dim - 2, 1))
        for j, b in enumerate(bands[: dim - 2]):
            v[2 + j] = float(b.mean()) / len(x)
    elif mime == "video/x-raw-rgb":
        fr, _ = decode_rawvideo(payload)
        x = fr.astype(np.float64)
        v[0] = fr.shape[0]
        if fr.shape[0] > 1:
            v[1] = np.abs(np.diff(x, axis=0)).mean() / 255.0
        v[2:5] = x[fr.shape[0] // 2].reshape(-1, 3).mean(axis=0) / 255.0
    else:
        raise NotImplementedError(
            f"no dependency-free codec for mime {mime!r}; pass fake=True "
            "for the deterministic test decoder"
        )
    return [float(f) for f in v]


def extract_features(
    media: DataFrame, dim: int = 8, fake: bool = False
) -> DataFrame:
    """Decode/feature-extract stage over ``mapInPandas``: Arrow-batched,
    one Python worker pass, output schema fixed (FEATURE_SCHEMA).

    ``fake=False`` runs the REAL decoders (BMP/WAV/raw-video — see
    module docstring) and raises ``NotImplementedError`` for mime types
    whose codecs aren't available dependency-free (JPEG/MP3/H.264);
    ``fake=True`` substitutes the deterministic byte-fold stand-in for
    any payload."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if fake:
                feats = pdf["payload"].map(lambda p: _fake_decode(p, dim))
            else:
                feats = [
                    _real_feature(m, p, dim)
                    for m, p in zip(pdf["mime"], pdf["payload"])
                ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "feature": feats,
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


# ---------------------------------------------------------------------------
# Real codecs (public formats, dependency-free)
# ---------------------------------------------------------------------------

WAV_SAMPLE_RATE = 8000


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit uncompressed BMP
    (BITMAPINFOHEADER, bottom-up raster, rows padded to 4 bytes) — the
    format every image tool reads, writable with nothing but struct."""
    h, w, _ = pixels.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    image_size = (row_bytes + pad) * h
    # pixel rows bottom-up, channels as BGR
    bgr = pixels[::-1, :, ::-1]
    rows = bgr.reshape(h, row_bytes)
    if pad:
        rows = np.concatenate([rows, np.zeros((h, pad), dtype=np.uint8)], axis=1)
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + image_size, 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, image_size, 2835, 2835, 0, 0)
    return header + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP to an (h, w, 3) uint8 RGB array.
    Honors the header's pixel-data offset, 4-byte row padding and
    bottom-up raster; rejects compressed or non-24bpp variants."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_offset,) = struct.unpack_from("<I", payload, 10)
    _, w, h, _, bpp, compression = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or compression != 0:
        raise NotImplementedError("only 24-bit uncompressed BMP supported")
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    raster = np.frombuffer(payload, dtype=np.uint8, offset=data_offset,
                           count=stride * abs(h)).reshape(abs(h), stride)
    bgr = raster[:, :row_bytes].reshape(abs(h), w, 3)
    if h > 0:  # positive height = bottom-up
        bgr = bgr[::-1]
    return bgr[:, :, ::-1]  # BGR -> RGB


def encode_wav(samples: np.ndarray, sample_rate: int = WAV_SAMPLE_RATE) -> bytes:
    """Encode int16 samples as canonical mono 16-bit PCM WAV (stdlib
    ``wave``: 44-byte RIFF/fmt/data header + frames)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode 16-bit PCM WAV → (sample_rate, int16 sample array) via the
    stdlib ``wave`` parser (chunk-aware, not header arithmetic)."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        if wf.getsampwidth() != 2 or wf.getnchannels() != 1:
            raise NotImplementedError("only mono 16-bit PCM supported")
        sr = wf.getframerate()
        frames = wf.readframes(wf.getnframes())
    return sr, np.frombuffer(frames, dtype="<i2")


RAWVIDEO_MAGIC = b"RVID"


def encode_rawvideo(frames: np.ndarray, frame_ms: int = 100) -> bytes:
    """Encode an (n, h, w, 3) uint8 array as the raw-RGB container:
    magic + (n, w, h, frame_ms) header + concatenated frames. This IS
    what uncompressed video is; real codecs only add compression."""
    n, h, w, _ = frames.shape
    return (
        RAWVIDEO_MAGIC
        + struct.pack("<IIII", n, w, h, frame_ms)
        + frames.tobytes()
    )


def decode_rawvideo(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode the raw-RGB container → ((n, h, w, 3) uint8 array, frame_ms)."""
    if payload[:4] != RAWVIDEO_MAGIC:
        raise ValueError("not a raw-video payload")
    n, w, h, frame_ms = struct.unpack_from("<IIII", payload, 4)
    frames = np.frombuffer(payload, dtype=np.uint8, offset=20,
                           count=n * h * w * 3).reshape(n, h, w, 3)
    return frames, frame_ms


# ---------------------------------------------------------------------------
# Deterministic real-payload generator (closed-form content, so DuckDB
# oracles can recompute ground truth without any codec)
# ---------------------------------------------------------------------------


def _image_pixels(i: int) -> np.ndarray:
    w, h = 16 + (i % 13), 12 + (i % 11)
    x = np.arange(w)[None, :, None]
    y = np.arange(h)[:, None, None]
    c = np.arange(3)[None, None, :]
    return ((x * 7 + y * 13 + c * 29 + i * 3) % 256).astype(np.uint8)


def _audio_samples(i: int) -> np.ndarray:
    n = 400 + 80 * (i % 20)
    t = np.arange(n)
    # integer-arithmetic waveform (no float sin) so the oracle can
    # recompute sample values exactly in SQL
    return (((t * (3 + i % 7) + i * 11) % 2048) - 1024).astype(np.int16)


def _video_frames(i: int) -> np.ndarray:
    w, h, n = 8 + (i % 5), 6 + (i % 4), 3 + (i % 6)
    k = np.arange(n)[:, None, None, None]
    y = np.arange(h)[None, :, None, None]
    x = np.arange(w)[None, None, :, None]
    c = np.arange(3)[None, None, None, :]
    return ((x * 7 + y * 13 + c * 29 + k * 17 + i * 3) % 256).astype(np.uint8)


def make_real_media(spark, n: int = 96) -> DataFrame:
    """Media table with REAL payloads: BMP images, PCM WAV audio,
    raw-RGB video — every byte parseable by the decoders above and every
    content value a closed-form function of ``media_id`` (so metadata
    AND decoded statistics are recomputable engine-independently)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            px = _image_pixels(i)
            payload, mime = encode_bmp(px), "image/bmp"
            w, h, dur = px.shape[1], px.shape[0], None
        elif kind == "audio":
            s = _audio_samples(i)
            payload, mime = encode_wav(s), "audio/wav"
            w, h, dur = None, None, len(s) * 1000 // WAV_SAMPLE_RATE
        else:
            fr = _video_frames(i)
            payload, mime = encode_rawvideo(fr, frame_ms=100), "video/x-raw-rgb"
            w, h, dur = fr.shape[2], fr.shape[1], fr.shape[0] * 100
        rows.append((i, kind, payload, mime, w, h, dur))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# Real decode stages (mapInPandas — Arrow-batched, schema-fixed)
# ---------------------------------------------------------------------------

MEDIA_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("n_frames", LongType(), True),
        StructField("n_samples", LongType(), True),
        StructField("sample_rate", LongType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("mean_r", DoubleType(), True),
        StructField("mean_g", DoubleType(), True),
        StructField("mean_b", DoubleType(), True),
        StructField("mean_abs_sample", DoubleType(), True),
    ]
)


def decode_stats(media: DataFrame) -> DataFrame:
    """Run the REAL decoder for each payload and emit per-media decoded
    statistics — the cross-engine checkable face of the codec stage
    (means over deterministic content have closed forms an oracle can
    recompute). One mapInPandas pass; unknown mime types raise."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for r in pdf.itertuples(index=False):
                row = {
                    "media_id": r.media_id, "kind": r.kind, "width": None,
                    "height": None, "n_frames": None, "n_samples": None,
                    "sample_rate": None, "duration_ms": None, "mean_r": None,
                    "mean_g": None, "mean_b": None, "mean_abs_sample": None,
                }
                if r.mime == "image/bmp":
                    px = decode_bmp(r.payload)
                    row.update(
                        height=px.shape[0], width=px.shape[1],
                        mean_r=float(px[:, :, 0].mean()),
                        mean_g=float(px[:, :, 1].mean()),
                        mean_b=float(px[:, :, 2].mean()),
                    )
                elif r.mime == "audio/wav":
                    sr, s = decode_wav(r.payload)
                    row.update(
                        n_samples=len(s), sample_rate=sr,
                        duration_ms=len(s) * 1000 // sr,
                        mean_abs_sample=float(np.abs(s.astype(np.int64)).mean()),
                    )
                elif r.mime == "video/x-raw-rgb":
                    fr, frame_ms = decode_rawvideo(r.payload)
                    row.update(
                        n_frames=fr.shape[0], height=fr.shape[1],
                        width=fr.shape[2], duration_ms=fr.shape[0] * frame_ms,
                        mean_r=float(fr[:, :, :, 0].mean()),
                        mean_g=float(fr[:, :, :, 1].mean()),
                        mean_b=float(fr[:, :, :, 2].mean()),
                    )
                else:
                    raise NotImplementedError(
                        f"no dependency-free codec for mime {r.mime!r}"
                    )
                out.append(row)
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, MEDIA_STATS_SCHEMA)


def area_resample(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Area-average resample of an (h, w, 3) uint8 array to
    (out_h, out_w, 3): exact block mean when sizes divide, otherwise
    pixel-boundary block sums off a cumulative-sum table (integer pixel
    sums stay exact in float64) — deterministic, no interpolation
    library. Upscales degrade to nearest-neighbor: each output cell
    covers at least one source pixel, never a zero-width cell."""
    h, w, _ = px.shape
    ys = (np.arange(out_h + 1) * h) // out_h
    xs = (np.arange(out_w + 1) * w) // out_w
    # widen zero-width cells (out > in) to one source pixel
    y0, y1 = ys[:-1], np.maximum(ys[1:], ys[:-1] + 1)
    x0, x1 = xs[:-1], np.maximum(xs[1:], xs[:-1] + 1)
    y0 = np.minimum(y0, h - 1)
    y1 = np.minimum(y1, h)
    x0 = np.minimum(x0, w - 1)
    x1 = np.minimum(x1, w)
    acc = px.astype(np.float64)
    cs = np.zeros((h + 1, w + 1, 3))
    cs[1:, 1:] = acc.cumsum(axis=0).cumsum(axis=1)
    cells = (
        cs[y1[:, None], x1[None, :]]
        - cs[y0[:, None], x1[None, :]]
        - cs[y1[:, None], x0[None, :]]
        + cs[y0[:, None], x0[None, :]]
    )
    area = ((y1 - y0)[:, None] * (x1 - x0)[None, :])[:, :, None]
    return np.clip(np.round(cells / area), 0, 255).astype(np.uint8)


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Real image resize: decode BMP → area-average resample to
    (out_h, out_w) → re-encode BMP. Non-image rows pass through
    untouched. See :func:`area_resample` for the resampling contract."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            recs = []
            for r in pdf.itertuples(index=False):
                if r.mime == "image/bmp":
                    small = area_resample(decode_bmp(r.payload), out_w, out_h)
                    recs.append(
                        (r.media_id, r.kind, encode_bmp(small), r.mime,
                         out_w, out_h, r.duration_ms)
                    )
                else:
                    recs.append(tuple(r))
            yield pd.DataFrame(recs, columns=pdf.columns)

    return media.mapInPandas(batches, MEDIA_SCHEMA)


SAMPLED_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("ts_ms", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("frame_mean", DoubleType(), True),
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """REAL frame sampling: decode the raw-video container and emit one
    row per sampled timestamp with the decoded frame's mean intensity.
    Each video row expands independently inside its partition — no
    shuffle; at scale the payload column is the I/O bound, not compute."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            recs = []
            for r in pdf.itertuples(index=False):
                if r.mime != "video/x-raw-rgb":
                    continue
                frames, frame_ms = decode_rawvideo(r.payload)
                duration = frames.shape[0] * frame_ms
                for ts in range(0, duration, every_ms):
                    idx = min(ts // frame_ms, frames.shape[0] - 1)
                    recs.append(
                        (r.media_id, ts, idx, float(frames[idx].mean()))
                    )
            yield pd.DataFrame(
                recs, columns=["media_id", "ts_ms", "frame_idx", "frame_mean"]
            )

    return media.filter(F.col("kind") == "video").mapInPandas(
        batches, SAMPLED_FRAME_SCHEMA
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
