#!/usr/bin/env python
"""Round-10 operator scale sweep (sweep 19): the three new r10 shapes
whose scale behavior is claimed but not yet measured.

A — Holt linear fold: sequential per key, parallel across keys. Wall
    should grow ~linearly in rows-per-key (the Python fold is the
    cost) and NOT in key count at fixed total rows (keys parallelize
    across the 32 cores).

B — Decode quarantine overhead: on_error='quarantine' wraps each file
    in a try — the claim is per-file isolation at ~zero cost. Measured
    as decode_stats wall over the same healthy TIFF table in both
    modes, plus the all-rows-survive check with 20% corrupt files.

C — Tiled vs strip TIFF decode: the tile path assembles a grid of
    per-tile arrays instead of one byte join — same payload bytes,
    wall should be comparable (both are per-file Python; the container
    walk is noise next to the codec work).

Usage: python scripts/scale_round10_ops.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def timed(fn, n: int = 3) -> float:
    fn()  # warm-up
    return statistics.median(
        [(lambda t0=time.time(): (fn(), time.time() - t0)[1])() for _ in range(n)]
    )


def main() -> None:
    from pyspark.sql import functions as F

    from incremental_github_data_pipeline_spark.operators import (
        multimodal as mm,
    )
    from incremental_github_data_pipeline_spark.operators import (
        timeseries as ts,
    )
    from incremental_github_data_pipeline_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    print("== A: holt_linear fold — rows/key sweep at 8 keys")
    for rows_per_key in (1_000, 10_000, 100_000):
        df = spark.range(8 * rows_per_key).select(
            (F.col("id") % 8).alias("k"),
            (F.col("id") / 8).cast("long").alias("t"),
            ((F.col("id") * 7) % 10_000).alias("v"),
        )
        w = timed(lambda: ts.holt_linear(df, "k", "t", "v").count())
        print(f"  rows/key={rows_per_key:8,d}: wall {w:6.2f} s")

    print("== A2: key-count sweep at 800,000 total rows")
    for keys in (8, 80, 800):
        df = spark.range(800_000).select(
            (F.col("id") % keys).alias("k"),
            (F.col("id") / keys).cast("long").alias("t"),
            ((F.col("id") * 7) % 10_000).alias("v"),
        )
        w = timed(lambda: ts.holt_linear(df, "k", "t", "v").count())
        print(f"  keys={keys:4d}: wall {w:6.2f} s")

    print("== B: quarantine overhead over 480 healthy TIFFs")
    media = mm.make_tiff_media(spark, n=480).localCheckpoint(eager=True)
    w_raise = timed(lambda: mm.decode_stats(media).count())
    w_quar = timed(
        lambda: mm.decode_stats(media, on_error="quarantine").count()
    )
    print(f"  raise {w_raise:5.2f} s   quarantine {w_quar:5.2f} s "
          f"({w_quar / w_raise:.2f}x)")
    corrupted = media.withColumn(
        "payload",
        F.when(
            F.col("media_id") % 5 == 3, F.expr("substring(payload, 1, 32)")
        ).otherwise(F.col("payload")),
    )
    stats = mm.decode_stats(corrupted, on_error="quarantine")
    n_all = stats.count()
    n_bad = stats.filter("decode_error IS NOT NULL").count()
    print(f"  with 20% corrupt: {n_all} rows survive, {n_bad} quarantined")

    print("== C: tiled vs strip TIFF decode, 480 files, 96x96 RGB")
    rng = np.random.default_rng(10)
    px = rng.integers(0, 256, size=(96, 96, 3), dtype=np.uint8)
    rows_s, rows_t = [], []
    for i in range(480):
        rows_s.append((i, "image", mm.encode_tiff(
            px, rows_per_strip=16, compression="lzw"), "image/tiff",
            96, 96, None))
        rows_t.append((i, "image", mm.encode_tiff(
            px, tile=(16, 16), compression="lzw"), "image/tiff",
            96, 96, None))
    strip = mm._sized_media(spark, rows_s).localCheckpoint(eager=True)
    tiled = mm._sized_media(spark, rows_t).localCheckpoint(eager=True)
    w_s = timed(lambda: mm.decode_stats(strip).count())
    w_t = timed(lambda: mm.decode_stats(tiled).count())
    print(f"  strips {w_s:5.2f} s   tiles {w_t:5.2f} s ({w_t / w_s:.2f}x)")

    spark.stop()


if __name__ == "__main__":
    main()
