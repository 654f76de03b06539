#!/usr/bin/env python
"""Twenty-first sweep — round-11 operators. Claims to measure:

A. VP8L decode throughput scales linearly in file count (per-file
   isolation, Arrow-batched; the same payload-I/O-bound contract as
   the PNG/TIFF lanes of sweep 16), with augmentation adding ~zero
   over plain decode (a view/copy next to the prefix-code work).
B. Integer resampling is linear in output samples and rate-ratio
   independent (one multiply + one floor-div per sample either way).
C. t-closeness wall is bounded by the AUDIT GRID (classes × sensitive
   domain), not the fact row count: 10× the rows over the same grid
   must cost ~the one extra scan, while 10× the class count grows the
   grid linearly.
D. Label propagation per-round cost is flat in the round index
   (checkpointed plan) and tracks edges — the sweep-20 PageRank
   contract extended to the second iterative graph loop.

Usage: python scripts/scale_round11_ops.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from incremental_github_data_pipeline_spark.operators import (  # noqa: E402
    multimodal as mm,
)
from incremental_github_data_pipeline_spark.operators.graph import (  # noqa: E402
    label_propagation,
)
from incremental_github_data_pipeline_spark.operators.privacy import (  # noqa: E402
    t_closeness_report,
)
from incremental_github_data_pipeline_spark.session import get_spark  # noqa: E402


def timed(fn) -> float:
    fn()  # warm-up: python-worker spawn + codegen out of the timing
    t0 = time.time()
    fn()
    return time.time() - t0


def main() -> None:
    spark = get_spark(app_name="scale-r11")
    spark.sparkContext.setLogLevel("ERROR")

    # A — VP8L decode + augmentation overhead
    for n in (96, 480):
        media = mm.make_webp_media(spark, n=24)
        reps = n // 24
        big = media
        for r in range(1, reps):
            big = big.unionByName(
                media.withColumn(
                    "media_id", F.col("media_id") + 24 * r
                )
            )
        big = big.localCheckpoint(eager=True)
        t_dec = timed(lambda: mm.webp_decode_stats(big).count())
        t_aug = timed(lambda: mm.augment_decode_stats(big).count())
        print(
            f"A n={n} webp decode {t_dec:.2f}s | decode+augment "
            f"{t_aug:.2f}s ({t_aug / max(t_dec, 0.01):.2f}x)",
            flush=True,
        )

    # B — resampling linear in output samples, ratio-independent
    for n_files, frames in ((24, 1), (24, 100)):
        rows = []
        for i in range(n_files):
            s = (
                (np.arange(2000 * frames) * (3 + i % 7) + i * 11) % 2048
                - 1024
            ).astype(np.int16)
            rows.append(
                (i, "audio", mm.encode_wav(s), "audio/wav", None, None,
                 len(s) * 1000 // 8000)
            )
        media = mm._sized_media(spark, rows).localCheckpoint(eager=True)
        for rate in (16000, 11025):
            t = timed(
                lambda: mm.resample_audio(media, target_rate=rate).count()
            )
            print(
                f"B files={n_files} samples/file={2000 * frames} "
                f"-> {rate}Hz: {t:.2f}s",
                flush=True,
            )

    # C — t-closeness: fact rows vs audit grid
    def tclose_frame(n_rows: int, n_classes: int):
        return spark.range(n_rows).select(
            F.pmod(F.xxhash64("id"), F.lit(n_classes)).alias("q"),
            F.pmod(F.xxhash64("id", F.lit(3)), F.lit(50)).alias("v"),
        )

    for n_rows, n_classes in (
        (1_000_000, 100), (10_000_000, 100), (1_000_000, 1000),
    ):
        df = tclose_frame(n_rows, n_classes).localCheckpoint(eager=True)
        t = timed(
            lambda: t_closeness_report(df, ["q"], "v", t_ppm=50_000).count()
        )
        print(
            f"C rows={n_rows} classes={n_classes} grid="
            f"{n_classes * 50}: {t:.2f}s",
            flush=True,
        )

    # D — label propagation: rounds flat, edges linear
    for n_edges in (1_000_000, 4_000_000):
        n_nodes = n_edges // 10
        edges = (
            spark.range(n_edges)
            .select(
                F.pmod(F.xxhash64("id"), F.lit(n_nodes)).alias("src"),
                F.pmod(F.xxhash64("id", F.lit(7)), F.lit(n_nodes)).alias(
                    "dst"
                ),
            )
            .filter(F.col("src") != F.col("dst"))
            .localCheckpoint(eager=True)
        )
        t2 = timed(lambda: label_propagation(edges, iters=2).count())
        t5 = timed(lambda: label_propagation(edges, iters=5).count())
        print(
            f"D edges={n_edges}: iters=2 {t2:.2f}s iters=5 {t5:.2f}s "
            f"per-round {(t5 - t2) / 3:.2f}s",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
