#!/usr/bin/env python
"""Round-9 codec throughput sweep: decode cost for the new media lanes
(FLAC, TIFF incl. LZW/PackBits, Netpbm/TGA/AIFF, and the transcode
pass) at growing FILE COUNTS. The claim under test is the module's
standing one — per-file Python decode behind Arrow-batched
mapInPandas, each payload reduced to a handful of numbers inside its
partition, so throughput (files/s) should RISE with file count as
fixed session overhead amortizes and all 32 cores engage, with no
shuffle anywhere in the decode stage.

Replication multiplies the generator's n (distinct ids, same size
distribution). Wall = warm-up + median-of-3 on a count() that forces
every decode.

Usage: python scripts/scale_media_codecs.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, reps: int = 3) -> float:
    fn()
    return statistics.median(
        [(lambda t0: (fn(), time.time() - t0)[1])(time.time()) for _ in range(reps)]
    )


def main() -> None:
    from incremental_github_data_pipeline_spark.operators.multimodal import (
        decode_stats,
        make_flac_media,
        make_legacy_media,
        make_tiff_media,
        make_wav_variant_media,
        transcode_audio,
    )
    from incremental_github_data_pipeline_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    lanes = [
        ("FLAC decode", lambda n: decode_stats(make_flac_media(spark, n=n))),
        ("TIFF decode (none/PackBits/LZW)", lambda n: decode_stats(make_tiff_media(spark, n=n))),
        ("Netpbm/TGA/AIFF decode", lambda n: decode_stats(make_legacy_media(spark, n=n))),
        (
            "WAV->FLAC transcode",
            lambda n: transcode_audio(make_wav_variant_media(spark, n=n)),
        ),
    ]
    for name, mk in lanes:
        print(f"== {name}")
        for n in (24, 240, 1200):
            df = mk(n)
            wall = timed(lambda: df.count())
            print(f"  n={n:5d} files: wall {wall:6.2f} s  {n / wall:8.1f} files/s")

    spark.stop()


if __name__ == "__main__":
    main()
