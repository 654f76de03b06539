#!/usr/bin/env python
"""Twenty-third sweep — container-ingest throughput. Claims to measure:

A. Avro OCF decode is linear in record count and block-size
   insensitive (varint/zigzag work per record dominates; deflate adds
   a constant-factor inflate per block).
B. Archive member extraction is linear in member bytes and
   layout-insensitive across tar / tar.gz / zip (per-payload isolation,
   same contract as the codec lanes).

Usage: python scripts/scale_ingest_containers.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from incremental_github_data_pipeline_spark.session import get_spark  # noqa: E402
from incremental_github_data_pipeline_spark.sources.archives import (  # noqa: E402
    archive_ingest,
    tar_build,
    zip_build,
)
from incremental_github_data_pipeline_spark.sources.avro import (  # noqa: E402
    avro_build,
    avro_ingest,
)


def timed(fn) -> float:
    fn()
    t0 = time.time()
    fn()
    return time.time() - t0


def main() -> None:
    spark = get_spark(shuffle_partitions=32)

    print("== A: Avro decode throughput ==")
    schema = {
        "type": "record", "name": "r",
        "fields": [
            {"name": "s", "type": "string"},
            {"name": "n", "type": "long"},
            {"name": "o", "type": ["null", "long"]},
        ],
    }
    for recs_per_payload, codec in ((100, "null"), (1000, "null"),
                                    (1000, "deflate")):
        recs = [
            {"s": f"w{i % 50}", "n": i * 7 - 3,
             "o": None if i % 4 == 0 else i}
            for i in range(recs_per_payload)
        ]
        payload = avro_build(schema, recs, codec=codec,
                             records_per_block=64)
        df = spark.range(200).select(
            F.col("id").alias("payload_id"),
            F.lit(payload).alias("payload"),
        ).localCheckpoint(eager=True)
        w = timed(
            lambda d=df: avro_ingest(d, "s string, n long, o long").count()
        )
        total = 200 * recs_per_payload
        print(f"codec={codec:>8} records={total:>7,} wall={w:5.2f}s")

    print("== B: archive extraction throughput ==")
    members = [(f"f{j}.txt", (f"word{j} " * 200).encode()) for j in range(8)]
    for tag, payload in (
        ("tar", tar_build(members)),
        ("tar.gz", tar_build(members, gz=True)),
        ("zip", zip_build(members)),
    ):
        for n_payloads in (100, 1000):
            df = spark.range(n_payloads).select(
                F.col("id").alias("payload_id"),
                F.lit(payload).alias("payload"),
            ).localCheckpoint(eager=True)
            w = timed(lambda d=df: archive_ingest(d).count())
            print(
                f"layout={tag:>7} payloads={n_payloads:>5} "
                f"members={n_payloads * 8:>6,} wall={w:5.2f}s"
            )

    spark.stop()


if __name__ == "__main__":
    main()
