#!/usr/bin/env python
"""Twenty-second sweep — late round-11 operators. Claims to measure:

A. KMV sketch wall is fact-scan-bounded (linear-ish in input rows at
   fixed group count) while the STATE stays constant at groups × k —
   the sketch contract that makes it serviceable at 100 TB.
B. kmv_jaccard is pair-frame-bounded, not fact-bounded: with the
   sketch built once, scoring G groups costs the G²·k union work —
   growing G 4× must grow wall far less than 16× at these sizes
   (the pair frame is still broadcast-sized).
C. link_prediction wall tracks the WEDGE count, not the edge count:
   a planted super-hub blows the wedge set quadratically, and
   max_wedge_degree restores the bounded-degree cost at a documented
   score deficit.
D. WARC parsing is payload-I/O-bound and linear in record count —
   the same per-file-isolation contract as the codec lanes.
E. HITS per-round cost is flat in the round index (the
   localCheckpoint contract, sweep-20/21 extended to the third
   iterative loop) and tracks edges.

Usage: python scripts/scale_round11b_ops.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from incremental_github_data_pipeline_spark.operators.graph import (  # noqa: E402
    hits_integer,
    link_prediction,
)
from incremental_github_data_pipeline_spark.operators.incremental_agg import (  # noqa: E402
    kmv_jaccard,
    kmv_sketch,
)
from incremental_github_data_pipeline_spark.operators.text import (  # noqa: E402
    warc_build,
    warc_ingest,
)
from incremental_github_data_pipeline_spark.session import get_spark  # noqa: E402


def timed(fn) -> float:
    fn()  # warm-up
    t0 = time.time()
    fn()
    return time.time() - t0


def main() -> None:
    spark = get_spark(shuffle_partitions=32)

    print("== A: KMV sketch — fact-bounded wall, constant state ==")
    for rows in (1_000_000, 10_000_000):
        df = spark.range(rows).select(
            (F.col("id") % 8).cast("string").alias("g"),
            (F.col("id") * 2654435761 % 3_000_000).alias("key"),
        )
        w = timed(lambda d=df: kmv_sketch(d, "g", "key", k=64).count())
        n_state = kmv_sketch(df, "g", "key", k=64).count()
        print(f"rows={rows:>9,} wall={w:5.2f}s state_rows={n_state}")

    print("== B: kmv_jaccard — pair-frame-bounded ==")
    base = spark.range(2_000_000).select(
        (F.col("id") % 64).cast("string").alias("g"),
        (F.col("id") * 2654435761 % 500_000).alias("key"),
    )
    for groups in (8, 32):
        sk = kmv_sketch(
            base.filter(F.col("g").cast("int") < groups), "g", "key", k=64
        ).localCheckpoint(eager=True)
        w = timed(lambda s=sk: kmv_jaccard(s, "g", k=64).count())
        print(
            f"groups={groups:>3} pairs={groups*(groups-1)//2:>4} "
            f"wall={w:5.2f}s"
        )

    print("== C: link_prediction — wedge-bounded + hub cap ==")
    for n_nodes, hub in ((200_000, False), (200_000, True)):
        e = spark.range(n_nodes).select(
            F.col("id").alias("src"),
            ((F.col("id") * 7 + 13) % n_nodes).alias("dst"),
        ).union(
            spark.range(n_nodes).select(
                F.col("id").alias("src"),
                ((F.col("id") * 13 + 29) % n_nodes).alias("dst"),
            )
        )
        if hub:  # 3000 extra edges onto node 0: deg ~3000 -> 4.5M wedges
            e = e.union(
                spark.range(3000).select(
                    (F.col("id") + 17).alias("src"),
                    F.lit(0).alias("dst"),
                )
            )
        e = e.localCheckpoint(eager=True)
        w = timed(lambda d=e: link_prediction(d).count())
        tag = "hubbed" if hub else "bounded-degree"
        print(f"{tag:>15}: wall={w:6.2f}s")
        if hub:
            wc = timed(
                lambda d=e: link_prediction(d, max_wedge_degree=16).count()
            )
            print(f"{'hub capped @16':>15}: wall={wc:6.2f}s")

    print("== D: WARC parse throughput ==")
    recs = [
        {
            "warc_type": "response",
            "target_uri": f"https://h{j}.example.com/p",
            "http_status": 200,
            "body": b"<html><p>" + b"w " * 400 + b"</p></html>",
        }
        for j in range(4)
    ]
    payload = warc_build(recs, gzip_per_record=True)
    for files in (500, 5000):
        df = spark.range(files).select(
            F.col("id").alias("payload_id"),
            F.lit(payload).alias("payload"),
        ).localCheckpoint(eager=True)
        w = timed(lambda d=df: warc_ingest(d).count())
        print(
            f"payloads={files:>5} records={files*4:>6} wall={w:5.2f}s"
        )

    print("== E: HITS per-round flatness ==")
    for n_nodes in (1_000_000, 4_000_000):
        e = spark.range(n_nodes).select(
            F.col("id").alias("src"),
            ((F.col("id") * 7 + 13) % n_nodes).alias("dst"),
        ).localCheckpoint(eager=True)
        w2 = timed(lambda d=e: hits_integer(d, n_nodes, iters=2).count())
        w5 = timed(lambda d=e: hits_integer(d, n_nodes, iters=5).count())
        print(
            f"edges={n_nodes:>9,} wall(2)={w2:5.2f}s wall(5)={w5:5.2f}s "
            f"per-round={(w5 - w2) / 3:5.2f}s"
        )

    spark.stop()


if __name__ == "__main__":
    main()
