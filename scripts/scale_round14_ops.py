#!/usr/bin/env python
"""Twenty-sixth sweep — round-14 operators. Claims to measure:

A. Sentence-dedup skew routing (the funnel's last unsalted window,
   VERDICT r13 task 3): on a 90%-one-boilerplate-sentence corpus the
   plain row_number window straggles (AQE never splits window
   partitions — one task sorts 90% of the rows) while salted_keep_first
   stays flat, and the two agree row-for-row.
B. Lossy VP8 keyframe decode is payload-bounded scan-stage work: 10x
   the payloads ≈ 10x single-thread decode work parallelized across
   partitions, no shuffle (one mapInPandas pass).
C. FastCDC clamps are free at scale: clamped chunking costs ≈ the
   unclamped rule on normal text (one bisect per emitted chunk), and
   on mask-degenerate content (base64-ish runs) the clamp bounds the
   max chunk where the pure rule degenerates to one mega-chunk per
   doc — the row-size/straggler hazard the clamp exists to remove.
D. Incremental keep-best is batch-bounded: per-batch ingest wall flat
   across batches while the component store grows (prior bests are
   probed via a broadcast-batch-labels semi-join, never reshuffled).

Usage: python scripts/scale_round14_ops.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from incremental_github_data_pipeline_spark.operators import (  # noqa: E402
    multimodal as mm,
)
from incremental_github_data_pipeline_spark.operators import (  # noqa: E402
    text as tx,
)
from incremental_github_data_pipeline_spark.operators.skew import (  # noqa: E402
    salted_keep_first,
)
from incremental_github_data_pipeline_spark.session import get_spark  # noqa: E402


def timed(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


def lane_a(spark) -> None:
    print("A. sentence-dedup skew: window vs salted_keep_first")
    for n in (8_000_000, 32_000_000):
        sents = spark.range(n).select(
            F.when(
                F.col("id") % 20 > 0,
                F.lit("Copyright FooCorp all rights reserved."),
            )
            .otherwise(F.concat(F.lit("unique sentence "), F.col("id")))
            .alias("sentence"),
            F.floor(F.col("id") / 7).cast("long").alias("payload_id"),
            (F.col("id") % 7).alias("record_idx"),
            F.col("id").alias("sent_idx"),
        ).repartition(32).localCheckpoint(eager=True)
        w = Window.partitionBy("sentence").orderBy(
            "payload_id", "record_idx", "sent_idx"
        )

        def window_form():
            return (
                sents.withColumn("rn", F.row_number().over(w))
                .filter("rn = 1")
                .count()
            )

        def salted_form():
            return salted_keep_first(
                sents,
                ["sentence"],
                ["payload_id", "record_idx", "sent_idx"],
                buckets=16,
            ).count()

        ts = timed(salted_form)
        tw = timed(window_form)
        if n <= 8_000_000:  # identity asserted at the smaller point
            a = (
                sents.withColumn("rn", F.row_number().over(w))
                .filter("rn = 1")
                .drop("rn")
            )
            b = salted_keep_first(
                sents, ["sentence"],
                ["payload_id", "record_idx", "sent_idx"], buckets=16,
            )
            assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
        print(
            f"   {n:>10,} rows 95%-hot: window {tw:5.2f} s   "
            f"salted {ts:5.2f} s"
        )


def lane_b(spark) -> None:
    print("B. VP8 keyframe decode: payload-bounded scan stage")
    for n in (24, 240):
        media = mm.make_vp8_media(spark, n=24)
        if n > 24:
            from functools import reduce

            copies = [
                media.withColumn(
                    "media_id", F.col("media_id") + F.lit(24 * k)
                )
                for k in range(n // 24)
            ]
            media = reduce(
                lambda a, b: a.unionByName(b), copies
            ).repartition(32)
        media = media.localCheckpoint(eager=True)
        mm.vp8_decode_stats(media).count()  # warm
        t = timed(lambda: mm.vp8_decode_stats(media).count())
        print(f"   {n:>4} payloads: {t:5.2f} s")


def lane_c(spark) -> None:
    print("C. FastCDC clamp overhead + degenerate-content bound")
    docs = spark.range(20_000).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit(f"w{j}x"),
                    ((F.col("id") * (j + 7)) % 997).cast("string"),
                )
                for j in range(80)
            ],
        ).alias("text"),
    ).localCheckpoint(eager=True)
    tx.cdc_chunk_rows(docs).count()  # warm
    t_plain = timed(lambda: tx.cdc_chunk_rows(docs).count())
    t_clamp = timed(
        lambda: tx.cdc_chunk_rows(docs, min_len=32, max_len=128).count()
    )
    print(
        f"   20k normal docs: unclamped {t_plain:5.2f} s   "
        f"clamped {t_clamp:5.2f} s"
    )
    blob_char = next(
        chr(c)
        for c in range(65, 91)
        if (c * sum(tx.CDC_POWERS)) % tx.CDC_MOD % (1 << tx.CDC_MASK_BITS)
        != 0
    )
    blobs = spark.range(2_000).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(blob_char * 4000),
            (F.col("id") % 97).cast("string"),
        ).alias("text"),
    ).localCheckpoint(eager=True)
    mx_plain = tx.cdc_chunk_rows(blobs).agg(
        F.max(F.length("chunk"))
    ).collect()[0][0]
    mx_clamp = tx.cdc_chunk_rows(blobs, min_len=32, max_len=128).agg(
        F.max(F.length("chunk"))
    ).collect()[0][0]
    print(
        f"   2k mask-degenerate blobs: max chunk unclamped "
        f"{mx_plain}   clamped {mx_clamp}"
    )


def lane_d(spark) -> None:
    print("D. incremental keep-best: per-batch wall vs store growth")
    from incremental_github_data_pipeline_spark.streaming import (
        run_incremental_cc_ingest,
        run_incremental_keep_best_ingest,
    )

    tmp = tempfile.mkdtemp(prefix="kb_sweep_")
    dsrc = os.path.join(tmp, "docs")
    esrc = os.path.join(tmp, "edges")
    broot = os.path.join(tmp, "best")
    croot = os.path.join(tmp, "cc")
    per_batch = 100_000
    for b in range(5):
        lo = b * per_batch
        spark.range(lo, lo + per_batch).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("doc "), F.col("id")).alias("text"),
            (F.col("id") % 1009).alias("q"),
        ).coalesce(4).write.mode("append").parquet(dsrc)
        # pair up consecutive ids within the batch -> growing clusters
        spark.range(lo, lo + per_batch - 1, 2).select(
            F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
        ).coalesce(4).write.mode("append").parquet(esrc)
        run_incremental_cc_ingest(
            spark, esrc, croot, os.path.join(tmp, "cck"),
            "id_a long, id_b long",
        )
        t = timed(
            lambda: run_incremental_keep_best_ingest(
                spark, dsrc, broot, os.path.join(tmp, "bck"),
                "doc_id long, text string, q long", croot, "q",
            )
        )
        print(f"   batch {b + 1}: {per_batch:,} docs ingested in {t:5.2f} s")


def main() -> None:
    spark = get_spark(shuffle_partitions=32)
    lane_a(spark)
    lane_b(spark)
    lane_c(spark)
    lane_d(spark)


if __name__ == "__main__":
    main()
