#!/usr/bin/env python
"""Twenty-fifth sweep — round-13 operators. Claims to measure:

A. Trigram language ID is scan-stage: 10x the documents must cost
   close to 10x single-thread work but parallelize across partitions
   (pure codegen — trigram array + INSET filters + script regexes),
   with NO shuffle in the plan.
B. Percent-encoding normalization + the full URL stack is scan-stage:
   10x the URLs scale linearly, no shuffle.
C. Group 3 2-D (MR) fax pages decode linearly in page count like the
   G4/G3-1D lanes (payload-isolated mapInPandas), at a comparable
   constant factor.
D. Animated decode cost is FRAME-bounded: a 6-frame animated WebP/GIF
   costs ~6x its single-frame still, not more (the per-frame VP8L/LZW
   decode dominates; compositing is integer blits).
E. salted_keep_first is skew-immune: on a 90%-one-key corpus the
   two-phase form's wall stays flat as the hot key grows, while the
   window form degrades toward single-task sorting. Result identity
   is asserted inside the lane.
F. The incremental curation funnel is batch-bounded: per-batch wall
   flat from batch 2 to batch 8 while claim-table history grows 4x
   (claims probed via broadcast-batch-keys map-side scans, never
   reshuffled).

Usage: python scripts/scale_round13_ops.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from incremental_github_data_pipeline_spark.operators import (  # noqa: E402
    multimodal as mm,
)
from incremental_github_data_pipeline_spark.operators import (  # noqa: E402
    text as tx,
)
from incremental_github_data_pipeline_spark.session import get_spark  # noqa: E402


def timed(fn) -> float:
    fn()  # warm-up
    t0 = time.time()
    fn()
    return time.time() - t0


def lane_a_trigram(spark) -> None:
    print("A. trigram language ID scan-stage scaling")
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    for mult in (1, 10):
        docs = base
        for k in range(mult - 1):
            docs = docs.unionAll(
                base.withColumn("doc_id", F.col("doc_id") + (k + 1) * 10**6)
            )
        docs = docs.repartition(32).localCheckpoint(eager=True)
        tgd = docs.select(
            "doc_id",
            tx.char_trigrams("text").alias("tg"),
            tx.dominant_script("text").alias("script"),
        )
        hits = tx.trigram_hits("tg", trigrams=True)
        scored = tgd.select(
            "doc_id",
            *[hits[la].alias(la) for la in tx.TRIGRAM_PROFILES],
            "script",
        )
        out = scored.select(
            tx.lang_from_trigram_hits(
                {n: F.col(n) for n in tx.TRIGRAM_PROFILES},
                F.col("script"),
            ).alias("lang")
        ).groupBy("lang").count()
        t = timed(lambda: out.collect())
        n_ex = out._jdf.queryExecution().executedPlan().toString().count(
            "Exchange"
        )
        print(f"   docs={docs.count():>6} wall={t:6.2f}s "
              f"exchanges={n_ex} (1 = the count agg only)")


def lane_b_url_stack(spark) -> None:
    print("B. percent-encoding + URL stack scan-stage scaling")
    for n in (100_000, 1_000_000):
        urls = spark.range(n).select(
            F.concat(
                F.lit("HTTPS://Host"), (F.col("id") % 97).cast("string"),
                F.lit(".Example.COM:443/%70ath/"),
                F.col("id").cast("string"),
                F.lit("?b=2&%61=1&utm_source=s&fbclid=x%59z#f"),
            ).alias("u")
        ).repartition(32).localCheckpoint(eager=True)
        out = urls.select(
            tx.strip_tracking_params(
                tx.canonicalize_url(tx.normalize_percent_encoding("u"))
            ).alias("c")
        ).agg(F.sum(F.length("c")))
        t = timed(lambda: out.collect())
        print(f"   urls={n:>8} wall={t:6.2f}s")


def lane_c_g3_mr(spark) -> None:
    print("C. Group 3 2-D (MR) fax-page decode scaling")
    rng = np.random.RandomState(5)
    page = np.where(
        rng.rand(200, 1728) < 0.08, np.uint8(0), np.uint8(255)
    )
    payload = mm.encode_tiff(page, compression="g3_2d")
    g4 = mm.encode_tiff(page, compression="g4")
    for n in (20, 200):
        rows = [(i, "image", payload, "image/tiff", 1728, 200, None)
                for i in range(n)]
        media = mm._sized_media(spark, rows).repartition(16)
        t = timed(lambda: mm.decode_stats(media).count())
        rows4 = [(i, "image", g4, "image/tiff", 1728, 200, None)
                 for i in range(n)]
        media4 = mm._sized_media(spark, rows4).repartition(16)
        t4 = timed(lambda: mm.decode_stats(media4).count())
        print(f"   pages={n:>4} MR wall={t:6.2f}s  G4 wall={t4:6.2f}s")


def lane_d_animation(spark) -> None:
    print("D. animated decode cost is frame-bounded")
    w, h = 64, 48
    still_px = mm._webp_anim_pixels(0, 0, w, h)
    still = mm.encode_webp_lossless(still_px)
    anim6 = mm.encode_webp_animation(
        [dict(px=mm._webp_anim_pixels(0, f, w, h), blend=False)
         for f in range(6)],
        (w, h),
    )
    for name, payload in (("still", still), ("anim6", anim6)):
        rows = [(i, "image", payload, "image/webp", w, h, None)
                for i in range(100)]
        media = mm._sized_media(spark, rows).repartition(16)
        t = timed(lambda: mm.webp_decode_stats(media).count())
        print(f"   webp {name:<6} x100 wall={t:6.2f}s")
    idx = ((np.add.outer(np.arange(h) * 5, np.arange(w) * 3)) % 8).astype(
        np.uint8
    )
    gif1 = mm.encode_gif(idx, mm._gif_palette(8))
    gif6 = mm.encode_gif_animation(
        [dict(indices=(idx + f) % 8, palette=mm._gif_frame_palette(f))
         for f in range(6)],
        (w, h),
    )
    for name, payload in (("still", gif1), ("anim6", gif6)):
        rows = [(i, "image", payload, "image/gif", w, h, None)
                for i in range(100)]
        media = mm._sized_media(spark, rows).repartition(16)
        t = timed(lambda: mm.gif_decode_stats(media).count())
        print(f"   gif  {name:<6} x100 wall={t:6.2f}s")


def lane_e_salted_keep_first(spark) -> None:
    print("E. salted_keep_first vs window keep-first on a hot key")
    from pyspark.sql import Window

    from incremental_github_data_pipeline_spark.operators.skew import (
        salted_keep_first,
    )

    for n in (4_000_000, 32_000_000):
        df = spark.range(n).select(
            F.when(F.col("id") % 20 > 0, F.lit("hot"))
            .otherwise(F.concat(F.lit("k"), (F.col("id") % 99991)
                                .cast("string")))
            .alias("k"),
            F.col("id").alias("seq"),
            F.concat(F.lit("payload-"), F.col("id").cast("string"))
            .alias("v"),
        ).repartition(32).localCheckpoint(eager=True)
        t_salt = timed(
            lambda: salted_keep_first(df, ["k"], ["seq"], buckets=32)
            .count()
        )
        w = Window.partitionBy("k").orderBy("seq")
        t_win = timed(
            lambda: df.withColumn("rn", F.row_number().over(w))
            .filter("rn = 1").count()
        )
        if n <= 4_000_000:  # identity asserted at the smaller point
            a = salted_keep_first(df, ["k"], ["seq"], buckets=32)
            b = (df.withColumn("rn", F.row_number().over(w))
                 .filter("rn = 1").drop("rn"))
            assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
        print(f"   rows={n:>8} salted={t_salt:6.2f}s "
              f"window={t_win:6.2f}s (95% one key, wide row)")


def lane_f_incremental_funnel(spark) -> None:
    print("F. incremental curation funnel is batch-bounded")
    from incremental_github_data_pipeline_spark.streaming import (
        run_incremental_curation_funnel,
    )

    def payload(i: int) -> bytes:
        def html(m):
            text = " ".join(
                f"S{(i * 5 + m * 3 + 7 * j) % 3000} w{j} x{(i + j) % 17}"
                for j in range(30)
            )
            return (
                f"<html><body><p>{text}.</p></body></html>"
            ).encode()

        recs = [
            {
                "warc_type": "response",
                "target_uri": f"https://h{i % 50}.ex.com/p{i}x{m}",
                "http_status": 200,
                "body": html(m),
            }
            for m in range(2)
        ]
        return tx.warc_build(recs, gzip_per_record=False)

    tmp = tempfile.mkdtemp(prefix="scale13_")
    try:
        src = f"{tmp}/src"
        root = f"{tmp}/t"
        ckpt = f"{tmp}/ckpt"
        per_batch = 400
        for b in range(8):
            rows = [
                (b * per_batch + i, payload(b * per_batch + i))
                for i in range(per_batch)
            ]
            spark.createDataFrame(
                rows, "payload_id long, payload binary"
            ).coalesce(2).write.mode("append").parquet(src)
            t0 = time.time()
            run_incremental_curation_funnel(spark, src, root, ckpt)
            wall = time.time() - t0
            print(f"   batch {b}: {per_batch} payloads "
                  f"ingest wall={wall:6.2f}s "
                  f"(history={b * per_batch} payloads)")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    spark = get_spark(shuffle_partitions=32)
    lane_a_trigram(spark)
    lane_b_url_stack(spark)
    lane_c_g3_mr(spark)
    lane_d_animation(spark)
    lane_e_salted_keep_first(spark)
    lane_f_incremental_funnel(spark)
    lane_g_cdc_and_keep_best(spark)


if __name__ == "__main__":
    main()


def lane_g_cdc_and_keep_best(spark) -> None:
    print("G. CDC chunking + keep-best-of-cluster scaling (late r13)")
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    for mult in (1, 10):
        docs = base
        for k in range(mult - 1):
            docs = docs.unionAll(
                base.withColumn("doc_id", F.col("doc_id") + (k + 1) * 10**6)
            )
        docs = docs.repartition(32).localCheckpoint(eager=True)
        t = timed(lambda: tx.cdc_chunk_rows(docs).count())
        print(f"   cdc  docs={docs.count():>6} wall={t:6.2f}s")
    from incremental_github_data_pipeline_spark.operators.dedup import (
        connected_components,
        gram_overlap_pairs,
        keep_best_of_cluster,
    )

    for mult in (1, 4):
        docs = base
        for k in range(mult - 1):
            docs = docs.unionAll(
                base.withColumn("doc_id", F.col("doc_id") + (k + 1) * 10**6)
            )
        docs = docs.repartition(32).localCheckpoint(eager=True)

        def run():
            pairs = gram_overlap_pairs(docs, "doc_id", "text", k=5)
            cc = connected_components(pairs)
            keep_best_of_cluster(
                docs.select("doc_id", "n_chars"), cc, "n_chars"
            ).count()

        t = timed(run)
        print(f"   keep-best docs={docs.count():>6} wall={t:6.2f}s "
              f"(pairs grow with replication cliques)")
