#!/usr/bin/env python
"""Twenty-fourth sweep — round-12 operators. Claims to measure:

A. The crawl-curation funnel is payload-parallel and near-linear in
   payload count: 10x the WARC payloads must cost far less than 10x
   wall (one Arrow parse pass + bounded per-stage aggregates; the
   checkpointed frames keep stage audits O(stages), not O(corpus)).
B. CCITT G4 decode is payload-I/O-bound like every codec lane: fax
   pages (200x1728 bilevel) decode linearly in page count under
   mapInPandas per-file isolation.
C. EXIF orientation is free next to the JPEG decode it rides: the
   APP1 parse + upright permutation adds no measurable wall over the
   same corpus without the tag.
D. Incremental connected components is batch-bounded, not
   history-bounded: per-batch ingest wall stays flat from batch 2 to
   batch 10 while total ingested edges grow 5x (the contraction
   graph is batch-sized; the upsert log append is O(affected)).
E. Group 3 fax pages decode linearly like G4 (lane B), in both the
   byte-aligned MH-RLE and EOL-framed layouts.
F. Incremental MinHash-LSH ingest is batch-bounded: per-batch wall
   flat from batch 2 to batch 8 while the postings index grows 4x,
   and a fixed query probe stays flat too (bucket-bounded join).

Usage: python scripts/scale_round12_ops.py
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


def _warc_payload(i: int) -> bytes:
    """One curation-corpus-shaped payload (warcinfo + two responses)."""
    def html(m):
        text = " ".join(
            f"S{(i * 5 + m * 3 + 7 * j) % 30} tok{j}" for j in range(4)
        )
        return (
            f"<html><head><title>T{i}x{m}</title></head>"
            f"<body><p>{text}. Copyright FooCorp.</p></body></html>"
        ).encode()

    recs = [
        {"warc_type": "warcinfo", "content_type": "application/warc-fields",
         "body": f"software: synthgen/{i}\r\n".encode()},
        {"warc_type": "response",
         "target_uri": f"HTTPS://Host{i % 50}.EX.COM:443/p{i}?b=1&a=2",
         "http_status": 404 if i % 6 == 5 else 200, "body": html(1)},
        {"warc_type": "response",
         "target_uri": f"https://host{i % 50}.ex.com/u{i}",
         "http_status": 200, "body": html(2)},
    ]
    return tx.warc_build(recs, gzip_per_record=i % 2 == 0)


def _funnel(spark, n: int) -> float:
    from pyspark.sql import Window

    rows = [(i, _warc_payload(i)) for i in range(n)]
    df = spark.createDataFrame(
        rows, "payload_id long, payload binary"
    ).repartition(32).localCheckpoint(eager=True)

    def run():
        recs = tx.warc_ingest(df).localCheckpoint(eager=True)
        ok = recs.filter(
            (F.col("warc_type") == "response")
            & (F.col("http_status") == 200)
        )
        ext = ok.select(
            "payload_id", "record_idx",
            tx.canonicalize_url(F.col("target_uri")).alias("url"),
            tx.strip_html(F.col("text")).alias("text"),
        ).localCheckpoint(eager=True)
        w = Window.partitionBy("url").orderBy("payload_id", "record_idx")
        kept = (
            ext.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1).drop("rn")
        )
        sents = kept.select(
            "payload_id", "record_idx",
            F.posexplode(tx.split_sentences(F.col("text"))).alias(
                "sent_idx", "sentence"
            ),
        )
        ws = Window.partitionBy("sentence").orderBy(
            "payload_id", "record_idx", "sent_idx"
        )
        per_doc = (
            sents.withColumn("rn", F.row_number().over(ws))
            .filter(F.col("rn") == 1)
            .groupBy("payload_id", "record_idx")
            .agg(F.count(F.lit(1)).alias("n_sents"))
        )
        per_doc.count()

    return timed(run)


def main() -> None:
    spark = get_spark(shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    print("== A: curation funnel — near-linear in payloads ==")
    for n in (500, 5000):
        print(f"  payloads={n}: {_funnel(spark, n):.2f} s")

    print("== B: CCITT G4 fax pages — linear decode ==")
    rng = np.random.RandomState(5)
    page = np.zeros((200, 1728), dtype=bool)
    page[40:60, 100:900] = True
    page[100:104, :] = True
    variants = []
    for v in range(8):
        p = page.copy()
        p[120 + v * 5 : 124 + v * 5, 200 : 1500] = True
        px = np.where(p, 0, 255).astype(np.uint8)
        variants.append(mm.encode_tiff(px, compression="g4"))
    for n in (200, 2000):
        rows = [
            (i, "image", variants[i % 8], "image/tiff", 1728, 200, None)
        for i in range(n)]
        media = mm._sized_media(spark, rows).repartition(32)
        media = media.localCheckpoint(eager=True)
        t = timed(lambda m=media: mm.decode_stats(m).count())
        print(f"  pages={n}: {t:.2f} s")

    print("== C: EXIF orientation is free next to the decode ==")
    jpegs_plain, jpegs_exif = [], []
    for i in range(64):
        _, _, px = mm._jpeg_block_values(i % 32)
        enc = mm.encode_jpeg(px)
        jpegs_plain.append(enc)
        jpegs_exif.append(mm.set_exif_orientation(enc, (i % 8) + 1))
    for name, payloads in (("plain", jpegs_plain), ("exif", jpegs_exif)):
        rows = [
            (i, "image", payloads[i % 64], "image/jpeg", 17, 9, None)
            for i in range(1500)
        ]
        media = mm._sized_media(spark, rows).repartition(32)
        media = media.localCheckpoint(eager=True)
        t = timed(lambda m=media: mm.decode_stats(m).count())
        print(f"  {name}: {t:.2f} s")

    print("== D: incremental CC — per-batch wall flat as history grows ==")
    from incremental_github_data_pipeline_spark.streaming import (
        run_incremental_cc_ingest,
    )

    tmp = tempfile.mkdtemp(prefix="scale_cc_")
    src, root, ckpt = f"{tmp}/src", f"{tmp}/cc", f"{tmp}/ckpt"
    schema = "id_a long, id_b long"
    n_edges = 20_000
    walls = []
    for b in range(10):
        # mostly-local merges: each batch links fresh nodes into small
        # chains plus a few cross-batch edges (the near-dup shape)
        base = b * n_edges
        edges = [(base + j, base + j + 1) for j in range(n_edges - 50)]
        edges += [(base + j, max(0, base + j - n_edges)) for j in range(50)]
        spark.createDataFrame(edges, schema).coalesce(4).write.mode(
            "append"
        ).parquet(src)
        t0 = time.time()
        run_incremental_cc_ingest(spark, src, root, ckpt, schema)
        walls.append(time.time() - t0)
    print(
        "  per-batch wall (b2, b5, b10): "
        f"{walls[1]:.2f} / {walls[4]:.2f} / {walls[9]:.2f} s "
        f"(total edges grew {10 * n_edges:,})"
    )
    shutil.rmtree(tmp, ignore_errors=True)

    print("== E: Group 3 fax pages — linear decode, both layouts ==")
    page = np.zeros((200, 1728), dtype=bool)
    page[40:60, 100:900] = True
    g3_variants = {
        "mh-rle": [], "eol": [],
    }
    for v in range(4):
        p2 = page.copy()
        p2[120 + v * 5 : 124 + v * 5, 200:1500] = True
        px = np.where(p2, 0, 255).astype(np.uint8)
        g3_variants["mh-rle"].append(mm.encode_tiff(px, compression="g3"))
        g3_variants["eol"].append(mm.encode_tiff(px, compression="g3_eol"))
    for name, payloads in g3_variants.items():
        for n in (200, 2000):
            rows = [(i, "image", payloads[i % 4], "image/tiff",
                     1728, 200, None) for i in range(n)]
            media = mm._sized_media(spark, rows).repartition(32)
            media = media.localCheckpoint(eager=True)
            t = timed(lambda m=media: mm.decode_stats(m).count())
            print(f"  {name} pages={n}: {t:.2f} s")

    print("== F: incremental LSH — per-batch flat, probe flat ==")
    from incremental_github_data_pipeline_spark.streaming import (
        lsh_candidates_versioned,
        run_incremental_lsh_ingest,
    )

    tmp = tempfile.mkdtemp(prefix="scale_lsh_")
    src_d, root, ckpt = f"{tmp}/src", f"{tmp}/lsh", f"{tmp}/ckpt"
    n_docs = 5_000
    walls = []
    for b in range(8):
        rows = [
            (b * n_docs + i,
             " ".join(f"w{(b * n_docs + i + j * 7) % 9000}"
                      for j in range(40)))
            for i in range(n_docs)
        ]
        spark.createDataFrame(
            rows, "doc_id long, text string"
        ).coalesce(2).write.mode("append").parquet(src_d)
        t0 = time.time()
        run_incremental_lsh_ingest(spark, src_d, root, ckpt)
        walls.append(time.time() - t0)
    print(
        f"  per-batch wall (b2, b5, b8): {walls[1]:.2f} / "
        f"{walls[4]:.2f} / {walls[7]:.2f} s "
        f"(index grew to {8 * n_docs:,} docs)"
    )
    queries = spark.createDataFrame(
        [(i, " ".join(f"w{(i + j * 7) % 9000}" for j in range(40)))
         for i in range(50)],
        "query_id long, qtext string",
    ).localCheckpoint(eager=True)

    def probe(version):
        return timed(
            lambda: lsh_candidates_versioned(
                spark, root, queries, version=version
            ).count()
        )

    print(
        f"  probe at v2: {probe(2):.2f} s, at v8: {probe(8):.2f} s"
    )
    shutil.rmtree(tmp, ignore_errors=True)

    spark.stop()


if __name__ == "__main__":
    main()
