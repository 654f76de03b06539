#!/usr/bin/env python
"""Eleventh SCALE sweep (VERDICT r6 task 3 / r7 task 4): measure the
two round-6 operators whose scale behavior was still a design claim.

Part A — ``streaming.attribution_join`` state bound at 1x/10x rates:
drive a real availableNow streaming query over chronologically sharded
parquet (maxFilesPerTrigger=1 -> one micro-batch per shard, watermark
advances between batches) and read the state-store row counts from
``query.recentProgress``. The claim under test: join state is bounded
by arrival rate x (watermark + horizon), NOT by stream length — so
per-batch state must go FLAT after the warm-up batches and scale
~linearly in the rate, staying under the analytic ceiling

    rate_imp x (watermark + horizon + span) +
    rate_clk x (watermark + span)

(span = one shard's event-time coverage: rows from the newest batch
are not yet past the watermark; trail = the click-lag spread, which
widens each side's live event-time window by up to that much).

Part B — ``operators.text.bpe_tokenize`` at 1x/10x/50x corpus:
vocabulary is trained ONCE on the 1x corpus (train-at-ingest; apply is
the hot path), then the apply side is timed at each multiple. The
claim: apply cost is linear in corpus size (broadcast vocab join + one
reassembly shuffle), so docs/s should hold or improve with scale.

Usage: python scripts/scale_stream_bpe.py
Writes human-readable results to stdout; paste into SCALE.md.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WATERMARK_MIN = 5
HORIZON_MIN = 10
SPAN_MIN = 20  # event-time minutes covered by each shard
TRAIL_MIN = 8  # clicks trail their impression by 0..TRAIL_MIN minutes
N_SHARDS = 6


def part_a(spark, mult: int) -> dict:
    from incremental_github_data_pipeline_spark.streaming import (
        attribution_join,
    )

    rate = 10 * mult  # events/min per side
    t0 = dt.datetime(2024, 6, 1)
    base = tempfile.mkdtemp(prefix=f"attr_scale_{mult}x_")
    imp_src, clk_src = f"{base}/imp", f"{base}/clk"
    ckpt, sink = f"{base}/ckpt", f"{base}/out"
    imp_schema = "impression_id long, user_id long, imp_ts timestamp"
    clk_schema = "click_id long, user_id long, click_ts timestamp"
    n_users = 50 * mult
    for shard in range(N_SHARDS):
        rows_i, rows_c = [], []
        for minute in range(shard * SPAN_MIN, (shard + 1) * SPAN_MIN):
            for j in range(rate):
                eid = minute * rate + j
                ts = t0 + dt.timedelta(minutes=minute, seconds=60 * j // rate)
                rows_i.append((eid, eid % n_users, ts))
                # clicks trail impressions by 0-8 minutes
                rows_c.append(
                    (
                        eid,
                        eid % n_users,
                        ts + dt.timedelta(minutes=eid % (TRAIL_MIN + 1)),
                    )
                )
        spark.createDataFrame(rows_i, imp_schema).coalesce(1).write.mode(
            "append"
        ).parquet(imp_src)
        spark.createDataFrame(rows_c, clk_schema).coalesce(1).write.mode(
            "append"
        ).parquet(clk_src)

    imps = (
        spark.readStream.schema(imp_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(imp_src)
    )
    clks = (
        spark.readStream.schema(clk_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(clk_src)
    )
    t_start = time.time()
    q = (
        attribution_join(
            imps,
            clks,
            on="user_id",
            imp_ts="imp_ts",
            click_ts="click_ts",
            horizon=f"{HORIZON_MIN} minutes",
            how="left_outer",
            watermark=f"{WATERMARK_MIN} minutes",
        )
        .writeStream.foreachBatch(
            lambda bdf, _bid: bdf.write.mode("append").parquet(sink)
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.time() - t_start
    state_rows = [
        so["numRowsTotal"]
        for p in q.recentProgress
        for so in p["stateOperators"]
        if so["numRowsTotal"] is not None
    ]
    out_rows = spark.read.parquet(sink).count()
    # analytic ceiling (see module docstring): each side's live
    # window = watermark lag + its retention horizon + one not-yet-
    # watermarked shard span, widened by the click trail (impressions
    # stay joinable to trailing clicks; the watermark itself lags by
    # the trailing click times)
    ceiling = rate * (
        WATERMARK_MIN + HORIZON_MIN + SPAN_MIN + TRAIL_MIN
    ) + rate * (WATERMARK_MIN + SPAN_MIN + TRAIL_MIN)
    shutil.rmtree(base, ignore_errors=True)
    return {
        "mult": mult,
        "rate_per_min": rate,
        "events_per_side": rate * SPAN_MIN * N_SHARDS,
        "state_per_batch": state_rows,
        "state_max": max(state_rows),
        "ceiling": ceiling,
        "out_rows": out_rows,
        "wall_s": round(wall, 1),
    }


def part_b(spark) -> list[dict]:
    from pyspark.sql import functions as F

    from incremental_github_data_pipeline_spark.operators import text as tx

    docs = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .select("doc_id", "text")
        .cache()
    )
    n1 = docs.count()
    merges, vocab = tx.learn_bpe(docs, n_merges=200)
    vocab = vocab.cache()
    vocab.count()
    results = []
    for mult in (1, 10, 50):
        corpus = (
            docs.crossJoin(
                spark.range(mult).select(F.col("id").alias("_rep"))
            ).select(
                (F.col("doc_id") * mult + F.col("_rep")).alias("doc_id"),
                "text",
            )
            if mult > 1
            else docs
        )
        # warm-up then timed
        tx.bpe_tokenize(corpus, vocab).count()
        t0 = time.time()
        out_n = tx.bpe_tokenize(corpus, vocab).count()
        wall = time.time() - t0
        results.append(
            {
                "mult": mult,
                "docs": n1 * mult,
                "out_rows": out_n,
                "wall_s": round(wall, 2),
                "docs_per_s": int(n1 * mult / wall),
            }
        )
    return results


def main() -> None:
    from incremental_github_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="scale-stream-bpe")
    spark.sparkContext.setLogLevel("ERROR")
    print("== Part A: attribution_join state bound ==")
    for mult in (1, 10):
        r = part_a(spark, mult)
        print(r)
        assert r["state_max"] <= r["ceiling"], (
            f"state {r['state_max']} exceeds analytic ceiling {r['ceiling']}"
        )
    print("== Part B: bpe_tokenize corpus scaling ==")
    for r in part_b(spark):
        print(r)


if __name__ == "__main__":
    main()
