#!/usr/bin/env python
"""Twelfth sweep, part B: ``streaming.session_attribution`` state
eviction under key churn.

The operator keeps ONE state row per user key (pending impressions +
open sessions inside it), so the memory claim to verify is not
items-per-key (micro at any rate) but that state KEYS are bounded by
the users ACTIVE within the event-time window — i.e. that
``state.remove()`` really fires once a key's impressions resolve and
its sessions finalize, and quiet keys do not accumulate for the life
of the stream.

Design: N_SHARDS chronological shards, each using a DISJOINT user
range (full churn — the worst case for a keyed store: every shard
introduces new keys and abandons old ones). If eviction works,
``numRowsTotal`` stays ~flat at the per-shard user count (+ the
not-yet-resolved previous shard) instead of climbing to
shards x users. A final far-future sentinel closes everything; the
folded output must equal the batch twin on the same data.

Usage: python scripts/scale_session_attr.py [multiples...] (default 1 10)
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GAP_MIN = 5
HORIZON_MIN = 10
WATERMARK_MIN = 5
SPAN_MIN = 20
N_SHARDS = 5


def run(spark, mult: int) -> dict:
    from pyspark.sql import functions as F  # noqa: F401

    from incremental_github_data_pipeline_spark.streaming import (
        session_attribution,
    )

    rate = 10 * mult  # events/min; impressions at rate/5
    users_per_shard = 25 * mult
    t0 = dt.datetime(2024, 6, 1)
    base = tempfile.mkdtemp(prefix=f"sess_attr_{mult}x_")
    imp_src, evt_src = f"{base}/imp", f"{base}/evt"
    ckpt, sink = f"{base}/ckpt", f"{base}/out"
    imp_schema = "impression_id long, user_id long, imp_ts timestamp"
    evt_schema = "event_id long, user_id long, ts timestamp"

    all_imp, all_evt = [], []
    for shard in range(N_SHARDS):
        rows_i, rows_e = [], []
        u0 = shard * users_per_shard  # disjoint per shard: full churn
        for minute in range(shard * SPAN_MIN, (shard + 1) * SPAN_MIN):
            for j in range(rate):
                eid = minute * rate + j
                ts = t0 + dt.timedelta(
                    minutes=minute, seconds=60 * j // rate
                )
                uid = u0 + eid % users_per_shard
                rows_e.append((eid, uid, ts))
                if j % 5 == 0:
                    rows_i.append((eid, uid, ts))
        spark.createDataFrame(rows_i, imp_schema).coalesce(1).write.mode(
            "append"
        ).parquet(imp_src)
        spark.createDataFrame(rows_e, evt_schema).coalesce(1).write.mode(
            "append"
        ).parquet(evt_src)
        all_imp += rows_i
        all_evt += rows_e
    sentinel = (
        10**9,
        10**6,
        t0 + dt.timedelta(days=10),
    )
    spark.createDataFrame([sentinel], evt_schema).coalesce(1).write.mode(
        "append"
    ).parquet(evt_src)
    all_evt.append(sentinel)

    imps = (
        spark.readStream.schema(imp_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(imp_src)
    )
    evts = (
        spark.readStream.schema(evt_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(evt_src)
    )
    t_start = time.time()
    q = (
        session_attribution(
            imps,
            evts,
            gap=f"{GAP_MIN} minutes",
            horizon=f"{HORIZON_MIN} minutes",
            watermark=f"{WATERMARK_MIN} minutes",
            how="left_outer",
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
    got = {
        tuple(r)
        for r in spark.read.parquet(sink)
        .select("impression_id", "session_start", "n_session_events")
        .collect()
    }
    batch = session_attribution(
        spark.createDataFrame(all_imp, imp_schema),
        spark.createDataFrame(all_evt, evt_schema),
        gap=f"{GAP_MIN} minutes",
        horizon=f"{HORIZON_MIN} minutes",
        how="left_outer",
        tiebreak_col="event_id",
    )
    want = {
        tuple(r)
        for r in batch.select(
            "impression_id", "session_start", "n_session_events"
        ).collect()
    }
    assert got == want, (
        f"stream != batch at {mult}x: {len(got)} vs {len(want)} rows"
    )
    shutil.rmtree(base, ignore_errors=True)
    return {
        "mult": mult,
        "rate_per_min": rate,
        "total_users": users_per_shard * N_SHARDS,
        "users_per_shard": users_per_shard,
        "state_keys_per_batch": state_rows,
        "state_max": max(state_rows),
        "out_rows": len(got),
        "wall_s": round(wall, 1),
    }


def main() -> None:
    from incremental_github_data_pipeline_spark.session import get_spark

    multiples = [int(a) for a in sys.argv[1:]] or [1, 10]
    spark = get_spark(app_name="scale-session-attr")
    spark.sparkContext.setLogLevel("ERROR")
    for m in multiples:
        r = run(spark, m)
        print(
            f"x{m}: rate={r['rate_per_min']}/min  "
            f"users total={r['total_users']} per-shard={r['users_per_shard']}  "
            f"state keys per batch={r['state_keys_per_batch']}  "
            f"max={r['state_max']}  out={r['out_rows']}  wall={r['wall_s']}s"
        )
    spark.stop()


if __name__ == "__main__":
    main()
