#!/usr/bin/env python
"""Incremental-ANN scale sweep (VERDICT r5 task 6): measure the
streaming index-maintenance path
(``streaming.incremental.run_incremental_ann_ingest``) at growing
shard sizes, plus time-travel search latency across the resulting
versions.

Per scale: three JSONL embedding shards land one at a time; each
triggers one availableNow micro-batch that PQ-encodes the increment
with the PERSISTED codebooks (batch 1 trains them) and commits one
table version. Reported per batch: wall seconds and encoded
vectors/sec — batch 1 carries the one-time k-means training, batches
2-3 are the steady-state encode cost the 100 TB lifecycle pays per
crawl increment. Then ``ann_search_versioned`` runs against version 1,
version 2, and latest, timing each and checking the id horizon
(version v must only see vectors from batches ≤ v).

Usage: python scripts/scale_ann_ingest.py [SCALES...]   (default: 1 10)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_VECS_PER_SHARD = 2_000
DIM = 64
N_SHARDS = 3


def vec(i: int) -> list[float]:
    # deterministic integer lattice (engine-exact, no RNG)
    return [((i * 11 + d * 3) % 97) / 97.0 + 0.05 for d in range(DIM)]


def main() -> None:
    scales = [int(a) for a in sys.argv[1:]] or [1, 10]
    from incremental_github_data_pipeline_spark.session import get_spark
    from incremental_github_data_pipeline_spark.streaming.incremental import (
        ann_search_versioned,
        run_incremental_ann_ingest,
    )

    spark = get_spark()
    for scale in scales:
        n = BASE_VECS_PER_SHARD * scale
        work = tempfile.mkdtemp(prefix=f"annscale{scale}x_")
        src = os.path.join(work, "src")
        os.makedirs(src)
        root = os.path.join(work, "table")
        model = os.path.join(work, "model")
        ckpt = os.path.join(work, "ckpt")
        print(f"== scale {scale}x: {N_SHARDS} shards x {n} vecs, dim {DIM}")
        for b in range(N_SHARDS):
            lo, hi = b * n, (b + 1) * n
            with open(os.path.join(src, f"shard{b}.jsonl"), "w") as f:
                for i in range(lo, hi):
                    f.write(
                        json.dumps({"vec_id": i, "embedding": vec(i)}) + "\n"
                    )
            t0 = time.monotonic()
            run_incremental_ann_ingest(
                spark, src, root, model, ckpt, m_sub=8, ksub=16
            )
            dt = time.monotonic() - t0
            tag = "train+encode" if b == 0 else "encode"
            print(
                f"  batch {b + 1} ({tag}): {dt:6.2f}s  "
                f"{n / dt:9.0f} vec/s"
            )
        q = spark.createDataFrame(
            [(0, vec(5)), (1, vec(n + 7))],
            "query_id long, embedding array<double>",
        )
        for label, version, horizon in (
            ("v1", 1, n),
            ("v2", 2, 2 * n),
            ("latest", None, N_SHARDS * n),
        ):
            t0 = time.monotonic()
            rows = ann_search_versioned(
                spark, root, q, k=10, version=version
            ).collect()
            dt = time.monotonic() - t0
            assert rows and all(r["vec_id"] < horizon for r in rows), label
            print(
                f"  search {label:6s}: {dt:5.2f}s over "
                f"{horizon} vecs (k=10, 2 queries)"
            )
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
