#!/usr/bin/env python
"""Versioned search-index end-to-end sweep (VERDICT r8 task 5): the
one new r8/r9 design claim without a measured row is "query-time work
is independent of how many increments built the index". This script
ingests the SAME corpus through ``run_incremental_index_ingest`` split
into B ∈ {1, 4, 16} micro-batches (separate index roots, identical
final content), then times ``bm25_search_versioned`` (the r9
doclens-joined serving path — doc lengths come from the lockstep
``doclens/`` delta table, never a re-aggregate of the token-level
postings) against each index with a fixed query set. It then runs
``compact_index`` on the most-fragmented index (B=16) and re-times
serving, reporting the postings part count and how many parts a
point-term search must open before/after (the manifest min/max skip).

Expected shape: ingest wall grows ~linearly with B (per-batch session
overhead — the price of incrementality, paid at write time), serving
wall stays FLAT in B up to small-file overhead, and compaction removes
that overhead while restoring point-term part pruning. Rankings are
asserted identical across all index layouts.

Usage: python scripts/scale_index_serving.py [SCALES...]  (default: 1 10)
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_DOCS = 2_000
WORDS_PER_DOC = 20
VOCAB = 500
BATCH_COUNTS = [1, 4, 16]
N_QUERIES = 8


def text(i: int) -> str:
    # deterministic word soup over a bounded vocabulary (no RNG)
    return " ".join(
        f"w{(i * 13 + j * 7) % VOCAB:04d}" for j in range(WORDS_PER_DOC)
    )


def main() -> None:
    scales = [int(a) for a in sys.argv[1:]] or [1, 10]
    from incremental_github_data_pipeline_spark.session import get_spark
    from incremental_github_data_pipeline_spark.sources.versioned import (
        _files_and_stats,
        _load_manifest,
        latest_version,
    )
    from incremental_github_data_pipeline_spark.streaming.incremental import (
        bm25_search_versioned,
        compact_index,
        run_incremental_index_ingest,
    )

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    from pathlib import Path

    def postings_parts(root: str, term: str) -> tuple[int, int]:
        m = _load_manifest(
            Path(root) / "postings", latest_version(f"{root}/postings")
        )
        _, stats = _files_and_stats(m)
        survive = sum(
            1
            for b in stats.values()
            if "term" not in b
            or b["term"][0] is None
            or (b["term"][0] <= term <= b["term"][1])
        )
        return survive, len(stats)

    for scale in scales:
        n = BASE_DOCS * scale
        queries = spark.createDataFrame(
            [(q, text(q * 37)) for q in range(N_QUERIES)],
            "query_id long, qtext string",
        )
        print(f"== scale {scale}x: {n} docs, vocab {VOCAB}")
        rankings = {}
        roots = {}
        for nb in BATCH_COUNTS:
            work = tempfile.mkdtemp(prefix=f"idxserve{scale}x{nb}b_")
            src = os.path.join(work, "docs")
            root = os.path.join(work, "index")
            ckpt = os.path.join(work, "ckpt")
            roots[nb] = (work, root)
            per = n // nb
            t0 = time.time()
            for b in range(nb):
                spark.createDataFrame(
                    [(i, text(i)) for i in range(b * per, (b + 1) * per)],
                    "doc_id long, text string",
                ).coalesce(1).write.mode("append").parquet(src)
                run_incremental_index_ingest(spark, src, root, ckpt)
            ingest = time.time() - t0

            bm25_search_versioned(spark, root, queries, k=10).count()
            walls = []
            for _ in range(3):
                t0 = time.time()
                bm25_search_versioned(spark, root, queries, k=10).count()
                walls.append(time.time() - t0)
            serve = statistics.median(walls)
            rankings[nb] = {
                tuple(r)
                for r in bm25_search_versioned(
                    spark, root, queries, k=10
                ).select("query_id", "rank", "doc_id").collect()
            }
            s, t = postings_parts(root, "w0250")
            print(
                f"  B={nb:3d}: ingest {ingest:6.2f} s "
                f"serve {serve:6.3f} s  point-term parts {s}/{t}"
            )
        assert rankings[1] == rankings[4] == rankings[16] and rankings[1], (
            "ranking must be independent of index layout"
        )

        # compact the most fragmented layout and re-serve
        work, root = roots[16]
        t0 = time.time()
        compact_index(spark, root, target_partitions=4)
        cwall = time.time() - t0
        bm25_search_versioned(spark, root, queries, k=10).count()
        walls = []
        for _ in range(3):
            t0 = time.time()
            bm25_search_versioned(spark, root, queries, k=10).count()
            walls.append(time.time() - t0)
        s, t = postings_parts(root, "w0250")
        print(
            f"  B=16 post-compaction: compact {cwall:5.2f} s "
            f"serve {statistics.median(walls):6.3f} s  "
            f"point-term parts {s}/{t}"
        )
        after = {
            tuple(r)
            for r in bm25_search_versioned(spark, root, queries, k=10)
            .select("query_id", "rank", "doc_id")
            .collect()
        }
        assert after == rankings[16], "compaction must not change ranking"
        for work, _ in roots.values():
            shutil.rmtree(work, ignore_errors=True)

    spark.stop()


if __name__ == "__main__":
    main()
