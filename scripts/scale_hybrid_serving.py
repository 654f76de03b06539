#!/usr/bin/env python
"""Fused versioned-serving sweep (VERDICT r9 task 5 — sweep 17):
sweep 14 measured the BM25 lane of versioned serving in isolation;
``hybrid_search_versioned`` (lex + ANN + RRF fusion) had the
one-shot≡incremental unit test but no scale row. This script ingests
the SAME corpus through BOTH lanes — text via
``run_incremental_index_ingest`` (four lockstep delta tables), vectors
via ``run_incremental_ann_ingest`` (PQ codes, codebooks trained ONCE
and shared across layouts, the production train-once lifecycle) —
split into B ∈ {1, 16} micro-batches, then times the fused
``hybrid_search_versioned`` top-k against each layout. It then
compacts BOTH indexes on the fragmented layout (``compact_index`` for
the text root, ``versioned.compact`` for the ANN root) and re-times.

Expected shape: fused serving wall FLAT in B up to small-file
overhead; compaction removes that overhead and restores the postings
point-term part pruning; fused rankings identical across every layout
and across compaction (same codebooks, same BM25 statistics — the
docstring's claim, asserted).

Usage: python scripts/scale_hybrid_serving.py [SCALES...] (default: 1 10)
"""

from __future__ import annotations

import json
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
DIM = 32
BATCH_COUNTS = [1, 16]
N_QUERIES = 8


def text(i: int) -> str:
    return " ".join(
        f"w{(i * 13 + j * 7) % VOCAB:04d}" for j in range(WORDS_PER_DOC)
    )


def vec(i: int) -> list[float]:
    # deterministic integer lattice (engine-exact, no RNG)
    return [((i * 11 + d * 3) % 97) / 97.0 + 0.05 for d in range(DIM)]


def main() -> None:
    scales = [int(a) for a in sys.argv[1:]] or [1, 10]
    from pathlib import Path

    from incremental_github_data_pipeline_spark.session import get_spark
    from incremental_github_data_pipeline_spark.sources.versioned import (
        _files_and_stats,
        _load_manifest,
        compact,
        latest_version,
    )
    from incremental_github_data_pipeline_spark.streaming.incremental import (
        compact_index,
        hybrid_search_versioned,
        run_incremental_ann_ingest,
        run_incremental_index_ingest,
    )

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

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
            [(q, text(q * 37), vec(q * 53)) for q in range(N_QUERIES)],
            "query_id long, qtext string, embedding array<double>",
        )
        print(f"== scale {scale}x: {n} docs, vocab {VOCAB}, dim {DIM}")
        rankings = {}
        roots = {}
        model = None  # trained by the B=1 run, REUSED by B=16
        for nb in BATCH_COUNTS:
            work = tempfile.mkdtemp(prefix=f"hybserve{scale}x{nb}b_")
            src_t = os.path.join(work, "docs")
            src_v = os.path.join(work, "vecs")
            os.makedirs(src_v)
            idx_root = os.path.join(work, "index")
            ann_root = os.path.join(work, "ann")
            if model is None:
                model = os.path.join(work, "model")
            roots[nb] = (work, idx_root, ann_root)
            per = n // nb
            t0 = time.time()
            for b in range(nb):
                lo, hi = b * per, (b + 1) * per
                spark.createDataFrame(
                    [(i, text(i)) for i in range(lo, hi)],
                    "doc_id long, text string",
                ).coalesce(1).write.mode("append").parquet(src_t)
                run_incremental_index_ingest(
                    spark, src_t, idx_root, os.path.join(work, "ckpt_t")
                )
                with open(os.path.join(src_v, f"shard{b}.jsonl"), "w") as f:
                    for i in range(lo, hi):
                        f.write(
                            json.dumps(
                                {"vec_id": i, "embedding": vec(i)}
                            )
                            + "\n"
                        )
                run_incremental_ann_ingest(
                    spark,
                    src_v,
                    ann_root,
                    model,
                    os.path.join(work, "ckpt_v"),
                    m_sub=8,
                    ksub=16,
                )
            ingest = time.time() - t0

            def serve():
                return hybrid_search_versioned(
                    spark, idx_root, ann_root, queries, k=10, lane_k=20
                )

            serve().count()
            walls = []
            for _ in range(3):
                t0 = time.time()
                serve().count()
                walls.append(time.time() - t0)
            rankings[nb] = {
                tuple(r)
                for r in serve()
                .select("query_id", "rank", "doc_id")
                .collect()
            }
            s, t = postings_parts(idx_root, "w0250")
            ann_parts = len(
                _files_and_stats(
                    _load_manifest(Path(ann_root), latest_version(ann_root))
                )[0]
            )
            print(
                f"  B={nb:3d}: ingest {ingest:6.2f} s "
                f"fused serve {statistics.median(walls):6.3f} s  "
                f"point-term parts {s}/{t}  ann parts {ann_parts}"
            )
        assert rankings[1] == rankings[16] and rankings[1], (
            "fused ranking must be independent of index layout "
            "(same codebooks, same BM25 statistics)"
        )

        # compact BOTH indexes on the fragmented layout, re-serve
        work, idx_root, ann_root = roots[16]
        t0 = time.time()
        compact_index(spark, idx_root, target_partitions=4)
        compact(spark, ann_root, target_partitions=4)
        cwall = time.time() - t0

        def serve():
            return hybrid_search_versioned(
                spark, idx_root, ann_root, queries, k=10, lane_k=20
            )

        serve().count()
        walls = []
        for _ in range(3):
            t0 = time.time()
            serve().count()
            walls.append(time.time() - t0)
        s, t = postings_parts(idx_root, "w0250")
        ann_parts = len(
            _files_and_stats(
                _load_manifest(Path(ann_root), latest_version(ann_root))
            )[0]
        )
        print(
            f"  B=16 post-compaction: compact {cwall:5.2f} s "
            f"fused serve {statistics.median(walls):6.3f} s  "
            f"point-term parts {s}/{t}  ann parts {ann_parts}"
        )
        after = {
            tuple(r)
            for r in serve().select("query_id", "rank", "doc_id").collect()
        }
        assert after == rankings[16], "compaction must not change ranking"
        for work, _, _ in roots.values():
            shutil.rmtree(work, ignore_errors=True)

    spark.stop()


if __name__ == "__main__":
    main()
