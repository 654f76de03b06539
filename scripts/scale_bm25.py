#!/usr/bin/env python
"""Twelfth sweep: BM25 retrieval scaling (operators.text.bm25_topk).

Replicates sf0.1 documents Nx with offset doc_ids (replicas repeat the
vocabulary, so document frequencies grow Nx while the term TYPE count
stays fixed — the realistic shape: a bigger corpus does not invent a
bigger language) and times bm25_topk with a FIXED 8-query set.

What the sweep is meant to separate:
- index-build cost (tokenize + tf/df/dl aggregates) should grow
  linearly in corpus size — it is one corpus scan + content-keyed
  shuffles;
- the query-side join fan-out grows with the matched POSTINGS, not
  with corpus × queries — candidates per query are bounded by the
  postings of its terms. Replication makes every query term hit every
  replica, so candidates grow ~Nx here (worst case for a fixed query);
  the per-query top-k stays a window over its own candidates.

Usage: python scripts/scale_bm25.py [multiples...]  (default 1 10 50)
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from incremental_github_data_pipeline_spark.operators import text as tx  # noqa: E402
from incremental_github_data_pipeline_spark.session import get_spark  # noqa: E402
from incremental_github_data_pipeline_spark.sources.readers import read_table  # noqa: E402

SRC = "/root/testdata/sf0.1"
KEY_STRIDE = 10**9


def main() -> None:
    multiples = [int(a) for a in sys.argv[1:]] or [1, 10, 50]
    spark = get_spark(app_name="scale-bm25")
    spark.sparkContext.setLogLevel("ERROR")
    base = read_table(spark, SRC, "documents").select("doc_id", "text")
    queries = base.filter(F.col("doc_id") < 8).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("qtext")
    )
    queries.collect()  # warm the query side out of the timed region
    n_docs_base = base.count()

    for n in multiples:
        out = Path(f"/tmp/spark_graft_bm25_x{n}/documents.parquet")
        if not out.exists():
            rep = base.withColumn(
                "_rep", F.explode(F.array(*[F.lit(i) for i in range(n)]))
            )
            rep = rep.withColumn(
                "doc_id",
                F.col("doc_id") + F.col("_rep").cast("long") * KEY_STRIDE,
            )
            rep.drop("_rep").repartition(32).write.mode(
                "overwrite"
            ).parquet(str(out))
        docs = spark.read.parquet(str(out))
        t0 = time.time()
        res = tx.bm25_topk(docs, queries, k=10)
        rows = res.collect()
        wall = time.time() - t0
        # candidate volume: matched (query, doc) pairs pre-top-k
        print(
            f"x{n}: docs={n_docs_base * n:>8,}  wall={wall:6.2f}s  "
            f"result_rows={len(rows):>3}  "
            f"docs_per_s={n_docs_base * n / wall:>10,.0f}"
        )

    spark.stop()


if __name__ == "__main__":
    main()
