#!/usr/bin/env python
"""Thirteenth sweep: unigram-LM tokenizer training cost vs corpus size.

The design claim to measure: after the single corpus scan that builds
the word-TYPE frequency table, every EM iteration (and the final
Viterbi) runs over word types, not corpus tokens — so training cost
should be FLAT as the corpus grows with a fixed vocabulary (the
replication worst case: types constant, frequencies × N), and grow
only with the type table when genuinely new words appear.

Usage: python scripts/scale_unigram.py [multiples...] (default 1 10 50)
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


def main() -> None:
    multiples = [int(a) for a in sys.argv[1:]] or [1, 10, 50]
    spark = get_spark(app_name="scale-unigram")
    spark.sparkContext.setLogLevel("ERROR")
    base = read_table(spark, SRC, "documents").select("doc_id", "text")
    n_base = base.count()

    for n in multiples:
        out = Path(f"/tmp/spark_graft_unigram_x{n}/documents.parquet")
        if not out.exists():
            rep = base.withColumn(
                "_rep", F.explode(F.array(*[F.lit(i) for i in range(n)]))
            ).withColumn(
                "doc_id",
                F.col("doc_id") + F.col("_rep").cast("long") * 10**9,
            )
            rep.drop("_rep").repartition(32).write.mode(
                "overwrite"
            ).parquet(str(out))
        docs = spark.read.parquet(str(out))
        t0 = time.time()
        vocab, pieces = tx.learn_unigram(
            docs, vocab_size=256, n_iters=2, max_piece_len=4,
            seed_size=1024,
        )
        n_types = vocab.count()
        n_pieces = pieces.count()
        wall = time.time() - t0
        print(
            f"x{n}: docs={n_base * n:>8,}  word_types={n_types:>7,}  "
            f"pieces={n_pieces}  wall={wall:6.2f}s"
        )

    spark.stop()


if __name__ == "__main__":
    main()
