"""Round-7 advisor fixes: pooled-recall block clamp, BPE symbol-mass
gate, per-scan JPEG table state. Edge cases the sf0.01 oracles don't
reach."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from incremental_github_data_pipeline_spark.operators import (
    similarity as sim,
)
from incremental_github_data_pipeline_spark.operators import (
    text as tx,
)


def test_pooled_ann_recall_clamps_blocks_to_dim(spark):
    """dim=4 < n_blocks=8: the sketch clamps to one component per
    block, so the pooled ranking IS the exact ranking — recall@k must
    be perfect, not the degenerate 7-empty-blocks sketch the pre-r7
    code silently produced."""
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(30, 4)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.select(F.col("vec_id").alias("corpus_id"), "embedding")
    rows = sim.pooled_ann_recall(corpus, queries, k=5, n_blocks=8).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["n_overlap"] == r["k"] == 5


def test_learn_bpe_syms_gate_reroutes_to_distributed(spark, monkeypatch):
    """The local-fold gate bounds COLLECTED driver bytes (total
    symbols), not just word-type count: few-but-huge word types must
    take the distributed path even though n_types is tiny."""
    df = spark.createDataFrame(
        [(1, "abcd" * 25 + " " + "bcda" * 25)], "doc_id long, text string"
    )

    def boom(*_a, **_k):  # pragma: no cover - failure path
        raise AssertionError("local path taken despite syms gate")

    monkeypatch.setattr(tx, "_learn_bpe_local", boom)
    merges, vocab = tx.learn_bpe(df, n_merges=2, local_syms_max=50)
    assert merges.count() == 2  # distributed path ran the rounds
    assert vocab.count() == 2  # two word types survive either path


def test_learn_bpe_syms_gate_passes_small_corpora(spark):
    """Default gates keep small corpora on the local fold and the
    result is unchanged (agreement with the distributed path is pinned
    separately at n_merges=1000 in test_round5_ops)."""
    df = spark.createDataFrame(
        [(1, "aaab aaab aab")], "doc_id long, text string"
    )
    rows = tx.learn_bpe_merges(df, n_merges=1).orderBy("step").collect()
    assert [(r.step, r.pa, r.pb) for r in rows] == [(1, "a", "a")]
