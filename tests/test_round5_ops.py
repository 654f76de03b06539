"""Round-5 operators: URL stats, weighted sampling, boilerplate lines,
inverted index, Gram matrix, ANN recall, integer EWMA, MAD outliers —
edge cases the sf0.01 oracles don't reach."""

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
from incremental_github_data_pipeline_spark.operators import (
    timeseries as ts,
)


def test_url_stats_strips_query_and_keys_by_host(spark):
    df = spark.createDataFrame(
        [
            (1, "see https://a.com/x?utm=1 and https://a.com/x?utm=2"),
            (2, "plain http://b.org/y no more"),
            (3, "no urls here"),
        ],
        "doc_id long, text string",
    )
    got = {r["domain"]: r for r in tx.url_stats(df).collect()}
    assert set(got) == {"a.com", "b.org"}
    # two URLs, same doc, ONE normalized form once the params drop
    assert got["a.com"]["n_urls"] == 2
    assert got["a.com"]["n_distinct_urls"] == 1
    assert got["a.com"]["n_docs"] == 1
    assert got["a.com"]["n_https"] == 2
    assert got["b.org"]["n_https"] == 0


def test_weighted_sample_prefers_heavy_rows_and_is_deterministic(spark):
    # 200 light rows (weight 1) + 200 heavy rows (weight 1000)
    df = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 200, 1).otherwise(1000).alias("w"),
    )
    s1 = tx.weighted_sample_priority(df, "doc_id", "w", k=50).collect()
    s2 = tx.weighted_sample_priority(df, "doc_id", "w", k=50).collect()
    assert [r["doc_id"] for r in s1] == [r["doc_id"] for r in s2]  # stable
    heavy = sum(1 for r in s1 if r["doc_id"] >= 200)
    assert heavy >= 45  # 1000x weight dominates a 50-row sample
    assert len(s1) == 50


def test_boilerplate_threshold_is_inclusive(spark):
    # line L in exactly 4 of 5 docs = 80% -> flagged at min_pct=80
    rows = [(i, "s", ("L | unique" + str(i)) if i < 4 else "unique4")
            for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r["line"] for r in tx.boilerplate_lines(df, min_pct=80).collect()}
    assert got == {"L"}
    got81 = {r["line"] for r in tx.boilerplate_lines(df, min_pct=81).collect()}
    assert got81 == set()


def test_inverted_index_postings_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a b b"), (3, "a")],
        "doc_id long, text string",
    )
    rows = tx.inverted_index(df, top_docs=2, min_df=2).collect()
    a = sorted((r["rank"], r["doc_id"], r["tf"]) for r in rows
               if r["term"] == "a")
    # tf ties (docs 2,3 both tf=1) break by doc_id
    assert a == [(1, 1, 2), (2, 2, 1)]
    b = {r["doc_id"]: r for r in rows if r["term"] == "b"}
    assert b[2]["rank"] == 1 and b[2]["df"] == 2 and b[2]["total_tf"] == 3


def test_gram_matrix_matches_numpy_lattice(spark):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(20, 8)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    got = {(r["di"], r["dj"]): r["dot"]
           for r in sim.gram_matrix(df, dims=8).collect()}
    q = np.floor(vecs.astype(np.float64) * 1000).astype(np.int64)
    g = q.T @ q
    for (i, j), dot in got.items():
        assert dot == g[i - 1, j - 1]
    assert len(got) == 36  # upper triangle only


def test_pooled_ann_recall_bounds_and_self_hit(spark):
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(60, 64)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.select(F.col("vec_id").alias("corpus_id"), "embedding")
    rows = sim.pooled_ann_recall(corpus, queries, k=5).collect()
    assert len(rows) == 4
    for r in rows:
        assert 0 <= r["n_overlap"] <= r["k"] == 5


def test_ewma_integer_recurrence_and_negative_guard(spark):
    df = spark.createDataFrame(
        [("k", i, x) for i, x in enumerate([100, 200, 50, 50])],
        "k string, i long, x long",
    )
    got = {r["i"]: r["ewma"]
           for r in ts.ewma_integer(df, "k", "i", "x").collect()}
    # r0=100; r1=(600+700)//10=130; r2=(150+910)//10=106; r3=(150+742)//10=89
    assert got == {0: 100, 1: 130, 2: 106, 3: 89}
    neg = spark.createDataFrame([("k", 0, -5)], "k string, i long, x long")
    with pytest.raises(Exception, match="non-negative"):
        ts.ewma_integer(neg, "k", "i", "x").collect()


def test_mad_outliers_lower_median_and_flags(spark):
    # values: 10,10,12,14,100 -> lower median 12 (rank (5+1)//2 = 3)
    # devs: 2,2,0,2,88 -> MAD = 2; outlier iff dev > 10 -> only 100
    df = spark.createDataFrame(
        [("k", v) for v in [10, 10, 12, 14, 100]], "k string, x long"
    )
    [r] = ts.mad_outliers(df, "k", "x", k=5).collect()
    assert (r["n"], r["med"], r["mad"], r["n_outliers"]) == (5, 12, 2, 1)


@pytest.mark.parametrize("gate", [200_000, 0])
def test_learn_bpe_merges_greedy_scan_and_tiebreak(spark, gate):
    # aaab x3 + aab x2 + ba x1: round 1 must pick (a,a) with count 8
    # (aaab contributes TWO overlapping (a,a) pairs x3), round 2 ties
    # (aa,a)=3 vs (a,b)=3 -> lexicographic pa picks (a,b), round 3 is
    # (aa,ab)=3 — each round exercises the greedy NON-overlapping fold
    # ("aaa" merges to [aa, a], never [aa, aa]). gate=0 forces the
    # distributed per-round path; the default takes the local fold.
    df = spark.createDataFrame(
        [(1, "aaab aaab aaab aab aab ba")], "doc_id long, text string"
    )
    rows = (
        tx.learn_bpe_merges(df, n_merges=3, local_vocab_max=gate)
        .orderBy("step")
        .collect()
    )
    assert [(r.step, r.pa, r.pb, r.cnt) for r in rows] == [
        (1, "a", "a", 8),
        (2, "a", "b", 3),
        (3, "aa", "ab", 3),
    ]


def test_learn_bpe_merges_stops_when_dry(spark):
    # single-char words: no adjacent pairs ever, zero merges learned
    df = spark.createDataFrame([(1, "a b c a b")], "doc_id long, text string")
    assert tx.learn_bpe_merges(df, n_merges=4).count() == 0


def test_negative_samples_ring_determinism_and_no_self(spark):
    df = spark.createDataFrame(
        [(i, f"d{i}") for i in range(40)], "doc_id long, text string"
    )
    anchors = df.filter(F.col("doc_id") < 8)
    out = tx.negative_samples(
        df, k=3, n_buckets=16, anchors=anchors
    ).collect()
    # deterministic: a second run returns the identical sample
    again = tx.negative_samples(
        df, k=3, n_buckets=16, anchors=anchors
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    for r in out:
        assert r.neg_id != r.doc_id          # no self-pairs
        assert 1 <= r.neg_rank <= 3
    # every anchor draws at most k negatives (self-bucket collisions
    # may drop one), and at least one anchor draws a full set
    per = {}
    for r in out:
        per.setdefault(r.doc_id, set()).add(r.neg_rank)
    assert all(len(v) <= 3 for v in per.values())
    assert any(len(v) == 3 for v in per.values())


def test_learn_bpe_vocab_segmentation(spark):
    # after merges (a,a) then (a,b) then (aa,ab): aaab collapses to a
    # single symbol (merge 3 joins its [aa, ab]), aab -> [aa, b],
    # ba -> [b, a]
    df = spark.createDataFrame(
        [(1, "aaab aaab aaab aab aab ba")], "doc_id long, text string"
    )
    _, vocab = tx.learn_bpe(df, n_merges=3)
    seg = {r["word"]: (r["freq"], list(r["syms"])) for r in vocab.collect()}
    assert seg == {
        "aaab": (3, ["aaab"]),
        "aab": (2, ["aa", "b"]),
        "ba": (1, ["b", "a"]),
    }


def test_learn_bpe_local_matches_distributed_1000_merges(spark):
    """n_merges=1000 on a corpus that dries up after a few dozen
    merges: the hybrid local-rounds gate and the distributed per-round
    path must take the same early-stop and produce bit-identical merge
    tables AND final segmentations (every word collapsed to one
    symbol)."""
    docs = [
        (i, t)
        for i, t in enumerate(
            [
                "banana bandana cabana",
                "analog alphabet banana",
                "cab cabana bandana dab",
                "alphabet analog dab banana",
            ]
        )
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    m_loc, v_loc = tx.learn_bpe(df, n_merges=1000)
    m_dist, v_dist = tx.learn_bpe(df, n_merges=1000, local_vocab_max=0)
    loc = [(r.step, r.pa, r.pb, r.cnt) for r in m_loc.orderBy("step").collect()]
    dist = [
        (r.step, r.pa, r.pb, r.cnt) for r in m_dist.orderBy("step").collect()
    ]
    assert loc == dist
    assert 0 < len(loc) < 1000  # dried up early on both paths
    seg_loc = {
        r["word"]: (r["freq"], list(r["syms"])) for r in v_loc.collect()
    }
    seg_dist = {
        r["word"]: (r["freq"], list(r["syms"])) for r in v_dist.collect()
    }
    assert seg_loc == seg_dist
    # fully trained: every word type is a single symbol
    assert all(len(syms) == 1 for _f, syms in seg_loc.values())


def test_bpe_tokenize_lookup_join_and_char_fallback(spark):
    """Apply-side tokenization: trained words segment via the vocab
    lookup; an unseen word falls back to character symbols; assembly
    preserves word order and empty docs vanish."""
    train = spark.createDataFrame(
        [(1, "aaab aaab aaab aab aab ba")], "doc_id long, text string"
    )
    _, vocab = tx.learn_bpe(train, n_merges=2)  # merges: (a,a), (a,b)
    apply_df = spark.createDataFrame(
        [(10, "aab ba aaab"), (11, "zzz aab"), (12, "   ")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: (r["n_words"], r["n_tokens"], r["bpe_text"])
        for r in tx.bpe_tokenize(apply_df, vocab).collect()
    }
    # after (a,a) and (a,b): aab -> [aa, b]; ba -> [b, a];
    # aaab -> [aa, ab]; zzz is unseen -> [z, z, z]
    assert rows == {
        10: (3, 6, "aa b b a aa ab"),
        11: (2, 5, "z z z aa b"),
    }
