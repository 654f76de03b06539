"""Round-9 operators: WordPiece tokenizer training (the third
tokenizer family; oracle queries q_wordpiece_merges/_vocab cover the
bulk path — these pin the scoring semantics and the hybrid-path
agreement)."""

from __future__ import annotations

import pytest

from incremental_github_data_pipeline_spark.operators import text as tx

S = 10**12  # _WP_SCORE_SCALE


@pytest.mark.parametrize("gate", [200_000, 0])
def test_wordpiece_likelihood_argmax_differs_from_bpe(spark, gate):
    """'xy'x4 + 'qz'x1: BPE picks (x,y) (count 4), WordPiece must pick
    (q,z) first — count 1 but score 1·S/(1·1) = S beats 4·S/16 = S/4.
    Round 2 then merges (x,y) at S/4. gate=0 forces the distributed
    DECIMAL-div path; default takes the local Python-int fold — both
    must agree exactly."""
    df = spark.createDataFrame(
        [(1, "xy xy xy xy qz")], "doc_id long, text string"
    )
    merges, vocab = tx.learn_wordpiece(
        df, n_merges=2, local_vocab_max=gate
    )
    rows = [(r.step, r.pa, r.pb, r.cnt, r.score_s) for r in merges.orderBy("step").collect()]
    assert rows == [
        (1, "q", "z", 1, S),
        (2, "x", "y", 4, S // 4),
    ]
    seg = {r["word"]: list(r["syms"]) for r in vocab.collect()}
    assert seg == {"xy": ["xy"], "qz": ["qz"]}
    # BPE on the same corpus picks the frequent pair first
    bpe = tx.learn_bpe_merges(df, n_merges=1).collect()
    assert (bpe[0].pa, bpe[0].pb) == ("x", "y")


def test_wordpiece_local_matches_distributed(spark):
    """Hybrid-path agreement on a nontrivial corpus: 12 merges learned
    locally and via the distributed per-round loop must be identical
    tuples including scores (the DECIMAL div / Python // parity)."""
    text = " ".join(
        ["banana"] * 9 + ["bandana"] * 4 + ["ananas"] * 6 + ["nasal"] * 3
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    loc, _ = tx.learn_wordpiece(df, n_merges=12)
    dist, _ = tx.learn_wordpiece(df, n_merges=12, local_vocab_max=0)
    as_tuples = lambda m: [
        (r.step, r.pa, r.pb, r.cnt, r.score_s)
        for r in m.orderBy("step").collect()
    ]
    got_loc, got_dist = as_tuples(loc), as_tuples(dist)
    assert got_loc == got_dist and len(got_loc) == 12


def test_wordpiece_vocab_feeds_family_agnostic_apply(spark):
    """The trained vocab plugs into bpe_tokenize (word→syms lookup
    join) unchanged — the apply path is tokenizer-family-agnostic."""
    df = spark.createDataFrame(
        [(1, "xy xy xy xy qz")], "doc_id long, text string"
    )
    _, vocab = tx.learn_wordpiece(df, n_merges=2)
    out = {
        r["doc_id"]: r
        for r in tx.bpe_tokenize(
            spark.createDataFrame([(7, "qz xy")], "doc_id long, text string"),
            vocab,
        ).collect()
    }
    assert out[7]["n_tokens"] == 2  # both words fully merged


def test_wordpiece_stops_when_dry(spark):
    df = spark.createDataFrame([(1, "a b c a b")], "doc_id long, text string")
    merges, _ = tx.learn_wordpiece(df, n_merges=4)
    assert merges.count() == 0
