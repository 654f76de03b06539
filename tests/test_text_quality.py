"""Repetition signals, decontamination, top-terms, vocab stats
(operators/text.py additions; SURVEY.md §2.10 text analysis)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from incremental_github_data_pipeline_spark.operators import text as tx


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# Repetition features
# ---------------------------------------------------------------------------


def test_dup_word_ratio_known_values(spark):
    df = _docs(
        spark,
        [
            (1, "a b c d"),        # all distinct -> 0.0
            (2, "a a a a"),        # 1 distinct of 4 -> 0.75
            (3, "a b a b"),        # 2 distinct of 4 -> 0.5
            (4, ""),               # empty -> 0.0 (not NULL, not NaN)
        ],
    )
    got = {
        r["doc_id"]: r["r"]
        for r in df.select("doc_id", tx.dup_word_ratio("text").alias("r")).collect()
    }
    assert got == {1: 0.0, 2: 0.75, 3: 0.5, 4: 0.0}


def test_top_bigram_ratio_known_values(spark):
    df = _docs(
        spark,
        [
            (1, "a b a b a"),  # bigrams: ab ba ab ba -> top 2/4 = 0.5
            (2, "a b c d"),    # all bigrams distinct -> 1/3
            (3, "x"),          # <2 tokens -> no bigrams -> 0.0
        ],
    )
    got = {
        r["doc_id"]: r["r"]
        for r in df.select(
            "doc_id", tx.top_ngram_ratio("text", 2).alias("r")
        ).collect()
    }
    assert got[1] == 0.5
    assert got[2] == pytest.approx(1 / 3)
    assert got[3] == 0.0


def test_ngrams_short_doc_empty_not_fallback(spark):
    # ngrams() must NOT inherit shingles()'s whole-doc fallback: a
    # 1-token doc has no bigrams, so it cannot look self-repetitive.
    df = _docs(spark, [(1, "solo")])
    [row] = df.select(tx.ngrams("text", 2).alias("g")).collect()
    assert row["g"] == []


# ---------------------------------------------------------------------------
# Decontamination
# ---------------------------------------------------------------------------


def test_contaminated_ids_flags_only_overlapping(spark):
    bench = _docs(spark, [(100, "the quick brown fox jumps over the lazy dog")])
    corpus = _docs(
        spark,
        [
            (1, "intro text then quick brown fox jumps over and more"),  # shares 5-gram
            (2, "completely different words with no overlap at all"),
            (3, "the quick brown fox jumps"),  # exactly one shared 5-gram
        ],
    )
    hits = sorted(
        r["doc_id"]
        for r in tx.contaminated_ids(corpus, bench, k=5).collect()
    )
    assert hits == [1, 3]


def test_contaminated_ids_short_doc_exact_match_only(spark):
    # Docs shorter than k fall back to whole-text shingle: flagged only
    # on exact text equality with a benchmark short doc.
    bench = _docs(spark, [(100, "tiny doc")])
    corpus = _docs(spark, [(1, "tiny doc"), (2, "tiny dog")])
    hits = [r["doc_id"] for r in tx.contaminated_ids(corpus, bench, k=5).collect()]
    assert hits == [1]


# ---------------------------------------------------------------------------
# Top terms / vocab
# ---------------------------------------------------------------------------


def test_top_terms_tie_break_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "g1", "b a b a c")], "doc_id long, src string, text string"
    )
    rows = tx.top_terms(df, group_col="src", text_col="text", n=2).orderBy(
        "rank"
    ).collect()
    # a and b both appear twice; tie broken by term asc
    assert [(r["term"], r["n"], r["rank"]) for r in rows] == [("a", 2, 1), ("b", 2, 2)]


def test_vocab_stats_hapax(spark):
    df = spark.createDataFrame(
        [(1, "en", "a a b c"), (2, "en", "c d")], "doc_id long, lang string, text string"
    )
    [row] = tx.vocab_stats(df, group_col="lang", text_col="text").collect()
    # terms: a×2 b×1 c×2 d×1 -> vocab 4, hapax 2 (b, d), total 6
    assert (row["vocab_size"], row["hapax_count"], row["total_tokens"]) == (4, 2, 6)


# ---------------------------------------------------------------------------
# Cluster formation
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("local_threshold", [500_000, 0])
def test_connected_components_chain_and_island(spark, local_threshold):
    """Both execution paths (driver union-find below the edge-count
    threshold; distributed pointer-jump propagation above it, forced
    here with threshold 0) must produce the identical min-id labeling."""
    from incremental_github_data_pipeline_spark.operators import dedup as dd

    # chain 1-2-3-4 (diameter 3, needs >1 propagation round) + island 8-9
    pairs = spark.createDataFrame(
        [(2, 3), (1, 2), (3, 4), (8, 9)], "id_a long, id_b long"
    )
    got = {
        r["id"]: r["component"]
        for r in dd.connected_components(
            pairs, local_threshold=local_threshold
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 8: 8, 9: 8}


def test_dedup_clusters_singletons_keep_self(spark):
    from incremental_github_data_pipeline_spark.operators import dedup as dd

    docs = spark.createDataFrame([(i,) for i in range(1, 6)], "doc_id long")
    pairs = spark.createDataFrame([(1, 3), (3, 5)], "id_a long, id_b long")
    rows = {
        r["doc_id"]: (r["component"], r["keep"])
        for r in dd.dedup_clusters(docs, pairs).collect()
    }
    # component {1,3,5} keeps only 1; singletons 2,4 keep themselves
    assert rows == {1: (1, 1), 2: (2, 1), 3: (1, 0), 4: (4, 1), 5: (1, 0)}


def test_gram_overlap_pairs_requires_shared_kgram(spark):
    from incremental_github_data_pipeline_spark.operators import dedup as dd

    df = _docs(
        spark,
        [
            (1, "one two three four five six"),
            (2, "zzz two three four five yyy"),   # shares "two three four five six"? no — shares 5-gram "two three four five" only with k=4; with k=5 no
            (3, "one two three four five seven"), # shares "one two three four five" with doc 1
        ],
    )
    pairs = {(r["id_a"], r["id_b"]) for r in dd.gram_overlap_pairs(df, k=5).collect()}
    assert pairs == {(1, 3)}


# ---------------------------------------------------------------------------
# Stratified sampling
# ---------------------------------------------------------------------------


def test_sample_stratified_global_and_per_stratum(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(200)],
        "doc_id long, lang string",
    )
    flat = tx.sample_stratified(df, id_col="doc_id", fractions_pct=10)
    assert flat.count() == 20  # ids 0-9 of each 100-block

    per = tx.sample_stratified(
        df, id_col="doc_id", fractions_pct={"en": 50, "de": 10}, strata_col="lang"
    )
    got = {r["lang"]: r["n"] for r in per.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    # en: even ids with id%100<50 -> 25 per 100-block x2 = 50
    # de: odd ids with id%100<10 -> 5 per block x2 = 10
    assert got == {"en": 50, "de": 10}

    import pytest as _pytest
    with _pytest.raises(ValueError):
        tx.sample_stratified(df, id_col="doc_id", fractions_pct={"en": 50})


def test_sample_stratified_monotone_under_growth(spark):
    small = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    big = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    s1 = {r["doc_id"] for r in tx.sample_stratified(small, "doc_id", 10).collect()}
    s2 = {r["doc_id"] for r in tx.sample_stratified(big, "doc_id", 10).collect()}
    assert s1 <= s2  # growth never evicts earlier sample members


def test_dedup_against_corpus_survivors_and_idempotence(spark):
    from incremental_github_data_pipeline_spark.operators import dedup as dd

    corpus = _docs(spark, [(1, "alpha beta gamma delta epsilon zeta")])
    new = _docs(
        spark,
        [
            (10, "prefix alpha beta gamma delta epsilon suffix"),  # shares 5-gram
            (11, "totally fresh content with new words here"),
            (12, "alpha beta gamma"),  # short doc, no exact corpus match
        ],
    )
    surv = dd.dedup_against_corpus(new, corpus, k=5)
    assert sorted(r["doc_id"] for r in surv.collect()) == [11, 12]
    # idempotent: survivors re-checked against the same corpus survive
    again = dd.dedup_against_corpus(surv, corpus, k=5)
    assert sorted(r["doc_id"] for r in again.collect()) == [11, 12]


# ---------------------------------------------------------------------------
# String-id (uuid5) safety: the engine's own primary keys are uuid5
# STRINGS — bucketing and label propagation must not silently break on
# non-integral ids (round-2 verdict "What's wrong" #2 and #3).
# ---------------------------------------------------------------------------


def _uuid_ids(n):
    import uuid

    ns = uuid.uuid5(uuid.NAMESPACE_DNS, "github.doc")
    return [str(uuid.uuid5(ns, str(i))) for i in range(n)]


def test_assign_split_string_uuid_ids(spark):
    ids = _uuid_ids(2000)
    df = spark.createDataFrame([(i,) for i in ids], "doc_id string")
    got = {
        r["split"]: r["n"]
        for r in df.select(tx.assign_split("doc_id").alias("split"))
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # all three splits populated with sane fractions (hash is uniform;
    # 2000 draws put train well inside 70-90% at 80% nominal)
    assert set(got) == {"train", "val", "test"}
    assert 0.70 < got["train"] / 2000 < 0.90
    assert got["val"] / 2000 < 0.20 and got["test"] / 2000 < 0.20
    # deterministic: identical assignment on rerun
    again = {
        r["split"]: r["n"]
        for r in df.select(tx.assign_split("doc_id").alias("split"))
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == again


def test_assign_split_integral_ids_match_plain_modulo(spark):
    # integral ids must keep the plain `id % 100` semantics the DuckDB
    # oracles (q_doc_split) assume — the hash fallback only engages for
    # non-numeric ids
    df = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    rows = df.select(
        "doc_id", tx.assign_split("doc_id").alias("split")
    ).collect()
    for r in rows:
        b = r["doc_id"] % 100
        expect = "train" if b < 80 else ("val" if b < 90 else "test")
        assert r["split"] == expect


def test_sample_stratified_string_uuid_ids(spark):
    ids = _uuid_ids(1000)
    df = spark.createDataFrame(
        [(i, "en" if n % 2 == 0 else "de") for n, i in enumerate(ids)],
        "doc_id string, lang string",
    )
    got = tx.sample_stratified(df, id_col="doc_id", fractions_pct=10)
    n = got.count()
    assert 0 < n < 1000  # non-empty, non-total: ~10% expected
    assert 0.04 < n / 1000 < 0.20
    per = tx.sample_stratified(
        df, id_col="doc_id", fractions_pct={"en": 50, "de": 10}, strata_col="lang"
    )
    langs = {r["lang"] for r in per.select("lang").distinct().collect()}
    assert "en" in langs  # 50% of 500 en docs can't be empty


@pytest.mark.parametrize("local_threshold", [500_000, 0])
def test_connected_components_string_uuid_ids(spark, local_threshold):
    from incremental_github_data_pipeline_spark.operators import dedup as dd

    # chain b-c-d-e (diameter 3: needs real convergence, not a
    # one-round exit) + island y-z, with uuid-style string labels —
    # run through BOTH the local union-find and (threshold 0) the
    # distributed propagation path
    pairs = spark.createDataFrame(
        [("cc", "dd"), ("bb", "cc"), ("dd", "ee"), ("yy", "zz")],
        "id_a string, id_b string",
    )
    got = {
        r["id"]: r["component"]
        for r in dd.connected_components(
            pairs, local_threshold=local_threshold
        ).collect()
    }
    assert got == {
        "bb": "bb",
        "cc": "bb",
        "dd": "bb",
        "ee": "bb",
        "yy": "yy",
        "zz": "yy",
    }


# ---------------------------------------------------------------------------
# Chunking contracts (round-2 verdict "What's wrong" #6)
# ---------------------------------------------------------------------------


def test_chunk_documents_no_contained_final_chunk(spark):
    # 14 tokens at size 16 / step 12: the old ceil(n/step) formula
    # emitted chunk 1 = tokens[12:14], a strict sub-window of chunk 0 =
    # tokens[0:14] -> duplicated training text. Must be ONE chunk.
    doc14 = " ".join(f"w{i}" for i in range(14))
    doc16 = " ".join(f"w{i}" for i in range(16))
    doc17 = " ".join(f"w{i}" for i in range(17))
    df = _docs(spark, [(1, doc14), (2, doc16), (3, doc17)])
    out = {}
    for r in tx.chunk_documents(df, chunk_size=16, step=12).collect():
        out.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["chunk_tokens"]))
    assert sorted(out[1]) == [(0, 14)]
    assert sorted(out[2]) == [(0, 16)]
    # 17 tokens: chunk 1 = tokens[12:17] adds token 16 -> legitimate
    assert sorted(out[3]) == [(0, 16), (1, 5)]


def test_chunk_documents_every_token_covered_exactly_once_per_window(spark):
    # reconstruction invariant: dropping the overlap prefix of each
    # non-first chunk and concatenating reproduces the document
    doc = " ".join(f"w{i}" for i in range(29))
    df = _docs(spark, [(1, doc)])
    rows = sorted(
        tx.chunk_documents(df, chunk_size=16, step=12).collect(),
        key=lambda r: r["chunk_idx"],
    )
    rebuilt = rows[0]["chunk_text"].split()
    for r in rows[1:]:
        rebuilt += r["chunk_text"].split()[16 - 12 :]
    assert rebuilt == doc.split()


def test_chunk_documents_empty_doc_keeps_one_empty_chunk(spark):
    # empty docs must not vanish (docstring contract: every doc yields
    # at least one chunk row)
    df = _docs(spark, [(1, ""), (2, "   "), (3, "hello world")])
    out = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["chunk_tokens"])
        for r in tx.chunk_documents(df, chunk_size=16, step=12).collect()
    }
    assert out == {
        (1, 0): ("", 0),
        (2, 0): ("", 0),
        (3, 0): ("hello world", 2),
    }


# ---------------------------------------------------------------------------
# Language ID vs a HAND-LABELED fixture (round-2 verdict task 9): the
# expected labels below are human-assigned to natural sentences, not
# generated from LANG_STOPWORDS — so this pins linguistic behavior
# independently of the operator's own lexicon. (The q_lang_id DuckDB
# oracle still pins the cross-engine argmax/tie/CJK semantics.)
# ---------------------------------------------------------------------------

HAND_LABELED_SENTENCES = [
    # English
    ("It is a truth universally acknowledged that a single man in "
     "possession of a good fortune must be in want of a wife", "en"),
    ("The weather in the north of the country was cold and it rained "
     "for most of the week", "en"),
    ("She said that it was too late to go to the market", "en"),
    # German
    ("Der alte Mann und das Meer ist ein Roman und er ist nicht lang", "de"),
    ("Die Kinder spielen mit dem Ball auf der Wiese und der Hund "
     "ist auch nicht weit", "de"),
    ("Das ist ein gutes Buch und es ist nicht teuer", "de"),
    # Spanish
    ("El perro y el gato viven en la casa que está cerca de la playa", "es"),
    ("Los estudiantes leen un libro en la biblioteca por la tarde", "es"),
    ("La vida es un viaje que hay que disfrutar cada día", "es"),
    # French
    ("Le chat est sur la table et le chien est sous une chaise pour "
     "le moment", "fr"),
    ("Les enfants vont à une école qui est près de la gare", "fr"),
    ("La liberté est un droit pour tous les hommes et pour toutes "
     "les femmes", "fr"),
    # Chinese (CJK short-circuit)
    ("今天天气很好我们一起去公园散步", "zh"),
    ("机器学习是人工智能的一个分支", "zh"),
    # No evidence -> und
    ("zzz qqq vvv kkk", "und"),
    ("12345 67890", "und"),
]


def test_lang_id_hand_labeled_fixture(spark):
    df = spark.createDataFrame(
        [(i, s, lab) for i, (s, lab) in enumerate(HAND_LABELED_SENTENCES)],
        "id long, text string, expected string",
    )
    rows = df.select("id", "expected", tx.lang_id("text").alias("pred")).collect()
    wrong = [(r["id"], r["expected"], r["pred"]) for r in rows if r["pred"] != r["expected"]]
    assert wrong == [], f"lang_id mispredicted hand-labeled sentences: {wrong}"


def test_lm_score_hand_computed(spark):
    """Bigram-LM scoring vs values computed by hand (add-one smoothing).

    Corpus: "a b a", "a b", "x", "" -> vocab {a,b,x} (V=3),
    bigram counts {"a b": 2, "b a": 1}, unigrams {a: 3, b: 2, x: 1}.
    """
    import math

    from incremental_github_data_pipeline_spark.operators.text import lm_score

    df = spark.createDataFrame(
        [(1, "a b a"), (2, "a b"), (3, "x"), (4, "")], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in lm_score(df).collect()}
    assert len(rows) == 4
    # doc 1: ln((2+1)/(3+3)) and ln((1+1)/(2+3))
    exp1 = (math.log(3 / 6) + math.log(2 / 5)) / 2
    assert rows[1]["n_bigrams"] == 2
    assert rows[1]["freq_sum"] == 3
    assert abs(rows[1]["avg_logprob"] - exp1) < 1e-12
    # doc 2: single bigram "a b"
    assert rows[2]["n_bigrams"] == 1
    assert rows[2]["freq_sum"] == 2
    assert abs(rows[2]["avg_logprob"] - math.log(3 / 6)) < 1e-12
    # docs too short for bigrams keep a row with zero counts, null score
    for doc_id in (3, 4):
        assert rows[doc_id]["n_bigrams"] == 0
        assert rows[doc_id]["freq_sum"] == 0
        assert rows[doc_id]["avg_logprob"] is None


def test_lm_score_against_reference_corpus(spark):
    """Scoring one corpus under ANOTHER corpus's LM (the deployment
    shape): unseen bigrams get the +1-smoothed floor, unseen first
    tokens the 1/V floor."""
    import math

    from incremental_github_data_pipeline_spark.operators.text import (
        bigram_lm,
        lm_score,
    )

    ref = spark.createDataFrame([(1, "a b a b")], ["doc_id", "text"])
    big, uni, v = bigram_lm(ref)  # {"a b": 2, "b a": 1}, {a: 2, b: 2}, V=2
    target = spark.createDataFrame([(10, "a b"), (11, "z z")], ["doc_id", "text"])
    rows = {
        r["doc_id"]: r
        for r in lm_score(
            target, bigram_counts=big, unigram_counts=uni, vocab_size=v
        ).collect()
    }
    assert abs(rows[10]["avg_logprob"] - math.log(3 / 4)) < 1e-12
    assert rows[10]["freq_sum"] == 2
    # "z z" never seen: bigram 0+1 over unigram 0+V
    assert abs(rows[11]["avg_logprob"] - math.log(1 / 2)) < 1e-12
    assert rows[11]["freq_sum"] == 0


def test_mixture_cutoffs_integer_math(spark):
    """50/30/20 target over equal-sized 25-doc sources: src2 (scarcest
    relative to its 20% share... all equal, so the 50% source binds) —
    check the exact floor-arithmetic cutoffs an external engine derives."""
    from incremental_github_data_pipeline_spark.operators.text import (
        mixture_cutoffs,
    )

    df = (
        spark.range(75)
        .selectExpr("id AS doc_id", "concat('src', CAST(id % 3 AS STRING)) AS source")
    )
    cut = mixture_cutoffs(df, {"src0": 50, "src1": 30, "src2": 20})
    # counts all 25; total = min(25*100//p) = 25*100//50 = 50
    # k = {50*50//100=25, 50*30//100=15, 50*20//100=10}
    # cutoff = k*100//25 -> {100, 60, 40}
    assert cut == {"src0": 100, "src1": 60, "src2": 40}


def test_mix_sources_membership_stable_under_growth(spark):
    """Adding new docs never evicts previously kept docs of a stratum
    whose cutoff didn't tighten — the incremental-pipeline contract."""
    from incremental_github_data_pipeline_spark.operators.text import mix_sources

    base = spark.range(60).selectExpr(
        "id AS doc_id", "concat('src', CAST(id % 2 AS STRING)) AS source"
    )
    w = {"src0": 50, "src1": 50}
    kept_before = {
        r["doc_id"] for r in mix_sources(base, w).select("doc_id").collect()
    }
    # balanced mixture over balanced sources keeps everything
    assert kept_before == set(range(60))
    # grow src0 only: src1 becomes scarce, src0 downsamples — but the
    # kept src0 docs are a prefix-stable modular subset
    grown = spark.range(120).selectExpr(
        "id AS doc_id",
        "CASE WHEN id < 90 THEN 'src0' ELSE 'src1' END AS source",
    )
    kept_after = {
        r["doc_id"] for r in mix_sources(grown, w).select("doc_id").collect()
    }
    src1_after = {i for i in kept_after if i >= 90}
    assert src1_after == set(range(90, 120))  # scarcest kept whole
    # src0 cutoff: total = min(90*100//50, 30*100//50) = 60; k0 = 30;
    # cutoff = 30*100//90 = 33 -> keep doc_id % 100 < 33
    assert {i for i in kept_after if i < 90} == {
        i for i in range(90) if i % 100 < 33
    }


def test_pack_sequences_budget_and_order(spark):
    """Every sequence's token total is >= budget minus the last doc's
    overflow allowance; docs stay in id order within a sequence."""
    from incremental_github_data_pipeline_spark.operators.text import (
        pack_sequences,
    )

    docs = [
        (i, "s", " ".join(["w"] * (10 + (i % 7)))) for i in range(40)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "source", "text"])
    packed = pack_sequences(df, budget=50, shards=1).collect()
    rows = sorted(packed, key=lambda r: r["doc_id"])
    # reproduce the packing by hand
    cum = 0
    for r in rows:
        assert r["seq_id"] == cum // 50
        cum += r["n_tokens"]
    # all but the last sequence must have crossed the budget
    by_seq = {}
    for r in rows:
        by_seq.setdefault(r["seq_id"], []).append(r["n_tokens"])
    last = max(by_seq)
    for sid, toks in by_seq.items():
        if sid != last:
            assert sum(toks) >= 50 - max(toks) + 1  # crossed into next bin


def test_pack_sequences_sharded_parallelism(spark):
    """Sharding partitions the packing: seq ids restart per shard and
    no sequence mixes shards."""
    from incremental_github_data_pipeline_spark.operators.text import (
        pack_sequences,
    )

    docs = [(i, "s", " ".join(["w"] * 20)) for i in range(40)]
    df = spark.createDataFrame(docs, ["doc_id", "source", "text"])
    packed = pack_sequences(df, budget=60, shards=4).collect()
    assert {r["shard"] for r in packed} == {0, 1, 2, 3}
    for shard in range(4):
        rows = sorted(
            (r for r in packed if r["shard"] == shard), key=lambda r: r["doc_id"]
        )
        assert [r["doc_id"] % 4 for r in rows] == [shard] * len(rows)
        cum = 0
        for r in rows:
            assert r["seq_id"] == cum // 60
            cum += r["n_tokens"]


# ---------------------------------------------------------------------------
# remove_duplicate_spans (C4-style boilerplate excision)
# ---------------------------------------------------------------------------


def test_remove_duplicate_spans_excises_shared_gram(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),
            (2, "x y a b c d e z"),
            (3, "p q r s t"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in tx.remove_duplicate_spans(df, k=5, min_docs=2).collect()
    }
    # "a b c d e" occurs in docs 1 and 2 → those five tokens vanish from
    # both, surviving tokens keep their original order
    assert out[1]["clean_text"] == "f g h"
    assert out[2]["clean_text"] == "x y z"
    assert out[1]["n_removed"] == 5 and out[2]["n_removed"] == 5
    # untouched doc and empty doc keep a row
    assert out[3]["clean_text"] == "p q r s t" and out[3]["n_removed"] == 0
    assert out[4]["clean_text"] == "" and out[4]["n_tokens"] == 0


def test_remove_duplicate_spans_overlapping_grams_union_coverage(spark):
    # the duplicated region is longer than k: overlapping frequent grams
    # must union their coverage, not double-remove or leave gaps
    shared = "s1 s2 s3 s4 s5 s6 s7"
    df = spark.createDataFrame(
        [(1, f"{shared} tail1"), (2, f"head2 {shared}")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in tx.remove_duplicate_spans(df, k=5, min_docs=2).collect()
    }
    assert out[1]["clean_text"] == "tail1" and out[1]["n_removed"] == 7
    assert out[2]["clean_text"] == "head2" and out[2]["n_removed"] == 7


def test_remove_duplicate_spans_within_doc_repeat_not_removed(spark):
    # the SAME doc repeating a gram twice is not cross-document
    # boilerplate (min_docs counts DISTINCT docs)
    df = spark.createDataFrame(
        [(1, "r1 r2 r3 r4 r5 mid r1 r2 r3 r4 r5"), (2, "unrelated words here")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in tx.remove_duplicate_spans(df, k=5, min_docs=2).collect()
    }
    assert out[1]["n_removed"] == 0


# ---------------------------------------------------------------------------
# dsir_score (importance weighting)
# ---------------------------------------------------------------------------


def test_dsir_weight_hand_computed(spark):
    import math

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, "b b c")],
        "doc_id long, text string",
    )
    # target = doc 1 only: target counts a:2 b:1, raw counts a:3 b:3 c:2
    # raw_total=8? no: tokens total = 3+2+3 = 8, vocab = {a,b,c} = 3
    out = {
        r["doc_id"]: r
        for r in tx.dsir_score(
            df, target_filter=F.col("doc_id") == 1
        ).collect()
    }
    raw_total, target_total, vocab = 8, 3, 3
    def lr(tc, rc):
        return math.log((tc + 1) / (target_total + vocab)) - math.log(
            (rc + 1) / (raw_total + vocab)
        )
    expected_doc2 = (lr(2, 3) + lr(0, 2)) / 2  # tokens a, c
    assert abs(out[2]["dsir_weight"] - expected_doc2) < 1e-12
    assert out[2]["raw_freq_sum"] == 3 + 2
    assert out[2]["target_freq_sum"] == 2 + 0
    # doc 1 is IN the target: must score higher than out-of-domain doc 3
    assert out[1]["dsir_weight"] > out[3]["dsir_weight"]


def test_dsir_empty_doc_keeps_row_with_null_weight(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, "")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in tx.dsir_score(df, target_filter=F.lit(True)).collect()
    }
    assert out[2]["n_tokens"] == 0
    assert out[2]["dsir_weight"] is None
    assert out[2]["raw_freq_sum"] == 0 and out[2]["target_freq_sum"] == 0


def test_curation_funnel_stages_monotone_and_consistent(spark):
    df = spark.createDataFrame(
        [
            # quality-pass, en, dup pair (same text) → one survives dedup
            (0, "the cat and the dog sat in the house and it was warm " * 3, "en"),
            (100, "the cat and the dog sat in the house and it was warm " * 3, "en"),
            # quality-pass but disallowed lang
            (2, "the cat and the dog sat in the house and it was warm " * 3, "zh"),
            # too short → fails quality
            (3, "the end", "en"),
            # train/test boundary: id 85 → bucket 85 ≥ 80 → not train
            (85, "the cat and the dog ran to the park and it was fun " * 3, "en"),
        ],
        "doc_id long, text string, lang string",
    )
    out = {r["stage"]: r for r in tx.curation_funnel(df).collect()}
    assert [out[s]["n_docs"] for s in sorted(out)] == [5, 4, 3, 2, 1]
    # monotone non-increasing chars too
    chars = [out[s]["total_chars"] for s in sorted(out)]
    assert all(a >= b for a, b in zip(chars, chars[1:]))
    # survivor of the dup pair is the min id (0, bucket 0 → train)
    assert out["5_train"]["n_docs"] == 1


# ---------------------------------------------------------------------------
# remove_duplicate_spans — property-based invariants
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_WORDS = ["alpha", "beta", "gamma", "delta", "eps"]
_doc_strategy = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=6,
)


@settings(max_examples=10, deadline=None)
@given(_doc_strategy)
def test_remove_spans_conservation_and_monotonicity(spark, texts):
    """For any corpus: (a) token conservation — kept + removed = total,
    and clean_text's token count equals the kept count; (b) the kept
    tokens are a subsequence of the original tokens; (c) raising
    min_docs never removes MORE (monotone in the threshold)."""
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    k = 3
    by_id = {
        r["doc_id"]: r
        for r in tx.remove_duplicate_spans(df, k=k, min_docs=2).collect()
    }
    strict = {
        r["doc_id"]: r
        for r in tx.remove_duplicate_spans(df, k=k, min_docs=3).collect()
    }
    for i, text in enumerate(texts):
        orig = text.split() if text.strip() else []
        row = by_id[i]
        kept = row["clean_text"].split() if row["clean_text"] else []
        assert row["n_tokens"] == len(orig)
        assert len(kept) + row["n_removed"] == len(orig)
        # kept is a subsequence of orig
        it = iter(orig)
        assert all(tok in it for tok in kept)
        assert strict[i]["n_removed"] <= row["n_removed"]


def test_normalize_text_strips_controls_and_collapses_whitespace(spark):
    df = spark.createDataFrame(
        [
            (1, "a  b\tc\nd"),          # runs, tab, newline → single spaces
            (2, "  lead trail  "),       # trim
            (3, "bell\x07mid\x00end"),   # control chars → separator
            (4, "CLEAN text"),           # unchanged without lowercase
        ],
        "id long, text string",
    )
    got = {
        r["id"]: r["n"]
        for r in df.select(
            "id", tx.normalize_text("text").alias("n")
        ).collect()
    }
    assert got == {
        1: "a b c d",
        2: "lead trail",
        3: "bell mid end",
        4: "CLEAN text",
    }
    low = df.filter(F.col("id") == 4).select(
        tx.normalize_text("text", lowercase=True).alias("n")
    ).first()["n"]
    assert low == "clean text"


def test_chunk_udtf_agrees_with_expression_lane(spark):
    """The UDTF lane and the codegen expression lane must produce the
    identical chunking (same rows, same order columns) — including the
    no-contained-final-chunk rule and the one-empty-chunk contract."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(40))),  # multi-chunk
            (2, "a b c"),                                # single short chunk
            (3, ""),                                     # empty doc
            (4, " ".join(f"x{i}" for i in range(14))),   # overlap zone
        ],
        "doc_id long, text string",
    )
    expr = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["chunk_tokens"])
        for r in tx.chunk_documents(df, chunk_size=16, step=12).collect()
    }
    ChunkUdtf = tx.make_chunk_udtf(chunk_size=16, step=12)
    spark.udtf.register("chunk_udtf_t", ChunkUdtf)
    df.createOrReplaceTempView("docs_udtf_t")
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["chunk_tokens"])
        for r in spark.sql(
            "SELECT c.* FROM docs_udtf_t, "
            "LATERAL chunk_udtf_t(doc_id, text) c"
        ).collect()
    }
    assert got == expr


def test_vocab_overlap_sketch_accuracy(spark):
    """The theta-sketch overlap estimates must land within a few percent
    of the exact distinct counts on the sf0.001 corpus (small enough
    that theta sketches are near-exact). The query now carries the
    bound check itself (shared_ok/union_ok assertion columns, compared
    against literal TRUE by the driver oracle); here we pin that every
    assertion actually holds and that the pair set and exact counts
    agree with the exact query's."""
    from incremental_github_data_pipeline_spark.queries import load_all

    reg = load_all()
    exact = {
        (r["lang_a"], r["lang_b"]): (
            r["n_shared"],
            r["vocab_a"] + r["vocab_b"] - r["n_shared"],
        )
        for r in reg["q_vocab_overlap"].fn(spark, "/root/testdata/sf0.001").collect()
    }
    sketch_rows = reg["q_vocab_overlap_sketch"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    got = {(r["lang_a"], r["lang_b"]): r for r in sketch_rows}
    assert set(got) == set(exact)
    for k, (sh, un) in exact.items():
        r = got[k]
        assert (r["exact_shared"], r["exact_union"]) == (sh, un), (k, r)
        assert r["shared_ok"] and r["union_ok"], (k, r)


def test_temperature_weights_limits_and_tail_boost(spark):
    # scatter stratum ids across the id space: _id_bucket is modular
    # (id % buckets) by the deterministic-split contract, so contiguous
    # id blocks would alias with the bucket cutoffs
    df = spark.createDataFrame(
        [
            (
                i,
                "books" if i % 100 == 0
                else ("code" if i % 10 == 0 else "web"),
            )
            for i in range(1000)
        ],
        "doc_id long, source string",
    )
    natural = tx.temperature_weights(df, alpha=1.0)
    flat = tx.temperature_weights(df, alpha=0.0)
    mid = tx.temperature_weights(df, alpha=0.5)
    # alpha=1 -> natural proportions (900/90/10)
    assert natural == {"web": 90, "code": 9, "books": 1}
    # alpha=0 -> uniform thirds
    assert flat == {"web": 33, "code": 33, "books": 33}
    # 0 < alpha < 1 boosts the tail monotonically
    assert natural["books"] <= mid["books"] <= flat["books"]
    assert flat["web"] <= mid["web"] <= natural["web"]
    # composes with the mixture machinery
    mixed = tx.mix_sources(df, mid, id_col="doc_id")
    got = {r["source"]: r["n"] for r in
           mixed.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(got) == {"web", "code", "books"}
    # realized mixture tracks the target ordering
    assert got["web"] > got["code"] > got["books"] >= 1


# ---------------------------------------------------------------------------
# gzip member ingestion
# ---------------------------------------------------------------------------


def test_gzip_members_splits_and_validates():
    import gzip
    import io

    import pytest as _pytest

    from incremental_github_data_pipeline_spark.operators.text import gzip_members

    def gz(b):
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as f:
            f.write(b)
        return buf.getvalue()

    payload = gz(b"first doc") + gz(b"") + gz(b"third")
    assert gzip_members(payload) == [b"first doc", b"", b"third"]
    with _pytest.raises(ValueError, match="magic"):
        gzip_members(b"not gzip at all")
    with _pytest.raises(ValueError, match="truncated"):
        gzip_members(gz(b"x" * 1000)[:-5])
    # corrupt DEFLATE body behind a valid gzip header: zlib.error must
    # surface as ValueError so every caller's on_error="skip" path
    # (which catches ValueError) quarantines it (ADVICE r11)
    bad_deflate = (
        b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\x03" + b"\xff" * 8
    )
    with _pytest.raises(ValueError, match="corrupt gzip member"):
        gzip_members(bad_deflate)


def test_gzip_ingest_skip_quarantines_corrupt_payloads(spark):
    import gzip
    import io

    import pytest as _pytest

    from incremental_github_data_pipeline_spark.operators.text import gzip_ingest

    def gz(b):
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as f:
            f.write(b)
        return buf.getvalue()

    df = spark.createDataFrame(
        [(1, gz(b"ok one") + gz(b"ok two")), (2, b"garbage"),
         (3, gz(b"solo"))],
        "payload_id long, payload binary",
    )
    got = {
        (r["payload_id"], r["member_idx"], r["text"])
        for r in gzip_ingest(df, on_error="skip").collect()
    }
    assert got == {(1, 0, "ok one"), (1, 1, "ok two"), (3, 0, "solo")}
    with _pytest.raises(Exception):  # strict default still fails the job
        gzip_ingest(df).collect()
    with _pytest.raises(ValueError, match="on_error"):
        gzip_ingest(df, on_error="quarantine")


def test_bpe_ish_token_count_known_values(spark):
    from incremental_github_data_pipeline_spark.operators.text import (
        bpe_ish_token_count,
    )

    df = spark.createDataFrame(
        [(1, "hello world42!"), (2, "a-b c"), (3, "")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", bpe_ish_token_count("text").alias("n")
        ).collect()
    }
    # hello | world | 42 | !  /  a | - | b | c  /  empty
    assert got == {1: 4, 2: 4, 3: 0}


def test_lang_scores_argmax_agrees_with_lang_id(spark):
    from incremental_github_data_pipeline_spark.operators.text import (
        lang_id,
        lang_scores,
    )

    df = spark.createDataFrame(
        [(1, "the quick fox and the lazy dog"),
         (2, "el perro y la casa de los gatos"),
         (3, "der hund und die katze ist hier")],
        "doc_id long, text string",
    )
    rows = df.select(
        "doc_id", lang_id("text").alias("lang"), lang_scores("text").alias("s")
    ).collect()
    for r in rows:
        scores = r["s"]
        assert scores[r["lang"]] == max(scores.values())


class TestBm25TopK:
    """bm25_topk: hand-computed ranking + stop-word pruning."""

    def _corpus(self, spark):
        return spark.createDataFrame(
            [
                (0, "apple banana apple"),
                (1, "banana cherry"),
                (2, "cherry cherry cherry"),
                (3, "apple"),
            ],
            "doc_id long, text string",
        )

    def test_hand_computed_ranking(self, spark):
        import math

        docs = self._corpus(spark)
        queries = spark.createDataFrame(
            [(100, "apple cherry")], "query_id long, qtext string"
        )
        rows = tx.bm25_topk(docs, queries, k=4).orderBy("rank").collect()
        # N=4, avgdl=2.25, df(apple)=df(cherry)=2 -> idf=ln(2);
        # d2: 3*2.2/(3+1.2*(0.25+0.75*3/2.25)) = 6.6/4.5
        # d3: 2.2/1.7   d0: 4.4/3.5   d1: 2.2/2.1   (all x ln 2)
        assert [r["doc_id"] for r in rows] == [2, 3, 0, 1]
        assert [r["rank"] for r in rows] == [1, 2, 3, 4]
        assert all(r["n_terms"] == 1 for r in rows)
        assert [r["sum_tf"] for r in rows] == [3, 1, 2, 1]
        want = math.log(2) * 6.6 / 4.5
        assert abs(rows[0]["score"] - want) < 1e-12

    def test_max_df_ratio_prunes_stopwords(self, spark):
        docs = spark.createDataFrame(
            [
                (0, "the apple"),
                (1, "the banana"),
                (2, "the cherry"),
                (3, "the plum"),
            ],
            "doc_id long, text string",
        )
        queries = spark.createDataFrame(
            [(9, "the apple")], "query_id long, qtext string"
        )
        # 'the' is in 4/4 docs; ratio 0.8 drops it -> only 'apple' hits
        rows = tx.bm25_topk(
            docs, queries, k=10, max_df_ratio=0.8
        ).collect()
        assert [(r["doc_id"], r["n_terms"]) for r in rows] == [(0, 1)]
        # without pruning every doc matches via 'the'
        rows = tx.bm25_topk(docs, queries, k=10).collect()
        assert len(rows) == 4

    def test_empty_query_text_yields_nothing(self, spark):
        docs = self._corpus(spark)
        queries = spark.createDataFrame(
            [(1, "   ")], "query_id long, qtext string"
        )
        assert tx.bm25_topk(docs, queries).count() == 0


class TestUnigramLM:
    def _docs(self, spark):
        return spark.createDataFrame(
            [
                (0, "abab abab abab"),
                (1, "ab cd cd"),
                (2, "abcd abcd"),
                (3, "ab"),
            ],
            "doc_id long, text string",
        )

    def test_em_promotes_compositional_pieces(self, spark):
        docs = self._docs(spark)
        vocab, pieces = tx.learn_unigram(
            docs, vocab_size=8, n_iters=3, max_piece_len=4
        )
        top = pieces.orderBy("rank").limit(2).collect()
        assert {r["piece"] for r in top} == {"ab", "cd"}
        segs = {r["word"]: list(r["syms"]) for r in vocab.collect()}
        # Viterbi prefers ab+ab / ab+cd over the rarer whole-word pieces
        assert segs["abab"] == ["ab", "ab"]
        assert segs["abcd"] == ["ab", "cd"]

    def test_lossless_and_applies_via_bpe_tokenize(self, spark):
        docs = self._docs(spark)
        vocab, _ = tx.learn_unigram(docs, vocab_size=8, n_iters=2)
        out = tx.bpe_tokenize(docs, vocab).orderBy("doc_id").collect()
        texts = {r["doc_id"]: r["text"] for r in docs.collect()}
        for r in out:
            assert r["bpe_text"].replace(" ", "") == texts[
                r["doc_id"]
            ].replace(" ", "")

    def test_deterministic_across_runs(self, spark):
        docs = self._docs(spark)
        a = tx.learn_unigram(docs, vocab_size=8, n_iters=2)[1].collect()
        b = tx.learn_unigram(docs, vocab_size=8, n_iters=2)[1].collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]

    def test_single_chars_survive_pruning(self, spark):
        docs = self._docs(spark)
        _, pieces = tx.learn_unigram(docs, vocab_size=2, n_iters=1)
        kept = {r["piece"] for r in pieces.collect()}
        assert {"a", "b", "c", "d"} <= kept  # coverage floor


class TestStripHtml:
    """strip_html (r11): the WET-style crawl text extractor."""

    def _one(self, spark, s: str) -> str:
        from incremental_github_data_pipeline_spark.operators.text import (
            strip_html,
        )

        df = spark.createDataFrame([(s,)], "t string")
        return df.select(strip_html("t").alias("o")).collect()[0]["o"]

    def test_script_style_comments_tags_entities(self, spark):
        out = self._one(
            spark,
            '<html><head><script>var x="<p>";</script><style>.c{}</style>'
            "</head><body><!-- note --><h1>Title</h1><p>Hello   world</p>"
            "<div>&amp;id=7 &lt;tag&gt; &quot;q&quot; &#39;a&#39;&nbsp;end"
            "</div></body></html>",
        )
        assert out == 'Title Hello world &id=7 <tag> "q" \'a\' end'

    def test_script_contents_never_leak(self, spark):
        # a '<' inside a script string must not derail tag stripping
        out = self._one(
            spark, "<p>a</p><script>if (1<2) alert('<b>x</b>')</script><p>b</p>"
        )
        assert out == "a b"

    def test_amp_decodes_one_level_last(self, spark):
        assert self._one(spark, "&amp;lt;") == "&lt;"
        assert self._one(spark, "&amp;amp;") == "&amp;"

    def test_plain_text_passthrough(self, spark):
        assert self._one(spark, "  no   markup  ") == "no markup"

    def test_multiline_blocks(self, spark):
        out = self._one(
            spark, "<style>\n.a{}\n.b{}\n</style>one\n<script>\nx\n</script>two"
        )
        assert out == "one two"


class TestCanonicalizeUrl:
    """canonicalize_url (r11): the URL-dedup prerequisite."""

    def _one(self, spark, s: str) -> str:
        from incremental_github_data_pipeline_spark.operators.text import (
            canonicalize_url,
        )

        df = spark.createDataFrame([(s,)], "u string")
        return df.select(canonicalize_url("u").alias("o")).collect()[0]["o"]

    def test_full_normalization_stack(self, spark):
        assert (
            self._one(spark, "HTTP://Example.COM:80/Path/Pg?b=2&a=1#f")
            == "http://example.com/Path/Pg?a=1&b=2"
        )

    def test_default_ports_are_scheme_aware(self, spark):
        assert self._one(spark, "https://e.com:443/") == "https://e.com/"
        assert self._one(spark, "http://e.com:443/") == "http://e.com:443/"
        assert self._one(spark, "http://e.com:8080/") == "http://e.com:8080/"

    def test_path_case_preserved_empty_path_rooted(self, spark):
        assert self._one(spark, "https://E.com/A/B") == "https://e.com/A/B"
        assert self._one(spark, "https://e.com") == "https://e.com/"
        assert self._one(spark, "https://e.com?x=1") == "https://e.com/?x=1"

    def test_trailing_question_and_duplicate_params(self, spark):
        assert self._one(spark, "https://e.com/p?") == "https://e.com/p"
        assert (
            self._one(spark, "http://e.com/p?a=1&a=0")
            == "http://e.com/p?a=0&a=1"
        )

    def test_canonical_forms_collide_for_dedup(self, spark):
        a = self._one(spark, "HTTPS://E.com:443/x?b=2&a=1#top")
        b = self._one(spark, "https://e.com/x?a=1&b=2")
        assert a == b


# ---------------------------------------------------------------------------
# WARC record parsing
# ---------------------------------------------------------------------------


def _warc_sample():
    from incremental_github_data_pipeline_spark.operators.text import warc_build

    return [
        {
            "warc_type": "warcinfo",
            "content_type": "application/warc-fields",
            "body": b"software: synth\r\n",
        },
        {
            "warc_type": "response",
            "target_uri": "https://h.example.com/p",
            "warc_date": "2024-01-01T00:00:00Z",
            "http_status": 200,
            "body": b"<html><p>hi there</p></html>",
        },
        {
            "warc_type": "request",
            "target_uri": "https://h.example.com/p",
            "content_type": "application/http; msgtype=request",
            "body": b"GET /p HTTP/1.1\r\n",
        },
    ], warc_build


def test_warc_roundtrip_both_layouts():
    recs, warc_build = _warc_sample()
    from incremental_github_data_pipeline_spark.operators.text import warc_records

    for gz in (False, True):
        parsed = warc_records(warc_build(recs, gzip_per_record=gz))
        assert [r["warc_type"] for r in parsed] == [
            "warcinfo", "response", "request",
        ]
        assert parsed[0]["http_status"] is None
        assert parsed[0]["body"] == b"software: synth\r\n"
        assert parsed[1]["http_status"] == 200
        assert parsed[1]["content_type"] == "text/html"
        assert parsed[1]["body"] == b"<html><p>hi there</p></html>"
        assert parsed[1]["target_uri"] == "https://h.example.com/p"
        assert parsed[2]["http_status"] is None  # requests not HTTP-parsed
        assert parsed[2]["body"].startswith(b"GET /p")


def test_warc_framing_violations_raise():
    import pytest as _pytest

    from incremental_github_data_pipeline_spark.operators.text import (
        warc_build,
        warc_records,
    )

    recs, _ = _warc_sample()
    good = warc_build(recs)
    with _pytest.raises(ValueError, match="version"):
        warc_records(b"HTTP/1.1 200 OK\r\n\r\n")
    # short block: truncating the payload kills the final separator
    with _pytest.raises(ValueError, match="separator|shorter"):
        warc_records(good[:-3])
    # unsupported version
    with _pytest.raises(ValueError, match="version"):
        warc_records(good.replace(b"WARC/1.0", b"WARC/9.9", 1))
    # content-length must exist: drop the header line entirely
    head, _, rest = good.partition(b"\r\n\r\n")
    lines = [
        ln for ln in head.split(b"\r\n") if not ln.startswith(b"Content-Length")
    ]
    with _pytest.raises(ValueError):
        warc_records(b"\r\n".join(lines) + b"\r\n\r\n" + rest)


def test_warc_ingest_rows_and_skip(spark):
    import pytest as _pytest

    from incremental_github_data_pipeline_spark.operators.text import (
        warc_build,
        warc_ingest,
    )

    recs, _ = _warc_sample()
    # payload 4: valid gzip header, corrupt DEFLATE stream — the
    # .warc.gz shard-corruption case warc_ingest's quarantine mode
    # exists for (pre-r12 this escaped as zlib.error and killed the
    # job; gzip_members now normalizes it to ValueError)
    bad_gz_member = (
        b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\x03" + b"\xff" * 8
    )
    df = spark.createDataFrame(
        [
            (1, warc_build(recs)),
            (2, b"garbage not warc"),
            (3, warc_build(recs[1:2], gzip_per_record=True)),
            (4, bad_gz_member),
        ],
        "payload_id long, payload binary",
    )
    got = {
        (r["payload_id"], r["record_idx"], r["warc_type"], r["http_status"])
        for r in warc_ingest(df, on_error="skip").collect()
    }
    assert got == {
        (1, 0, "warcinfo", None),
        (1, 1, "response", 200),
        (1, 2, "request", None),
        (3, 0, "response", 200),
    }
    with _pytest.raises(Exception):
        warc_ingest(df).collect()
    with _pytest.raises(ValueError, match="on_error"):
        warc_ingest(df, on_error="quarantine")


# ---------------------------------------------------------------------------
# sentence segmentation
# ---------------------------------------------------------------------------


class TestSplitSentences:
    def _one(self, spark, text):
        from incremental_github_data_pipeline_spark.operators.text import (
            split_sentences,
        )

        df = spark.createDataFrame([(text,)], "t string")
        return df.select(split_sentences("t").alias("s")).collect()[0]["s"]

    def test_three_terminators_and_digits(self, spark):
        got = self._one(spark, "One two. Three four! Five? 6 seven.")
        assert got == ["One two.", "Three four!", "Five?", "6 seven."]

    def test_abbreviation_period_stays_inline(self, spark):
        got = self._one(spark, "See e.g. the men. at end. Next one.")
        # period + space + lowercase is NOT a boundary
        assert got == ["See e.g. the men. at end.", "Next one."]

    def test_no_boundary_single_sentence(self, spark):
        assert self._one(spark, "no caps here. still going") == [
            "no caps here. still going"
        ]

    def test_trailing_unterminated_tail_kept(self, spark):
        got = self._one(spark, "Done. And then some")
        assert got == ["Done.", "And then some"]


class TestFixMojibake:
    def _one(self, spark, text):
        from incremental_github_data_pipeline_spark.operators.text import (
            fix_mojibake,
        )

        df = spark.createDataFrame([(text,)], "t string")
        return df.select(fix_mojibake("t").alias("f")).collect()[0]["f"]

    def test_classic_sequences_repair(self, spark):
        assert self._one(spark, "CafÃ© â€œquotedâ€¦ â€“ naÃ¯ve") == (
            "Café “quoted… – naïve"
        )

    def test_clean_text_untouched(self, spark):
        clean = 'Already fine: é, "quotes", 100% — done.'
        assert self._one(spark, clean) == clean

    def test_map_is_self_generating(self):
        from incremental_github_data_pipeline_spark.operators.text import (
            MOJIBAKE_MAP,
        )

        for corrupt, repaired in MOJIBAKE_MAP:
            assert repaired.encode("utf-8").decode("cp1252") == corrupt
        # longest-first application order
        lens = [len(c) for c, _ in MOJIBAKE_MAP]
        assert lens == sorted(lens, reverse=True)


def test_strip_tracking_params_shapes(spark):
    from incremental_github_data_pipeline_spark.operators.text import (
        strip_tracking_params,
    )

    df = spark.createDataFrame(
        [
            (1, "https://x.com/p?utm_source=tw&id=3&fbclid=abc"),
            (2, "https://x.com/p?id=3"),
            (3, "https://x.com/p?utm_campaign=z"),  # tracker-only
            (4, "https://x.com/p"),  # no query
            (5, "http://y.io/a?gclid=1&b=2&utm_x=9&c=3"),
            (6, "https://x.com/p?idutm_=keepme"),  # utm_ not a PREFIX
        ],
        "i long, u string",
    )
    got = {
        r["i"]: r["s"]
        for r in df.select(
            "i",
            tx.strip_tracking_params("u").alias("s"),
        ).collect()
    }
    assert got == {
        1: "https://x.com/p?id=3",
        2: "https://x.com/p?id=3",
        3: "https://x.com/p",
        4: "https://x.com/p",
        5: "http://y.io/a?b=2&c=3",
        6: "https://x.com/p?idutm_=keepme",
    }


class TestRobots:
    def test_parse_groups_and_agent_selection(self):
        from incremental_github_data_pipeline_spark.operators.text import (
            parse_robots,
        )

        text = (
            "# comment\n"
            "User-agent: goodbot\n"
            "User-agent: otherbot\n"
            "Disallow: /shared\n"
            "\n"
            "User-agent: *\n"
            "Disallow: /all\n"
            "Allow: /all/ok$\n"
            "Disallow:\n"  # empty = no-op
        )
        star = parse_robots(text, agent="*")
        assert [(r["allow"], r["pattern"]) for r in star] == [
            (0, "/all"), (1, "/all/ok$")
        ]
        # exact agent group wins over * entirely (RFC 9309)
        good = parse_robots(text, agent="GoodBot")
        assert [(r["allow"], r["pattern"]) for r in good] == [
            (0, "/shared")
        ]
        # wildcard + anchor compile to anchored regex
        assert star[1]["regex"] == "^/all/ok$"
        w = parse_robots("User-agent: *\nDisallow: /a*b\n")[0]
        assert w["regex"] == "^/a.*b"

    def test_match_longest_pattern_and_tie_to_allow(self, spark):
        from incremental_github_data_pipeline_spark.operators.text import (
            parse_robots,
            robots_match,
        )

        rules_list = parse_robots(
            "User-agent: *\n"
            "Disallow: /d/\n"
            "Allow: /d/keep\n"
            "Disallow: /x\n"
            "Allow: /y\n"
        )
        rules = spark.createDataFrame(
            [("h", r["allow"], r["pattern"], r["regex"], r["plen"])
             for r in rules_list],
            "host string, allow int, pattern string, regex string, "
            "plen int",
        )
        urls = spark.createDataFrame(
            [
                (1, "h", "/d/other"),   # blocked by /d/
                (2, "h", "/d/keep/it"), # longer Allow wins
                (3, "h", "/free"),      # no match -> allowed
                (4, "noru", "/d/other"),  # host without rules
            ],
            "url_id long, host string, path string",
        )
        got = {
            r["url_id"]: (r["allowed"], r["matched_pattern"])
            for r in robots_match(urls, rules).collect()
        }
        assert got[1] == (False, "/d/")
        assert got[2] == (True, "/d/keep")
        assert got[3] == (True, None)
        assert got[4] == (True, None)


def test_script_counts_and_dominant(spark):
    from incremental_github_data_pipeline_spark.operators.text import (
        SCRIPT_RANGES,
        dominant_script,
        script_counts,
    )

    df = spark.createDataFrame(
        [
            (1, "hello world"),
            (2, "привет мир hello"),       # cyrillic 9 > latin 5
            (3, "你好 こんにちは 가나"),      # ideographs + kana + hangul
            (4, "مرحبا"),
            (5, "שלום"),
            (6, "αβγ ab"),                 # latin ties at... greek 3 > 2
            (7, "123 !?"),                 # nothing alphabetic -> latin
            (8, "Café àé"),                # Latin-1 supplement counts
        ],
        "i long, t string",
    )
    cols = script_counts("t")
    rows = {
        r["i"]: r
        for r in df.select(
            "i",
            *[c.alias(n) for n, c in cols.items()],
            dominant_script("t").alias("dom"),
        ).collect()
    }
    assert rows[1]["dom"] == "latin" and rows[1]["latin"] == 10
    assert rows[2]["dom"] == "cyrillic" and rows[2]["cyrillic"] == 9
    assert rows[3]["dom"] == "cjk" and rows[3]["cjk"] == 9
    assert rows[4]["dom"] == "arabic"
    assert rows[5]["dom"] == "hebrew"
    assert rows[6]["dom"] == "greek"
    assert rows[7]["dom"] == "latin"  # all-zero tie -> first entry
    assert rows[8]["latin"] == 6  # accented Latin-1 chars included
    assert set(SCRIPT_RANGES) == {
        "latin", "cyrillic", "greek", "cjk", "arabic", "hebrew"
    }


class TestTrigramLangId:
    """Trigram language identification (r13): char_trigrams,
    trigram_hits, lang_from_trigram_hits, lang_id_trigram."""

    def test_char_trigrams_padding_and_short_text(self, spark):
        from incremental_github_data_pipeline_spark.operators.text import (
            char_trigrams,
        )

        df = spark.createDataFrame(
            [(1, "The"), (2, ""), (3, "a"), (4, "héllo")],
            "i long, t string",
        )
        got = {
            r["i"]: r["tg"]
            for r in df.select(
                "i", char_trigrams("t").alias("tg")
            ).collect()
        }
        # ' the ' -> [' th', 'the', 'he ']: padded and lowercased
        assert got[1] == [" th", "the", "he "]
        # '' pads to two spaces -> no trigram positions
        assert got[2] == []
        # single char: ' a ' -> [' a ']
        assert got[3] == [" a "]
        # multibyte chars count as single positions
        assert got[4] == [" hé", "hél", "éll", "llo", "lo "]

    def test_hits_are_positional_multiset_overlap(self, spark):
        from incremental_github_data_pipeline_spark.operators.text import (
            trigram_hits,
        )

        # ' the theater ': en profile fires at ' th'(x2), 'the'(x2),
        # 'he '(x2) ... exact positional count, not binary presence
        df = spark.createDataFrame([("The Theater",)], "t string")
        hits = trigram_hits("t")
        row = df.select(hits["en"].alias("en")).collect()[0]
        assert row["en"] == 5  # ' th',' th','the','the','he ' ... 'he ' once mid + once end

    def test_labels_real_sentences(self, spark):
        from incremental_github_data_pipeline_spark.operators.text import (
            lang_id_trigram,
        )

        cases = [
            ("The quick brown fox is in the garden with the dog.", "en"),
            ("Die Regierung und die Länder haben sich nicht geeinigt.", "de"),
            ("El gobierno de la nación aprobó la nueva ley.", "es"),
            ("Le gouvernement de la France et les pays européens.", "fr"),
            ("Il governo della repubblica ha deciso che la protezione.", "it"),
            ("O governo do país aprovou uma nova lei de proteção.", "pt"),
            ("Российское правительство приняло новый закон.", "ru"),
            ("Η κυβέρνηση ενέκρινε τον νέο νόμο.", "el"),
            ("中国政府通过了一项新法律。", "zh"),
            ("أقرت الحكومة القانون الجديد.", "ar"),
            ("הממשלה אישרה את החוק החדש.", "he"),
            ("", "und"),
            ("12345 !!! ???", "und"),
        ]
        df = spark.createDataFrame(
            [(i, t) for i, (t, _) in enumerate(cases)], "i long, t string"
        )
        got = {
            r["i"]: r["lang"]
            for r in df.select(
                "i", lang_id_trigram("t").alias("lang")
            ).collect()
        }
        for i, (text, want) in enumerate(cases):
            assert got[i] == want, (text, got[i], want)

    def test_tie_breaks_deterministic_earliest_profile(self, spark):
        from incremental_github_data_pipeline_spark.operators.text import (
            TRIGRAM_PROFILES,
            lang_from_trigram_hits,
        )

        # equal hits for every language: earliest profile (en) wins;
        # all-zero yields 'und'
        df = spark.createDataFrame([(1,), (0,)], "h long")
        hits = {lang: F.col("h") for lang in TRIGRAM_PROFILES}
        got = [
            r["lang"]
            for r in df.select(
                lang_from_trigram_hits(hits, F.lit("latin")).alias("lang")
            ).orderBy(F.col("lang")).collect()
        ]
        assert sorted(got) == ["en", "und"]

    def test_script_prior_overrides_latin_hits(self, spark):
        from incremental_github_data_pipeline_spark.operators.text import (
            lang_id_trigram,
        )

        # mostly-Cyrillic text with a few Latin loanwords: the script
        # prior routes to ru even though en trigrams fire
        df = spark.createDataFrame(
            [("Российское правительство и the parliament",)], "t string"
        )
        assert df.select(
            lang_id_trigram("t").alias("lang")
        ).collect()[0]["lang"] == "ru"

    def test_no_profile_trigram_self_overlaps(self):
        # the replace-count identity (docs/oracle alternatives) and the
        # positional count agree only when no profile trigram can
        # overlap itself (t[0]==t[1]==t[2] or t[0]==t[2]); pin that
        # property of the shipped profiles
        from incremental_github_data_pipeline_spark.operators.text import (
            TRIGRAM_PROFILES,
        )

        for lang, profile in TRIGRAM_PROFILES.items():
            assert len(profile) == len(set(profile)), lang
            for t in profile:
                assert len(t) == 3 and t == t.lower(), (lang, t)
                assert t[0] != t[2], (lang, t)


def test_normalize_percent_encoding(spark):
    """RFC 3986 §2.3/§6.2.2: unreserved escapes decode, reserved
    escapes uppercase their hex, malformed escapes pass verbatim."""
    from incremental_github_data_pipeline_spark.operators.text import (
        canonicalize_url,
        normalize_percent_encoding,
        strip_tracking_params,
    )

    cases = {
        "http://Ex.com/%4a%2f%7e?q=%61%zz%": "http://Ex.com/J%2F~?q=a%zz%",
        "no-escapes": "no-escapes",
        "a%%41": "a%A",          # first % malformed, second decodes
        "%": "%",
        "%G1x": "%G1x",
        "u%c3%a9": "u%C3%A9",    # multibyte UTF-8 stays encoded, upper
        "%41%42%43": "ABC",
        "tail%3f": "tail%3F",    # '?' must NOT be conjured
        "%2d%2e%5f%7e": "-._~",  # the four unreserved marks
        "": "",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "i long, t string"
    )
    got = {
        r["i"]: r["n"]
        for r in df.select(
            "i", normalize_percent_encoding("t").alias("n")
        ).collect()
    }
    for i, (src, want) in enumerate(cases.items()):
        assert got[i] == want, (src, got[i], want)

    # composition order: %3F stays encoded so the canonicalizer's
    # query parse is unchanged; decoded %61 then dedups with the
    # plain spelling; trackers with encoded values still strip
    stack = df.limit(1).select(
        strip_tracking_params(
            canonicalize_url(
                normalize_percent_encoding(
                    F.lit("HTTP://A.COM:80/%7Euser?b=2&%61=1&fbclid=%58")
                )
            )
        ).alias("u")
    ).collect()[0]["u"]
    assert stack == "http://a.com/~user?a=1&b=2"


class TestCdcChunking:
    """Content-defined chunking (r13): boundary rule, reassembly,
    shift invariance — the property that makes chunk-level dedup
    collapse near-identical docs."""

    def test_reassembly_and_short_text(self, spark):
        from incremental_github_data_pipeline_spark.operators.text import (
            cdc_chunk_rows,
        )

        texts = [
            "the quick brown fox jumps over the lazy dog " * 8,
            "short",
            "",
            "exactly sixteen!",  # == window length
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        rows = cdc_chunk_rows(df).collect()
        by_doc = {}
        for r in sorted(rows, key=lambda r: (r["doc_id"], r["chunk_idx"])):
            by_doc.setdefault(r["doc_id"], []).append(r["chunk"])
        for i, t in enumerate(texts):
            assert "".join(by_doc[i]) == t, i
        assert by_doc[1] == ["short"]
        assert by_doc[2] == [""]

    def test_shift_invariance(self, spark):
        from incremental_github_data_pipeline_spark.operators.text import (
            cdc_split,
        )

        base = (
            "content defined chunking splits where the window hash "
            "vanishes modulo the mask so edits stay local " * 10
        )
        edited = "A COMPLETELY NEW PREFIX WAS INSERTED! " + base
        a, b = cdc_split(base), cdc_split(edited)
        # everything after the first boundary past the edit coincides
        common = 0
        for x, y in zip(reversed(a), reversed(b)):
            if x == y:
                common += 1
            else:
                break
        assert common >= len(a) - 2, (len(a), common)
        # chunk-level exact dedup collapses the shared tail: the
        # doc-level hashes differ, but all common-tail chunks are
        # byte-identical (and the repeated body dedups to a handful
        # of distinct chunks — the storage win CDC exists for)
        assert a[-common:] == b[-common:]
        assert len(set(a)) < len(a) // 4

    def test_boundary_rule_matches_python_reference(self):
        from incremental_github_data_pipeline_spark.operators.text import (
            CDC_MASK_BITS,
            CDC_MOD,
            CDC_POWERS,
            CDC_WINDOW,
            cdc_boundaries,
        )

        text = "abcdefghijklmnopqrstuvwxyz0123456789" * 4
        want = []
        for i in range(CDC_WINDOW, len(text) + 1):
            h = sum(
                ord(text[i - 1 - j]) * CDC_POWERS[j]
                for j in range(CDC_WINDOW)
            ) % CDC_MOD
            if h % (1 << CDC_MASK_BITS) == 0:
                want.append(i)
        assert cdc_boundaries(text) == want


class TestCdcClamped:
    """FastCDC-style min/max clamps (r14, VERDICT r13 task 4)."""

    def _naive(self, text, min_len, max_len):
        from incremental_github_data_pipeline_spark.operators.text import (
            cdc_boundaries,
        )

        if not text:
            return [""]
        hits = cdc_boundaries(text)
        out, s, n = [], 0, len(text)
        while s < n:
            cand = [
                h for h in hits
                if s + min_len <= h < s + max_len and h < n
            ]
            b = cand[0] if cand else min(s + max_len, n)
            out.append(text[s:b])
            s = b
        return out

    def test_matches_naive_walk_and_length_envelope(self):
        import random

        from incremental_github_data_pipeline_spark.operators.text import (
            cdc_split,
        )

        rng = random.Random(42)
        for trial in range(40):
            n = rng.randint(0, 1200)
            text = "".join(
                rng.choice("abcdefg hijklmno") for _ in range(n)
            )
            got = cdc_split(text, min_len=32, max_len=128)
            assert got == self._naive(text, 32, 128), trial
            assert "".join(got) == text
            for ch in got[:-1]:
                assert 32 <= len(ch) <= 128
            assert len(got[-1]) <= 128

    def test_degenerate_blob_forces_max_len_slabs(self):
        from incremental_github_data_pipeline_spark.operators.text import (
            cdc_split,
        )
        from incremental_github_data_pipeline_spark.queries.ext_text import (
            _CDC_BLOB_CHAR,
        )

        blob = _CDC_BLOB_CHAR * 1000
        # unclamped: the mask never fires -> one mega-chunk
        assert cdc_split(blob) == [blob]
        got = cdc_split(blob, min_len=32, max_len=128)
        assert [len(c) for c in got] == [128] * 7 + [104]

    def test_wide_clamp_degrades_to_pure_rule(self):
        from incremental_github_data_pipeline_spark.operators.text import (
            cdc_split,
        )

        text = "the quick brown fox jumps over the lazy dog " * 12
        assert cdc_split(text, min_len=1, max_len=10**9) == cdc_split(
            text
        )

    def test_param_validation(self, spark):
        import pytest

        from incremental_github_data_pipeline_spark.operators.text import (
            cdc_chunk_rows,
            cdc_split,
        )

        df = spark.createDataFrame(
            [(1, "x")], "doc_id long, text string"
        )
        with pytest.raises(ValueError, match="set together"):
            cdc_chunk_rows(df, min_len=32)
        with pytest.raises(ValueError, match="min_len <= max_len"):
            cdc_chunk_rows(df, min_len=9, max_len=3)
        with pytest.raises(ValueError, match="set together"):
            cdc_split("abc", max_len=128)

    def test_distributed_matches_local(self, spark):
        from incremental_github_data_pipeline_spark.operators.text import (
            cdc_chunk_rows,
            cdc_split,
        )

        texts = [
            "content defined chunking splits where the hash "
            "vanishes " * 9,
            "short",
            "",
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )
        rows = cdc_chunk_rows(df, min_len=24, max_len=96).collect()
        by_doc = {}
        for r in sorted(
            rows, key=lambda r: (r["doc_id"], r["chunk_idx"])
        ):
            by_doc.setdefault(r["doc_id"], []).append(r["chunk"])
        for i, t in enumerate(texts):
            assert by_doc[i] == cdc_split(t, min_len=24, max_len=96)
