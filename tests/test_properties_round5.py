"""Property-based invariants for the round-5 additions (hypothesis):
BPE merge learning vs a reference Python implementation, the weighted
sample vs its brute-force priority order, integer EWMA vs a plain
Python fold, MAD outliers vs a numpy replay, and the inverted index vs
collections.Counter.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

_word = st.text(alphabet="ab", min_size=1, max_size=4)
_corpus = st.lists(_word, min_size=1, max_size=20)


def _ref_bpe(words: list[str], n_merges: int):
    """Reference BPE (Sennrich et al.): explicit i-pointer greedy scan,
    structurally different from the operator's fold."""
    freq = Counter(words)
    seqs = {w: [c for c in w] for w in freq}
    merges = []
    for step in range(1, n_merges + 1):
        counts: Counter = Counter()
        for w, s in seqs.items():
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += freq[w]
        if not counts:
            break
        # deterministic tie-break: count desc, then (pa, pb) ascending
        top_cnt = max(counts.values())
        cands = sorted(k for k, v in counts.items() if v == top_cnt)
        pa, pb = cands[0]
        merges.append((step, pa, pb, top_cnt))
        for w, s in seqs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == pa and s[i + 1] == pb:
                    out.append(pa + pb)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return merges


@settings(max_examples=8, deadline=None)
@given(_corpus)
def test_bpe_merges_match_reference_scan(spark, words):
    from incremental_github_data_pipeline_spark.operators.text import (
        learn_bpe_merges,
    )

    df = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id long, text string"
    )
    got = [
        (r.step, r.pa, r.pb, r.cnt)
        for r in learn_bpe_merges(df, n_merges=3).orderBy("step").collect()
    ]
    assert got == _ref_bpe(words, 3)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 10**6), st.integers(1, 50)),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    ),
    st.integers(1, 5),
)
def test_weighted_sample_matches_brute_force(spark, rows, k):
    from incremental_github_data_pipeline_spark.operators.text import (
        weighted_sample_priority,
    )

    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = [
        r["doc_id"]
        for r in weighted_sample_priority(df, "doc_id", "w", k=k).collect()
    ]
    pri = sorted(
        (((i * 2654435761) % 2147483648) // w, i) for i, w in rows
    )
    assert got == [i for _, i in pri[:k]]


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(0, 10**6), min_size=1, max_size=40))
def test_ewma_matches_python_fold(spark, xs):
    from incremental_github_data_pipeline_spark.operators.timeseries import (
        ewma_integer,
    )

    df = spark.createDataFrame(
        [("k", i, x) for i, x in enumerate(xs)], "k string, i long, x long"
    )
    got = {
        r["i"]: r["ewma"]
        for r in ewma_integer(df, "k", "i", "x").collect()
    }
    r = None
    for i, x in enumerate(xs):
        r = x if r is None else (3 * x + 7 * r) // 10
        assert got[i] == r


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(-1000, 1000), min_size=1, max_size=30))
def test_mad_outliers_match_numpy_replay(spark, xs):
    from incremental_github_data_pipeline_spark.operators.timeseries import (
        mad_outliers,
    )

    df = spark.createDataFrame(
        [("k", x) for x in xs], "k string, x long"
    )
    row = mad_outliers(df, "k", "x", k=3).collect()[0]
    s = sorted(xs)
    med = s[(len(s) + 1) // 2 - 1]  # LOWER median
    d = sorted(abs(x - med) for x in xs)
    mad = d[(len(d) + 1) // 2 - 1]
    n_out = sum(1 for x in xs if abs(x - med) > 3 * mad)
    assert (row["med"], row["mad"], row["n_outliers"]) == (med, mad, n_out)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.lists(_word, min_size=1, max_size=8), min_size=1, max_size=6))
def test_inverted_index_matches_counter(spark, docs):
    from incremental_github_data_pipeline_spark.operators.text import (
        inverted_index,
    )

    df = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        (r["term"], r["rank"]): (r["doc_id"], r["tf"], r["df"], r["total_tf"])
        for r in inverted_index(df, top_docs=2, min_df=1).collect()
    }
    tf: dict[str, Counter] = {}
    for i, d in enumerate(docs):
        for w, c in Counter(d).items():
            tf.setdefault(w, Counter())[i] = c
    for term, posting in tf.items():
        ranked = sorted(posting.items(), key=lambda kv: (-kv[1], kv[0]))
        for rank, (doc, cnt) in enumerate(ranked[:2], start=1):
            assert got[(term, rank)] == (
                doc,
                cnt,
                len(posting),
                sum(posting.values()),
            )
    assert len(got) == sum(min(2, len(p)) for p in tf.values())
