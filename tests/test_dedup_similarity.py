"""operators.dedup / .similarity / .text — signature invariants and
recall/precision properties on constructed data (the query registry
covers the bulk paths at sf0.01)."""

from __future__ import annotations

from pyspark.sql import functions as F

from incremental_github_data_pipeline_spark.operators import dedup as dd
from incremental_github_data_pipeline_spark.operators import text as tx
from incremental_github_data_pipeline_spark.operators.similarity import (
    cosine_topk_bruteforce,
)

DOC = "the quick brown fox jumps over the lazy dog again and again today"
NEAR = DOC.replace("lazy", "sleepy")  # one token differs
FAR = "completely different content about spark shuffles and parquet files"


def _docs(spark):
    return spark.createDataFrame(
        [(1, DOC), (2, DOC), (3, NEAR), (4, FAR)], "id long, text string"
    )


def test_exact_dedup_keeps_min_id_and_is_idempotent(spark):
    df = _docs(spark)
    once = dd.exact_dedup(df, ["text"], "id")
    assert sorted(r["id"] for r in once.collect()) == [1, 3, 4]
    twice = dd.exact_dedup(once, ["text"], "id")
    assert sorted(r["id"] for r in twice.collect()) == [1, 3, 4]


def test_minhash_identical_docs_have_identical_signatures(spark):
    df = _docs(spark).select(
        "id", dd.minhash_signature(F.col("text"), num_hashes=32, k=3).alias("sig")
    )
    sigs = {r["id"]: tuple(r["sig"]) for r in df.collect()}
    assert sigs[1] == sigs[2]
    assert len(sigs[1]) == 32
    assert sigs[1] != sigs[4]


def test_minhash_candidates_find_dup_and_near_dup_not_far(spark):
    pairs = dd.minhash_candidate_pairs(
        _docs(spark), "id", "text", num_hashes=32, bands=8, k=3
    ).collect()
    by_pair = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in pairs}
    assert by_pair[(1, 2)] == 1.0  # exact dup: all signature slots agree
    assert (1, 4) not in by_pair and (2, 4) not in by_pair  # unrelated
    near = [p for p in by_pair if p in {(1, 3), (2, 3)}]
    assert near, "one-token-off doc must surface as a candidate"


def test_minhash_dedup_drops_only_losers(spark):
    out = dd.minhash_dedup(_docs(spark), "id", "text", threshold=0.9, k=3)
    assert sorted(r["id"] for r in out.collect()) == [1, 3, 4]


def test_simhash_invariants(spark):
    df = _docs(spark).select("id", dd.simhash(F.col("text")).alias("sh"))
    sh = {r["id"]: r["sh"] for r in df.collect()}
    assert sh[1] == sh[2]
    pairs = dd.simhash_candidate_pairs(_docs(spark), "id", "text", max_hamming=10)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    assert got[(1, 2)] == 0
    assert (1, 4) not in got or got[(1, 4)] > 10


def test_simhash_formulation_identical(spark):
    # r16: the single-aggregate mask-array simhash must be
    # BIT-IDENTICAL to the original 64-separate-aggregates form
    # (replayed here inline), including the sign bit and short docs
    from incremental_github_data_pipeline_spark.operators.text import (
        let_,
        tokens,
    )

    def simhash_reference(text_col, bits=64):
        def votes_to_hash(h):
            out = F.lit(0).cast("long")
            for b in range(bits):
                vote = F.aggregate(
                    h,
                    F.lit(0),
                    (
                        lambda bit: lambda acc, hv: acc
                        + F.when(
                            F.shiftright(hv, bit).bitwiseAND(F.lit(1))
                            == 1,
                            1,
                        ).otherwise(-1)
                    )(b),
                )
                bit_val = (1 << b) if b < 63 else -(1 << 63)
                out = out.bitwiseOR(
                    F.when(vote > 0, F.lit(bit_val).cast("long")).otherwise(
                        F.lit(0).cast("long")
                    )
                )
            return out

        return let_(
            F.transform(tokens(text_col), lambda w: F.xxhash64(w)),
            votes_to_hash,
        )

    rows = [
        (1, DOC),
        (2, FAR),
        (3, ""),
        (4, "one"),
        (5, "a b c d e f g h i j k l m n o p"),
        (6, "naïve café 北京 emoji 🙂 mixed"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = df.select(
        "id",
        dd.simhash(F.col("text")).alias("new"),
        simhash_reference(F.col("text")).alias("old"),
    ).collect()
    assert all(r["new"] == r["old"] for r in got)


def test_ngram_jaccard_bounds(spark):
    df = spark.createDataFrame([(DOC, DOC, FAR)], "a string, b string, c string")
    row = df.select(
        dd.ngram_jaccard(F.col("a"), F.col("b"), k=3).alias("same"),
        dd.ngram_jaccard(F.col("a"), F.col("c"), k=3).alias("diff"),
    ).collect()[0]
    assert row["same"] == 1.0
    assert row["diff"] == 0.0


def test_verified_near_dups_filters_below_threshold(spark):
    out = dd.verified_near_dups(
        _docs(spark), "id", "text", jaccard_threshold=0.999, k=3
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {(1, 2)}


def test_embedding_near_dups_planted_recall(spark):
    import random

    def vec(i):
        rng = random.Random(i)  # seeded gaussians: near-orthogonal in expectation
        return [rng.gauss(0, 1) for _ in range(16)]

    base = [(i, vec(i)) for i in range(40)]
    planted = [(i + 1000, [x * 1.0001 + 0.0001 for x in v]) for i, v in base[:10]]
    df = spark.createDataFrame(base + planted, "id long, v array<double>")
    pairs = dd.embedding_near_dups(
        df, "id", "v", threshold=0.999, n_planes=16, bands=4
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert got == {(i, i + 1000) for i in range(10)}


def test_cosine_topk_rank1_is_self(spark):
    df = spark.createDataFrame(
        [(i, [float(i + 1), float(2 * i + 1), 1.0]) for i in range(8)],
        "id long, v array<double>",
    )
    queries = df.limit(3).withColumnRenamed("id", "qid")
    out = cosine_topk_bruteforce(df, queries, "id", "qid", "v", k=3)
    rank1 = {r["qid"]: r["cosine"] for r in out.filter(F.col("rank") == 1).collect()}
    assert all(abs(c - 1.0) < 1e-12 for c in rank1.values())


def test_arrow_topk_agrees_with_expression_path(spark):
    """The BLAS lane and the expression lane must produce identical
    (query, rank) → corpus assignments on real data."""
    from incremental_github_data_pipeline_spark.sources.readers import read_table

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    corpus = emb.select(F.col("vec_id").alias("cid"), "embedding")
    args = dict(corpus_id="cid", query_id="qid", vec_col="embedding", k=5)
    expr = cosine_topk_bruteforce(corpus, queries, **args)
    from incremental_github_data_pipeline_spark.operators.similarity import (
        cosine_topk_arrow,
    )

    arrow = cosine_topk_arrow(corpus, queries, **args)
    key = lambda df: {(r["qid"], r["rank"]): r["cid"] for r in df.collect()}  # noqa: E731
    assert key(expr) == key(arrow)


def test_lang_id_and_quality(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is in the house and it is warm"),
            (2, "der Hund ist nicht mit der Katze auf dem Sofa"),
            (3, "这是一个中文句子"),
            (4, "zzz qqq xxx"),
        ],
        "id long, text string",
    )
    got = {r["id"]: r["lang"] for r in df.select("id", tx.lang_id("text").alias("lang")).collect()}
    assert got == {1: "en", 2: "de", 3: "zh", 4: "und"}
    q = df.select("id", tx.quality_ok("text", min_tokens=5).alias("ok")).collect()
    assert {r["id"]: r["ok"] for r in q}[4] is False


def test_fingerprint_stability(spark):
    df = _docs(spark).select("id", tx.fingerprint("text", k=3).alias("fp"))
    fp = {r["id"]: r["fp"] for r in df.collect()}
    assert fp[1] == fp[2]
    assert fp[1] != fp[4]


def test_chunk_documents_windows_and_overlap(spark):
    doc = " ".join(f"w{i}" for i in range(30))  # 30 tokens
    df = spark.createDataFrame([(1, doc), (2, "short doc")], "doc_id long, text string")
    out = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["chunk_tokens"])
        for r in tx.chunk_documents(df, chunk_size=16, step=12).collect()
    }
    # 30 tokens, stride 12 → ceil(30/12)=3 chunks: [0:16], [12:28], [24:30]
    assert set(out) == {(1, 0), (1, 1), (1, 2), (2, 0)}
    assert out[(1, 0)][1] == 16 and out[(1, 0)][0].startswith("w0 w1 ")
    assert out[(1, 1)][0].startswith("w12 ")  # 4-token overlap with chunk 0
    assert out[(1, 2)] == ("w24 w25 w26 w27 w28 w29", 6)
    assert out[(2, 0)] == ("short doc", 2)  # short doc → one whole chunk


def test_redact_and_counts(spark):
    df = spark.createDataFrame(
        [(1, "mail me at a.b@example.com or visit https://x.io/page now")],
        "id long, text string",
    )
    row = df.select(
        tx.redact("text").alias("red"), *[
            c.alias(n) for n, c in tx.redaction_counts("text").items()
        ]
    ).collect()[0]
    assert row["red"] == "mail me at [REDACTED] or visit [REDACTED] now"
    assert (row["email"], row["url"], row["phone"]) == (1, 1, 0)


def test_redact_typed_placeholders_and_lane_order(spark):
    df = spark.createDataFrame(
        [
            (1, "a.b@example.com then https://x.io/p then +1 555-010-9999"),
            (2, "clean text with no pii at all"),
        ],
        "id long, text string",
    )
    got = {
        r["id"]: r["red"]
        for r in df.select(
            "id", tx.redact_typed("text").alias("red")
        ).collect()
    }
    assert got[1] == "<EMAIL> then <URL> then <PHONE>"
    assert got[2] == "clean text with no pii at all"
    # email-inside-URL: the email lane fires first (inside the URL),
    # then the url lane eats what remains — nothing is double-counted
    # and no raw address survives
    df2 = spark.createDataFrame(
        [(1, "see https://x.io/u?mail=a.b@example.com ok")],
        "id long, text string",
    )
    red = df2.select(tx.redact_typed("text").alias("r")).collect()[0]["r"]
    assert "@" not in red and red.endswith(" ok")


def test_assign_split_fractions(spark):
    df = spark.range(1000).select(F.col("id"))
    got = {
        r["split"]: r["n"]
        for r in df.select(tx.assign_split("id").alias("split"))
        .groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == {"train": 800, "val": 100, "test": 100}


def test_quantize_embeddings_lattice_and_error_bound(spark):
    """floor-quantization invariants: ints in [-127, 127], and the
    dequantized vector is within one lattice step of the normalized
    original in every dimension."""
    from incremental_github_data_pipeline_spark.operators import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = sim.quantize_embeddings(emb.limit(50)).select(
        "embedding", "q_scale", "q"
    ).collect()
    import math

    for r in rows:
        v = [float(x) for x in r["embedding"]]
        n = math.sqrt(sum(x * x for x in v))
        nv = [x / n for x in v] if n > 0 else v
        assert all(-127 <= qi <= 127 for qi in r["q"])
        s = r["q_scale"]
        assert s > 0
        for x, qi in zip(nv, r["q"]):
            assert qi == max(-127, min(127, math.floor(x * s)))
            assert abs(x - qi / s) <= 1.0 / s + 1e-12


def test_quantized_topk_recall_vs_bruteforce(spark):
    """int8 ranking vs float cosine ranking. This corpus is random
    vectors, so rank-5/rank-6 cosine margins are razor-thin — the
    worst case for any quantizer; structured real embeddings separate
    far better. Pin (a) recall@5 above the random-corpus floor and
    (b) the stronger window property: every quantized top-5 hit sits
    inside the exact top-15."""
    from pyspark.sql import functions as F

    from incremental_github_data_pipeline_spark.operators import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.select(F.col("vec_id").alias("corpus_id"), "embedding")
    exact15 = sim.cosine_topk_bruteforce(
        corpus, queries, corpus_id="corpus_id", query_id="query_id",
        vec_col="embedding", k=15,
    )
    quant = sim.quantized_topk(
        corpus, queries, corpus_id="corpus_id", query_id="query_id",
        vec_col="embedding", k=5,
    )
    exact_rows = exact15.collect()
    e15 = {(r["query_id"], r["corpus_id"]) for r in exact_rows}
    e5 = {
        (r["query_id"], r["corpus_id"]) for r in exact_rows if r["rank"] <= 5
    }
    q5 = {(r["query_id"], r["corpus_id"]) for r in quant.collect()}
    assert len(q5) == 40
    recall = len(e5 & q5) / len(e5)
    assert recall >= 0.7, f"quantized recall@5 = {recall}"
    assert q5 <= e15, f"quantized hits outside exact top-15: {q5 - e15}"


# ---------------------------------------------------------------------------
# semantic_dedup (SemDeDup shape)
# ---------------------------------------------------------------------------


def _planted_embeddings(spark, n=40, dim=8, n_dups=5):
    """Deterministic pseudo-random vectors + exact copies of the first
    n_dups ids (copy id = orig id + 1000)."""
    import math

    rows = []
    for i in range(n):
        v = [math.sin(1.0 + i * dim + d) for d in range(dim)]
        rows.append((i, v))
        if i < n_dups:
            rows.append((i + 1000, list(v)))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semantic_dedup_recovers_planted_exact_copies(spark):
    from incremental_github_data_pipeline_spark.operators.similarity import (
        semantic_dedup,
    )

    df = _planted_embeddings(spark)
    pairs = semantic_dedup(
        df, "vec_id", "embedding", threshold=0.999999, n_cells=4
    ).collect()
    # identical vectors always share a cell (deterministic argmax over
    # the same centroid model) → every planted pair is recovered, and
    # nothing else clears the near-1 threshold on sin-lattice vectors
    found = {(r["id_keep"], r["id_drop"]) for r in pairs}
    assert found == {(i, i + 1000) for i in range(5)}
    for r in pairs:
        assert r["cosine"] > 0.999999


def test_semantic_dedup_comparisons_are_cell_bounded(spark):
    from incremental_github_data_pipeline_spark.operators.similarity import (
        semantic_dedup,
    )

    df = _planted_embeddings(spark, n_dups=0)
    # threshold -1 keeps every compared pair → the row count IS the
    # number of comparisons; must be Σ|cell|²/2-ish, strictly < n²/2
    pairs = semantic_dedup(df, "vec_id", "embedding", threshold=-1.0, n_cells=4)
    n = df.count()
    assert 0 < pairs.count() < n * (n - 1) / 2


def test_refine_centroids_monotone_and_shape(spark):
    """Lloyd refinement must (a) keep the model shape (same cells, same
    dim), (b) never decrease the total assignment similarity, and (c)
    carry dead cells forward instead of shrinking the model."""
    from incremental_github_data_pipeline_spark.operators.similarity import (
        _centroid_literal,
        as_double_vec,
        cosine_similarity,
        pick_centroids,
        refine_centroids,
    )

    df = _planted_embeddings(spark, n=60, dim=8, n_dups=0)

    def total_sim(cent_rows):
        cent = _centroid_literal(cent_rows)
        v = as_double_vec("embedding")
        best = F.array_max(
            F.transform(
                cent,
                lambda s: F.struct(
                    cosine_similarity(v, s["cent"]).alias("sim"),
                    s["cell"].alias("cell"),
                ),
            )
        )
        return df.select(best["sim"].alias("s")).agg(F.sum("s")).first()[0]

    seeds = pick_centroids(df, "embedding", 4, "vec_id")
    refined = refine_centroids(df, "embedding", seeds, n_iter=3)
    assert [c for c, _ in refined] == [c for c, _ in seeds]
    assert all(len(v) == 8 for _, v in refined)
    assert total_sim(refined) >= total_sim(seeds) - 1e-9


def test_ivf_refined_recall_not_worse(spark):
    """Refined cells must not hurt IVF recall vs brute force on the
    planted-embedding set (same n_probe)."""
    from incremental_github_data_pipeline_spark.operators.similarity import (
        ivf_topk,
    )

    df = _planted_embeddings(spark, n=50, dim=8, n_dups=0)
    corpus = df.selectExpr("vec_id as corpus_id", "embedding")
    queries = df.filter(F.col("vec_id") < 4).selectExpr(
        "vec_id as query_id", "embedding"
    )

    def hits(refine_iters):
        out = ivf_topk(
            corpus, queries, "corpus_id", "query_id", "embedding",
            k=3, n_cells=4, n_probe=2, refine_iters=refine_iters,
        )
        return {(r["query_id"], r["corpus_id"]) for r in out.collect()}

    base, refined = hits(0), hits(2)
    # each query must at minimum still find itself
    for q in range(4):
        assert (q, q) in refined
    assert len(refined) >= len(base) - 2  # no recall collapse


def test_quantized_pool_mergeable_and_exact(spark):
    """The pooled state must be mergeable by plain addition: pooling two
    shards and summing their states equals pooling the union (exact
    integer arithmetic, no float drift)."""
    from incremental_github_data_pipeline_spark.operators.similarity import (
        quantized_pool,
    )

    df = _planted_embeddings(spark, n=30, dim=8, n_dups=0).withColumn(
        "grp", (F.col("vec_id") % 3).cast("int")
    )
    shard_a = df.filter(F.col("vec_id") < 15)
    shard_b = df.filter(F.col("vec_id") >= 15)
    whole = {
        (r["grp"], r["dim"]): (r["q_sum"], r["n_vecs"])
        for r in quantized_pool(df, "grp").collect()
    }
    merged: dict = {}
    for shard in (shard_a, shard_b):
        for r in quantized_pool(shard, "grp").collect():
            k = (r["grp"], r["dim"])
            s, n = merged.get(k, (0, 0))
            merged[k] = (s + r["q_sum"], n + r["n_vecs"])
    assert merged == whole


def test_contained_docs_excerpt_identical_and_none(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta eps zeta eta theta"),
            (2, "beta gamma delta eps zeta"),     # verbatim excerpt of 1
            (3, "alpha beta gamma delta eps zeta eta theta"),  # identical to 1
            (4, "totally unrelated words here now"),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r["contained_id"], r["container_id"])
        for r in dd.contained_docs(df, "doc_id", "text", k=3).collect()
    }
    # excerpt contained in both copies; identical pair reports larger id
    assert (2, 1) in pairs and (2, 3) in pairs
    assert (3, 1) in pairs and (1, 3) not in pairs
    assert not any(a == 4 or b == 4 for a, b in pairs)


def test_contained_docs_short_doc_lane_and_token_alignment(spark):
    """Round-3 ADVICE closure: (a) docs with fewer than k tokens are
    found via the broadcast lane instead of silently missed; (b) the
    contract is token-aligned — character-level substrings crossing a
    token boundary must NOT match."""
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta eps zeta"),
            (2, "beta gamma"),          # 2 tokens < k=3: short lane
            (3, "gamma"),               # 1 token: short lane
            (4, "lpha beta"),           # char substring, not token-aligned
            (5, "  beta   gamma  "),    # whitespace-normalized duplicate of 2
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r["contained_id"], r["container_id"])
        for r in dd.contained_docs(df, "doc_id", "text", k=3).collect()
    }
    assert (2, 1) in pairs and (3, 1) in pairs          # short-lane recall
    assert not any(a == 4 for a, b in pairs)            # token alignment
    assert (5, 2) in pairs and (2, 5) not in pairs      # normalized tie rule
    # lane off: short docs silently skipped (documented opt-out)
    off = {
        (r["contained_id"], r["container_id"])
        for r in dd.contained_docs(
            df, "doc_id", "text", k=3, short_doc_lane=False
        ).collect()
    }
    assert not any(a in (2, 3, 5) for a, _ in off)


# ---------------------------------------------------------------------------
# Product quantization (round 4)
# ---------------------------------------------------------------------------


def _pq_corpus(spark, n=64, dim=16, seed=9):
    import numpy as np

    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, dim))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    return spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "corpus_id long, embedding array<double>",
    )


def test_pq_train_deterministic_and_shaped(spark):
    from incremental_github_data_pipeline_spark.operators import similarity as sim

    corpus = _pq_corpus(spark)
    cb1 = sim.pq_train(corpus, "embedding", "corpus_id", m_sub=4, ksub=8)
    cb2 = sim.pq_train(corpus, "embedding", "corpus_id", m_sub=4, ksub=8)
    assert len(cb1) == 4
    for a, b in zip(cb1, cb2):
        assert a.shape == (8, 4) and (a == b).all()


def test_pq_train_rejects_indivisible_dim(spark):
    import pytest as _pytest

    from incremental_github_data_pipeline_spark.operators import similarity as sim

    with _pytest.raises(ValueError, match="not divisible"):
        sim.pq_train(_pq_corpus(spark, dim=10), "embedding", "corpus_id", m_sub=4)


def test_pq_topk_self_and_planted_copy(spark):
    from incremental_github_data_pipeline_spark.operators import similarity as sim

    corpus = _pq_corpus(spark)
    planted = corpus.filter(F.col("corpus_id") < 4).select(
        (F.col("corpus_id") + 1000).alias("corpus_id"),
        F.transform(
            "embedding", lambda x, d: x * (1.0 + 0.005 * (d % 3).cast("double"))
        ).alias("embedding"),
    )
    queries = corpus.filter(F.col("corpus_id") < 4).select(
        F.col("corpus_id").alias("query_id"), "embedding"
    )
    out = sim.pq_topk(
        corpus.unionByName(planted), queries, k=3, m_sub=4, ksub=8
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], {})[r["rank"]] = r["corpus_id"]
    for q, ranks in by_q.items():
        assert len(ranks) == 3
        assert ranks[1] == q          # exact self reconstructs to the max score
        assert ranks[2] == q + 1000   # near-copy right behind it


def test_pq_recall_tracks_bruteforce_on_clustered_data(spark):
    """On clustered data (where ANN is actually used) PQ recall must be
    high — the random-noise corpus recall floor is not the operative
    regime. Build 8 tight clusters; queries must retrieve mostly
    same-cluster members."""
    import numpy as np

    from incremental_github_data_pipeline_spark.operators import similarity as sim

    rng = np.random.default_rng(3)
    centers = rng.normal(size=(8, 16))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(96):
        v = centers[i % 8] + 0.05 * rng.normal(size=16)
        v /= np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
    corpus = spark.createDataFrame(rows, "corpus_id long, embedding array<double>")
    queries = corpus.filter(F.col("corpus_id") < 8).select(
        F.col("corpus_id").alias("query_id"), "embedding"
    )
    k = 5
    approx = sim.pq_topk(corpus, queries, k=k, m_sub=4, ksub=16).collect()
    ap = {}
    for r in approx:
        ap.setdefault(r["query_id"], set()).add(r["corpus_id"])
    # within-cluster fine ordering sits below PQ's resolution by design
    # (distortion ~ cluster radius); the ANN contract at this granularity
    # is that neighbors come from the query's CLUSTER, not noise
    hit = [
        sum(1 for c in ap[q] if c % 8 == q % 8) / k for q in sorted(ap)
    ]
    assert len(ap) == 8 and all(len(v) == k for v in ap.values())
    assert sum(hit) / len(hit) >= 0.9, hit


# ---------------------------------------------------------------------------
# Paragraph-level dedup (round 4)
# ---------------------------------------------------------------------------


def test_paragraph_dedup_drops_repeats_keeps_first(spark):
    blk_a = " ".join(f"a{i}" for i in range(4))
    blk_b = " ".join(f"b{i}" for i in range(4))
    blk_c = " ".join(f"c{i}" for i in range(4))
    df = spark.createDataFrame(
        [
            (1, f"{blk_a} {blk_b}"),          # blocks [a, b]
            (2, f"{blk_a} {blk_c}"),          # a repeats -> drop, keep c
            (3, blk_b),                       # b repeats -> doc empties
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in tx.paragraph_dedup(df, block_tokens=4).collect()
    }
    assert out[1]["n_blocks"] == 2 and out[1]["kept_blocks"] == 2
    assert out[1]["new_text"] == f"{blk_a} {blk_b}"
    assert out[2]["kept_blocks"] == 1 and out[2]["new_text"] == blk_c
    assert out[3]["kept_blocks"] == 0 and out[3]["new_text"] == ""
    assert out[3]["new_n_chars"] == 0


def test_paragraph_dedup_within_doc_and_partial_blocks(spark):
    blk = "x1 x2 x3 x4"
    df = spark.createDataFrame(
        [(7, f"{blk} {blk} tail")], "doc_id long, text string"
    )
    out = tx.paragraph_dedup(df, block_tokens=4).collect()[0]
    # blocks: [blk, blk, 'tail'] -> the second blk occurrence drops
    assert out["n_blocks"] == 3 and out["kept_blocks"] == 2
    assert out["new_text"] == f"{blk} tail"


def test_paragraph_dedup_idempotent(spark):
    df = spark.createDataFrame(
        [(1, "p q r s p q r s"), (2, "p q r s z z z z")],
        "doc_id long, text string",
    )
    once = tx.paragraph_dedup(df, block_tokens=4)
    again = tx.paragraph_dedup(
        once.select(F.col("doc_id"), F.col("new_text").alias("text")),
        block_tokens=4,
    )
    a = {r["doc_id"]: r["new_text"] for r in once.collect()}
    b = {r["doc_id"]: r["new_text"] for r in again.collect()}
    assert a == b


# ---------------------------------------------------------------------------
# Bloom-filter pre-filter (round 4)
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives_and_fp_bound(spark):
    corpus = spark.createDataFrame(
        [(f"member-{i}",) for i in range(300)], "key string"
    )
    batch = spark.createDataFrame(
        [(f"member-{i}",) for i in range(300)]
        + [(f"novel-{i}",) for i in range(700)],
        "key string",
    )
    out = dd.bloom_prefilter_new(
        batch, corpus, key_col="key", n_bits=1 << 14, n_hashes=4
    ).collect()
    members = [r for r in out if r["key"].startswith("member")]
    novel = [r for r in out if r["key"].startswith("novel")]
    assert all(r["bloom_maybe"] for r in members)  # NEVER a false negative
    fp = sum(1 for r in novel if r["bloom_maybe"])
    # 300 keys * 4 hashes in 16384 bits -> fp ~ (1200/16384)^4 ~ 3e-5
    assert fp / len(novel) <= 0.02, fp


def test_bloom_high_word_bits_survive_signed_longs(spark):
    """Positions in the top word / bit 63 region must round-trip through
    the signed-long literal array."""
    corpus = spark.createDataFrame(
        [(f"k{i}",) for i in range(2000)], "key string"
    )
    # tiny filter: 128 bits across 2 words -> every bit position,
    # including 63 and 127, is exercised with near-certainty
    out = dd.bloom_prefilter_new(
        corpus, corpus, key_col="key", n_bits=128, n_hashes=2
    ).collect()
    assert all(r["bloom_maybe"] for r in out)


def test_bloom_rejects_unaligned_bits(spark):
    import pytest as _pytest

    corpus = spark.createDataFrame([("a",)], "key string")
    with _pytest.raises(ValueError, match="multiple of 64"):
        dd.build_bloom(corpus, "key", n_bits=100)


def test_minhash_join_cross_corpus_only(spark):
    """Within-side near-dups must NOT appear; planted cross-corpus
    copies must."""
    left = spark.createDataFrame(
        [(1, DOC), (2, DOC), (3, FAR)], "id_l long, text string"
    )  # 1 and 2 are identical WITHIN left
    right = spark.createDataFrame(
        [(10, DOC), (11, "unrelated words entirely here about nothing shared")],
        "id_r long, text string",
    )
    out = dd.minhash_join(
        left, right, id_left="id_l", id_right="id_r", threshold=0.8
    ).collect()
    pairs = {(r["id_l"], r["id_r"]) for r in out}
    assert pairs == {(1, 10), (2, 10)}
    for r in out:
        assert r["jaccard"] == 1.0


def test_minhash_join_unverified_returns_estimates(spark):
    left = spark.createDataFrame([(1, DOC)], "id_l long, text string")
    right = spark.createDataFrame([(9, DOC)], "id_r long, text string")
    out = dd.minhash_join(
        left, right, id_left="id_l", id_right="id_r", threshold=None
    ).collect()
    # identical text -> identical signature -> every band collides
    assert len(out) == 1 and out[0]["est_jaccard"] == 1.0


def test_pq_arrow_encode_matches_expression(spark):
    """The Arrow/numpy encode lane replays the expression path's exact
    left-fold arithmetic — reconstructions must be bit-identical, not
    merely close."""
    from incremental_github_data_pipeline_spark.operators import similarity as sim

    corpus = _pq_corpus(spark, n=48)
    cbs = sim.pq_train(corpus, "embedding", "corpus_id", m_sub=4, ksub=8)
    expr = {
        r["corpus_id"]: r["_recon"]
        for r in corpus.select(
            "corpus_id",
            sim.pq_reconstruct("embedding", cbs).alias("_recon"),
        ).collect()
    }
    arrow = {
        r["corpus_id"]: r["_recon"]
        for r in sim.pq_encode_arrow(
            corpus, "embedding", "corpus_id", cbs
        ).collect()
    }
    assert set(expr) == set(arrow)
    for cid, vec in expr.items():
        assert vec == arrow[cid]  # exact float equality, elementwise


def test_allpairs_join_exact_and_threshold_edge(spark):
    """AllPairs prefix filtering must be lossless, and the integer
    threshold test must include pairs at EXACTLY the threshold."""
    from incremental_github_data_pipeline_spark.operators import dedup as dd

    shared = [f"t{i}" for i in range(14)]
    rows = [
        (1, " ".join(shared + ["x1", "x2", "x3"])),      # 17 tokens
        (2, " ".join(shared + ["y1", "y2", "y3"])),      # J(1,2)=14/20=0.70
        (3, " ".join(shared[:7] + [f"z{i}" for i in range(10)])),  # J low
        (4, " ".join(shared + ["x1", "x2", "x3"]) + " "),  # dup of 1 (ws)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dd.allpairs_jaccard_join(df, threshold_pct=70).collect()
    }
    assert set(out) == {(1, 2), (1, 4), (2, 4)}
    assert out[(1, 2)] == 14 / 20  # exact threshold kept
    assert out[(1, 4)] == 1.0      # identical token sets


def test_exact_dup_groups_counts_and_keeper(spark):
    from incremental_github_data_pipeline_spark.operators.dedup import (
        exact_dup_groups,
    )

    df = spark.createDataFrame(
        [(1, "same"), (5, "same"), (3, "same"), (2, "other")],
        "doc_id long, text string",
    )
    got = {
        (r["keeper_id"], r["n_copies"])
        for r in exact_dup_groups(df, ["text"], "doc_id").collect()
    }
    assert got == {(1, 3), (2, 1)}  # min-id representative, copy counts


def test_pq_codebooks_persist_bit_exactly(spark, tmp_path):
    from incremental_github_data_pipeline_spark.operators import similarity as sim

    corpus = _pq_corpus(spark, n=48)
    cbs = sim.pq_train(corpus, "embedding", "corpus_id", m_sub=4, ksub=8)
    path = str(tmp_path / "pq_model")
    sim.save_pq_codebooks(spark, cbs, path)
    loaded = sim.load_pq_codebooks(spark, path)
    assert len(loaded) == len(cbs)
    for a, b in zip(cbs, loaded):
        assert (a == b).all()  # exact float64 round-trip
    # querying with the loaded model is bit-identical to the fresh one
    q = corpus.limit(2).withColumnRenamed("corpus_id", "query_id")
    fresh = sim.pq_topk(corpus, q, k=3, m_sub=4, ksub=8, codebooks=cbs)
    reused = sim.pq_topk(corpus, q, k=3, m_sub=4, ksub=8, codebooks=loaded)
    assert [tuple(r) for r in fresh.collect()] == [
        tuple(r) for r in reused.collect()
    ]


class TestRrfFuse:
    """Reciprocal-rank fusion: hand-computed hybrid ordering."""

    def test_both_lanes_beat_single_lane(self, spark):
        from incremental_github_data_pipeline_spark.operators import (
            similarity as sim,
        )

        lex = spark.createDataFrame(
            [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
            "query_id long, doc_id long, rank long",
        )
        sem = spark.createDataFrame(
            [(1, 11, 1), (1, 13, 2)],
            "query_id long, doc_id long, rank long",
        )
        rows = (
            sim.rrf_fuse(lex, sem, k0=60, k=10).orderBy("rank").collect()
        )
        # 11: 1/62 + 1/61 ≈ .0325 beats 10: 1/61 ≈ .0164,
        # then 13: 1/62, then 12: 1/63
        assert [r["doc_id"] for r in rows] == [11, 10, 13, 12]
        assert rows[0]["lex_rank"] == 2 and rows[0]["sem_rank"] == 1
        assert rows[1]["sem_rank"] is None  # lex-only doc
        assert rows[2]["lex_rank"] is None  # sem-only doc

    def test_equal_scores_tie_break_by_id(self, spark):
        from incremental_github_data_pipeline_spark.operators import (
            similarity as sim,
        )

        lex = spark.createDataFrame(
            [(1, 20, 1)], "query_id long, doc_id long, rank long"
        )
        sem = spark.createDataFrame(
            [(1, 7, 1)], "query_id long, doc_id long, rank long"
        )
        rows = sim.rrf_fuse(lex, sem, k0=60, k=10).orderBy("rank").collect()
        # identical 1/61 scores -> id asc
        assert [(r["rank"], r["doc_id"]) for r in rows] == [(1, 7), (2, 20)]

    def test_k_truncates(self, spark):
        from incremental_github_data_pipeline_spark.operators import (
            similarity as sim,
        )

        lex = spark.createDataFrame(
            [(1, d, d) for d in range(1, 9)],
            "query_id long, doc_id long, rank long",
        )
        sem = lex.limit(0)
        assert sim.rrf_fuse(lex, sem, k=3).count() == 3


class TestClusterSafeSplit:
    def test_no_pair_straddles_splits(self, spark):
        docs = spark.createDataFrame(
            [(i, f"doc {i}") for i in range(40)], "doc_id long, text string"
        )
        # chain 0~1~2 plus pair (10, 35): 35 % 100 = 35 -> train bucket,
        # but its rep is 10 -> same split as 10 whatever that is
        pairs = spark.createDataFrame(
            [(0, 1), (1, 2), (10, 35)], "id_a long, id_b long"
        )
        out = {
            r["doc_id"]: (r["rep"], r["split"])
            for r in dd.cluster_safe_split(docs, pairs).collect()
        }
        assert out[0] == out[1] == out[2] == (0, "train")
        assert out[10] == out[35]  # the leakage guard
        # singleton keys on its own id
        assert out[7][0] == 7
        assert len(out) == 40

    def test_split_fractions_follow_rep_buckets(self, spark):
        docs = spark.createDataFrame(
            [(i, "x") for i in range(100)], "doc_id long, text string"
        )
        pairs = spark.createDataFrame([], "id_a long, id_b long")
        out = dd.cluster_safe_split(docs, pairs).groupBy("split").count()
        got = {r["split"]: r["count"] for r in out.collect()}
        assert got == {"train": 80, "val": 10, "test": 10}


class TestRankingMetrics:
    def test_hand_computed_recall_and_mrr(self, spark):
        from incremental_github_data_pipeline_spark.operators.similarity import (
            ranking_metrics,
        )

        results = spark.createDataFrame(
            # q1: relevant at ranks 2 and 5 (of 3 relevant)
            [(1, 10, 1), (1, 11, 2), (1, 12, 3), (1, 13, 4), (1, 14, 5),
             # q2: nothing relevant retrieved
             (2, 20, 1), (2, 21, 2),
             # q3 retrieves beyond k only (rank 6 filtered at k=5)
             (3, 30, 6)],
            "query_id long, doc_id long, rank long",
        )
        qrels = spark.createDataFrame(
            [(1, 11), (1, 14), (1, 99), (2, 77), (3, 30)],
            "query_id long, doc_id long",
        )
        got = {
            r["query_id"]: r
            for r in ranking_metrics(results, qrels, k=5).collect()
        }
        assert (got[1]["n_rel"], got[1]["hits_at_k"]) == (3, 2)
        assert got[1]["recall_at_k_s"] == 2 * 10**6 // 3
        assert got[1]["mrr_s"] == 10**6 // 2  # first hit at rank 2
        assert (got[2]["hits_at_k"], got[2]["mrr_s"]) == (0, 0)
        # q3's only relevant doc sits past k: counted as a miss
        assert (got[3]["hits_at_k"], got[3]["recall_at_k_s"]) == (0, 0)

    def test_duplicate_qrels_do_not_double_count(self, spark):
        from incremental_github_data_pipeline_spark.operators.similarity import (
            ranking_metrics,
        )

        results = spark.createDataFrame(
            [(1, 10, 1)], "query_id long, doc_id long, rank long"
        )
        qrels = spark.createDataFrame(
            [(1, 10), (1, 10)], "query_id long, doc_id long"
        )
        [r] = ranking_metrics(results, qrels, k=5).collect()
        assert (r["n_rel"], r["hits_at_k"], r["recall_at_k_s"]) == (
            1, 1, 10**6,
        )


class TestKeepBestOfCluster:
    """r13: near-dup dedup keeping the highest-quality copy."""

    def test_best_wins_ties_to_min_id_singletons_kept(self, spark):
        from incremental_github_data_pipeline_spark.operators.dedup import (
            keep_best_of_cluster,
        )

        docs = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 30), (3, "c", 30), (9, "z", 5),
             (4, "d", 7), (5, "e", 9)],
            "doc_id long, text string, q long",
        )
        comps = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4)],
            "id long, component long",
        )
        got = {
            r["doc_id"]: r
            for r in keep_best_of_cluster(docs, comps, "q").collect()
        }
        # cluster 1: q ties at 30 -> min id 2; cluster 4: 5 wins;
        # singleton 9 keeps itself
        assert set(got) == {2, 5, 9}
        assert got[2]["n_docs"] == 3 and got[2]["component"] == 1
        assert got[5]["n_docs"] == 2
        assert got[9]["n_docs"] == 1 and got[9]["component"] == 9
        # full input columns survive
        assert got[2]["text"] == "b" and got[2]["q"] == 30

    def test_composes_with_connected_components(self, spark):
        from incremental_github_data_pipeline_spark.operators.dedup import (
            connected_components,
            gram_overlap_pairs,
            keep_best_of_cluster,
        )

        base = "alpha beta gamma delta epsilon zeta eta theta"
        docs = spark.createDataFrame(
            [
                (1, base, 10),
                (2, base + " extra", 20),        # near-dup of 1, better
                (3, "totally different words here entirely now", 5),
            ],
            "doc_id long, text string, q long",
        )
        pairs = gram_overlap_pairs(docs, "doc_id", "text", k=5)
        cc = connected_components(pairs)
        kept = sorted(
            r["doc_id"]
            for r in keep_best_of_cluster(docs, cc, "q").collect()
        )
        assert kept == [2, 3]

    def test_non_orderable_payload_columns_survive(self, spark):
        """ADVICE r13: the payload row rides OUTSIDE the max_by
        ordering key, so a MapType column (non-orderable — the old
        MAX-of-struct form failed analysis on it) passes through."""
        from incremental_github_data_pipeline_spark.operators.dedup import (
            keep_best_of_cluster,
        )

        docs = spark.createDataFrame(
            [(1, {"k": "v1"}, 10), (2, {"k": "v2"}, 30)],
            "doc_id long, meta map<string,string>, q long",
        )
        comps = spark.createDataFrame(
            [(1, 1), (2, 1)], "id long, component long"
        )
        [r] = keep_best_of_cluster(docs, comps, "q").collect()
        assert r["doc_id"] == 2 and r["meta"] == {"k": "v2"}

    def test_long_min_value_id_does_not_overflow(self, spark):
        """ADVICE r13: the tie-break negates on DECIMAL(38,0), so
        Long.MIN_VALUE (whose long negation overflows to itself)
        still orders BELOW every other id on ties."""
        from incremental_github_data_pipeline_spark.operators.dedup import (
            keep_best_of_cluster,
        )

        lo = -(2**63)
        docs = spark.createDataFrame(
            [(lo, 30), (5, 30)], "doc_id long, q long"
        )
        comps = spark.createDataFrame(
            [(lo, lo), (5, lo)], "id long, component long"
        )
        [r] = keep_best_of_cluster(docs, comps, "q").collect()
        # q ties at 30 -> smallest id wins, and lo < 5
        assert r["doc_id"] == lo and r["n_docs"] == 2

    def test_string_id_rejected_loudly(self, spark):
        """Contract (ADVICE r13): non-numeric ids raise TypeError here
        rather than silently casting to NULL downstream."""
        import pytest

        from incremental_github_data_pipeline_spark.operators.dedup import (
            keep_best_of_cluster,
        )

        docs = spark.createDataFrame(
            [("a", 1)], "doc_id string, q long"
        )
        comps = spark.createDataFrame(
            [("a", "a")], "id string, component string"
        )
        with pytest.raises(TypeError, match="integral or decimal"):
            keep_best_of_cluster(docs, comps, "q")
