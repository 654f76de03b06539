"""[EXT] Text-analysis and dedup queries over the ``documents`` table.

SQL-expressible ops carry DuckDB oracles; signature-based ops (minhash /
simhash / fingerprints — engine-specific hash functions) are rows-only
per the driver contract, each with an invariant-style test in tests/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incremental_github_data_pipeline_spark.operators import dedup as dd
from incremental_github_data_pipeline_spark.operators import text as tx
from incremental_github_data_pipeline_spark.queries import register
from incremental_github_data_pipeline_spark.sources.local import local_rows_df
from incremental_github_data_pipeline_spark.sources.readers import read_table as T

_STOP = tx.LANG_STOPWORDS["en"]
_STOP_SQL = ",".join(f"'{w}'" for w in _STOP)

# DuckDB twin of operators.text.shingles(k=5) + the gram-bucketed
# posting-list self-join (shared by several near-dup oracles below).
_GRAM_PAIRS_SQL = """
    toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
    grams AS (
      SELECT doc_id,
             unnest(CASE WHEN len(t) >= 5
                         THEN list_transform(range(1, len(t) - 3),
                                             i -> array_to_string(t[i:i+4], ' '))
                         ELSE [array_to_string(t, ' ')] END) AS sh
      FROM toks
    ),
    dg AS (SELECT DISTINCT doc_id, sh FROM grams),
    pairs AS (
      SELECT a.doc_id AS ida, b.doc_id AS idb
      FROM dg a JOIN dg b USING (sh)
      WHERE a.doc_id < b.doc_id GROUP BY 1, 2
    )
"""


@register(
    "q_doc_exact_dedup",
    oracle="""
    SELECT text, MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
    FROM documents GROUP BY text ORDER BY keeper_id
    """,
    doc="Exact dedup groups, hash-keyed like operators/dedup.exact_dedup: "
    "the shuffle key is the 16-byte 128-bit content key (two seeded "
    "xxhash64 values, dedup.content_key), never the (possibly megabyte) "
    "text itself; the representative text rides as a first-value "
    "aggregate, collapsed map-side to one row per distinct hash before "
    "the exchange. The DuckDB oracle groups by text directly — "
    "equivalent up to 128-bit collisions (50% odds only near 2**64 "
    "distinct docs, far past any real corpus).",
)
def q_doc_exact_dedup(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "documents")
        .groupBy(dd.content_key(["text"]).alias("_h"))
        .agg(
            F.first("text").alias("text"),
            F.min("doc_id").alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .drop("_h")
        .orderBy("keeper_id")
    )


@register(
    "q_doc_token_stats",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT) AS total_tokens,
           CAST(SUM(len(string_split(trim(text), ' '))) AS DOUBLE)/COUNT(*) AS avg_tokens,
           MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
    FROM documents GROUP BY lang ORDER BY lang
    """,
    doc="Token counting at corpus scale: tokenize in the scan stage, "
    "aggregate per language.",
)
def q_doc_token_stats(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents")
    n_tok = tx.token_count(F.col("text")).cast("long")
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(n_tok).alias("total_tokens"),
            (F.sum(n_tok).cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang")
    )


@register(
    "q_doc_quality",
    oracle=f"""
    SELECT doc_id,
           len(string_split(trim(text), ' ')) AS n_tokens,
           CAST(len(list_filter(string_split(trim(text), ' '),
                                w -> lower(w) IN ({_STOP_SQL}))) AS INTEGER) AS n_stopwords,
           CAST(len(list_filter(string_split(trim(text), ' '),
                                w -> lower(w) IN ({_STOP_SQL}))) AS DOUBLE)
             / len(string_split(trim(text), ' ')) AS stopword_ratio,
           CASE WHEN len(string_split(trim(text), ' ')) >= 5 THEN 1 ELSE 0 END AS quality_ok
    FROM documents ORDER BY doc_id
    """,
    doc="Per-document quality features (length / stopword signals) — "
    "pure map stage, no shuffle except the presentation sort.",
)
def q_doc_quality(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents")
    n_tok = tx.token_count(F.col("text"))
    n_sw = tx.stopword_count(F.col("text"), _STOP)
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        n_sw.alias("n_stopwords"),
        F.when(n_tok > 0, n_sw.cast("double") / n_tok).alias("stopword_ratio"),
        F.when(n_tok >= 5, 1).otherwise(0).alias("quality_ok"),
    ).orderBy("doc_id")


@register(
    "q_doc_lang_dist",
    oracle="""
    SELECT lang, source, COUNT(*) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang, source ORDER BY lang, source
    """,
    doc="Language×source distribution — the corpus-composition audit "
    "query every data pipeline runs first.",
)
def q_doc_lang_dist(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "documents")
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("total_chars"))
        .orderBy("lang", "source")
    )


def _lang_id_oracle() -> str:
    """DuckDB twin of operators.text.lang_id, generated from the same
    stopword dict so the two can't drift: per-language stopword hit
    counts, CJK short-circuit, argmax with first-language-wins ties,
    'und' on zero evidence."""
    counts = {
        lang: "len(list_filter(string_split(trim(text), ' '), "
        f"w -> lower(w) IN ({', '.join(repr(w) for w in sw)})))"
        for lang, sw in tx.LANG_STOPWORDS.items()
    }
    best = "GREATEST(" + ", ".join(f"c_{lang}" for lang in counts) + ")"
    pred = (
        "CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh' "
        f"WHEN {best} = 0 THEN 'und' "
        + " ".join(f"WHEN c_{lang} = {best} THEN '{lang}'" for lang in counts)
        + " ELSE 'und' END"
    )
    selects = ", ".join(f"{expr} AS c_{lang}" for lang, expr in counts.items())
    return f"""
    WITH c AS (SELECT lang, text, {selects} FROM documents)
    SELECT lang, {pred} AS pred, COUNT(*) AS n
    FROM c GROUP BY lang, pred ORDER BY lang, pred
    """


@register(
    "q_lang_id",
    oracle=_lang_id_oracle(),
    doc="Heuristic language-ID (stopword argmax + CJK detection) vs the "
    "labeled lang column: returns per-(label, prediction) counts. "
    "Oracle generated from the same stopword lexicon — this row pins "
    "the CROSS-ENGINE semantics (argmax, tie-break, CJK short-circuit), "
    "NOT linguistic accuracy; that is pinned independently by the "
    "hand-labeled sentence fixture in tests/test_text_quality.py::"
    "test_lang_id_hand_labeled_fixture, whose expected labels are "
    "human-assigned and never derived from LANG_STOPWORDS.",
)
def q_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents")
    return (
        d.select("lang", tx.lang_id(F.col("text")).alias("pred"))
        .groupBy("lang", "pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "pred")
    )


@register(
    "q_doc_fingerprint",
    oracle="""
    WITH p AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 20 = 0
    )
    SELECT CAST(MIN(doc_id) AS BIGINT) AS keeper_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           TRUE AS fp_consistent
    FROM p GROUP BY text ORDER BY keeper_id
    """,
    doc="Rolling-hash document fingerprints (min-hash of token "
    "shingles): fingerprint collisions = near-dup prefilter groups. "
    "Certified via the assertion pattern: the xxhash64-derived "
    "fingerprint value is engine-specific, so the compared output is "
    "per exact-text group (planted copies at doc_id%20 guarantee "
    "multi-member groups) the keeper id, member count, and a boolean "
    "asserting all members share one fingerprint — the determinism "
    "contract a prefilter must honor, which DuckDB asserts as literal "
    "TRUE. The Spark group key is the 128-bit content hash (the text "
    "itself never shuffles; oracle groups by text directly — "
    "equivalent up to 128-bit collisions).",
)
def q_doc_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents").select("doc_id", "text")
    planted = d.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), F.col("text")
    )
    un = d.unionByName(planted)
    with_fp = un.select(
        "doc_id",
        tx.fingerprint(F.col("text"), k=5).alias("fp"),
        dd.content_key(["text"]).alias("_h"),
    )
    return (
        with_fp.groupBy("_h")
        .agg(
            F.min("doc_id").cast("long").alias("keeper_id"),
            F.count(F.lit(1)).alias("n_docs"),
            (F.count_distinct("fp") == 1).alias("fp_consistent"),
        )
        .drop("_h")
        .orderBy("keeper_id")
    )


@register(
    "q_minhash_near_dups",
    oracle=f"""
    WITH {{gram_pairs}},
    sizes AS (SELECT doc_id, COUNT(*) AS ns FROM dg GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS ida, b.doc_id AS idb, COUNT(*) AS ni
      FROM dg a JOIN dg b USING (sh)
      WHERE a.doc_id < b.doc_id GROUP BY 1, 2
    )
    SELECT ida AS id_a, idb AS id_b,
           CAST(ni AS DOUBLE) / (sa.ns + sb.ns - ni) AS jaccard,
           TRUE AS is_candidate
    FROM inter
    JOIN sizes sa ON sa.doc_id = ida
    JOIN sizes sb ON sb.doc_id = idb
    WHERE CAST(ni AS DOUBLE) / (sa.ns + sb.ns - ni) >= 0.8
    ORDER BY id_a, id_b
    """.replace("{gram_pairs}", _GRAM_PAIRS_SQL),
    doc="MinHash+LSH near-dup candidate recall certification (32 "
    "hashes, 8 bands, 5-gram shingles): the candidate set itself is "
    "xxhash64-derived (engine-specific), so the compared output is the "
    "TRUE high-similarity pairs (exact 5-gram Jaccard >= 0.8, computed "
    "by BOTH engines from gram posting lists) with a boolean asserting "
    "each was produced as an LSH candidate — DuckDB asserts literal "
    "TRUE. A green row certifies 100% LSH recall at this threshold on "
    "this corpus; as with q_verified_near_dups that recall coupling is "
    "intentional (P[candidate] ~98.5% per J=0.8 pair, ~1 at the "
    "planted pairs' similarity, deterministic on fixed testdata). The "
    "truth side never goes quadratic: pairs form only inside gram "
    "posting lists, same as the production candidate join.",
)
def q_minhash_near_dups(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents").select("doc_id", "text")
    # Truth side from gram POSTING LISTS (same algebra as the oracle):
    # |A ∩ B| counted inside each gram's posting list, sizes joined in,
    # jaccard = ni / (sa + sb - ni) as one IEEE division — identical to
    # re-shingling both texts per pair (the previous shape) but without
    # the O(pairs x doc_len) re-tokenization, which benched 2x the
    # whole query.
    dg = d.select(
        "doc_id",
        F.explode(F.array_distinct(tx.shingles("text", 5))).alias("_sh"),
    ).localCheckpoint(eager=True)
    sizes = dg.groupBy("doc_id").agg(F.count(F.lit(1)).alias("_ns"))
    ga, gb = dg.alias("ga"), dg.alias("gb")
    inter = (
        ga.join(
            gb,
            (F.col("ga._sh") == F.col("gb._sh"))
            & (F.col("ga.doc_id") < F.col("gb.doc_id")),
        )
        .groupBy(
            F.col("ga.doc_id").alias("id_a"), F.col("gb.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("_ni"))
    )
    true_pairs = (
        inter.join(
            sizes.select(F.col("doc_id").alias("id_a"), F.col("_ns").alias("_sa")),
            "id_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("id_b"), F.col("_ns").alias("_sb")),
            "id_b",
        )
        .withColumn(
            "jaccard",
            F.col("_ni").cast("double")
            / (F.col("_sa") + F.col("_sb") - F.col("_ni")),
        )
        .filter(F.col("jaccard") >= 0.8)
        .select("id_a", "id_b", "jaccard")
    )
    cands = dd.minhash_candidate_pairs(
        d, id_col="doc_id", text_col="text", num_hashes=32, bands=8, k=5
    ).select("id_a", "id_b", F.lit(True).alias("_cand"))
    return (
        true_pairs.join(cands, ["id_a", "id_b"], "left")
        .select(
            "id_a",
            "id_b",
            "jaccard",
            F.coalesce(F.col("_cand"), F.lit(False)).alias("is_candidate"),
        )
        .orderBy("id_a", "id_b")
    )


@register(
    "q_simhash_near_dups",
    oracle="""
    WITH p AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 20 = 0
    )
    SELECT CAST(a.doc_id AS BIGINT) AS id_a, CAST(b.doc_id AS BIGINT) AS id_b
    FROM p a JOIN p b ON a.text = b.text AND a.doc_id < b.doc_id
    ORDER BY id_a, id_b
    """,
    doc="SimHash near-dup candidates via chunk pigeonhole (Hamming <= "
    "3, 4x16-bit chunks). Certified deterministically: the simhash "
    "value is engine-specific, but identical texts ALWAYS produce "
    "identical simhashes (Hamming 0) and the pigeonhole bucketing "
    "finds every Hamming<=width pair with certainty — so candidates "
    "filtered to exact-text-equal pairs must be EXACTLY the equal-text "
    "pairs, which DuckDB enumerates by self-joining on text (planted "
    "copies at doc_id%20 guarantee the set is non-empty). No "
    "probabilistic recall caveat here: the pigeonhole guarantee is "
    "exact for Hamming 0. The wider (near-identical, nonequal-text) "
    "candidate surface stays pinned by pytest invariants.",
)
def q_simhash_near_dups(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents").select("doc_id", "text")
    planted = d.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), F.col("text")
    )
    un = d.unionByName(planted)
    cands = dd.simhash_candidate_pairs(
        un, id_col="doc_id", text_col="text", max_hamming=3, chunks=4
    )
    return (
        cands.join(
            un.select(
                F.col("doc_id").alias("id_a"), F.col("text").alias("_ta")
            ),
            "id_a",
        )
        .join(
            un.select(
                F.col("doc_id").alias("id_b"), F.col("text").alias("_tb")
            ),
            "id_b",
        )
        .filter(F.col("_ta") == F.col("_tb"))
        .select(
            F.col("id_a").cast("long").alias("id_a"),
            F.col("id_b").cast("long").alias("id_b"),
        )
        .orderBy("id_a", "id_b")
    )


@register(
    "q_ngram_jaccard_dedup",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t
                  FROM documents),
    grams AS (
      SELECT doc_id,
             unnest(CASE WHEN len(t) >= 3
                         THEN list_transform(range(1, len(t) - 1),
                                             i -> array_to_string(t[i:i+2], ' '))
                         ELSE [array_to_string(t, ' ')] END) AS sh
      FROM toks
    ),
    dg AS (SELECT DISTINCT doc_id, sh FROM grams),
    sizes AS (SELECT doc_id, COUNT(*) AS ns FROM dg GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS ida, b.doc_id AS idb, COUNT(*) AS ni
      FROM dg a JOIN dg b USING (sh)
      WHERE a.doc_id < b.doc_id GROUP BY 1, 2
    )
    SELECT ida AS id_a, idb AS id_b,
           CAST(ni AS DOUBLE) / (sa.ns + sb.ns - ni) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = ida
    JOIN sizes sb ON sb.doc_id = idb
    WHERE CAST(ni AS DOUBLE) / (sa.ns + sb.ns - ni) >= 0.8
    ORDER BY id_a, id_b
    """,
    doc="LSH candidates verified by exact 3-gram Jaccard >= 0.8 — the "
    "production near-dup pipeline (recall stage + precision stage) at "
    "the shorter shingle width. Oracle: DuckDB computes TRUE 3-gram "
    "Jaccard over the full gram-posting self-join, so a hash match "
    "also certifies 100% LSH recall at this threshold on this corpus "
    "(the same intentional recall coupling q_verified_near_dups "
    "documents for k=5). The engine-specific est_jaccard column is "
    "excluded from the compared output.",
)
def q_ngram_jaccard_dedup(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents")
    return (
        dd.verified_near_dups(
            d, id_col="doc_id", text_col="text", jaccard_threshold=0.8, k=3
        )
        .select("id_a", "id_b", "jaccard")
        .orderBy("id_a", "id_b")
    )


@register(
    "q_verified_near_dups",
    oracle=f"""
    WITH {_GRAM_PAIRS_SQL},
    sizes AS (SELECT doc_id, COUNT(*) AS ns FROM dg GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS ida, b.doc_id AS idb, COUNT(*) AS ni
      FROM dg a JOIN dg b USING (sh)
      WHERE a.doc_id < b.doc_id GROUP BY 1, 2
    )
    SELECT ida AS id_a, idb AS id_b,
           CAST(ni AS DOUBLE) / (sa.ns + sb.ns - ni) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = ida
    JOIN sizes sb ON sb.doc_id = idb
    WHERE CAST(ni AS DOUBLE) / (sa.ns + sb.ns - ni) >= 0.8
    ORDER BY id_a, id_b
    """,
    doc="Destructive-dedup gate (operators.dedup.verified_near_dups, the "
    "default path of minhash_dedup): MinHash-LSH recall stage, exact "
    "5-gram Jaccard precision stage — only exact-verified pairs may drop "
    "a document. Oracle: DuckDB computes TRUE Jaccard over the full "
    "gram-posting self-join, so a hash match also certifies 100% LSH "
    "recall at this threshold on this corpus. That recall coupling is "
    "INTENTIONAL: with 32 hashes / 8 bands a J=0.8 pair is a candidate "
    "with ~98.5% probability per pair, so the assertion is probabilistic "
    "over corpora but deterministic on this fixed testdata (the planted "
    "near-dup pairs sit well above threshold, where recall ≈ 1); a "
    "regenerated corpus with borderline-J pairs could fail this row "
    "without any code bug — that is the check working as designed, "
    "flagging that the destructive gate would have missed a true pair.",
)
def q_verified_near_dups(spark: SparkSession, sf: str) -> DataFrame:
    return (
        dd.verified_near_dups(
            T(spark, sf, "documents"),
            id_col="doc_id",
            text_col="text",
            jaccard_threshold=0.8,
            k=5,
        )
        .select("id_a", "id_b", "jaccard")
        .orderBy("id_a", "id_b")
    )


@register(
    "q_doc_chunks",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents
    ),
    c AS (
      SELECT doc_id, toks,
             unnest(range(0, 1 + GREATEST(0,
                    CAST(CEIL((len(toks) - 16)/12.0) AS BIGINT)))) AS chunk_idx
      FROM t
    )
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
           array_to_string(toks[chunk_idx*12+1 : chunk_idx*12+16], ' ') AS chunk_text,
           CAST(len(toks[chunk_idx*12+1 : chunk_idx*12+16]) AS INT) AS chunk_tokens
    FROM c
    ORDER BY doc_id, chunk_idx
    """,
    doc="Document chunking (operators.text.chunk_documents): token "
    "windows of 16 with stride 12 (4-token overlap), exploded in the "
    "scan stage — the embedding/training prep step. Chunk count is "
    "1 + ceil((n-16)/12) so the final chunk always extends coverage "
    "(never a strict sub-window of the previous chunk), and empty docs "
    "keep one empty chunk instead of vanishing.",
)
def q_doc_chunks(spark: SparkSession, sf: str) -> DataFrame:
    return tx.chunk_documents(
        T(spark, sf, "documents"), chunk_size=16, step=12
    ).orderBy("doc_id", "chunk_idx")


@register(
    "q_doc_overlap_pairs",
    oracle=f"""
    WITH {_GRAM_PAIRS_SQL}
    SELECT ida AS id_a, idb AS id_b FROM pairs ORDER BY id_a, id_b
    """,
    doc="Hash-free near-dup pairs (operators.dedup.gram_overlap_pairs): "
    "docs sharing a token 5-gram, self-join bucketed on the gram — "
    "cross-document work only inside a gram's posting list.",
)
def q_doc_overlap_pairs(spark: SparkSession, sf: str) -> DataFrame:
    return dd.gram_overlap_pairs(
        T(spark, sf, "documents"), id_col="doc_id", text_col="text", k=5
    ).orderBy("id_a", "id_b")


@register(
    "q_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_GRAM_PAIRS_SQL},
    edges AS (
      SELECT ida AS src, idb AS dst FROM pairs
      UNION ALL SELECT idb, ida FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    reach(id, r) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT e.dst, reach.r FROM edges e JOIN reach ON e.src = reach.id
    ),
    cc AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id)
    SELECT component, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM cc GROUP BY component ORDER BY component
    """,
    doc="Dedup cluster formation (operators.dedup.connected_components): "
    "iterative min-label propagation over the near-dup pair graph — "
    "pairs become components so one canonical doc (min id) survives per "
    "cluster. One shuffle join per round, lineage truncated per round, "
    "rounds = graph diameter (2-4 for near-dup star/clique shapes). "
    "Oracle: DuckDB recursive-CTE transitive closure.",
)
def q_dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents")
    pairs = dd.gram_overlap_pairs(d, id_col="doc_id", text_col="text", k=5)
    cc = dd.connected_components(pairs)
    return (
        cc.groupBy("component")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("component")
    )


@register(
    "q_dedup_keep_best",
    oracle=f"""
    WITH RECURSIVE {_GRAM_PAIRS_SQL},
    edges AS (
      SELECT ida AS src, idb AS dst FROM pairs
      UNION ALL SELECT idb, ida FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    reach(id, r) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT e.dst, reach.r FROM edges e JOIN reach ON e.src = reach.id
    ),
    cc AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
    lab AS (
      SELECT d.doc_id, d.n_chars,
             COALESCE(cc.component, d.doc_id) AS component
      FROM documents d LEFT JOIN cc ON d.doc_id = cc.id
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY component
               ORDER BY n_chars DESC, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY component) AS n_docs
      FROM lab
    )
    SELECT doc_id, CAST(component AS BIGINT) AS component,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_chars AS BIGINT) AS n_chars
    FROM ranked WHERE rn = 1 ORDER BY component
    """,
    doc="Keep-BEST-of-cluster dedup (r13, operators/dedup."
    "keep_best_of_cluster): near-dup clusters keep their highest-"
    "quality copy instead of the first-arrived one — here the LONGEST "
    "extraction (n_chars), the heuristic real curation pipelines use "
    "when the same page arrives via different extractors; ties break "
    "to the smallest doc_id so the surviving set hash-compares cross-"
    "engine. Clusters come from the gram-overlap pair graph through "
    "connected_components; docs in no pair are singletons and keep "
    "themselves (their own id labels the cluster — collision-free "
    "since component labels are min ids of CLUSTERED docs). One left "
    "join against the pair-list-sized component map + one algebraic "
    "MAX-of-struct aggregate — no window, no per-cluster sort, salts "
    "cleanly under hot clusters. Oracle: DuckDB recursive-CTE "
    "transitive closure + the same argmax tie rule.",
)
def q_dedup_keep_best(spark: SparkSession, sf: str) -> DataFrame:
    from incremental_github_data_pipeline_spark.operators.dedup import (
        keep_best_of_cluster,
    )

    d = T(spark, sf, "documents")
    pairs = dd.gram_overlap_pairs(d, id_col="doc_id", text_col="text", k=5)
    cc = dd.connected_components(pairs)
    kept = keep_best_of_cluster(
        d.select("doc_id", "n_chars"), cc, "n_chars"
    )
    return kept.select(
        "doc_id", "component", "n_docs", F.col("n_chars").cast("long")
        .alias("n_chars")
    ).orderBy("component")


@register(
    "q_doc_repetition",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents
    ),
    b AS (
      SELECT doc_id, toks,
             CASE WHEN len(toks) >= 2
                  THEN list_transform(range(1, len(toks)),
                                      i -> toks[i] || ' ' || toks[i+1])
                  ELSE [] END AS bg
      FROM t
    )
    SELECT doc_id,
           CASE WHEN len(toks) > 0
                THEN 1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
                ELSE 0.0 END AS dup_word_ratio,
           CASE WHEN len(bg) > 0
                THEN CAST(list_max(list_transform(list_distinct(bg),
                          g -> len(list_filter(bg, x -> x = g)))) AS DOUBLE)
                     / len(bg)
                ELSE 0.0 END AS top_bigram_ratio
    FROM b ORDER BY doc_id
    """,
    doc="Gopher-style repetition quality signals (duplicate-word "
    "fraction, top-bigram fraction) — pure map stage, per-row bounded "
    "work, no shuffle except the presentation sort.",
)
def q_doc_repetition(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents")
    rf = tx.repetition_features(F.col("text"))
    return d.select(
        "doc_id",
        rf["dup_word_ratio"].alias("dup_word_ratio"),
        rf["top_bigram_ratio"].alias("top_bigram_ratio"),
    ).orderBy("doc_id")


@register(
    "q_doc_decontaminate",
    oracle="""
    WITH t AS (
      SELECT doc_id, source, string_split(trim(text), ' ') AS toks FROM documents
    ),
    grams AS (
      SELECT doc_id, source,
             unnest(CASE WHEN len(toks) >= 5
                         THEN list_transform(range(1, len(toks) - 3),
                                             i -> array_to_string(toks[i:i+4], ' '))
                         ELSE [array_to_string(toks, ' ')] END) AS sh
      FROM t
    ),
    bench AS (SELECT DISTINCT sh FROM grams WHERE source = 'src0'),
    hits AS (
      SELECT DISTINCT g.doc_id, g.source
      FROM grams g JOIN bench USING (sh)
      WHERE g.source <> 'src0'
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_contaminated
    FROM hits GROUP BY source ORDER BY source
    """,
    doc="Benchmark decontamination (operators.text.contaminated_ids): "
    "docs sharing any token 5-gram with the benchmark slice "
    "(source='src0'). Benchmark gram set broadcasts; corpus side "
    "explodes in the scan stage — no corpus shuffle before the hit "
    "filter.",
)
def q_doc_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents")
    bench = d.filter(F.col("source") == "src0")
    corpus = d.filter(F.col("source") != "src0")
    hits = tx.contaminated_ids(corpus, bench, id_col="doc_id", text_col="text", k=5)
    return (
        corpus.select("doc_id", "source")
        .join(hits, "doc_id", "left_semi")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
        .orderBy("source")
    )


@register(
    "q_doc_top_terms",
    oracle="""
    WITH tc AS (
      SELECT source, unnest(string_split(trim(text), ' ')) AS term
      FROM documents
    ),
    counts AS (
      SELECT source, term, COUNT(*) AS n FROM tc GROUP BY source, term
    ),
    ranked AS (
      SELECT source, term, n,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY n DESC, term) AS rank
      FROM counts
    )
    SELECT source, term, n, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 5 ORDER BY source, rank
    """,
    doc="Top-5 terms per source (operators.text.top_terms): tokenize in "
    "the scan stage, one shuffle on (source, term), window top-k on the "
    "aggregated side. Deterministic tie-break (count desc, term asc).",
)
def q_doc_top_terms(spark: SparkSession, sf: str) -> DataFrame:
    return tx.top_terms(
        T(spark, sf, "documents"), group_col="source", text_col="text", n=5
    ).orderBy("source", "rank")


@register(
    "q_doc_vocab",
    oracle="""
    WITH tc AS (
      SELECT lang, unnest(string_split(trim(text), ' ')) AS term
      FROM documents
    ),
    counts AS (
      SELECT lang, term, COUNT(*) AS n FROM tc GROUP BY lang, term
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS vocab_size,
           CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_count,
           CAST(SUM(n) AS BIGINT) AS total_tokens
    FROM counts GROUP BY lang ORDER BY lang
    """,
    doc="Per-language vocabulary size / hapax count / total tokens "
    "(operators.text.vocab_stats) — two algebraic aggs on one key, "
    "one shuffle.",
)
def q_doc_vocab(spark: SparkSession, sf: str) -> DataFrame:
    return tx.vocab_stats(
        T(spark, sf, "documents"), group_col="lang", text_col="text"
    ).orderBy("lang")


@register(
    "q_doc_split",
    oracle="""
    SELECT CASE WHEN doc_id % 100 < 80 THEN 'train'
                WHEN doc_id % 100 < 90 THEN 'val'
                ELSE 'test' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY 1 ORDER BY split
    """,
    doc="Deterministic train/val/test assignment "
    "(operators.text.assign_split): pure modular arithmetic on the id — "
    "stable across runs, engines, and corpus growth (no RNG sampling "
    "drift).",
)
def q_doc_split(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents")
    return (
        d.withColumn("split", tx.assign_split("doc_id"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("split")
    )


@register(
    "q_doc_sample_stratified",
    oracle="""
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    WHERE doc_id % 100 < CASE WHEN lang = 'en' THEN 20
                              WHEN lang = 'de' THEN 50 ELSE 0 END
    GROUP BY lang ORDER BY lang
    """,
    doc="Deterministic stratified sampling "
    "(operators.text.sample_stratified): per-stratum keep fractions via "
    "modular arithmetic on the id (downsample the dominant language, "
    "drop the rest) — no RNG, stable membership under corpus growth, "
    "pure pushed-down filter with zero shuffle before the audit agg.",
)
def q_doc_sample_stratified(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents")
    sampled = tx.sample_stratified(
        d, id_col="doc_id", fractions_pct={"en": 20, "de": 50}, strata_col="lang"
    )
    return (
        sampled.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("lang")
    )


@register(
    "q_doc_incremental_dedup",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source, string_split(trim(text), ' ') AS t FROM documents
    ),
    grams AS (
      SELECT doc_id, source,
             unnest(CASE WHEN len(t) >= 5
                         THEN list_transform(range(1, len(t) - 3),
                                             i -> array_to_string(t[i:i+4], ' '))
                         ELSE [array_to_string(t, ' ')] END) AS sh
      FROM toks
    ),
    hit AS (
      SELECT DISTINCT n.doc_id
      FROM grams n
      JOIN (SELECT DISTINCT sh FROM grams WHERE source <> 'src1') c USING (sh)
      WHERE n.source = 'src1'
    )
    SELECT d.doc_id, d.n_chars FROM documents d
    WHERE d.source = 'src1' AND d.doc_id NOT IN (SELECT doc_id FROM hit)
    ORDER BY d.doc_id
    """,
    doc="Incremental batch dedup (operators.dedup.dedup_against_corpus): "
    "survivors of the incoming batch (source='src1') after dropping docs "
    "sharing any token 5-gram with the existing corpus. The corpus never "
    "shuffles — the batch's gram set broadcasts, the corpus is scanned "
    "map-side, and only colliding grams (a subset of the broadcast set) "
    "flow back. Idempotent on rerun, matching the engine's deterministic-"
    "key incremental semantics.",
)
def q_doc_incremental_dedup(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents")
    new_batch = d.filter(F.col("source") == "src1")
    corpus = d.filter(F.col("source") != "src1")
    return (
        dd.dedup_against_corpus(new_batch, corpus, id_col="doc_id", text_col="text", k=5)
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    )


_EMAIL_PAT = tx.PII_PATTERNS["email"]
_URL_PAT = tx.PII_PATTERNS["url"]
_PII_AUDIT_SQL = """
    WITH aug AS (
      SELECT source,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com via https://ex.org/d/'
                  || CAST(doc_id AS VARCHAR) AS t
      FROM documents
    )
    SELECT source,
           CAST(SUM(len(regexp_extract_all(t, '__EMAIL__'))) AS BIGINT) AS n_emails,
           CAST(SUM(len(regexp_extract_all(t, '__URL__'))) AS BIGINT) AS n_urls,
           CAST(SUM(len(t) - len(
             regexp_replace(regexp_replace(t, '__EMAIL__', '[REDACTED]', 'g'),
                            '__URL__', '[REDACTED]', 'g'))) AS BIGINT)
             AS chars_removed
    FROM aug GROUP BY source ORDER BY source
""".replace("__EMAIL__", _EMAIL_PAT).replace("__URL__", _URL_PAT)


@register(
    "q_doc_pii_audit",
    oracle=_PII_AUDIT_SQL,
    doc="PII detection/redaction audit (operators.text.redact, "
    "redaction_counts): deterministic doc_id-derived emails/URLs are "
    "appended so the patterns demonstrably fire, then per-source match "
    "counts and redaction char deltas are compared cross-engine — the "
    "patterns are deliberately lookarounds-free so Java regex (Spark) "
    "and RE2-style engines agree. Pure map stage + one small agg.",
)
def q_doc_pii_audit(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com via https://ex.org/d/"),
        F.col("doc_id").cast("string"),
    )
    pats = {"email": _EMAIL_PAT, "url": _URL_PAT}
    counts = tx.redaction_counts(aug, pats)
    redacted = tx.redact(aug, pats)
    return (
        d.select(
            "source",
            counts["email"].alias("_e"),
            counts["url"].alias("_u"),
            (F.length(aug) - F.length(redacted)).alias("_d"),
        )
        .groupBy("source")
        .agg(
            F.sum("_e").alias("n_emails"),
            F.sum("_u").alias("n_urls"),
            F.sum("_d").alias("chars_removed"),
        )
        .orderBy("source")
    )


_PHONE_PAT = tx.PII_PATTERNS["phone"]
_PII_REDACT_SQL = """
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com via https://ex.org/d/'
                  || CAST(doc_id AS VARCHAR)
                  || ' or call +1 (555) 010-9'
                  || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') AS t0
      FROM documents
    ),
    staged AS (
      -- the same sequential lanes the transform applies: email first,
      -- then url on the email-redacted text, then phone — counts are
      -- what each lane actually replaced
      SELECT doc_id, t0,
             regexp_replace(t0, '__EMAIL__', '<EMAIL>', 'g') AS t1
      FROM aug
    ),
    staged2 AS (
      SELECT *, regexp_replace(t1, '__URL__', '<URL>', 'g') AS t2
      FROM staged
    ),
    staged3 AS (
      SELECT *, regexp_replace(t2, '__PHONE__', '<PHONE>', 'g') AS t3
      FROM staged2
    )
    SELECT doc_id, t3 AS redacted,
           CAST(len(regexp_extract_all(t0, '__EMAIL__')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(t1, '__URL__')) AS BIGINT)
             AS n_urls,
           CAST(len(regexp_extract_all(t2, '__PHONE__')) AS BIGINT)
             AS n_phones,
           CAST(length(t0) - length(t3) AS BIGINT) AS chars_removed
    FROM staged3 ORDER BY doc_id
""".replace("__EMAIL__", _EMAIL_PAT).replace("__URL__", _URL_PAT).replace(
    "__PHONE__", _PHONE_PAT
)


@register(
    "q_doc_pii_redact",
    oracle=_PII_REDACT_SQL,
    doc="PII redaction transform (r12, operators.text.redact_typed): "
    "q_doc_pii_audit COUNTS PII; this actually removes it, emitting "
    "the full redacted corpus with typed placeholders "
    "(<EMAIL>/<URL>/<PHONE>) plus per-lane replacement counts and the "
    "char delta — the curation-funnel stage a shipped training corpus "
    "needs. Deterministic doc_id-derived email+url+phone plants make "
    "every lane fire; the WHOLE redacted string hash-compares "
    "cross-engine (not just counts), and lanes apply in email→url→"
    "phone order so an address inside a URL is never double-eaten. "
    "Chained regexp_replace, codegen-side, scan-stage at 100 TB.",
)
def q_doc_pii_redact(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com via https://ex.org/d/"),
        F.col("doc_id").cast("string"),
        F.lit(" or call +1 (555) 010-9"),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
    )
    staged = d.select(
        "doc_id",
        aug.alias("t0"),
        F.regexp_replace(aug, _EMAIL_PAT, "<EMAIL>").alias("t1"),
    )
    staged = staged.withColumn(
        "t2", F.regexp_replace(F.col("t1"), _URL_PAT, "<URL>")
    )
    staged = staged.withColumn(
        "t3", F.regexp_replace(F.col("t2"), _PHONE_PAT, "<PHONE>")
    )
    return staged.select(
        "doc_id",
        F.col("t3").alias("redacted"),
        F.regexp_count(F.col("t0"), F.lit(_EMAIL_PAT))
        .cast("long")
        .alias("n_emails"),
        F.regexp_count(F.col("t1"), F.lit(_URL_PAT))
        .cast("long")
        .alias("n_urls"),
        F.regexp_count(F.col("t2"), F.lit(_PHONE_PAT))
        .cast("long")
        .alias("n_phones"),
        (F.length("t0") - F.length("t3")).cast("long")
        .alias("chars_removed"),
    ).orderBy("doc_id")


_LM_SCORE_SQL = """
    WITH arrs AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS arr
      FROM documents WHERE length(trim(text)) > 0
    ),
    -- this DuckDB build has no UNNEST WITH ORDINALITY; index the token
    -- array through a bounded range join instead (docs cap at ~100
    -- tokens across all SFs; 8192 is headroom, the i < len-1 filter
    -- does the real bounding)
    big AS (
      SELECT arrs.doc_id,
             list_extract(arr, CAST(g.i AS INTEGER) + 1) || ' ' ||
             list_extract(arr, CAST(g.i AS INTEGER) + 2) AS bigram
      FROM arrs, range(8192) g(i)
      WHERE g.i < len(arr) - 1
    ),
    counts AS (SELECT bigram, COUNT(*) AS c FROM big GROUP BY bigram)
    SELECT d.doc_id,
           CAST(COUNT(big.bigram) AS BIGINT) AS n_bigrams,
           CAST(COALESCE(SUM(counts.c), 0) AS BIGINT) AS freq_sum
    FROM documents d
    LEFT JOIN big ON big.doc_id = d.doc_id
    LEFT JOIN counts ON counts.bigram = big.bigram
    GROUP BY d.doc_id
    ORDER BY d.doc_id
"""


@register(
    "q_doc_lm_score",
    oracle=_LM_SCORE_SQL,
    doc="Corpus-derived bigram LM quality scoring (operators.text."
    "bigram_lm + lm_score — the CCNet/KenLM perplexity-filter shape): "
    "train bigram counts over the corpus, score every doc against them. "
    "The cross-engine compare uses the exact integer lane (sum of "
    "corpus bigram counts per doc); the float avg-logprob lane is "
    "pinned by test_text_quality.py against a hand-computed value.",
)
def q_doc_lm_score(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents")
    return (
        tx.lm_score(d)
        .select("doc_id", "n_bigrams", "freq_sum")
        .orderBy("doc_id")
    )


_MIX_WEIGHTS = {"src0": 50, "src1": 30, "src2": 20}

_MIX_SOURCES_SQL = """
    WITH w(source, p) AS (VALUES ('src0', 50), ('src1', 30), ('src2', 20)),
    cnt AS (
      SELECT d.source, COUNT(*) AS n FROM documents d
      JOIN w ON w.source = d.source GROUP BY d.source
    ),
    t AS (SELECT MIN(cnt.n * 100 // w.p) AS total FROM cnt JOIN w USING (source)),
    cut AS (
      SELECT cnt.source,
             LEAST(100, (t.total * w.p // 100) * 100 // cnt.n) AS cutoff
      FROM cnt JOIN w USING (source), t
    )
    SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(d.n_chars) AS BIGINT) AS total_chars
    FROM documents d
    JOIN cut ON cut.source = d.source
    WHERE d.doc_id % 100 < cut.cutoff
    GROUP BY d.source ORDER BY d.source
"""


@register(
    "q_doc_mix_sources",
    oracle=_MIX_SOURCES_SQL,
    doc="Target-mixture source sampling (operators.text.mix_sources): "
    "derive per-source keep cutoffs realizing a 50/30/20 mixture with "
    "the scarcest source kept whole — integer arithmetic end-to-end, so "
    "DuckDB derives identical cutoffs from the same counts. The sample "
    "itself is a pushed-down modular filter, zero shuffle before the "
    "audit agg.",
)
def q_doc_mix_sources(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents")
    mixed = tx.mix_sources(d, _MIX_WEIGHTS)
    return (
        mixed.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("source")
    )


_PACK_SQL = """
    WITH toks AS (
      SELECT source, doc_id, doc_id % 4 AS shard,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
      FROM documents
    ),
    packed AS (
      SELECT source, shard, doc_id, n_tokens,
             -- CAST: the window SUM is HUGEINT and // keeps it HUGEINT,
             -- which pandas renders as float64 — the driver's value hash
             -- then diverges from Spark's int64 (r3 FAIL signature)
             CAST(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source, shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             // 512 AS BIGINT) AS seq_id
      FROM toks
    )
    SELECT source, CAST(shard AS BIGINT) AS shard, seq_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens
    FROM packed
    GROUP BY source, shard, seq_id
    ORDER BY source, shard, seq_id
"""


@register(
    "q_doc_pack_sequences",
    oracle=_PACK_SQL,
    doc="Sequence packing (operators.text.pack_sequences): assign docs "
    "to 512-token training sequences by cumulative token count within "
    "(source, shard) — sharding bounds the sequential window so "
    "parallelism is |sources| x shards, the 100 TB requirement. Oracle "
    "reproduces the identical packing with a SQL window.",
)
def q_doc_pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents")
    packed = tx.pack_sequences(d, budget=512, shards=4)
    return (
        packed.groupBy("source", "shard", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("seq_tokens"),
        )
        .orderBy("source", "shard", "seq_id")
    )


_REMOVE_SPANS_SQL = """
    WITH arrs AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS arr
      FROM documents WHERE length(trim(text)) > 0
    ),
    grams AS (
      SELECT doc_id, CAST(g.i AS INTEGER) AS gpos,
             array_to_string(list_slice(arr, CAST(g.i AS INTEGER) + 1,
                                        CAST(g.i AS INTEGER) + 5), ' ') AS gram
      FROM arrs, range(8192) g(i) WHERE g.i <= len(arr) - 5
    ),
    frequent AS (
      SELECT gram FROM grams GROUP BY gram
      HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    covered AS (
      SELECT DISTINCT g.doc_id, g.gpos + CAST(o.i AS INTEGER) AS pos
      FROM grams g JOIN frequent USING (gram), range(5) o(i)
    ),
    toks AS (
      SELECT doc_id, CAST(t.i AS INTEGER) AS pos,
             list_extract(arr, CAST(t.i AS INTEGER) + 1) AS tok
      FROM arrs, range(8192) t(i) WHERE t.i < len(arr)
    ),
    kept AS (
      SELECT t.doc_id, t.pos, t.tok FROM toks t
      LEFT JOIN covered c ON c.doc_id = t.doc_id AND c.pos = t.pos
      WHERE c.doc_id IS NULL
    ),
    agg AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
             COUNT(*) AS n_kept
      FROM kept GROUP BY doc_id
    ),
    nt AS (
      SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+'))
             END AS n_tokens
      FROM documents
    )
    SELECT nt.doc_id,
           COALESCE(a.clean_text, '') AS clean_text,
           CAST(nt.n_tokens AS BIGINT) AS n_tokens,
           CAST(nt.n_tokens - COALESCE(a.n_kept, 0) AS BIGINT) AS n_removed
    FROM nt LEFT JOIN agg a ON a.doc_id = nt.doc_id
    ORDER BY nt.doc_id
"""


@register(
    "q_doc_remove_spans",
    oracle=_REMOVE_SPANS_SQL,
    doc="C4-style cross-document boilerplate excision "
    "(operators.text.remove_duplicate_spans): drop every token covered "
    "by a 5-gram span occurring in >=2 distinct docs, rejoin survivors "
    "in order. Gram-frequency agg shuffles once on the gram key; the "
    "frequent-gram table is post-filter tiny (auto-broadcast); "
    "reassembly shuffles on the doc id — never doc x doc.",
)
def q_doc_remove_spans(spark: SparkSession, sf: str) -> DataFrame:
    return tx.remove_duplicate_spans(
        T(spark, sf, "documents"), k=5, min_docs=2
    ).orderBy("doc_id")


_DSIR_SQL = """
    WITH toks AS (
      SELECT doc_id, lang,
             unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
      FROM documents WHERE length(trim(text)) > 0
    ),
    counts AS (
      SELECT token, COUNT(*) AS rc,
             SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tc
      FROM toks GROUP BY token
    )
    SELECT d.doc_id,
           CAST(COUNT(t.token) AS BIGINT) AS n_tokens,
           CAST(COALESCE(SUM(c.rc), 0) AS BIGINT) AS raw_freq_sum,
           CAST(COALESCE(SUM(c.tc), 0) AS BIGINT) AS target_freq_sum
    FROM documents d
    LEFT JOIN toks t ON t.doc_id = d.doc_id
    LEFT JOIN counts c ON c.token = t.token
    GROUP BY d.doc_id ORDER BY d.doc_id
"""


@register(
    "q_doc_dsir",
    oracle=_DSIR_SQL,
    doc="DSIR importance weighting (operators.text.dsir_score, exact "
    "unigram variant): per-doc avg log importance ratio of a target "
    "domain (lang='en') vs the raw corpus, add-one smoothed. The "
    "cross-engine compare uses the exact integer lanes (sums of corpus "
    "/ target token counts per doc); the float dsir_weight lane is "
    "pinned by test_text_quality.py against a hand-computed value.",
)
def q_doc_dsir(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents")
    return (
        tx.dsir_score(d, target_filter=F.col("lang") == "en")
        .select("doc_id", "n_tokens", "raw_freq_sum", "target_freq_sum")
        .orderBy("doc_id")
    )


_FUNNEL_SQL = """
    WITH base AS (
      SELECT doc_id, lang, length(text) AS nc,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tok,
             regexp_split_to_array(trim(text), '\\s+') AS arr,
             text
      FROM documents
    ),
    feat AS (
      SELECT doc_id, lang, nc, n_tok, text,
             CASE WHEN n_tok = 0 THEN 0.0
                  ELSE list_reduce(list_transform(arr, w -> length(w)),
                                   (a, b) -> a + b) * 1.0 / n_tok END AS mean_len,
             CASE WHEN n_tok = 0 THEN 0.0
                  ELSE list_reduce(list_transform(arr,
                         w -> CASE WHEN lower(w) IN ('the', 'and', 'of', 'to', 'in', 'is', 'that', 'it', 'for', 'was')
                                   THEN 1 ELSE 0 END),
                       (a, b) -> a + b) * 1.0 / n_tok END AS sw_ratio
      FROM base
    ),
    flags AS (
      SELECT doc_id, nc, text,
             (n_tok >= 25 AND mean_len <= 15.0 AND sw_ratio >= 0.01) AS s1,
             (n_tok >= 25 AND mean_len <= 15.0 AND sw_ratio >= 0.01
              AND lang IN ('en', 'de', 'es')) AS s2
      FROM feat
    ),
    dedup AS (
      SELECT doc_id, nc, s1, s2,
             (s2 AND doc_id = MIN(CASE WHEN s2 THEN doc_id END)
                              OVER (PARTITION BY text)) AS s3
      FROM flags
    ),
    final AS (
      SELECT doc_id, nc, s1, s2, s3,
             (s3 AND doc_id % 100 < 80) AS s4
      FROM dedup
    )
    SELECT s.stage,
           CAST(s.n AS BIGINT) AS n_docs,
           CAST(s.c AS BIGINT) AS total_chars
    FROM (
      SELECT '1_raw' AS stage, COUNT(*) AS n, SUM(nc) AS c FROM final
      UNION ALL SELECT '2_quality', SUM(CASE WHEN s1 THEN 1 ELSE 0 END),
                       SUM(CASE WHEN s1 THEN nc ELSE 0 END) FROM final
      UNION ALL SELECT '3_lang', SUM(CASE WHEN s2 THEN 1 ELSE 0 END),
                       SUM(CASE WHEN s2 THEN nc ELSE 0 END) FROM final
      UNION ALL SELECT '4_dedup', SUM(CASE WHEN s3 THEN 1 ELSE 0 END),
                       SUM(CASE WHEN s3 THEN nc ELSE 0 END) FROM final
      UNION ALL SELECT '5_train', SUM(CASE WHEN s4 THEN 1 ELSE 0 END),
                       SUM(CASE WHEN s4 THEN nc ELSE 0 END) FROM final
    ) s ORDER BY s.stage
"""


@register(
    "q_doc_curation_funnel",
    oracle=_FUNNEL_SQL,
    doc="The whole curation pipeline as one lazy DAG with per-stage "
    "audit counts (operators.text.curation_funnel): quality gate -> "
    "language allowlist -> hash-keyed exact dedup -> train split. "
    "Cumulative stage flags are computed in the scan stage; the only "
    "pre-aggregate shuffle is the dedup window on the 128-bit content "
    "key. The oracle recomputes every stage from scratch in SQL, so "
    "the funnel's composition semantics (not just each operator alone) "
    "are cross-engine pinned.",
)
def q_doc_curation_funnel(spark: SparkSession, sf: str) -> DataFrame:
    return tx.curation_funnel(T(spark, sf, "documents")).orderBy("stage")


_NORMALIZE_SQL = r"""
    WITH aug AS (
      -- the synthetic corpus is already clean, so append deterministic
      -- byte noise (double spaces, a tab, a BEL control char) — same
      -- construction on both engines, like the synthesized-PII oracle
      SELECT doc_id,
             text || '  noisy' || chr(9) || 'tail' || chr(7) AS raw
      FROM documents
    ),
    norm AS (
      SELECT doc_id, raw,
             trim(regexp_replace(
               regexp_replace(raw, '[\x00-\x1F\x7F]', ' ', 'g'),
               '\s+', ' ', 'g')) AS clean
      FROM aug
    )
    SELECT doc_id,
           CAST(length(raw) AS BIGINT) AS n_chars_raw,
           CAST(length(clean) AS BIGINT) AS n_chars_norm,
           CAST(CASE WHEN clean <> raw THEN 1 ELSE 0 END AS BIGINT) AS changed
    FROM norm ORDER BY doc_id
"""


@register(
    "q_doc_normalize",
    oracle=_NORMALIZE_SQL,
    doc="Text normalization (operators.text.normalize_text): strip "
    "control chars, collapse whitespace, trim — the byte-noise cleanup "
    "that runs before content hashing so formatting differences don't "
    "defeat exact dedup. The corpus is synthetically clean, so the "
    "query appends deterministic noise (both engines construct the "
    "same bytes) and compares per-doc before/after lengths.",
)
def q_doc_normalize(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit("  noisy"),
        F.lit("\t"),
        F.lit("tail"),
        F.lit("\x07"),
    )
    return (
        d.select("doc_id", raw.alias("_raw"))
        .select(
            "doc_id",
            F.length("_raw").cast("long").alias("n_chars_raw"),
            F.length(tx.normalize_text(F.col("_raw")))
            .cast("long")
            .alias("n_chars_norm"),
            F.when(tx.normalize_text(F.col("_raw")) != F.col("_raw"), 1)
            .otherwise(0)
            .cast("long")
            .alias("changed"),
        )
        .orderBy("doc_id")
    )


_CONTAINED_SQL = r"""
    WITH aug AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      -- plant verbatim excerpts (first 10 tokens) of every 20th doc,
      -- deterministically on both engines
      SELECT doc_id + 1000000 AS doc_id,
             array_to_string(list_slice(
               regexp_split_to_array(trim(text), '\s+'), 1, 10), ' ') AS text
      FROM documents WHERE doc_id % 20 = 0
    ),
    -- token-aligned contract (same as operators.dedup.contained_docs):
    -- single-space token rejoin, containment checked space-padded
    norm AS (
      SELECT doc_id,
             array_to_string(regexp_split_to_array(trim(text), '\s+'), ' ')
               AS n
      FROM aug WHERE length(trim(text)) > 0
    )
    SELECT a.doc_id AS contained_id, b.doc_id AS container_id
    FROM norm a JOIN norm b
      ON a.doc_id <> b.doc_id
     AND position((' ' || a.n || ' ') IN (' ' || b.n || ' ')) > 0
     AND (length(a.n) < length(b.n)
          OR (a.n = b.n AND a.doc_id > b.doc_id))
    ORDER BY contained_id, container_id
"""


@register(
    "q_doc_contained",
    oracle=_CONTAINED_SQL,
    doc="Containment dedup (operators.dedup.contained_docs): documents "
    "appearing verbatim inside another (excerpts/quotes — Jaccard "
    "under-scores these). Candidates from gram posting lists with a "
    "full-coverage filter (a doc can only be contained where ALL its "
    "grams occur), token-aligned verification on candidates only — "
    "never corpus x corpus on the main lane; sub-k-token docs go "
    "through the bounded broadcast lane. CONTRACT (both engines): "
    "containment is TOKEN-ALIGNED — A contained in B iff A's token "
    "sequence is a contiguous run of B's tokens; character-level "
    "substrings crossing token boundaries ('bc def' in 'abc def') are "
    "out of contract on BOTH sides, so the oracle cannot diverge on "
    "such corpora (round-3 ADVICE gap, closed). The corpus has no "
    "natural containment, so the query plants deterministic 10-token "
    "excerpts; the brute-force O(n^2) oracle is feasible at sf0.01 "
    "while the Spark path stays posting-bucketed.",
)
def q_doc_contained(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents").select("doc_id", "text")
    excerpt = F.concat_ws(
        " ",
        F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, 10),
    )
    planted = d.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        excerpt.alias("text"),
    )
    return (
        dd.contained_docs(d.unionByName(planted), "doc_id", "text", k=5)
        .orderBy("contained_id", "container_id")
    )


_VOCAB_OVERLAP_SQL = r"""
    WITH vocab AS (
      SELECT DISTINCT lang,
             unnest(regexp_split_to_array(trim(text), '\s+')) AS token
      FROM documents WHERE length(trim(text)) > 0
    ),
    sizes AS (SELECT lang, COUNT(*) AS n FROM vocab GROUP BY lang),
    inter AS (
      SELECT a.lang AS lang_a, b.lang AS lang_b, COUNT(*) AS n_shared
      FROM vocab a JOIN vocab b
        ON a.token = b.token AND a.lang < b.lang
      GROUP BY a.lang, b.lang
    )
    SELECT i.lang_a, i.lang_b,
           CAST(i.n_shared AS BIGINT) AS n_shared,
           CAST(sa.n AS BIGINT) AS vocab_a,
           CAST(sb.n AS BIGINT) AS vocab_b,
           CAST(i.n_shared AS DOUBLE)
             / (sa.n + sb.n - i.n_shared) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.lang = i.lang_a
    JOIN sizes sb ON sb.lang = i.lang_b
    ORDER BY lang_a, lang_b
"""


@register(
    "q_vocab_overlap",
    oracle=_VOCAB_OVERLAP_SQL,
    doc="Exact cross-language vocabulary overlap: per language pair the "
    "shared distinct-token count and vocabulary Jaccard — the corpus-"
    "composition diagnostic behind mixture decisions (languages with "
    "high lexical overlap cross-contaminate language-ID and dedup "
    "thresholds). Vocab tables are distinct-collapsed BEFORE the self-"
    "join, so the join is vocabulary x vocabulary on the token key — "
    "bounded by lexicon size, never corpus x corpus. Jaccard is one "
    "exact int division per pair (engine-identical).",
)
def q_vocab_overlap(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents")
    vocab = d.select(
        "lang", F.explode(tx.tokens("text")).alias("token")
    ).distinct()
    sizes = vocab.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    a, b = vocab.alias("a"), vocab.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.lang") < F.col("b.lang")),
        )
        .groupBy(
            F.col("a.lang").alias("lang_a"), F.col("b.lang").alias("lang_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        inter.join(sizes.withColumnRenamed("lang", "lang_a"), "lang_a")
        .withColumnRenamed("n", "vocab_a")
        .join(sizes.withColumnRenamed("lang", "lang_b"), "lang_b")
        .withColumnRenamed("n", "vocab_b")
        .select(
            "lang_a",
            "lang_b",
            F.col("n_shared").cast("long").alias("n_shared"),
            F.col("vocab_a").cast("long").alias("vocab_a"),
            F.col("vocab_b").cast("long").alias("vocab_b"),
            (
                F.col("n_shared").cast("double")
                / (F.col("vocab_a") + F.col("vocab_b") - F.col("n_shared"))
            ).alias("jaccard"),
        )
        .orderBy("lang_a", "lang_b")
    )


_VOCAB_SKETCH_SQL = r"""
    WITH vocab AS (
      SELECT DISTINCT lang,
             unnest(regexp_split_to_array(trim(text), '\s+')) AS token
      FROM documents WHERE length(trim(text)) > 0
    ),
    sizes AS (SELECT lang, COUNT(*) AS n FROM vocab GROUP BY lang),
    inter AS (
      SELECT a.lang AS lang_a, b.lang AS lang_b, COUNT(*) AS n_shared
      FROM vocab a JOIN vocab b
        ON a.token = b.token AND a.lang < b.lang
      GROUP BY a.lang, b.lang
    )
    SELECT i.lang_a, i.lang_b,
           CAST(i.n_shared AS BIGINT) AS exact_shared,
           CAST(sa.n + sb.n - i.n_shared AS BIGINT) AS exact_union,
           TRUE AS shared_ok, TRUE AS union_ok
    FROM inter i
    JOIN sizes sa ON sa.lang = i.lang_a
    JOIN sizes sb ON sb.lang = i.lang_b
    ORDER BY lang_a, lang_b
"""


@register(
    "q_vocab_overlap_sketch",
    oracle=_VOCAB_SKETCH_SQL,
    doc="Scale-path twin of q_vocab_overlap: theta sketches replace the "
    "exact distinct-vocab self-join. One pass builds a per-language "
    "theta sketch of the token set (map-side aggregation, fixed-size "
    "state); pairwise overlap comes from sketch set-algebra "
    "(theta_intersection / theta_union) on the collected per-language "
    "states — |langs|² tiny operations on the driver side of a 5-row "
    "frame, zero token-level joins. At 100 TB the exact path's "
    "vocab x vocab join grows with lexicon size; the sketch path is "
    "constant-state per language. Certified via the assertion pattern: "
    "estimates are engine-specific, so the compared output is the "
    "exact pairwise counts (both engines compute them — Spark runs the "
    "exact lane alongside at certification scale) plus booleans "
    "asserting |est - exact| <= max(2, 5% of exact), the same bound "
    "test_vocab_overlap_sketch_accuracy pins; DuckDB asserts literal "
    "TRUE. In production only the sketch lane runs.",
)
def q_vocab_overlap_sketch(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents")
    toks = d.select("lang", F.explode(tx.tokens("text")).alias("token"))
    sketches = toks.groupBy("lang").agg(
        F.theta_sketch_agg("token").alias("theta")
    )
    a = sketches.select(
        F.col("lang").alias("lang_a"), F.col("theta").alias("_ta")
    )
    b = sketches.select(
        F.col("lang").alias("lang_b"), F.col("theta").alias("_tb")
    )
    est = a.join(b, F.col("lang_a") < F.col("lang_b")).select(
        "lang_a",
        "lang_b",
        F.round(
            F.expr("theta_sketch_estimate(theta_intersection(_ta, _tb))")
        )
        .cast("long")
        .alias("est_shared"),
        F.round(F.expr("theta_sketch_estimate(theta_union(_ta, _tb))"))
        .cast("long")
        .alias("est_union"),
    )
    # exact twin (certification comparator): distinct vocab self-join,
    # lexicon-bounded — same shape as q_vocab_overlap
    vocab = toks.distinct()
    sizes = vocab.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    va, vb = vocab.alias("a"), vocab.alias("b")
    exact = (
        va.join(
            vb,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.lang") < F.col("b.lang")),
        )
        .groupBy(
            F.col("a.lang").alias("lang_a"), F.col("b.lang").alias("lang_b")
        )
        .agg(F.count(F.lit(1)).alias("exact_shared"))
        .join(
            sizes.select(
                F.col("lang").alias("lang_a"), F.col("n").alias("_na")
            ),
            "lang_a",
        )
        .join(
            sizes.select(
                F.col("lang").alias("lang_b"), F.col("n").alias("_nb")
            ),
            "lang_b",
        )
        .select(
            "lang_a",
            "lang_b",
            F.col("exact_shared").cast("long").alias("exact_shared"),
            (F.col("_na") + F.col("_nb") - F.col("exact_shared"))
            .cast("long")
            .alias("exact_union"),
        )
    )

    def within(est_c: str, ex_c: str):
        bound = F.greatest(
            F.lit(2.0), 0.05 * F.col(ex_c).cast("double")
        )
        return (
            F.abs(F.col(est_c).cast("double") - F.col(ex_c).cast("double"))
            <= bound
        )

    return (
        exact.join(est, ["lang_a", "lang_b"])
        .select(
            "lang_a",
            "lang_b",
            "exact_shared",
            "exact_union",
            within("est_shared", "exact_shared").alias("shared_ok"),
            within("est_union", "exact_union").alias("union_ok"),
        )
        .orderBy("lang_a", "lang_b")
    )


@register(
    "q_doc_paragraph_dedup",
    oracle="""
    WITH d AS (
      SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents
    ),
    blocks AS (
      SELECT d.doc_id, CAST(b.b AS BIGINT) AS block_idx,
             array_to_string(toks[(b.b*20+1):(b.b*20+20)], ' ') AS block_text
      FROM d, range(4096) b(b)
      WHERE b.b * 20 < len(toks)
    ),
    firsts AS (
      SELECT block_text, MIN(doc_id * 1000000 + block_idx) AS fk
      FROM blocks GROUP BY block_text
    ),
    flagged AS (
      SELECT bl.doc_id, bl.block_idx, bl.block_text,
             bl.doc_id * 1000000 + bl.block_idx = f.fk AS keep
      FROM blocks bl JOIN firsts f USING (block_text)
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_blocks,
           CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
             AS kept_blocks,
           COALESCE(string_agg(CASE WHEN keep THEN block_text END,
                               ' ' ORDER BY block_idx), '') AS new_text,
           CAST(length(COALESCE(string_agg(
                CASE WHEN keep THEN block_text END,
                ' ' ORDER BY block_idx), '')) AS BIGINT) AS new_n_chars
    FROM flagged GROUP BY doc_id ORDER BY doc_id
    """,
    doc="C4-style paragraph-level dedup (operators.text.paragraph_dedup): "
    "20-token blocks, global keep-first occurrence, per-document "
    "reassembly of the surviving text. Block formation is map-side "
    "(transform over sequence, no explode/groupBy round trip); the two "
    "wide stages shuffle on block_text (keep-first window) and doc_id "
    "(reassembly). The oracle recomputes every block, the keep-first "
    "choice, AND the reassembled text in SQL — the full output text is "
    "value-compared, not just the counts.",
)
def q_doc_paragraph_dedup(spark: SparkSession, sf: str) -> DataFrame:
    return tx.paragraph_dedup(
        T(spark, sf, "documents"), block_tokens=20
    ).orderBy("doc_id")


@register(
    "q_doc_bloom_prefilter",
    oracle="""
    WITH corpus AS (SELECT text FROM documents WHERE doc_id % 2 = 0),
    b AS (
      SELECT d.doc_id,
             EXISTS (SELECT 1 FROM corpus c WHERE c.text = d.text)
               AS is_member
      FROM documents d
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_batch,
           CAST(SUM(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exact_members,
           TRUE AS no_false_negatives,
           TRUE AS fp_rate_ok
    FROM b
    """,
    doc="Bloom-filter membership pre-filter (operators.dedup."
    "build_bloom / bloom_might_contain): 64 Kbit filter built over the "
    "even-doc_id half of the corpus (distributed position compute, "
    "bounded-by-n_bits collect), then every document tested by pure "
    "codegen bit arithmetic — no join for filter-rejected rows. "
    "Certified by the two properties that make a Bloom filter a Bloom "
    "filter: ZERO false negatives (every exact member flagged maybe — "
    "Spark cross-checks against an exact semi-join; DuckDB recomputes "
    "exact membership and asserts the literal) and a false-positive "
    "rate under the sizing bound (~(1-e^-kn/m)^k ~ 5e-8 here, checked "
    "at 5%). Exact member counts are value-compared across engines.",
)
def q_doc_bloom_prefilter(spark: SparkSession, sf: str) -> DataFrame:
    docs = T(spark, sf, "documents")
    corpus = docs.filter(F.col("doc_id") % 2 == 0).select("text")
    flagged = dd.bloom_prefilter_new(docs, corpus, key_col="text")
    member = (
        corpus.distinct()
        .withColumn("_m", F.lit(True))
        .withColumnRenamed("text", "_ctext")
    )
    # AQE-sized, not hint-forced: member is corpus-derived, and a
    # forced broadcast of a growing side is exactly the 100x-sweep
    # failure mode (see dedup_against_corpus) — at sf it broadcasts
    # anyway, at scale it degrades to a shuffle join
    joined = flagged.join(
        member, flagged["text"] == member["_ctext"], "left"
    ).select(
        "doc_id",
        "bloom_maybe",
        F.coalesce("_m", F.lit(False)).alias("is_member"),
    )
    n_nonmember = F.sum((~F.col("is_member")).cast("long"))
    fp = F.sum((F.col("bloom_maybe") & ~F.col("is_member")).cast("long"))
    return joined.agg(
        F.count(F.lit(1)).alias("n_batch"),
        F.sum(F.col("is_member").cast("long")).alias("n_exact_members"),
        F.min(
            (F.col("bloom_maybe") | ~F.col("is_member")).cast("int")
        ).cast("boolean").alias("no_false_negatives"),
        (fp <= 0.05 * n_nonmember).alias("fp_rate_ok"),
    )


@register(
    "q_doc_tfidf_top",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
    ),
    dfreq AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    ranked AS (
      SELECT tf.doc_id, tf.term,
             CAST(tf.tf AS BIGINT) AS tf, CAST(dfreq.df AS BIGINT) AS df,
             ROW_NUMBER() OVER (
               PARTITION BY tf.doc_id
               ORDER BY tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df)
                        DESC, tf.term
             ) AS rank
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, df, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank
    """,
    doc="TF-IDF document keyword extraction (operators.text.tf_idf): "
    "top-3 terms per document by tf * ln(N/df), term-asc tie-break. "
    "Compared values are the exact integer tf/df/rank lanes; the float "
    "tfidf score itself is excluded from the output (ln is the one "
    "non-exactly-rounded scalar in the pipeline — rank flips would "
    "need a < 1e-14 score gap between integer-parameter scores, which "
    "exact (tf, df) ties already resolve via the term tie-break). "
    "Corpus count rides as a broadcast 1-row aggregate — no driver "
    "action in the plan.",
)
def q_doc_tfidf_top(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    scored = tx.tf_idf(T(spark, sf, "documents"))
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "tf", "df", F.col("rank").cast("long").alias("rank"))
        .orderBy("doc_id", "rank")
    )


@register(
    "q_doc_bm25_topk",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term
      FROM documents WHERE length(trim(text)) > 0
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    n AS (
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split(trim(text), ' ')) END) AS DOUBLE)
               / COUNT(*) AS avgdl
      FROM documents
    ),
    q AS (
      SELECT DISTINCT doc_id AS query_id, term FROM toks
      WHERE doc_id < 8
    ),
    scored AS (
      SELECT q.query_id, tf.doc_id,
             COUNT(*) AS n_terms, SUM(tf.tf) AS sum_tf,
             SUM(
               ln(1 + (n.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
               * tf.tf * 2.2
               / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / n.avgdl))
             ) AS score
      FROM q
      JOIN tf USING (term)
      JOIN dfreq USING (term)
      JOIN dl ON tf.doc_id = dl.doc_id
      CROSS JOIN n
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT query_id, doc_id, n_terms, sum_tf,
             ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY score DESC, doc_id
             ) AS rank
      FROM scored
    )
    SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id,
           CAST(n_terms AS BIGINT) AS n_terms,
           CAST(sum_tf AS BIGINT) AS sum_tf
    FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
    """,
    doc="BM25 top-5 retrieval (operators.text.bm25_topk): the first 8 "
    "documents act as queries against the whole corpus. Lexical search "
    "as a sparse TERM EQUI-JOIN against the postings — only postings "
    "of terms a query contains ever shuffle (the inverted-index access "
    "path; never query x corpus). Lucene idf ln(1+(N-df+0.5)/(df+0.5)), "
    "k1=1.2, b=0.75; N/avgdl ride as a broadcast 1-row aggregate. "
    "Compared values are the exact integer (rank, n_terms, sum_tf) "
    "lanes; the float score is excluded like q_doc_tfidf_top's (rank "
    "flips would need sub-1e-13 score gaps, and exact ties already "
    "resolve via the doc-id tie-break).",
)
def q_doc_bm25_topk(spark: SparkSession, sf: str) -> DataFrame:
    docs = T(spark, sf, "documents")
    queries = docs.filter(F.col("doc_id") < 8).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("qtext")
    )
    return (
        tx.bm25_topk(docs, queries, k=5)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "doc_id",
            "n_terms",
            "sum_tf",
        )
        .orderBy("query_id", "rank")
    )


@register(
    "q_doc_cm_counts",
    oracle="""
    WITH toks AS (
      SELECT unnest(string_split(trim(text), ' ')) AS term FROM documents
    ),
    exact AS (
      SELECT term, COUNT(*) AS c FROM toks GROUP BY term
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(c) AS BIGINT) AS total_tokens,
           TRUE AS never_undercount,
           TRUE AS within_bound_frac_ok
    FROM exact
    """,
    doc="Count-min sketch frequency estimation (operators."
    "incremental_agg.cm_sketch/cm_estimate): depth-4 x width-2048 "
    "counter state — CONSTANT size regardless of corpus size, "
    "mergeable by counter addition (shards sketch independently, "
    "answers come from the state union; merge law pinned in "
    "test_incremental_agg.py). Certified by the sketch's two "
    "guarantees: estimates NEVER undercount (structural: min over "
    "rows of summed counters) and >= 95% of keys stay within the "
    "ceil(e*N/width) Cormode-Muthukrishnan overcount bound. The "
    "exact vocabulary size and total token count are value-compared "
    "integer lanes.",
)
def q_doc_cm_counts(spark: SparkSession, sf: str) -> DataFrame:
    import math

    from incremental_github_data_pipeline_spark.operators import (
        incremental_agg as ia,
    )

    toks = T(spark, sf, "documents").select(
        F.explode(tx.tokens("text")).alias("term")
    )
    sketch = ia.cm_sketch(toks, "term", width=2048, depth=4)
    exact = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    est = ia.cm_estimate(exact, sketch, "term", width=2048, depth=4)
    total = est.agg(F.sum("c").alias("_t"))
    bound = F.ceil(F.lit(math.e) * F.col("_t") / F.lit(2048.0))
    return (
        est.crossJoin(F.broadcast(total))
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("c").cast("long").alias("total_tokens"),
            F.min((F.col("cm_est") >= F.col("c")).cast("int"))
            .cast("boolean")
            .alias("never_undercount"),
            (
                F.sum(((F.col("cm_est") - F.col("c")) <= bound).cast("long"))
                >= 0.95 * F.count(F.lit(1))
            ).alias("within_bound_frac_ok"),
        )
    )


@register(
    "q_doc_fuzzy_pairs",
    oracle="""
    WITH b AS (
      SELECT doc_id, lang, n_chars // 10 AS blk, substr(text, 1, 30) AS pfx
      FROM documents
    )
    SELECT a.doc_id AS id_a, c.doc_id AS id_b,
           CAST(levenshtein(a.pfx, c.pfx) AS BIGINT) AS edit_dist
    FROM b a JOIN b c
      ON a.lang = c.lang AND a.blk = c.blk AND a.doc_id < c.doc_id
    WHERE levenshtein(a.pfx, c.pfx) <= 5
    ORDER BY id_a, id_b
    """,
    doc="Blocked fuzzy matching (entity-resolution shape): Levenshtein "
    "edit distance <= 5 on 30-char prefixes, candidate pairs generated "
    "ONLY within (lang, n_chars/10) blocks — the blocking join is an "
    "equi-join on the block key, never corpus x corpus, and the "
    "quadratic distance computation runs on within-block candidates "
    "only (the standard record-linkage decomposition; same contract "
    "caveat as every blocked matcher: cross-block pairs are out of "
    "scope by design). Both engines implement classic DP edit "
    "distance, so the integer distances compare exactly.",
)
def q_doc_fuzzy_pairs(spark: SparkSession, sf: str) -> DataFrame:
    b = T(spark, sf, "documents").select(
        "doc_id",
        "lang",
        (F.col("n_chars") / 10).cast("long").alias("blk"),
        F.substring("text", 1, 30).alias("pfx"),
    )
    lhs, rhs = b.alias("a"), b.alias("c")
    return (
        lhs.join(
            rhs,
            (F.col("a.lang") == F.col("c.lang"))
            & (F.col("a.blk") == F.col("c.blk"))
            & (F.col("a.doc_id") < F.col("c.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("c.doc_id").alias("id_b"),
            F.levenshtein(F.col("a.pfx"), F.col("c.pfx"))
            .cast("long")
            .alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 5)
        .orderBy("id_a", "id_b")
    )


@register(
    "q_doc_minhash_join",
    oracle="""
    WITH l AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 250
    ),
    r AS (
      SELECT doc_id + 1000000 AS doc_id, text FROM documents
      WHERE doc_id < 25
      UNION ALL
      SELECT doc_id, text FROM documents WHERE doc_id >= 250
    ),
    lg AS (
      SELECT doc_id, unnest(CASE WHEN len(t) >= 5
                     THEN list_transform(range(1, len(t) - 3),
                                         i -> array_to_string(t[i:i+4], ' '))
                     ELSE [array_to_string(t, ' ')] END) AS sh
      FROM (SELECT doc_id, string_split(trim(text), ' ') AS t FROM l)
    ),
    rg AS (
      SELECT doc_id, unnest(CASE WHEN len(t) >= 5
                     THEN list_transform(range(1, len(t) - 3),
                                         i -> array_to_string(t[i:i+4], ' '))
                     ELSE [array_to_string(t, ' ')] END) AS sh
      FROM (SELECT doc_id, string_split(trim(text), ' ') AS t FROM r)
    ),
    ldg AS (SELECT DISTINCT doc_id, sh FROM lg),
    rdg AS (SELECT DISTINCT doc_id, sh FROM rg),
    ls AS (SELECT doc_id, COUNT(*) AS ns FROM ldg GROUP BY 1),
    rs AS (SELECT doc_id, COUNT(*) AS ns FROM rdg GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS id_l, b.doc_id AS id_r, COUNT(*) AS ni
      FROM ldg a JOIN rdg b USING (sh) GROUP BY 1, 2
    )
    SELECT id_l, id_r,
           CAST(ni AS DOUBLE) / (ls.ns + rs.ns - ni) AS jaccard,
           TRUE AS lsh_found
    FROM inter
    JOIN ls ON ls.doc_id = id_l
    JOIN rs ON rs.doc_id = id_r
    WHERE CAST(ni AS DOUBLE) / (ls.ns + rs.ns - ni) >= 0.8
    ORDER BY id_l, id_r
    """,
    doc="Cross-corpus MinHash JOIN (operators.dedup.minhash_join): LSH "
    "banding between two different frames — the new-crawl-vs-training-"
    "corpus dedup shape where within-side pairs must NOT materialize. "
    "Left = docs < 250; right = the rest plus planted copies of the "
    "first 25 left docs (id+10^6). Compared output is the exact "
    "cross-corpus Jaccard>=0.8 truth set (posting-list algebra in "
    "both engines) with a boolean asserting the banded join surfaced "
    "each pair (the q_minhash_near_dups recall-coupling pattern, "
    "cross-corpus variant). The float jaccard compares exactly: one "
    "IEEE division on integer operands in both engines.",
)
def q_doc_minhash_join(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents").select("doc_id", "text")
    left = d.filter(F.col("doc_id") < 250)
    right = d.filter(F.col("doc_id") < 25).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    ).unionByName(d.filter(F.col("doc_id") >= 250))
    found = dd.minhash_join(
        left.withColumnRenamed("doc_id", "id_l"),
        right.withColumnRenamed("doc_id", "id_r"),
        id_left="id_l", id_right="id_r", text_col="text",
        num_hashes=32, bands=8, k=5, threshold=0.8,
    ).select("id_l", "id_r", F.lit(True).alias("_f"))
    # truth side: exact cross-corpus jaccard from gram posting lists
    def grams(df, alias):
        return df.select(
            F.col("doc_id").alias(alias),
            F.explode(F.array_distinct(tx.shingles("text", 5))).alias("_sh"),
        )
    lg = grams(left, "id_l").localCheckpoint(eager=True)
    rg = grams(right, "id_r").localCheckpoint(eager=True)
    ls = lg.groupBy("id_l").agg(F.count(F.lit(1)).alias("_la"))
    rs = rg.groupBy("id_r").agg(F.count(F.lit(1)).alias("_lb"))
    inter = (
        lg.join(rg, "_sh")
        .groupBy("id_l", "id_r")
        .agg(F.count(F.lit(1)).alias("_ni"))
    )
    truth = (
        inter.join(ls, "id_l")
        .join(rs, "id_r")
        .withColumn(
            "jaccard",
            F.col("_ni").cast("double")
            / (F.col("_la") + F.col("_lb") - F.col("_ni")),
        )
        .filter(F.col("jaccard") >= 0.8)
    )
    return (
        truth.join(found, ["id_l", "id_r"], "left")
        .select(
            "id_l",
            "id_r",
            "jaccard",
            F.coalesce("_f", F.lit(False)).alias("lsh_found"),
        )
        .orderBy("id_l", "id_r")
    )


@register(
    "q_doc_allpairs_join",
    oracle=r"""
    WITH aug AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
      UNION ALL
      SELECT doc_id + 2000000, text || ' zzextraqq'
      FROM documents WHERE doc_id % 5 = 0 AND doc_id < 150
    ),
    toks AS (
      SELECT DISTINCT doc_id,
             unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
      FROM aug WHERE length(trim(text)) > 0
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ni
      FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           CAST(ni AS DOUBLE) / (sa.n + sb.n - ni) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE 100 * ni >= 70 * (sa.n + sb.n - ni)
    ORDER BY id_a, id_b
    """,
    doc="EXACT set-similarity join at Jaccard>=0.7 via AllPairs prefix "
    "filtering (operators.dedup.allpairs_jaccard_join — Bayardo "
    "WWW'07): tokens ordered globally by ascending document frequency, "
    "candidates only from each doc's |x|-ceil(t|x|)+1 RAREST tokens "
    "(short posting lists by construction), exact intersection verify "
    "on candidates with an all-integer threshold test. Prefix "
    "filtering is LOSSLESS by pigeonhole — so unlike the MinHash "
    "lanes, the oracle is a full equality check against the "
    "brute-force truth set: one lost pair anywhere fails rows_match. "
    "Corpus = every 5th doc plus planted one-token-appended "
    "near-copies; jaccard is a single IEEE division of exact ints.",
)
def q_doc_allpairs_join(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents").select("doc_id", "text")
    sub = d.filter(F.col("doc_id") % 5 == 0)
    aug = sub.unionByName(
        sub.filter(F.col("doc_id") < 150).select(
            (F.col("doc_id") + 2_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zzextraqq")).alias("text"),
        )
    )
    return dd.allpairs_jaccard_join(
        aug, id_col="doc_id", text_col="text", threshold_pct=70
    ).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "jaccard",
    ).orderBy("id_a", "id_b")


@register(
    "q_doc_cap_per_source",
    oracle="""
    WITH h AS (
      SELECT source, doc_id,
             (doc_id * 2654435761) % 2147483648 AS hk
      FROM documents
    ),
    r AS (
      SELECT source, doc_id, hk,
             CAST(ROW_NUMBER() OVER (PARTITION BY source
                                     ORDER BY hk, doc_id) AS BIGINT) AS rk
      FROM h
    )
    SELECT source, CAST(doc_id AS BIGINT) AS doc_id,
           CAST(hk AS BIGINT) AS hk, rk
    FROM r WHERE rk <= 50 ORDER BY source, rk
    """,
    doc="Deterministic per-stratum capping (the 'at most K documents "
    "per domain/source' curation op): rank rows inside each stratum by "
    "a Knuth multiplicative hash of the id — a uniform, seedless, "
    "engine-portable pseudo-order in pure int64 arithmetic — and keep "
    "the first K. Unlike TABLESAMPLE/rand(), the kept SET is "
    "bit-reproducible across engines and runs, which is what makes "
    "training-data curation auditable. One window shuffle on the "
    "stratum key; at 100 TB the same expression pushes into a filter "
    "when K/N per stratum is known (hash threshold instead of "
    "row_number).",
)
def q_doc_cap_per_source(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    d = T(spark, sf, "documents").select(
        "source",
        "doc_id",
        ((F.col("doc_id") * F.lit(2654435761)) % F.lit(2147483648)).alias(
            "hk"
        ),
    )
    w = Window.partitionBy("source").orderBy("hk", "doc_id")
    return (
        d.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 50)
        .select("source", "doc_id", "hk", "rk")
        .orderBy("source", "rk")
    )


def _gzip_corpus(spark):
    """16 payloads x 3 gzip members of closed-form text (mtime pinned
    to 0 so payload bytes are deterministic)."""
    import gzip as _gzip
    import io as _io

    def gz(data: bytes) -> bytes:
        buf = _io.BytesIO()
        with _gzip.GzipFile(
            fileobj=buf, mode="wb", mtime=0, compresslevel=6
        ) as f:
            f.write(data)
        return buf.getvalue()

    rows = []
    for i in range(16):
        members = []
        for m in range(3):
            n = 5 + ((i + m) % 6)
            text = " ".join(f"w{(i * 7 + m * 3 + j) % 20}" for j in range(n))
            members.append(gz(text.encode("utf-8")))
        rows.append((i, b"".join(members)))
    return local_rows_df(spark, rows, "payload_id long, payload binary")


@register(
    "q_text_gzip_ingest",
    oracle="""
    WITH ids AS (SELECT i, m FROM range(16) t(i), range(3) t2(m)),
    toks AS (
      SELECT i, m, j.j AS j
      FROM ids, range(11) j(j) WHERE j.j < 5 + ((i + m) % 6)
    ),
    txt AS (
      SELECT i AS payload_id, CAST(m AS INTEGER) AS member_idx,
             string_agg('w' || ((i*7 + m*3 + j) % 20), ' ' ORDER BY j)
               AS text
      FROM toks GROUP BY 1, 2
    )
    SELECT payload_id, member_idx, text,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(5 + ((payload_id + member_idx) % 6) AS BIGINT) AS n_tokens
    FROM txt ORDER BY payload_id, member_idx
    """,
    doc="Compressed text ingestion (operators.text.gzip_ingest): "
    "multi-member gzip payloads — the WARC/WET shard layout, one "
    "document per member — split on REAL member boundaries via zlib "
    "unused_data and decoded in one Arrow-batched mapInPandas pass; "
    "char/token stats stay codegen-side. Payload bytes are "
    "deterministic (mtime=0), member text is closed-form, so DuckDB "
    "reconstructs every decoded string with string_agg over range() "
    "and the full text column value-compares. Decompression runs "
    "where the bytes live: no shuffle, corpus-parallel at 100 TB.",
)
def q_text_gzip_ingest(spark: SparkSession, sf: str) -> DataFrame:
    docs = tx.gzip_ingest(_gzip_corpus(spark))
    return docs.select(
        "payload_id",
        "member_idx",
        "text",
        F.length("text").cast("long").alias("n_chars"),
        F.size(tx.tokens("text")).cast("long").alias("n_tokens"),
    ).orderBy("payload_id", "member_idx")


@register(
    "q_doc_bpe_tokens",
    oracle=r"""
    SELECT doc_id,
           CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\s+')) END
                AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text,
                '[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]')) AS BIGINT)
             AS n_bpe_tokens,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM documents ORDER BY doc_id
    """,
    doc="Token-count surface: whitespace tokens next to the BPE-ish "
    "regex sub-word count (word pieces / number runs / single "
    "punctuation — operators.text.bpe_ish_token_count), the length "
    "budgeting proxy used when no tokenizer model ships with the "
    "engine. Both counts are pure codegen scan-stage expressions; the "
    "regex is RE2-safe so DuckDB evaluates the identical pattern.",
)
def q_doc_bpe_tokens(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents")
    return d.select(
        "doc_id",
        tx.token_count("text").cast("long").alias("n_ws_tokens"),
        tx.bpe_ish_token_count("text").cast("long").alias("n_bpe_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    ).orderBy("doc_id")


@register(
    "q_unigram_tokenize",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_words,
           TRUE AS lossless,
           TRUE AS tokens_le_chars
    FROM documents WHERE length(trim(text)) > 0
    ORDER BY doc_id
    """,
    doc="Unigram-LM tokenizer train + apply (operators.text."
    "learn_unigram -> bpe_tokenize lookup join): EM over the word-type "
    "table with per-word integer-quantized expected counts (the "
    "pagerank determinism discipline), then integer-score Viterbi "
    "segmentation applied via the same broadcast word->syms join as "
    "BPE. The segmentation itself has no SQL oracle (forward-backward "
    "+ Viterbi), so the CERTIFIED lanes are structural invariants the "
    "oracle states in closed form and Spark must PROVE from the actual "
    "segmentation (the q_embedding_ivf_topk pattern): per doc, "
    "n_words matches the whitespace tokenization, the reassembled "
    "pieces spell the document back losslessly (lossless TRUE), and "
    "the piece count never exceeds the character count "
    "(tokens_le_chars TRUE).",
)
def q_unigram_tokenize(spark: SparkSession, sf: str) -> DataFrame:
    docs = T(spark, sf, "documents")
    vocab, _pieces = tx.learn_unigram(
        docs, vocab_size=256, n_iters=2, max_piece_len=4, seed_size=1024
    )
    out = tx.bpe_tokenize(docs, vocab)
    stripped = F.regexp_replace(F.col("text"), r"\s+", "")
    return (
        out.join(docs.select("doc_id", "text"), "doc_id")
        .select(
            "doc_id",
            "n_words",
            (
                F.regexp_replace(F.col("bpe_text"), " ", "")
                == stripped
            ).alias("lossless"),
            (F.col("n_tokens") <= F.length(stripped)).alias(
                "tokens_le_chars"
            ),
        )
        .orderBy("doc_id")
    )


@register(
    "q_unigram_pieces",
    oracle="""
    WITH chars AS (
      SELECT DISTINCT unnest(string_split(
        regexp_replace(trim(text), '\\s+', '', 'g'), '')) AS ch
      FROM documents WHERE length(trim(text)) > 0
    )
    SELECT CAST((SELECT COUNT(*) FROM chars) AS BIGINT)
             AS n_corpus_chars,
           TRUE AS all_chars_covered,
           TRUE AS ranks_contiguous,
           TRUE AS counts_nonincreasing
    """,
    doc="Unigram-LM piece inventory invariants (operators.text."
    "learn_unigram): the trained piece table must cover every distinct "
    "character the corpus contains (the lossless-coverage floor that "
    "pruning is required to respect), carry contiguous ranks 1..n, and "
    "be ordered by non-increasing expected count. The oracle computes "
    "the corpus charset size in SQL and states the invariants; Spark "
    "must prove them from the actual trained table — structural "
    "certification for an EM artifact no SQL engine can replay.",
)
def q_unigram_pieces(spark: SparkSession, sf: str) -> DataFrame:
    docs = T(spark, sf, "documents")
    _vocab, pieces = tx.learn_unigram(
        docs, vocab_size=256, n_iters=2, max_piece_len=4, seed_size=1024
    )
    stripped = F.regexp_replace(F.trim(F.col("text")), r"\s+", "")
    corpus_chars = (
        docs.filter(F.length(F.trim("text")) > 0)
        .select(
            F.explode(F.split(stripped, "(?!^)")).alias("ch")
        )
        .filter(F.col("ch") != "")
        .distinct()
    )
    from pyspark.sql import Window

    # dropDuplicates (ADVICE r15): pieces are unique by construction, so
    # this is a no-op on the data — it makes n_chars/coverage robust by
    # construction should `singles` ever carry duplicates (the left join
    # below would otherwise inflate count(*)).
    singles = (
        pieces.filter(F.length("piece") == 1)
        .select(F.col("piece").alias("ch"))
        .dropDuplicates(["ch"])
    )
    # r15: ONE action for all four invariants — the previous form ran
    # four driver actions (two counts + two collects), each a separate
    # job over the same two bounded frames. The 1-row aggregates
    # crossJoin into a single plan; same values, one job (guide §1.2).
    char_stats = corpus_chars.join(
        singles.withColumn("_cov", F.lit(1)), "ch", "left"
    ).agg(
        F.count(F.lit(1)).alias("n_chars"),
        F.sum(F.coalesce("_cov", F.lit(0))).alias("n_covered"),
    )
    piece_stats = pieces.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("rank").alias("rmin"),
        F.max("rank").alias("rmax"),
        F.count_distinct("rank").alias("rdist"),
    )
    drop_stats = pieces.select(
        (
            F.col("qcount")
            - F.lead("qcount", 1).over(Window.orderBy("rank"))
        ).alias("drop")
    ).agg(F.min("drop").alias("mindrop"))
    row = (
        char_stats.crossJoin(piece_stats).crossJoin(drop_stats)
    ).collect()[0]
    return local_rows_df(
        spark,
        [
            (
                row["n_chars"],
                row["n_covered"] == row["n_chars"],
                row["rmin"] == 1
                and row["rmax"] == row["n"]
                and row["rdist"] == row["n"],
                (row["mindrop"] is None) or row["mindrop"] >= 0,
            )
        ],
        "n_corpus_chars long, all_chars_covered boolean, "
        "ranks_contiguous boolean, counts_nonincreasing boolean",
    )


@register(
    "q_doc_cluster_split",
    oracle=f"""
    WITH RECURSIVE {_GRAM_PAIRS_SQL},
    edges AS (
      SELECT ida AS src, idb AS dst FROM pairs
      UNION ALL SELECT idb, ida FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    reach(id, r) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT e.dst, reach.r FROM edges e JOIN reach ON e.src = reach.id
    ),
    cc AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id)
    SELECT d.doc_id,
           COALESCE(cc.component, d.doc_id) AS rep,
           CASE WHEN COALESCE(cc.component, d.doc_id) % 100 < 80
                THEN 'train'
                WHEN COALESCE(cc.component, d.doc_id) % 100 < 90
                THEN 'val' ELSE 'test' END AS split
    FROM documents d LEFT JOIN cc ON d.doc_id = cc.id
    ORDER BY d.doc_id
    """,
    doc="Leakage-safe train/val/test split (operators.dedup."
    "cluster_safe_split): near-dup cluster members share a split by "
    "construction — the split key is the connected component's min id "
    "(gram-overlap pairs -> min-label-propagation components; "
    "singletons key on their own id), then the same engine-portable "
    "rep % 100 modular assignment as q_doc_split. A per-document "
    "split puts one near-duplicate in train and its twin in test (the "
    "classic eval-contamination bug); this operator makes that "
    "impossible. Oracle: DuckDB recursive-CTE transitive closure + "
    "the identical CASE arithmetic.",
)
def q_doc_cluster_split(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents")
    pairs = dd.gram_overlap_pairs(d, id_col="doc_id", text_col="text", k=5)
    return (
        dd.cluster_safe_split(d, pairs, id_col="doc_id")
        .select("doc_id", "rep", "split")
        .orderBy("doc_id")
    )


@register(
    "q_doc_html_strip",
    oracle=r"""
    WITH wrapped AS (
      SELECT doc_id,
             '<html><head><script>var id=' || doc_id ||
             ';</script><style>.c' || doc_id || '{color:red}</style>'
             || '</head><body><!-- doc ' || doc_id || ' --><h1>D' ||
             doc_id || '</h1><p>' || text ||
             '</p><div class="f">&amp;src=' || doc_id ||
             '&nbsp;&lt;end&gt;</div></body></html>' AS html
      FROM documents WHERE doc_id < 300
    ),
    s1 AS (
      SELECT doc_id, regexp_replace(html,
        '(?is)<script[^>]*>.*?</script>', ' ', 'g') AS t FROM wrapped
    ),
    s2 AS (
      SELECT doc_id, regexp_replace(t,
        '(?is)<style[^>]*>.*?</style>', ' ', 'g') AS t FROM s1
    ),
    s3 AS (
      SELECT doc_id, regexp_replace(t, '(?s)<!--.*?-->', ' ', 'g') AS t
      FROM s2
    ),
    s4 AS (
      SELECT doc_id, regexp_replace(t, '<[^>]+>', ' ', 'g') AS t FROM s3
    ),
    s5 AS (
      SELECT doc_id,
             replace(replace(replace(replace(replace(replace(replace(
               t, '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
               '&quot;', '"'), '&#39;', ''''), '&apos;', ''''),
               '&amp;', '&') AS t
      FROM s4
    )
    SELECT doc_id,
           TRIM(regexp_replace(t, '\s+', ' ', 'g')) AS text,
           CAST(len(string_split(
             TRIM(regexp_replace(t, '\s+', ' ', 'g')), ' ')) AS BIGINT)
             AS n_tokens
    FROM s5 ORDER BY doc_id
    """,
    doc="HTML text extraction (r11, operators/text.strip_html) — the "
    "first stage of every crawl-text pipeline (the classic WET-style "
    "tag-blind extractor, not a DOM parser): script/style blocks "
    "removed WITH contents, comments and tags stripped, the dominant "
    "named entities decoded (amp last — double-escaped markup "
    "un-escapes one level, the standard behavior), whitespace "
    "collapsed. Docs are wrapped in deterministic markup with planted "
    "script/style/comment/entity traps, and the FULL stripped string "
    "is hash-compared cross-engine — the patterns are lookaround-free "
    "and non-greedy-only so Java regex and RE2 agree match for match. "
    "Pure codegen expressions, no UDF.",
)
def q_doc_html_strip(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents").filter(F.col("doc_id") < 300)
    did = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit("<html><head><script>var id="), did,
        F.lit(";</script><style>.c"), did,
        F.lit("{color:red}</style></head><body><!-- doc "), did,
        F.lit(" --><h1>D"), did, F.lit("</h1><p>"), F.col("text"),
        F.lit('</p><div class="f">&amp;src='), did,
        F.lit("&nbsp;&lt;end&gt;</div></body></html>"),
    )
    stripped = tx.strip_html(html)
    return d.select(
        "doc_id",
        stripped.alias("text"),
        F.size(F.split(stripped, " ")).cast("long").alias("n_tokens"),
    ).orderBy("doc_id")


@register(
    "q_url_canonical",
    oracle=r"""
    WITH u0 AS (
      SELECT doc_id,
             'HTTP' || CASE WHEN doc_id % 2 = 0 THEN 'S' ELSE '' END ||
             '://Host' || (doc_id % 7) || '.Example.COM' ||
             CASE WHEN doc_id % 3 = 0 THEN
               ':' || CASE WHEN doc_id % 2 = 0 THEN '443' ELSE '80' END
             ELSE '' END ||
             CASE WHEN doc_id % 5 = 0 THEN ''
                  ELSE '/Dir' || (doc_id % 4) ||
                       CASE CAST(doc_id % 6 AS INTEGER)
                         WHEN 1 THEN '/f%6fo%2Fb%61r'
                         WHEN 2 THEN '/%7e%5Fx%2e'
                         WHEN 3 THEN '/p%zz%'
                         WHEN 4 THEN '/%3fq%3d1'
                         ELSE '/p' END END ||
             CASE WHEN doc_id % 4 = 0 THEN ''
                  ELSE '?z=' || doc_id || '&a=' || (doc_id % 3) ||
                       CASE CAST(doc_id % 6 AS INTEGER)
                         WHEN 5 THEN '&utm_source=news&v=%4B'
                         WHEN 1 THEN '&fbclid=x%59z'
                         ELSE '' END END ||
             CASE WHEN doc_id % 2 = 0 THEN '#frag' || doc_id ELSE '' END
               AS u
      FROM documents WHERE doc_id < 400
    ),
    pct AS (
      SELECT doc_id,
             string_split(u, '%')[1] || COALESCE(array_to_string(
               list_transform(string_split(u, '%')[2:], p ->
                 CASE WHEN regexp_matches(substr(p, 1, 2),
                                          '^[0-9A-Fa-f]{2}$') THEN
                   CASE WHEN (
                       (strpos('0123456789abcdef',
                               substr(lower(p), 1, 1)) - 1) * 16
                     + (strpos('0123456789abcdef',
                               substr(lower(p), 2, 1)) - 1)
                     BETWEEN 65 AND 90)
                     OR ((strpos('0123456789abcdef',
                                 substr(lower(p), 1, 1)) - 1) * 16
                       + (strpos('0123456789abcdef',
                                 substr(lower(p), 2, 1)) - 1)
                       BETWEEN 97 AND 122)
                     OR ((strpos('0123456789abcdef',
                                 substr(lower(p), 1, 1)) - 1) * 16
                       + (strpos('0123456789abcdef',
                                 substr(lower(p), 2, 1)) - 1)
                       BETWEEN 48 AND 57)
                     OR ((strpos('0123456789abcdef',
                                 substr(lower(p), 1, 1)) - 1) * 16
                       + (strpos('0123456789abcdef',
                                 substr(lower(p), 2, 1)) - 1)
                       IN (45, 46, 95, 126))
                   THEN chr(CAST((strpos('0123456789abcdef',
                                    substr(lower(p), 1, 1)) - 1) * 16
                          + (strpos('0123456789abcdef',
                                    substr(lower(p), 2, 1)) - 1)
                            AS INTEGER))
                        || substr(p, 3)
                   ELSE '%' || upper(substr(p, 1, 2)) || substr(p, 3)
                   END
                 ELSE '%' || p END), ''), '') AS u
      FROM u0
    ),
    s1 AS (
      SELECT doc_id, regexp_replace(u, '#.*$', '') AS u FROM pct
    ),
    parts AS (
      SELECT doc_id,
             lower(regexp_extract(u,
               '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
             regexp_replace(u,
               '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest
      FROM s1
    ),
    hp AS (
      SELECT doc_id, scheme, rest,
             lower(regexp_extract(rest, '^([^/?]*)', 1)) AS hostport,
             regexp_extract(rest, '^[^/?]*([^?]*)', 1) AS path,
             CASE WHEN contains(rest, '?')
                  THEN regexp_replace(rest, '^[^?]*\?', '')
                  ELSE '' END AS q
      FROM parts
    ),
    canon AS (
      SELECT doc_id,
             scheme || '://' ||
             CASE WHEN scheme = 'http' AND hostport LIKE '%:80'
                    THEN regexp_replace(hostport, ':80$', '')
                  WHEN scheme = 'https' AND hostport LIKE '%:443'
                    THEN regexp_replace(hostport, ':443$', '')
                  ELSE hostport END ||
             CASE WHEN path = '' THEN '/' ELSE path END AS base,
             CASE WHEN q <> ''
                  THEN array_to_string(list_sort(
                         string_split(q, '&')), '&')
                  ELSE '' END AS q
      FROM hp
    ),
    stripped AS (
      SELECT doc_id, base, q,
             CASE WHEN q = '' THEN []
                  ELSE list_filter(
               string_split(q, '&'),
               p -> NOT (starts_with(string_split(p, '=')[1], 'utm_')
                         OR list_contains(
                              ['fbclid','gclid','dclid','msclkid',
                               'twclid','yclid','igshid','mc_cid',
                               'mc_eid','wbraid','gbraid','_hsenc',
                               '_hsmi','s_cid','ref_src'],
                              string_split(p, '=')[1]))) END AS kept
      FROM canon
    )
    SELECT doc_id,
           base || CASE WHEN q <> '' THEN '?' || q ELSE '' END AS url,
           base || CASE WHEN len(kept) > 0
                        THEN '?' || array_to_string(kept, '&')
                        ELSE '' END AS url_min
    FROM stripped ORDER BY doc_id
    """,
    doc="The full URL-normalization stack (r11 core, r13 completion): "
    "percent-encoding normalization (operators/text."
    "normalize_percent_encoding — unreserved %XX decoded per RFC 3986 "
    "§2.3/§6.2.2, remaining hex UPPERCASED, malformed escapes "
    "verbatim; the layer the r11 docstring scoped out) feeding "
    "canonicalize_url (fragment dropped, scheme+host lowercased, "
    "default ports stripped, empty path -> '/', params SORTED) "
    "feeding strip_tracking_params (url_min). The fixture cycles "
    "every normalization trap: mixed case, :80/:443, missing path, "
    "permutable params, fragments, and now over-encoded unreserved "
    "escapes (%6f %61 %7e), reserved escapes that must stay encoded "
    "but uppercase (%2F %3F), mixed-case hex, malformed %zz / "
    "trailing %, and %-encoded tracker values. Both full canonical "
    "strings hash-compare cross-engine; the engines use different "
    "hex-decode formulations (conv vs strpos arithmetic) — same "
    "math, independent implementations. Pure codegen, no UDF.",
)
def q_url_canonical(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents").filter(F.col("doc_id") < 400)
    did = F.col("doc_id")
    s = F.concat(
        F.lit("HTTP"),
        F.when(did % 2 == 0, F.lit("S")).otherwise(F.lit("")),
        F.lit("://Host"), (did % 7).cast("string"), F.lit(".Example.COM"),
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit(":"),
                F.when(did % 2 == 0, F.lit("443")).otherwise(F.lit("80")),
            ),
        ).otherwise(F.lit("")),
        F.when(did % 5 == 0, F.lit("")).otherwise(
            F.concat(
                F.lit("/Dir"), (did % 4).cast("string"),
                F.when(did % 6 == 1, F.lit("/f%6fo%2Fb%61r"))
                .when(did % 6 == 2, F.lit("/%7e%5Fx%2e"))
                .when(did % 6 == 3, F.lit("/p%zz%"))
                .when(did % 6 == 4, F.lit("/%3fq%3d1"))
                .otherwise(F.lit("/p")),
            )
        ),
        F.when(did % 4 == 0, F.lit("")).otherwise(
            F.concat(
                F.lit("?z="), did.cast("string"),
                F.lit("&a="), (did % 3).cast("string"),
                F.when(did % 6 == 5, F.lit("&utm_source=news&v=%4B"))
                .when(did % 6 == 1, F.lit("&fbclid=x%59z"))
                .otherwise(F.lit("")),
            )
        ),
        F.when(did % 2 == 0, F.concat(F.lit("#frag"), did.cast("string")))
        .otherwise(F.lit("")),
    )
    url = d.select(
        "doc_id",
        tx.canonicalize_url(tx.normalize_percent_encoding(s)).alias("url"),
    )
    return url.select(
        "doc_id",
        "url",
        tx.strip_tracking_params(F.col("url")).alias("url_min"),
    ).orderBy("doc_id")


def _warc_corpus(spark):
    """12 WARC payloads x 4 records — warcinfo / response / request /
    response — even payload ids in the .warc.gz member-per-record
    layout, odd ids plain concatenated (the parser must make layout
    invisible). Every field is a closed-form doc_id rule the oracle
    replays; response bodies wrap gzip-corpus-style word runs in
    deterministic HTML with a title (the strip_html target)."""
    rows = []
    for i in range(12):
        words1 = " ".join(
            f"w{(i * 7 + 3 + j) % 20}" for j in range(5 + ((i + 1) % 6))
        )
        words3 = " ".join(
            f"w{(i * 7 + 9 + j) % 20}" for j in range(5 + ((i + 3) % 6))
        )

        def html(text, i=i):
            return (
                f"<html><head><title>T{i}</title></head>"
                f"<body><p>{text}</p></body></html>"
            ).encode("utf-8")

        recs = [
            {
                "warc_type": "warcinfo",
                "content_type": "application/warc-fields",
                "body": (
                    f"software: synthgen/{i}\r\n"
                    "format: WARC file version 1.0\r\n"
                ).encode("ascii"),
            },
            {
                "warc_type": "response",
                "target_uri": (
                    f"HTTPS://Host{i % 7}.Example.COM:443"
                    f"/Dir{i % 4}/p?z={i}&a={i % 3}#frag{i}"
                ),
                "warc_date": f"2024-02-{(i % 9) + 1:02d}T00:00:00Z",
                "http_status": 404 if (i + 1) % 5 == 0 else 200,
                "body": html(words1),
            },
            {
                "warc_type": "request",
                "target_uri": f"https://host{i % 7}.example.com/Dir{i % 4}/p",
                "content_type": "application/http; msgtype=request",
                "body": (
                    f"GET /Dir{i % 4}/p HTTP/1.1\r\n"
                    f"Host: host{i % 7}.example.com\r\n"
                ).encode("ascii"),
            },
            {
                "warc_type": "response",
                "target_uri": f"http://host{i % 7}.example.com:80/q{i % 5}",
                "warc_date": f"2024-02-{(i % 9) + 1:02d}T06:00:00Z",
                "http_status": 301 if i % 4 == 0 else 200,
                "body": html(words3),
            },
        ]
        rows.append((i, tx.warc_build(recs, gzip_per_record=i % 2 == 0)))
    return local_rows_df(spark, rows, "payload_id long, payload binary")


# DuckDB twin of the _warc_corpus closed-form fields (shared by both
# WARC queries): one row per (payload i, record m) with every header
# and the response body text replayed from the doc_id rules.
_WARC_FIELDS_SQL = r"""
    ids AS (SELECT i, m FROM range(12) t(i), range(4) t2(m)),
    wtoks AS (
      SELECT i, m, j.j AS j
      FROM ids, range(11) j(j)
      WHERE m IN (1, 3) AND j.j < 5 + ((i + m) % 6)
    ),
    bodytext AS (
      SELECT i, m,
             string_agg(
               'w' || ((i*7 + 3*m + j) % 20), ' ' ORDER BY j) AS words
      FROM wtoks GROUP BY 1, 2
    ),
    fields AS (
      SELECT ids.i, ids.m,
        CASE ids.m WHEN 0 THEN 'warcinfo' WHEN 1 THEN 'response'
                   WHEN 2 THEN 'request' ELSE 'response' END AS warc_type,
        CASE ids.m
          WHEN 1 THEN 'HTTPS://Host' || (ids.i % 7) || '.Example.COM:443'
                      || '/Dir' || (ids.i % 4) || '/p?z=' || ids.i
                      || '&a=' || (ids.i % 3) || '#frag' || ids.i
          WHEN 2 THEN 'https://host' || (ids.i % 7) || '.example.com'
                      || '/Dir' || (ids.i % 4) || '/p'
          WHEN 3 THEN 'http://host' || (ids.i % 7)
                      || '.example.com:80/q' || (ids.i % 5)
        END AS target_uri,
        CASE ids.m
          WHEN 1 THEN '2024-02-' || lpad(CAST((ids.i % 9) + 1 AS VARCHAR),
                      2, '0') || 'T00:00:00Z'
          WHEN 3 THEN '2024-02-' || lpad(CAST((ids.i % 9) + 1 AS VARCHAR),
                      2, '0') || 'T06:00:00Z'
        END AS warc_date,
        CASE ids.m
          WHEN 1 THEN CASE WHEN (ids.i + 1) % 5 = 0 THEN 404 ELSE 200 END
          WHEN 3 THEN CASE WHEN ids.i % 4 = 0 THEN 301 ELSE 200 END
        END AS http_status,
        CASE ids.m WHEN 0 THEN 'application/warc-fields'
                   WHEN 2 THEN 'application/http; msgtype=request'
                   ELSE 'text/html' END AS content_type,
        CASE ids.m
          WHEN 0 THEN 'software: synthgen/' || ids.i || chr(13) || chr(10)
                      || 'format: WARC file version 1.0'
                      || chr(13) || chr(10)
          WHEN 2 THEN 'GET /Dir' || (ids.i % 4) || '/p HTTP/1.1'
                      || chr(13) || chr(10) || 'Host: host' || (ids.i % 7)
                      || '.example.com' || chr(13) || chr(10)
          ELSE '<html><head><title>T' || ids.i || '</title></head><body><p>'
               || bodytext.words || '</p></body></html>'
        END AS body
      FROM ids LEFT JOIN bodytext
        ON ids.i = bodytext.i AND ids.m = bodytext.m
    )
"""


@register(
    "q_warc_ingest",
    oracle=r"""
    WITH """ + _WARC_FIELDS_SQL + r"""
    SELECT i AS payload_id, CAST(m AS INTEGER) AS record_idx, warc_type,
           target_uri, warc_date, CAST(http_status AS INTEGER)
             AS http_status, content_type,
           CAST(length(body) AS BIGINT) AS n_chars
    FROM fields ORDER BY payload_id, record_idx
    """,
    doc="WARC container ingestion (r11, operators/text.warc_ingest + "
    "warc_records) — the crawl-native record format one stage before "
    "the WET member split gzip_ingest covers: ISO 28500 framing "
    "(version line, CRLF headers, Content-Length block, two-CRLF "
    "separator) in BOTH physical layouts (plain concatenated and the "
    "member-per-record .warc.gz convention, alternated across the "
    "fixture), response records' HTTP transaction parsed one level "
    "further (status line, Content-Type, body isolated). Every header "
    "field and body length hash-compares against the closed-form "
    "generator rules. One Arrow-batched mapInPandas pass, parse where "
    "the bytes live, no shuffle.",
)
def q_warc_ingest(spark: SparkSession, sf: str) -> DataFrame:
    recs = tx.warc_ingest(_warc_corpus(spark))
    return recs.select(
        "payload_id",
        "record_idx",
        "warc_type",
        "target_uri",
        "warc_date",
        "http_status",
        "content_type",
        F.length("text").cast("long").alias("n_chars"),
    ).orderBy("payload_id", "record_idx")


@register(
    "q_warc_html_extract",
    oracle=r"""
    WITH """ + _WARC_FIELDS_SQL + r""",
    ok AS (
      SELECT i, m, target_uri, body FROM fields
      WHERE warc_type = 'response' AND http_status = 200
    ),
    stripped AS (
      SELECT i, m,
        TRIM(regexp_replace(regexp_replace(body, '<[^>]+>', ' ', 'g'),
             '\s+', ' ', 'g')) AS text,
        CASE WHEN m = 1
          THEN 'https://host' || (i % 7) || '.example.com/Dir' || (i % 4)
               || '/p?a=' || (i % 3) || '&z=' || i
          ELSE 'http://host' || (i % 7) || '.example.com/q' || (i % 5)
        END AS url
      FROM ok
    )
    SELECT i AS payload_id, CAST(m AS INTEGER) AS record_idx, url, text,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM stripped ORDER BY payload_id, record_idx
    """,
    doc="Crawl-text extraction composite (r11): warc_ingest -> keep "
    "HTTP-200 response records -> strip_html on the body -> "
    "canonicalize_url on the WARC-Target-URI — the full first stage "
    "of a web-corpus pipeline (the WET generation step plus the dedup "
    "key), end-to-end in one plan: Arrow parse pass then pure codegen "
    "regexp/sort expressions, no extra shuffle before the ORDER BY. "
    "The whole extracted string and canonical URL hash-compare "
    "cross-engine; the 404/301 rows planted in the fixture prove the "
    "status filter.",
)
def q_warc_html_extract(spark: SparkSession, sf: str) -> DataFrame:
    recs = tx.warc_ingest(_warc_corpus(spark))
    ok = recs.filter(
        (F.col("warc_type") == "response") & (F.col("http_status") == 200)
    )
    stripped = tx.strip_html(F.col("text"))
    return ok.select(
        "payload_id",
        "record_idx",
        tx.canonicalize_url(F.col("target_uri")).alias("url"),
        stripped.alias("text"),
        F.size(F.split(stripped, " ")).cast("long").alias("n_tokens"),
    ).orderBy("payload_id", "record_idx")


# Sentence fixture: doc i < 240 carries 2 + i%3 sentences; sentence j
# has collision key k = (i*3 + 7j) % 40 that fully determines its
# content (so cross-doc duplicates exist by construction), docs with
# i%4 == 0 embed an abbreviation-style "men. at end" inside sentence 0
# (period + space + LOWERCASE — the splitter must keep it inline), and
# the terminator cycles . ! ? by k%3.
_SENT_GRID_SQL = """
    ids AS (
      SELECT d.doc_id AS i, j.j AS j
      FROM documents d, range(4) j(j)
      WHERE d.doc_id < 240 AND j.j < 2 + (d.doc_id % 3)
    ),
    sent AS (
      SELECT i, j, (i*3 + 7*j) % 40 AS k,
             'S' || ((i*3 + 7*j) % 40)
             || ' a' || (((i*3 + 7*j) % 40) % 7)
             || ' b' || ((((i*3 + 7*j) % 40) * 3) % 10)
             || CASE WHEN j = 0 AND i % 4 = 0
                     THEN ' men. at end' ELSE '' END
             || substr('.!?', ((i*3 + 7*j) % 40) % 3 + 1, 1) AS content
      FROM ids
    )
"""


def _sentence_text(i):
    """Spark expression building doc i's punctuated text (the same
    closed-form rule as _SENT_GRID_SQL)."""
    n_sent = 2 + (i % 3)
    segs = []
    for j in range(4):
        k = (i * 3 + F.lit(7 * j)) % 40
        body = F.concat(
            F.lit("S"), k.cast("string"),
            F.lit(" a"), (k % 7).cast("string"),
            F.lit(" b"), ((k * 3) % 10).cast("string"),
            F.when(
                (F.lit(j) == 0) & (i % 4 == 0), F.lit(" men. at end")
            ).otherwise(F.lit("")),
            F.substring(F.lit(".!?"), 1, 3).substr(
                (k % 3 + 1).cast("int"), F.lit(1)
            ),
        )
        segs.append(
            F.when(
                F.lit(j) < n_sent,
                F.concat(F.lit(" " if j else ""), body),
            ).otherwise(F.lit(""))
        )
    return F.concat(*segs)


@register(
    "q_doc_sentences",
    oracle="""
    WITH """ + _SENT_GRID_SQL + """
    SELECT i AS doc_id,
           CAST(2 + (i % 3) AS BIGINT) AS n_sentences,
           MIN(CASE WHEN j = 0 THEN content END) AS first_sentence,
           MIN(CASE WHEN j = 2 + (i % 3) - 1 THEN content END)
             AS last_sentence
    FROM sent GROUP BY i ORDER BY doc_id
    """,
    doc="Sentence segmentation (r11, operators/text.split_sentences): "
    "boundary = [.!?] + whitespace + capital/digit, as ONE capture-"
    "group regexp_replace injecting a sentinel plus a split — "
    "lookaround-free so Java regex and RE2 agree, pure codegen. The "
    "fixture plants abbreviation-style periods before lowercase "
    "('men. at end') that must stay INSIDE their sentence, cycles all "
    "three terminators, and the oracle reconstructs every doc's "
    "sentence list from the generator rules — the splitter must "
    "recover the generator's sentences exactly (count, first and "
    "last string all hash-compared).",
)
def q_doc_sentences(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents").filter(F.col("doc_id") < 240)
    sents = tx.split_sentences(_sentence_text(F.col("doc_id")))
    return d.select(
        "doc_id",
        F.size(sents).cast("long").alias("n_sentences"),
        sents.getItem(0).alias("first_sentence"),
        F.element_at(sents, -1).alias("last_sentence"),
    ).orderBy("doc_id")


@register(
    "q_sentence_dedup",
    oracle="""
    WITH """ + _SENT_GRID_SQL + """
    SELECT content AS sentence,
           CAST(COUNT(DISTINCT i) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_total
    FROM sent GROUP BY content
    HAVING COUNT(DISTINCT i) >= 2
    ORDER BY sentence
    """,
    doc="Sentence-level exact dedup (r11): explode split_sentences "
    "output across the corpus, group by the full sentence string, "
    "keep sentences appearing in 2+ documents — the sentence-grain "
    "boilerplate detector (cookie banners, license blurbs) that "
    "paragraph-level dedup misses when paragraphs differ by one "
    "line. One explode + one (sentence) map-combined aggregate; the "
    "fixture's collision keys make the expected duplicate set "
    "closed-form.",
)
def q_sentence_dedup(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents").filter(F.col("doc_id") < 240)
    sents = tx.split_sentences(_sentence_text(F.col("doc_id")))
    ex = d.select("doc_id", F.explode(sents).alias("sentence"))
    return (
        ex.groupBy("sentence")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_total"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy("sentence")
    )


def _mojibake_oracle() -> str:
    """Replay fix_mojibake's replace chain in DuckDB, generated from
    the same MOJIBAKE_MAP so table and oracle cannot drift."""
    chain = "corrupt"
    for c, r in tx.MOJIBAKE_MAP:
        chain = f"replace({chain}, '{c}', '{r}')"
    return f"""
    WITH src AS (
      SELECT doc_id,
             'CafÃ© nÂ°' || doc_id || ': â€œQuote hereâ€¦ â€“ seg '
             || (doc_id % 5)
             || CASE WHEN doc_id % 2 = 0 THEN ' DÃ©jÃ¡ vu â„¢.'
                     ELSE ' naÃ¯ve rÃ©sumÃ©.' END AS corrupt
      FROM documents WHERE doc_id < 300
    )
    SELECT doc_id, {chain} AS fixed,
           CAST(length(corrupt) - length({chain}) AS BIGINT)
             AS n_chars_fixed
    FROM src ORDER BY doc_id
    """


@register(
    "q_doc_fix_mojibake",
    oracle=_mojibake_oracle(),
    doc="Mojibake repair (r11, operators/text.fix_mojibake): the "
    "classic UTF-8-decoded-as-Windows-1252 double encoding ('Ã©' for "
    "'é', 'â€œ' for a curly quote) repaired by a table-driven replace "
    "chain whose table is GENERATED from the target characters "
    "(t.encode(utf8).decode(cp1252) IS the corruption — table and "
    "repair cannot drift), applied longest-source-first. The fixture "
    "plants two- and three-char sequences from every family "
    "(accents, degree sign, curly quotes, dashes, ellipsis, "
    "trademark) and the FULL repaired string hash-compares against "
    "the oracle's identical chain; the char-count delta pins that "
    "every planted sequence collapsed. Pure codegen replaces, no "
    "UDF.",
)
def q_doc_fix_mojibake(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents").filter(F.col("doc_id") < 300)
    did = F.col("doc_id")
    corrupt = F.concat(
        F.lit("CafÃ© nÂ°"), did.cast("string"),
        F.lit(": â€œQuote hereâ€¦ â€“ seg "),
        (did % 5).cast("string"),
        F.when(did % 2 == 0, F.lit(" DÃ©jÃ¡ vu â„¢."))
        .otherwise(F.lit(" naÃ¯ve rÃ©sumÃ©.")),
    )
    fixed = tx.fix_mojibake(corrupt)
    return d.select(
        "doc_id",
        fixed.alias("fixed"),
        (F.length(corrupt) - F.length(fixed))
        .cast("long")
        .alias("n_chars_fixed"),
    ).orderBy("doc_id")


def _avro_corpus(spark):
    """16 Avro OCF payloads x 20 flat records (null codec for even
    payload ids, deflate for odd; 8 records per block so every payload
    is multi-block) — fields from closed-form doc_id rules, with
    negative longs (zigzag sign path), a nullable union lane and an
    enum lane."""
    from incremental_github_data_pipeline_spark.sources.avro import avro_build

    schema = {
        "type": "record",
        "name": "evt",
        "fields": [
            {"name": "name", "type": "string"},
            {"name": "n", "type": "long"},
            {"name": "ok", "type": "boolean"},
            {
                "name": "tag",
                "type": {
                    "type": "enum", "name": "t",
                    "symbols": ["A", "B", "C"],
                },
            },
            {"name": "opt", "type": ["null", "long"]},
        ],
    }
    rows = []
    for i in range(16):
        recs = [
            {
                "name": f"w{(i * 7 + m) % 20}",
                "n": i * 100 + m * 3 - 50,
                "ok": (i + m) % 2 == 0,
                "tag": "ABC"[(i + m) % 3],
                "opt": None if m % 4 == 0 else i * m,
            }
            for m in range(20)
        ]
        rows.append(
            (
                i,
                avro_build(
                    schema, recs,
                    codec="null" if i % 2 == 0 else "deflate",
                    records_per_block=8,
                ),
            )
        )
    return local_rows_df(spark, rows, "payload_id long, payload binary")


@register(
    "q_avro_ingest",
    oracle="""
    WITH ids AS (SELECT i, m FROM range(16) t(i), range(20) t2(m))
    SELECT i AS payload_id, CAST(m AS INTEGER) AS record_idx,
           'w' || ((i*7 + m) % 20) AS name,
           CAST(i*100 + m*3 - 50 AS BIGINT) AS n,
           (i + m) % 2 = 0 AS ok,
           substr('ABC', (i + m) % 3 + 1, 1) AS tag,
           CAST(CASE WHEN m % 4 = 0 THEN NULL ELSE i*m END AS BIGINT)
             AS opt
    FROM ids ORDER BY payload_id, record_idx
    """,
    doc="Avro Object Container File ingestion (r11, sources/avro."
    "avro_ingest) — the schema-travels-with-the-data interchange "
    "format Kafka pipelines and warehouse exports ship, decoded by an "
    "in-repo stdlib binary codec (spark-avro's optional jar is not "
    "bundled): magic + metadata map walk, per-block sync-marker "
    "verification, null AND deflate codecs (alternated across the "
    "fixture), zigzag varints incl. negative longs, the "
    "['null', long] union idiom and enum-to-symbol decode; declared "
    "fields are checked against the embedded writer schema by name, "
    "so drift errors instead of nulling. Multi-block payloads (8 "
    "records/block); every field of every record hash-compares "
    "against the closed-form rules. One Arrow-batched mapInPandas "
    "pass, parse where the bytes live.",
)
def q_avro_ingest(spark: SparkSession, sf: str) -> DataFrame:
    from incremental_github_data_pipeline_spark.sources.avro import avro_ingest

    recs = avro_ingest(
        _avro_corpus(spark),
        "name string, n long, ok boolean, tag string, opt long",
    )
    return recs.orderBy("payload_id", "record_idx")


def _archive_corpus(spark):
    """12 archive payloads x 3 members (two UTF-8 text files + one
    binary blob that must keep its row with a NULL text lane) — even
    payload ids deflated zip, odd ids tar.gz (the two shard layouts
    datasets actually ship in); member text follows the gzip-corpus
    word-run rules."""
    from incremental_github_data_pipeline_spark.sources.archives import (
        tar_build,
        zip_build,
    )

    rows = []
    for i in range(12):
        members = []
        for m in range(2):
            n = 4 + ((i + m) % 5)
            text = " ".join(
                f"w{(i * 5 + m * 3 + j) % 16}" for j in range(n)
            )
            members.append((f"doc/{i}/t{m}.txt", text.encode("utf-8")))
        members.append((f"doc/{i}/blob.bin", bytes([255, 254, i % 256])))
        payload = (
            zip_build(members) if i % 2 == 0 else tar_build(members, gz=True)
        )
        rows.append((i, payload))
    return local_rows_df(spark, rows, "payload_id long, payload binary")


@register(
    "q_archive_ingest",
    oracle=r"""
    WITH ids AS (SELECT i, m FROM range(12) t(i), range(3) t2(m)),
    toks AS (
      SELECT i, m, j.j AS j FROM ids, range(9) j(j)
      WHERE m < 2 AND j.j < 4 + ((i + m) % 5)
    ),
    txt AS (
      SELECT i, m,
             string_agg('w' || ((i*5 + m*3 + j) % 16), ' ' ORDER BY j)
               AS text
      FROM toks GROUP BY 1, 2
    )
    SELECT ids.i AS payload_id, CAST(ids.m AS INTEGER) AS member_idx,
           'doc/' || ids.i ||
           CASE WHEN ids.m = 2 THEN '/blob.bin'
                ELSE '/t' || ids.m || '.txt' END AS name,
           CAST(CASE WHEN ids.m = 2 THEN 3
                ELSE length(txt.text) END AS BIGINT) AS n_bytes,
           txt.text AS text
    FROM ids LEFT JOIN txt ON ids.i = txt.i AND ids.m = txt.m
    ORDER BY payload_id, member_idx
    """,
    doc="Archive-shard ingestion (r11, sources/archives."
    "archive_ingest): tar / tar.gz / zip payloads — the WebDataset-"
    "style shard-of-files layout — exploded to one row per member "
    "with magic-based container dispatch (zip by PK header, tarfile "
    "compression sniffing for the rest), CRC-checked zip reads, and "
    "the mixed-content contract pinned: binary members keep their "
    "row, name and size with a NULL text lane (a tarball of images + "
    "captions must not lose the images). Fixture alternates deflated "
    "zip and tar.gz over closed-form member text; every name, size "
    "and text hash-compares. One Arrow-batched mapInPandas pass.",
)
def q_archive_ingest(spark: SparkSession, sf: str) -> DataFrame:
    from incremental_github_data_pipeline_spark.sources.archives import (
        archive_ingest,
    )

    return archive_ingest(_archive_corpus(spark)).orderBy(
        "payload_id", "member_idx"
    )


def _scripts_oracle() -> str:
    """Generated from operators.text.SCRIPT_RANGES so the oracle's
    character classes are the SAME literal code-point ranges the Spark
    expressions use — pattern translation cannot drift."""
    counts = ",\n           ".join(
        f"CAST(len(regexp_extract_all(t, '[{rng}]')) AS BIGINT)"
        f" AS n_{name}"
        for name, rng in tx.SCRIPT_RANGES.items()
    )
    names = list(tx.SCRIPT_RANGES)
    greatest = ", ".join(f"n_{n}" for n in names)
    dom = "CASE "
    for n in names[:-1]:
        dom += f"WHEN n_{n} >= GREATEST({greatest}) THEN '{n}' "
    dom += f"ELSE '{names[-1]}' END"
    return f"""
    WITH aug AS (
      SELECT doc_id,
             text || CASE CAST(doc_id % 5 AS INTEGER)
               WHEN 1 THEN ' привет мир'
               WHEN 2 THEN ' 你好世界'
               WHEN 3 THEN ' مرحبا بالعالم'
               WHEN 4 THEN ' αβγδε שלום'
               ELSE '' END AS t
      FROM documents
    ),
    c AS (
      SELECT doc_id,
           {counts}
      FROM aug
    )
    SELECT doc_id, n_latin, n_cyrillic, n_greek, n_cjk, n_arabic,
           n_hebrew, {dom} AS dominant
    FROM c ORDER BY doc_id
    """


@register(
    "q_doc_scripts",
    oracle=_scripts_oracle(),
    doc="Unicode script profiling (r12, operators/text.script_counts + "
    "dominant_script): per-document character counts over the core "
    "BMP script blocks (Latin incl. supplements, Cyrillic, Greek, CJK "
    "ideographs + kana + hangul, Arabic, Hebrew) plus the dominant "
    "script with deterministic tie order — the writing-system prior "
    "that partitions the decision space BEFORE trigram language ID, "
    "and the mixed-script spam signal. Character classes are built "
    "ONCE from SCRIPT_RANGES and embedded as identical literals in "
    "both engines' regexes; fixtures append Cyrillic/CJK/Arabic/"
    "Greek+Hebrew snippets by doc_id so every class fires. One "
    "regexp_count per script, codegen-side, scan-stage at 100 TB.",
)
def q_doc_scripts(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents")
    aug = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 5 == 1, F.lit(" привет мир"))
        .when(F.col("doc_id") % 5 == 2, F.lit(" 你好世界"))
        .when(F.col("doc_id") % 5 == 3, F.lit(" مرحبا بالعالم"))
        .when(F.col("doc_id") % 5 == 4, F.lit(" αβγδε שלום"))
        .otherwise(F.lit("")),
    )
    counts = tx.script_counts(aug)
    return d.select(
        "doc_id",
        *[
            counts[n].cast("long").alias(f"n_{n}")
            for n in tx.SCRIPT_RANGES
        ],
        tx.dominant_script(aug).alias("dominant"),
    ).orderBy("doc_id")


# Per-language fixture sentences for the trigram lane (doc_id % 8;
# slot 0 keeps the base pseudo-English text). Embedded as the SAME
# literal in both engines (each appended 3x after an 80-char slice of
# the base text, so the appended language's trigrams dominate).
_TRIGRAM_FIXTURES: dict[int, str] = {
    0: "The government of the nation announced that the new law on "
       "the protection of information is to be passed in the coming "
       "winter with the support of the parliament.",
    1: "Die Bundesregierung und die Länder haben sich geeinigt, dass "
       "ein neues Gesetz nicht verabschiedet wird.",
    2: "El gobierno de la nación aprobó la nueva ley que regula la "
       "información y la comunicación en el país.",
    3: "Le gouvernement de la France est que les pays européens "
       "doivent payer pour la protection des citoyens.",
    4: "Il governo della repubblica ha deciso che la protezione dei "
       "cittadini è una delle cose più importanti per il paese.",
    5: "O governo do país aprovou uma nova lei de proteção de dados "
       "que regula a informação dos cidadãos em um parlamento.",
    6: "Российское правительство приняло новый закон о защите "
       "информации граждан страны.",
    7: "中国政府通过了一项关于保护公民信息的新法律。",
}


def _lang_trigram_oracle() -> str:
    """Generated from operators.text.TRIGRAM_PROFILES + SCRIPT_RANGES +
    _SCRIPT_LANG so the oracle's trigram lists, character classes and
    script→language mapping are the SAME literals the Spark
    expressions use — profile translation cannot drift (the
    script_counts pattern)."""
    langs = list(tx.TRIGRAM_PROFILES)
    hit_cols = ",\n             ".join(
        "CAST(len(list_filter(tg, x -> list_contains(["
        + ",".join(f"'{t}'" for t in profile)
        + f"], x))) AS BIGINT) AS hits_{lang}"
        for lang, profile in tx.TRIGRAM_PROFILES.items()
    )
    snippets = "".join(
        f"\n               WHEN {k} THEN '{(' ' + s) * 3}'"
        for k, s in _TRIGRAM_FIXTURES.items()
    )
    script_counts = ",\n             ".join(
        f"len(regexp_extract_all(aug, '[{rng}]')) AS ns_{name}"
        for name, rng in tx.SCRIPT_RANGES.items()
    )
    snames = list(tx.SCRIPT_RANGES)
    sgreatest = ", ".join(f"ns_{n}" for n in snames)
    dom = "CASE "
    for n in snames[:-1]:
        dom += f"WHEN ns_{n} >= GREATEST({sgreatest}) THEN '{n}' "
    dom += f"ELSE '{snames[-1]}' END"
    m = ", ".join(f"hits_{la}" for la in langs)
    latin = f"CASE WHEN GREATEST({m}) = 0 THEN 'und' "
    for la in langs:
        latin += f"WHEN hits_{la} >= GREATEST({m}) THEN '{la}' "
    latin += "ELSE 'und' END"
    overrides = "".join(
        f"WHEN '{s}' THEN '{la}' " for s, la in tx._SCRIPT_LANG.items()
    )
    hit_names = ", ".join(f"hits_{la}" for la in langs)
    return f"""
    WITH aug AS (
      SELECT doc_id,
             substr(text, 1, 48) || CASE CAST(doc_id % 8 AS INTEGER)
               {snippets}
               ELSE '' END AS aug
      FROM documents
    ),
    tg AS (
      SELECT doc_id, aug,
             list_transform(
               range(1, length(' ' || lower(aug) || ' ') - 1),
               i -> substr(' ' || lower(aug) || ' ', i, 3)) AS tg
      FROM aug
    ),
    h AS (
      SELECT doc_id,
             {hit_cols},
             {script_counts}
      FROM tg
    )
    SELECT doc_id, {hit_names},
           {dom} AS script,
           CASE {dom} {overrides}ELSE {latin} END AS lang
    FROM h ORDER BY doc_id
    """


@register(
    "q_doc_lang_trigram",
    oracle=_lang_trigram_oracle(),
    doc="Trigram language identification (r13, operators/text."
    "trigram_hits + lang_id_trigram): character-trigram profiles per "
    "language (the textcat / langid.py family — the upgrade the "
    "stopword heuristic lang_id was billed as the placeholder for) "
    "scored as per-document INTEGER overlap counts over the padded "
    "lowercase trigram array, deterministic earliest-wins argmax, "
    "composed with dominant_script as the writing-system prior "
    "(single-language scripts map directly: cyrillic->ru, greek->el, "
    "cjk->zh, arabic->ar, hebrew->he; Latin routes to the trigram "
    "argmax). Profiles, script classes and the script->language map "
    "are each ONE Python constant embedded into both engines' SQL — "
    "no drift surface. Fixtures append de/es/fr/it/pt/ru/zh sentences "
    "by doc_id so every decision path fires. Pure codegen: one "
    "trigram-array materialization + one filter per language riding "
    "the scan — no shuffle, no UDF, scan-stage at 100 TB.",
)
def q_doc_lang_trigram(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents")
    snippet = F.lit("")
    for k, s in _TRIGRAM_FIXTURES.items():
        snippet = F.when(
            F.col("doc_id") % 8 == k, F.lit((" " + s) * 3)
        ).otherwise(snippet)
    aug = F.concat(F.substring(F.col("text"), 1, 48), snippet)
    # Multi-column form: every expensive intermediate (augmented text,
    # trigram array, per-language hits) binds behind its own projection
    # so it's computed once per row — CollapseProject keeps boundaries
    # for non-cheap aliases referenced more than once.
    base = d.select("doc_id", aug.alias("aug"))
    tgd = base.select(
        "doc_id",
        tx.char_trigrams("aug").alias("tg"),
        tx.dominant_script("aug").alias("script"),
    )
    hits = tx.trigram_hits("tg", trigrams=True)
    scored = tgd.select(
        "doc_id",
        *[
            hits[lang].cast("long").alias(f"hits_{lang}")
            for lang in tx.TRIGRAM_PROFILES
        ],
        "script",
    )
    return scored.select(
        "doc_id",
        *[f"hits_{lang}" for lang in tx.TRIGRAM_PROFILES],
        "script",
        tx.lang_from_trigram_hits(
            {n: F.col(f"hits_{n}") for n in tx.TRIGRAM_PROFILES},
            F.col("script"),
        ).alias("lang"),
    ).orderBy("doc_id")


def _cdc_oracle() -> str:
    """Generated from operators.text's CDC constants so both engines
    share the identical polynomial window, modulus and mask — the
    script_counts/trigram pattern."""
    terms = " + ".join(
        f"CAST(ascii(cs[p - {j}]) AS BIGINT) * {tx.CDC_POWERS[j]}"
        for j in range(tx.CDC_WINDOW)
    )
    return f"""
    WITH d AS (
      SELECT doc_id, text, string_split(text, '') AS cs,
             length(text) AS n
      FROM documents
    ),
    grid AS (
      -- correlated position grid (ADVICE r13): derived from each
      -- doc's own length, no silent cap at any fixture size
      SELECT doc_id, cs, n, p.p AS p
      FROM d, unnest(range(1, n + 1)) AS p(p)
    ),
    flags AS (
      SELECT doc_id, p, cs[p] AS ch,
             CASE WHEN p >= {tx.CDC_WINDOW}
                   AND ({terms}) % {tx.CDC_MOD}
                       % {1 << tx.CDC_MASK_BITS} = 0
                  THEN 1 ELSE 0 END AS b
      FROM grid
    ),
    assigned AS (
      SELECT doc_id, p, ch,
             COALESCE(SUM(b) OVER (
               PARTITION BY doc_id ORDER BY p
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS chunk_idx
      FROM flags
    ),
    chunks AS (
      SELECT doc_id, chunk_idx,
             string_agg(ch, '' ORDER BY p) AS chunk
      FROM assigned GROUP BY doc_id, chunk_idx
      UNION ALL
      -- empty/NULL text is ONE empty chunk on the engine side
      -- (cdc_split('') == ['']) — mirror it (ADVICE r13)
      SELECT doc_id, 0 AS chunk_idx, '' AS chunk
      FROM d WHERE n = 0 OR n IS NULL
    )
    SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx, chunk,
           CAST(length(chunk) AS BIGINT) AS n_chars
    FROM chunks ORDER BY doc_id, chunk_idx
    """


@register(
    "q_doc_cdc_chunks",
    oracle=_cdc_oracle(),
    doc="Content-defined chunking (r13, operators/text.cdc_chunks): "
    "Rabin-style chunk boundaries from a 16-char polynomial window "
    "hash (base 131 mod 2^31-1, boundary where hash % 64 == 0) — the "
    "sub-document dedup unit: boundaries are position-LOCAL, so an "
    "edit re-chunks at most one window past itself and every later "
    "chunk stays byte-identical, letting chunk-level exact dedup "
    "collapse near-identical documents that doc-level hashing sees "
    "as distinct blobs. Deliberately the unclamped rule (FastCDC's "
    "min-length skip chains boundaries sequentially); expected chunk "
    "~64 chars. The FULL chunk text of every (doc, chunk) "
    "hash-compares cross-engine; window/base/modulus/mask are ONE "
    "Python constant set embedded in both engines. One Arrow-batched "
    "mapInPandas pass with a numpy sliding-window dot per doc (the "
    "q_ts_ewma precedent — per-position windowed folds are the shape "
    "interpreted HOFs do worst: the expression form measured 30 s+ "
    "where this lane takes ~0.2 s for 5k docs); scan-stage at "
    "100 TB, no shuffle.",
)
def q_doc_cdc_chunks(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents")
    return tx.cdc_chunk_rows(d).select(
        "doc_id",
        "chunk_idx",
        "chunk",
        F.length("chunk").cast("long").alias("n_chars"),
    ).orderBy("doc_id", "chunk_idx")


def _cdc_dedup_oracle() -> str:
    """Per-source chunk-level dedup ledger over the same generated
    chunk CTE as q_doc_cdc_chunks."""
    terms = " + ".join(
        f"CAST(ascii(cs[p - {j}]) AS BIGINT) * {tx.CDC_POWERS[j]}"
        for j in range(tx.CDC_WINDOW)
    )
    return f"""
    WITH d AS (
      SELECT doc_id, source, text, string_split(text, '') AS cs,
             length(text) AS n
      FROM documents
    ),
    grid AS (
      -- correlated position grid (ADVICE r13): no silent length cap
      SELECT doc_id, source, cs, n, p.p AS p
      FROM d, unnest(range(1, n + 1)) AS p(p)
    ),
    flags AS (
      SELECT doc_id, source, p, cs[p] AS ch,
             CASE WHEN p >= {tx.CDC_WINDOW}
                   AND ({terms}) % {tx.CDC_MOD}
                       % {1 << tx.CDC_MASK_BITS} = 0
                  THEN 1 ELSE 0 END AS b
      FROM grid
    ),
    assigned AS (
      SELECT doc_id, source, p, ch,
             COALESCE(SUM(b) OVER (
               PARTITION BY doc_id ORDER BY p
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS chunk_idx
      FROM flags
    ),
    chunks AS (
      SELECT doc_id, source, chunk_idx,
             string_agg(ch, '' ORDER BY p) AS chunk
      FROM assigned GROUP BY doc_id, source, chunk_idx
      UNION ALL
      -- empty/NULL text: one empty chunk, as on the engine side
      SELECT doc_id, source, 0 AS chunk_idx, '' AS chunk
      FROM d WHERE n = 0 OR n IS NULL
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(COUNT(DISTINCT chunk) AS BIGINT) AS n_distinct,
           CAST(SUM(length(chunk)) AS BIGINT) AS chars_total,
           CAST((SELECT SUM(length(c)) FROM
                 (SELECT DISTINCT chunk AS c FROM chunks c2
                  WHERE c2.source = chunks.source)) AS BIGINT)
             AS chars_distinct
    FROM chunks GROUP BY source ORDER BY source
    """


@register(
    "q_doc_cdc_dedup",
    oracle=_cdc_dedup_oracle(),
    doc="Chunk-level dedup ledger (r13, cdc_chunk_rows + one exact "
    "group-by): per source, total vs DISTINCT chunk counts and "
    "character volumes — the storage/compute saving content-defined "
    "chunking exists to expose (repeated boilerplate and shared "
    "passages collapse at chunk grain where doc-level hashing sees "
    "distinct blobs). One Arrow chunking pass + one map-combined "
    "aggregate on the chunk hash; the distinct-chars lane shuffles "
    "chunk text once. Oracle: the identical generated polynomial/"
    "mask SQL aggregated per source.",
)
def q_doc_cdc_dedup(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents")
    chunks = tx.cdc_chunk_rows(d).join(
        d.select("doc_id", "source"), "doc_id"
    )
    per_source = chunks.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.countDistinct("chunk").cast("long").alias("n_distinct"),
        F.sum(F.length("chunk")).cast("long").alias("chars_total"),
    )
    distinct_chars = (
        chunks.select("source", "chunk")
        .distinct()
        .groupBy("source")
        .agg(
            F.sum(F.length("chunk")).cast("long").alias("chars_distinct")
        )
    )
    return per_source.join(distinct_chars, "source").orderBy("source")


# FastCDC-style clamp parameters for q_doc_cdc_clamped: expected
# unclamped chunk is 2^CDC_MASK_BITS = 64 chars; the classic 0.5x/2x
# envelope. The degenerate fixture char is chosen AT IMPORT as the
# first uppercase letter whose uniform 16-char window never satisfies
# the mask — a run of it produces ZERO candidate boundaries, the
# base64-blob shape where the unclamped rule degenerates to one
# mega-chunk and the clamp must force exact max_len slabs.
CDC_CLAMP_MIN = 32
CDC_CLAMP_MAX = 128
_CDC_BLOB_CHAR = next(
    chr(c)
    for c in range(65, 91)
    if (c * sum(tx.CDC_POWERS)) % tx.CDC_MOD % (1 << tx.CDC_MASK_BITS)
    != 0
)
_CDC_BLOB_LEN = 1000


def _cdc_clamped_oracle() -> str:
    """Recursive-CTE replay of the FastCDC-style clamped walk (r14):
    the candidate-boundary CTE is the same generated polynomial/mask
    SQL as q_doc_cdc_chunks; the walk itself — next cut = first
    candidate in [e+min, e+max), else forced at e+max — is sequential
    BY DEFINITION, which is exactly what a recursive CTE expresses
    (the holt/EWMA precedent). Chunk text reassembles via a range
    join of positions onto the accepted cut intervals, so the FULL
    text of every chunk hash-compares cross-engine."""
    terms = " + ".join(
        f"CAST(ascii(cs[p - {j}]) AS BIGINT) * {tx.CDC_POWERS[j]}"
        for j in range(tx.CDC_WINDOW)
    )
    return f"""
    WITH RECURSIVE
    docs2 AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT -1, repeat('{_CDC_BLOB_CHAR}', {_CDC_BLOB_LEN})
    ),
    d AS (
      SELECT doc_id, text, string_split(text, '') AS cs,
             length(text) AS n
      FROM docs2
    ),
    grid AS (
      SELECT doc_id, cs, n, p.p AS p
      FROM d, unnest(range(1, n + 1)) AS p(p)
    ),
    flags AS (
      SELECT doc_id, p, cs[p] AS ch,
             CASE WHEN p >= {tx.CDC_WINDOW}
                   AND ({terms}) % {tx.CDC_MOD}
                       % {1 << tx.CDC_MASK_BITS} = 0
                  THEN 1 ELSE 0 END AS b
      FROM grid
    ),
    hits AS (SELECT doc_id, p FROM flags WHERE b = 1),
    walk(doc_id, e, idx) AS (
      SELECT doc_id, 0, -1 FROM d WHERE n > 0
      UNION ALL
      SELECT w.doc_id,
             COALESCE(
               (SELECT MIN(h.p) FROM hits h
                WHERE h.doc_id = w.doc_id
                  AND h.p >= w.e + {CDC_CLAMP_MIN}
                  AND h.p <  w.e + {CDC_CLAMP_MAX}
                  AND h.p < dd.n),
               LEAST(w.e + {CDC_CLAMP_MAX}, dd.n)),
             w.idx + 1
      FROM walk w JOIN d dd USING (doc_id)
      WHERE w.e < dd.n
    ),
    bnd AS (
      SELECT doc_id, idx, e,
             LAG(e, 1, 0) OVER (
               PARTITION BY doc_id ORDER BY idx) AS s
      FROM walk WHERE idx >= 0
    ),
    chunks AS (
      SELECT b.doc_id, b.idx AS chunk_idx,
             string_agg(f.ch, '' ORDER BY f.p) AS chunk
      FROM bnd b JOIN flags f
        ON f.doc_id = b.doc_id AND f.p > b.s AND f.p <= b.e
      GROUP BY b.doc_id, b.idx
      UNION ALL
      SELECT doc_id, 0, '' FROM d WHERE n = 0 OR n IS NULL
    )
    SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx, chunk,
           CAST(length(chunk) AS BIGINT) AS n_chars
    FROM chunks ORDER BY doc_id, chunk_idx
    """


@register(
    "q_doc_cdc_clamped",
    oracle=_cdc_clamped_oracle(),
    doc="FastCDC-style clamped content-defined chunking (r14, "
    "cdc_chunk_rows(min_len=32, max_len=128) — VERDICT r13 task 4): "
    "the production CDC posture. The pure position-local rule has a "
    "geometric length tail (expected 64 chars but unbounded), and "
    "content that never satisfies the mask — base64 blobs with an "
    "unlucky alphabet, here a planted doc_id=-1 run of a character "
    "whose uniform window provably never hits — degenerates to ONE "
    "mega-chunk per document, the straggler/row-size hazard at crawl "
    "scale. The clamp walks candidates sequentially PER DOCUMENT "
    "(first candidate in [e+min, e+max), else a forced cut at "
    "e+max), which the per-doc numpy kernel already is — one bisect "
    "per emitted chunk, nothing distributed changes: still one "
    "Arrow-batched mapInPandas scan-stage pass, no shuffle, at any "
    "corpus size. Every chunk lands in [32, 128] except the final "
    "tail; the blob forces exact 128-char slabs. FULL chunk text "
    "hash-compares cross-engine; the oracle replays the sequential "
    "walk as a recursive CTE over the SAME generated polynomial/mask "
    "candidate SQL (the holt/EWMA precedent).",
)
def q_doc_cdc_clamped(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents").select("doc_id", "text").unionByName(
        local_rows_df(
            spark,
            [(-1, _CDC_BLOB_CHAR * _CDC_BLOB_LEN)],
            "doc_id long, text string",
        )
    )
    return tx.cdc_chunk_rows(
        d, min_len=CDC_CLAMP_MIN, max_len=CDC_CLAMP_MAX
    ).select(
        "doc_id",
        "chunk_idx",
        "chunk",
        F.length("chunk").cast("long").alias("n_chars"),
    ).orderBy("doc_id", "chunk_idx")
