"""[EXT] Round-5 corpus-curation queries: URL/domain triage,
deterministic weighted sampling, boilerplate-line detection, inverted
index (`operators/text.py` round-5 section).

No reference counterpart (`/root/reference` is GitHub-API ELT); these
are the web-corpus curation primitives a 100 TB training-data pipeline
runs between ingestion and dedup (SURVEY.md §2.10 capability classes).
URL/boilerplate inputs are deterministic doc_id-derived enrichments of
the ``documents`` table so BOTH engines rebuild identical inputs in
closed form — the same oracle pattern as the media codecs and the PII
audit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incremental_github_data_pipeline_spark.operators import text as tx
from incremental_github_data_pipeline_spark.queries import register
from incremental_github_data_pipeline_spark.sources.local import local_rows_df
from incremental_github_data_pipeline_spark.sources.readers import read_table as T


def _with_urls(d: DataFrame) -> DataFrame:
    """documents + two deterministic URLs per doc (one https with a
    tracking param, one http on even thirds) — closed-form so DuckDB
    recomputes the same text."""
    return d.select(
        "doc_id",
        F.concat_ws(
            "",
            F.col("text"),
            F.lit(" https://sub"),
            F.col("doc_id") % 7,
            F.lit(".example"),
            F.col("doc_id") % 5,
            F.lit(".com/p/"),
            F.col("doc_id"),
            F.lit("?utm=x"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat_ws(
                    "",
                    F.lit(" http://cdn"),
                    F.col("doc_id") % 5,
                    F.lit(".example.net/a/"),
                    F.col("doc_id") % 11,
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )


@register(
    "q_url_domain_stats",
    oracle="""
    WITH aug AS (
      SELECT doc_id,
             text || ' https://sub' || CAST(doc_id % 7 AS VARCHAR)
                  || '.example' || CAST(doc_id % 5 AS VARCHAR)
                  || '.com/p/' || CAST(doc_id AS VARCHAR) || '?utm=x'
                  || CASE WHEN doc_id % 3 = 0
                          THEN ' http://cdn' || CAST(doc_id % 5 AS VARCHAR)
                               || '.example.net/a/'
                               || CAST(doc_id % 11 AS VARCHAR)
                          ELSE '' END AS text
      FROM documents
    ),
    u AS (
      SELECT doc_id, UNNEST(regexp_extract_all(text, 'https?://[^\\s]+'))
               AS url
      FROM aug
    ),
    n AS (
      SELECT doc_id,
             regexp_replace(url, '\\?.*$', '') AS url_norm,
             regexp_extract(url, '^https?://([^/?\\s]+)', 1) AS domain,
             CASE WHEN url LIKE 'https:%' THEN 1 ELSE 0 END AS is_https
      FROM u
    )
    SELECT domain,
           CAST(COUNT(*) AS BIGINT) AS n_urls,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT url_norm) AS BIGINT) AS n_distinct_urls,
           CAST(SUM(is_https) AS BIGINT) AS n_https
    FROM n GROUP BY domain ORDER BY domain
    """,
    doc="Per-domain URL triage (operators.text.url_stats): extract "
    "every URL, strip tracking query strings, key by host, aggregate "
    "volume / doc reach / https share — the domain allow/deny-list "
    "input of web-corpus curation. Scan-stage regexes + ONE aggregate "
    "shuffle of extracted URLs only (never the text).",
)
def q_url_domain_stats(spark: SparkSession, sf: str) -> DataFrame:
    aug = _with_urls(T(spark, sf, "documents"))
    return tx.url_stats(aug).orderBy("domain")


@register(
    "q_doc_weighted_sample",
    oracle="""
    WITH p AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
             (doc_id * 2654435761) % 2147483648 AS hk
      FROM documents
      WHERE n_chars >= 1
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, weight,
           CAST(hk AS BIGINT) AS hk,
           CAST(hk // weight AS BIGINT) AS priority
    FROM p ORDER BY priority, doc_id LIMIT 100
    """,
    doc="Deterministic weighted sampling without replacement "
    "(operators.text.weighted_sample_priority): keep the 100 smallest "
    "knuth_hash(id) div weight priorities — the integer-exact analogue "
    "of Efraimidis-Spirakis A-ExpJ keys, so heavier (longer) docs are "
    "proportionally likelier yet the kept SET is bit-reproducible "
    "across engines and runs. Compiles to TakeOrderedAndProject "
    "(per-partition heaps), no global sort, no single-partition stage.",
)
def q_doc_weighted_sample(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents")
    return tx.weighted_sample_priority(d, "doc_id", "n_chars", k=100)


@register(
    "q_doc_boilerplate_lines",
    oracle="""
    WITH aug AS (
      SELECT doc_id, source,
             CASE WHEN doc_id % 10 <> 0
                  THEN 'NAV ' || source || ' | ' ELSE '' END
             || text
             || CASE WHEN doc_id % 2 = 0
                     THEN ' | PROMO ' || source ELSE '' END AS text
      FROM documents
    ),
    lines AS (
      SELECT doc_id, source, UNNEST(string_split(text, ' | ')) AS line
      FROM aug
    ),
    per_line AS (
      SELECT source, line, COUNT(DISTINCT doc_id) AS n_docs_with
      FROM lines WHERE LENGTH(TRIM(line)) > 0 GROUP BY 1, 2
    ),
    totals AS (
      SELECT source, COUNT(DISTINCT doc_id) AS n_docs FROM aug GROUP BY 1
    )
    SELECT p.source, p.line,
           CAST(p.n_docs_with AS BIGINT) AS n_docs_with,
           CAST(t.n_docs AS BIGINT) AS n_docs
    FROM per_line p JOIN totals t ON p.source = t.source
    WHERE p.n_docs_with * 100 >= 80 * t.n_docs
    ORDER BY p.source, p.line
    """,
    doc="Boilerplate-line detection (operators.text.boilerplate_lines): "
    "a line repeating across >=80% of one source's docs is template "
    "chrome (nav/footer/banner), not content — the strip-before-"
    "training curation step. Inputs enriched in closed form: a NAV "
    "line on 90% of docs per source (flagged) and a PROMO line on 50% "
    "(correctly NOT flagged). One (source,line) aggregate + broadcast "
    "of the |sources|-row totals; integer cross-multiplied threshold.",
)
def q_doc_boilerplate_lines(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents")
    aug = d.select(
        "doc_id",
        "source",
        F.concat(
            F.when(
                F.col("doc_id") % 10 != 0,
                F.concat(F.lit("NAV "), F.col("source"), F.lit(" | ")),
            ).otherwise(F.lit("")),
            F.col("text"),
            F.when(
                F.col("doc_id") % 2 == 0,
                F.concat(F.lit(" | PROMO "), F.col("source")),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return tx.boilerplate_lines(aug, min_pct=80).select(
        "source", "line", "n_docs_with", "n_docs"
    ).orderBy("source", "line")


@register(
    "q_doc_inverted_index",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             UNNEST(string_split_regex(TRIM(text), '\\s+')) AS term
      FROM documents WHERE LENGTH(TRIM(text)) > 0
    ),
    tf AS (
      SELECT term, doc_id, COUNT(*) AS tf
      FROM toks WHERE term <> '' GROUP BY 1, 2
    ),
    stats AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df, SUM(tf) AS total_tf
      FROM tf GROUP BY 1
    ),
    top AS (
      SELECT term, doc_id, tf,
             ROW_NUMBER() OVER (PARTITION BY term
                                ORDER BY tf DESC, doc_id) AS rank
      FROM tf
    )
    SELECT t.term, CAST(s.df AS BIGINT) AS df,
           CAST(s.total_tf AS BIGINT) AS total_tf,
           CAST(t.rank AS BIGINT) AS rank,
           CAST(t.doc_id AS BIGINT) AS doc_id,
           CAST(t.tf AS BIGINT) AS tf
    FROM top t JOIN stats s ON t.term = s.term
    WHERE t.rank <= 2 AND s.df >= 2
    ORDER BY t.term, t.rank
    """,
    doc="Inverted-index build (operators.text.inverted_index): per "
    "term, document frequency, total tf, and the top-2 postings by "
    "(tf desc, doc_id) — the search-index primitive and the posting "
    "lists the AllPairs/containment dedups consume. Token explode -> "
    "(term,doc) aggregate -> term window for the capped postings; "
    "postings emit as bounded ROWS, not arrays.",
)
def q_doc_inverted_index(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents")
    out = tx.inverted_index(d, top_docs=2, min_df=2)
    return out.select(
        "term",
        "df",
        "total_tf",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.col("tf").cast("long").alias("tf"),
    ).orderBy("term", "rank")


def _bpe_oracle(n: int = 4, final: str = "merges") -> str:
    """Unrolled n-round BPE replay: per round, a pair-count aggregate,
    a deterministic argmax, and the SAME left-to-right string fold the
    Spark operator runs (list_reduce with the sep-anchored look-back),
    so every learned merge is re-derived from scratch in SQL.

    The per-round best-pair join is ``LEFT JOIN b{r} ON TRUE`` (not a
    cross join): when the corpus dries up before ``n`` merges, b{r} is
    empty and NULL pa/pb send every fold step to the pass-through ELSE
    branch, so w{r} survives unchanged — matching ``learn_bpe``'s
    early-stop — instead of the cross join collapsing the whole
    vocabulary to zero rows."""
    parts = [
        r"""
    WITH words AS (
      SELECT word, COUNT(*) AS freq FROM (
        SELECT UNNEST(list_filter(string_split_regex(trim(text), '\s+'),
                                  x -> x != '')) AS word
        FROM documents WHERE length(trim(text)) > 0
      ) GROUP BY word
    ),
    w0 AS (
      SELECT word,
             chr(31) || regexp_replace(word, '(.)', '\1' || chr(31), 'g')
               AS seq, freq
      FROM words
    )"""
    ]
    for r in range(n):
        parts.append(
            f""",
    p{r} AS (
      SELECT l[i] AS pa, l[i+1] AS pb, SUM(freq) AS cnt
      FROM (SELECT list_filter(string_split(seq, chr(31)), x -> x != '')
              AS l, freq FROM w{r}),
           UNNEST(range(1, len(l))) AS t(i)
      GROUP BY 1, 2
    ),
    b{r} AS (SELECT pa, pb, cnt FROM p{r}
             ORDER BY cnt DESC, pa, pb LIMIT 1),
    w{r + 1} AS (
      SELECT word, list_reduce(
               list_prepend(chr(31),
                 list_filter(string_split(seq, chr(31)), x -> x != '')),
               (acc, x) -> CASE
                 WHEN x = pb AND ends_with(acc, chr(31) || pa || chr(31))
                 THEN substr(acc, 1, length(acc) - length(pa) - 1)
                      || pa || pb || chr(31)
                 ELSE acc || x || chr(31) END
             ) AS seq, freq
      FROM w{r} LEFT JOIN b{r} ON TRUE
    )"""
        )
    if final == "merges":
        union = " UNION ALL ".join(
            f"SELECT CAST({r + 1} AS BIGINT) AS step, pa, pb, "
            f"CAST(cnt AS BIGINT) AS cnt FROM b{r}"
            for r in range(n)
        )
        parts.append(f"\n    SELECT * FROM ({union}) ORDER BY step")
    elif final == "tokenize":
        # apply-side: re-segment every word occurrence of the small-id
        # documents with the trained vocabulary and reassemble per doc
        parts.append(
            f""",
    dw AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         x -> x != '') AS ws
      FROM documents
      WHERE length(trim(text)) > 0 AND doc_id < 200
    ),
    dwp AS (
      SELECT doc_id, i AS pos, ws[i] AS word
      FROM dw, UNNEST(range(1, len(ws) + 1)) AS t(i)
    ),
    seg AS (
      SELECT word,
             list_filter(string_split(seq, chr(31)), x -> x != '') AS syms
      FROM w{n}
    )
    SELECT d.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(len(s.syms)) AS BIGINT) AS n_tokens,
           string_agg(array_to_string(s.syms, ' '), ' ' ORDER BY d.pos)
             AS bpe_text
    FROM dwp d JOIN seg s USING (word)
    GROUP BY d.doc_id ORDER BY d.doc_id"""
        )
    else:  # the trained segmentation vocabulary after all n merges
        parts.append(
            f"""
    SELECT word, CAST(freq AS BIGINT) AS freq,
           CAST(len(list_filter(string_split(seq, chr(31)), x -> x != ''))
                AS BIGINT) AS n_sym,
           array_to_string(
             list_filter(string_split(seq, chr(31)), x -> x != ''), ' ')
             AS segmented
    FROM w{n} ORDER BY freq DESC, word LIMIT 50"""
        )
    return "".join(parts)


@register(
    "q_bpe_merges",
    oracle=_bpe_oracle(4),
    doc="BPE merge LEARNING (operators.text.learn_bpe_merges) — the "
    "tokenizer-training primitive: four rounds of 'count adjacent "
    "symbol pairs over the word-frequency vocabulary, merge the most "
    "frequent', deterministic tie-break. The corpus is scanned ONCE "
    "(word-frequency aggregate, checkpointed); each round is one "
    "vocabulary-sized pair-count shuffle plus a 1-row argmax collect "
    "(bounded driver state, the PageRank-iteration discipline). The "
    "oracle re-derives all four merges from scratch: the same "
    "greedy-scan fold runs as a DuckDB list_reduce, so a single wrong "
    "merge application anywhere breaks every later round's counts.",
)
def q_bpe_merges(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents")
    return tx.learn_bpe_merges(d, n_merges=4).orderBy("step")


@register(
    "q_doc_negatives",
    oracle="""
    WITH h AS (
      SELECT doc_id, (doc_id * 2654435761) % 2147483648 AS hk,
             ((doc_id * 2654435761) % 2147483648) % 1024 AS bucket
      FROM documents
    ),
    ring AS (
      SELECT bucket, doc_id AS rep FROM (
        SELECT bucket, doc_id,
               ROW_NUMBER() OVER (PARTITION BY bucket
                                  ORDER BY hk, doc_id) AS rn
        FROM h) WHERE rn = 1
    ),
    fan AS (
      SELECT h.doc_id, j.j AS neg_rank, (h.bucket + j.j) % 1024 AS nb
      FROM h, UNNEST(range(1, 5)) AS j(j)
      WHERE h.doc_id < 64
    )
    SELECT CAST(f.doc_id AS BIGINT) AS doc_id,
           CAST(f.neg_rank AS BIGINT) AS neg_rank,
           CAST(r.rep AS BIGINT) AS neg_id
    FROM fan f JOIN ring r ON f.nb = r.bucket
    WHERE r.rep != f.doc_id
    ORDER BY doc_id, neg_rank
    """,
    doc="Deterministic contrastive negative sampling "
    "(operators.text.negative_samples): a Knuth-hash RING replaces the "
    "RNG — every doc lands in a bucket, buckets elect min-(hash,id) "
    "representatives, anchor A draws negative j from bucket(A)+j. One "
    "corpus aggregate builds the parameter-bounded ring (1024 rows, "
    "broadcast scale-safe BY PARAMETER); anchors fan out k ways "
    "map-side — corpus and anchors never shuffle. Bit-reproducible "
    "sample, so the oracle replays the identical integer arithmetic.",
)
def q_doc_negatives(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents")
    anchors = d.filter(F.col("doc_id") < 64)
    return tx.negative_samples(d, k=4, n_buckets=1024, anchors=anchors).orderBy(
        "doc_id", "neg_rank"
    )


@register(
    "q_bpe_vocab",
    oracle=_bpe_oracle(4, final="vocab"),
    doc="The OTHER half of the trained tokenizer "
    "(operators.text.learn_bpe): the per-word-type segmentation after "
    "all four learned merges — top-50 vocabulary by frequency with "
    "symbol counts and the segmented form. Tokenizing a corpus is then "
    "a word->syms lookup join against this table, never a re-derive. "
    "Oracle replays the full training (four rounds of pair counts, "
    "argmax, fold-merge) AND the resulting segmentation of every "
    "vocabulary word in SQL.",
)
def q_bpe_vocab(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents")
    _, vocab = tx.learn_bpe(d, n_merges=4)
    return (
        vocab.select(
            "word",
            "freq",
            F.size("syms").cast("long").alias("n_sym"),
            F.array_join("syms", " ").alias("segmented"),
        )
        .orderBy(F.col("freq").desc(), "word")
        .limit(50)
    )


@register(
    "q_bpe_tokenize",
    oracle=_bpe_oracle(4, final="tokenize"),
    doc="Tokenizer APPLY (operators.text.bpe_tokenize): close the BPE "
    "loop — train 4 merges on the full corpus, then tokenize the "
    "small-id documents via the (word -> syms) lookup join against the "
    "trained vocabulary, never re-deriving merges per document. The "
    "vocabulary broadcasts (one row per word TYPE, bounded), the "
    "corpus never shuffles for the join, and the only wide op is the "
    "per-document reassembly groupBy. Emits exact int64 word/token "
    "counts plus the reassembled segmented text, so one wrong merge "
    "application anywhere in training OR apply breaks the string "
    "compare. Oracle replays training AND application end-to-end in "
    "SQL. Training itself now takes the hybrid local-rounds gate "
    "(vocabulary <= local_vocab_max collects once, merges fold "
    "driver-locally — the connected_components discipline), pinned "
    "bit-identical to the distributed path by a 1000-merge agreement "
    "test.",
)
def q_bpe_tokenize(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents")
    _, vocab = tx.learn_bpe(d, n_merges=4)
    return tx.bpe_tokenize(d.filter(F.col("doc_id") < 200), vocab).orderBy(
        "doc_id"
    )


@register(
    "q_skew_report",
    oracle="""
    WITH c AS (
      SELECT l_suppkey, COUNT(*) AS n_rows FROM lineitem GROUP BY 1
    ),
    t AS (SELECT SUM(n_rows) AS total, COUNT(*) AS n_keys FROM c)
    SELECT c.l_suppkey, CAST(c.n_rows AS BIGINT) AS n_rows,
           CAST(c.n_rows * 1000000 // t.total AS BIGINT) AS share_ppm,
           CAST(c.n_rows * t.n_keys * 1000 // t.total AS BIGINT)
             AS ratio_x1000
    FROM c, t ORDER BY c.n_rows DESC, c.l_suppkey LIMIT 10
    """,
    doc="Skew diagnostic (operators.skew.skew_report): top-10 heaviest "
    "join-key values with row counts, ppm share, and the x1000 ratio "
    "to a uniform key — the measurement that decides between plain "
    "shuffle, AQE skew-split, and salting. One map-combined count "
    "aggregate + TakeOrdered over the key-count frame; global scalars "
    "broadcast from a 1-row aggregate.",
)
def q_skew_report(spark: SparkSession, sf: str) -> DataFrame:
    from incremental_github_data_pipeline_spark.operators.skew import skew_report

    li = T(spark, sf, "lineitem")
    return skew_report(li, ["l_suppkey"], top=10)


@register(
    "q_source_report",
    oracle=r"""
    WITH d AS (
      SELECT source,
             list_filter(string_split_regex(TRIM(text), '\s+'),
                         x -> x != '') AS t,
             LENGTH(text) AS n_chars
      FROM documents
    ),
    per AS (
      SELECT source, n_chars, len(t) AS n_tok,
             len(list_distinct(t)) AS n_dist
      FROM d
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(CASE WHEN n_tok < 20 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_short,
           CAST(SUM(CASE WHEN 10 * (n_tok - n_dist) > 3 * n_tok
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_heavy
    FROM per GROUP BY source ORDER BY source
    """,
    doc="Per-source dataset report card: doc/token/char volumes, the "
    "short-doc tail, and repetition-heavy counts (>30% repeated "
    "tokens, integer cross-multiplied) — the corpus-composition "
    "overview run before every mixture decision. All lanes are exact "
    "integer aggregates over ONE scan: the signals ride the scan "
    "stage, one map-combined aggregate shuffles |sources| rows.",
)
def q_source_report(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents")
    t = tx.tokens(F.col("text"))
    per = d.select(
        "source",
        F.length("text").alias("n_chars"),
        F.size(t).alias("n_tok"),
        F.size(F.array_distinct(t)).alias("n_dist"),
    )
    return (
        per.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
            F.sum((F.col("n_tok") < 20).cast("long")).alias("n_short"),
            F.sum(
                (10 * (F.col("n_tok") - F.col("n_dist")) > 3 * F.col("n_tok"))
                .cast("long")
            ).alias("n_dup_heavy"),
        )
        .orderBy("source")
    )


def _wordpiece_oracle(n: int = 4, final: str = "merges") -> str:
    """Unrolled n-round WordPiece replay — the :func:`_bpe_oracle`
    structure with the likelihood-ratio argmax: per round, pair counts
    AND symbol counts over the current segmentation, best pair by
    ``(cnt · 10^12) // (ca · cb)`` in HUGEINT (digit-for-digit the
    Spark DECIMAL(38,0) ``div``), then the same sep-anchored
    list_reduce fold applies the merge."""
    scale = 10**12
    parts = [
        r"""
    WITH words AS (
      SELECT word, COUNT(*) AS freq FROM (
        SELECT UNNEST(list_filter(string_split_regex(trim(text), '\s+'),
                                  x -> x != '')) AS word
        FROM documents WHERE length(trim(text)) > 0
      ) GROUP BY word
    ),
    w0 AS (
      SELECT word,
             chr(31) || regexp_replace(word, '(.)', '\1' || chr(31), 'g')
               AS seq, freq
      FROM words
    )"""
    ]
    for r in range(n):
        parts.append(
            f""",
    l{r} AS (
      SELECT word, list_filter(string_split(seq, chr(31)), x -> x != '')
               AS l, freq
      FROM w{r}
    ),
    s{r} AS (
      SELECT sym, SUM(freq) AS c FROM (
        SELECT UNNEST(l) AS sym, freq FROM l{r}) GROUP BY 1
    ),
    p{r} AS (
      SELECT l[i] AS pa, l[i+1] AS pb, SUM(freq) AS cnt
      FROM l{r}, UNNEST(range(1, len(l))) AS t(i)
      GROUP BY 1, 2
    ),
    b{r} AS (
      SELECT p.pa, p.pb, p.cnt,
             CAST((CAST(p.cnt AS HUGEINT) * {scale})
                  // (CAST(ca.c AS HUGEINT) * cb.c) AS BIGINT) AS score_s
      FROM p{r} p
      JOIN s{r} ca ON ca.sym = p.pa
      JOIN s{r} cb ON cb.sym = p.pb
      ORDER BY score_s DESC, p.pa, p.pb LIMIT 1
    ),
    w{r + 1} AS (
      SELECT word, list_reduce(
               list_prepend(chr(31),
                 list_filter(string_split(seq, chr(31)), x -> x != '')),
               (acc, x) -> CASE
                 WHEN x = pb AND ends_with(acc, chr(31) || pa || chr(31))
                 THEN substr(acc, 1, length(acc) - length(pa) - 1)
                      || pa || pb || chr(31)
                 ELSE acc || x || chr(31) END
             ) AS seq, freq
      FROM w{r} LEFT JOIN b{r} ON TRUE
    )"""
        )
    if final == "merges":
        union = " UNION ALL ".join(
            f"SELECT CAST({r + 1} AS BIGINT) AS step, pa, pb, "
            f"CAST(cnt AS BIGINT) AS cnt, CAST(score_s AS BIGINT) AS score_s "
            f"FROM b{r}"
            for r in range(n)
        )
        parts.append(f"\n    SELECT * FROM ({union}) ORDER BY step")
    else:
        parts.append(
            f"""
    SELECT word, CAST(freq AS BIGINT) AS freq,
           CAST(len(list_filter(string_split(seq, chr(31)), x -> x != ''))
                AS BIGINT) AS n_sym,
           array_to_string(
             list_filter(string_split(seq, chr(31)), x -> x != ''), ' ')
             AS segmented
    FROM w{n} ORDER BY freq DESC, word LIMIT 50"""
        )
    return "".join(parts)


@register(
    "q_wordpiece_merges",
    oracle=_wordpiece_oracle(4),
    doc="WordPiece merge LEARNING (operators.text.learn_wordpiece) — "
    "the BERT-family tokenizer trainer, completing the three major "
    "families next to BPE and unigram-LM: same greedy loop as BPE but "
    "the argmax is the likelihood ratio count(ab)/(count(a)count(b)) "
    "as an exact scaled-integer quotient (DECIMAL div / HUGEINT //, "
    "measured digit-identical), so rare-but-strongly-bound morpheme "
    "pairs win over merely frequent ones. One corpus scan, per round "
    "a vocabulary-sized pair-count + symbol-count aggregate and a "
    "1-row argmax collect. The oracle re-derives all four merges AND "
    "their scores from scratch in SQL — one wrong score or fold "
    "application breaks every later round.",
)
def q_wordpiece_merges(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents")
    merges, _ = tx.learn_wordpiece(d, n_merges=4)
    return merges.orderBy("step")


@register(
    "q_wordpiece_vocab",
    oracle=_wordpiece_oracle(4, final="vocab"),
    doc="The trained WordPiece segmentation vocabulary after all four "
    "likelihood-ratio merges (top-50 by frequency): tokenizing a "
    "corpus is a word->syms lookup join against this table, reusing "
    "the family-agnostic bpe_tokenize apply path. Oracle replays the "
    "full training and final segmentation in SQL.",
)
def q_wordpiece_vocab(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents")
    _, vocab = tx.learn_wordpiece(d, n_merges=4)
    return (
        vocab.select(
            "word",
            "freq",
            F.size("syms").cast("long").alias("n_sym"),
            F.array_join("syms", " ").alias("segmented"),
        )
        .orderBy(F.col("freq").desc(), "word")
        .limit(50)
    )


@register(
    "q_skew_advisory",
    oracle="""
    WITH k AS (
      SELECT CASE WHEN event_id % 5 > 0 THEN -1 ELSE user_id END AS k
      FROM events
    ),
    c AS (SELECT k, COUNT(*) AS n FROM k GROUP BY 1),
    t AS (SELECT SUM(n) AS total, COUNT(*) AS n_keys FROM c),
    top AS (SELECT n FROM c ORDER BY n DESC, k LIMIT 1),
    m AS (
      SELECT CAST(top.n * t.n_keys * 1000 // t.total AS BIGINT) AS ratio,
             CAST(top.n * 1000000 // t.total AS BIGINT) AS share
      FROM top, t
    ),
    hot AS (
      SELECT COUNT(*) AS nh FROM (
        SELECT c.n, c.k FROM c ORDER BY c.n DESC, c.k LIMIT 10
      ) top10, t
      WHERE top10.n * t.n_keys * 1000 // t.total >= 10000
    )
    SELECT CASE WHEN m.ratio < 10000 THEN 'none'
                WHEN m.ratio < 100000 THEN 'aqe'
                ELSE 'salt' END AS verdict,
           CASE WHEN m.ratio >= 100000 THEN
             CAST(CASE WHEN (m.ratio + 9999) // 10000 <= 2 THEN 2
                       WHEN (m.ratio + 9999) // 10000 <= 4 THEN 4
                       WHEN (m.ratio + 9999) // 10000 <= 8 THEN 8
                       WHEN (m.ratio + 9999) // 10000 <= 16 THEN 16
                       WHEN (m.ratio + 9999) // 10000 <= 32 THEN 32
                       ELSE 64 END AS BIGINT)
           END AS buckets,
           m.ratio AS max_ratio_x1000,
           m.share AS max_share_ppm,
           CAST(hot.nh AS BIGINT) AS n_hot_keys
    FROM m, hot
    """,
    doc="Auto-skew advisory as DATA (r11, operators/skew."
    "suggest_skew_mitigation): an 80/20-planted join key (every "
    "non-fifth event collapses to one hot key) must yield the 'salt' "
    "verdict with the power-of-two bucket count that pulls the hot "
    "key back to ~10x uniform, clamped to 64 — the decision itself is "
    "integer arithmetic over the skew_report lanes, so DuckDB replays "
    "verdict, bucket sizing, ratio, share and the hot-key count "
    "exactly. Decision input is the bounded top-10 collect; the "
    "1-row output frame is the decision record a pipeline would log "
    "next to the job it tuned.",
)
def q_skew_advisory(spark: SparkSession, sf: str) -> DataFrame:
    from incremental_github_data_pipeline_spark.operators.skew import (
        suggest_skew_mitigation,
    )

    ev = T(spark, sf, "events").select(
        F.when(F.col("event_id") % 5 > 0, F.lit(-1))
        .otherwise(F.col("user_id"))
        .alias("k")
    )
    rec = suggest_skew_mitigation(ev, ["k"])
    return local_rows_df(
        spark,
        [
            (
                rec["verdict"],
                rec["buckets"],
                rec["max_ratio_x1000"],
                rec["max_share_ppm"],
                len(rec["hot_keys"]),
            )
        ],
        "verdict string, buckets long, max_ratio_x1000 long, "
        "max_share_ppm long, n_hot_keys long",
    )


# ---------------------------------------------------------------------------
# End-to-end crawl curation (r12, extended r13): the composite the
# r11/r12 pieces exist for — WARC ingest → HTTP-200 gate → strip_html
# + the full URL stack (percent-normalize → canonicalize → tracker
# strip) → robots.txt gate → URL exact-dedup (salted two-phase behind
# the skew advisory) → corpus-wide sentence dedup → quality gate →
# typed PII redaction, as ONE registered query emitting per-stage
# audit rows. Certifying the COMPOSITION catches inter-operator
# contract drift (column renames, ordering assumptions, null
# handling) that no per-op oracle can.
# ---------------------------------------------------------------------------

_CUR_BOILER = "Copyright FooCorp all rights reserved."

# The viral page every payload links (the third response): ONE
# canonical URL spelled six ways — case, default port, param order,
# over-encoded path (%6F='o', %68='h'), tracker params. The URL stack
# must fold all of them to ONE key, which is then the corpus's hot
# key: 24 copies against ~28 distinct keys trips the skew advisory
# ('aqe' hotness), routing the dedup through salted_keep_first.
_CUR_VIRAL = "https://viral.example.com/hot?x=1&y=2"


def _viral_spelling(i: int) -> str:
    return [
        "https://viral.example.com/hot?x=1&y=2",
        "HTTPS://VIRAL.Example.COM/hot?y=2&x=1",
        "https://viral.example.com:443/hot?x=1&y=2",
        "https://viral.example.com/h%6Ft?x=1&y=2",
        f"https://viral.example.com/hot?x=1&y=2&utm_campaign=c{i}",
        f"https://viral.example.com/%68ot?y=2&x=1&gclid=g{i}",
    ][i % 6]


# Per-host robots for the funnel corpus (r13): hosta1 disallows /p
# with an /p1* allow override (drops /p6 and /p21, keeps /p1 and
# /p16); hostb3 disallows /u (drops its odd-payload pages); the viral
# host and every other host have no rules (allowed). Parsed ONCE at
# import by parse_robots; both engines embed the SAME pre-compiled
# regex strings.
_CUR_ROBOTS_TEXTS = {
    "hosta1.example.com": (
        "User-agent: *\nDisallow: /p\nAllow: /p1*\n"
    ),
    "hostb3.example.com": "User-agent: *\nDisallow: /u\n",
}

_CUR_ROBOT_RULES = [
    (host, r["allow"], r["pattern"], r["regex"], r["plen"])
    for host, text in sorted(_CUR_ROBOTS_TEXTS.items())
    for r in tx.parse_robots(text, agent="*")
]

_CUR_ROBOT_RULES_SQL = ", ".join(
    f"('{h}', {a}, '{p}', '{rx.replace(chr(92), chr(92) * 2)}', {pl})"
    for h, a, p, rx, pl in _CUR_ROBOT_RULES
)


def _curation_corpus(spark):
    """24 WARC payloads × 4 records (warcinfo + three HTML responses)
    with planted drops for EVERY funnel stage: warcinfo rows die at
    the response gate, i%6==5 first responses are 404s, even-payload
    second responses duplicate the first's URL under a different
    spelling (case/port/param-order — canonicalization must unify
    them), the third response is the VIRAL page under six spellings
    (case/port/param-order/percent-encoding/trackers — the full URL
    stack must fold them to one hot key, r13), robots.txt drops
    hosta1's non-/p1* paths and hostb3 entirely (r13), every doc ends
    with the same boilerplate sentence (sentence dedup keeps exactly
    one corpus-wide), and short docs fall to the token-count quality
    gate; sentence 1 of first responses carries a planted email the
    redaction stage removes. Every field is a closed-form rule the
    oracle replays; even ids use the .warc.gz member-per-record
    layout, odd ids plain concatenation."""
    rows = []
    for i in range(24):
        def text_of(m):
            n_sent = 2 + (i + m) % 3
            parts = []
            for j in range(n_sent):
                k = (i * 5 + m * 3 + 7 * j) % 30
                body = f"S{k} a{k % 7} b{(k * 3) % 10}"
                if m == 1 and j == 1:
                    # planted PII: the redaction stage must remove it
                    body += f" u{i}x1@ex.com"
                parts.append(body + ".!?"[k % 3])
            parts.append(_CUR_BOILER)
            return " ".join(parts)

        def html(m):
            return (
                f"<html><head><title>T{i}x{m}</title></head>"
                f"<body><p>{text_of(m)}</p></body></html>"
            ).encode("utf-8")

        url1 = (
            f"HTTPS://HostA{i % 5}.Example.COM:443/p{i}"
            f"?b={i % 3}&a={i % 2}#f{i}"
        )
        # hostb pages arrive over plain http (r14): the robots gate
        # must match them too — the r13 regexes anchored on https://
        # only and silently waved http:// URLs through (ADVICE r13)
        url2 = (
            f"https://hosta{i % 5}.example.com/p{i}?a={i % 2}&b={i % 3}"
            if i % 2 == 0
            else f"http://hostb{i % 5}.example.com/u{i}"
        )
        recs = [
            {
                "warc_type": "warcinfo",
                "content_type": "application/warc-fields",
                "body": f"software: synthgen/{i}\r\n".encode("ascii"),
            },
            {
                "warc_type": "response",
                "target_uri": url1,
                "http_status": 404 if i % 6 == 5 else 200,
                "body": html(1),
            },
            {
                "warc_type": "response",
                "target_uri": url2,
                "http_status": 200,
                "body": html(2),
            },
            {
                "warc_type": "response",
                "target_uri": _viral_spelling(i),
                "http_status": 200,
                "body": html(3),
            },
        ]
        rows.append(
            (i, tx.warc_build(recs, gzip_per_record=i % 2 == 0))
        )
    return local_rows_df(
        spark,
        rows, "payload_id long, payload binary"
    )


# DuckDB replay of the whole funnel from the closed-form rules. The
# oracle constructs the post-URL-stack canonical URLs directly (the
# stack's mechanics are certified per-op by q_url_canonical); robots
# gating is replayed for real — the same pre-compiled rule regexes,
# longest-match window semantics — because the funnel's gate IS the
# distributed robots_match composition.
_CURATION_ORACLE = f"""
    WITH docs AS (
      SELECT i.i AS i, m0.m0 + 1 AS m,
             CASE WHEN m0.m0 + 1 = 1 AND i.i % 6 = 5
                  THEN 404 ELSE 200 END AS http_status,
             CASE WHEN m0.m0 + 1 = 3
               THEN '{_CUR_VIRAL}'
              WHEN m0.m0 + 1 = 1 OR i.i % 2 = 0
               THEN 'https://hosta' || (i.i % 5) || '.example.com/p'
                    || i.i || '?a=' || (i.i % 2) || '&b=' || (i.i % 3)
               ELSE 'http://hostb' || (i.i % 5) || '.example.com/u'
                    || i.i
             END AS url
      FROM range(24) i(i), range(3) m0(m0)
    ),
    ok AS (
      SELECT *, regexp_extract(url, '^https?://([^/]+)', 1) AS host,
             regexp_extract(url, '^https?://[^/]+([^?]*)', 1) AS path
      FROM docs WHERE http_status = 200
    ),
    rules(rhost, allow, pattern, regex, plen) AS (
      VALUES {_CUR_ROBOT_RULES_SQL}
    ),
    rj AS (
      SELECT o.i, o.m, r.allow, r.plen, r.pattern,
             CASE WHEN r.regex IS NOT NULL
                       AND regexp_matches(o.path, r.regex)
                  THEN 1 ELSE 0 END AS mt
      FROM ok o LEFT JOIN rules r ON o.host = r.rhost
    ),
    gate AS (
      SELECT i, m, (mt = 0 OR mt IS NULL OR allow = 1) AS allowed
      FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY i, m
          ORDER BY mt DESC, plen DESC, allow DESC, pattern) AS rn
        FROM rj
      ) WHERE rn = 1
    ),
    gated AS (
      SELECT o.* FROM ok o
      JOIN gate g ON o.i = g.i AND o.m = g.m
      WHERE g.allowed
    ),
    url_kept AS (
      SELECT i, m FROM (
        SELECT i, m, ROW_NUMBER() OVER (
          PARTITION BY url ORDER BY i, m) AS rn
        FROM gated
      ) WHERE rn = 1
    ),
    sent AS (
      -- j < n_sent: regular sentences (sentence 0 absorbs the title —
      -- strip_html leaves 'T<i>x<m>' with no terminator before it);
      -- j = n_sent: the shared boilerplate sentence
      SELECT d.i, d.m, j.j AS j,
             CASE
               WHEN j.j = 2 + (d.i + d.m) % 3
                 THEN 'Copyright FooCorp all rights reserved.'
               ELSE
                 CASE WHEN j.j = 0
                      THEN 'T' || d.i || 'x' || d.m || ' ' ELSE '' END
                 || 'S' || ((d.i*5 + d.m*3 + 7*j.j) % 30)
                 || ' a' || (((d.i*5 + d.m*3 + 7*j.j) % 30) % 7)
                 || ' b' || ((((d.i*5 + d.m*3 + 7*j.j) % 30) * 3) % 10)
                 || CASE WHEN d.m = 1 AND j.j = 1
                         THEN ' u' || d.i || 'x1@ex.com' ELSE '' END
                 || substr('.!?',
                      ((d.i*5 + d.m*3 + 7*j.j) % 30) % 3 + 1, 1)
             END AS content
      -- j runs to n_sent INCLUSIVE (the boilerplate slot): n_sent
      -- reaches 4, so the grid needs range(5)
      FROM ok d, range(5) j(j)
      WHERE j.j <= 2 + (d.i + d.m) % 3
    ),
    sent_tok AS (
      SELECT i, m, j, content,
             CAST(len(string_split(content, ' ')) AS BIGINT) AS toks
      FROM sent
    ),
    -- sentence dedup runs on the URL-DEDUPED corpus: rank only there
    kept_sent AS (
      SELECT s.*, ROW_NUMBER() OVER (
        PARTITION BY s.content ORDER BY s.i, s.m, s.j) AS rn
      FROM sent_tok s JOIN url_kept u ON s.i = u.i AND s.m = u.m
    ),
    per_doc AS (
      SELECT i, m,
             SUM(CASE WHEN rn = 1 THEN toks ELSE 0 END) AS kept_toks,
             SUM(toks) AS all_toks,
             string_agg(content, ' ' ORDER BY j)
               FILTER (WHERE rn = 1) AS kept_text,
             string_agg(content, ' ' ORDER BY j) AS all_text
      FROM kept_sent GROUP BY i, m
    ),
    full_doc AS (  -- every HTTP-200 doc's extracted text (stage 2)
      SELECT i, m, string_agg(content, ' ' ORDER BY j) AS text,
             SUM(CAST(len(string_split(content, ' ')) AS BIGINT))
               AS toks
      FROM sent GROUP BY i, m
    ),
    gated_doc AS (  -- robots-surviving docs' full text (stage 3)
      SELECT f.* FROM full_doc f
      JOIN gate g ON f.i = g.i AND f.m = g.m WHERE g.allowed
    ),
    redacted AS (
      SELECT i, m,
             regexp_replace(regexp_replace(regexp_replace(kept_text,
               '__EMAIL__', '<EMAIL>', 'g'),
               '__URL__', '<URL>', 'g'),
               '__PHONE__', '<PHONE>', 'g') AS rtext
      FROM per_doc WHERE kept_toks >= 9
    )
    SELECT * FROM (
      SELECT 0 AS stage_idx, 'records' AS stage,
             CAST(24 * 4 AS BIGINT) AS n_rows,
             CAST(NULL AS BIGINT) AS n_tokens,
             CAST(NULL AS BIGINT) AS n_chars
      UNION ALL
      SELECT 1, 'http200', (SELECT COUNT(*) FROM ok),
             CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
      UNION ALL
      SELECT 2, 'extracted', (SELECT COUNT(*) FROM ok),
             (SELECT CAST(SUM(toks) AS BIGINT) FROM full_doc),
             (SELECT CAST(SUM(length(text)) AS BIGINT) FROM full_doc)
      UNION ALL
      SELECT 3, 'robots_gate', (SELECT COUNT(*) FROM gated_doc),
             (SELECT CAST(SUM(toks) AS BIGINT) FROM gated_doc),
             (SELECT CAST(SUM(length(text)) AS BIGINT) FROM gated_doc)
      UNION ALL
      SELECT 4, 'url_dedup', (SELECT COUNT(*) FROM url_kept),
             (SELECT CAST(SUM(all_toks) AS BIGINT) FROM per_doc),
             (SELECT CAST(SUM(length(all_text)) AS BIGINT) FROM per_doc)
      UNION ALL
      SELECT 5, 'sentence_dedup', (SELECT COUNT(*) FROM url_kept),
             (SELECT CAST(SUM(kept_toks) AS BIGINT) FROM per_doc),
             (SELECT CAST(SUM(length(kept_text)) AS BIGINT) FROM per_doc)
      UNION ALL
      SELECT 6, 'quality',
             (SELECT COUNT(*) FROM per_doc WHERE kept_toks >= 9),
             (SELECT CAST(SUM(kept_toks) AS BIGINT) FROM per_doc
              WHERE kept_toks >= 9),
             (SELECT CAST(SUM(length(kept_text)) AS BIGINT) FROM per_doc
              WHERE kept_toks >= 9)
      UNION ALL
      SELECT 7, 'redact', (SELECT COUNT(*) FROM redacted),
             (SELECT CAST(SUM(CAST(len(string_split(rtext, ' '))
                AS BIGINT)) AS BIGINT) FROM redacted),
             (SELECT CAST(SUM(length(rtext)) AS BIGINT) FROM redacted)
    ) ORDER BY stage_idx
""".replace(
    "__EMAIL__", tx.PII_PATTERNS["email"]
).replace(
    "__URL__", tx.PII_PATTERNS["url"]
).replace(
    "__PHONE__", tx.PII_PATTERNS["phone"]
)

@register(
    "q_crawl_curation",
    oracle=_CURATION_ORACLE,
    doc="End-to-end crawl curation funnel (r12, extended r13): "
    "warc_ingest -> HTTP-200 response gate -> strip_html + the FULL "
    "URL stack (normalize_percent_encoding -> canonicalize_url -> "
    "strip_tracking_params — r13) -> robots.txt gate (r13: per-host "
    "rules parsed at import, broadcast join + RFC 9309 longest-match "
    "window; hosta1's /p-except-/p1* and hostb3's /u rules plant the "
    "drops) -> URL exact-dedup routed by the SKEW ADVISORY (r13: the "
    "fixture's viral page arrives under six spellings — case, port, "
    "param order, percent-encoding, trackers — folding to ONE key "
    "with 24 copies, which trips suggest_skew_mitigation; any hot-key "
    "verdict takes salted_keep_first, the algebraic two-phase form, "
    "because AQE never splits window partitions; the oracle replays "
    "the plain keep-first — RESULT IDENTITY is the contract) -> "
    "corpus-wide sentence exact-dedup over split_sentences (the "
    "planted boilerplate sentence survives exactly once) -> "
    "token-count quality gate -> typed PII redaction (redact_typed: "
    "the planted emails leave as <EMAIL>, visible in the n_chars "
    "lane), emitting one audit row per stage (rows in, tokens and "
    "chars surviving). Certifying the COMPOSITION catches "
    "inter-operator contract drift no per-op oracle can — the "
    "fixture plants a drop for every stage. Plan shape: the Arrow "
    "parse pass runs ONCE into a localCheckpoint (r15: lazy — each "
    "eager checkpoint was a dedicated materialization job; the lazy "
    "form persists inside the first consuming job and is reused by "
    "every later one, same result, ~half the job count) (bounded: "
    "one row per record), and every later stage is joins/windows/"
    "aggregates over checkpointed frames — the per-stage audit rows "
    "are 1-row aggregates, so the funnel costs one parse + a handful "
    "of bounded shuffles regardless of how many stages report. At "
    "100 TB the checkpoints become persisted stage tables (the "
    "standard curation-ledger layout); the per-stage audit is "
    "O(stages), not O(corpus); the advisory's decision input is a "
    "bounded top-10 collect.",
)
def q_crawl_curation(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    from incremental_github_data_pipeline_spark.operators.skew import (
        salted_keep_first,
        suggest_skew_mitigation,
    )

    recs = tx.warc_ingest(_curation_corpus(spark)).localCheckpoint(
        eager=False
    )
    ok = recs.filter(
        (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
    )
    ext = ok.select(
        "payload_id",
        "record_idx",
        tx.strip_tracking_params(
            tx.canonicalize_url(
                tx.normalize_percent_encoding(F.col("target_uri"))
            )
        ).alias("url"),
        tx.strip_html(F.col("text")).alias("text"),
    ).localCheckpoint(eager=False)
    ext = ext.withColumn(
        "n_tokens", F.size(F.split(F.col("text"), " ")).cast("long")
    )
    # robots gate (r13): per-host rules are a model-sized dimension
    # (parsed at import, broadcast); the corpus side pays one
    # broadcast join + one longest-match window
    rules = local_rows_df(
        spark,
        _CUR_ROBOT_RULES,
        "host string, allow int, pattern string, regex string, plen int",
    )
    # collision-free per-record uid (ADVICE r13) + scheme-complete
    # host/path extraction: canonicalize_url preserves http://, which
    # must hit the robots gate like any other fetch
    with_hp = ext.select(
        "*",
        (
            F.shiftleft(F.col("payload_id"), 32) + F.col("record_idx")
        ).alias("_uid"),
        F.regexp_extract(F.col("url"), "^https?://([^/]+)", 1).alias(
            "host"
        ),
        F.regexp_extract(
            F.col("url"), "^https?://[^/]+([^?]*)", 1
        ).alias("path"),
    )
    verdicts = tx.robots_match(with_hp, rules, url_id="_uid")
    gated = (
        with_hp.join(
            verdicts.filter("allowed").select("_uid"), "_uid"
        )
        .drop("_uid", "host", "path")
        .localCheckpoint(eager=False)
    )
    # URL exact-dedup, skew-aware (r13): the advisory measures the
    # gated corpus's URL key (bounded top-10 collect). Any hot-key
    # verdict routes through salted_keep_first — AQE splits join and
    # aggregate partitions but never window partitions, so for a
    # keep-first WINDOW both 'aqe' and 'salt' hotness mean the same
    # thing: take the algebraic two-phase form. The viral fixture URL
    # (24 copies of one key) trips it; result is identical to the
    # window by construction, which is exactly what the oracle pins.
    rec = suggest_skew_mitigation(gated, ["url"])
    if rec["verdict"] == "none":
        w_url = Window.partitionBy("url").orderBy(
            "payload_id", "record_idx"
        )
        kept_docs = (
            gated.withColumn("rn", F.row_number().over(w_url))
            .filter(F.col("rn") == 1)
            .drop("rn")
            .localCheckpoint(eager=False)
        )
    else:
        kept_docs = salted_keep_first(
            gated,
            ["url"],
            ["payload_id", "record_idx"],
            buckets=rec["buckets"] or 16,
        ).localCheckpoint(eager=False)
    sents = kept_docs.select(
        "payload_id",
        "record_idx",
        F.posexplode(tx.split_sentences(F.col("text"))).alias(
            "sent_idx", "sentence"
        ),
    ).localCheckpoint(eager=False)
    # sentence dedup, skew-aware (r14, VERDICT r13 task 3): the URL
    # stage has been advisory-routed since r13, but boilerplate
    # sentences ("click here to subscribe") are hot keys BY NATURE at
    # crawl scale — the fixture's shared copyright sentence appears
    # once per surviving doc, tripping the advisory here too. Any
    # hot-key verdict takes salted_keep_first (AQE never splits
    # window partitions); the oracle replays the plain keep-first, so
    # RESULT IDENTITY with the window form is the contract.
    rec_s = suggest_skew_mitigation(sents, ["sentence"])
    if rec_s["verdict"] == "none":
        w_sent = Window.partitionBy("sentence").orderBy(
            "payload_id", "record_idx", "sent_idx"
        )
        kept_sents = (
            sents.withColumn("rn", F.row_number().over(w_sent))
            .filter(F.col("rn") == 1)
            .select("payload_id", "record_idx", "sent_idx")
        )
    else:
        kept_sents = salted_keep_first(
            sents,
            ["sentence"],
            ["payload_id", "record_idx", "sent_idx"],
            buckets=rec_s["buckets"] or 16,
        ).select("payload_id", "record_idx", "sent_idx")
    enriched = sents.join(
        kept_sents.withColumn("_kept", F.lit(1)),
        ["payload_id", "record_idx", "sent_idx"],
        "left",
    ).withColumn(
        "toks", F.size(F.split(F.col("sentence"), " ")).cast("long")
    )
    kept_struct = F.when(
        F.col("_kept") == 1, F.struct("sent_idx", "sentence")
    )
    per_doc = (
        enriched.groupBy("payload_id", "record_idx")
        .agg(
            F.sum(
                F.when(F.col("_kept") == 1, F.col("toks")).otherwise(
                    F.lit(0)
                )
            ).alias("kept_toks"),
            F.sum("toks").alias("all_toks"),
            # reassemble the doc from its surviving sentences, in
            # original order (collect_list drops the un-kept NULLs)
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda s: s.sentence,
                ),
                " ",
            ).alias("kept_text"),
        )
        .localCheckpoint(eager=False)
    )
    # r16 (guide §1.2 / §2.4): the audit previously unioned EIGHT
    # 1-row aggregates, one per stage — but stages 0+1 read the same
    # `recs` checkpoint and stages 5+6+7 the same `per_doc` checkpoint.
    # Stages sharing a source now share ONE aggregate pass (conditional
    # aggregation), so the audit reads each ledger frame exactly once:
    # 8 aggregate subtrees → 5. The five 1-row results crossJoin into a
    # single row and explode back to the identical 8 audit rows (same
    # values: the quality/redact rows aggregate WHEN(kept_toks >= 9)
    # guards, which is exactly the filter they replaced; redact_typed
    # still runs once per qualifying doc inside a projection).
    _q = F.col("kept_toks") >= 9
    audited = per_doc.select(
        "kept_toks",
        "kept_text",
        F.when(_q, tx.redact_typed(F.col("kept_text"))).alias("_rt"),
    )
    s01 = recs.agg(
        F.count(F.lit(1)).cast("long").alias("_n0"),
        F.sum(
            F.when(
                (F.col("warc_type") == "response")
                & (F.col("http_status") == 200),
                1,
            ).otherwise(0)
        ).cast("long").alias("_n1"),
    )
    s2 = ext.agg(
        F.count(F.lit(1)).cast("long").alias("_n2"),
        F.sum("n_tokens").cast("long").alias("_t2"),
        F.sum(F.length("text")).cast("long").alias("_c2"),
    )
    s3 = gated.agg(
        F.count(F.lit(1)).cast("long").alias("_n3"),
        F.sum("n_tokens").cast("long").alias("_t3"),
        F.sum(F.length("text")).cast("long").alias("_c3"),
    )
    s4 = kept_docs.agg(
        F.count(F.lit(1)).cast("long").alias("_n4"),
        F.sum(F.size(F.split(F.col("text"), " ")).cast("long"))
        .cast("long").alias("_t4"),
        F.sum(F.length("text")).cast("long").alias("_c4"),
    )
    s567 = audited.agg(
        F.count(F.lit(1)).cast("long").alias("_n5"),
        F.sum("kept_toks").cast("long").alias("_t5"),
        F.sum(F.length("kept_text")).cast("long").alias("_c5"),
        F.sum(F.when(_q, 1).otherwise(0)).cast("long").alias("_n6"),
        F.sum(F.when(_q, F.col("kept_toks"))).cast("long").alias("_t6"),
        F.sum(F.when(_q, F.length("kept_text"))).cast("long").alias("_c6"),
        # null-guarded: un-kept rows carry a NULL _rt and must not
        # contribute (size(split(NULL)) is -1 under legacy semantics)
        F.sum(
            F.when(
                F.col("_rt").isNotNull(),
                F.size(F.split(F.col("_rt"), " ")).cast("long"),
            )
        ).cast("long").alias("_t7"),
        F.sum(F.length("_rt")).cast("long").alias("_c7"),
    )
    _nul = F.lit(None).cast("long")

    def _srow(idx, name, n, t, c):
        return F.struct(
            F.lit(idx).cast("long").alias("stage_idx"),
            F.lit(name).alias("stage"),
            n.alias("n_rows"),
            t.alias("n_tokens"),
            c.alias("n_chars"),
        )

    def _rows(agg_df, *structs):
        # one aggregate → its stage rows (a 1-row frame exploded);
        # union keeps the assembly broadcast-free (a crossJoin chain
        # of the 1-row aggregates measured +2 broadcast-build jobs)
        return agg_df.select(
            F.explode(F.array(*structs)).alias("_s")
        ).select("_s.*")

    return (
        _rows(
            s01,
            _srow(0, "records", F.col("_n0"), _nul, _nul),
            _srow(1, "http200", F.col("_n1"), _nul, _nul),
        )
        .unionAll(_rows(s2, _srow(2, "extracted", F.col("_n2"),
                                  F.col("_t2"), F.col("_c2"))))
        .unionAll(_rows(s3, _srow(3, "robots_gate", F.col("_n3"),
                                  F.col("_t3"), F.col("_c3"))))
        .unionAll(_rows(s4, _srow(4, "url_dedup", F.col("_n4"),
                                  F.col("_t4"), F.col("_c4"))))
        .unionAll(
            _rows(
                s567,
                _srow(5, "sentence_dedup", F.col("_n5"),
                      F.col("_t5"), F.col("_c5")),
                _srow(6, "quality", F.col("_n6"),
                      F.col("_t6"), F.col("_c6")),
                _srow(7, "redact", F.col("_n6"),
                      F.col("_t7"), F.col("_c7")),
            )
        )
        .orderBy("stage_idx")
    )


@register(
    "q_skew_mitigated_join",
    oracle="""
    WITH k AS (
      SELECT CASE WHEN event_id % 5 > 0 THEN -1 ELSE user_id END AS k,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    dim AS (
      SELECT k, CAST(abs(k) % 7 + 1 AS BIGINT) AS cap
      FROM (SELECT DISTINCT k FROM k)
    ),
    j AS (SELECT a.k, a.cents, d.cap FROM k a JOIN dim d USING (k)),
    agg AS (
      SELECT k, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(cents) AS BIGINT) AS sum_cents, MAX(cap) AS cap
      FROM j GROUP BY k
    ),
    c AS (SELECT k, COUNT(*) AS n FROM k GROUP BY 1),
    t AS (SELECT SUM(n) AS total, COUNT(*) AS n_keys FROM c),
    top AS (SELECT n FROM c ORDER BY n DESC, k LIMIT 1),
    m AS (
      SELECT CAST(top.n * t.n_keys * 1000 // t.total AS BIGINT) AS ratio
      FROM top, t
    ),
    d AS (
      SELECT CASE WHEN m.ratio < 10000 THEN 'none'
                  WHEN m.ratio < 100000 THEN 'aqe'
                  ELSE 'salt' END AS verdict,
             CASE WHEN m.ratio >= 100000 THEN
               CAST(CASE WHEN (m.ratio + 9999) // 10000 <= 2 THEN 2
                         WHEN (m.ratio + 9999) // 10000 <= 4 THEN 4
                         WHEN (m.ratio + 9999) // 10000 <= 8 THEN 8
                         WHEN (m.ratio + 9999) // 10000 <= 16 THEN 16
                         WHEN (m.ratio + 9999) // 10000 <= 32 THEN 32
                         ELSE 64 END AS BIGINT)
             END AS buckets
      FROM m
    )
    SELECT agg.k, agg.n_rows, agg.sum_cents, agg.cap,
           d.verdict, d.buckets
    FROM agg, d ORDER BY agg.k
    """,
    doc="Skew mitigation applied END-TO-END inside a query (r12, "
    "VERDICT r11 stretch: apply_skew_mitigation was dispatch-tested "
    "but nothing consumed the verdict): the 80/20-planted join key "
    "from q_skew_advisory drives suggest_skew_mitigation (bounded "
    "top-10 collect), whose 'salt' verdict routes the fact-to-"
    "dimension join through salted_join with the recommended bucket "
    "count — the hot key spreads over 64 salt partitions instead of "
    "one straggler task. The oracle is RESULT IDENTITY: the salted "
    "join must aggregate to exactly the plain join's per-key counts "
    "and sums (salting changes physical spread, never semantics), "
    "with the decision columns recomputed in integer arithmetic. "
    "At 100 TB the dimension would be a real table; here it derives "
    "from the fact's distinct keys (2 fact scans + the advisory's "
    "bounded report, each minimal).",
)
def q_skew_mitigated_join(spark: SparkSession, sf: str) -> DataFrame:
    from incremental_github_data_pipeline_spark.operators.skew import (
        apply_skew_mitigation,
        suggest_skew_mitigation,
    )

    ev = T(spark, sf, "events").select(
        F.when(F.col("event_id") % 5 > 0, F.lit(-1))
        .otherwise(F.col("user_id"))
        .alias("k"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    dim = (
        ev.select("k")
        .distinct()
        .withColumn("cap", (F.abs(F.col("k")) % 7 + 1).cast("long"))
    )
    rec = suggest_skew_mitigation(ev, ["k"])
    joined = apply_skew_mitigation(ev, dim, ["k"], rec)
    return (
        joined.groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("cents").alias("sum_cents"),
            F.max("cap").alias("cap"),
        )
        .withColumn("verdict", F.lit(rec["verdict"]))
        .withColumn(
            "buckets",
            F.lit(rec["buckets"]).cast("long"),
        )
        .orderBy("k")
    )


@register(
    "q_url_strip_tracking",
    oracle=r"""
    WITH u0 AS (
      SELECT doc_id,
             'HTTPS://Host' || (doc_id % 5) || '.EX.COM/p' || (doc_id % 4)
             || '?utm_source=s' || (doc_id % 3)
             || CASE WHEN doc_id % 2 = 0 THEN '&id=' || doc_id ELSE '' END
             || CASE WHEN doc_id % 3 = 0
                     THEN '&fbclid=f' || doc_id ELSE '' END
             || CASE WHEN doc_id % 5 = 0
                     THEN '&keep=k' || (doc_id % 7) ELSE '' END
             || CASE WHEN doc_id % 2 = 0 THEN '#f' || doc_id ELSE '' END
               AS u
      FROM documents WHERE doc_id < 400
    ),
    s1 AS (
      SELECT doc_id, regexp_replace(u, '#.*$', '') AS u FROM u0
    ),
    hp AS (
      SELECT doc_id,
             lower(regexp_extract(u,
               '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
             lower(regexp_extract(
               regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.-]*://', ''),
               '^([^/?]*)', 1)) AS hostport,
             regexp_extract(
               regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.-]*://', ''),
               '^[^/?]*([^?]*)', 1) AS path,
             CASE WHEN contains(u, '?')
                  THEN regexp_replace(u, '^[^?]*\?', '')
                  ELSE '' END AS q
      FROM s1
    ),
    canon AS (
      SELECT doc_id,
             scheme || '://' || hostport ||
             CASE WHEN path = '' THEN '/' ELSE path END AS base,
             CASE WHEN q <> ''
                  THEN array_to_string(list_sort(string_split(q, '&')),
                                       '&')
                  ELSE '' END AS q
      FROM hp
    ),
    stripped AS (
      SELECT doc_id, base,
             list_filter(
               string_split(q, '&'),
               p -> NOT (starts_with(string_split(p, '=')[1], 'utm_')
                         OR list_contains(
                              ['fbclid','gclid','dclid','msclkid',
                               'twclid','yclid','igshid','mc_cid',
                               'mc_eid','wbraid','gbraid','_hsenc',
                               '_hsmi','s_cid','ref_src'],
                              string_split(p, '=')[1]))
             ) AS kept
      FROM canon WHERE q <> ''
      UNION ALL
      SELECT doc_id, base, [] FROM canon WHERE q = ''
    )
    SELECT doc_id,
           base || CASE WHEN len(kept) > 0
                        THEN '?' || array_to_string(kept, '&')
                        ELSE '' END AS url
    FROM stripped ORDER BY doc_id
    """,
    doc="Tracker-parameter stripping composed with canonicalization "
    "(r12, operators/text.strip_tracking_params): the policy layer "
    "canonicalize_url documents as above its mechanical core — utm_* "
    "by prefix plus the exact-name click-id set (fbclid/gclid/...), "
    "names only, values never inspected. Fixture URLs cycle trackers "
    "mixed with real params, tracker-only queries (the '?' must "
    "disappear entirely) and fragments; the FULL cleaned canonical "
    "string hash-compares cross-engine. Pure split/filter/join "
    "expressions — scan-stage at 100 TB, and the step that turns "
    "dozens of tracker spellings of one page into one dedup key.",
)
def q_url_strip_tracking(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents").filter(F.col("doc_id") < 400)
    u = F.concat(
        F.lit("HTTPS://Host"),
        (F.col("doc_id") % 5).cast("string"),
        F.lit(".EX.COM/p"),
        (F.col("doc_id") % 4).cast("string"),
        F.lit("?utm_source=s"),
        (F.col("doc_id") % 3).cast("string"),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit("&id="), F.col("doc_id").cast("string")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("&fbclid=f"), F.col("doc_id").cast("string")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit("&keep=k"),
                     (F.col("doc_id") % 7).cast("string")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit("#f"), F.col("doc_id").cast("string")),
        ).otherwise(F.lit("")),
    )
    cleaned = tx.strip_tracking_params(tx.canonicalize_url(u))
    return d.select("doc_id", cleaned.alias("url")).orderBy("doc_id")


# Per-host robots.txt fixtures (the per-HOST dimension a crawler keeps):
# h0 exercises prefix disallow + longer-allow override + the $ anchor;
# h1 exercises longest-match between nested patterns and a wildcard;
# h2 has no rules (everything allowed). Parsed ONCE at import by
# parse_robots — both the Spark rules frame and the SQL VALUES embed
# the SAME pre-compiled regex strings, so pattern translation cannot
# drift cross-engine.
_ROBOTS_TEXTS = {
    "h0": (
        "# test corpus robots\n"
        "User-agent: *\n"
        "Disallow: /private/\n"
        "Allow: /private/ok*\n"
        "Disallow: /tmp$\n"
    ),
    "h1": (
        "User-agent: otherbot\n"
        "Disallow: /\n"
        "User-agent: *\n"
        "Disallow: /p\n"
        "Allow: /p1/x*\n"
        "Disallow: /p1/x9$\n"
    ),
    "h2": "User-agent: *\nDisallow:\n",
}

_ROBOT_RULES = [
    (host, r["allow"], r["pattern"], r["regex"], r["plen"])
    for host, text in sorted(_ROBOTS_TEXTS.items())
    for r in tx.parse_robots(text, agent="*")
]

_ROBOT_RULES_SQL = ", ".join(
    f"('{h}', {a}, '{p}', '{rx.replace(chr(92), chr(92) * 2)}', {pl})"
    for h, a, p, rx, pl in _ROBOT_RULES
)

_ROBOT_PATHS_SQL = """
      CASE CAST(doc_id % 6 AS INTEGER)
        WHEN 0 THEN '/p1'
        WHEN 1 THEN '/private/a'
        WHEN 2 THEN '/private/ok/x'
        WHEN 3 THEN '/tmp'
        WHEN 4 THEN '/tmp2'
        ELSE '/p1/x9' END
"""


@register(
    "q_robots_gate",
    oracle=f"""
    WITH urls AS (
      -- host decoupled from the path cycle ((doc_id // 6) % 3), so
      -- every (host, path) combination occurs
      SELECT doc_id AS url_id, 'h' || ((doc_id // 6) % 3) AS host,
             {_ROBOT_PATHS_SQL} AS path
      FROM documents WHERE doc_id < 300
    ),
    rules(host, allow, pattern, regex, plen) AS (
      VALUES {_ROBOT_RULES_SQL}
    ),
    j AS (
      SELECT u.url_id, u.host, u.path, r.allow, r.pattern, r.plen,
             CASE WHEN r.regex IS NOT NULL
                       AND regexp_matches(u.path, r.regex)
                  THEN 1 ELSE 0 END AS m
      FROM urls u LEFT JOIN rules r ON u.host = r.host
    ),
    best AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY url_id
        ORDER BY m DESC, plen DESC, allow DESC, pattern) AS rn
      FROM j
    )
    SELECT url_id, host, path,
           (m = 0 OR m IS NULL OR allow = 1) AS allowed,
           CASE WHEN m = 1 THEN pattern END AS matched_pattern
    FROM best WHERE rn = 1 ORDER BY url_id
    """,
    doc="robots.txt crawl gating (r12, operators/text.parse_robots + "
    "robots_match): RFC 9309 longest-match semantics — among matching "
    "rules the longest PATTERN wins (octet length, not matched-text "
    "length), ties go to Allow, unmatched paths and rule-less hosts "
    "are allowed; '*' wildcards and the '$' end anchor honored. "
    "Robots files are a per-HOST dimension, parsed driver-side "
    "(model-sized by construction) with patterns pre-compiled to "
    "regex IN PYTHON so both engines match the same literal strings; "
    "the corpus-sized URL side is touched by exactly one broadcast "
    "join + one window. Fixtures plant every decision shape: prefix "
    "disallow, longer-allow override, $ anchor hit and near-miss "
    "(/tmp vs /tmp2), nested longest-match, agent-group selection "
    "(otherbot's rules must NOT apply), and a no-rules host.",
)
def q_robots_gate(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents").filter(F.col("doc_id") < 300)
    urls = d.select(
        F.col("doc_id").alias("url_id"),
        F.concat(
            F.lit("h"),
            ((F.col("doc_id") / 6).cast("long") % 3).cast("string"),
        ).alias("host"),
        F.expr(_ROBOT_PATHS_SQL.replace(
            "CAST(doc_id % 6 AS INTEGER)", "CAST(doc_id % 6 AS INT)"
        )).alias("path"),
    )
    rules = local_rows_df(
        spark,
        _ROBOT_RULES, "host string, allow int, pattern string, "
        "regex string, plen int"
    )
    return tx.robots_match(urls, rules).orderBy("url_id")
