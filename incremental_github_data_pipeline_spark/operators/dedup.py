"""[EXT] Deduplication operators for LLM training-data pipelines
(SURVEY.md §2.10): exact, MinHash+LSH, SimHash, n-gram Jaccard, and
embedding-cosine near-dup.

Design for 100 TB:
- Signatures (minhash / simhash / fingerprints) are pure column
  expressions computed in the scan stage — no UDF, no extra pass.
- Candidate generation is always *bucketed* (LSH bands / simhash chunks)
  so the self-join shuffles on a bucket key instead of exploding into an
  O(n²) cross join. The only cross-document work happens inside buckets.
- Verification (true Jaccard / Hamming / cosine) runs only on candidate
  pairs, and pairs are canonicalized (id_a < id_b) to halve the work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pyspark.sql import types as T

from incremental_github_data_pipeline_spark.functions.scalar import let_
from incremental_github_data_pipeline_spark.operators.core import ensure_min_partitions
from incremental_github_data_pipeline_spark.operators.text import shingles, tokens
from incremental_github_data_pipeline_spark.sources.local import local_rows_df

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def content_key(content_cols: list[str]) -> Column:
    """128-bit content key: a struct of two independently-seeded
    xxhash64 values (the second mixes in a salt literal). 16 bytes on
    the shuffle wire; birthday-bound collision odds reach 50% only
    around 2⁶⁴ distinct documents, so the key is safe far past the
    ~5×10⁹-doc point where a single 64-bit hash starts colliding
    (50% at ~5×10⁹) — the 100 TB story holds."""
    cols = [F.col(c) for c in content_cols]
    return F.struct(
        F.xxhash64(*cols).alias("h1"),
        F.xxhash64(F.lit(0x9E3779B9), *cols).alias("h2"),
    )


def exact_dedup(df: DataFrame, content_cols: list[str], id_col: str) -> DataFrame:
    """Exact deduplication: group rows by content hash, keep the row with
    the smallest id (deterministic winner). One shuffle on the content
    hash — the 128-bit hash (see :func:`content_key`), not the (possibly
    huge) content, is the shuffle key.
    """
    h = content_key(content_cols)
    return (
        df.withColumn("_h", h)
        .withColumn("_keep", F.min(F.col(id_col)).over(Window.partitionBy("_h")))
        .filter(F.col(id_col) == F.col("_keep"))
        .drop("_h", "_keep")
    )


def exact_dup_groups(df: DataFrame, content_cols: list[str], id_col: str) -> DataFrame:
    """Duplicate *groups*: content hash → representative id + copy count.
    The audit twin of :func:`exact_dedup`. Collision bound per
    :func:`content_key` (128-bit key)."""
    h = content_key(content_cols)
    return (
        df.withColumn("_h", h)
        .groupBy("_h")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .drop("_h")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signature(text_col: Column | str, num_hashes: int = 32, k: int = 5) -> Column:
    """MinHash signature as an array<long>.

    Single pass over the document: shingle once, xxhash64 each shingle
    once (string work happens exactly once per shingle), then derive the
    ``num_hashes`` permutations by re-hashing the 8-byte shingle hash
    with per-function seeds. Both the shingle array and its hash array
    are let_-bound — without that, Catalyst inlines the tokenizer into
    every one of the ``num_hashes`` permutation subtrees and the
    interpreted HOF path re-tokenizes the document N times per row
    (observed 100x slowdown at sf0.1).

    The N minima fold in ONE aggregate pass over the hash array
    (``zip_with`` against a seed array updates all N accumulators per
    shingle) instead of N separate ``array_min(transform(...))``
    passes — bit-identical values (same xxhash64(hv, int-seed)
    lanes), measured 1.35× faster at 32 hashes and 1.7× at 64 (r13,
    VERDICT r12 residual: the incremental-LSH ingest constant
    factor lives here)."""
    seeds = F.array(*[F.lit(i) for i in range(num_hashes)])
    return let_(
        F.transform(shingles(text_col, k), lambda s: F.xxhash64(s)),
        lambda hashes: F.aggregate(
            hashes,
            # init = long MAX: min(MAX, xs) == min(xs) for every
            # non-empty hash array (shingles never yields an empty
            # array), so the fold is STRICTLY identical to the old
            # per-permutation array_min — a smaller sentinel could
            # leak into 1-shingle docs whose hashes all land above it
            F.array(
                *[F.lit(2**63 - 1).cast("long") for _ in range(num_hashes)]
            ),
            lambda acc, hv: F.zip_with(
                acc, seeds, lambda a, i: F.least(a, F.xxhash64(hv, i))
            ),
        ),
    )


def minhash_bands(sig_col: Column | str, bands: int, rows_per_band: int) -> Column:
    """LSH banding: split the signature into ``bands`` slices of
    ``rows_per_band`` and hash each slice → array of (band, bucket) keys.
    Two docs sharing any band bucket become a candidate pair."""
    sig = F.col(sig_col) if isinstance(sig_col, str) else sig_col
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    F.array_join(
                        F.transform(
                            F.slice(sig, b * rows_per_band + 1, rows_per_band),
                            lambda x: x.cast("string"),
                        ),
                        ",",
                    )
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 5,
) -> DataFrame:
    """MinHash-LSH candidate pairs (id_a < id_b, deduplicated).

    Pipeline: signature (map) → explode band buckets (map) → self-join on
    (band, bucket) (shuffle on bucket key) → distinct pairs. Estimated
    Jaccard from signature agreement is attached; callers verify with
    :func:`ngram_jaccard` when exactness matters.
    """
    rows_per_band = num_hashes // bands
    df = ensure_min_partitions(df)  # signature math must use all cores
    # Materialize once: the self-join needs signatures on BOTH sides and
    # broadcast on one side defeats ReusedExchange — without this the
    # (expensive) text hashing runs twice. Signatures are tiny relative
    # to the text (id + num_hashes longs), so this holds at any scale;
    # production pipelines write this frame out as the signature store.
    # localCheckpoint (not .persist()) because the frame outlives this
    # function lazily: persist() pins a CacheManager entry until an
    # explicit unpersist no caller can safely issue, while checkpoint
    # blocks are reference-counted by the ContextCleaner and freed when
    # the frame is garbage collected — no leak in long-lived sessions.
    sigs = df.select(
        F.col(id_col).alias("_id"),
        minhash_signature(F.col(text_col), num_hashes, k).alias("_sig"),
    ).localCheckpoint(eager=True)
    buckets = sigs.select(
        "_id",
        "_sig",
        F.explode(minhash_bands(F.col("_sig"), bands, rows_per_band)).alias("_bb"),
    ).select("_id", "_sig", F.col("_bb.band").alias("_band"), F.col("_bb.bucket").alias("_bucket"))
    a = buckets.alias("a")
    b = buckets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a._band") == F.col("b._band"))
            & (F.col("a._bucket") == F.col("b._bucket"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._sig").alias("_sig_a"),
            F.col("b._sig").alias("_sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = (
        F.size(
            F.filter(
                F.zip_with(F.col("_sig_a"), F.col("_sig_b"), lambda x, y: x == y),
                lambda eq: eq,
            )
        ).cast("double")
        / F.lit(num_hashes)
    )
    return pairs.withColumn("est_jaccard", est).drop("_sig_a", "_sig_b")


def minhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 5,
    verify: bool = True,
) -> DataFrame:
    """Near-dup removal: drop every doc that has a near-dup partner with
    a smaller id (min-id survivor rule; transitive chains collapse toward
    the smallest id in practice).

    ``verify=True`` (the default) confirms every LSH candidate with exact
    n-gram Jaccard before anything is dropped: the estimator from 32
    hashes has σ≈0.07 at threshold 0.8, so deleting on the estimate alone
    destroys borderline documents on noise. The verify stage runs only on
    candidate pairs (bucket-bounded, never O(n²)), so its cost is
    proportional to the duplicate rate, not the corpus.

    ``verify=False`` skips the exact check — acceptable only for
    non-destructive pre-filters where downstream re-checks survivors.
    """
    if verify:
        losers = (
            verified_near_dups(
                df,
                id_col,
                text_col,
                jaccard_threshold=threshold,
                k=k,
                num_hashes=num_hashes,
                bands=bands,
            )
            .select(F.col("id_b").alias(id_col))
            .distinct()
        )
    else:
        pairs = minhash_candidate_pairs(df, id_col, text_col, num_hashes, bands, k)
        losers = (
            pairs.filter(F.col("est_jaccard") >= threshold)
            .select(F.col("id_b").alias(id_col))
            .distinct()
        )
    return df.join(losers, on=id_col, how="left_anti")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(text_col: Column | str, bits: int = 64) -> Column:
    """64-bit SimHash over tokens: per-bit vote = Σ_tokens
    (bit(hash(token)) ? +1 : −1); simhash bit b set iff vote > 0.

    Token hashes are materialized once (let_-bound — see
    minhash_signature for why). r16 (guide §7.3, the r15
    bloom-literal lesson): the old form was ``bits`` SEPARATE
    array-aggregates (one per bit position, each iterating every token
    hash) — ~64× the expression-tree size, and the per-pass
    analyzer/optimizer walk over that tree dominated the lane's wall
    clock. Now ONE aggregate folds all ``bits`` vote counters at once
    (``zip_with`` against a single array<long> mask literal — bit b of
    hv tests as ``hv & mask_b ≠ 0``, exactly ``(hv >> b) & 1 = 1``
    including the sign bit, whose mask is the two's-complement min
    long), and a second ``aggregate`` ORs the winning masks together.
    Identical values bit-for-bit (pinned by
    test_dedup_similarity.py::test_simhash_formulation_identical);
    per-token arithmetic is the same 64 long ops — only the TREE
    shrank.
    """
    masks = F.lit(
        [(1 << b) if b < 63 else -(1 << 63) for b in range(bits)]
    ).cast("array<long>")
    zero = F.lit(0).cast("long")

    def votes_to_hash(h: Column) -> Column:
        votes = F.aggregate(
            h,
            F.array_repeat(F.lit(0), bits),
            lambda acc, hv: F.zip_with(
                acc,
                masks,
                lambda a, m: a
                + F.when(hv.bitwiseAND(m) != 0, 1).otherwise(-1),
            ),
        )
        return F.aggregate(
            F.zip_with(
                votes,
                masks,
                lambda v, m: F.when(v > 0, m).otherwise(zero),
            ),
            zero,
            lambda acc, x: acc.bitwiseOR(x),
        )

    return let_(
        F.transform(tokens(text_col), lambda w: F.xxhash64(w)), votes_to_hash
    )


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit simhashes (bit_count of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_candidate_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3, chunks: int = 4
) -> DataFrame:
    """SimHash near-dup candidates via the chunk pigeonhole: split the
    64-bit hash into ``chunks`` pieces; any pair within ``max_hamming``
    (< chunks) must agree on ≥1 chunk, so bucketing by (chunk_idx,
    chunk_value) finds all of them with a bucket-key shuffle instead of a
    cross join. Pairs are then verified with the true Hamming distance.
    """
    width = 64 // chunks
    df = ensure_min_partitions(df)  # signature math must use all cores
    # localCheckpoint: both self-join sides read the signatures, and the
    # blocks self-free on GC — see minhash_candidate_pairs for why not
    # .persist().
    h = df.select(
        F.col(id_col).alias("_id"), simhash(F.col(text_col)).alias("_sh")
    ).localCheckpoint(eager=True)
    chunk_arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("idx"),
                F.shiftright(F.col("_sh"), i * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("val"),
            )
            for i in range(chunks)
        ]
    )
    buckets = h.select("_id", "_sh", F.explode(chunk_arr).alias("_c")).select(
        "_id", "_sh", F.col("_c.idx").alias("_idx"), F.col("_c.val").alias("_val")
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a._idx") == F.col("b._idx"))
            & (F.col("a._val") == F.col("b._val"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            hamming64(F.col("a._sh"), F.col("b._sh")).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (verification + exact small-scale dedup)
# ---------------------------------------------------------------------------


def ngram_jaccard(text_a: Column, text_b: Column, k: int = 3) -> Column:
    """Exact token k-gram Jaccard similarity between two text columns.

    Shingle sets are let_-bound (computed once each) and |A∪B| is derived
    as |A|+|B|−|A∩B| so the expensive set ops run exactly once."""
    return let_(
        F.array_distinct(shingles(text_a, k)),
        lambda sa: let_(
            F.array_distinct(shingles(text_b, k)),
            lambda sb: let_(
                F.size(F.array_intersect(sa, sb)),
                lambda inter: let_(
                    F.size(sa) + F.size(sb) - inter,
                    lambda union: F.when(
                        union > 0, inter.cast("double") / union
                    ).otherwise(F.lit(0.0)),
                ),
            ),
        ),
    )


def verified_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    jaccard_threshold: float = 0.8,
    k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """MinHash-LSH candidates verified with exact n-gram Jaccard — the
    production near-dup pipeline: cheap recall stage, exact precision
    stage, both shuffle-bounded by bucket keys."""
    pairs = minhash_candidate_pairs(df, id_col, text_col, num_hashes, bands, k)
    docs = df.select(F.col(id_col), F.col(text_col))
    a = docs.select(
        F.col(id_col).alias("id_a"), F.col(text_col).alias("_text_a")
    )
    b = docs.select(
        F.col(id_col).alias("id_b"), F.col(text_col).alias("_text_b")
    )
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "jaccard", ngram_jaccard(F.col("_text_a"), F.col("_text_b"), k)
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "est_jaccard", "jaccard")
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------


def cosine_similarity(vec_a: Column, vec_b: Column) -> Column:
    """Cosine similarity of two array<double> columns as one expression
    (dot / (‖a‖·‖b‖)), all inside codegen."""
    dot = F.aggregate(
        F.zip_with(vec_a, vec_b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda v: F.sqrt(  # noqa: E731
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return dot / (norm(vec_a) * norm(vec_b))


def hyperplane_bits(
    vec_col: Column, n_planes: int, seed: int = 42
) -> Column:
    """Random-hyperplane sign bits as array<int>: bit p = sign of
    ⟨v, w_p⟩ where weight w_p[d] = xxhash64(seed, p, d)/2⁶³ ∈ [-1, 1) —
    hash-derived, identical on every executor, no RNG state to ship.
    Single pass: the vector is read once per plane over longs/doubles,
    all inside one expression (dims and planes are lambda variables)."""
    dim_idx = F.sequence(F.lit(0), F.size(vec_col) - 1)
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_planes - 1)),
        lambda p: F.when(
            F.aggregate(
                F.zip_with(
                    vec_col,
                    dim_idx,
                    lambda x, d: x
                    * (
                        F.xxhash64(F.lit(seed), p, d).cast("double")
                        / F.lit(float(2**63))
                    ),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            >= 0,
            1,
        ).otherwise(0),
    )


def embedding_near_dups(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-dup pairs above a cosine threshold: banded
    random-hyperplane LSH for candidates, exact cosine verification.

    Banding matters for recall: one 16-bit signature finds a
    cosine-0.95 pair with probability (1−θ/π)¹⁶ ≈ 0.19, while 4 bands
    of 4 bits reach 1−(1−(1−θ/π)⁴)⁴ ≈ 0.97 — the same
    band/bucket-join shape as MinHash-LSH, so the shuffle stays keyed
    on (band, bucket) and never goes quadratic.
    """
    df = ensure_min_partitions(df)  # plane projections must use all cores
    planes_per_band = n_planes // bands
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # localCheckpoint: both self-join sides read the signatures, and the
    # blocks self-free on GC — see minhash_candidate_pairs for why not
    # .persist().
    with_sig = df.select(
        F.col(id_col).alias("_id"),
        v.alias("_v"),
        hyperplane_bits(v, n_planes, seed).alias("_bits"),
    ).localCheckpoint(eager=True)
    band_keys = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    F.array_join(
                        F.transform(
                            F.slice(F.col("_bits"), b * planes_per_band + 1, planes_per_band),
                            lambda x: x.cast("string"),
                        ),
                        ",",
                    )
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    buckets = with_sig.select(
        "_id", "_v", F.explode(band_keys).alias("_bb")
    ).select(
        "_id", "_v", F.col("_bb.band").alias("_band"), F.col("_bb.bucket").alias("_bucket")
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a._band") == F.col("b._band"))
            & (F.col("a._bucket") == F.col("b._bucket"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            cosine_similarity(F.col("a._v"), F.col("b._v")).alias("cosine"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("cosine") >= threshold)
    )


# ---------------------------------------------------------------------------
# Cluster formation (pairs -> components -> canonical doc)
# ---------------------------------------------------------------------------


def gram_overlap_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 5
) -> DataFrame:
    """Deterministic near-dup pair list: documents sharing at least one
    token ``k``-gram, canonicalized ``id_a < id_b``. Unlike the LSH
    candidate generators this is hash-free (engine-portable), at the
    cost of shuffling one row per distinct gram per doc — the bucketed
    self-join shape is the same: cross-document work happens only inside
    a gram's posting list, never corpus × corpus."""
    grams = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(shingles(text_col, k))).alias("_sh"),
    )
    a, b = grams.alias("a"), grams.alias("b")
    return (
        a.join(b, (F.col("a._sh") == F.col("b._sh")) & (F.col("a._id") < F.col("b._id")))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )


def _local_union_find(edge_rows, id_a: str, id_b: str) -> dict:
    """Exact union-find with min-id roots over a collected (bounded)
    edge list. Works for any orderable id type (ints, uuid5 strings)."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in edge_rows:
        a, b = r[id_a], r[id_b]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # min id becomes the root → labels match the distributed
            # min-propagation fixed point
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return {x: find(x) for x in parent}


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
    local_threshold: int = 500_000,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components over an undirected pair list by iterative
    min-label propagation: every node's label converges to the minimum
    id in its component. Returns ``(id, component)``.

    This is the stage that turns near-dup PAIRS into dedup CLUSTERS so a
    canonical document (min id) can be kept per cluster — without it a
    chain a~b~c keeps b twice or drops both ends, depending on pair
    order.

    Hybrid execution: the pair list is verified-candidate-sized (near
    -dup pairs, not the corpus), so it is frequently SMALL even when the
    corpus is 100 TB. When the materialized edge count is at or below
    ``local_threshold`` (default 5×10⁵ edges — a few tens of MB, the
    same bounded-model class as the IVF centroid collect), the exact
    union-find runs on the driver in one pass: O(E α(E)) and zero
    per-round scheduling, instead of O(log d) rounds of shuffle joins
    whose fixed cost dominates below millions of edges. Above the
    threshold the distributed path runs:

    Scale shape: each round is a shuffle join on the node id, an
    algebraic aggregate, and a pointer-jump self-join; lineage is
    truncated every round with ``localCheckpoint`` so the plan stays
    O(1) deep. With path halving the propagation distance doubles each
    round, so rounds needed = O(log diameter) — chain-shaped components
    (the worst case for plain min-propagation) converge in a handful of
    rounds regardless of corpus size.
    Convergence detection counts rows whose label changed this round —
    type-agnostic, so it is correct for STRING ids (the engine's own
    uuid5 keys order lexicographically) where a numeric label-sum test
    would compare NULL==NULL and exit unconverged after one round.
    Both paths converge to the identical min-id labeling.

    Pass a dict as ``stats`` to receive execution telemetry:
    ``{"n_edges", "path" ("local"|"distributed"), "rounds"}`` — what
    scripts/scale_smoke.py reports for the SCALE.md round counts.
    """
    distinct_pairs = pairs.select(id_a, id_b).distinct().localCheckpoint(
        eager=True
    )
    n_edges = distinct_pairs.count()  # cheap: reads the checkpoint
    if stats is not None:
        stats["n_edges"] = n_edges
        stats["path"] = "local" if n_edges <= local_threshold else "distributed"
        stats["rounds"] = 0
    if n_edges <= local_threshold:
        labels = _local_union_find(distinct_pairs.collect(), id_a, id_b)
        spark = distinct_pairs.sparkSession
        id_type = distinct_pairs.schema[id_a].dataType
        schema = T.StructType(
            [
                T.StructField("id", id_type, False),
                T.StructField("component", id_type, False),
            ]
        )
        return local_rows_df(spark, list(labels.items()), schema)
    # Materialize the edge list once: every round joins against it, and
    # without truncation each round would re-run the (possibly
    # expensive) pair-generation lineage from scratch.
    edges = (
        distinct_pairs.select(
            F.col(id_a).alias("src"), F.col(id_b).alias("dst")
        )
        .unionAll(
            distinct_pairs.select(
                F.col(id_b).alias("src"), F.col(id_a).alias("dst")
            )
        )
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _round in range(max_iter):
        if stats is not None:
            stats["rounds"] = _round + 1
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("component").alias("_nmin"))
        )
        propagated = labels.join(
            neighbor_min, labels.id == neighbor_min.src, "left"
        ).select(
            "id",
            F.col("component").alias("_old"),
            F.least(
                F.col("component"), F.coalesce(F.col("_nmin"), F.col("component"))
            ).alias("_prop"),
        )
        # Pointer jump (path halving): follow the new label's own new
        # label, so propagation distance DOUBLES per round — O(log d)
        # rounds on a diameter-d component instead of O(d). Each round
        # is a full shuffle of the label table, so on chain-shaped
        # components this halves-and-halves the shuffle count (8 -> 4
        # rounds on the sf0.1 gram-overlap graph). Labels only ever
        # decrease toward the component minimum, so the changed==0
        # fixed point is the same min-id labeling.
        ptr = propagated.select(
            F.col("id").alias("_pid"), F.col("_prop").alias("_pcomp")
        )
        relabeled = (
            propagated.join(ptr, propagated._prop == ptr._pid, "left")
            .select(
                "id",
                "_old",
                F.least(
                    F.col("_prop"), F.coalesce(F.col("_pcomp"), F.col("_prop"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            relabeled.filter(F.col("component") != F.col("_old"))
            .agg(F.count(F.lit(1)))
            .collect()[0][0]
        )
        labels = relabeled.drop("_old")
        if changed == 0:
            break
    return labels


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Full cluster view: every doc mapped to its component (singletons
    keep their own id), plus the keep/drop verdict — ``keep`` iff the
    doc is its component's minimum id (the canonical survivor)."""
    cc = connected_components(pairs, id_a=id_a, id_b=id_b)
    return (
        df.select(F.col(id_col))
        .join(cc.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("component"),
        )
        .withColumn("keep", (F.col(id_col) == F.col("component")).cast("int"))
    )


def cluster_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Leakage-safe train/val/test split: every member of a near-dup
    CLUSTER lands in the same split. A per-document split
    (text.assign_split) puts one near-duplicate in train and its twin
    in test — the classic contamination bug that silently inflates
    eval scores; splitting on the cluster representative (the
    component's min id; singletons use their own id) makes that
    impossible by construction. Same modular-arithmetic determinism as
    assign_split: rep % 100 < train_pct → train, < train+val → val,
    else test — stable across runs, engines, and corpus growth.

    Scale shape: components come from the verified near-dup PAIR list
    (candidate-sized, not corpus-sized); the corpus's only wide op is
    the left join onto the component map. Returns (id, rep, split).
    """
    from incremental_github_data_pipeline_spark.operators.text import (
        _id_bucket,
    )

    cc = connected_components(pairs, id_a=id_a, id_b=id_b)
    rep = F.coalesce("component", F.col(id_col))
    b = _id_bucket(rep, 100)
    return (
        df.select(F.col(id_col))
        .join(cc.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            id_col,
            rep.alias("rep"),
            F.when(b < train_pct, "train")
            .when(b < train_pct + val_pct, "val")
            .otherwise("test")
            .alias("split"),
        )
    )


def dedup_against_corpus(
    new_df: DataFrame,
    corpus_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Incremental dedup: drop incoming docs that share any token
    ``k``-gram with the existing corpus (exact dups are a subset —
    identical text shares every gram). Returns the surviving rows of
    ``new_df``.

    Scale shape — the corpus never shuffles its ROWS: the incoming
    batch is normally the small side (that's what incremental means),
    so AQE broadcasts its distinct gram set and the corpus is scanned
    map-side; only grams that actually collide (⊆ the batch's gram
    set) flow back to flag batch docs. The broadcasts are AQE-CHOSEN,
    not hint-forced: a batch too big to broadcast (a 100 GB crawl
    increment against a 100 TB corpus) degrades to a gram equi-join —
    the corpus shuffles 16-byte-ish gram keys once instead of the
    driver dying building an over-budget broadcast table (observed at
    the 100x scale sweep when the hint was forced). Rerunning is
    idempotent: survivors re-checked against the same corpus survive
    again.
    """
    # Materialize the batch grams once: three consumers below (gram set,
    # flag join, and the broadcast build) would otherwise each re-run
    # the batch scan + shingle explode. The batch is the small side by
    # definition, so this is bounded state. localCheckpoint, not
    # .persist() — see minhash_candidate_pairs for the leak rationale.
    new_grams = new_df.select(
        F.col(id_col).alias("_nid"),
        F.explode(F.array_distinct(shingles(text_col, k))).alias("_sh"),
    ).localCheckpoint(eager=True)
    new_gram_set = new_grams.select("_sh").distinct()
    # grams of the batch that exist somewhere in the corpus
    collided = (
        corpus_df.select(
            F.explode(F.array_distinct(shingles(text_col, k))).alias("_sh")
        )
        .join(new_gram_set, "_sh", "left_semi")
        .distinct()
    )
    flagged = (
        new_grams.join(collided, "_sh", "left_semi")
        .select(F.col("_nid").alias(id_col))
        .distinct()
    )
    return new_df.join(flagged, id_col, "left_anti")


def contained_docs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    short_doc_lane: bool = True,
) -> DataFrame:
    """Containment dedup: find documents whose text appears VERBATIM
    inside another document (quotes, excerpts, re-posted snippets —
    near-dup metrics like Jaccard under-score these because the
    container's extra content dilutes the similarity). Returns
    ``(contained_id, container_id)`` where the contained doc is the
    droppable one; for byte-identical texts the larger id is reported
    as contained (deterministic canonical winner, matching
    exact_dedup's min-id rule).

    CONTRACT — containment is TOKEN-ALIGNED: texts are whitespace-
    tokenized and A is contained in B iff A's token sequence appears
    as a contiguous run of B's tokens. Character-level substrings that
    cross token boundaries ('bc def' inside 'abc def') are
    intentionally OUT of contract — they are not quotes/excerpts, and
    no gram-posting scheme can find them without per-character work.
    Both the candidate stage and the verification use the same
    tokenization, so the contract is self-consistent (the r3 version
    verified with raw ``contains``, which silently widened the
    semantics the candidates could never deliver — the recall gap
    flagged in round-3 ADVICE).

    Docs with fewer than ``k`` tokens cannot produce k-gram
    candidates; ``short_doc_lane=True`` (default) routes them through
    an EQUI-join instead of silently missing them: a doc with n < k
    tokens is contained in B iff its whole normalized text equals one
    of B's token n-grams. Only gram lengths that actually occur among
    the short docs explode (present lengths ride one bounded
    collect_set row; containers fan out by row, not by token, before
    the pruning equi-join), so the lane's cost tracks the short-doc
    tail and is FREE when the tail is empty. No forced broadcast of
    anything data-sized, no nested-loop join (plan-asserted in
    test_plans.py::test_heavy_doc_joins_no_forced_broadcast). Disable
    it when short docs were already filtered upstream.

    Scale shape — never corpus × corpus on the main lane: candidates
    come from the gram posting lists (a doc can only be contained in a
    doc that shares ALL of its k-grams), so the self-join is bucketed
    by gram and the full-coverage filter (n_shared == n_grams_a)
    prunes to candidate pairs before the exact verification runs on
    texts — the recall-stage/precision-stage split of
    verified_near_dups applied to substring containment.
    """
    toks = tokens(F.col(text_col))
    # Every lane below (grams a/b sides, gram counts, both verify text
    # joins, the short-doc equi lane and its length set) derives from
    # this tokenized frame — materialize it ONCE so the source scans
    # exactly once (the r10-audited plan re-read the parquet 16x, one
    # per consumer: a genuine 100 TB killer). One corpus-sized pin vs
    # 16 corpus scans is the same trade the seasonal-anomaly fix made.
    base = df.select(
        F.col(id_col).alias("_id"),
        F.array_join(toks, " ").alias("_norm"),
        F.size(toks).alias("_nt"),
    ).localCheckpoint(eager=True)
    padded = lambda c: F.concat(F.lit(" "), c, F.lit(" "))  # noqa: E731

    def tie_rules(pairs: DataFrame) -> DataFrame:
        """Token-aligned verification + deterministic winner rules over
        frames with (_ida, _norma, _idb, _normb)."""
        return pairs.filter(
            F.contains(padded(F.col("_normb")), padded(F.col("_norma")))
        ).filter(
            (F.length("_norma") < F.length("_normb"))
            | (
                (F.col("_norma") == F.col("_normb"))
                & (F.col("_ida") > F.col("_idb"))
            )
        )

    long_side = base.filter(F.col("_nt") >= k)
    grams = long_side.select(
        "_id",
        F.explode(F.array_distinct(shingles(F.col("_norm"), k))).alias("_sh"),
    )
    gram_counts = grams.groupBy("_id").agg(
        F.count(F.lit(1)).alias("_n_grams")
    )
    a, b = grams.alias("a"), grams.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a._sh") == F.col("b._sh"))
            & (F.col("a._id") != F.col("b._id")),
        )
        .groupBy(F.col("a._id").alias("_ida"), F.col("b._id").alias("_idb"))
        .agg(F.count(F.lit(1)).alias("_n_shared"))
    )
    candidates = shared.join(
        gram_counts.withColumnRenamed("_id", "_ida"), "_ida"
    ).filter(F.col("_n_shared") == F.col("_n_grams"))
    verified = tie_rules(
        candidates.join(
            long_side.select(
                F.col("_id").alias("_ida"), F.col("_norm").alias("_norma")
            ),
            "_ida",
        ).join(
            long_side.select(
                F.col("_id").alias("_idb"), F.col("_norm").alias("_normb")
            ),
            "_idb",
        )
    ).select("_ida", "_idb")

    if short_doc_lane:
        # Equi-join lane, OUTPUT-SENSITIVE in the short-doc tail: a doc
        # with n < k tokens is contained in B iff its WHOLE normalized
        # text equals one of B's token n-grams — but only gram lengths
        # that actually occur among the short docs need exploding. The
        # first r5 cut exploded every container's 1..k-1-grams
        # unconditionally, a (k-1)x token fan-out paid even with ZERO
        # short docs (BENCH r5: 2.25s -> 4.04s at sf0.1 on a corpus
        # with no sub-k docs). Now: present lengths come from ONE
        # global collect_set row (bounded by k-1 integers BY
        # CONSTRUCTION, so its broadcast is scale-safe — the plan test
        # recognizes global aggregates as bounded), containers fan out
        # by ROW to candidate lengths (<= k-1 per row, pre-gram), the
        # broadcast equi-join prunes to present lengths, and only then
        # do grams explode. No short docs -> empty lens -> the lane
        # costs nothing. No nested-loop join, no corpus-sized
        # broadcast (the r4 version broadcast the short set against
        # every container — OOM by design if the tail was ever large).
        shorts = base.filter((F.col("_nt") >= 1) & (F.col("_nt") < k)).select(
            F.col("_id").alias("_ida"), F.col("_norm").alias("_norma")
        )
        lens = (
            base.filter((F.col("_nt") >= 1) & (F.col("_nt") < k))
            .agg(F.collect_set("_nt").alias("_lens"))
            .select(F.explode("_lens").alias("_glen"))
        )
        cand = base.filter(F.col("_nt") >= 1).select(
            F.col("_id").alias("_idb"),
            F.col("_norm").alias("_normb"),
            F.explode(
                F.sequence(F.lit(1), F.least(F.col("_nt"), F.lit(k - 1)))
            ).alias("_glen"),
        )
        present = cand.join(F.broadcast(lens), "_glen")
        t = F.split(F.col("_normb"), " ")
        gram_arr = F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(t) - F.col("_glen") + 1),
                lambda i: F.array_join(F.slice(t, i, F.col("_glen")), " "),
            )
        )
        short_grams = present.select(
            "_idb", "_normb", F.explode(gram_arr).alias("_g")
        )
        short_pairs = tie_rules(
            shorts.join(
                short_grams,
                (F.col("_norma") == F.col("_g"))
                & (F.col("_ida") != F.col("_idb")),
            )
        ).select("_ida", "_idb")
        verified = verified.unionByName(short_pairs)

    return verified.select(
        F.col("_ida").alias("contained_id"),
        F.col("_idb").alias("container_id"),
    )


# ---------------------------------------------------------------------------
# Bloom-filter membership pre-filter (round 4)
# ---------------------------------------------------------------------------


def build_bloom(
    df: DataFrame, key_col: str, n_bits: int = 1 << 16, n_hashes: int = 4
) -> list[int]:
    """Build a Bloom filter over a key column: the classic 100 TB
    join-pruning lever — broadcast ``n_bits`` BITS of corpus membership
    instead of the corpus keys themselves, and skip the shuffle/join
    for every row the filter rejects (no false negatives, tunable false
    positives: ~(1-e^(-kn/m))^k).

    Distributed build: each row's ``n_hashes`` bit positions are
    computed map-side (seeded xxhash64 mod n_bits) and DISTINCT-ed —
    the collected set is bounded by ``n_bits`` (the filter's own size,
    a few KB; same bounded-model class as the IVF centroids), NOT by
    the row count. Returns the filter as ``n_bits/64`` little-endian
    long words.
    """
    if n_bits % 64:
        raise ValueError("n_bits must be a multiple of 64")
    positions = (
        df.select(
            F.explode(
                F.array(
                    *[
                        F.pmod(
                            F.xxhash64(F.col(key_col), F.lit(i)), F.lit(n_bits)
                        )
                        for i in range(n_hashes)
                    ]
                )
            ).alias("p")
        )
        .distinct()
        .collect()
    )
    words = [0] * (n_bits // 64)
    for r in positions:
        words[r["p"] // 64] |= 1 << (r["p"] % 64)
    return words


def bloom_might_contain(
    key_col, words: list[int], n_bits: int, n_hashes: int = 4
) -> Column:
    """Membership-test expression against a built Bloom filter: all
    ``n_hashes`` seeded positions must be set. Pure codegen arithmetic
    (element_at + shift + bitwise AND on the broadcast literal word
    array) — no join, no UDF, evaluated in the scan stage."""
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    # r15: ONE array<long> literal instead of a CreateArray of
    # n_bits/64 literal children — a 1<<16-bit filter put ~1k extra
    # expression nodes in the plan, and driver-side analysis of that
    # tree dominated the query's wall at bench scale (guide §7.3:
    # plan-size work is single-threaded driver time).
    arr = F.lit(
        [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    ).cast("array<long>")
    checks = []
    for i in range(n_hashes):
        pos = F.pmod(F.xxhash64(c, F.lit(i)), F.lit(n_bits))
        word = F.element_at(arr, (pos / 64).cast("int") + 1)
        # call_function: the Python-level F.shiftleft only accepts an
        # int literal shift amount, the SQL function takes expressions
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), F.pmod(pos, F.lit(64)).cast("int")
        )
        checks.append(word.bitwiseAND(bit) != 0)
    out = checks[0]
    for chk in checks[1:]:
        out = out & chk
    return out


def bloom_prefilter_new(
    batch: DataFrame,
    corpus: DataFrame,
    key_col: str = "text",
    n_bits: int = 1 << 16,
    n_hashes: int = 4,
) -> DataFrame:
    """Split an incoming batch against a corpus Bloom filter: rows whose
    key the filter rejects are DEFINITELY new (no false negatives) and
    skip the expensive exact-membership join entirely; only the
    ``maybe``-flagged remainder needs the corpus lookup. At a 1%
    false-positive rate this prunes ~99% of the join input when the
    batch is mostly-new — the normal ingest case.

    Returns ``batch`` plus a ``bloom_maybe`` boolean column."""
    words = build_bloom(corpus, key_col, n_bits=n_bits, n_hashes=n_hashes)
    return batch.withColumn(
        "bloom_maybe", bloom_might_contain(key_col, words, n_bits, n_hashes)
    )


def minhash_join(
    left: DataFrame,
    right: DataFrame,
    id_left: str = "id_l",
    id_right: str = "id_r",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 5,
    threshold: float | None = 0.8,
) -> DataFrame:
    """Cross-corpus near-dup JOIN: LSH candidates between two DIFFERENT
    frames — the batch-vs-reference shape (dedup a new crawl against the
    existing training corpus, or decontaminate against a benchmark set)
    where a self-join is wrong because within-side pairs don't matter.

    Same banding as :func:`minhash_candidate_pairs`, but the
    (band, bucket) equi-join runs LEFT vs RIGHT, so cost is
    output-sensitive in the cross matches only — each side's internal
    near-dups never materialize. With ``threshold`` set, candidates are
    verified with exact gram Jaccard (texts re-joined for candidates
    ONLY — bounded by the candidate count, not the corpus); ``None``
    returns unverified candidates with the signature estimate.
    Returns ``(id_left, id_right, est_jaccard[, jaccard])``.
    """
    rows_per_band = num_hashes // bands

    def _buckets(df, id_col):
        sigs = ensure_min_partitions(df).select(
            F.col(id_col).alias("_id"),
            minhash_signature(F.col(text_col), num_hashes, k).alias("_sig"),
        ).localCheckpoint(eager=True)
        return sigs.select(
            "_id",
            "_sig",
            F.explode(
                minhash_bands(F.col("_sig"), bands, rows_per_band)
            ).alias("_bb"),
        ).select(
            "_id",
            "_sig",
            F.col("_bb.band").alias("_band"),
            F.col("_bb.bucket").alias("_bucket"),
        )

    a = _buckets(left, id_left).alias("a")
    b = _buckets(right, id_right).alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a._band") == F.col("b._band"))
            & (F.col("a._bucket") == F.col("b._bucket")),
        )
        .select(
            F.col("a._id").alias(id_left),
            F.col("b._id").alias(id_right),
            F.col("a._sig").alias("_sig_a"),
            F.col("b._sig").alias("_sig_b"),
        )
        .dropDuplicates([id_left, id_right])
    )
    est = (
        F.size(
            F.filter(
                F.zip_with(F.col("_sig_a"), F.col("_sig_b"), lambda x, y: x == y),
                lambda eq: eq,
            )
        ).cast("double")
        / F.lit(num_hashes)
    )
    cands = pairs.withColumn("est_jaccard", est).drop("_sig_a", "_sig_b")
    if threshold is None:
        return cands
    return (
        cands.join(
            left.select(F.col(id_left), F.col(text_col).alias("_tl")), id_left
        )
        .join(
            right.select(F.col(id_right), F.col(text_col).alias("_tr")),
            id_right,
        )
        .withColumn("jaccard", ngram_jaccard(F.col("_tl"), F.col("_tr"), k=k))
        .filter(F.col("jaccard") >= threshold)
        .select(id_left, id_right, "est_jaccard", "jaccard")
    )


# ---------------------------------------------------------------------------
# AllPairs / prefix-filtered EXACT set-similarity join — the exact
# counterpart to the LSH lanes above: no recall loss, candidates bounded
# by the RAREST tokens of each document (Bayardo et al., WWW'07 shape).
# ---------------------------------------------------------------------------


def allpairs_jaccard_join(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold_pct: int = 70,
):
    """Exact token-set Jaccard join at ``threshold_pct/100`` via prefix
    filtering: order each document's distinct tokens globally by
    (document-frequency, token) ascending; a pair at Jaccard >= t MUST
    share a token within each side's first ``|x| - ceil(t*|x|) + 1``
    tokens (pigeonhole on the rarest tokens), so the candidate join runs
    only on prefix postings — short lists by construction, because the
    prefix holds the rarest vocabulary. Verification computes the exact
    intersection per candidate pair (cost bounded by candidates, never
    corpus x corpus) and keeps pairs passing the INTEGER threshold test
    ``100*inter >= pct*union`` — no float compare anywhere; the emitted
    ``jaccard`` is one IEEE division of exact ints.

    LOSSLESS by theorem, unlike MinHash banding — the output is the
    complete truth set, which is what makes the oracle an equality
    check rather than a recall bound. Returns ``(id_a, id_b, jaccard)``
    with ``id_a < id_b``.

    Shuffles: token df aggregate, per-doc ranking window, prefix
    posting self-join, candidate-bounded verify join. Prefix length
    uses ``(pct*size + 99) div 100`` integral ceil — no float detour.
    """
    from incremental_github_data_pipeline_spark.operators.text import tokens

    # Five consumers (df counts, the ranked window, doc sizes, and both
    # verify-intersection joins) — materialize the exploded token table
    # ONCE. The r10-audited plan re-read the source parquet 16x, once
    # per consumer; at 100 TB the corpus re-scans dominate everything
    # else in the query. Same discipline as contained_docs above.
    toks = (
        df.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(
            F.col(id_col).alias("_id"),
            F.explode(F.array_distinct(tokens(text_col))).alias("_tok"),
        )
        .localCheckpoint(eager=True)
    )
    dfreq = toks.groupBy("_tok").agg(F.count(F.lit(1)).alias("_df"))
    w_doc = Window.partitionBy("_id").orderBy("_df", "_tok")
    ranked = (
        toks.join(dfreq, "_tok")
        .withColumn("_pos", F.row_number().over(w_doc))
        .withColumn("_size", F.count(F.lit(1)).over(Window.partitionBy("_id")))
    )
    # The prefix postings self-join consumes this twice; pin it so the
    # df-join + per-doc window run once, not once per join side. Small
    # by construction — prefixes hold only each doc's rarest tokens.
    prefix = ranked.filter(
        F.col("_pos")
        <= F.col("_size")
        - F.expr(f"({threshold_pct} * _size + 99) div 100")
        + F.lit(1)
    ).select("_id", "_tok").localCheckpoint(eager=True)
    cand = (
        prefix.select(F.col("_id").alias("id_a"), "_tok")
        .join(prefix.select(F.col("_id").alias("id_b"), "_tok"), "_tok")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sizes = toks.groupBy("_id").agg(F.count(F.lit(1)).alias("_n"))
    inter = (
        cand.join(
            toks.select(F.col("_id").alias("id_a"), "_tok"), "id_a"
        )
        .join(
            toks.select(F.col("_id").alias("id_b"), "_tok"),
            ["id_b", "_tok"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_ni"))
    )
    return (
        inter.join(sizes.withColumnRenamed("_id", "id_a").withColumnRenamed("_n", "_na"), "id_a")
        .join(sizes.withColumnRenamed("_id", "id_b").withColumnRenamed("_n", "_nb"), "id_b")
        .filter(
            100 * F.col("_ni")
            >= threshold_pct * (F.col("_na") + F.col("_nb") - F.col("_ni"))
        )
        .select(
            "id_a",
            "id_b",
            (
                F.col("_ni").cast("double")
                / (F.col("_na") + F.col("_nb") - F.col("_ni")).cast("double")
            ).alias("jaccard"),
        )
    )


def keep_best_of_cluster(
    df: DataFrame,
    components: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup dedup that keeps the BEST copy per cluster (r13), not
    the first: real curation pipelines keep the highest-quality
    spelling of a duplicated page (longest extraction, best quality
    score), while keep-first keeps whichever arrived first.
    ``components`` is :func:`connected_components` output
    ``(id, component)``; rows absent from it are singletons and keep
    themselves. Winner per cluster = max ``score_col``, ties to the
    SMALLEST id — deterministic, so the surviving set hash-compares
    cross-engine. Returns the full surviving rows plus ``component``
    and ``n_docs`` (cluster size).

    Scale shape: one left join against the (pair-list-sized, much
    smaller than the corpus) component map + one MAX_BY aggregate
    whose ordering key is ``struct(score, -id)`` ONLY — the payload
    row rides outside the comparison (ADVICE r13), so rows may carry
    non-orderable columns (maps, binaries inside arrays, …) freely.
    The aggregate is algebraic, so it map-combines and salts cleanly
    (the same skew posture as ``skew.salted_keep_first``); no window,
    no per-cluster sort. Singleton components reuse the row's own id
    as the label — collision-free because a component label is the
    min id of a CLUSTERED doc, and singletons are by definition not
    clustered.

    Contract: ``id_col`` must be an integral/decimal column (the
    tie-break negates it; enforced loudly here, not left to an
    analysis error). Negation happens on the DECIMAL(38,0) lattice so
    ``Long.MIN_VALUE`` cannot overflow."""
    from pyspark.sql.types import DecimalType, IntegralType

    id_type = df.schema[id_col].dataType
    if not isinstance(id_type, (IntegralType, DecimalType)):
        raise TypeError(
            f"keep_best_of_cluster: id_col {id_col!r} must be an "
            f"integral or decimal column (tie-break negates it); got "
            f"{id_type.simpleString()}"
        )
    labeled = df.join(
        components.withColumnRenamed("id", id_col), id_col, "left"
    ).withColumn(
        "_comp", F.coalesce(F.col("component"), F.col(id_col))
    )
    order_key = F.struct(
        F.col(score_col).alias("_s"),
        (-F.col(id_col).cast("decimal(38,0)")).alias("_negid"),
    )
    best = labeled.groupBy("_comp").agg(
        F.max_by(
            F.struct(*[F.col(c) for c in df.columns]), order_key
        ).alias("_row"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )
    return best.select(
        F.col("_row.*"),
        F.col("_comp").alias("component"),
        "n_docs",
    )
