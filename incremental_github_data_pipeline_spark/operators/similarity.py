"""[EXT] Similarity search over embedding columns (SURVEY.md §2.10).

Two tiers, mirroring how vector search actually scales:

- :func:`cosine_topk_bruteforce` — exact top-k. The query set broadcasts
  (it's small); the corpus streams through map tasks computing dot
  products in codegen; a window keeps the per-query top-k. No corpus
  shuffle at any size — the classic "brute force is the baseline and is
  often fine" path (cf. PAPERS.md ICDE'21 REPOSE discussion).
- :func:`ivf_topk` — IVF-style approximate path: k-means-lite centroid
  assignment (deterministic seeded centroid pick), probe the ``n_probe``
  nearest cells only. Corpus is partitioned by cell once (one shuffle at
  build), every query then touches a fraction of the corpus. This is the
  100 TB path: the scan cost per query drops by ×(cells/n_probe).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


from incremental_github_data_pipeline_spark.functions.scalar import let_

from incremental_github_data_pipeline_spark.operators.core import ensure_min_partitions
from incremental_github_data_pipeline_spark.operators.dedup import cosine_similarity
from incremental_github_data_pipeline_spark.sources.local import local_rows_df


def as_double_vec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str,
    query_id: str,
    vec_col: str,
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k: broadcast queries × streamed corpus → window
    top-k per query. Returns (query_id, corpus_id, cosine, rank)."""
    corpus = ensure_min_partitions(corpus)  # dot products must use all cores
    c = corpus.select(
        F.col(corpus_id).alias("_cid"), as_double_vec(vec_col).alias("_cv")
    )
    q = queries.select(
        F.col(query_id).alias("_qid"), as_double_vec(vec_col).alias("_qv")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        F.col("_qid").alias(query_id),
        F.col("_cid").alias(corpus_id),
        cosine_similarity(F.col("_cv"), F.col("_qv")).alias("cosine"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine").desc(), F.col(corpus_id)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy(query_id, "rank")
    )


def pick_centroids(
    df: DataFrame, vec_col: str, n_cells: int, id_col: str, seed: int = 42
) -> list:
    """IVF build step 1: ``n_cells`` deterministic seed centroids
    (hash-sampled rows — k-means init without iterative refinement; good
    cell balance on normalized synthetic embeddings). Collected to the
    driver once: the centroid set is a MODEL (n_cells × dim floats),
    not data — it ships to executors as literals."""
    rows = (
        df.select(F.col(id_col).alias("_cent_id"), as_double_vec(vec_col).alias("_cent"))
        .withColumn("_r", F.xxhash64(F.col("_cent_id"), F.lit(seed)))
        .orderBy("_r")
        .limit(n_cells)
        .select("_cent")
        .collect()
    )
    return [(i, r["_cent"]) for i, r in enumerate(rows)]


def _centroid_literal(cent_rows: list):
    # r15: one array<double> literal per centroid instead of dim
    # literal children each — for 16 cells x 64 dims that is ~48
    # expression nodes instead of ~1k, cutting driver-side plan
    # analysis time (guide §7.3).
    return F.array(
        *[
            F.struct(
                F.lit(cell).alias("cell"),
                F.lit([float(x) for x in cent])
                .cast("array<double>")
                .alias("cent"),
            )
            for cell, cent in cent_rows
        ]
    )


def assign_cells(
    df: DataFrame,
    vec_col: str,
    n_cells: int,
    id_col: str,
    seed: int = 42,
    refine_iters: int = 0,
) -> tuple[DataFrame, list]:
    """IVF build step 2: assign every vector to its nearest centroid.
    Returns (assigned corpus, centroid rows) — centroids are picked and
    collected exactly once. ``refine_iters`` > 0 runs that many Lloyd
    iterations (:func:`refine_centroids`) over the seeds first."""
    cent_rows = pick_centroids(df, vec_col, n_cells, id_col, seed)
    if refine_iters > 0:
        cent_rows = refine_centroids(df, vec_col, cent_rows, refine_iters)
    cent_array = _centroid_literal(cent_rows)
    v = as_double_vec(vec_col)
    best = F.array_max(
        F.transform(
            cent_array,
            lambda s: F.struct(
                cosine_similarity(v, s["cent"]).alias("sim"), s["cell"].alias("cell")
            ),
        )
    )
    assigned = df.withColumn("_cell", best["cell"])
    return assigned, cent_rows


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str,
    query_id: str,
    vec_col: str,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    refine_iters: int = 0,
) -> DataFrame:
    """Approximate top-k: probe only the ``n_probe`` nearest IVF cells
    per query. Join key is the cell id, so the per-query work is
    |corpus| * n_probe / n_cells instead of |corpus|. ``refine_iters``
    Lloyd iterations tighten the cells (better recall at the same
    n_probe) for a per-iteration cost of one (cell, dim) shuffle."""
    corpus = ensure_min_partitions(corpus)  # cell assignment must use all cores
    assigned, cent_rows = assign_cells(
        corpus, vec_col, n_cells, corpus_id, seed, refine_iters
    )
    cent_array = _centroid_literal(cent_rows)
    qv = as_double_vec(vec_col)
    probes = F.slice(
        F.reverse(
            F.array_sort(
                F.transform(
                    cent_array,
                    lambda s: F.struct(
                        cosine_similarity(qv, s["cent"]).alias("sim"),
                        s["cell"].alias("cell"),
                    ),
                )
            )
        ),
        1,
        n_probe,
    )
    q = queries.select(
        F.col(query_id).alias("_qid"),
        qv.alias("_qv"),
        F.explode(F.transform(probes, lambda s: s["cell"])).alias("_cell"),
    )
    c = assigned.select(
        F.col(corpus_id).alias("_cid"), as_double_vec(vec_col).alias("_cv"), "_cell"
    )
    scored = c.join(F.broadcast(q), "_cell").select(
        F.col("_qid").alias(query_id),
        F.col("_cid").alias(corpus_id),
        cosine_similarity(F.col("_cv"), F.col("_qv")).alias("cosine"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy(query_id, "rank")
    )


def cosine_topk_arrow(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str,
    query_id: str,
    vec_col: str,
    k: int = 10,
) -> DataFrame:
    """Arrow/numpy brute-force top-k — the vectorized fast lane.

    The expression path (:func:`cosine_topk_bruteforce`) is pure-plan
    and portable, but higher-order functions evaluate interpreted; for
    heavy vector math the idiomatic Spark answer is an Arrow-batched
    ``mapInPandas`` stage doing the linear algebra in BLAS:

    - the (small) query matrix broadcasts to executors once,
    - each corpus partition computes a dense (batch × queries) cosine
      matrix with one matmul and keeps its LOCAL top-k per query,
    - a final window over ≤ partitions·k·|queries| candidates picks the
      global top-k — the corpus is never shuffled.

    Same contract as the expression path: (query_id, corpus_id, cosine,
    rank), ids emitted as long.
    """
    import numpy as np
    import pandas as pd

    q_rows = queries.select(F.col(query_id), F.col(vec_col)).collect()
    qids = np.array([r[0] for r in q_rows], dtype="int64")
    qm = np.array([r[1] for r in q_rows], dtype="float64")
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)
    bc = corpus.sparkSession.sparkContext.broadcast((qids, qm))

    def topk_batches(batches):
        b_qids, b_qm = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            cm = np.array(pdf[vec_col].tolist(), dtype="float64")
            cm /= np.linalg.norm(cm, axis=1, keepdims=True)
            sims = cm @ b_qm.T  # (batch, n_queries)
            cids = pdf[corpus_id].to_numpy(dtype="int64")
            kk = min(k, len(cids))
            # argpartition: O(batch) per query instead of a full sort
            top = np.argpartition(-sims, kk - 1, axis=0)[:kk, :]
            out_q, out_c, out_s = [], [], []
            for j in range(sims.shape[1]):
                idx = top[:, j]
                out_q.extend([b_qids[j]] * len(idx))
                out_c.extend(cids[idx])
                out_s.extend(sims[idx, j])
            yield pd.DataFrame(
                {query_id: out_q, corpus_id: out_c, "cosine": out_s}
            )

    candidates = ensure_min_partitions(corpus).mapInPandas(
        topk_batches, f"{query_id} long, {corpus_id} long, cosine double"
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col(corpus_id))
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy(query_id, "rank")
    )


def l2_norm(vec: Column | str) -> Column:
    """Vector L2 norm as a pure column expression. Squares accumulate in
    double with a fixed left-to-right order, so the result is bit-exact
    across engines (verified vs DuckDB list_reduce) — safe to use in
    oracle-checked pipelines, not just approximate ones."""
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.sqrt(
        F.aggregate(
            v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def l2_normalize(vec: Column | str) -> Column:
    """Unit-normalize an embedding (zero vectors pass through unchanged
    rather than dividing by zero) — the prep step that turns cosine
    top-k into dot-product top-k."""
    v = F.col(vec) if isinstance(vec, str) else vec
    return let_(
        l2_norm(v),
        lambda n: F.when(
            n > 0, F.transform(v, lambda x: x.cast("double") / n)
        ).otherwise(F.transform(v, lambda x: x.cast("double"))),
    )


# ---------------------------------------------------------------------------
# int8 quantized lane: 4x memory vs float32 (the knob that decides
# whether a 100 TB embedding corpus fits the cluster's RAM tier)
# ---------------------------------------------------------------------------

INT8_MAX = 127


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "q",
    scale_col: str = "q_scale",
) -> DataFrame:
    """Symmetric per-vector int8 quantization of the L2-NORMALIZED
    embedding: ``scale = 127 / max|v̂|``, ``q[d] = floor(v̂[d] * scale)``.

    ``floor`` — not round — because floor has no tie cases: any engine
    computing the same IEEE doubles lands on the identical integer
    lattice, which is what makes the quantized lane oracle-checkable
    bit-for-bit. Normalizing first turns cosine ranking into integer
    dot-product ranking (monotone per query up to quantization error).
    Zero vectors quantize to all-zero with scale 0. int8 payload is 4x
    smaller than float32 / 8x than float64 — at 100 TB that is the
    difference between a RAM-resident and a disk-bound ANN corpus.
    """
    nv = l2_normalize(vec_col)
    return (
        df.withColumn("_nv", nv)
        .withColumn(
            scale_col,
            let_(
                F.array_max(F.transform(F.col("_nv"), F.abs)),
                lambda m: F.when(m > 0, F.lit(float(INT8_MAX)) / m).otherwise(
                    F.lit(0.0)
                ),
            ),
        )
        .withColumn(
            out_col,
            # clamp: the max-magnitude component maps to +/-127 only up
            # to float rounding — m * (127/m) can land an ulp past 127,
            # and floor would take a negative one to -128
            F.transform(
                F.col("_nv"),
                lambda x: F.greatest(
                    F.lit(-INT8_MAX),
                    F.least(
                        F.lit(INT8_MAX),
                        F.floor(x * F.col(scale_col)).cast("int"),
                    ),
                ),
            ),
        )
        .drop("_nv")
    )


def int_dot(a: Column | str, b: Column | str) -> Column:
    """Exact integer dot product of two quantized vectors (long-summed;
    127^2 * dim stays far inside int64)."""
    va = F.col(a) if isinstance(a, str) else a
    vb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(va, vb, lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str = "corpus_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Approximate cosine top-k over int8-quantized normalized vectors:
    rank by exact integer dot product (desc, corpus_id tie-break). Same
    broadcast-queries / corpus-streams-map-side shape as the float
    brute-force lane, but the per-pair work is int8 multiplies and the
    ranking key is an integer — fully deterministic across engines and
    partitionings, no float summation order anywhere."""
    qc = quantize_embeddings(corpus, vec_col)
    qq = quantize_embeddings(queries, vec_col)
    scored = (
        qc.select(corpus_id, F.col("q").alias("_cq"))
        .crossJoin(F.broadcast(qq.select(query_id, F.col("q").alias("_qq"))))
        .select(
            query_id,
            corpus_id,
            int_dot("_cq", "_qq").alias("dot_q"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("dot_q"), F.asc(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy(query_id, "rank")
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.97,
    n_cells: int = 16,
    seed: int = 42,
    refine_iters: int = 0,
) -> DataFrame:
    """SemDeDup-shape semantic deduplication: bucket embeddings by
    nearest centroid (k-means-lite cells, the :func:`assign_cells`
    model), then compare pairs only *within* a cell and report those
    above the cosine threshold with the larger id marked for removal
    (canonical representative = min id, matching exact_dedup /
    dedup_clusters). No counterpart in the reference ([EXT], SURVEY.md
    §2.10).

    Output: ``(id_keep, id_drop, cell, cosine)``, one row per
    above-threshold pair. Consumers drop ``id_drop`` values (or feed
    the pairs into dedup_clusters for transitive closure).

    Scale shape: the self-join key is the cell id, so comparison cost
    is Σ|cell|² instead of |corpus|² — with balanced cells that is
    |corpus|²/n_cells, and n_cells grows with the corpus (√n cells
    keeps per-cell work flat). The centroid set is a model collected
    once (n_cells × dim floats) and shipped as literals; everything
    else is one shuffle on the cell key. Near-identical vectors always
    share a cell only if assignment is unambiguous — like published
    SemDeDup (and any single-assignment clustering), boundary pairs
    split across cells are missed; raise n_probe-style recall by
    running with a second seed and unioning pairs."""
    assigned, _ = assign_cells(
        ensure_min_partitions(df), vec_col, n_cells, id_col, seed, refine_iters
    )
    # r16 (the minhash_candidate_pairs discipline, guide §2.4): BOTH
    # self-join sides read the assigned vectors — without the pin each
    # side re-runs the source scan + the n_cells×dim assignment
    # expression. id + vector + cell is corpus-sized but column-pruned;
    # localCheckpoint (not persist) for the same GC-lifetime reasons as
    # the signature stores.
    side = assigned.select(
        F.col(id_col).alias("_id"), as_double_vec(vec_col).alias("_v"), "_cell"
    ).localCheckpoint(eager=True)
    a, b = side.alias("a"), side.alias("b")
    return (
        a.join(b, "_cell")
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_keep"),
            F.col("b._id").alias("id_drop"),
            F.col("_cell").alias("cell"),
            cosine_similarity(F.col("a._v"), F.col("b._v")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def refine_centroids(
    df: DataFrame,
    vec_col: str,
    cent_rows: list,
    n_iter: int = 5,
) -> list:
    """Lloyd-style refinement of a centroid model (spherical k-means:
    cosine assignment, mean direction update — cosine ignores centroid
    magnitude so the mean needs no renormalization). Upgrades the
    hash-sampled seeds of :func:`pick_centroids` into a proper k-means
    model for :func:`ivf_topk` / :func:`semantic_dedup`.

    Scale shape per iteration: assignment is a map-only pass against
    the broadcast centroid literals; the mean update is ONE shuffle on
    (cell, dim) with map-side partial sums; what returns to the driver
    is the model itself (n_cells × dim sums + counts — the same bounded
    collect as pick_centroids). Cells that lose every member keep their
    previous centroid (dead-cell carry) so the model never shrinks.

    Lloyd monotonicity holds: each iteration's total assignment
    similarity is non-decreasing, pinned by
    test_dedup_similarity.py::test_refine_centroids_monotone.
    """
    for _ in range(n_iter):
        cent_array = _centroid_literal(cent_rows)
        v = as_double_vec(vec_col)
        best = F.array_max(
            F.transform(
                cent_array,
                lambda s: F.struct(
                    cosine_similarity(v, s["cent"]).alias("sim"),
                    s["cell"].alias("cell"),
                ),
            )
        )
        sums = (
            df.select(best["cell"].alias("_cell"), v.alias("_v"))
            .select("_cell", F.posexplode("_v").alias("_d", "_x"))
            .groupBy("_cell", "_d")
            .agg(F.sum("_x").alias("_s"), F.count(F.lit(1)).alias("_n"))
            .collect()
        )
        by_cell: dict = {}
        for r in sums:
            by_cell.setdefault(r["_cell"], {})[r["_d"]] = (r["_s"], r["_n"])
        new_rows = []
        for cell, old in cent_rows:
            dims = by_cell.get(cell)
            if dims:
                new_rows.append(
                    (cell, [dims[d][0] / dims[d][1] for d in range(len(old))])
                )
            else:
                new_rows.append((cell, old))  # dead-cell carry
        cent_rows = new_rows
    return cent_rows


def quantized_pool(
    df: DataFrame, group_col: str, vec_col: str = "embedding"
) -> DataFrame:
    """Grouped mean-pooling state in the int8 lane: per (group, dim),
    the EXACT integer sum of quantized components plus the member
    count — the mergeable partial state of a pooled group centroid
    (chunk→document pooling, label centroids, shard-wise pre-pooling).
    Downstream derives the float mean as q_sum / n_vecs; keeping the
    state integral makes it engine-exact (a float mean over rows would
    depend on summation order) and mergeable across shards by plain
    addition, the same algebraic-state discipline as
    operators.incremental_agg.

    Scale shape: quantization runs in the scan stage; one shuffle on
    (group, dim) with map-side partial sums; output is
    |groups| × dim rows — model-sized, not corpus-sized.
    """
    q = quantize_embeddings(df, vec_col)
    return (
        q.select(F.col(group_col), F.posexplode("q").alias("dim", "qval"))
        .groupBy(group_col, "dim")
        .agg(
            F.sum("qval").cast("long").alias("q_sum"),
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
        )
    )


def pq_train(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "corpus_id",
    m_sub: int = 8,
    ksub: int = 16,
    sample_n: int = 256,
    iters: int = 5,
):
    """Product-quantization codebook training (the FAISS recipe):
    per-subspace k-means over a DETERMINISTIC bounded sample.

    The sample (lowest ``sample_n`` ids — fixed, engine-independent) is
    a MODEL input, same class as the IVF centroid collect: PQ training
    is sample-based even at 100 TB (FAISS trains on ~1M vectors for
    billion-vector indexes), so the driver-side numpy k-means here is
    the real production shape, not a shortcut. Init = first ``ksub``
    sample subvectors, fixed ``iters`` Lloyd rounds, empty clusters
    keep their previous centroid — fully deterministic.

    Returns a list of ``m_sub`` (ksub, dim/m_sub) float arrays.
    """
    import numpy as np

    rows = (
        corpus.select(F.col(id_col).alias("_i"), as_double_vec(vec_col).alias("_v"))
        .withColumn("_nv", l2_normalize("_v"))
        .orderBy("_i")
        .limit(sample_n)
        .select("_nv")
        .collect()
    )
    X = np.array([r["_nv"] for r in rows], dtype=np.float64)
    dim = X.shape[1]
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    dsub = dim // m_sub
    codebooks = []
    for m in range(m_sub):
        S = X[:, m * dsub : (m + 1) * dsub]
        C = S[:ksub].copy()
        for _ in range(iters):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            for c in range(ksub):
                pts = S[assign == c]
                if len(pts):
                    C[c] = pts.mean(0)
        codebooks.append(C)
    return codebooks


def pq_reconstruct(vec_col, codebooks) -> Column:
    """Distributed PQ encode + decode in one codegen expression: slice
    the L2-normalized vector into subspaces, pick each subspace's
    nearest codebook centroid (argmin of exact squared distance;
    array_position gives the deterministic first-match tie-break), and
    concatenate the chosen centroids. Scoring a query against the
    reconstruction is numerically identical to ADC lookup-table scoring
    (the dot product distributes over the concatenation) — without
    shipping a per-query LUT."""
    m_sub = len(codebooks)
    dsub = codebooks[0].shape[1]
    nv = l2_normalize(vec_col)
    subs = []
    for m in range(m_sub):
        # r15: one array<double> literal per centroid (not dsub literal
        # children each) — same plan-size lever as _centroid_literal.
        cb_lit = F.array(
            *[
                F.lit([float(x) for x in cent]).cast("array<double>")
                for cent in codebooks[m]
            ]
        )
        sub = F.slice(nv, m * dsub + 1, dsub)

        def _d2_factory(sub_col):
            # strictly one-parameter callable: pyspark counts declared
            # params (defaults included) and a 2-ary callable would be
            # taken as transform's (element, index) form
            def _d2(cent):
                return F.aggregate(
                    F.zip_with(sub_col, cent, lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )

            return _d2

        dists = F.transform(cb_lit, _d2_factory(sub))
        code = F.array_position(dists, F.array_min(dists))
        subs.append(F.element_at(cb_lit, code.cast("int")))
    return F.concat(*subs)


def pq_encode_arrow(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    codebooks,
) -> DataFrame:
    """Arrow-batched twin of :func:`pq_reconstruct`: numpy encode with
    the SAME left-fold arithmetic (per-dimension ``acc += (x-c)²``
    sequential adds and first-occurrence argmin), so codes and
    reconstructions are bit-identical to the expression path — pinned
    by ``test_pq_arrow_encode_matches_expression``. The normalization
    stays the Spark-side :func:`l2_normalize` expression so both lanes
    share it.

    This is the production encode shape: the interpreted HOF expression
    evaluates m_sub·ksub lambda distance folds per row (fine for a plan
    demo, ~ms/row), while one Arrow batch amortizes the Python hop over
    thousands of rows of plain vectorized float64 ops. Map-side only —
    no shuffle, corpus order/partitioning preserved."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    m_sub = len(codebooks)
    dsub = codebooks[0].shape[1]
    cbs = [c.astype(np.float64) for c in codebooks]
    out_schema = StructType(
        [
            corpus.schema[id_col],
            StructField("_recon", ArrayType(DoubleType()), False),
        ]
    )

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(pdf["_nv"].tolist(), dtype=np.float64)
            parts = []
            for m in range(m_sub):
                S = V[:, m * dsub : (m + 1) * dsub]
                C = cbs[m]
                acc = np.zeros((len(S), C.shape[0]), dtype=np.float64)
                for j in range(dsub):
                    d = S[:, j][:, None] - C[None, :, j]
                    acc = acc + d * d  # left fold, same IEEE order as F.aggregate
                parts.append(C[acc.argmin(1)])  # argmin = first min, = array_position
            R = np.concatenate(parts, axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "_recon": list(R)}
            )

    nv = corpus.select(id_col, l2_normalize(vec_col).alias("_nv"))
    return nv.mapInPandas(gen, schema=out_schema)


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str = "corpus_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    k: int = 10,
    m_sub: int = 8,
    ksub: int = 16,
    codebooks=None,
    encode: str = "arrow",
) -> DataFrame:
    """Approximate cosine top-k via product quantization: corpus vectors
    are collapsed to ``m_sub`` 4-bit-ish codes (here materialized as the
    reconstructed centroids), queries stay exact, ranking key is
    dot(query, reconstruction) — ADC scoring. Same broadcast-queries /
    corpus-streams shape as the other lanes: the corpus never shuffles,
    encode runs map-side in the scan stage (a real deployment would
    precompute the codes at ingest — 64-dim float64 → 8 bytes is a 64x
    compression, the difference between disk and RAM at 100 TB).
    Deterministic: fixed codebooks, fixed-order float sums, corpus_id
    tie-break."""
    if codebooks is None:
        codebooks = pq_train(
            corpus, vec_col, corpus_id, m_sub=m_sub, ksub=ksub
        )
    if encode == "arrow":
        enc = pq_encode_arrow(corpus, vec_col, corpus_id, codebooks)
    else:
        enc = corpus.select(
            corpus_id, pq_reconstruct(vec_col, codebooks).alias("_recon")
        )
    qn = queries.select(query_id, l2_normalize(vec_col).alias("_qv"))
    scored = enc.crossJoin(F.broadcast(qn)).select(
        query_id,
        corpus_id,
        F.aggregate(
            F.zip_with(F.col("_recon"), F.col("_qv"), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("adc_score"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.desc("adc_score"), F.asc(corpus_id)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy(query_id, "rank")
    )


def save_pq_codebooks(spark, codebooks, path: str) -> None:
    """Persist PQ codebooks as a parquet model artifact
    ``(m, idx, cent: array<double>)`` — the build-once-at-ingest /
    reuse-per-query lifecycle real ANN deployments need (FAISS's
    index file, in Spark-native storage any executor or engine can
    read). float64 round-trips bit-exactly through parquet DOUBLE."""
    rows = [
        (m, i, [float(x) for x in cent])
        for m, cb in enumerate(codebooks)
        for i, cent in enumerate(cb)
    ]
    local_rows_df(
        spark,
        rows, "m int, idx int, cent array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_pq_codebooks(spark, path: str):
    """Load codebooks saved by :func:`save_pq_codebooks`, reshaped to
    the list-of-(ksub, dsub)-arrays form ``pq_topk`` consumes."""
    import numpy as np

    rows = spark.read.parquet(path).collect()
    m_sub = max(r["m"] for r in rows) + 1
    out = []
    for m in range(m_sub):
        cents = sorted(
            ((r["idx"], r["cent"]) for r in rows if r["m"] == m)
        )
        out.append(np.array([c for _, c in cents], dtype=np.float64))
    return out


# ---------------------------------------------------------------------------
# Round-5: integer-exact Gram matrix + ANN recall evaluation harness
# ---------------------------------------------------------------------------


def gram_matrix(
    df: DataFrame, vec_col: str = "embedding", dims: int = 8, scale: int = 1000
) -> DataFrame:
    """Integer-exact Gram matrix over the first ``dims`` embedding
    components: G[i,j] = Σ_rows q_i·q_j with q = floor(v·scale) — the
    X'X building block of PCA/whitening/linear probes, kept on the
    integer lattice so the matrix is bit-identical in any engine
    (float dot products would depend on row order).

    Plan shape: ALL dims·(dims+1)/2 upper-triangle sums evaluate in ONE
    map-combined aggregate over the scan — no explode, no join, no
    per-dimension shuffle; the d×d result is model-sized. ``stack``
    unpivots the single aggregate row into (di, dj, dot) rows. At
    100 TB this is one pass over the corpus with constant state — the
    same mergeable-moments discipline as corr/regression
    (queries/relational.py) lifted to a matrix.
    """
    v = as_double_vec(vec_col)
    q = lambda i: F.floor(F.element_at(v, i) * scale).cast("long")  # noqa: E731
    pairs = [(i, j) for i in range(1, dims + 1) for j in range(i, dims + 1)]
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(q(i) * q(j)).alias(f"g_{i}_{j}") for i, j in pairs],
    )
    stack = "stack({}, {}) as (di, dj, dot)".format(
        len(pairs), ", ".join(f"{i}, {j}, g_{i}_{j}" for i, j in pairs)
    )
    return row.selectExpr(stack, "n")


def rrf_fuse(
    lex: DataFrame,
    sem: DataFrame,
    qid_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k0: int = 60,
    k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of two ranked retrieval lanes — the
    standard hybrid-search combiner (lexical BM25 + semantic ANN) a
    RAG corpus is queried with: rrf(d) = Σ_lanes 1/(k0 + rank_lane(d)),
    absent lanes contribute 0, final order rrf desc then id asc.

    Both inputs are (qid, id, rank) top-k lists, so the fusion is a
    FULL OUTER equi-join on (qid, id) over two already-tiny frames
    (queries × k rows each) — candidate generation happened upstream
    in each lane; fusion never touches the corpus. The rrf score is a
    single two-term IEEE expression per row (division + one add, no
    order-dependent aggregation), hence bit-identical across engines —
    unlike summed float scores, it needs no exclusion from oracle
    comparison, but ranks remain the semantic output.

    Returns (qid, rank, id, lex_rank, sem_rank) with NULL lane ranks
    where a document appeared in only one lane.
    """
    left = lex.select(
        F.col(qid_col), F.col(id_col), F.col(rank_col).alias("lex_rank")
    )
    right = sem.select(
        F.col(qid_col), F.col(id_col), F.col(rank_col).alias("sem_rank")
    )
    fused = (
        left.join(right, [qid_col, id_col], "full_outer")
        .withColumn(
            "_rrf",
            F.coalesce(
                F.lit(1.0) / (F.lit(k0) + F.col("lex_rank")), F.lit(0.0)
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(k0) + F.col("sem_rank")), F.lit(0.0)
            ),
        )
    )
    w = Window.partitionBy(qid_col).orderBy(
        F.desc("_rrf"), F.asc(id_col)
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, "rank", id_col, "lex_rank", "sem_rank")
    )


def pooled_ann_recall(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str = "corpus_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_blocks: int = 8,
) -> DataFrame:
    """ANN quality evaluation: recall@k of a coarse BLOCK-POOLED scorer
    against the exact int8-quantized ranking — the eval harness every
    approximate index needs before it gates a 100 TB pipeline (an ANN
    path without a recall number is a silent-data-loss risk).

    Both lanes live on the integer lattice, so the recall counts are
    engine-exact: the truth lane ranks by the full int8 dot product
    (``quantized_topk`` semantics), the approximate lane pools each
    quantized vector into ``n_blocks`` consecutive block sums (an
    8x-compressed sketch — the dimensionality-reduction family IVF/PQ
    belong to) and ranks by the pooled dot. Returns one row per query:
    ``(query_id, n_overlap, k)``. Ties break by corpus id in both
    lanes.

    When the embedding dim is not divisible by ``n_blocks``, the LAST
    block absorbs the ``dim % n_blocks`` trailing components (block
    width is ``dim div n_blocks`` for the first n_blocks-1 blocks) —
    every component contributes to the sketch; nothing is silently
    dropped. When the dim is SMALLER than ``n_blocks`` the block count
    clamps to the dim (one component per block — the sketch degrades
    to the exact vector rather than to n_blocks-1 empty blocks plus
    one block holding everything, which the pre-r7 code produced
    silently).
    """
    def lanes(df: DataFrame, id_out: str) -> DataFrame:
        qd = quantize_embeddings(df, vec_col)
        # Clamp to >=1 block: an EMPTY vector would otherwise make
        # nb=0, so base = size/nb is a 0/0 NULL and sequence(0, nb-1)
        # = sequence(0, -1) yields a DESCENDING [0, -1] — the sketch
        # becomes an array of NULLs (null dot_pooled, null-ordered
        # ranking). With nb=1 the empty vector pools to one empty-sum
        # block = the well-defined all-zero sketch (advisor r7).
        nb = F.greatest(
            F.lit(1), F.least(F.lit(n_blocks), F.size(F.col("q")))
        )
        base = (F.size(F.col("q")) / nb).cast("int")
        blk = F.transform(
            F.sequence(F.lit(0), nb - 1),
            lambda b: F.aggregate(
                F.slice(
                    F.col("q"),
                    b * base + 1,
                    F.when(
                        b == nb - 1, F.size(F.col("q")) - b * base
                    ).otherwise(base),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ),
        )
        return qd.select(F.col(id_out), F.col("q"), blk.alias("p"))

    c = lanes(corpus, corpus_id)
    qs = lanes(queries, query_id)
    scored = c.crossJoin(F.broadcast(qs.select(
        query_id, F.col("q").alias("qq"), F.col("p").alias("qp")
    ))).select(
        corpus_id,
        query_id,
        int_dot("q", "qq").alias("dot_exact"),
        int_dot("p", "qp").alias("dot_pooled"),
    )
    we = Window.partitionBy(query_id).orderBy(
        F.col("dot_exact").desc(), F.col(corpus_id)
    )
    wp = Window.partitionBy(query_id).orderBy(
        F.col("dot_pooled").desc(), F.col(corpus_id)
    )
    ranked = scored.select(
        query_id,
        corpus_id,
        F.row_number().over(we).alias("r_exact"),
        F.row_number().over(wp).alias("r_pooled"),
    )
    return (
        ranked.filter((F.col("r_exact") <= k) | (F.col("r_pooled") <= k))
        .groupBy(query_id)
        .agg(
            F.sum(
                ((F.col("r_exact") <= k) & (F.col("r_pooled") <= k))
                .cast("long")
            ).alias("n_overlap"),
            F.lit(k).cast("long").alias("k"),
        )
    )


#: metric scale for the exact integer recall/MRR lanes
_METRIC_SCALE = 10**6


def ranking_metrics(
    results: DataFrame,
    qrels: DataFrame,
    k: int,
    qid_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Retrieval-quality evaluation — the QA gate a search/RAG
    pipeline runs after every index or model change: per query,
    ``n_rel`` (relevant documents in the qrels), ``hits_at_k``
    (relevant retrieved within rank ≤ k), ``recall_at_k_s`` =
    ``(hits · 10^6) div n_rel`` and ``mrr_s`` = ``10^6 div (first
    relevant rank)`` (0 when nothing relevant is retrieved) — both
    EXACT scaled-integer lanes, so the evaluation itself is
    oracle-certifiable (NDCG's irrational log2 discounts are exactly
    why it is NOT offered here; an uncertifiable metric in a release
    gate is how regressions slip through).

    ``results`` is a ranked list (qid, doc, rank); ``qrels`` the
    relevance set (qid, doc). Queries present in qrels but retrieving
    nothing still emit a row (zero hits). Physical shape: results are
    queries × k rows and qrels candidate-sized — the join and both
    aggregates are tiny by construction; the expensive work happened
    upstream in the retrieval lane being evaluated.
    """
    r = results.select(
        F.col(qid_col).alias("_q"),
        F.col(doc_col).alias("_d"),
        F.col(rank_col).alias("_rank"),
    ).filter(F.col("_rank") <= k)
    q = qrels.select(
        F.col(qid_col).alias("_q"), F.col(doc_col).alias("_d")
    ).distinct()
    n_rel = q.groupBy("_q").agg(F.count(F.lit(1)).alias("n_rel"))
    hits = (
        r.join(q, ["_q", "_d"], "left_semi")
        .groupBy("_q")
        .agg(
            F.count(F.lit(1)).alias("hits_at_k"),
            F.min("_rank").alias("_first"),
        )
    )
    return (
        n_rel.join(hits, "_q", "left")
        .select(
            F.col("_q").alias(qid_col),
            "n_rel",
            F.coalesce(F.col("hits_at_k"), F.lit(0))
            .cast("long")
            .alias("hits_at_k"),
            F.expr(
                f"(coalesce(hits_at_k, 0) * {_METRIC_SCALE}) div n_rel"
            ).alias("recall_at_k_s"),
            F.coalesce(
                F.expr(f"{_METRIC_SCALE} div _first"), F.lit(0)
            )
            .cast("long")
            .alias("mrr_s"),
        )
    )
