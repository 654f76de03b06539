"""Incremental aggregate maintenance: keep a materialized rollup current
by folding in delta batches, never re-reading history.

This is the aggregate-side counterpart of the reference's incremental
design (piter-a/Incremental-GitHub-Data-Pipeline): the reference gets
idempotent incremental *loads* from deterministic uuid5 keys
(utils/guid_gen.py:9-10, SURVEY.md §1.5); an analytics engine over the
same data additionally needs incremental *aggregates*. The standard
technique (partial/algebraic aggregation, same algebra Spark uses for
map-side combine) is lifted to the table level:

    state_0 = partial_rollup(history)          # once
    state_n = merge_rollups(state_{n-1}, partial_rollup(delta_n))
    answer  = finalize_rollup(state_n)

Each measure is kept as a *mergeable* state column — count and sum
accumulate by addition (sums in exact DECIMAL so merge order can never
change the result), min/max by min/max, and avg as a (sum, count) pair
finalized at read time. Distinct counts are intentionally NOT offered
here: they are not algebraic, and pretending they merge is how rollups
silently go wrong (use a sketch or a full recompute for those).

At 100 TB this is the difference between a job sized by |delta| and a
job sized by |history|: merge shuffles only |state| + |combined delta
partials| rows on the rollup keys, the delta gets map-side partial
aggregation before it ever hits the wire, and the state table stays
keyed/bucketable on the same rollup keys across generations so
successive merges can co-locate.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: measure spec: output_name -> (op, input_column); op in _OPS. For
#: "count", the input column is ignored (may be None).
_OPS = ("count", "sum", "min", "max", "avg")

_SUM_SCALE = "decimal(25,8)"


def _state_cols(measures: Mapping[str, tuple[str, str | None]]) -> list[str]:
    cols: list[str] = []
    for name, (op, _) in measures.items():
        if op == "avg":
            cols += [f"__{name}_sum", f"__{name}_cnt"]
        else:
            cols.append(name)
    return cols


def partial_rollup(
    df: DataFrame,
    keys: list[str],
    measures: Mapping[str, tuple[str, str | None]],
) -> DataFrame:
    """Aggregate ``df`` into mergeable per-key state (one row per key)."""
    aggs = []
    for name, (op, col) in measures.items():
        if op not in _OPS:
            raise ValueError(f"unsupported incremental op: {op!r}")
        if op == "count":
            aggs.append(F.count(F.lit(1)).alias(name))
        elif op == "sum":
            aggs.append(F.sum(F.col(col).cast(_SUM_SCALE)).alias(name))
        elif op in ("min", "max"):
            aggs.append(getattr(F, op)(col).alias(name))
        else:  # avg → (sum, count) pair; count only over non-null inputs
            aggs.append(
                F.sum(F.col(col).cast(_SUM_SCALE)).alias(f"__{name}_sum")
            )
            aggs.append(F.count(col).alias(f"__{name}_cnt"))
    return df.groupBy(*keys).agg(*aggs)


def merge_rollups(
    state: DataFrame,
    delta_state: DataFrame,
    keys: list[str],
    measures: Mapping[str, tuple[str, str | None]],
) -> DataFrame:
    """Fold a delta's partial state into the existing state. Both inputs
    must be outputs of :func:`partial_rollup` (or a previous merge) with
    identical keys/measures. Associative and commutative: any merge tree
    over the same batches yields an identical table."""
    aggs = []
    for name, (op, _) in measures.items():
        if op == "count":
            aggs.append(F.sum(name).cast("long").alias(name))
        elif op == "sum":
            aggs.append(F.sum(F.col(name).cast(_SUM_SCALE)).alias(name))
        elif op in ("min", "max"):
            aggs.append(getattr(F, op)(name).alias(name))
        else:
            aggs.append(
                F.sum(F.col(f"__{name}_sum").cast(_SUM_SCALE)).alias(
                    f"__{name}_sum"
                )
            )
            aggs.append(F.sum(f"__{name}_cnt").cast("long").alias(f"__{name}_cnt"))
    cols = keys + _state_cols(measures)
    return (
        state.select(*cols)
        .unionByName(delta_state.select(*cols))
        .groupBy(*keys)
        .agg(*aggs)
    )


def finalize_rollup(
    state: DataFrame,
    measures: Mapping[str, tuple[str, str | None]],
) -> DataFrame:
    """Project user-facing values out of the mergeable state: sums emit
    DOUBLE (cast from the exact decimal accumulator), avg emits
    sum/count (NULL when no non-null inputs ever arrived)."""
    out = []
    for name, (op, _) in measures.items():
        if op == "avg":
            out.append(
                (
                    F.col(f"__{name}_sum").cast("double")
                    / F.col(f"__{name}_cnt")
                ).alias(name)
            )
        elif op == "sum":
            out.append(F.col(name).cast("double").alias(name))
        else:
            out.append(F.col(name))
    key_cols = [c for c in state.columns if not c.startswith("__")]
    key_cols = [c for c in key_cols if c not in measures]
    return state.select(*key_cols, *out)


def incremental_join_delta(
    a_old: DataFrame,
    delta_a: DataFrame,
    b_old: DataFrame,
    delta_b: DataFrame,
    on: list[str],
) -> DataFrame:
    """Incremental view maintenance for an INNER equi-join under
    insert-only deltas: the rows the join gains are exactly

        Δ(A ⨝ B) = ΔA ⨝ B_old  ∪  A_old ⨝ ΔB  ∪  ΔA ⨝ ΔB

    so a materialized join view is refreshed by appending this delta —
    never re-joining the two full tables. The companion of the rollup
    maintenance above (partial/merge/finalize), applied to the join
    operator itself.

    Scale shape: the two old sides are the 100 TB tables and they
    NEVER join each other here; each term joins a (small) delta
    against one side, so AQE broadcasts the delta and the old side
    streams map-side. Identity (old ∪ delta ≡ recomputed full join,
    bag semantics) is pinned by test_incremental_agg.py and the
    EXCEPT ALL oracle of q_incremental_join.
    """
    return (
        delta_a.join(b_old, on)
        .unionByName(a_old.join(delta_b, on))
        .unionByName(delta_a.join(delta_b, on))
    )


def sketch_profile_state(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """Mergeable sketch state per group: a KLL quantile sketch and an
    HLL distinct-count sketch over ``value_col`` — the DataSketches
    lane of incremental profiling. Unlike percentile_approx /
    approx_count_distinct RESULTS (which cannot be combined after the
    fact), these states merge exactly: profile each shard/day once,
    keep the binary states, and answer corpus-wide quantiles and
    distinct counts later by merging states — never rescanning data.
    The same partial/merge/finalize discipline as the algebraic rollup
    above, for the non-algebraic statistics.
    """
    return df.groupBy(*group_cols).agg(
        F.kll_sketch_agg_double(F.col(value_col).cast("double")).alias(
            "kll_state"
        ),
        # HLL accepts int/bigint/string/binary — hash distinctness over
        # the string rendering so any value type profiles uniformly
        F.hll_sketch_agg(F.col(value_col).cast("string")).alias("hll_state"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def merge_sketch_profiles(
    states: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Merge sketch states (e.g. per-shard → per-group): exact state
    union, no data rescan. One shuffle on the (tiny) state table. HLL
    has a native union aggregate; KLL's merge is a two-arg scalar, so
    the per-group states (bounded: one per shard) are folded with
    ``aggregate`` over the collected list."""
    from incremental_github_data_pipeline_spark.functions.scalar import let_

    lists = states.groupBy(*group_cols).agg(
        F.collect_list("kll_state").alias("_ks"),
        F.expr("hll_union_agg(hll_state)").alias("hll_state"),
        F.sum("n_rows").alias("n_rows"),
    )
    merged = let_(
        F.col("_ks"),
        lambda ks: F.aggregate(
            F.slice(ks, 2, F.greatest(F.size(ks) - 1, F.lit(0))),
            F.element_at(ks, 1),
            lambda acc, x: F.kll_sketch_merge_double(acc, x),
        ),
    )
    return lists.withColumn("kll_state", merged).drop("_ks")


def finalize_sketch_profile(
    states: DataFrame, quantiles: list[float] | None = None
) -> DataFrame:
    """Extract answers from sketch states: requested quantiles plus the
    HLL distinct estimate."""
    qs = quantiles or [0.5, 0.9, 0.99]
    out = states
    for q in qs:
        name = f"p{int(q * 100)}"
        out = out.withColumn(
            name,
            F.expr(f"kll_sketch_get_quantile_double(kll_state, {q}d)"),
        )
    return out.withColumn(
        "approx_distinct", F.hll_sketch_estimate(F.col("hll_state"))
    ).drop("kll_state", "hll_state")


# ---------------------------------------------------------------------------
# Count-min sketch (round 4): mergeable approximate frequency state
# ---------------------------------------------------------------------------


def cm_sketch(
    df,
    key_col: str,
    width: int = 2048,
    depth: int = 4,
    weight_col: str | None = None,
):
    """Build a count-min sketch over a key column: ``depth`` seeded hash
    rows x ``width`` counters. Returns a counters DataFrame
    ``(cm_row, cm_bucket, cm_count)`` with at most ``depth*width`` rows —
    CONSTANT state regardless of input size, and mergeable by simple
    counter addition (union + re-groupBy), so shards/days/streams can
    sketch independently and answer from the state union. One explode
    (x depth) + one shuffle on the (row, bucket) key.

    The frequency estimate is min over rows of the key's counter:
    never an undercount; overcount bounded by e*N/width per row with
    probability 1 - e^-depth (the Cormode-Muthukrishnan bound).
    """
    from pyspark.sql import functions as F

    w = (
        F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    )
    rows = df.select(
        F.posexplode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(width))
                    for i in range(depth)
                ]
            )
        ).alias("cm_row", "cm_bucket"),
        w.alias("_w"),
    )
    return rows.groupBy("cm_row", "cm_bucket").agg(
        F.sum("_w").alias("cm_count")
    )


def cm_merge(*sketches):
    """Merge count-min sketches built with identical (width, depth):
    counters add."""
    from functools import reduce

    from pyspark.sql import functions as F

    u = reduce(lambda a, b: a.unionByName(b), sketches)
    return u.groupBy("cm_row", "cm_bucket").agg(
        F.sum("cm_count").alias("cm_count")
    )


def cm_estimate(
    keys_df,
    sketch,
    key_col: str,
    width: int = 2048,
    depth: int = 4,
):
    """Estimate each key's frequency from a count-min sketch: join the
    key's ``depth`` bucket positions against the counters (broadcast —
    the sketch is constant-size) and take the min. Missing counters are
    zero. Adds a ``cm_est`` column."""
    from pyspark.sql import functions as F

    pos = keys_df.select(
        "*",
        F.posexplode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(width))
                    for i in range(depth)
                ]
            )
        ).alias("cm_row", "cm_bucket"),
    )
    joined = pos.join(F.broadcast(sketch), ["cm_row", "cm_bucket"], "left")
    group_cols = [c for c in keys_df.columns]
    return (
        joined.groupBy(*group_cols)
        .agg(
            F.min(F.coalesce(F.col("cm_count"), F.lit(0).cast("long"))).alias(
                "cm_est"
            )
        )
    )


# ---------------------------------------------------------------------------
# HyperLogLog registers, bit-reproducible across engines
# ---------------------------------------------------------------------------

#: Multiply-xor avalanche hash (the public-domain "lowbias32" shape:
#: two rounds of ``h ^= h>>16; h *= 0x45d9f3b`` plus a final mix) —
#: chosen over xxhash64 deliberately: the whole point of this sketch
#: variant is that a foreign engine can recompute the REGISTER TABLE
#: itself in plain SQL (multiply / mod / xor / div-as-shift), so the
#: oracle compares state bit-for-bit instead of trusting guarantee
#: lanes. An affine LCG is NOT enough here: HLL reads leading zeros,
#: and a linear map sends arithmetic-progression keys (sequential ids)
#: to arithmetic progressions whose low bits are regular — measured
#: +52% estimation bias before the avalanche rounds replaced it. The
#: final ``% 2^31`` drops the sign bit: 31 hash bits = p index bits +
#: (31 − p) rank bits, everything non-negative in both engines.
_HLL_MULT = 0x45D9F3B


def _hll_hash_sql(x: str, xor_fmt: str, idiv: str) -> str:
    """SQL text of the 31-bit avalanche hash of non-negative ``x``.
    ``xor_fmt`` is the dialect's xor template (Spark: ``({a} ^ {b})``,
    DuckDB: ``xor({a}, {b})``) and ``idiv`` its integer-division token
    (Spark ``div``, DuckDB ``//`` — both truncating; operands here are
    non-negative so they agree); the ``>> 16`` shifts are spelled
    ``idiv 65536`` and masks ``% 2^32`` so every other token is
    dialect-identical. Products stay below 2^58 — no int64 overflow in
    either engine."""
    m32 = 1 << 32

    def rnd(h: str) -> str:
        mixed = xor_fmt.format(a=h, b=f"(({h}) {idiv} 65536)")
        return f"((({mixed}) * {_HLL_MULT}) % {m32})"

    h0 = f"(({x}) % {m32})"
    h1 = rnd(h0)
    h2 = rnd(h1)
    final = xor_fmt.format(a=h2, b=f"(({h2}) {idiv} 65536)")
    return f"(({final}) % {1 << 31})"


def _bitwidth_cases(col_sql: str, bits: int) -> str:
    """SQL CASE text: number of significant bits of ``col_sql``
    (0 → 0), portable to any engine — no log2 float detour whose
    rounding could flip a register near an exact power of two."""
    whens = "\n        ".join(
        f"WHEN {col_sql} >= {1 << (b - 1)} THEN {b}"
        for b in range(bits, 0, -1)
    )
    return f"CASE {whens} ELSE 0 END"


def hll_registers(
    df: DataFrame,
    group_cols,
    key_col: str,
    p: int = 6,
) -> DataFrame:
    """HyperLogLog state over a NON-NEGATIVE integer key column: per
    group, ``2^p`` registers holding the max rank (leading-zero count
    + 1 of the hash remainder). Returns ``(group..., hll_idx,
    hll_rho)`` — at most ``2^p`` rows per group, CONSTANT regardless
    of input size, and mergeable by ``union → groupBy max`` (shards /
    days / streams sketch independently; the merge law is pinned in
    tests). One shuffle on (group, idx) with map-side max combine.

    Hash = 31-bit multiply-xor avalanche (:func:`_hll_hash_sql`),
    index = top ``p`` bits, rank = ``(31 - p) - bitwidth(remainder)
    + 1`` via an exact CASE chain — every step integer arithmetic both
    Spark and DuckDB evaluate identically, so the sketch STATE is
    oracle-comparable, not just its guarantees. Estimation
    (:func:`hll_estimate`) is the one float step and stays out of
    oracle lanes.
    """
    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    rank_bits = 31 - p
    h = _hll_hash_sql(key_col, "({a} ^ {b})", "div")
    idx = f"({h} div {1 << rank_bits})"
    rem = f"({h} % {1 << rank_bits})"
    rho = f"({rank_bits} - {_bitwidth_cases(rem, rank_bits)} + 1)"
    return (
        df.select(
            *group_cols,
            F.expr(idx).cast("long").alias("hll_idx"),
            F.expr(rho).cast("long").alias("hll_rho"),
        )
        .groupBy(*group_cols, "hll_idx")
        .agg(F.max("hll_rho").alias("hll_rho"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Merge register tables built with identical ``p``: max per
    (group, idx) — associative/commutative/idempotent, so any shard
    or generation order yields the same state."""
    from functools import reduce

    u = reduce(lambda a, b: a.unionByName(b), sketches)
    keys = [c for c in u.columns if c != "hll_rho"]
    return u.groupBy(*keys).agg(F.max("hll_rho").alias("hll_rho"))


def hll_estimate(registers: DataFrame, group_cols, p: int = 6) -> DataFrame:
    """Distinct-count estimate from a register table: the classic
    Flajolet HLL harmonic mean ``alpha_m · m² / Σ 2^(−rho)`` with the
    small-range linear-counting correction (``m·ln(m/V)`` when the
    estimate is below 2.5m and empty registers remain). The one
    intentionally-float operator in this family — keep it OUT of
    hash-compared lanes; the certifiable object is the register state.
    """
    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    agg = registers.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("hll_rho"))).alias("_inv"),
        F.count(F.lit(1)).alias("_nonzero"),
    )
    raw = F.lit(alpha * m * m) / (F.col("_inv") + (m - F.col("_nonzero")))
    # ^ absent registers contribute 2^0 = 1 each to the harmonic sum
    lin = F.lit(float(m)) * F.log(
        F.lit(float(m)) / (m - F.col("_nonzero"))
    )
    est = F.when(
        (raw <= 2.5 * m) & (F.col("_nonzero") < m), lin
    ).otherwise(raw)
    return agg.select(*group_cols, est.alias("hll_est"))


# ---------------------------------------------------------------------------
# KMV (k-minimum-values, "bottom-k theta") distinct sketch — the
# oracle-CERTIFIABLE counterpart of both this module's HLL family and
# Spark's native theta_sketch_agg (used by q_vocab_overlap_sketch):
# unlike HLL, whose estimate is a float harmonic mean, every KMV output
# — state, distinct estimate, union estimate, Jaccard — is exact
# integer arithmetic a foreign engine replays bit-for-bit. Same
# portable 31-bit avalanche hash (_hll_hash_sql). Reference scope note:
# the reference has no sketches at all (its dedup is pandas
# drop_duplicates, reference etl/transform.py); [EXT] surface.
# ---------------------------------------------------------------------------


def kmv_sketch(
    df: DataFrame,
    group_cols,
    key_col: str,
    k: int = 64,
    pre_trim_salts: int | None = 16,
) -> DataFrame:
    """Per group, the ``k`` smallest DISTINCT 31-bit hash values of the
    key — ``(group..., kmv_hash)``, at most ``k`` rows per group.
    Mergeable by union → distinct → re-rank (:func:`kmv_merge`): the k
    smallest of a union are always among the union of per-shard k
    smallest, so shards / days / streams sketch independently.

    Plan shape: one (group, hash) shuffle with map-side combine for
    the distinct, then bottom-k selection. The selection is two-level:
    first bottom-k within each of ``pre_trim_salts`` hash-derived
    buckets (window over (group, hash % S)), then bottom-k of the
    ≤ S·k survivors per group — so no single task ever sorts a whole
    group's distinct-hash set, the skew that would otherwise cap a
    100 TB high-cardinality key. ``pre_trim_salts=None`` skips the
    pre-trim (fine for lexicon-bounded keys)."""
    from pyspark.sql import Window

    group_cols = (
        [group_cols] if isinstance(group_cols, str) else list(group_cols)
    )
    h = _hll_hash_sql(key_col, "({a} ^ {b})", "div")
    distinct = (
        df.select(*group_cols, F.expr(h).cast("long").alias("kmv_hash"))
        .groupBy(*group_cols, "kmv_hash")
        .agg(F.count(F.lit(1)).alias("_n"))
        .drop("_n")
    )
    if pre_trim_salts is not None:
        w1 = Window.partitionBy(
            *group_cols, (F.col("kmv_hash") % pre_trim_salts).alias("_salt")
        ).orderBy("kmv_hash")
        distinct = (
            distinct.withColumn("_rk", F.row_number().over(w1))
            .filter(F.col("_rk") <= k)
            .drop("_rk")
        )
    w2 = Window.partitionBy(*group_cols).orderBy("kmv_hash")
    return (
        distinct.withColumn("_rk", F.row_number().over(w2))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def kmv_merge(*sketches: DataFrame, k: int = 64) -> DataFrame:
    """Merge sketches built with identical hash and ``k``: union →
    distinct → bottom-k per group. Associative, commutative and
    idempotent (a hash present twice collapses in the distinct), so
    shard order and replayed batches cannot change the state. Inputs
    are ≤ k rows per group each, so the re-rank window is bounded —
    no pre-trim needed."""
    from functools import reduce

    from pyspark.sql import Window

    u = reduce(lambda a, b: a.unionByName(b), sketches)
    keys = [c for c in u.columns if c != "kmv_hash"]
    w = Window.partitionBy(*keys).orderBy("kmv_hash")
    return (
        u.groupBy(*keys, "kmv_hash")
        .agg(F.count(F.lit(1)).alias("_n"))
        .drop("_n")
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def kmv_estimate(sketch: DataFrame, group_cols, k: int = 64) -> DataFrame:
    """Distinct-count estimate per group — and unlike
    :func:`hll_estimate`, an EXACT INTEGER lane: with fewer than ``k``
    sampled hashes the sketch saw every distinct value and the
    estimate IS the exact count; at ``k`` it is the classic KMV
    ``(k-1)/U(k)`` estimator with the kth-smallest hash normalized to
    ``(0, 1]`` as ``(h+1)/2^31``, evaluated as one int64-safe integer
    division ``(k-1)·2^31 div (h_k + 1)``. Certifiable end-to-end."""
    group_cols = (
        [group_cols] if isinstance(group_cols, str) else list(group_cols)
    )
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_n"),
        F.max("kmv_hash").alias("_hk"),
    )
    est = F.when(F.col("_n") < k, F.col("_n")).otherwise(
        F.expr(f"{(k - 1) * (1 << 31)} div (_hk + 1)")
    )
    return agg.select(
        *group_cols, est.cast("long").alias("kmv_est")
    )


def kmv_jaccard(
    sketch: DataFrame, group_col: str, k: int = 64
) -> DataFrame:
    """Pairwise Jaccard similarity between every two groups' key sets,
    estimated from their sketches alone — the theta-sketch trick: the
    bottom-k of the UNION of two sketches is a uniform sample of the
    union, so the fraction of it present in both sides estimates
    J(A, B). Output per (group_a < group_b): ``sample_size`` (=
    min(k, |union sample|)), ``n_common_sample``, ``jaccard_ppm`` =
    n_common·10⁶ div sample_size (EXACT when the union has < k
    distinct hashes — the sample is then the whole union), and the
    integer union-size estimate ``est_union``. Everything is integer
    arithmetic over ≤ 2k rows per pair; with G groups the pair frame
    is G²·k sketch rows — model-sized, broadcast-friendly, never a
    fact-table join. The sketch feeds four lanes (both sides + both
    group lists), so it is materialized ONCE here — bounded at
    groups × k rows by construction — instead of re-deriving the
    upstream scan per lane (the q_doc_contained lesson)."""
    from pyspark.sql import Window

    sketch = sketch.localCheckpoint(eager=True)
    a = sketch.select(
        F.col(group_col).alias("group_a"),
        "kmv_hash",
        F.lit(1).alias("in_a"),
        F.lit(0).alias("in_b"),
    )
    b = sketch.select(
        F.col(group_col).alias("group_b"),
        "kmv_hash",
        F.lit(0).alias("in_a"),
        F.lit(1).alias("in_b"),
    )
    ga = sketch.select(F.col(group_col).alias("group_a")).distinct()
    gb = sketch.select(F.col(group_col).alias("group_b")).distinct()
    pairs = ga.join(gb, F.col("group_a") < F.col("group_b"))
    un = (
        pairs.join(a, "group_a")
        .unionByName(pairs.join(b, "group_b").select(pairs.columns + ["kmv_hash", "in_a", "in_b"]))
        .groupBy("group_a", "group_b", "kmv_hash")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.partitionBy("group_a", "group_b").orderBy("kmv_hash")
    bot = un.withColumn("_rk", F.row_number().over(w)).filter(
        F.col("_rk") <= k
    )
    res = bot.groupBy("group_a", "group_b").agg(
        F.count(F.lit(1)).alias("sample_size"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_common_sample"),
        F.max("kmv_hash").alias("_hk"),
    )
    est_union = F.when(
        F.col("sample_size") < k, F.col("sample_size")
    ).otherwise(F.expr(f"{(k - 1) * (1 << 31)} div (_hk + 1)"))
    return res.select(
        "group_a",
        "group_b",
        F.col("sample_size").cast("long").alias("sample_size"),
        F.col("n_common_sample").cast("long").alias("n_common_sample"),
        F.expr("n_common_sample * 1000000 div sample_size")
        .cast("long")
        .alias("jaccard_ppm"),
        est_union.cast("long").alias("est_union"),
    )
