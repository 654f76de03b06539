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
