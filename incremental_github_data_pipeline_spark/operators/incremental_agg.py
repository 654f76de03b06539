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
