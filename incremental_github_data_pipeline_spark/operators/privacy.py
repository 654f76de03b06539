"""Privacy / governance audit operators: k-anonymity and l-diversity
reports over quasi-identifier equivalence classes.

No counterpart in the reference (`/root/reference` has no governance
surface); [EXT] per SURVEY.md §2.10 — the release-gating audit a
training-data pipeline runs before publishing a derived dataset:
k-anonymity (every quasi-identifier combination is shared by ≥ k rows,
so no row is re-identifiable by those columns alone) and l-diversity
(each class carries ≥ l distinct sensitive values, closing the
homogeneity attack k-anonymity leaves open). Companion to the PII
span detection in ``operators/text.py`` — that finds leaking VALUES,
this audits the released SCHEMA's linkage risk.

Both reports are single group-by aggregates on the quasi-identifier
tuple — one map-combined shuffle over the table, class cardinality
bounded by the quasi-identifier domain (not row count), nothing on the
driver. At 100 TB the shuffle key is the quasi tuple; skew equals
class skew, which is exactly what the report measures.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["generalize_to_k", "k_anonymity_report", "suppress_small_classes"]


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int,
    sensitive_col: str | None = None,
    l: int = 2,
) -> DataFrame:
    """One row per quasi-identifier equivalence class:
    ``class_size``, ``k_violation`` (class smaller than ``k``), and —
    when ``sensitive_col`` is given — ``n_sensitive`` (distinct
    sensitive values in the class) and ``l_violation`` (fewer than
    ``l`` of them: the homogeneous class every member's sensitive value
    leaks from, even at k-anonymous size).

    NULL quasi values form an equivalence class of their own (groupBy
    groups NULLs together), and :func:`suppress_small_classes` matches
    that class null-safely — audit and enforcement agree on NULL keys.

    The dataset is k-anonymous/l-diverse iff the respective violation
    columns are all false — aggregate downstream or feed
    :func:`suppress_small_classes`. Exact distinct count, not a sketch:
    a release gate must not approximate its own pass/fail.
    """
    aggs = [
        F.count(F.lit(1)).alias("class_size"),
    ]
    if sensitive_col is not None:
        aggs.append(
            F.countDistinct(F.col(sensitive_col)).alias("n_sensitive")
        )
    out = df.groupBy(*quasi_cols).agg(*aggs)
    out = out.withColumn("k_violation", F.col("class_size") < k)
    if sensitive_col is not None:
        out = out.withColumn("l_violation", F.col("n_sensitive") < l)
    return out


def suppress_small_classes(
    df: DataFrame, quasi_cols: Sequence[str], k: int
) -> DataFrame:
    """Enforce k-anonymity by SUPPRESSION: drop every row whose
    quasi-identifier class has fewer than ``k`` members — the simplest
    sound release transform (generalization hierarchies are a policy
    choice layered above). Implemented as the class-size aggregate
    semi-joined back on the quasi tuple; the fact table shuffles once
    on the same key as the audit, so audit + enforcement share a
    partitioning at scale.

    The semi-join is NULL-SAFE (``<=>`` per quasi column): groupBy
    treats NULL as an equivalence class, so a NULL-keyed class of size
    ≥ k is k-anonymous by :func:`k_anonymity_report`'s own accounting
    and must survive suppression — a null-unsafe join would silently
    drop every NULL-keyed row regardless of class size, over-
    suppressing inconsistently with the audit it enforces (ADVICE r9).
    ``<=>`` is still an equi-join key to Catalyst, so the plan stays a
    hash semi-join, not a nested loop."""
    quasi = list(quasi_cols)
    big = (
        df.groupBy(*quasi)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= k)
        .select([F.col(c).alias(f"_big_{c}") for c in quasi])
    )
    cond = None
    for c in quasi:
        term = df[c].eqNullSafe(big[f"_big_{c}"])
        cond = term if cond is None else cond & term
    return df.join(big, cond, "left_semi")


def generalize_to_k(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int,
    ladder: Sequence,
):
    """Enforce k-anonymity by GENERALIZATION — the other standard
    mechanism beside :func:`suppress_small_classes`: instead of
    dropping rows in small classes, coarsen the quasi-identifiers up a
    supplied ladder (nation → region → '*', zip5 → zip3 → '*', age →
    decade …) until every class reaches size ``k``. Suppression costs
    rows; generalization costs resolution — release policy picks the
    trade.

    ``ladder`` is an ordered list of step callables ``df → df``, each
    rewriting the quasi columns one level coarser. Steps apply
    IN ORDER until the audit passes or the ladder is exhausted, so the
    result is deterministic (no lattice search — the ladder IS the
    policy, fixed by the caller). Returns ``(released_df,
    level_applied, n_violations_left)``; a nonzero residual means even
    the coarsest level failed (compose with suppression for the
    remainder — the standard hybrid).

    Per level the gate is ONE map-combined class-size aggregate
    reduced to a 1-row any-violation count (bounded driver state, the
    k_core round-counter discipline); at most ``len(ladder)`` passes
    over the data, each a projection rewrite — no shuffle beyond the
    audit aggregate."""
    level = 0
    cur = df

    def n_violations(frame: DataFrame) -> int:
        return (
            frame.groupBy(*quasi_cols)
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") < k)
            .count()
        )

    viol = n_violations(cur)
    while viol > 0 and level < len(ladder):
        cur = ladder[level](cur)
        level += 1
        viol = n_violations(cur)
    return cur, level, viol
