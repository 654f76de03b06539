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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "dp_noisy_counts",
    "generalize_to_k",
    "k_anonymity_report",
    "suppress_small_classes",
    "t_closeness_from_counts",
    "t_closeness_report",
]


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


def t_closeness_report(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    t_ppm: int,
    ordered: bool = True,
) -> DataFrame:
    """t-closeness audit (r11) — the third rung of the release ladder:
    k-anonymity stops re-identification, l-diversity stops the
    homogeneous class, and t-closeness stops the SKEWED class, where a
    class's sensitive-value distribution differs so much from the
    table's that membership alone is informative (the classic example:
    a class whose salary distribution sits entirely in the top
    percentile is a leak even with many distinct values).

    Per quasi-identifier class: Earth Mover's Distance between the
    class's sensitive distribution P and the global distribution Q,
    as an INTEGER parts-per-million lane. ``ordered=True`` uses the
    ordered-metric EMD of the original paper — mean |cumulative
    (P−Q)| over the m−1 ordered prefixes; ``ordered=False`` the
    categorical EMD = total variation = Σ|P−Q| / 2. Both are computed
    cross-multiplied (class count · N vs global count · n) through
    DECIMAL(38,0), so no float ever appears and the report is
    engine-replayable: emd_ppm = 10^6 · EMD exactly floored.
    ``t_violation`` flags classes with ``emd_ppm > t_ppm``.

    Shape: one fact aggregate on (quasi, sensitive), one on sensitive
    (global), one on quasi (class sizes); the audit grid is classes ×
    sensitive-domain — governance-table-sized by definition of a
    quasi-identifier, never fact-sized. The prefix window runs per
    class over that grid. NULL sensitive values form a value of their
    own, ordered first (Spark and SQL NULLS FIRST agree)."""
    quasi = list(quasi_cols)
    # ONE fact scan: the (class × value) count table is the sufficient
    # statistic — global distribution, class sizes, N and m all derive
    # from it by summation, so they fold the checkpointed aggregate
    # (audit-sized) instead of each re-reading the fact (the audited
    # first cut scanned the table 5×, the recompute class every other
    # multi-consumer lane in this repo eliminates). The same property
    # is what makes the audit INCREMENTALLY MAINTAINABLE: per-batch
    # count deltas fold by sum (streaming/incremental.py's
    # t_closeness_versioned serves from a versioned delta log).
    per_class_val = (
        df.groupBy(*quasi, sensitive_col)
        .agg(F.count(F.lit(1)).alias("_c"))
        .localCheckpoint(eager=True)
    )
    return t_closeness_from_counts(
        per_class_val, quasi, sensitive_col, t_ppm, ordered=ordered
    )


def t_closeness_from_counts(
    per_class_val: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    t_ppm: int,
    ordered: bool = True,
) -> DataFrame:
    """The EMD lanes of :func:`t_closeness_report` over a precomputed
    ``(quasi…, sensitive, _c)`` count table — the shared tail of the
    batch operator and the versioned serving twin (the count table is
    the audit's sufficient statistic, so an incrementally-folded one
    must produce the identical report)."""
    quasi = list(quasi_cols)
    global_val = per_class_val.groupBy(sensitive_col).agg(
        F.sum("_c").alias("_g")
    )
    class_sizes = per_class_val.groupBy(*quasi).agg(
        F.sum("_c").alias("class_size")
    )
    totals = per_class_val.agg(
        F.sum("_c").alias("_total"),
    ).crossJoin(global_val.agg(F.count(F.lit(1)).alias("_m")))
    grid = class_sizes.crossJoin(global_val)
    joined = (
        grid.join(per_class_val, quasi + [sensitive_col], "left")
        .crossJoin(F.broadcast(totals))
        .select(
            *quasi,
            sensitive_col,
            "class_size",
            "_total",
            "_m",
            # cross-multiplied P−Q numerator: c·N − g·n (denominator
            # n·N shared by every term of the class)
            F.expr(
                "CAST(coalesce(_c, 0) AS DECIMAL(38,0)) * _total"
                " - CAST(_g AS DECIMAL(38,0)) * class_size"
            ).alias("_d"),
        )
    )
    if ordered:
        w = (
            Window.partitionBy(*quasi)
            .orderBy(F.col(sensitive_col).asc_nulls_first())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        # the final prefix is 0 by construction (both distributions
        # sum to 1), so summing |cum| over ALL m rows equals the
        # paper's m−1 prefix terms
        terms = joined.withColumn("_cum", F.sum("_d").over(w)).groupBy(
            *quasi
        ).agg(
            F.max("class_size").alias("class_size"),
            F.max("_total").alias("_total"),
            F.max("_m").alias("_m"),
            F.sum(F.abs(F.col("_cum"))).alias("_s"),
        )
        emd = F.expr(
            "CAST(_s * 1000000 div"
            " (CAST(class_size AS DECIMAL(38,0)) * _total * (_m - 1))"
            " AS BIGINT)"
        )
    else:
        terms = joined.groupBy(*quasi).agg(
            F.max("class_size").alias("class_size"),
            F.max("_total").alias("_total"),
            F.max("_m").alias("_m"),
            F.sum(F.abs(F.col("_d"))).alias("_s"),
        )
        emd = F.expr(
            "CAST(_s * 1000000 div"
            " (CAST(class_size AS DECIMAL(38,0)) * _total * 2)"
            " AS BIGINT)"
        )
    return (
        terms.withColumn("emd_ppm", emd)
        .withColumn("t_violation", F.col("emd_ppm") > t_ppm)
        .select(*quasi, "class_size", "emd_ppm", "t_violation")
    )


# Truncated discrete-Laplace lattice (r12): alpha = 1/2 (epsilon = ln 2
# per unit sensitivity), magnitudes 0..8, probabilities expressed over
# a denominator-768 integer lattice so the inverse-CDF walk is EXACT —
# thresholds are cumulative masses 256, 512, 640, 704, 736, 752, 760,
# 764 (tail mass folds into magnitude 8, the standard bounded-noise
# truncation). P(0) = 1/3, P(±k) = (1/3)/2^k each.
_DP_THRESHOLDS = [256, 512, 640, 704, 736, 752, 760, 764]
_DP_DEN = 768
_DP_HASH_MULT = 2654435761  # Knuth multiplicative (engine-portable)
_DP_HASH_MOD = 2**31


def dp_noisy_counts(
    df: DataFrame,
    group_col: str,
    seed: int = 0,
) -> DataFrame:
    """Differentially-private-shaped noisy counts (r12): per-group row
    counts plus TRUNCATED DISCRETE LAPLACE noise (two-sided geometric,
    alpha = 1/2 ⇒ epsilon = ln 2 per unit sensitivity, magnitudes
    clipped at 8 — the bounded-geometric mechanism production DP
    libraries ship), clamped at zero — the release-gating aggregate a
    training-data pipeline publishes instead of raw counts.

    The noise is DETERMINISTIC pseudo-noise: a Knuth multiplicative
    hash of (group key, seed) drives an exact inverse-CDF walk over a
    denominator-768 integer lattice (alpha = 1/2 makes every tail
    probability dyadic, so the lattice is exact — no float, no
    transcendental), which is what lets an iterative-free SQL oracle
    replay every noisy count bit-for-bit. Determinism-per-seed is
    also operationally right: re-running a release job must not leak
    a fresh noise draw per run (the averaging attack); rotate
    ``seed`` only across genuinely new releases.

    ``group_col`` must be integral (hash portability across engines);
    map string keys upstream. The hash multiply runs in DECIMAL(38,0)
    lanes (ADVICE r12): group keys |g| ≳ 4.3e9 would overflow int64
    under non-ANSI Spark and wrap silently, diverging from the
    arbitrary-precision oracle arithmetic — the same widening posture
    as ``hits_integer``/``ols_integer``. One map-combined aggregate;
    noise is scan-free column math on the group row. Returns
    ``(group, n_noisy)`` — deliberately NOT the true count."""
    g = F.col(group_col).cast("decimal(38,0)")
    h = F.pmod(
        g * F.lit(_DP_HASH_MULT) + F.lit(int(seed) * 97531),
        F.lit(_DP_HASH_MOD),
    ).cast("long")
    r = F.pmod(h, F.lit(_DP_DEN))
    mag = F.lit(8)
    for k in range(len(_DP_THRESHOLDS) - 1, -1, -1):
        mag = F.when(r < _DP_THRESHOLDS[k], F.lit(k)).otherwise(mag)
    sign = F.when(
        F.pmod(F.floor(h / _DP_DEN), F.lit(2)) == 0, F.lit(1)
    ).otherwise(F.lit(-1))
    return (
        df.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            group_col,
            F.greatest(
                F.lit(0), (F.col("_n") + sign * mag).cast("long")
            ).alias("n_noisy"),
        )
    )
