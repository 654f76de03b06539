"""[EXT] Skew-handling operators (SURVEY.md §2.10 "salting for skew").

First line of defense is AQE: session.py enables
``spark.sql.adaptive.skewJoin`` which splits oversized sort-merge join
partitions at runtime. Salting is for the cases AQE cannot rewrite:

- ``salted_join`` — shuffle-hash/sort-merge equi-join where a handful
  of hot keys dominate: left rows get a random-but-deterministic salt
  in [0, buckets), right rows replicate ``buckets`` times, and the join
  key becomes (key, salt) — the hot key's rows spread over ``buckets``
  tasks at the cost of replicating the (small per key) right side.
- ``salted_aggregate`` — two-phase aggregation for monster keys whose
  *map-side partial* still overflows a single reduce task: partial agg
  on (key, salt), final combine on key. Only algebraic aggregates
  (sum/count/min/max) compose this way; avg = sum/count downstream.

Both are plan-shape identical to their unsalted twins in results —
tests assert equality — and both cost one extra narrow stage, so use
them on demonstrated skew, not by default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# phase-1 partial / phase-2 combine pairs for algebraic aggregates
_COMBINE = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def with_salt(df: DataFrame, buckets: int, salt_col: str = "_salt") -> DataFrame:
    """Deterministic pseudo-random salt in [0, buckets): hashed from the
    whole row's partition position, stable within a job, uniform across
    buckets. No RNG state, no shuffle."""
    return df.withColumn(
        salt_col,
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(buckets)).cast("int"),
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's hot keys spread over ``buckets``
    partitions. Right side replicates ``buckets``× (keep it the smaller
    input); result is exactly ``left.join(right, on, how)``.

    Supported ``how``: inner and the left-preserving variants — every
    left row keeps exactly one salt, so left/left_outer multiplicity is
    unchanged; right/full joins would multiply unmatched right rows
    ``buckets``× and are rejected.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "left_anti"):
        raise ValueError(f"salted_join does not support how={how!r}")
    lt = with_salt(left, buckets)
    rt = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)).cast("array<int>"))
    )
    return lt.join(rt, on + ["_salt"], how).drop("_salt")


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation. ``aggs`` maps output column →
    (fn, input column) with fn ∈ {sum, count, min, max}. Result equals
    ``df.groupBy(keys).agg(...)`` exactly (sums stay in the input type —
    cast upstream if overflow is possible)."""
    unknown = {fn for fn, _ in aggs.values()} - set(_COMBINE)
    if unknown:
        raise ValueError(f"non-algebraic aggregate(s): {sorted(unknown)}")
    salted = with_salt(df, buckets)
    partial = salted.groupBy(*keys, "_salt").agg(
        *[
            getattr(F, fn)(col).alias(out)
            for out, (fn, col) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            getattr(F, _COMBINE[fn])(out).alias(out)
            for out, (fn, _) in aggs.items()
        ]
    )


def salted_keep_first(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    buckets: int = 16,
) -> DataFrame:
    """Keep-FIRST dedup (the minimum row per key by ``order_cols``) as
    a two-phase salted aggregation (r13) — the skew-immune form of the
    ``row_number() == 1`` window. A window gathers ALL of a hot key's
    rows into one task and sorts them there, and AQE cannot help (its
    skew handling splits join and aggregate partitions, never window
    partitions), so one viral URL makes a straggler by construction.
    MIN over a (order, row) struct is algebraic: phase 1 map-combines
    one candidate per (key, salt) — the hot key's rows reduce inside
    every map task — and phase 2 folds ``buckets`` candidates per key.
    Result is exactly the window form's when ``order_cols`` is a total
    order (make it unique; residual ties resolve lexicographically by
    the remaining columns). Returns full rows, input column set."""
    candidate = F.struct(
        *[F.col(c) for c in order_cols],
        F.struct(*[F.col(c) for c in df.columns]).alias("_row"),
    )
    ph1 = with_salt(df, buckets).groupBy(*key_cols, "_salt").agg(
        F.min(candidate).alias("_c")
    )
    ph2 = ph1.groupBy(*key_cols).agg(F.min("_c").alias("_c"))
    return ph2.select("_c._row.*")


def skew_report(
    df: DataFrame,
    key_cols: list[str],
    top: int = 10,
) -> DataFrame:
    """Skew DIAGNOSTIC — the measurement that decides between plain
    shuffle, AQE skew-split, and :func:`salted_join`/:func:`
    salted_aggregate`: per top-``top`` heaviest key, its row count,
    integer parts-per-million share of the table, and the ratio to a
    perfectly uniform key's share. ratio_x1000 >= ~10000 (10x uniform)
    on a join/agg key is the act-now signal.

    One map-combined count aggregate + a TakeOrdered top-k over the
    (distinct-key-sized) count frame, with the two global scalars
    (total rows, distinct keys) broadcast from 1-row aggregates — no
    window, no sort of the full key space, nothing driver-sized.
    """
    keys = [F.col(k) for k in key_cols]
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("_total"),
        F.count(F.lit(1)).alias("_n_keys"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            *key_cols,
            "n_rows",
            # integer `div`, not float-divide-then-cast: the oracle
            # floors integers, and a float quotient can land on the
            # wrong side of a boundary. Intermediates go through
            # DECIMAL(38,0): at the target scale (1e13 total rows,
            # 1e8 distinct keys) n_rows * _n_keys * 1000 overflows
            # int64 silently in Spark while DuckDB promotes to
            # HUGEINT — decimal keeps both engines exact.
            F.expr(
                "CAST(n_rows AS DECIMAL(38,0)) * 1000000 div _total"
            ).alias("share_ppm"),
            # ratio vs a uniform key's expected rows, scaled x1000:
            # n_rows / (total / n_keys)
            F.expr(
                "CAST(n_rows AS DECIMAL(38,0)) * _n_keys * 1000 div _total"
            ).alias("ratio_x1000"),
        )
        .orderBy(F.col("n_rows").desc(), *key_cols)
        .limit(top)
    )


def suggest_skew_mitigation(
    df: DataFrame,
    key_cols: list[str],
    top: int = 10,
    aqe_ratio_x1000: int = 10_000,
    salt_ratio_x1000: int = 100_000,
    max_buckets: int = 64,
    for_aggregate: bool = False,
) -> dict:
    """Turn :func:`skew_report`'s measurement into a DECISION (r11,
    VERDICT r10 stretch — the report existed, the verdict was manual):

    - max ratio < ``aqe_ratio_x1000`` (default 10x uniform): ``"none"``
      — a plain shuffle is fine, AQE's default behavior absorbs it.
    - 10x..100x uniform on a JOIN key: ``"aqe"`` — sort-merge skew
      split (already on in session.py) rewrites the hot partition at
      runtime; returns the knob names so a non-default session can
      check itself. Aggregations skip this tier — AQE does not split
      aggregation shuffles, so ``for_aggregate=True`` escalates
      straight to salting.
    - >= ``salt_ratio_x1000`` (default 100x uniform): ``"salt"`` —
      recommend :func:`salted_join` / :func:`salted_aggregate` with
      ``buckets`` sized so the hottest key's per-task share drops back
      to ~``aqe_ratio_x1000``: the smallest power of two >=
      ratio/aqe_ratio, clamped to [2, ``max_buckets``] (a power of two
      keeps the salt modulo cheap and the task fan-out aligned with
      shuffle-partition counts).

    The decision input is the top-``top`` row collect of skew_report —
    bounded by construction (never data-sized). Returns a plain dict:
    ``verdict``, ``buckets`` (salt only), ``hot_keys`` (the rows at or
    above the AQE line), ``max_ratio_x1000``, ``max_share_ppm``, and
    ``aqe_settings``."""
    rows = skew_report(df, key_cols, top=top).collect()
    if not rows:
        return {
            "verdict": "none", "buckets": None, "hot_keys": [],
            "max_ratio_x1000": 0, "max_share_ppm": 0, "aqe_settings": {},
        }
    max_ratio = int(rows[0]["ratio_x1000"])
    max_share = int(rows[0]["share_ppm"])
    hot = [
        {k: r[k] for k in key_cols}
        | {"n_rows": r["n_rows"], "ratio_x1000": int(r["ratio_x1000"])}
        for r in rows
        if int(r["ratio_x1000"]) >= aqe_ratio_x1000
    ]
    aqe_settings = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "5",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "256MB",
    }
    if max_ratio < aqe_ratio_x1000:
        verdict, buckets = "none", None
    elif max_ratio < salt_ratio_x1000 and not for_aggregate:
        verdict, buckets = "aqe", None
    else:
        need = -(-max_ratio // aqe_ratio_x1000)  # ceil ratio/target
        buckets = 2
        while buckets < need and buckets < max_buckets:
            buckets *= 2
        verdict = "salt"
    return {
        "verdict": verdict,
        "buckets": buckets,
        "hot_keys": hot,
        "max_ratio_x1000": max_ratio,
        "max_share_ppm": max_share,
        "aqe_settings": aqe_settings if verdict == "aqe" else {},
    }


def apply_skew_mitigation(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    recommendation: dict,
    how: str = "inner",
) -> DataFrame:
    """Dispatch a :func:`suggest_skew_mitigation` verdict onto a join:
    ``"salt"`` routes through :func:`salted_join` with the recommended
    bucket count; ``"none"``/``"aqe"`` return the plain join (AQE's
    runtime rewrite needs no plan change — the settings just have to
    be on). Results are identical in every branch; only the physical
    spread differs."""
    if recommendation.get("verdict") == "salt":
        return salted_join(
            left, right, on, buckets=recommendation["buckets"], how=how
        )
    return left.join(right, on, how)
