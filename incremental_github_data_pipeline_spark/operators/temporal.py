"""[EXT] Temporal joins Spark lacks natively: as-of join and range
(band) join — SURVEY.md §2.3's "engine gets them free" row extended to
the two time-series joins that are NOT free.

Both are implemented as compositions of existing DataFrame ops (the
preferred custom-operator tier), with shuffle volume bounded by design:

- as-of join: union the two sides, ONE shuffle on the join key, sort by
  time within the key, propagate the latest right payload with a
  running ``last(ignorenulls)`` window. No range explosion, no
  per-row probing — the classic scalable formulation.
- range join: bucketize time into band-width buckets; every left row
  probes at most 2 buckets (bucket width == band width), so the join is
  an equi-join on (key, bucket) + an exact band filter, never a theta
  join. Catalyst/AQE treat it like any other shuffle join, skew
  handling included.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    prefix: str = "asof_",
    direction: str = "backward",
    tolerance_s: float | None = None,
) -> DataFrame:
    """For every left row, attach the nearest right row per ``on`` key:
    backward = latest right with ``right_ts <= left_ts`` (inclusive),
    forward = earliest right with ``right_ts >= left_ts``. Left rows
    with no match keep nulls (left-join semantics). ``tolerance_s``
    (pandas ``merge_asof`` semantics) nulls out matches farther than
    the bound — e.g. "the next purchase within 24h" — evaluated in
    exact microsecond integers after the window fill, so it adds no
    shuffle.

    ``right`` should be unique per (``on``, ``right_ts``) — among
    equal-timestamp right rows the winner is otherwise unspecified
    (same caveat as DuckDB/pandas as-of).

    Plan shape: unionByName → one exchange on ``on`` → window sort by
    (ts, side) → filter. Cost is one shuffle of left+right, independent
    of match distances.
    """
    r_payload = F.struct(
        *[F.col(c) for c in right_cols],
        F.col(right_ts).alias("__rts"),
    )
    r_type = right.select(r_payload.alias("_r")).schema["_r"].dataType
    l_payload = F.struct(*[F.col(c) for c in left.columns])
    l_type = left.select(l_payload.alias("_l")).schema["_l"].dataType

    l_part = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        l_payload.alias("_l"),
        F.lit(None).cast(r_type).alias("_r"),
    )
    r_part = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_type).alias("_l"),
        r_payload.alias("_r"),
    )
    ts_order = F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    # right rows (_side=0) sort before left rows at equal ts → inclusive
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l_part.unionByName(r_part).withColumn(
        "_match", F.last("_r", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("_side") == 1)
    if tolerance_s is not None:
        tol_us = int(round(tolerance_s * 1_000_000))
        gap = F.abs(
            F.unix_micros(F.col("_match.__rts"))
            - F.unix_micros(F.col("_ts"))
        )
        out = out.withColumn(
            "_match", F.when(gap <= tol_us, F.col("_match"))
        )
    return out.select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_match.{c}").alias(f"{prefix}{c}") for c in right_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    lower_s: float,
    upper_s: float,
    right_cols: list[str],
    prefix: str = "r_",
) -> DataFrame:
    """Inner band join: pairs where
    ``left_ts + lower_s <= right_ts <= left_ts + upper_s`` and the
    ``on`` keys match (microsecond-exact bounds).

    Bucket width = band width, so each left row expands to at most two
    bucket probes and each right row lands in exactly one bucket — the
    standard trick that turns a range predicate into an equi-join.
    Right rows shuffle once; left rows at most double. AQE balances
    skewed (key, bucket) combinations like any other join.
    """
    width_us = int(round((upper_s - lower_s) * 1_000_000))
    if width_us <= 0:
        raise ValueError("upper_s must be > lower_s")
    lower_us = int(round(lower_s * 1_000_000))
    upper_us = int(round(upper_s * 1_000_000))

    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))

    l_buckets = F.array_distinct(
        F.array(
            F.floor((l_us + F.lit(lower_us)) / F.lit(width_us)),
            F.floor((l_us + F.lit(upper_us)) / F.lit(width_us)),
        )
    )
    lt = left.select(
        *[F.col(c) for c in left.columns],
        l_us.alias("_l_us"),
        F.explode(l_buckets).alias("_bucket"),
    )
    rt = right.select(
        *[F.col(c).alias(f"{prefix}{c}") for c in right_cols],
        *[F.col(c).alias(f"_r_{c}") for c in on],
        r_us.alias("_r_us"),
        F.floor(r_us / F.lit(width_us)).alias("_bucket"),
    )
    cond = lt["_bucket"] == rt["_bucket"]
    for c in on:
        cond = cond & (lt[c] == rt[f"_r_{c}"])
    band = (rt["_r_us"] >= lt["_l_us"] + F.lit(lower_us)) & (
        rt["_r_us"] <= lt["_l_us"] + F.lit(upper_us)
    )
    joined = lt.join(rt, cond, "inner")
    return joined.filter(band).select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"{prefix}{c}") for c in right_cols],
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    right_cols: list[str],
    bucket_s: float,
    prefix: str = "i_",
) -> DataFrame:
    """Inner interval-overlap join: pairs whose half-open intervals
    ``[left_start, left_end) × [right_start, right_end)`` overlap
    (``ls < re AND rs < le``, microsecond-exact) and whose ``on`` keys
    match. Empty intervals (end <= start) match nothing.

    Time is bucketized into ``bucket_s``-wide buckets; each row explodes
    to the buckets its interval spans and pairs meet in an equi-join on
    (key, bucket) — never a theta join. A pair spanning several shared
    buckets is emitted exactly once WITHOUT a dropDuplicates shuffle:
    only the bucket containing ``greatest(ls, rs)`` (the overlap's
    start) owns the match. Pick ``bucket_s`` near the typical interval
    length: explosion factor stays ~2 and the join shuffles once per
    bucket copy, AQE-balanced like any equi-join.
    """
    w_us = int(round(bucket_s * 1_000_000))
    if w_us <= 0:
        raise ValueError("bucket_s must be > 0")

    def spans(s_col: str, e_col: str):
        s_us = F.unix_micros(F.col(s_col))
        e_us = F.unix_micros(F.col(e_col))
        return s_us, e_us, F.sequence(
            F.floor(s_us / F.lit(w_us)), F.floor((e_us - 1) / F.lit(w_us))
        )

    ls_us, le_us, l_span = spans(left_start, left_end)
    lt = left.filter(le_us > ls_us).select(
        *[F.col(c) for c in left.columns],
        ls_us.alias("_ls"),
        le_us.alias("_le"),
        F.explode(l_span).alias("_bucket"),
    )
    rs_us, re_us, r_span = spans(right_start, right_end)
    rt = right.filter(re_us > rs_us).select(
        *[F.col(c).alias(f"{prefix}{c}") for c in right_cols],
        *[F.col(c).alias(f"_r_{c}") for c in on],
        rs_us.alias("_rs"),
        re_us.alias("_re"),
        F.explode(r_span).alias("_bucket"),
    )
    cond = lt["_bucket"] == rt["_bucket"]
    for c in on:
        cond = cond & (lt[c] == rt[f"_r_{c}"])
    overlap = (lt["_ls"] < rt["_re"]) & (rt["_rs"] < lt["_le"])
    owner = rt["_bucket"] == F.floor(
        F.greatest(lt["_ls"], rt["_rs"]) / F.lit(w_us)
    )
    return (
        lt.join(rt, cond, "inner")
        .filter(overlap & owner)
        .select(
            *[F.col(c) for c in left.columns],
            *[F.col(f"{prefix}{c}") for c in right_cols],
        )
    )
