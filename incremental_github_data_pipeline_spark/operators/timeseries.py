"""Time-series operators: fixed-grid resampling with forward fill,
linear-decay weighted moving averages, time-weighted averages (TWAP),
and exact-arithmetic z-score outlier detection.

No counterpart in the reference (`/root/reference` is batch ELT only);
this is the [EXT] hypertable-rollup capability class a large-scale
analytics engine needs (cf. SURVEY.md §2.10). Every operator is a pure
DataFrame composition — one shuffle on the series key, window functions
with explicit frames, and exact integer/decimal lanes wherever a result
must hash-match a foreign engine.

Scale notes (100 TB): all operators partition by the series key(s);
state per key is bounded (grid bounds are a 2-timestamp aggregate, the
moving-average frame is k rows, moments are 3 numbers). Nothing
collects to the driver. The grid explode in :func:`resample_ffill` is
output-sensitive — rows produced = Σ_key span/step — and happens AFTER
the per-key bounds aggregate, so a sparse key never pays for a dense
key's grid.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "cusum_alarms",
    "ewma_integer",
    "mad_outliers",
    "resample_ffill",
    "seasonal_decompose",
    "theil_sen_slope",
    "time_weighted_avg",
    "weighted_moving_avg",
    "zscore_outliers",
]


def _keys(key_cols: str | Sequence[str]) -> list[str]:
    return [key_cols] if isinstance(key_cols, str) else list(key_cols)


def resample_ffill(
    df: DataFrame,
    key_cols: str | Sequence[str],
    ts_col: str,
    value_col: str,
    step: str = "interval 1 hour",
    trunc_unit: str = "hour",
) -> DataFrame:
    """Resample an irregular series onto a fixed time grid with
    forward fill (the gap-fill / LOCF operation of time-series stores).

    Per key: the grid runs from ``date_trunc(trunc_unit, min(ts))`` to
    ``date_trunc(trunc_unit, max(ts))`` in ``step`` increments; each
    grid point carries the most recent observation at-or-before it
    (observations tie-sort BEFORE grid points at equal timestamps).
    Output: key columns + ``(grid_ts, value, is_gap)`` where ``is_gap``
    means no observation fell exactly on the grid point's timestamp.

    Callers must ensure at most one observation per (key, ts) — e.g.
    pre-aggregate to the grid resolution — otherwise the filled value
    at a tied timestamp is pick-any.

    Physical shape: per-key bounds aggregate (tiny, map-combined) →
    `sequence`/`explode` grid generation (no shuffle; output-sensitive)
    → union with observations → ONE window shuffle on the key.
    """
    keys = _keys(key_cols)
    vtype = df.schema[value_col].dataType
    obs = df.select(
        *keys, F.col(ts_col).alias("_ts"), F.col(value_col).alias("_v")
    )
    bounds = obs.groupBy(*keys).agg(
        F.date_trunc(trunc_unit, F.min("_ts")).alias("_lo"),
        F.date_trunc(trunc_unit, F.max("_ts")).alias("_hi"),
    )
    grid = bounds.select(
        *keys,
        F.explode(F.sequence("_lo", "_hi", F.expr(step))).alias("_ts"),
        F.lit(None).cast(vtype).alias("_v"),
        F.lit(1).alias("_is_grid"),
    )
    unioned = grid.unionByName(
        obs.select(*keys, "_ts", "_v", F.lit(0).alias("_is_grid"))
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("_ts", "_is_grid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *keys,
        "_ts",
        "_is_grid",
        F.last("_v", ignorenulls=True).over(w).alias("value"),
        F.last(
            F.when(F.col("_is_grid") == 0, F.col("_ts")), ignorenulls=True
        )
        .over(w)
        .alias("_last_obs_ts"),
    )
    return filled.filter(F.col("_is_grid") == 1).select(
        *keys,
        F.col("_ts").alias("grid_ts"),
        "value",
        (
            F.col("_last_obs_ts").isNull()
            | (F.col("_last_obs_ts") < F.col("_ts"))
        ).alias("is_gap"),
    )


def weighted_moving_avg(
    df: DataFrame,
    key_cols: str | Sequence[str],
    order_col: str,
    value_col: str,
    k: int = 4,
) -> DataFrame:
    """Linear-decay weighted moving average over the last ``k`` rows:
    weights ``k, k-1, …, 1`` (most recent first), denominator
    ``k(k+1)/2``. Rows with fewer than ``k`` predecessors get NULL
    (null lag propagates through the sum) — the standard "warm-up"
    contract, and the one that ports exactly to ANSI SQL.

    ``value_col`` should be an exact integer lane (e.g. cents) so the
    numerator ``wma_num`` is engine-exact; ``wma`` is then a single
    IEEE division of an exact integer — portable. Adds columns
    ``wma_num`` (long) and ``wma`` (double). One window shuffle.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    w = Window.partitionBy(*_keys(key_cols)).orderBy(order_col)
    num: Column = F.lit(k) * F.col(value_col)
    for j in range(1, k):
        num = num + F.lit(k - j) * F.lag(value_col, j).over(w)
    den = k * (k + 1) // 2
    return df.withColumn("wma_num", num.cast("long")).withColumn(
        "wma", F.col("wma_num").cast("double") / F.lit(float(den))
    )


def time_weighted_avg(
    df: DataFrame,
    key_cols: str | Sequence[str],
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Time-weighted average (TWAP): each observation's value is held
    until the next observation, so it is weighted by that interval's
    length in microseconds; the last observation per key carries no
    weight (no successor). Per key, emits::

        n_obs       observation count (long)
        sum_dt_us   total weighted span in microseconds (long)
        twap_num    Σ value·dt_us (long — exact if value is an integer
                    lane; the caller pre-scales e.g. to cents)
        twap        twap_num / sum_dt_us (one IEEE division — portable)

    ``tiebreak_col`` must make (key, ts, tiebreak) unique so LEAD is
    deterministic; tied timestamps contribute zero weight. A key whose
    observations all share one timestamp has ``sum_dt_us = 0`` and
    ``twap = NaN`` (0/0 — identical in any IEEE engine). One window
    shuffle on the key, then a map-combined aggregate.
    """
    keys = _keys(key_cols)
    w = Window.partitionBy(*keys).orderBy(ts_col, tiebreak_col)
    dt = (
        F.unix_micros(F.lead(ts_col, 1).over(w))
        - F.unix_micros(F.col(ts_col))
    ).alias("_dt_us")
    step = df.select(*keys, F.col(value_col).alias("_v"), dt)
    return step.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum("_dt_us").cast("long").alias("sum_dt_us"),
        F.sum(F.col("_v") * F.col("_dt_us")).cast("long").alias("twap_num"),
        (
            F.sum(F.col("_v") * F.col("_dt_us")).cast("double")
            / F.sum("_dt_us").cast("double")
        ).alias("twap"),
    )


def zscore_outliers(
    df: DataFrame,
    group_cols: str | Sequence[str],
    value_int_col: str,
    z_num: int = 2,
    z_den: int = 1,
) -> DataFrame:
    """Flag rows more than ``z = z_num/z_den`` population standard
    deviations from their group mean — WITHOUT any floating-point step,
    so the flag hash-matches any exact-arithmetic engine.

    The float form ``|v − s/n| > z·sqrt((n·ss − s²)/n²)`` is rearranged
    into the equivalent integer comparison::

        (n·v − s)² · z_den²  >  z_num² · (n·ss − s²)

    evaluated in DECIMAL(38,0) (the squared terms exceed int64 past
    ~10⁵ rows/group). ``value_int_col`` must be an integer lane.

    Returns the input plus ``is_outlier``. Physical shape: one
    map-combined moments aggregate (3 numbers per group) broadcast back
    onto the scan — no second shuffle of the fact.
    """
    keys = _keys(group_cols)
    v = F.col(value_int_col)
    m = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(v).alias("_s"),
        F.sum(v.cast("decimal(38,0)") * v).alias("_ss"),
    )
    j = df.join(F.broadcast(m), keys)
    dev = (F.col("_n") * v - F.col("_s")).cast("decimal(19,0)")
    n_var = F.col("_n").cast("decimal(19,0)") * F.col("_ss") - F.col(
        "_s"
    ).cast("decimal(19,0)") * F.col("_s")
    flag = (dev * dev * F.lit(z_den * z_den)) > (
        F.lit(z_num * z_num) * n_var
    )
    return j.withColumn("is_outlier", flag).drop("_n", "_s", "_ss")


def ewma_integer(
    df: DataFrame,
    key_cols: str | Sequence[str],
    order_col: str,
    val_col: str,
    num: int = 3,
    den: int = 10,
) -> DataFrame:
    """Exponentially weighted moving average as an INTEGER recurrence:
    r₀ = x₀, rₜ = (num·xₜ + (den−num)·rₜ₋₁) div den — smoothing factor
    α = num/den with every step integral, so the smoothed series is
    bit-identical in any engine replaying the recurrence (the same
    certifiable-iteration trick as integer PageRank and the ADPCM
    decoder; a float EWMA could never hash-match across engines).

    An EWMA is inherently sequential IN TIME but parallel ACROSS keys,
    so the physical shape is one shuffle on the key and an Arrow-batched
    per-key fold (applyInPandas) — correct for series that fit a task
    (hourly/daily rollups: thousands of points), which is what EWMAs
    are computed over; pre-aggregate first, exactly like the other
    grid operators in this module.

    CONTRACT: values must be non-negative (sums of positive cents are).
    Python ``//`` floors while SQL ``div`` truncates toward zero; they
    agree only on non-negative operands, and the operator raises on
    negative input rather than silently diverging from its oracle.
    """
    import pandas as pd

    keys = _keys(key_cols)
    out_schema = df.select(
        *keys, order_col, F.col(val_col).cast("long").alias(val_col)
    ).schema.add("ewma", "long", False)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(
            drop=True
        )
        xs = pdf[val_col].to_numpy()
        if (xs < 0).any():
            raise ValueError("ewma_integer requires non-negative values")
        r, out = None, []
        for x in xs:
            x = int(x)
            r = x if r is None else (num * x + (den - num) * r) // den
            out.append(r)
        pdf["ewma"] = out
        return pdf

    return (
        df.select(
            *keys, order_col, F.col(val_col).cast("long").alias(val_col)
        )
        .groupBy(*keys)
        .applyInPandas(fold, out_schema)
    )


def winsorize(
    df: DataFrame,
    key_cols: str | Sequence[str],
    val_col: str,
    lo_ppm: int = 10_000,
    hi_ppm: int = 990_000,
) -> DataFrame:
    """Per-key winsorization — the metric-cleaning step that tames
    heavy tails without dropping rows: values below the key's
    ``lo_ppm``-quantile clamp up to it, above the ``hi_ppm``-quantile
    clamp down. Quantiles are SELECTIONS, not interpolations: the
    element at ``row_number == max(1, ceil(q·n / 10^6))`` of the
    sorted multiset (ties broken by the value order itself), so both
    fences are actual data values and the whole transform is
    integer-exact and engine-portable — the same lower-median
    discipline as :func:`mad_outliers`.

    Returns the input rows plus ``lo_fence``, ``hi_fence``,
    ``winsorized`` and ``clipped`` (bool). One window shuffle on the
    key for the rank, fences broadcast back as per-key 1-row frames —
    pre-aggregate first for the usual grid contract at 100 TB."""
    if not (0 <= lo_ppm <= hi_ppm <= 1_000_000):
        raise ValueError("need 0 <= lo_ppm <= hi_ppm <= 1e6")
    keys = _keys(key_cols)
    vals = df.select(
        *df.columns, F.col(val_col).cast("long").alias("_x")
    )
    w = Window.partitionBy(*keys).orderBy("_x")
    wn = Window.partitionBy(*keys)
    # three consumers (both fences + the output rows) — materialize the
    # ranked series ONCE (the mad_outliers discipline; the input is a
    # pre-aggregated grid by module contract, so the pin is bounded)
    ranked = (
        vals.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wn))
        .localCheckpoint(eager=True)
    )

    def fence(ppm: int, out: str) -> DataFrame:
        # ceil(ppm*n/1e6) on positive operands: (a + b - 1) div b —
        # safe because div truncates toward zero == floors here
        target = F.greatest(
            F.lit(1), F.expr(f"({ppm} * _n + 999999) div 1000000")
        )
        return ranked.filter(F.col("_rn") == target).select(
            *keys, F.col("_x").alias(out)
        )

    lo = fence(lo_ppm, "lo_fence")
    hi = fence(hi_ppm, "hi_fence")
    out = (
        ranked.drop("_rn", "_n")
        .join(F.broadcast(lo), keys)
        .join(F.broadcast(hi), keys)
        .withColumn(
            "winsorized",
            F.least(F.greatest(F.col("_x"), F.col("lo_fence")),
                    F.col("hi_fence")),
        )
        .withColumn("clipped", F.col("winsorized") != F.col("_x"))
    )
    return out.drop("_x")


def holt_linear(
    df: DataFrame,
    key_cols: str | Sequence[str],
    order_col: str,
    val_col: str,
    alpha: tuple[int, int] = (3, 10),
    beta: tuple[int, int] = (2, 10),
    scale: int = 100,
) -> DataFrame:
    """Holt's linear-trend double exponential smoothing as an INTEGER
    recurrence — the short-horizon forecasting primitive (capacity
    planning, ingest-volume projection) in certifiable arithmetic:

        lvl₀ = s·x₀,   tr₀ = 0
        fitₜ  = lvlₜ₋₁ + trₜ₋₁                     (one-step forecast)
        lvlₜ  = fdiv(αn·s·xₜ + (αd−αn)·fitₜ, αd)
        trₜ   = fdiv(βn·(lvlₜ−lvlₜ₋₁) + (βd−βn)·trₜ₋₁, βd)

    with ``fdiv`` the :data:`_FDIV_OFFSET` floor division, so every
    lane is bit-identical in any engine replaying the recurrence (the
    oracle replays it as a recursive CTE, same trick as
    :func:`ewma_integer` — and unlike EWMA the offset fdiv makes
    NEGATIVE levels/trends safe, so falling series work). An h-step
    forecast from the last row is ``lvl + h·tr`` — plain column math
    the caller does; this returns the per-row state
    ``(keys…, order, val, level_s, trend_s, fitted_s)`` with
    ``fitted_s`` NULL on each key's first row.

    Sequential in time, parallel across keys: one shuffle on the key
    and an Arrow-batched per-key fold, the same contract (and the same
    pre-aggregated-grid expectation) as every operator in this module.
    The :data:`_FDIV_OFFSET` envelope is asserted per step — an
    out-of-range lane fails loudly, never silently diverges from the
    oracle."""
    import pandas as pd

    an, ad = alpha
    bn, bd = beta
    if not (0 < an < ad and 0 < bn < bd):
        raise ValueError("alpha/beta must be proper positive fractions")
    keys = _keys(key_cols)
    base = df.select(
        *keys, order_col, F.col(val_col).cast("long").alias(val_col)
    )
    # StructType.add mutates in place — build the output schema on a
    # COPY so base's own schema (which applyInPandas reads its input
    # columns from) stays untouched
    from pyspark.sql.types import StructType

    out_schema = (
        StructType(list(base.schema.fields))
        .add("level_s", "long", False)
        .add("trend_s", "long", False)
        .add("fitted_s", "long", True)
    )
    b = _FDIV_OFFSET

    def fdiv(n: int, d: int) -> int:
        if abs(n) >= d * b:
            raise ValueError(
                "holt_linear floor-div envelope exceeded (see _FDIV_OFFSET)"
            )
        return (n + d * b) // d - b

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(
            drop=True
        )
        lvl = tr = None
        levels, trends, fits = [], [], []
        for x in pdf[val_col].to_numpy():
            ys = int(x) * scale
            if lvl is None:
                lvl, tr, fit = ys, 0, None
            else:
                fit = lvl + tr
                new_lvl = fdiv(an * ys + (ad - an) * fit, ad)
                tr = fdiv(bn * (new_lvl - lvl) + (bd - bn) * tr, bd)
                lvl = new_lvl
            levels.append(lvl)
            trends.append(tr)
            fits.append(fit)
        pdf["level_s"] = levels
        pdf["trend_s"] = trends
        pdf["fitted_s"] = pd.array(fits, dtype="Int64")
        return pdf

    return base.groupBy(*keys).applyInPandas(fold, out_schema)


def cusum_alarms(
    df: DataFrame,
    key_cols: str | Sequence[str],
    order_col: str,
    val_col: str,
    target_col: str,
    slack: int | str = 0,
    threshold: int | str = 0,
) -> DataFrame:
    """CUSUM change-point detection (Page 1954) as pure WINDOW algebra:
    the textbook recurrence S⁺ₜ = max(0, S⁺ₜ₋₁ + (xₜ − target − slack))
    (and the mirrored S⁻ for downward shifts) looks sequential, but
    max(0, ·) folds admit the exact prefix identity

        Sₜ = Cₜ − min(0, min_{j≤t} Cⱼ),   C = running sum of the drift

    so the whole detector is two window passes — running sum, then
    running min over it — with NO stateful fold, no applyInPandas, no
    recursion: Catalyst plans it as one shuffle on the key. Every step
    is integer (drifts are differences of integer columns), so the
    statistic is bit-identical in any engine replaying the algebra —
    the certifiable-iteration discipline without the iteration.

    ``target_col`` is the per-key reference level (join a median or a
    known setpoint upstream); ``slack`` desensitizes small wobble;
    ``alarm_pos``/``alarm_neg`` fire while the statistic exceeds
    ``threshold``. ``slack``/``threshold`` take an int constant or a
    column name (per-key tuning, e.g. a fraction of the median). This is the monitoring variant WITHOUT post-alarm
    reset (alarms persist while the shift persists) — the reset
    variant needs a sequential fold; the no-reset form is what the
    prefix identity covers, stated honestly.

    Output: keys, order, value, target, s_pos, s_neg (longs),
    alarm_pos, alarm_neg (booleans). Reference n/a ([EXT] §2.10).
    """
    keys = _keys(key_cols)
    w = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    x = F.col(val_col).cast("long")
    t = F.col(target_col).cast("long")
    sl = (
        F.col(slack).cast("long") if isinstance(slack, str) else F.lit(slack)
    )
    th = (
        F.col(threshold).cast("long")
        if isinstance(threshold, str)
        else F.lit(threshold)
    )
    staged = df.select(
        *keys, order_col, x.alias(val_col), t.alias(target_col),
        sl.alias("_sl"), th.alias("_th"),
    ).select(
        "*",
        F.sum(x - t - F.col("_sl")).over(w).alias("_c_pos"),
        F.sum(t - F.col("_sl") - x).over(w).alias("_c_neg"),
    )
    return staged.select(
        *keys,
        order_col,
        val_col,
        target_col,
        (
            F.col("_c_pos")
            - F.least(F.lit(0), F.min("_c_pos").over(w))
        ).alias("s_pos"),
        (
            F.col("_c_neg")
            - F.least(F.lit(0), F.min("_c_neg").over(w))
        ).alias("s_neg"),
        F.col("_th"),
    ).select(
        *keys,
        order_col,
        val_col,
        target_col,
        "s_pos",
        "s_neg",
        (F.col("s_pos") > F.col("_th")).alias("alarm_pos"),
        (F.col("s_neg") > F.col("_th")).alias("alarm_neg"),
    )


def mad_outliers(
    df: DataFrame,
    key_cols: str | Sequence[str],
    val_col: str,
    k: int = 5,
) -> DataFrame:
    """Robust outlier detection per key via median absolute deviation:
    med = lower median of the values, mad = lower median of
    |x − med|, outlier ⇔ |x − med| > k·mad. Medians are the
    LOWER median (the element at row_number (n+1) div 2 of the sorted
    multiset) — a selection, not an interpolation, so the statistic is
    an actual data value and therefore integer-exact and engine-
    portable where an averaged even-count median is not. MAD tolerates
    the asymmetric spikes that wreck mean/stddev z-scores.

    Shape: the (usually pre-aggregated) series is materialized ONCE
    with localCheckpoint — four consumers (both medians, the deviation
    frame, the flag count) would otherwise each replay the upstream
    scan + aggregate (the first cut planned 7 fact scans). After that:
    two window shuffles on the key (one per median) plus broadcast
    joins of the per-key 1-row statistics back onto the rows; returns
    ``(keys..., n, med, mad, n_outliers)``.
    """
    keys = _keys(key_cols)

    def lower_median(frame: DataFrame, col: str, out: str) -> DataFrame:
        w = Window.partitionBy(*keys).orderBy(col)
        wn = Window.partitionBy(*keys)
        return (
            frame.select(
                *keys,
                F.col(col),
                F.row_number().over(w).alias("_rn"),
                F.count(F.lit(1)).over(wn).alias("_n"),
            )
            .filter(F.col("_rn") == F.expr("(_n + 1) div 2"))
            .select(*keys, F.col(col).alias(out), F.col("_n").alias("n"))
        )

    vals = df.select(
        *keys, F.col(val_col).cast("long").alias("x")
    ).localCheckpoint(eager=True)
    med = lower_median(vals, "x", "med")
    dev = vals.join(F.broadcast(med.select(*keys, "med")), keys).select(
        *keys, F.abs(F.col("x") - F.col("med")).alias("d")
    )
    mad = lower_median(dev, "d", "mad")
    flags = (
        vals.join(F.broadcast(med.select(*keys, "med")), keys)
        .join(F.broadcast(mad.select(*keys, "mad")), keys)
        .groupBy(*keys)
        .agg(
            F.sum(
                (F.abs(F.col("x") - F.col("med")) > F.lit(k) * F.col("mad"))
                .cast("long")
            ).alias("n_outliers")
        )
    )
    return (
        med.select(*keys, "n", "med")
        .join(mad.select(*keys, "mad"), keys)
        .join(flags, keys)
    )


# Offset that makes every integral division in the decomposition /
# Theil-Sen operators act on a NON-NEGATIVE numerator. Spark ``div``
# and DuckDB ``//`` both truncate toward zero (measured: -7//3 = -2 in
# DuckDB), but Python ``//`` floors — and these operators' recurrences
# are also replayed by plain-Python property tests. On a non-negative
# numerator floor and truncation coincide, so computing
# ``((num + den*B) div den) - B`` pins ONE answer for all three
# evaluators while leaving the quotient unchanged. B bounds |num/den|
# at 10^10 — far above any scaled cents lane — while keeping ``den*B``
# within int64 for den ≤ ~10^5. The bound is ENFORCED row-by-row (see
# _floor_div_expr): an out-of-envelope lane must fail loudly, not
# silently flip trunc-vs-floor agreement between engines and surface
# as an unexplainable cross-engine hash mismatch (ADVICE r9).
_FDIV_OFFSET = 10**10


def _floor_div_expr(num: str, den: str) -> str:
    """SQL text for floor(num/den) valid for signed ``num`` (den > 0).

    Guarded: the non-negativity trick requires ``|num| < den*B`` (i.e.
    per-row scaled values averaging under 10^10) and ``den*B`` within
    int64. ``assert_true`` enforces both inline — NULL (additive zero)
    when the envelope holds, a loud error when it doesn't — so the
    check is a codegen'd branch per row, not an extra pass over the
    data. Spark-only text; oracle SQL twins restate the arithmetic
    without the guard (DuckDB HUGEINT never wraps, and a Spark-side
    failure aborts the compare anyway)."""
    b = _FDIV_OFFSET
    den_max = (2**63 - 1) // b
    guard = (
        f"ifnull(assert_true(abs({num}) < ({den}) * {b} "
        f"AND ({den}) <= {den_max}, "
        f"'floor-div envelope exceeded: |num| must stay under den*1e10 "
        f"(see _FDIV_OFFSET)'), 0)"
    )
    return f"((({num}) + ({den}) * {b} + {guard}) div ({den})) - {b}"


def seasonal_decompose(
    df: DataFrame,
    key_cols: str | Sequence[str],
    order_col: str,
    val_col: str,
    period: int,
    half_window: int | None = None,
    scale: int = 10**4,
) -> DataFrame:
    """Classic additive seasonal decomposition — value = trend +
    seasonal + residual — as pure window algebra, no model fit:

    * ``trend``    : centered moving average over ``2·half_window + 1``
      rows (default ``period // 2`` each side; edge rows use their
      partial window, the standard convention),
    * ``seasonal`` : per-(key, phase) mean of the detrended series,
      where ``phase = (row position in the key's order) mod period``,
    * ``residual`` : value − trend − seasonal.

    All three lanes are SCALED-INTEGER (``scale``, floor divisions via
    the :data:`_FDIV_OFFSET` shift), so the decomposition is
    bit-identical in any exact-arithmetic engine — the certifiable
    analogue of statsmodels' seasonal_decompose(model="additive"),
    minus the seasonal re-centering nicety (means are reported as-is;
    subtracting the grand seasonal mean is one more subtraction the
    caller can do).

    Intended for PRE-AGGREGATED grids (hourly/daily rollups), like
    every operator in this module. Physical shape: ONE shuffle on the
    key for the row-number + moving-average window, one tiny
    (key × period)-row aggregate for the seasonal means joined back by
    broadcast — the fact frame never shuffles twice.

    Returns keys, order, ``val`` (long), ``phase`` and the three
    ``*_s`` scaled lanes.
    """
    keys = _keys(key_cols)
    h = period // 2 if half_window is None else half_window
    w = Window.partitionBy(*keys).orderBy(order_col)
    wc = w.rowsBetween(-h, h)
    base = (
        df.select(
            *keys, order_col, F.col(val_col).cast("long").alias("val")
        )
        .withColumn("_vs", F.col("val") * scale)
        .withColumn(
            "phase", (F.row_number().over(w) - 1) % period
        )
        .withColumn("_tsum", F.sum("_vs").over(wc))
        .withColumn("_tcnt", F.count("_vs").over(wc))
        .withColumn("trend_s", F.expr(_floor_div_expr("_tsum", "_tcnt")))
        .withColumn("_detr", F.col("_vs") - F.col("trend_s"))
    )
    seasonal = (
        base.groupBy(*keys, "phase")
        .agg(
            F.sum("_detr").alias("_ssum"),
            F.count(F.lit(1)).alias("_scnt"),
        )
        .withColumn("seasonal_s", F.expr(_floor_div_expr("_ssum", "_scnt")))
        .select(*keys, "phase", "seasonal_s")
    )
    return (
        base.join(F.broadcast(seasonal), [*keys, "phase"])
        .withColumn(
            "resid_s", F.col("_vs") - F.col("trend_s") - F.col("seasonal_s")
        )
        .select(
            *keys, order_col, "val", "phase", "trend_s", "seasonal_s",
            "resid_s",
        )
    )


def theil_sen_slope(
    df: DataFrame,
    key_cols: str | Sequence[str],
    x_col: str,
    y_col: str,
    scale: int = 10**4,
    selection: str = "sort",
) -> DataFrame:
    """Theil–Sen robust trend estimate per key: the MEDIAN of all
    pairwise slopes ``(y_j − y_i) / (x_j − x_i)`` over ``x_i < x_j`` —
    the 29%-breakdown-point alternative to least squares that one
    outlier can't drag. Slopes are scaled-integer floor divisions
    (:data:`_FDIV_OFFSET` shift handles negative rises), the median is
    the LOWER median picked by row_number over (slope, x_i, x_j) — an
    actual pair's slope, deterministic under ties — so the estimate is
    bit-identical across engines.

    ``x_col`` and ``y_col`` must be integer lanes (epoch hours, cents).
    Returns one row per key: ``n_points``, ``n_pairs``,
    ``slope_s`` (scaled by ``scale``).

    Scale contract: pairs grow O(g²) in the per-key GRID length g, not
    in the raw data — run it on the pre-aggregated series (hourly grid:
    ~10³ points → ~10⁶ pairs per key, each a few longs). The self-join
    shuffles on the key once; skew equals grid-length skew, which is
    bounded by the grid, not by row counts.

    ``selection`` (r16, VERDICT r15 task 4): ``"sort"`` (default) is
    the classic shape — one per-key self-join, one per-key window sort
    over all pairs. ``"bucket"`` is a two-pass distributed selection,
    bit-identical output (pinned by
    test_timeseries.py::test_bucket_selection_matches_sort):

    * The pair join is BANDED: each point gets a block id from its
      x-position (``n_blocks`` equal x-ranges per key) and side A
      explodes to every block ≥ its own, so the join key is
      ``(key, block)`` — ``n_blocks×`` the parallelism of the plain
      per-key self-join (which ran ≤ #keys tasks), with the identical
      pair set: a pair lands exactly once, at B's block.
    * The lower median is found by TWO-PASS SELECTION instead of a
      row_number over all O(g²) pairs per key: pass 1 histograms the
      slopes into per-key buckets (map-side partial aggregation — only
      bucket counts shuffle, not pairs) and locates the bucket holding
      global rank r = (n_pairs+1) div 2; pass 2 re-generates the pairs
      and ranks ONLY the target bucket's rows. Bucketing is by
      ``_slope_s div w`` with a per-key constant width w ≥ 1 —
      integral ``div`` is monotone, so bucket order coarsens slope
      order and equal slopes share a bucket; the global rank of a row
      in the target bucket is (pairs in earlier buckets) + (its rank
      within the bucket under the same (slope, x1, x2) order), which
      pins the SAME row the old single-window form picked. (x1, x2)
      identifies a pair uniquely per key, so the order is total and
      the selection deterministic. n_pairs = Σ bucket counts, exact.

    w derives from the per-key y-range via double math — any positive
    per-key constant is CORRECT (only bucket granularity changes), so
    the double rounding is a performance knob, not a semantics one.
    Worst case (all slopes equal) every pair lands in one bucket and
    pass 2 degrades to the old full sort; typical series spread over
    ~``n_buckets`` buckets and pass 2 sorts ~n_pairs/n_buckets rows.

    WHY "sort" STAYS THE DEFAULT (measured, r16): at the operator's own
    scale contract the grid is pre-aggregated (~10³ points → ≤ ~5·10⁵
    pairs per key, a few MB), so the per-key sort is ~tens of ms of
    real work at ANY data volume — parallelism at scale comes from the
    KEY COUNT, which grows with the data. The bucket path replaces one
    window with two distributed passes (+8 scheduler jobs measured:
    8 → 16 jobs, 2.10 s → 3.09 s at sf0.1 where the 5-key fixture
    makes the whole lane job-floor-bound). It wins only when a single
    key's grid is allowed to grow unboundedly, which the module
    contract forbids — kept as an opt-in for such deployments, with
    the equivalence pinned by test.
    """
    if selection not in ("sort", "bucket"):
        raise ValueError("selection must be 'sort' or 'bucket'")
    keys = _keys(key_cols)
    if selection == "sort":
        pts = df.select(
            *keys,
            F.col(x_col).cast("long").alias("_x"),
            F.col(y_col).cast("long").alias("_y"),
        )
        a = pts.select(
            *keys, F.col("_x").alias("_x1"), F.col("_y").alias("_y1")
        )
        b = pts.select(
            *keys, F.col("_x").alias("_x2"), F.col("_y").alias("_y2")
        )
        pairs = (
            a.join(b, keys)
            .filter(F.col("_x1") < F.col("_x2"))
            .withColumn(
                "_slope_s",
                F.expr(
                    _floor_div_expr(
                        f"(_y2 - _y1) * {scale}", "(_x2 - _x1)"
                    )
                ),
            )
        )
        wm = Window.partitionBy(*keys).orderBy("_slope_s", "_x1", "_x2")
        ranked = pairs.withColumn(
            "_rn", F.row_number().over(wm)
        ).withColumn(
            "_np", F.count(F.lit(1)).over(Window.partitionBy(*keys))
        )
        n_pts = pts.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_points"))
        return (
            ranked.filter(F.col("_rn") == F.expr("(_np + 1) div 2"))
            .select(
                *keys,
                F.col("_np").alias("n_pairs"),
                F.col("_slope_s").alias("slope_s"),
            )
            .join(F.broadcast(n_pts), keys)
            .select(*keys, "n_points", "n_pairs", "slope_s")
        )
    n_blocks = 16
    n_buckets = 4096
    # the grid is a pre-aggregated series by module contract — pin it
    # once; four consumers (stats + both pair passes + n_points) must
    # not re-run the upstream pre-aggregate
    pts = df.select(
        *keys,
        F.col(x_col).cast("long").alias("_x"),
        F.col(y_col).cast("long").alias("_y"),
    ).localCheckpoint(eager=True)
    stats = pts.groupBy(*keys).agg(
        F.min("_x").alias("_xmin"),
        F.max("_x").alias("_xmax"),
        F.min("_y").alias("_ymin"),
        F.max("_y").alias("_ymax"),
        F.count(F.lit(1)).alias("n_points"),
    )
    # slope-bucket width: |slope_s| ≤ (ymax−ymin)·scale (x2−x1 ≥ 1), so
    # ~n_buckets buckets cover the range; computed in double (no
    # overflow hazard) and clamped ≥ 1 — correctness needs only a
    # positive per-key constant
    w_expr = F.greatest(
        F.lit(1).cast("long"),
        (
            (F.col("_ymax") - F.col("_ymin")).cast("double")
            * F.lit(2.0 * scale / n_buckets)
        ).cast("long"),
    )
    blk = F.expr(
        f"((_x - _xmin) * {n_blocks}) div (_xmax - _xmin + 1)"
    )  # non-negative ints, den ≥ 1: always in [0, n_blocks-1]

    def _pairs():
        p = pts.join(F.broadcast(stats), keys).select(
            *keys,
            "_x",
            "_y",
            blk.cast("long").alias("_blk"),
            w_expr.alias("_w"),
        )
        a = p.select(
            *keys,
            F.col("_x").alias("_x1"),
            F.col("_y").alias("_y1"),
            F.explode(
                F.sequence(
                    F.col("_blk"), F.lit(n_blocks - 1).cast("long")
                )
            ).alias("_b2"),
            "_w",
        )
        b = p.select(
            *keys,
            F.col("_x").alias("_x2"),
            F.col("_y").alias("_y2"),
            F.col("_blk").alias("_b2"),
        )
        # the slope expression is guarded by WHEN(x1 < x2): the
        # optimizer infers isnotnull(_bk) from the pass-2 join key and
        # evaluates it inside THIS join's condition, i.e. before the
        # x1 < x2 filter — unguarded, the envelope assert_true inside
        # _floor_div_expr would fire on the x1 >= x2 rows (den ≤ 0)
        # that the filter is about to drop
        return (
            a.join(b, keys + ["_b2"])
            .filter(F.col("_x1") < F.col("_x2"))
            .withColumn(
                "_slope_s",
                F.when(
                    F.col("_x1") < F.col("_x2"),
                    F.expr(
                        _floor_div_expr(
                            f"(_y2 - _y1) * {scale}", "(_x2 - _x1)"
                        )
                    ),
                ),
            )
            .withColumn("_bk", F.expr("_slope_s div _w"))
        )

    hist = _pairs().groupBy(*keys, "_bk").agg(F.count(F.lit(1)).alias("_c"))
    wb = Window.partitionBy(*keys).orderBy("_bk")
    cum = hist.withColumn("_cum", F.sum("_c").over(wb)).withColumn(
        "_np", F.sum("_c").over(Window.partitionBy(*keys))
    )
    target = (
        cum.withColumn("_r", F.expr("(_np + 1) div 2"))
        .filter(
            (F.col("_cum") - F.col("_c") < F.col("_r"))
            & (F.col("_r") <= F.col("_cum"))
        )
        .select(
            *keys,
            "_bk",
            (F.col("_cum") - F.col("_c")).alias("_before"),
            "_np",
            "_r",
        )
    )
    wm = Window.partitionBy(*keys).orderBy("_slope_s", "_x1", "_x2")
    return (
        _pairs()
        .join(F.broadcast(target), keys + ["_bk"])
        .withColumn("_rn", F.row_number().over(wm))
        .filter(F.col("_rn") == F.col("_r") - F.col("_before"))
        .join(F.broadcast(stats.select(*keys, "n_points")), keys)
        .select(
            *keys,
            "n_points",
            F.col("_np").alias("n_pairs"),
            F.col("_slope_s").alias("slope_s"),
        )
    )


def acf_integer(
    df: DataFrame,
    key_cols: str | Sequence[str],
    order_col: str,
    val_col: str,
    max_lag: int,
) -> DataFrame:
    """Autocorrelation function (r11) — the seasonality detector: a
    daily cycle in hourly data shows up as a ρ peak at lag 24 before
    anyone commits to a seasonal_decompose period. Per key and lag
    k = 1..``max_lag``, the standard biased estimator

        ρ_k = c_k / c_0,  c_k = Σ_{t≤n−k} (x_t − x̄)(x_{t+k} − x̄)

    kept INTEGER-EXACT end to end: with y_t = n·x_t − S (so y = n·(x −
    x̄), an integer), c_k scales to Σ y_t·y_{t+k}, and ρ lands as ONE
    offset floor division — ``rho_ppm = (Σ y_t y_{t+k} · 10⁶) fdiv
    (Σ y_t²)`` — computed in DECIMAL(38,0) (y ~ n·x can square past
    int64; the skew_report discipline) with the +den·B offset making
    floor and truncate agree across engines on negative correlations.
    ρ_ppm ∈ [−10⁶, 10⁶]; NULL when the series is constant (c_0 = 0 —
    autocorrelation of a flat line is undefined, not zero).

    CONTRACT — the series is the OBSERVED ordered sequence per key
    (lag = "k rows earlier", positions from row_number over
    ``order_col``): gap semantics belong to the caller (densify with
    resample_locf first when calendar lags must be calendar-true).
    Returns ``(keys…, lag, n_pairs, rho_ppm)``.

    Shape: one stats aggregate + one ordered window per key carrying
    ``max_lag`` leads (the grid is a pre-aggregated series by module
    contract — resolution, not data volume), then one aggregate; no
    self-join, no explode of the fact table."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    # two consumers (the stats aggregate and the lead window) —
    # materialize the series once so the upstream scan/pre-aggregate
    # runs exactly once (the winsorize discipline; the input is a
    # pre-aggregated grid by module contract, so the pin is bounded)
    df = df.localCheckpoint(eager=True)
    stats = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col(val_col).cast("long")).alias("_S"),
    )
    w = Window.partitionBy(*keys).orderBy(order_col)
    y = (
        df.join(stats, keys)
        .withColumn(
            "_y",
            (
                F.col("_n") * F.col(val_col).cast("long") - F.col("_S")
            ).cast("decimal(19,0)"),
        )
    )
    lead_cols = [
        F.lead("_y", k).over(w).alias(f"_y{k}") for k in range(1, max_lag + 1)
    ]
    prods = y.select(*keys, "_y", *lead_cols)
    aggs = [
        F.sum(
            (F.col("_y") * F.col("_y")).cast("decimal(38,0)")
        ).alias("_c0"),
    ]
    for k in range(1, max_lag + 1):
        aggs.append(
            F.sum(
                (F.col("_y") * F.col(f"_y{k}")).cast("decimal(38,0)")
            ).alias(f"_c{k}")
        )
        aggs.append(
            F.count(F.col(f"_y{k}")).alias(f"_np{k}")
        )
    per_key = prods.groupBy(*keys).agg(*aggs)
    b = 10**10
    lanes = [
        F.struct(
            F.lit(k).cast("long").alias("lag"),
            F.col(f"_np{k}").alias("n_pairs"),
            F.when(
                F.col("_c0") > 0,
                F.expr(
                    f"CAST((_c{k} * 1000000 + _c0 * {b}) div _c0"
                    f" - {b} AS BIGINT)"
                ),
            ).alias("rho_ppm"),
        )
        for k in range(1, max_lag + 1)
    ]
    return (
        per_key.select(*keys, F.explode(F.array(*lanes)).alias("_l"))
        .select(*keys, "_l.lag", "_l.n_pairs", "_l.rho_ppm")
    )


def holt_winters(
    df: DataFrame,
    key_cols: str | Sequence[str],
    order_col: str,
    val_col: str,
    period: int,
    alpha: tuple[int, int] = (3, 10),
    beta: tuple[int, int] = (2, 10),
    gamma: tuple[int, int] = (3, 10),
    scale: int = 100,
) -> DataFrame:
    """Holt–Winters ADDITIVE triple exponential smoothing as an INTEGER
    recurrence — the complete classical forecasting ladder's top rung
    (EWMA → Holt → Holt–Winters), in certifiable arithmetic. Unlike
    the ``q_ts_forecast_seasonal`` composition (decompose once, Holt
    the residual — seasonality FROZEN at fit time), HW re-estimates
    the seasonal profile every cycle, which is what tracks drifting
    seasonality on long-running ingest volumes.

    Initialization (first ``period`` rows per key): lvl = fdiv(Σ s·x,
    m), tr = 0, seasᵢ = s·xᵢ − lvl — the textbook first-cycle init.
    Then for each row t ≥ m, with sp = the seasonal fitted m steps
    ago:

        fitₜ  = lvl + tr + sp
        lvl′  = fdiv(αn·(s·xₜ − sp) + (αd−αn)·(lvl+tr), αd)
        tr′   = fdiv(βn·(lvl′−lvl) + (βd−βn)·tr, βd)
        seasₜ = fdiv(γn·(s·xₜ − lvl′) + (γd−γn)·sp, γd)

    Every lane is an offset floor division (:data:`_FDIV_OFFSET`), so
    level, trend, seasonal AND one-step fits are bit-identical in any
    engine replaying the recurrence — the oracle carries the m-slot
    seasonal state as a LIST column in a recursive CTE. An h-step
    forecast from the last row is ``lvl + h·tr + seas[(t+h) mod m]``
    — plain column math over this output.

    Keys with fewer than ``period`` rows get the init treatment only
    (lvl = mean of what exists, seas = deviations, fitted NULL) —
    deterministic, never a job-killing guard at 100 TB where stray
    short keys are a certainty. Sequential in time, parallel across
    keys: one key shuffle + Arrow-batched per-key fold, the module's
    standard contract, with the envelope asserted per step.

    Returns ``(keys…, order, val, level_s, trend_s, seas_s,
    fitted_s)`` — ``seas_s`` is the seasonal value SET at this row
    (init deviation for the first cycle, smoothed update after),
    ``fitted_s`` NULL through the first cycle.
    """
    import pandas as pd

    an, ad = alpha
    bn, bd = beta
    gn, gd = gamma
    if not (0 < an < ad and 0 < bn < bd and 0 < gn < gd):
        raise ValueError(
            "alpha/beta/gamma must be proper positive fractions"
        )
    if period < 2:
        raise ValueError("period must be at least 2")
    keys = _keys(key_cols)
    base = df.select(
        *keys, order_col, F.col(val_col).cast("long").alias(val_col)
    )
    from pyspark.sql.types import StructType

    out_schema = (
        StructType(list(base.schema.fields))
        .add("level_s", "long", False)
        .add("trend_s", "long", False)
        .add("seas_s", "long", False)
        .add("fitted_s", "long", True)
    )
    b = _FDIV_OFFSET

    def fdiv(n: int, d: int) -> int:
        if abs(n) >= d * b:
            raise ValueError(
                "holt_winters floor-div envelope exceeded "
                "(see _FDIV_OFFSET)"
            )
        return (n + d * b) // d - b

    m = period

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(
            drop=True
        )
        ys = [int(x) * scale for x in pdf[val_col].to_numpy()]
        n = len(ys)
        init_n = min(m, n)
        lvl = fdiv(sum(ys[:init_n]), init_n)
        tr = 0
        seas = [y - lvl for y in ys[:init_n]]
        levels = [lvl] * init_n
        trends = [0] * init_n
        seas_out = list(seas)
        fits: list[int | None] = [None] * init_n
        for t in range(m, n):
            sp = seas[t - m]
            fit = lvl + tr + sp
            new_lvl = fdiv(an * (ys[t] - sp) + (ad - an) * (lvl + tr), ad)
            tr = fdiv(bn * (new_lvl - lvl) + (bd - bn) * tr, bd)
            lvl = new_lvl
            s_new = fdiv(gn * (ys[t] - lvl) + (gd - gn) * sp, gd)
            seas.append(s_new)
            levels.append(lvl)
            trends.append(tr)
            seas_out.append(s_new)
            fits.append(fit)
        pdf["level_s"] = levels
        pdf["trend_s"] = trends
        pdf["seas_s"] = seas_out
        pdf["fitted_s"] = pd.array(fits, dtype="Int64")
        return pdf

    return base.groupBy(*keys).applyInPandas(fold, out_schema)


def ccf_integer(
    df: DataFrame,
    key_cols: str | Sequence[str],
    order_col: str,
    x_col: str,
    y_col: str,
    max_lag: int,
) -> DataFrame:
    """Cross-correlation function (r11) — :func:`acf_integer`'s
    two-series sibling, the lead/lag discoverer ("errors rise 2 hours
    after deploys"; "purchases trail clicks by a day"). Per key and
    lag k ∈ [−max_lag, +max_lag], over the aligned pair series, with
    u = n·x − Sx and v = n·y − Sy (integer centerings):

        c_xy(k) = Σ u_t · v_{t+k}     (negative k: x lags y)
        beta_ppm(k)  = c_xy(k)·10⁶ fdiv Σ u²   (slope of y on lagged x)
        gamma_ppm(k) = c_xy(k)·10⁶ fdiv Σ v²   (slope of x on lagged y)

    Pearson's r_k needs √(c_xx·c_yy) — irrational, uncertifiable. The
    two REGRESSION slopes need no square root, each is one offset
    floor division in DECIMAL(38,0), and their product IS r_k²
    (beta·gamma = c_xy²/(c_xx·c_yy)) — so callers threshold squared
    correlation exactly, and argmax |beta| over k finds the lead/lag
    without ever leaving integer arithmetic. NULL lanes when the
    corresponding denominator is zero (a constant series has no
    slope). Same contract as ACF: positions are observed row order
    per key (densify first for calendar-true lags), the input is a
    pre-aggregated grid by module contract.

    Shape: one stats aggregate + one ordered window per key carrying
    max_lag leads of BOTH series, one aggregate, no self-join."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    df = df.localCheckpoint(eager=True)
    stats = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col(x_col).cast("long")).alias("_Sx"),
        F.sum(F.col(y_col).cast("long")).alias("_Sy"),
    )
    w = Window.partitionBy(*keys).orderBy(order_col)
    base = df.join(stats, keys).select(
        *keys,
        F.col(order_col),
        (F.col("_n") * F.col(x_col).cast("long") - F.col("_Sx"))
        .cast("decimal(19,0)")
        .alias("_u"),
        (F.col("_n") * F.col(y_col).cast("long") - F.col("_Sy"))
        .cast("decimal(19,0)")
        .alias("_v"),
    )
    lead_cols = []
    for k in range(1, max_lag + 1):
        lead_cols.append(F.lead("_v", k).over(w).alias(f"_v{k}"))
        lead_cols.append(F.lead("_u", k).over(w).alias(f"_u{k}"))
    prods = base.select(*keys, "_u", "_v", *lead_cols)
    aggs = [
        F.sum((F.col("_u") * F.col("_u")).cast("decimal(38,0)")).alias(
            "_cxx"
        ),
        F.sum((F.col("_v") * F.col("_v")).cast("decimal(38,0)")).alias(
            "_cyy"
        ),
        F.sum((F.col("_u") * F.col("_v")).cast("decimal(38,0)")).alias(
            "_c0"
        ),
        F.count(F.lit(1)).alias("_np0"),
    ]
    for k in range(1, max_lag + 1):
        aggs.append(
            F.sum(
                (F.col("_u") * F.col(f"_v{k}")).cast("decimal(38,0)")
            ).alias(f"_cp{k}")
        )
        aggs.append(
            F.sum(
                (F.col(f"_u{k}") * F.col("_v")).cast("decimal(38,0)")
            ).alias(f"_cm{k}")
        )
        aggs.append(F.count(F.col(f"_v{k}")).alias(f"_np{k}"))
    per_key = prods.groupBy(*keys).agg(*aggs)
    b = 10**10

    def lane(k: int, c: str, np_col: str):
        return F.struct(
            F.lit(k).cast("long").alias("lag"),
            F.col(np_col).alias("n_pairs"),
            F.when(
                F.col("_cxx") > 0,
                F.expr(
                    f"CAST(({c} * 1000000 + _cxx * {b}) div _cxx"
                    f" - {b} AS BIGINT)"
                ),
            ).alias("beta_ppm"),
            F.when(
                F.col("_cyy") > 0,
                F.expr(
                    f"CAST(({c} * 1000000 + _cyy * {b}) div _cyy"
                    f" - {b} AS BIGINT)"
                ),
            ).alias("gamma_ppm"),
        )

    lanes = [lane(0, "_c0", "_np0")]
    for k in range(1, max_lag + 1):
        lanes.append(lane(k, f"_cp{k}", f"_np{k}"))
        lanes.append(lane(-k, f"_cm{k}", f"_np{k}"))
    return (
        per_key.select(*keys, F.explode(F.array(*lanes)).alias("_l"))
        .select(
            *keys, "_l.lag", "_l.n_pairs", "_l.beta_ppm", "_l.gamma_ppm"
        )
    )


def ols_integer(
    df: DataFrame,
    key_cols: str | Sequence[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-key simple linear regression (r11) — y ≈ β·x + α fitted by
    ordinary least squares, certifiable end to end:

        β_ppm  = c_xy·10⁶ fdiv c_xx        (c_* over u = n·x−Sx etc.)
        α_ppm  = (Sy·c_xx − Sx·c_xy)·10⁶ fdiv (n·c_xx)
        r²_ppm = β_ppm·γ_ppm fdiv 10⁶,  γ_ppm = c_xy·10⁶ fdiv c_yy

    The textbook formulas cleared of every division-before-the-end:
    centering happens as integer cross terms (the
    :func:`ccf_integer`/:func:`acf_integer` trick), products flow
    through DECIMAL(38,0), and each output is ONE offset floor
    division — Pearson's r itself needs an irrational square root,
    but r² = β·γ doesn't, so goodness-of-fit thresholds certify
    exactly. β/α in ppm of the y-per-x / y units. NULL β/α when x is
    constant, NULL r² when either series is constant. One map-combined
    aggregate per key: 6 sums, no window, no self-join — the cheapest
    operator in this module."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    d = df.select(
        *keys,
        F.col(x_col).cast("long").alias("_x"),
        F.col(y_col).cast("long").alias("_y"),
    )
    agg = d.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(
            (F.col("_x").cast("decimal(19,0)") * F.col("_x")).cast(
                "decimal(38,0)"
            )
        ).alias("_sxx"),
        F.sum(
            (F.col("_y").cast("decimal(19,0)") * F.col("_y")).cast(
                "decimal(38,0)"
            )
        ).alias("_syy"),
        F.sum(
            (F.col("_x").cast("decimal(19,0)") * F.col("_y")).cast(
                "decimal(38,0)"
            )
        ).alias("_sxy"),
    )
    b = 10**10
    # n·Σxy − Σx·Σy etc: the centered cross terms without any division
    cxy = "(CAST(_n AS DECIMAL(38,0)) * _sxy - CAST(_sx AS DECIMAL(19,0)) * _sy)"
    cxx = "(CAST(_n AS DECIMAL(38,0)) * _sxx - CAST(_sx AS DECIMAL(19,0)) * _sx)"
    cyy = "(CAST(_n AS DECIMAL(38,0)) * _syy - CAST(_sy AS DECIMAL(19,0)) * _sy)"
    beta = f"CAST(({cxy} * 1000000 + {cxx} * {b}) div {cxx} - {b} AS BIGINT)"
    gamma = f"CAST(({cxy} * 1000000 + {cyy} * {b}) div {cyy} - {b} AS BIGINT)"
    alpha = (
        f"CAST(((CAST(_sy AS DECIMAL(19,0)) * {cxx} - "
        f"CAST(_sx AS DECIMAL(19,0)) * {cxy}) * 1000000 "
        f"+ (CAST(_n AS DECIMAL(38,0)) * {cxx}) * {b}) div "
        f"(CAST(_n AS DECIMAL(38,0)) * {cxx}) - {b} AS BIGINT)"
    )
    return agg.select(
        *keys,
        F.col("_n").cast("long").alias("n"),
        F.when(F.expr(f"{cxx} > 0"), F.expr(beta)).alias("beta_ppm"),
        F.when(F.expr(f"{cxx} > 0"), F.expr(alpha)).alias("alpha_ppm"),
        F.when(
            F.expr(f"{cxx} > 0 AND {cyy} > 0"),
            # product in DECIMAL(38,0): beta·gamma = r²·10¹² is bounded
            # in exact arithmetic, but floor-rounded extremes near the
            # int64 edge must not be able to wrap in non-ANSI Spark —
            # ccf_integer never multiplies its two lanes; here we do,
            # so we widen first and only the final ppm comes back BIGINT
            F.expr(
                f"CAST((CAST(({beta}) AS DECIMAL(38,0)) * ({gamma}) "
                f"+ 1000000 * CAST({b} AS DECIMAL(38,0))) "
                f"div 1000000 - {b} AS BIGINT)"
            ),
        ).alias("r2_ppm"),
    )
