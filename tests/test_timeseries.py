"""operators.timeseries — gap-fill/resample, weighted moving average,
TWAP, and exact z-score outliers on constructed frames (the oracle
queries in queries/ext_timeseries.py cover the bulk path)."""

from __future__ import annotations

import datetime as dt

import pytest

from incremental_github_data_pipeline_spark.operators.timeseries import (
    resample_ffill,
    time_weighted_avg,
    weighted_moving_avg,
    zscore_outliers,
)


def hr(h: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, h, 0, 0)


def test_resample_fills_gaps_and_flags_them(spark):
    # key "a": observations at hours 0, 1, 4 (gap at 2, 3);
    # key "b": single observation (degenerate 1-point grid).
    df = spark.createDataFrame(
        [("a", hr(0), 10), ("a", hr(1), 20), ("a", hr(4), 40), ("b", hr(2), 7)],
        "k string, t timestamp, v long",
    )
    out = {
        (r["k"], r["grid_ts"].hour): (r["value"], r["is_gap"])
        for r in resample_ffill(df, "k", "t", "v").collect()
    }
    assert out == {
        ("a", 0): (10, False),
        ("a", 1): (20, False),
        ("a", 2): (20, True),  # forward-filled from hour 1
        ("a", 3): (20, True),
        ("a", 4): (40, False),
        ("b", 2): (7, False),
    }


def test_resample_off_grid_observation_fills_next_point(spark):
    # Observation at 01:30 is not on the hourly grid: hour 1's grid
    # point (01:00) precedes it, hour 2's grid point carries its value
    # but is still a gap (no observation exactly on the grid).
    df = spark.createDataFrame(
        [("a", hr(1), 5), ("a", dt.datetime(2024, 1, 1, 1, 30), 9),
         ("a", hr(3), 1)],
        "k string, t timestamp, v long",
    )
    rows = {
        r["grid_ts"].hour: (r["value"], r["is_gap"])
        for r in resample_ffill(df, "k", "t", "v").collect()
    }
    assert rows == {1: (5, False), 2: (9, True), 3: (1, False)}


def test_weighted_moving_avg_warmup_and_weights(spark):
    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 20), ("a", 3, 30), ("a", 4, 40), ("a", 5, 0)],
        "k string, seq long, v long",
    )
    out = {
        r["seq"]: (r["wma_num"], r["wma"])
        for r in weighted_moving_avg(df, "k", "seq", "v", k=4).collect()
    }
    # warm-up rows (fewer than 4 predecessors) are NULL
    assert out[1] == (None, None)
    assert out[3] == (None, None)
    # seq=4: 4*40 + 3*30 + 2*20 + 1*10 = 300
    assert out[4] == (300, 30.0)
    # seq=5: 4*0 + 3*40 + 2*30 + 1*20 = 200
    assert out[5] == (200, 20.0)


def test_weighted_moving_avg_k1_is_identity(spark):
    df = spark.createDataFrame([("a", 1, 7)], "k string, seq long, v long")
    row = weighted_moving_avg(df, "k", "seq", "v", k=1).collect()[0]
    assert (row["wma_num"], row["wma"]) == (7, 7.0)
    with pytest.raises(ValueError):
        weighted_moving_avg(df, "k", "seq", "v", k=0)


def test_time_weighted_avg_closed_form(spark):
    # value 10 held 2s, value 40 held 6s, value 100 unweighted (last)
    df = spark.createDataFrame(
        [("a", 1, dt.datetime(2024, 1, 1, 0, 0, 0), 10),
         ("a", 2, dt.datetime(2024, 1, 1, 0, 0, 2), 40),
         ("a", 3, dt.datetime(2024, 1, 1, 0, 0, 8), 100)],
        "k string, id long, t timestamp, v long",
    )
    row = time_weighted_avg(df, "k", "t", "v", "id").collect()[0]
    assert row["n_obs"] == 3
    assert row["sum_dt_us"] == 8_000_000
    assert row["twap_num"] == 10 * 2_000_000 + 40 * 6_000_000
    assert row["twap"] == pytest.approx((20 + 240) / 8.0)


def test_time_weighted_avg_tied_timestamps_zero_weight(spark):
    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("a", 1, t0, 5), ("a", 2, t0, 9),
         ("a", 3, t0 + dt.timedelta(seconds=4), 1)],
        "k string, id long, t timestamp, v long",
    )
    row = time_weighted_avg(df, "k", "t", "v", "id").collect()[0]
    # id=1 holds 0us (tie), id=2 holds 4s, id=3 is last
    assert (row["sum_dt_us"], row["twap_num"]) == (4_000_000, 9 * 4_000_000)


def test_zscore_outliers_flags_planted_spike(spark):
    # 9 values of 100 and one 1000: mean 190, stddev ~270 -> only the
    # spike exceeds 2 sigma.
    rows = [("a", i, 100) for i in range(9)] + [("a", 99, 1000)]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    out = zscore_outliers(df, "g", "v").collect()
    flagged = sorted(r["id"] for r in out if r["is_outlier"])
    assert flagged == [99]


def test_zscore_outliers_constant_group_has_none(spark):
    df = spark.createDataFrame(
        [("a", i, 42) for i in range(5)], "g string, id long, v long"
    )
    assert all(
        not r["is_outlier"] for r in zscore_outliers(df, "g", "v").collect()
    )


class TestCusumAlarms:
    def test_prefix_identity_matches_sequential_recurrence(self, spark):
        from incremental_github_data_pipeline_spark.operators import (
            timeseries as ts_ops,
        )

        vals = [10, 10, 25, 30, 10, 2, 1, 10, 10, 40]
        rows = [("k", i, v, 10) for i, v in enumerate(vals)]
        df = spark.createDataFrame(
            rows, "k string, i long, v long, tgt long"
        )
        out = (
            ts_ops.cusum_alarms(
                df, "k", "i", "v", "tgt", slack=2, threshold=15
            )
            .orderBy("i")
            .collect()
        )
        # sequential reference: S+ = max(0, S+ + (v-12)), S- = max(0, S- + (8-v))
        sp = sn = 0
        for r, v in zip(out, vals):
            sp = max(0, sp + (v - 10 - 2))
            sn = max(0, sn + (10 - 2 - v))
            assert (r["s_pos"], r["s_neg"]) == (sp, sn), r
            assert r["alarm_pos"] == (sp > 15)
            assert r["alarm_neg"] == (sn > 15)
        # the spike run (25,30) must alarm upward; the dip run (2,1)
        # drains the statistic back down (31 -> 4) before the final
        # spike — the max(0,·) clamp in action, exact to the unit
        assert any(r["alarm_pos"] for r in out)
        assert out[3]["s_pos"] == 31 and out[8]["s_pos"] == 4

    def test_per_key_isolation_and_column_params(self, spark):
        from incremental_github_data_pipeline_spark.operators import (
            timeseries as ts_ops,
        )

        df = spark.createDataFrame(
            [
                ("a", 0, 100, 10, 0, 5),
                ("a", 1, 100, 10, 0, 5),
                ("b", 0, 10, 10, 0, 5),
            ],
            "k string, i long, v long, tgt long, slk long, thr long",
        )
        out = {
            (r["k"], r["i"]): r
            for r in ts_ops.cusum_alarms(
                df, "k", "i", "v", "tgt", slack="slk", threshold="thr"
            ).collect()
        }
        assert out[("a", 1)]["s_pos"] == 180  # 90 + 90, no cross-key leak
        assert out[("b", 0)]["s_pos"] == 0
        assert out[("a", 0)]["alarm_pos"] and not out[("b", 0)]["alarm_pos"]


class TestSeasonalDecompose:
    def test_identity_and_pure_cycle(self, spark):
        """A pure period-2 alternation with half_window=2 (full-period
        windows interior): every row must satisfy the additive identity
        vs = trend + seasonal + resid exactly, and the two phases'
        seasonal components must pull in opposite directions."""
        from incremental_github_data_pipeline_spark.operators import (
            timeseries as ts_ops,
        )

        rows = [("a", t, 10 if t % 2 == 0 else 20) for t in range(8)]
        df = spark.createDataFrame(rows, "k string, t long, v long")
        out = ts_ops.seasonal_decompose(
            df, "k", "t", "v", period=2, half_window=2, scale=100
        ).collect()
        assert len(out) == 8
        for r in out:
            assert r["val"] * 100 == (
                r["trend_s"] + r["seasonal_s"] + r["resid_s"]
            )
        ph = {r["phase"]: r["seasonal_s"] for r in out}
        assert ph[0] < 0 < ph[1]  # lows at even positions, highs at odd

    def test_envelope_violation_fails_loudly(self, spark):
        """ADVICE r9: _FDIV_OFFSET's non-negativity trick needs scaled
        values averaging under 10^10. Exceeding it used to silently
        flip trunc-vs-floor agreement between engines; the inline
        assert_true guard must turn that into a loud error instead."""
        from incremental_github_data_pipeline_spark.operators import (
            timeseries as ts_ops,
        )

        df = spark.createDataFrame(
            [("a", t, 10**7) for t in range(6)], "k string, t long, v long"
        )
        with pytest.raises(Exception, match="floor-div envelope"):
            ts_ops.seasonal_decompose(
                df, "k", "t", "v", period=3, scale=10**4
            ).collect()

    def test_constant_series_decomposes_to_trend_only(self, spark):
        from incremental_github_data_pipeline_spark.operators import (
            timeseries as ts_ops,
        )

        df = spark.createDataFrame(
            [("a", t, 7) for t in range(6)], "k string, t long, v long"
        )
        out = ts_ops.seasonal_decompose(
            df, "k", "t", "v", period=3, scale=100
        ).collect()
        for r in out:
            assert r["trend_s"] == 700
            assert r["seasonal_s"] == 0 and r["resid_s"] == 0


class TestTheilSen:
    def test_outlier_robust_and_negative_slopes(self, spark):
        from incremental_github_data_pipeline_spark.operators import (
            timeseries as ts_ops,
        )

        up = [("up", x, 2 * x) for x in range(9)] + [("up", 9, 1000)]
        down = [("dn", x, -3 * x) for x in range(9)]
        df = spark.createDataFrame(up + down, "k string, x long, y long")
        got = {
            r["k"]: r
            for r in ts_ops.theil_sen_slope(
                df, "k", "x", "y", scale=100
            ).collect()
        }
        # one wild outlier cannot drag the median off the true slope
        assert got["up"]["slope_s"] == 200
        assert got["up"]["n_points"] == 10 and got["up"]["n_pairs"] == 45
        # negative slope survives the offset floor division exactly
        assert got["dn"]["slope_s"] == -300

    def test_even_pair_count_picks_lower_median(self, spark):
        from incremental_github_data_pipeline_spark.operators import (
            timeseries as ts_ops,
        )

        # 4 points -> 6 pairs (even): lower median = 3rd slope
        df = spark.createDataFrame(
            [("a", 0, 0), ("a", 1, 10), ("a", 2, 10), ("a", 3, 30)],
            "k string, x long, y long",
        )
        [r] = ts_ops.theil_sen_slope(df, "k", "x", "y", scale=1).collect()
        # slopes: 10,5,10,0,10,20 sorted -> 0,5,10,10,10,20; rn3 = 10
        assert r["n_pairs"] == 6 and r["slope_s"] == 10

    def test_bucket_selection_matches_sort(self, spark):
        # r16: the opt-in two-pass bucket selection must be
        # BIT-IDENTICAL to the default sort selection — exercised on a
        # ties-heavy fixture (repeated slopes straddle bucket
        # boundaries), negative slopes, an outlier, and a 2-point key
        from incremental_github_data_pipeline_spark.operators import (
            timeseries as ts_ops,
        )

        rows = (
            [("up", x, 2 * x) for x in range(9)]
            + [("up", 9, 1000)]
            + [("dn", x, -3 * x + (x % 3)) for x in range(11)]
            + [("flat", x, 7) for x in range(8)]  # all slopes equal
            + [("two", 0, 5), ("two", 4, 1)]
        )
        df = spark.createDataFrame(rows, "k string, x long, y long")
        for scale in (1, 100):
            ref = {
                r["k"]: (r["n_points"], r["n_pairs"], r["slope_s"])
                for r in ts_ops.theil_sen_slope(
                    df, "k", "x", "y", scale=scale
                ).collect()
            }
            got = {
                r["k"]: (r["n_points"], r["n_pairs"], r["slope_s"])
                for r in ts_ops.theil_sen_slope(
                    df, "k", "x", "y", scale=scale, selection="bucket"
                ).collect()
            }
            assert got == ref and set(ref) == {"up", "dn", "flat", "two"}


class TestHoltLinear:
    def test_hand_computed_recurrence(self, spark):
        from incremental_github_data_pipeline_spark.operators.timeseries import (
            holt_linear,
        )

        df = spark.createDataFrame(
            [("a", 1, 10), ("a", 2, 14), ("a", 3, 9)],
            "k string, t long, v long",
        )
        rows = {
            r["t"]: r
            for r in holt_linear(
                df, "k", "t", "v", alpha=(3, 10), beta=(2, 10), scale=100
            ).collect()
        }
        # t1: lvl=1000, tr=0, fit NULL
        assert (rows[1]["level_s"], rows[1]["trend_s"]) == (1000, 0)
        assert rows[1]["fitted_s"] is None
        # t2: fit=1000; lvl=(3*1400+7*1000)//10=1120; tr=(2*120+0)//10=24
        assert rows[2]["fitted_s"] == 1000
        assert (rows[2]["level_s"], rows[2]["trend_s"]) == (1120, 24)
        # t3: fit=1144; lvl=(3*900+7*1144)//10=1070 (floor of 1070.8);
        # tr=(2*(1070-1120)+8*24)//10 = (-100+192)//10 = 9
        assert rows[3]["fitted_s"] == 1144
        assert (rows[3]["level_s"], rows[3]["trend_s"]) == (1070, 9)

    def test_falling_series_negative_trend(self, spark):
        from incremental_github_data_pipeline_spark.operators.timeseries import (
            holt_linear,
        )

        df = spark.createDataFrame(
            [("a", t, 100 - 10 * t) for t in range(8)],
            "k string, t long, v long",
        )
        rows = sorted(
            holt_linear(df, "k", "t", "v").collect(), key=lambda r: r["t"]
        )
        # a linearly falling series must converge to a negative trend
        assert rows[-1]["trend_s"] < 0
        # and the one-step fit tracks the fall (within smoothing lag)
        assert rows[-1]["fitted_s"] > rows[-1]["level_s"]

    def test_keys_are_independent(self, spark):
        from incremental_github_data_pipeline_spark.operators.timeseries import (
            holt_linear,
        )

        one = [("a", t, 7 * t + 3) for t in range(6)]
        two = [("b", t, 1000 - t) for t in range(6)]
        both = holt_linear(
            spark.createDataFrame(one + two, "k string, t long, v long"),
            "k", "t", "v",
        )
        solo = holt_linear(
            spark.createDataFrame(one, "k string, t long, v long"),
            "k", "t", "v",
        )
        a_both = sorted(
            [tuple(r) for r in both.filter("k = 'a'").collect()]
        )
        a_solo = sorted([tuple(r) for r in solo.collect()])
        assert a_both == a_solo

    def test_guards(self, spark):
        from incremental_github_data_pipeline_spark.operators.timeseries import (
            holt_linear,
        )

        df = spark.createDataFrame([("a", 1, 1)], "k string, t long, v long")
        with pytest.raises(ValueError, match="proper positive"):
            holt_linear(df, "k", "t", "v", alpha=(10, 3))
        big = spark.createDataFrame(
            [("a", t, 10**8) for t in range(4)], "k string, t long, v long"
        )
        with pytest.raises(Exception, match="envelope"):
            holt_linear(big, "k", "t", "v", scale=10**4).collect()


class TestAcf:
    """acf_integer (r11): the integer-exact biased ACF estimator."""

    def test_matches_numpy_reference(self, spark):
        import numpy as np

        from incremental_github_data_pipeline_spark.operators.timeseries import (
            acf_integer,
        )

        vals = [10, 20, 10, 0] * 6  # perfect period-4 signal
        df = spark.createDataFrame(
            [("a", t, v) for t, v in enumerate(vals)],
            "k string, t long, v long",
        )
        got = {
            r["lag"]: r for r in acf_integer(df, "k", "t", "v", 4).collect()
        }
        x = np.array(vals, float)
        xc = x - x.mean()
        c0 = (xc * xc).sum()
        for k in range(1, 5):
            want = int(np.floor((xc[:-k] * xc[k:]).sum() * 1e6 / c0))
            assert got[k]["rho_ppm"] == want, k
            assert got[k]["n_pairs"] == len(vals) - k
        assert got[4]["rho_ppm"] == 833_333  # the period shows at lag 4
        assert got[2]["rho_ppm"] == -916_667  # anti-phase at half period

    def test_constant_series_is_null_and_keys_isolated(self, spark):
        from incremental_github_data_pipeline_spark.operators.timeseries import (
            acf_integer,
        )

        rows = [("flat", t, 5) for t in range(10)] + [
            ("alt", t, 10 * (t % 2)) for t in range(10)
        ]
        df = spark.createDataFrame(rows, "k string, t long, v long")
        got = {
            (r["k"], r["lag"]): r["rho_ppm"]
            for r in acf_integer(df, "k", "t", "v", 2).collect()
        }
        assert got[("flat", 1)] is None and got[("flat", 2)] is None
        assert got[("alt", 1)] < 0 < got[("alt", 2)]


# ---------------------------------------------------------------------------
# Holt–Winters additive
# ---------------------------------------------------------------------------


class TestHoltWinters:
    def _run(self, spark, vals, period=2, **kw):
        from incremental_github_data_pipeline_spark.operators.timeseries import (
            holt_winters,
        )

        df = spark.createDataFrame(
            [("k", i, v) for i, v in enumerate(vals)],
            "k string, t long, x long",
        )
        rows = holt_winters(
            df, "k", "t", "x", period=period, scale=1, **kw
        ).orderBy("t").collect()
        return [
            (r["level_s"], r["trend_s"], r["seas_s"], r["fitted_s"])
            for r in rows
        ]

    def test_pure_cycle_fits_exactly(self, spark):
        # alternating 10/20, period 2, all smoothing 1/2: after init,
        # level stays 15, trend 0, seasonals ±5, every fit EXACT
        got = self._run(
            spark, [10, 20, 10, 20, 10, 20],
            alpha=(1, 2), beta=(1, 2), gamma=(1, 2),
        )
        assert got[0] == (15, 0, -5, None)
        assert got[1] == (15, 0, 5, None)
        for t, (lvl, tr, seas, fit) in enumerate(got[2:], start=2):
            assert (lvl, tr) == (15, 0)
            assert seas == (-5 if t % 2 == 0 else 5)
            assert fit == (10 if t % 2 == 0 else 20)

    def test_trend_is_learned(self, spark):
        # strictly rising series: trend must end positive and the level
        # must track upward
        got = self._run(
            spark, [10, 12, 14, 16, 18, 20, 22, 24],
            alpha=(5, 10), beta=(5, 10), gamma=(1, 10),
        )
        assert got[-1][1] > 0
        assert got[-1][0] > got[2][0]

    def test_short_key_gets_init_only(self, spark):
        got = self._run(spark, [7], period=4)
        assert got == [(7, 0, 0, None)]

    def test_multi_key_isolation(self, spark):
        from incremental_github_data_pipeline_spark.operators.timeseries import (
            holt_winters,
        )

        rows = [("a", i, 10 if i % 2 == 0 else 20) for i in range(6)]
        rows += [("b", i, 1000) for i in range(6)]
        df = spark.createDataFrame(rows, "k string, t long, x long")
        out = holt_winters(
            df, "k", "t", "x", period=2, scale=1,
            alpha=(1, 2), beta=(1, 2), gamma=(1, 2),
        )
        b_rows = out.filter("k = 'b'").orderBy("t").collect()
        # constant series: level pinned at 1000, seasonals 0, exact fit
        assert all(r["level_s"] == 1000 for r in b_rows)
        assert all(r["seas_s"] == 0 for r in b_rows)
        assert all(
            r["fitted_s"] == 1000 for r in b_rows if r["fitted_s"] is not None
        )

    def test_guards(self, spark):
        import pytest as _pytest

        from incremental_github_data_pipeline_spark.operators.timeseries import (
            holt_winters,
        )

        df = spark.createDataFrame([("k", 0, 1)], "k string, t long, x long")
        with _pytest.raises(ValueError, match="fraction"):
            holt_winters(df, "k", "t", "x", period=2, alpha=(10, 10))
        with _pytest.raises(ValueError, match="period"):
            holt_winters(df, "k", "t", "x", period=1)


class TestCCF:
    def _ccf(self, spark, rows, max_lag=2):
        from incremental_github_data_pipeline_spark.operators.timeseries import (
            ccf_integer,
        )

        df = spark.createDataFrame(
            rows, "k string, t long, x long, y long"
        )
        out = ccf_integer(df, "k", "t", "x", "y", max_lag=max_lag)
        return {
            (r["k"], r["lag"]): (r["beta_ppm"], r["gamma_ppm"], r["n_pairs"])
            for r in out.collect()
        }

    def test_identical_series_peak_at_zero(self, spark):
        rows = [("a", t, v, v) for t, v in enumerate([5, 9, 2, 7, 4, 8])]
        got = self._ccf(spark, rows)
        # x == y: both slopes exactly 1 at lag 0, r^2 = 1
        assert got[("a", 0)][:2] == (1000000, 1000000)

    def test_shifted_copy_peaks_at_its_lag(self, spark):
        base = [5, 9, 2, 7, 4, 8, 3, 6, 1, 9, 5, 2]
        rows = [
            ("a", t, base[t], base[t + 1]) for t in range(len(base) - 1)
        ]
        got = self._ccf(spark, rows)
        # y_t = x_{t+1} (y ANTICIPATES x): under c_xy(k) = sum u_t v_{t+k},
        # x_t pairs with the matching y one step EARLIER -> peak at lag -1
        b1 = abs(got[("a", -1)][0])
        assert all(
            b1 >= abs(v[0]) for k, v in got.items() if k[1] != -1
        )

    def test_constant_series_null_slope(self, spark):
        rows = [("a", t, 7, t * 3) for t in range(6)]
        got = self._ccf(spark, rows)
        # x constant: beta (div by c_xx = 0) NULL; gamma defined
        assert got[("a", 0)][0] is None
        assert got[("a", 0)][1] is not None

    def test_n_pairs_and_symmetric_lag_counts(self, spark):
        rows = [("a", t, t, t) for t in range(8)]
        got = self._ccf(spark, rows, max_lag=3)
        assert got[("a", 0)][2] == 8
        for k in (1, 2, 3):
            assert got[("a", k)][2] == 8 - k
            assert got[("a", -k)][2] == 8 - k


class TestOLS:
    def _fit(self, spark, rows):
        from incremental_github_data_pipeline_spark.operators.timeseries import (
            ols_integer,
        )

        df = spark.createDataFrame(rows, "k string, x long, y long")
        return {
            r["k"]: (r["n"], r["beta_ppm"], r["alpha_ppm"], r["r2_ppm"])
            for r in ols_integer(df, "k", "x", "y").collect()
        }

    def test_perfect_line_exact(self, spark):
        rows = [("a", x, 3 * x + 7) for x in range(10)]
        n, beta, alpha, r2 = self._fit(spark, rows)["a"]
        assert (n, beta, alpha) == (10, 3000000, 7000000)
        assert r2 == 999999  # floor of the exact 1.0 after ppm product

    def test_negative_slope_and_noise(self, spark):
        rows = [
            ("b", x, -2 * x + 100 + (1 if x % 3 == 0 else -1))
            for x in range(12)
        ]
        _, beta, alpha, r2 = self._fit(spark, rows)["b"]
        assert -2100000 < beta < -1900000
        assert 99000000 < alpha < 101000000
        assert 950000 < r2 < 1000000

    def test_constant_x_null_fit(self, spark):
        got = self._fit(spark, [("c", 5, 9), ("c", 5, 11)])["c"]
        assert got == (2, None, None, None)

    def test_constant_y_zero_slope_null_r2(self, spark):
        _, beta, alpha, r2 = self._fit(
            spark, [("d", x, 42) for x in range(6)]
        )["d"]
        assert (beta, alpha) == (0, 42000000)
        assert r2 is None  # c_yy = 0: correlation undefined
