"""operators.privacy — k-anonymity / l-diversity audit and suppression
(the oracle queries in queries/ext_privacy.py cover the bulk path)."""

from __future__ import annotations

from pyspark.sql import functions as F

from incremental_github_data_pipeline_spark.operators.privacy import (
    k_anonymity_report,
    suppress_small_classes,
)

ROWS = [
    # (zip, age_band, diagnosis): class (z1, a) has 3 rows / 2 values,
    # class (z1, b) has 1 row, class (z2, a) has 2 rows / 1 value
    ("z1", "a", "flu"),
    ("z1", "a", "flu"),
    ("z1", "a", "cold"),
    ("z1", "b", "flu"),
    ("z2", "a", "cold"),
    ("z2", "a", "cold"),
]
SCHEMA = "zip string, age string, dx string"


def test_k_anonymity_and_l_diversity_flags(spark):
    rep = {
        (r["zip"], r["age"]): r
        for r in k_anonymity_report(
            spark.createDataFrame(ROWS, SCHEMA),
            ["zip", "age"],
            k=2,
            sensitive_col="dx",
            l=2,
        ).collect()
    }
    assert rep[("z1", "a")]["class_size"] == 3
    assert not rep[("z1", "a")]["k_violation"]
    assert not rep[("z1", "a")]["l_violation"]  # 2 distinct diagnoses
    assert rep[("z1", "b")]["k_violation"]  # singleton class
    # k-anonymous but homogeneous: every member's diagnosis leaks
    assert not rep[("z2", "a")]["k_violation"]
    assert rep[("z2", "a")]["l_violation"]


def test_report_without_sensitive_column_has_no_l_lane(spark):
    rep = k_anonymity_report(
        spark.createDataFrame(ROWS, SCHEMA), ["zip", "age"], k=2
    )
    assert "l_violation" not in rep.columns
    assert "n_sensitive" not in rep.columns


def test_suppression_drops_exactly_the_small_classes(spark):
    out = suppress_small_classes(
        spark.createDataFrame(ROWS, SCHEMA), ["zip", "age"], k=2
    )
    classes = {(r["zip"], r["age"]) for r in out.collect()}
    assert classes == {("z1", "a"), ("z2", "a")}
    assert out.count() == 5  # only the (z1, b) singleton is gone
    # and the released table is now k-anonymous at k=2
    rep = k_anonymity_report(out, ["zip", "age"], k=2)
    assert rep.filter("k_violation").count() == 0


def test_suppression_null_quasi_class_matches_audit(spark):
    """ADVICE r9: a NULL quasi value forms an equivalence class in the
    audit (groupBy groups NULLs), so a NULL-keyed class of size >= k
    must SURVIVE suppression — the old null-unsafe semi-join dropped
    every NULL-keyed row regardless of class size."""
    rows = [
        (None, "a", "flu"),
        (None, "a", "flu"),
        (None, "a", "cold"),  # NULL-zip class, size 3 -> keep at k=2
        ("z9", None, "flu"),  # singleton NULL-age class -> drop at k=2
        ("z1", "a", "flu"),
        ("z1", "a", "cold"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    # the audit says the NULL-zip class is k-anonymous at k=2
    rep = {
        (r["zip"], r["age"]): r
        for r in k_anonymity_report(df, ["zip", "age"], k=2).collect()
    }
    assert not rep[(None, "a")]["k_violation"]
    assert rep[("z9", None)]["k_violation"]
    # ... and suppression agrees with it
    out = suppress_small_classes(df, ["zip", "age"], k=2)
    classes = {(r["zip"], r["age"]) for r in out.collect()}
    assert classes == {(None, "a"), ("z1", "a")}
    assert out.count() == 5
    # the null-safe condition must still plan as a hash semi-join
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_generalize_to_k_climbs_exactly_as_needed(spark):
    from incremental_github_data_pipeline_spark.operators.privacy import (
        generalize_to_k,
        k_anonymity_report,
    )

    # zips z1a/z1b coarsen to z1; z2a stands alone
    rows = (
        [("z1a", "x")] * 2 + [("z1b", "x")] * 2 + [("z2a", "x")] * 4
    )
    df = spark.createDataFrame(rows, "zip string, seg string")

    def coarsen(d):
        return d.select(
            F.substring("zip", 1, 2).alias("zip"), "seg"
        )

    def star(d):
        return d.select(F.lit("*").alias("zip"), "seg")

    # k=2: already anonymous -> level 0, untouched values
    out, level, resid = generalize_to_k(df, ["zip", "seg"], 2, [coarsen, star])
    assert (level, resid) == (0, 0)
    assert {r["zip"] for r in out.collect()} == {"z1a", "z1b", "z2a"}

    # k=4: z1a/z1b classes (size 2) violate -> one coarsening step
    # fixes; generalization is FULL-DOMAIN (global recoding), so z2a
    # coarsens to z2 along with everyone else — uniform resolution,
    # the property that keeps released values join-compatible
    out, level, resid = generalize_to_k(df, ["zip", "seg"], 4, [coarsen, star])
    assert (level, resid) == (1, 0)
    assert {r["zip"] for r in out.collect()} == {"z1", "z2"}
    assert k_anonymity_report(out, ["zip", "seg"], 4).filter(
        "k_violation"
    ).count() == 0

    # k=9: even '*' (8 rows) violates -> ladder exhausts with residual
    out, level, resid = generalize_to_k(df, ["zip", "seg"], 9, [coarsen, star])
    assert level == 2 and resid == 1


def test_t_closeness_hand_computed_emd(spark):
    """r11: class a holds v={1,1,2}, class b v={2,3,3}, global uniform
    over {1,2,3} -> ordered EMD is exactly 1/3 for both classes
    (prefix |P-Q| sums (1/3 + 1/3) / (m-1=2)); categorical TV is also
    1/3. Integer ppm lanes must floor to 333333."""
    from incremental_github_data_pipeline_spark.operators.privacy import (
        t_closeness_report,
    )

    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 2), ("b", 2), ("b", 3), ("b", 3)],
        "q string, v int",
    )
    rows = {
        r["q"]: r
        for r in t_closeness_report(df, ["q"], "v", t_ppm=300_000).collect()
    }
    assert rows["a"]["emd_ppm"] == 333_333 and rows["a"]["t_violation"]
    assert rows["b"]["emd_ppm"] == 333_333
    ok = t_closeness_report(df, ["q"], "v", t_ppm=333_333).collect()
    assert not any(r["t_violation"] for r in ok)  # threshold exclusive
    cat = {
        r["q"]: r
        for r in t_closeness_report(
            df, ["q"], "v", t_ppm=300_000, ordered=False
        ).collect()
    }
    assert cat["a"]["emd_ppm"] == 333_333


def test_t_closeness_identical_distribution_is_zero(spark):
    from incremental_github_data_pipeline_spark.operators.privacy import (
        t_closeness_report,
    )

    # both classes mirror the global distribution exactly -> EMD 0
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 1), ("b", 2)], "q string, v int"
    )
    for ordered in (True, False):
        rows = t_closeness_report(
            df, ["q"], "v", t_ppm=0, ordered=ordered
        ).collect()
        assert all(r["emd_ppm"] == 0 for r in rows)
        assert not any(r["t_violation"] for r in rows)


def test_t_closeness_ordered_sees_distance_categorical_cannot(spark):
    """The ordered metric distinguishes NEAR misses from FAR ones.
    Global is (1/2, 1/4, 1/4) over v=1,2,3; class a displaces 1/4 of
    its mass ONE rank step (v3→v2), class b displaces 1/4 TWO steps
    (v3→v1): same categorical TV (both 250000 ppm), but ordered EMD
    125000 vs 250000 — the reason the paper uses EMD for numeric
    attributes."""
    from incremental_github_data_pipeline_spark.operators.privacy import (
        t_closeness_report,
    )

    rows_in = (
        [("a", 1), ("a", 2)]
        + [("b", 1)] * 3 + [("b", 2)]
        + [("c", 3)] * 2
    )
    df = spark.createDataFrame(rows_in, "q string, v int")
    ordered = {
        r["q"]: r["emd_ppm"]
        for r in t_closeness_report(df, ["q"], "v", t_ppm=0).collect()
    }
    cat = {
        r["q"]: r["emd_ppm"]
        for r in t_closeness_report(
            df, ["q"], "v", t_ppm=0, ordered=False
        ).collect()
    }
    assert cat["a"] == cat["b"] == 250_000
    assert ordered["a"] == 125_000
    assert ordered["b"] == 250_000


def test_dp_noisy_counts_lattice_and_determinism(spark):
    from incremental_github_data_pipeline_spark.operators.privacy import (
        dp_noisy_counts,
    )

    # 400 groups x 100 rows each: true count everywhere 100
    df = spark.range(40_000).select((F.col("id") % 400).alias("grp"))
    got = {
        r["grp"]: r["n_noisy"]
        for r in dp_noisy_counts(df, "grp", seed=3).collect()
    }
    assert len(got) == 400
    # truncated at magnitude 8, so every noisy count is within +-8
    assert all(92 <= v <= 108 for v in got.values())
    # alpha = 1/2: P(noise = 0) = 1/3 — empirically near 1/3 over the
    # deterministic hash lattice
    zeros = sum(1 for v in got.values() if v == 100)
    assert 90 <= zeros <= 175
    # both signs occur
    assert any(v < 100 for v in got.values())
    assert any(v > 100 for v in got.values())
    # same seed: identical; different seed: a different draw
    again = {
        r["grp"]: r["n_noisy"]
        for r in dp_noisy_counts(df, "grp", seed=3).collect()
    }
    assert again == got
    other = {
        r["grp"]: r["n_noisy"]
        for r in dp_noisy_counts(df, "grp", seed=4).collect()
    }
    assert other != got


def test_dp_noisy_counts_clamps_at_zero(spark):
    from incremental_github_data_pipeline_spark.operators.privacy import (
        dp_noisy_counts,
    )

    # single-row groups: negative draws must clamp to 0, never go below
    df = spark.range(400).select(F.col("id").alias("grp"))
    vals = [
        r["n_noisy"] for r in dp_noisy_counts(df, "grp", seed=1).collect()
    ]
    assert min(vals) == 0 and all(v >= 0 for v in vals)


def test_dp_noisy_counts_wide_keys_match_arbitrary_precision(spark):
    """ADVICE r12: keys |g| beyond ~4.3e9 overflowed the int64 hash
    multiply under non-ANSI Spark and wrapped silently; the
    DECIMAL(38,0) lane must reproduce arbitrary-precision arithmetic
    for huge (and negative) keys bit-for-bit."""
    from incremental_github_data_pipeline_spark.operators.privacy import (
        _DP_DEN,
        _DP_HASH_MOD,
        _DP_HASH_MULT,
        _DP_THRESHOLDS,
        dp_noisy_counts,
    )

    keys = [
        4_300_000_000_007,
        2**62 + 12345,
        -(2**61) - 99,
        -7,
        0,
        987_654_321_987,
    ]
    rows = [(k,) for k in keys for _ in range(5)]  # true count 5 each
    df = spark.createDataFrame(rows, "grp long")
    got = {
        r["grp"]: r["n_noisy"]
        for r in dp_noisy_counts(df, "grp", seed=11).collect()
    }

    def expect(k: int, n: int, seed: int) -> int:
        h = (k * _DP_HASH_MULT + seed * 97531) % _DP_HASH_MOD
        r = h % _DP_DEN
        mag = 8
        for i in range(len(_DP_THRESHOLDS) - 1, -1, -1):
            if r < _DP_THRESHOLDS[i]:
                mag = i
        sign = 1 if (h // _DP_DEN) % 2 == 0 else -1
        return max(0, n + sign * mag)

    assert got == {k: expect(k, 5, 11) for k in keys}
