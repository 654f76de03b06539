"""Incremental aggregate maintenance (operators/incremental_agg):
merge-order invariance, null handling in avg state, and the guard
against non-algebraic ops."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from incremental_github_data_pipeline_spark.operators.incremental_agg import (
    finalize_rollup,
    merge_rollups,
    partial_rollup,
)

MEASURES = {
    "n": ("count", None),
    "total": ("sum", "v"),
    "lo": ("min", "v"),
    "hi": ("max", "v"),
    "mean": ("avg", "v"),
}


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def batches(spark):
    def mk(rows):
        return spark.createDataFrame(rows, "k string, v double")

    return [
        mk([("a", 1.0), ("a", 3.0), ("b", 10.0)]),
        mk([("a", 5.0), ("c", -2.0)]),
        mk([("b", 0.5), ("c", None), ("d", 7.0)]),
    ]


def test_incremental_matches_full_recompute(spark, batches):
    full = batches[0].unionByName(batches[1]).unionByName(batches[2])
    expected = _rows(
        full.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(25,8)")).cast("double").alias("total"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
            (
                F.sum(F.col("v").cast("decimal(25,8)")).cast("double")
                / F.count("v")
            ).alias("mean"),
        )
    )
    state = partial_rollup(batches[0], ["k"], MEASURES)
    for b in batches[1:]:
        state = merge_rollups(state, partial_rollup(b, ["k"], MEASURES), ["k"], MEASURES)
    assert _rows(finalize_rollup(state, MEASURES)) == expected


def test_merge_is_order_invariant(spark, batches):
    parts = [partial_rollup(b, ["k"], MEASURES) for b in batches]
    left = merge_rollups(
        merge_rollups(parts[0], parts[1], ["k"], MEASURES), parts[2], ["k"], MEASURES
    )
    right = merge_rollups(
        parts[2], merge_rollups(parts[1], parts[0], ["k"], MEASURES), ["k"], MEASURES
    )
    assert _rows(finalize_rollup(left, MEASURES)) == _rows(
        finalize_rollup(right, MEASURES)
    )


def test_all_null_group_avg_is_null_count_counts_rows(spark):
    df = spark.createDataFrame([("x", None), ("x", None)], "k string, v double")
    out = finalize_rollup(partial_rollup(df, ["k"], MEASURES), MEASURES).collect()[0]
    assert out["n"] == 2  # count(*) counts rows
    assert out["mean"] is None  # avg over zero non-null inputs
    assert out["total"] is None and out["lo"] is None and out["hi"] is None


def test_non_algebraic_op_rejected(spark):
    df = spark.createDataFrame([("x", 1.0)], "k string, v double")
    with pytest.raises(ValueError, match="unsupported incremental op"):
        partial_rollup(df, ["k"], {"d": ("count_distinct", "v")})


def test_incremental_join_delta_identity_and_disjointness(spark):
    """old-join ∪ delta must equal the recomputed full join as a BAG
    (duplicate join keys multiply), and the three delta terms must not
    double-count."""
    from incremental_github_data_pipeline_spark.operators.incremental_agg import (
        incremental_join_delta,
    )

    a_old = spark.createDataFrame(
        [(1, "a1"), (2, "a2"), (2, "a2x")], "k long, av string"
    )
    da = spark.createDataFrame([(2, "a3"), (4, "a4")], "k long, av string")
    b_old = spark.createDataFrame(
        [(1, "b1"), (2, "b2")], "k long, bv string"
    )
    db = spark.createDataFrame([(2, "b3"), (4, "b4")], "k long, bv string")

    full = (
        a_old.unionByName(da).join(b_old.unionByName(db), ["k"])
    )
    old = a_old.join(b_old, ["k"])
    delta = incremental_join_delta(a_old, da, b_old, db, ["k"])
    combined = old.unionByName(delta)
    # bag equality via sorted tuples
    key = lambda r: (r["k"], r["av"], r["bv"])  # noqa: E731
    assert sorted(map(key, combined.collect())) == sorted(
        map(key, full.collect())
    )


def test_sketch_profile_shard_merge_matches_whole(spark):
    """Profiling shards then merging states must answer the same as
    profiling the whole table in one pass (state union is exact), and
    the KLL quantiles must sit within rank error of the exact values."""
    from incremental_github_data_pipeline_spark.operators.incremental_agg import (
        finalize_sketch_profile,
        merge_sketch_profiles,
        sketch_profile_state,
    )

    df = spark.range(20_000).selectExpr(
        "CAST(id % 4 AS INT) AS grp", "CAST(id AS DOUBLE) AS v"
    )
    whole = finalize_sketch_profile(
        sketch_profile_state(df, ["grp"], "v")
    )
    shards = [
        sketch_profile_state(df.filter(f"id % 2 = {i}"), ["grp"], "v")
        for i in (0, 1)
    ]
    merged = finalize_sketch_profile(
        merge_sketch_profiles(shards[0].unionByName(shards[1]), ["grp"])
    )
    w = {r["grp"]: r for r in whole.collect()}
    m = {r["grp"]: r for r in merged.collect()}
    for g in range(4):
        assert w[g]["n_rows"] == m[g]["n_rows"] == 5000
        # KLL rank error at default k is well under 2%; ids are uniform
        # so the p50 of group g is near the middle of its id range
        for p in ("p50", "p90", "p99"):
            assert abs(w[g][p] - m[g][p]) / 20_000 < 0.04
        # HLL estimate close to the true 5000 distinct values
        assert abs(w[g]["approx_distinct"] - 5000) / 5000 < 0.05
        assert abs(m[g]["approx_distinct"] - 5000) / 5000 < 0.05


# ---------------------------------------------------------------------------
# Count-min sketch (round 4)
# ---------------------------------------------------------------------------


def test_cm_sketch_merge_equals_whole(spark):
    """Sharded sketches merged by counter addition must equal the sketch
    of the whole — the mergeable-state law."""
    from incremental_github_data_pipeline_spark.operators import (
        incremental_agg as ia,
    )

    df = spark.createDataFrame(
        [(i, f"k{i % 37}") for i in range(500)], "i long, key string"
    )
    a, b = df.filter("i < 200"), df.filter("i >= 200")
    whole = ia.cm_sketch(df, "key", width=256, depth=3)
    merged = ia.cm_merge(
        ia.cm_sketch(a, "key", width=256, depth=3),
        ia.cm_sketch(b, "key", width=256, depth=3),
    )
    w = {(r["cm_row"], r["cm_bucket"]): r["cm_count"] for r in whole.collect()}
    m = {(r["cm_row"], r["cm_bucket"]): r["cm_count"] for r in merged.collect()}
    assert w == m


def test_cm_estimate_never_undercounts_and_is_tight_when_sparse(spark):
    from pyspark.sql import functions as F

    from incremental_github_data_pipeline_spark.operators import (
        incremental_agg as ia,
    )

    rows = [(f"k{i % 20}",) for i in range(400)]
    df = spark.createDataFrame(rows, "key string")
    exact = df.groupBy("key").agg(F.count(F.lit(1)).alias("c"))
    sketch = ia.cm_sketch(df, "key", width=1024, depth=4)
    est = ia.cm_estimate(exact, sketch, "key", width=1024, depth=4).collect()
    for r in est:
        assert r["cm_est"] >= r["c"]
    # 20 keys * 4 hashes in 4096 counters: collisions ~ nonexistent
    assert all(r["cm_est"] == r["c"] for r in est)


def test_cm_estimate_unseen_key_is_zero(spark):
    from incremental_github_data_pipeline_spark.operators import (
        incremental_agg as ia,
    )

    df = spark.createDataFrame([("a",), ("b",)], "key string")
    sketch = ia.cm_sketch(df, "key", width=512, depth=4)
    probe = spark.createDataFrame([("definitely-unseen",)], "key string")
    [r] = ia.cm_estimate(probe, sketch, "key", width=512, depth=4).collect()
    assert r["cm_est"] == 0


class TestHll:
    def test_merge_law_and_constant_state(self, spark):
        """Sketching two shards independently and merging must equal sketching
        the union — the property that makes per-day/per-shard distinct
        state foldable; and state never exceeds 2^p rows per group."""
        from incremental_github_data_pipeline_spark.operators.incremental_agg import (
            hll_merge,
            hll_registers,
        )

        a = spark.createDataFrame(
            [("g", i) for i in range(0, 400)], "g string, k long"
        )
        b = spark.createDataFrame(
            [("g", i) for i in range(200, 700)], "g string, k long"
        )
        merged = {
            (r["hll_idx"], r["hll_rho"])
            for r in hll_merge(
                hll_registers(a, "g", "k", p=6),
                hll_registers(b, "g", "k", p=6),
            ).collect()
        }
        whole = {
            (r["hll_idx"], r["hll_rho"])
            for r in hll_registers(
                a.unionByName(b), "g", "k", p=6
            ).collect()
        }
        assert merged == whole
        assert len(whole) <= 64

    def test_estimate_relative_error(self, spark):
        """p=8 (256 registers): the harmonic-mean estimate must land
        within ~3x the theoretical 1.04/sqrt(m) = 6.5% standard error
        for a range of true cardinalities."""
        from incremental_github_data_pipeline_spark.operators.incremental_agg import (
            hll_estimate,
            hll_registers,
        )

        rows = []
        for g, n in (("s", 100), ("m", 1000), ("l", 20000)):
            rows += [(g, i * 7 + 1) for i in range(n)]
        df = spark.createDataFrame(rows, "g string, k long")
        est = {
            r["g"]: r["hll_est"]
            for r in hll_estimate(
                hll_registers(df, "g", "k", p=8), "g", p=8
            ).collect()
        }
        for g, n in (("s", 100), ("m", 1000), ("l", 20000)):
            assert abs(est[g] - n) / n < 0.20, (g, est[g])

    def test_idempotent_merge(self, spark):
        from incremental_github_data_pipeline_spark.operators.incremental_agg import (
            hll_merge,
            hll_registers,
        )

        df = spark.createDataFrame(
            [("g", i) for i in range(500)], "g string, k long"
        )
        s = hll_registers(df, "g", "k", p=6)
        twice = {
            (r["hll_idx"], r["hll_rho"]) for r in hll_merge(s, s).collect()
        }
        once = {(r["hll_idx"], r["hll_rho"]) for r in s.collect()}
        assert twice == once


# ---------------------------------------------------------------------------
# KMV bottom-k sketch
# ---------------------------------------------------------------------------


class TestKMV:
    def _df(self, spark):
        rows = [("X", i) for i in range(1000)] + [
            ("Y", i) for i in range(500, 1500)
        ]
        return spark.createDataFrame(rows, "g string, key long")

    def test_state_bounded_and_sorted(self, spark):
        from incremental_github_data_pipeline_spark.operators.incremental_agg import (
            kmv_sketch,
        )

        sk = kmv_sketch(self._df(spark), "g", "key", k=64)
        per = {r["g"]: r["n"] for r in
               sk.groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert per == {"X": 64, "Y": 64}
        # the sketch is exactly the k smallest distinct hashes: no dup
        hashes = [r["kmv_hash"] for r in
                  sk.filter(F.col("g") == "X").collect()]
        assert len(set(hashes)) == 64

    def test_merge_law_shards_equal_whole(self, spark):
        from incremental_github_data_pipeline_spark.operators.incremental_agg import (
            kmv_merge,
            kmv_sketch,
        )

        df = self._df(spark)
        whole = kmv_sketch(df, "g", "key", k=64)
        h1 = kmv_sketch(df.filter(F.col("key") % 2 == 0), "g", "key", k=64)
        h2 = kmv_sketch(df.filter(F.col("key") % 2 == 1), "g", "key", k=64)
        merged = kmv_merge(h1, h2, k=64)
        assert merged.exceptAll(whole).count() == 0
        assert whole.exceptAll(merged).count() == 0
        # idempotence: re-merging the merged state is a no-op
        again = kmv_merge(merged, merged, k=64)
        assert again.exceptAll(merged).count() == 0

    def test_estimate_exact_below_k_and_close_above(self, spark):
        from incremental_github_data_pipeline_spark.operators.incremental_agg import (
            kmv_estimate,
            kmv_sketch,
        )

        tiny = spark.createDataFrame(
            [("A", i) for i in range(10)], "g string, key long"
        )
        est = kmv_estimate(
            kmv_sketch(tiny, "g", "key", k=64), "g", k=64
        ).collect()
        assert est[0]["kmv_est"] == 10  # exact below k
        big = kmv_estimate(
            kmv_sketch(self._df(spark), "g", "key", k=64), "g", k=64
        )
        for r in big.collect():
            assert abs(r["kmv_est"] - 1000) < 350  # ~1/sqrt(63) rel err

    def test_pre_trim_is_invisible(self, spark):
        from incremental_github_data_pipeline_spark.operators.incremental_agg import (
            kmv_sketch,
        )

        df = self._df(spark)
        trimmed = kmv_sketch(df, "g", "key", k=64, pre_trim_salts=16)
        direct = kmv_sketch(df, "g", "key", k=64, pre_trim_salts=None)
        assert trimmed.exceptAll(direct).count() == 0
        assert direct.exceptAll(trimmed).count() == 0

    def test_jaccard_exact_on_small_union(self, spark):
        from incremental_github_data_pipeline_spark.operators.incremental_agg import (
            kmv_jaccard,
            kmv_sketch,
        )

        tiny = spark.createDataFrame(
            [("A", i) for i in range(10)]
            + [("B", i) for i in range(5, 20)],
            "g string, key long",
        )
        sk = kmv_sketch(tiny, "g", "key", k=64)
        row = kmv_jaccard(sk, "g", k=64).collect()[0]
        # union = 20 < k: the sample IS the union, everything exact
        assert (row["sample_size"], row["n_common_sample"]) == (20, 5)
        assert row["jaccard_ppm"] == 250000
        assert row["est_union"] == 20

    def test_jaccard_tracks_true_overlap(self, spark):
        from incremental_github_data_pipeline_spark.operators.incremental_agg import (
            kmv_jaccard,
            kmv_sketch,
        )

        sk = kmv_sketch(self._df(spark), "g", "key", k=64)
        row = kmv_jaccard(sk, "g", k=64).collect()[0]
        # true J = 500/1500 = 0.333; k=64 keeps it within sampling noise
        assert 150000 < row["jaccard_ppm"] < 550000
        assert 1000 < row["est_union"] < 2100
