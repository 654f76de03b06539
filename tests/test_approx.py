"""Approximate sketches (q_approx_profile): HLL distinct counts and
approximate percentiles must land within their published error bounds
of the exact answers — the contract that makes them usable as the
100 TB profiling pass."""

from __future__ import annotations

from pyspark.sql import functions as F

from incremental_github_data_pipeline_spark.sources.readers import read_table as T

SF = "/root/testdata/sf0.01"


def test_hll_within_rsd(spark):
    li = T(spark, SF, "lineitem")
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey").alias("approx"),
            F.count_distinct("l_orderkey").alias("exact"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        # default rsd = 0.05; allow 3 sigma
        assert abs(r["approx"] - r["exact"]) <= 0.15 * r["exact"] + 1


def test_percentile_approx_brackets_exact(spark):
    li = T(spark, SF, "lineitem")
    [r] = (
        li.agg(
            F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
        ).collect()
    )
    assert abs(r["approx"] - r["exact"]) / r["exact"] < 0.01


def test_l2_normalize_unit_norm_and_zero_passthrough(spark):
    from incremental_github_data_pipeline_spark.operators import similarity as sim

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    rows = {
        r["vec_id"]: (r["v"], r["n"])
        for r in df.select(
            "vec_id",
            sim.l2_normalize("embedding").alias("v"),
            sim.l2_norm(sim.l2_normalize("embedding")).alias("n"),
        ).collect()
    }
    assert rows[1][0] == [0.6, 0.8] and rows[1][1] == 1.0
    assert rows[2][0] == [0.0, 0.0] and rows[2][1] == 0.0
