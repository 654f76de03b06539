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
