"""operators.skew — salted join/aggregate must be result-identical to
their unsalted twins, with the salt spreading hot keys across buckets."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from incremental_github_data_pipeline_spark.operators.skew import (
    salted_aggregate,
    salted_join,
    with_salt,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # one monster key (90%), a tail of normal keys
    return spark.range(2000).select(
        F.when(F.col("id") < 1800, "HOT").otherwise(F.concat(F.lit("k"), F.col("id"))).alias("k"),
        (F.col("id") % 7).alias("v"),
    )


def _dim(spark):
    rows = [("HOT", "hot-dim")] + [(f"k{i}", f"d{i}") for i in range(1800, 2000)]
    return spark.createDataFrame(rows, "k string, label string")


def test_salted_join_equals_plain_join(spark, skewed):
    dim = _dim(spark)
    plain = skewed.join(dim, ["k"], "inner").groupBy("k", "label").count()
    salted = salted_join(skewed, dim, ["k"], buckets=8).groupBy("k", "label").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark, skewed):
    dim = _dim(spark).filter(F.col("k") != "HOT")  # HOT becomes unmatched
    plain = skewed.join(dim, ["k"], "left")
    salted = salted_join(skewed, dim, ["k"], buckets=8, how="left")
    assert plain.count() == salted.count() == 2000
    assert salted.filter(F.col("k") == "HOT").filter(F.col("label").isNull()).count() == 1800


def test_salted_join_rejects_right_joins(spark, skewed):
    with pytest.raises(ValueError, match="how"):
        salted_join(skewed, _dim(spark), ["k"], how="right")


def test_salted_aggregate_equals_plain(spark, skewed):
    plain = skewed.groupBy("k").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"),
        F.min("v").alias("lo"), F.max("v").alias("hi"),
    )
    salted = salted_aggregate(
        skewed, ["k"],
        {"s": ("sum", "v"), "n": ("count", "v"), "lo": ("min", "v"), "hi": ("max", "v")},
        buckets=16,
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_aggregate_rejects_non_algebraic(spark, skewed):
    with pytest.raises(ValueError, match="non-algebraic"):
        salted_aggregate(skewed, ["k"], {"a": ("avg", "v")})


def test_salt_spreads_hot_key(spark, skewed):
    salted = with_salt(skewed.filter(F.col("k") == "HOT"), buckets=8)
    n_buckets = salted.select("_salt").distinct().count()
    assert n_buckets == 8, "hot key must spread over all salt buckets"
