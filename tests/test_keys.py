"""uuid5 bit-exactness — the hardest correctness risk (SURVEY.md §7.3a)."""

from __future__ import annotations

import uuid

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from incremental_github_data_pipeline_spark import keys


def _spark_uuid5(spark, ns, names):
    df = spark.createDataFrame([(n,) for n in names], "name string")
    rows = df.withColumn("u", keys.uuid5(ns, F.col("name"))).collect()
    return {r["name"]: r["u"] for r in rows}


def test_known_golden_keys(spark):
    """Keys verified against the committed reference CSVs (SURVEY.md §1.3)."""
    got = _spark_uuid5(spark, keys.NAMESPACE_REPO, ["microsoft|.github"])
    assert got["microsoft|.github"] == "ed35ef31-1edc-5cd0-a250-d62d346f2a86"
    got = _spark_uuid5(spark, keys.NAMESPACE_OWNER, ["microsoft"])
    assert got["microsoft"] == "0dd58109-d16c-5fac-9308-c895180d7869"


def test_all_namespaces_match_stdlib(spark):
    names = ["a", "", "microsoft|vscode", "Ünïcôdé-文字-🎉", "x" * 500]
    for ns in [
        keys.NAMESPACE_OWNER,
        keys.NAMESPACE_REPO,
        keys.NAMESPACE_ISSUE,
        keys.NAMESPACE_BRANCH,
        keys.NAMESPACE_USER,
    ]:
        got = _spark_uuid5(spark, ns, names)
        for n in names:
            assert got[n] == str(uuid.uuid5(ns, n)), (ns, n)


def test_null_name_yields_null(spark):
    df = spark.createDataFrame([(None,)], "name string")
    row = df.withColumn("u", keys.uuid5(keys.NAMESPACE_USER, F.col("name"))).first()
    assert row["u"] is None


@settings(max_examples=20, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=64), min_size=1, max_size=20, unique=True))
def test_property_matches_stdlib(spark, names):
    got = _spark_uuid5(spark, keys.NAMESPACE_USER, names)
    for n in names:
        assert got[n] == str(uuid.uuid5(keys.NAMESPACE_USER, n))


def test_udf_twin_matches_native(spark):
    names = ["alpha", "beta|gamma", ""]
    df = spark.createDataFrame([(n,) for n in names], "name string")
    udf = keys.uuid5_udf(keys.NAMESPACE_ISSUE)
    rows = (
        df.withColumn("native", keys.uuid5(keys.NAMESPACE_ISSUE, F.col("name")))
        .withColumn("udf", udf(F.col("name")))
        .collect()
    )
    for r in rows:
        assert r["native"] == r["udf"]


def test_business_key_null_propagates(spark):
    df = spark.createDataFrame([("a", None), ("a", "b")], "x string, y string")
    rows = df.select(keys.business_key(F.col("x"), F.col("y")).alias("k")).collect()
    assert rows[0]["k"] is None
    assert rows[1]["k"] == "a|b"
