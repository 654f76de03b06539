"""write_bucketed — the co-located join contract: two tables bucketed
by the same key must join with NO exchange on either side."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from incremental_github_data_pipeline_spark.sources.readers import read_table
from incremental_github_data_pipeline_spark.sources.writers import write_bucketed

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark):
    write_bucketed(
        read_table(spark, SF, "lineitem"), "li_b", ["l_orderkey"], 8,
        sort_cols=["l_orderkey"],
    )
    write_bucketed(
        read_table(spark, SF, "orders"), "o_b", ["o_orderkey"], 8,
        sort_cols=["o_orderkey"],
    )
    yield spark.table("li_b"), spark.table("o_b")
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    li, o = bucketed
    # disable auto-broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(o, li["l_orderkey"] == o["o_orderkey"]).groupBy(
            "o_orderpriority"
        ).count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        pre_agg = plan.split("HashAggregate")[-1]  # below the aggregation
        assert "Exchange" not in pre_agg, "bucketed join must not shuffle"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))


def test_bucketed_join_matches_plain(spark, bucketed):
    li, o = bucketed
    plain = (
        read_table(spark, SF, "lineitem")
        .join(read_table(spark, SF, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    assert li.join(o, li["l_orderkey"] == o["o_orderkey"]).count() == plain
