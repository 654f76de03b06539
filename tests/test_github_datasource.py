"""sources.github_datasource — the Spark 4 Python DataSource ingestion
tier, driven end-to-end with the offline transport (fetch_fn option):
partition fan-out, pagination caps, lineage tagging, and raw-zone
compatibility with the transform layer."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from incremental_github_data_pipeline_spark.sources.github_datasource import (
    register,
)

FAKE = "incremental_github_data_pipeline_spark.sources.rest_testing:make_fetch"


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register(spark)


def _read(spark, **options):
    reader = spark.read.format("github_rest")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def test_repos_pages_fan_out(spark):
    df = _read(spark, endpoint="repos", owner="org", fetch_fn=FAKE)
    rows = df.collect()
    assert len(rows) == 10  # 4 + 4 + 2 (short final page)
    names = {json.loads(r["value"])["name"] for r in rows}
    assert names == {f"repo{i}" for i in range(10)}
    # one partition per page (the distributed fan-out)
    assert (
        df.select(F.spark_partition_id()).distinct().count() == 3
    )


def test_per_repo_endpoint_lineage_and_partitions(spark):
    df = _read(
        spark, endpoint="branches", owner="org", repos="repo0,repo1,repo2",
        fetch_fn=FAKE,
    )
    rows = df.collect()
    assert len(rows) == 6  # 2 branches × 3 repos
    assert {r["repo_name"] for r in rows} == {"repo0", "repo1", "repo2"}
    # lineage rides inside the payload too (extract.py:108-110 parity)
    assert all(json.loads(r["value"])["repo_name"] == r["repo_name"] for r in rows)
    assert df.select(F.spark_partition_id()).distinct().count() == 3


def test_missing_repos_option_raises(spark):
    with pytest.raises(Exception, match="requires options.repos"):
        _read(spark, endpoint="issues", owner="org", fetch_fn=FAKE).collect()


def test_datasource_feeds_transform_layer(spark, tmp_path):
    """Raw-zone contract: DataSource output parsed with the explicit raw
    schema must flow through the batch cleaner unchanged."""
    from incremental_github_data_pipeline_spark.pipelines.github import (
        BRANCHES_RAW_SCHEMA,
        clean_branches,
    )

    raw = _read(
        spark, endpoint="branches", owner="org", repos="repo0,repo1", fetch_fn=FAKE
    )
    parsed = raw.select(
        F.from_json("value", BRANCHES_RAW_SCHEMA).alias("r")
    ).select("r.*")
    repos_dim = spark.createDataFrame(
        [("rid0", "repo0"), ("rid1", "repo1")], "repo_id string, repo_name string"
    )
    out = clean_branches(parsed, repos_dim)
    rows = out.collect()
    assert len(rows) == 4
    assert {r["repo_id"] for r in rows} == {"rid0", "rid1"}
    assert {r["branch_name"] for r in rows} == {"main", "dev"}


def test_stream_reader_pages_as_microbatches(spark, tmp_path):
    """readStream over the github_rest source: the page cursor advances
    per micro-batch, the short third page ends the listing, and the
    union of batches is exactly the 10 synthetic repos (no dups, no
    gaps — the exactly-once contract of deterministic offset ranges)."""
    import json as _json
    import time

    from incremental_github_data_pipeline_spark.sources.github_datasource import (
        register,
    )

    register(spark)
    q = (
        spark.readStream.format("github_rest")
        .option("endpoint", "repos")
        .option("owner", "org")
        .option("per_page", 4)  # match the fake transport's page size
        .option("pages_per_batch", 1)
        .option(
            "fetch_fn",
            "incremental_github_data_pipeline_spark.sources.rest_testing:make_fetch",
        )
        .load()
        .writeStream.format("memory")
        .queryName("gh_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table("gh_stream").count() >= 10:
                break
            time.sleep(0.5)
        rows = spark.table("gh_stream").collect()
    finally:
        q.stop()
    ids = sorted(_json.loads(r["value"])["id"] for r in rows)
    assert ids == list(range(10))  # 4 + 4 + 2 (short final page)
