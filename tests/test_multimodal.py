"""operators.multimodal — binary-column plumbing: Arrow batch shape,
deterministic stub decode, honest NotImplementedError, payload pruning.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from incremental_github_data_pipeline_spark.operators.multimodal import (
    extract_features,
    frame_sample_plan,
    make_fake_media,
    metadata_profile,
)


def test_fake_media_deterministic(spark):
    a = make_fake_media(spark, n=16).collect()
    b = make_fake_media(spark, n=16).collect()
    assert a == b
    assert {r["kind"] for r in a} == {"image", "audio", "video"}


def test_extract_features_shape_and_determinism(spark):
    media = make_fake_media(spark, n=32)
    feats = extract_features(media, dim=8, fake=True)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 32
    for r in rows.values():
        assert len(r["feature"]) == 8
        assert all(0.0 <= x < 1.0 for x in r["feature"])
    # payload length rides through
    assert rows[0]["n_bytes"] == 128
    assert rows[31]["n_bytes"] == 128 + 31
    again = {r["media_id"]: r for r in extract_features(media, 8, fake=True).collect()}
    assert {k: v["feature"] for k, v in rows.items()} == {
        k: v["feature"] for k, v in again.items()
    }


def test_extract_features_honest_stub(spark):
    media = make_fake_media(spark, n=4)
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        extract_features(media, fake=False).collect()


def test_metadata_profile_prunes_payload(spark, tmp_path):
    """Written to parquet, the metadata query's scan must not read the
    binary payload column (ReadSchema pruning — the 100 TB contract)."""
    path = str(tmp_path / "media")
    make_fake_media(spark, n=32).write.parquet(path)
    prof = metadata_profile(spark.read.parquet(path))
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan
    assert prof.count() == 3  # one row per kind


def test_frame_sample_plan_counts(spark):
    media = make_fake_media(spark, n=9)  # media_ids 2,5,8 are video
    plan = frame_sample_plan(media, every_ms=1000)
    got = {
        r["media_id"]: r["n"]
        for r in plan.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # duration_ms = 1000*i; frames at 0,1000,...,duration-1 step 1000 → i frames (i>0)
    assert got == {2: 2, 5: 5, 8: 8}
