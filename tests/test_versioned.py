"""sources.versioned — manifest-based multi-version snapshots: time
travel, append without rewrite, atomic latest pointer, vacuum safety."""

from __future__ import annotations

import pytest

from incremental_github_data_pipeline_spark.sources.versioned import (
    commit_version,
    history,
    latest_version,
    read_version,
    vacuum,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, val string")


def test_overwrite_versions_and_time_travel(spark, tmp_path):
    root = tmp_path / "t"
    v1 = commit_version(_df(spark, [(1, "a")]), root)
    v2 = commit_version(_df(spark, [(1, "A"), (2, "b")]), root)
    assert (v1, v2) == (1, 2)
    assert latest_version(root) == 2
    assert read_version(spark, root).count() == 2  # latest
    old = {(r["id"], r["val"]) for r in read_version(spark, root, 1).collect()}
    assert old == {(1, "a")}  # time travel


def test_append_reuses_prior_files(spark, tmp_path):
    root = tmp_path / "t"
    commit_version(_df(spark, [(1, "a")]), root)
    commit_version(_df(spark, [(2, "b")]), root, mode="append")
    h = history(root)
    assert h[1]["files"][0] == h[0]["files"][0]  # prior file referenced
    assert len(h[1]["files"]) == 2
    assert h[1]["n_rows"] == 2
    got = {r["id"] for r in read_version(spark, root).collect()}
    assert got == {1, 2}


def test_vacuum_keeps_recent_and_pinned_reads_survive(spark, tmp_path):
    root = tmp_path / "t"
    for i in range(4):
        commit_version(_df(spark, [(i, str(i))]), root)
    res = vacuum(root, keep=2)
    assert res["dropped_versions"] == [1, 2]
    assert res["deleted_dirs"] == 2
    # retained versions still read through their manifests
    assert read_version(spark, root, 3).collect()[0]["id"] == 2
    assert read_version(spark, root, 4).collect()[0]["id"] == 3
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        read_version(spark, root, 1)


def test_vacuum_sweeps_orphaned_crash_dirs(spark, tmp_path):
    root = tmp_path / "t"
    commit_version(_df(spark, [(1, "a")]), root)
    # simulate a crash mid-commit: data written, manifest never landed
    _df(spark, [(9, "x")]).write.parquet(str(root / "data" / "orphan.parquet"))
    res = vacuum(root, keep=2)
    assert res["deleted_dirs"] == 1
    assert read_version(spark, root).count() == 1  # table unaffected


def test_append_to_empty_and_bad_mode(spark, tmp_path):
    root = tmp_path / "t"
    v = commit_version(_df(spark, [(1, "a")]), root, mode="append")
    assert v == 1 and read_version(spark, root).count() == 1
    with pytest.raises(ValueError, match="mode"):
        commit_version(_df(spark, [(1, "a")]), root, mode="merge")
    with pytest.raises(FileNotFoundError):
        read_version(spark, tmp_path / "absent")


def test_stats_skipping_prunes_files_and_stays_exact(spark, tmp_path):
    from pyspark.sql import functions as F

    root = tmp_path / "t"
    # three appends with disjoint id ranges -> three prunable units
    commit_version(
        spark.range(0, 100).toDF("id").repartition(1), root, stats_cols=["id"]
    )
    commit_version(
        spark.range(100, 200).toDF("id").repartition(1),
        root, mode="append", stats_cols=["id"],
    )
    commit_version(
        spark.range(200, 300).toDF("id").repartition(1),
        root, mode="append", stats_cols=["id"],
    )
    pruned = read_version(spark, root, skip=("id", 120, 150))
    assert len(pruned.inputFiles()) == 1  # two of three commits skipped
    assert pruned.count() == 31
    assert pruned.agg(F.min("id"), F.max("id")).collect()[0][:] == (120, 150)
    # open bounds and no-stats fallback stay exact
    assert read_version(spark, root, skip=("id", None, 99)).count() == 100
    empty = read_version(spark, root, skip=("id", 1000, 2000))
    assert empty.count() == 0


def test_merge_version_upserts_and_is_idempotent(spark, tmp_path):
    from incremental_github_data_pipeline_spark.sources.versioned import (
        merge_version,
    )

    root = tmp_path / "t"
    merge_version(_df(spark, [(1, "a"), (2, "b")]), root, ["id"])
    merge_version(_df(spark, [(2, "B2"), (3, "c")]), root, ["id"])
    got = {(r["id"], r["val"]) for r in read_version(spark, root).collect()}
    assert got == {(1, "a"), (2, "B2"), (3, "c")}
    # time travel still sees the pre-merge state
    v1 = {(r["id"], r["val"]) for r in read_version(spark, root, 1).collect()}
    assert v1 == {(1, "a"), (2, "b")}
    # replay produces an identical (new) version
    merge_version(_df(spark, [(2, "B2"), (3, "c")]), root, ["id"])
    again = {(r["id"], r["val"]) for r in read_version(spark, root).collect()}
    assert again == got and latest_version(root) == 3


def test_commit_changelog_applies_deletes_with_history(spark, tmp_path):
    from incremental_github_data_pipeline_spark.sources.versioned import (
        commit_changelog,
    )

    root = tmp_path / "t"
    ch1 = spark.createDataFrame(
        [(1, "a", 1, "insert"), (2, "b", 1, "insert")],
        "id long, val string, seq long, op string",
    )
    commit_changelog(ch1, root, ["id"], "seq")
    ch2 = spark.createDataFrame(
        [(2, None, 2, "delete"), (3, "c", 2, "insert")],
        "id long, val string, seq long, op string",
    )
    commit_changelog(ch2, root, ["id"], "seq")
    now = {(r["id"], r["val"]) for r in read_version(spark, root).collect()}
    assert now == {(1, "a"), (3, "c")}
    # the deleted row's pre-image is retained at version 1
    v1 = {(r["id"], r["val"]) for r in read_version(spark, root, 1).collect()}
    assert (2, "b") in v1


def test_optimistic_concurrency_detects_lost_update(spark, tmp_path):
    from incremental_github_data_pipeline_spark.sources.versioned import (
        CommitConflict,
    )

    root = tmp_path / "t"
    v1 = commit_version(_df(spark, [(1, "a")]), root)
    # writer B sneaks in a commit
    commit_version(_df(spark, [(9, "z")]), root)
    with pytest.raises(CommitConflict, match="expected version 1"):
        commit_version(_df(spark, [(2, "b")]), root, expected_version=v1)
    # expected 0 requires an empty table
    with pytest.raises(CommitConflict):
        commit_version(_df(spark, [(3, "c")]), root, expected_version=0)
    assert latest_version(root) == 2  # failed commits advanced nothing


def test_schema_evolution_appends_widen_and_backfill_null(spark, tmp_path):
    root = tmp_path / "t"
    commit_version(_df(spark, [(1, "a")]), root)
    widened = spark.createDataFrame(
        [(2, "b", 7.5)], "id long, val string, score double"
    )
    commit_version(widened, root, mode="append")
    rows = {r["id"]: (r["val"], r["score"])
            for r in read_version(spark, root).collect()}
    assert rows == {1: ("a", None), 2: ("b", 7.5)}
    # time travel to v1 keeps the narrow schema
    assert read_version(spark, root, 1).columns == ["id", "val"]


def test_diff_versions_reports_added_removed_changed(spark, tmp_path):
    from incremental_github_data_pipeline_spark.sources.versioned import (
        diff_versions,
    )

    root = tmp_path / "t"
    commit_version(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), root)
    commit_version(_df(spark, [(1, "a"), (2, "B!"), (4, "d")]), root)
    got = {
        (r["id"], r["status"])
        for r in diff_versions(spark, root, 1, 2, ["id"]).collect()
    }
    # 1 unchanged (absent), 2 changed, 3 removed, 4 added
    assert got == {(2, "changed"), (3, "removed"), (4, "added")}
