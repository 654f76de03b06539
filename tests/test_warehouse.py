"""S8 warehouse sink + migration ledger against embedded Derby
(reference load.py:25-55 connection contract, load.py:57 TODO load path,
migrations/001_core_schema.sql:12-31 ledger semantics).

Derby ships inside Spark's JVM, so these tests exercise the REAL JDBC
path — distributed staged writes, server-side MERGE, transactional
DDL — with zero external services.
"""

from __future__ import annotations

import pytest

from incremental_github_data_pipeline_spark.sources import migrations as mig
from incremental_github_data_pipeline_spark.sources.warehouse import (
    Warehouse,
    derby_url,
)


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, derby_url(str(tmp_path / "wh")))


def _owners(spark, rows):
    return spark.createDataFrame(rows, "owner_id string, owner_login string")


# ---------------------------------------------------------------------------
# Connection self-check (load.py:39-51 parity)
# ---------------------------------------------------------------------------


def test_connect_check_probes(wh):
    info = wh.connect_check()
    # schema probe (DB_NAME twin), catalog probe (sys.tables twin),
    # current user (ORIGINAL_LOGIN twin)
    assert info["schema"] == "APP"
    assert info["n_tables"] > 0
    assert info["login"] == "APP"


def test_connect_check_wrong_schema_raises(wh):
    with pytest.raises(ConnectionError):
        wh.connect_check(expected_schema="NOT_THE_DB")


def test_connect_check_bad_target_raises(spark, tmp_path):
    # no create=true and the directory doesn't exist -> boot failure is
    # surfaced as ConnectionError (load.py:53-55 contract)
    bad = Warehouse(spark, derby_url(str(tmp_path / "absent"), create=False))
    with pytest.raises(ConnectionError):
        bad.connect_check()


# ---------------------------------------------------------------------------
# Migration ledger (001_core_schema.sql:12-31)
# ---------------------------------------------------------------------------


def test_bootstrap_applies_once_and_ledger_records(wh):
    ms = mig.github_core_migrations()
    first = mig.bootstrap(wh, ms)
    assert first == ["001_core_schema"]
    for t in ("owners", "users", "repos", "issues", "branches"):
        assert wh.table_exists(t)
    # rerun: ledger skip, identical state, ledger rows == #migrations
    second = mig.bootstrap(wh, ms)
    assert second == []
    assert mig.applied_migrations(wh) == ["001_core_schema"]


def test_bootstrap_failed_migration_rolls_back_atomically(wh):
    bad = mig.Migration(
        "002_bad", ("CREATE TABLE t_ok (a INTEGER)", "CREATE TABLE t_bad (")
    )
    with pytest.raises(Exception):
        mig.bootstrap(wh, [bad])
    # neither the half-applied object nor the ledger row survive
    assert not wh.table_exists("t_ok")
    assert "002_bad" not in mig.applied_migrations(wh)
    # and the migration is retryable after a fix
    fixed = mig.Migration("002_bad", ("CREATE TABLE t_ok (a INTEGER)",))
    assert mig.bootstrap(wh, [fixed]) == ["002_bad"]
    assert wh.table_exists("t_ok")


# ---------------------------------------------------------------------------
# MERGE upsert (the load.py:57 TODO, done with real MERGE semantics)
# ---------------------------------------------------------------------------


def test_partitioned_read_fans_out_and_matches(wh, spark):
    """VERDICT r9 #4: a keyed read must produce >1 input partition
    (range-predicated parallel queries), return the same rows as the
    single-stream read, and keep rows outside the bound estimates."""
    rows = [(i, f"v{i}") for i in range(100)]
    df = spark.createDataFrame(rows, "id long, val string")
    wh.ensure_table("part_t", df.schema)
    wh.write_table(df, "part_t")
    seq = wh.read_table("part_t")
    par = wh.read_table(
        "part_t",
        partition_column="id",
        lower_bound=10,  # deliberately stale: rows 0..9 must survive
        upper_bound=90,
        num_partitions=4,
    )
    assert seq.rdd.getNumPartitions() == 1
    assert par.rdd.getNumPartitions() == 4
    assert sorted(tuple(r) for r in par.collect()) == sorted(
        tuple(r) for r in seq.collect()
    )
    assert par.count() == 100


def test_partitioned_read_requires_all_bounds(wh):
    with pytest.raises(ValueError, match="requires"):
        wh.read_table("any_t", partition_column="id", lower_bound=0)


def test_merge_upsert_is_idempotent(wh, spark):
    df = _owners(spark, [("o1", "alice"), ("o2", "bob")])
    wh.merge_upsert(df, "owners_t", ["owner_id"])
    state1 = sorted(tuple(r) for r in wh.read_table("owners_t").collect())
    wh.merge_upsert(df, "owners_t", ["owner_id"])  # replay the same batch
    state2 = sorted(tuple(r) for r in wh.read_table("owners_t").collect())
    assert state1 == state2 == [("o1", "alice"), ("o2", "bob")]


def test_merge_upsert_updates_and_inserts(wh, spark):
    wh.merge_upsert(_owners(spark, [("o1", "alice"), ("o2", "bob")]),
                    "owners_t", ["owner_id"])
    wh.merge_upsert(_owners(spark, [("o2", "bobby"), ("o3", "carol")]),
                    "owners_t", ["owner_id"])
    assert sorted(tuple(r) for r in wh.read_table("owners_t").collect()) == [
        ("o1", "alice"),
        ("o2", "bobby"),
        ("o3", "carol"),
    ]


def test_merge_upsert_keep_last_within_batch(wh, spark):
    # duplicate key inside one batch: arrival-order recency wins (A1)
    df = _owners(spark, [("o1", "first"), ("o1", "last")]).coalesce(1)
    wh.merge_upsert(df, "owners_t", ["owner_id"])
    assert [tuple(r) for r in wh.read_table("owners_t").collect()] == [
        ("o1", "last")
    ]


def test_merge_upsert_with_order_col(wh, spark):
    df = spark.createDataFrame(
        [("k", "stale", 1), ("k", "fresh", 2)], "id string, v string, seq long"
    )
    wh.merge_upsert(df, "ordered_t", ["id"], order_col="seq")
    assert [tuple(r) for r in wh.read_table("ordered_t").collect()] == [
        ("k", "fresh", 2)
    ]


def test_check_constraint_enforced_at_load(wh, spark):
    # the warehouse DDL is the final data-quality gate (SURVEY.md §4.3):
    # a row violating CK_repos_visibility must be rejected by the engine
    mig.bootstrap(wh, mig.github_core_migrations())
    import datetime

    bad = spark.createDataFrame(
        [("r1", "n", "o/n", "own1", "bogus",
          datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc))],
        "repo_id string, repo_name string, full_name string, "
        "owner_id string, visibility string, created_at timestamp",
    )
    wh.merge_upsert(_owners(spark, [("own1", "o")]), "owners", ["owner_id"])
    with pytest.raises(Exception):
        wh.merge_upsert(bad, "repos", ["repo_id"])


def test_pipeline_to_warehouse_end_to_end(wh, spark):
    """The full story the reference never finished: clean with Spark,
    bootstrap the warehouse schema, MERGE-load owners+repos through
    JDBC twice — second run is a no-op (deterministic uuid5 keys)."""
    from pyspark.sql import functions as F

    from incremental_github_data_pipeline_spark.pipelines.github import run_transform

    mig.bootstrap(wh, mig.github_core_migrations())
    res = run_transform(
        spark, "/root/reference/data/raw_data", issues_available=False
    )
    wh.merge_upsert(res.owners, "owners", ["owner_id"])
    # project to the DDL columns (clean CSVs keep github_* natural keys
    # the DB drops — load.py:57), align int widths with the DDL
    repos = res.repos.select(
        "repo_id", "repo_name", "full_name", "description", "topics",
        "language", "owner_id", "visibility",
        F.col("private").cast("short").alias("private"),
        F.col("disabled").cast("short").alias("disabled"),
        F.col("fork").cast("short").alias("fork"),
        F.col("archived").cast("short").alias("archived"),
        "default_branch",
        F.col("stargazers_count").cast("int").alias("stargazers_count"),
        F.col("watchers_count").cast("int").alias("watchers_count"),
        F.col("forks_count").cast("int").alias("forks_count"),
        F.col("open_issues_count").cast("int").alias("open_issues_count"),
        "created_at", "updated_at", "pushed_at",
    )
    wh.merge_upsert(repos, "repos", ["repo_id"])
    n1 = wh.read_table("repos").count()
    assert n1 == 300  # reference audit-log row count
    wh.merge_upsert(repos, "repos", ["repo_id"])  # replay
    assert wh.read_table("repos").count() == n1
    # FK integrity held by the engine: every repo's owner exists
    assert (
        wh.read_table("repos")
        .join(wh.read_table("owners"), "owner_id", "left_anti")
        .count()
        == 0
    )


# ---------------------------------------------------------------------------
# Streaming -> warehouse (round 4)
# ---------------------------------------------------------------------------


def test_streaming_to_warehouse_incremental_and_idempotent(wh, spark, tmp_path):
    """availableNow stream -> clean -> JDBC MERGE, run twice: the second
    run with no new files loads nothing new; a third run after a new
    raw file lands picks up ONLY that file and upserts its rows."""
    import json
    import shutil

    from incremental_github_data_pipeline_spark.sources import migrations as mig
    from incremental_github_data_pipeline_spark.streaming.incremental import (
        run_incremental_to_warehouse,
    )

    mig.bootstrap(wh, mig.github_core_migrations())
    raw = tmp_path / "raw"
    raw.mkdir()
    shutil.copy(
        "/root/reference/data/raw_data/repos_raw.json", raw / "repos_raw.json"
    )
    ckpt = tmp_path / "ckpt"

    run_incremental_to_warehouse(spark, raw, wh, ckpt)
    n_repos = wh.read_table("repos").count()
    n_owners = wh.read_table("owners").count()
    assert n_repos == 300 and n_owners == 1

    # rerun with no new files: checkpoint skips everything, counts hold
    run_incremental_to_warehouse(spark, raw, wh, ckpt)
    assert wh.read_table("repos").count() == n_repos

    # land one new raw file with one new + one updated repo
    base = json.load(open(raw / "repos_raw.json"))
    updated = dict(base[0])
    updated["description"] = "UPDATED-BY-STREAM"
    novel = dict(base[1])
    novel["id"] = 999_999_999
    novel["name"] = "brand-new-repo"
    novel["full_name"] = f"{novel['full_name'].split('/')[0]}/brand-new-repo"
    (raw / "repos_raw_2.json").write_text(json.dumps([updated, novel]))

    run_incremental_to_warehouse(spark, raw, wh, ckpt)
    assert wh.read_table("repos").count() == n_repos + 1
    got = wh.read_table("repos").filter(
        "description = 'UPDATED-BY-STREAM'"
    ).count()
    assert got == 1  # MERGE updated in place, no duplicate key row


# ---------------------------------------------------------------------------
# CDC changelog apply (insert/update/delete MERGE)
# ---------------------------------------------------------------------------


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "id string, val string, seq long, op string"
    )


def test_merge_apply_changelog_insert_update_delete(spark, wh):
    b1 = _changes(
        spark,
        [("a", "v1", 1, "I"), ("b", "v1", 1, "I"), ("a", "v2", 2, "U")],
    )
    wh.merge_apply_changelog(b1, "cdc_t", ["id"], order_col="seq")
    got = {
        (r["id"], r["val"])
        for r in wh.read_table("cdc_t").select("id", "val").collect()
    }
    assert got == {("a", "v2"), ("b", "v1")}  # within-batch fold kept a's last

    b2 = _changes(
        spark,
        [("b", None, 3, "D"), ("c", "new", 3, "I"), ("zz", None, 3, "D")],
    )
    wh.merge_apply_changelog(b2, "cdc_t", ["id"], order_col="seq")
    got = {
        (r["id"], r["val"])
        for r in wh.read_table("cdc_t").select("id", "val").collect()
    }
    # b deleted, c inserted, delete of absent zz was a no-op
    assert got == {("a", "v2"), ("c", "new")}

    # replay of b2 is a no-op (idempotent: delete misses, insert of c
    # now matches as an update to identical values)
    wh.merge_apply_changelog(b2, "cdc_t", ["id"], order_col="seq")
    assert wh.read_table("cdc_t").count() == 2


def test_merge_changelog_delete_wins_within_batch(spark, wh):
    # the LAST change per key in the batch decides: insert-then-delete
    # within one batch must leave nothing
    b = _changes(spark, [("x", "v", 1, "I"), ("x", None, 2, "D")])
    wh.merge_apply_changelog(b, "cdc_t2", ["id"], order_col="seq")
    assert wh.read_table("cdc_t2").count() == 0


def test_merge_sql_changelog_mssql_dialect_emission(spark, tmp_path):
    from pyspark.sql import types as T

    from incremental_github_data_pipeline_spark.sources.warehouse import (
        MssqlDialect,
    )

    w = Warehouse(
        spark, derby_url(str(tmp_path / "emit")), dialect=MssqlDialect()
    )
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("val", T.LongType()),
            T.StructField("op", T.StringType()),
        ]
    )
    sql = w.merge_sql_changelog(schema, "tgt", ["id"], "tgt_stage")
    assert "WHEN MATCHED AND" in sql and "THEN DELETE" in sql
    assert "WHEN NOT MATCHED AND NOT" in sql
    assert sql.rstrip().endswith(";")
    assert "[tgt]" in sql and "[tgt_stage]" in sql  # bracket quoting
    assert "op" not in sql.split("INSERT (")[1].split(")")[0]  # op not loaded


def test_full_five_table_load_in_fk_order(wh, spark, tmp_path):
    """The complete load the reference left as TODO (load.py:57): all
    FIVE tables, FK dependency order (owners/users -> repos -> issues/
    branches), through staged MERGE into the constraint-checked schema;
    replay is a no-op. Issues raw is reconstructed (the snapshot
    stripped it) with the same fixture the golden replay certifies."""
    import shutil

    from pyspark.sql import functions as F
    from test_github_golden import _reconstruct_issues_raw

    from incremental_github_data_pipeline_spark.pipelines.github import (
        run_transform,
    )

    raw = tmp_path / "raw"
    raw.mkdir()
    for f in ("repos_raw.json", "branches_raw.json"):
        shutil.copy(f"/root/reference/data/raw_data/{f}", raw / f)
    _reconstruct_issues_raw(raw / "issues_raw.json")

    mig.bootstrap(wh, mig.github_core_migrations())
    res = run_transform(spark, raw, issues_available=True)

    def load_all():
        wh.merge_upsert(res.owners, "owners", ["owner_id"])
        wh.merge_upsert(res.users, "users", ["user_id"])
        repos = res.repos.select(
            "repo_id", "repo_name", "full_name", "description", "topics",
            "language", "owner_id", "visibility",
            F.col("private").cast("short").alias("private"),
            F.col("disabled").cast("short").alias("disabled"),
            F.col("fork").cast("short").alias("fork"),
            F.col("archived").cast("short").alias("archived"),
            "default_branch",
            F.col("stargazers_count").cast("int").alias("stargazers_count"),
            F.col("watchers_count").cast("int").alias("watchers_count"),
            F.col("forks_count").cast("int").alias("forks_count"),
            F.col("open_issues_count").cast("int").alias("open_issues_count"),
            "created_at", "updated_at", "pushed_at",
        )
        wh.merge_upsert(repos, "repos", ["repo_id"])
        issues = res.issues.select(
            "issue_id",
            F.col("number").cast("int").alias("number"),
            "author_id",
            # Reference defect (SURVEY 4.4 #6): one real issue title is
            # 423 chars, over the reference DDL's own VARCHAR(250)
            # (001_core_schema.sql:136) — its unimplemented load would
            # have failed here. Explicit truncation, documented.
            F.substring("title", 1, 250).alias("title"),
            F.col("locked").cast("short").alias("locked"),
            F.col("comments").cast("int").alias("comments"),
            "pr_merged_at", "created_at", "updated_at", "closed_at",
            "labels", "assignee_id", "repo_id",
        )
        wh.merge_upsert(issues, "issues", ["issue_id"])
        branches = res.branches.select(
            "branch_id", "branch_name",
            F.col("protected").cast("short").alias("protected"),
            "commit_sha", "repo_id", "ingested_at",
        )
        wh.merge_upsert(branches, "branches", ["branch_id"])

    load_all()
    counts = {
        t: wh.read_table(t).count()
        for t in ("owners", "users", "repos", "issues", "branches")
    }
    # reference audit-log row counts (pipeline_error_log.txt:4-10)
    assert counts == {
        "owners": 1, "users": 1582, "repos": 300,
        "issues": 3210, "branches": 2628,
    }
    load_all()  # deterministic uuid5 keys => replay is a pure no-op
    assert wh.read_table("issues").count() == 3210
    assert wh.read_table("branches").count() == 2628
