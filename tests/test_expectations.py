"""plans.expectations — the DDL contract (SURVEY.md §4.3) as
evaluate/enforce over constructed violation cases."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from incremental_github_data_pipeline_spark.functions.scalar import (
    timestamp_ordered,
)
from incremental_github_data_pipeline_spark.plans.expectations import (
    Check,
    ForeignKey,
    Unique,
    enforce,
    evaluate,
    not_null,
)

T0 = dt.datetime(2024, 1, 1)
T1 = dt.datetime(2024, 6, 1)


def _docs(spark):
    return spark.createDataFrame(
        [
            # (id, name, count, created, updated, fk)
            (1, "a", 5, T0, T1, 10),
            (2, "b", -1, T0, T1, 10),      # negative count
            (3, None, 3, T0, T1, 20),      # null name
            (4, "d", 0, T1, T0, 99),       # updated < created AND orphan fk
            (4, "e", 1, T0, None, 10),     # duplicate id; null updated passes CHECK
        ],
        "id long, name string, cnt long, created timestamp, updated timestamp, fk long",
    )


def _dim(spark):
    return spark.createDataFrame([(10,), (20,)], "dim_id long")


def _exps(spark):
    return [
        not_null("name_not_null", "name"),
        Check("cnt_non_negative", F.col("cnt") >= 0),
        Check("updated_after_created", timestamp_ordered("updated", "created")),
        Unique("id_unique", ("id",)),
        ForeignKey("fk_dim", ("fk",), _dim(spark), ("dim_id",)),
    ]


def test_evaluate_counts(spark):
    audit = evaluate(_docs(spark), _exps(spark))
    got = {r["expectation"]: r["violations"] for r in audit.collect()}
    assert got == {
        "name_not_null": 1,
        "cnt_non_negative": 1,
        "updated_after_created": 1,
        "id_unique": 1,  # one extra copy of id=4
        "fk_dim": 1,  # fk=99
    }


def test_evaluate_clean_data_is_zero(spark):
    clean = _docs(spark).filter(F.col("id") == 1)
    audit = evaluate(clean, _exps(spark))
    assert all(r["violations"] == 0 for r in audit.collect())


def test_enforce_drops_check_and_fk_violations(spark):
    clean, audit = enforce(_docs(spark), _exps(spark))
    rows = clean.orderBy("id", "name").collect()
    # dropped: id=2 (negative), id=3 (null name), id=4/"d" (ts order+orphan)
    # kept: id=1 and the duplicate id=4/"e" (Unique is report-only)
    assert [(r["id"], r["name"]) for r in rows] == [(1, "a"), (4, "e")]
    assert audit.count() == 5


def test_enforce_null_fk_passes(spark):
    df = spark.createDataFrame([(1, None)], "id long, fk long")
    clean, _ = enforce(df, [ForeignKey("fk_dim", ("fk",), _dim(spark), ("dim_id",))])
    assert clean.count() == 1  # nullable FK: NULL passes, matching SQL


def test_github_expectation_sets_compile(spark):
    """The concrete DDL sets build and evaluate to all-zero on a minimal
    conforming row for each table."""
    from incremental_github_data_pipeline_spark.plans.expectations import (
        branches_expectations,
        owners_expectations,
        repos_expectations,
        users_expectations,
    )

    owners = spark.createDataFrame([("o1", "octo")], "owner_id string, owner_login string")
    users = spark.createDataFrame([("u1", "alice")], "user_id string, user_login string")
    repos = spark.createDataFrame(
        [("r1", "repo", "octo/repo", "o1", "public", 1, 0, 0, 0, T0, T1, T1)],
        "repo_id string, repo_name string, full_name string, owner_id string,"
        " visibility string, stargazers_count long, forks_count long,"
        " watchers_count long, open_issues_count long, created_at timestamp,"
        " updated_at timestamp, pushed_at timestamp",
    )
    branches = spark.createDataFrame(
        [("b1", "main", "r1", "0a1b2c")],
        "branch_id string, branch_name string, repo_id string, commit_sha string",
    )
    for df, exps in [
        (owners, owners_expectations()),
        (users, users_expectations()),
        (repos, repos_expectations(owners)),
        (branches, branches_expectations(repos)),
    ]:
        assert all(r["violations"] == 0 for r in evaluate(df, exps).collect())


def test_quarantine_routes_rows_with_named_reasons(spark):
    from incremental_github_data_pipeline_spark.plans.expectations import (
        Check,
        ForeignKey,
        quarantine,
    )

    ref = spark.createDataFrame([(1,), (2,)], "rid long")
    df = spark.createDataFrame(
        [
            (1, 5, 1),     # clean
            (2, -1, 2),    # fails non_negative
            (3, 5, 99),    # fails fk
            (4, -7, 99),   # fails both
            (5, 5, None),  # null FK key passes (SQL semantics)
        ],
        "id long, n long, rid long",
    )
    exps = [
        Check("non_negative_n", F.col("n") >= 0),
        ForeignKey("fk_rid", ("rid",), ref, ("rid",)),
    ]
    clean, bad = quarantine(df, exps)
    assert sorted(r["id"] for r in clean.collect()) == [1, 5]
    reasons = {r["id"]: sorted(r["_violations"]) for r in bad.collect()}
    assert reasons == {
        2: ["non_negative_n"],
        3: ["fk_rid"],
        4: ["fk_rid", "non_negative_n"],
    }
    # clean keeps the original schema; split partitions the input
    assert clean.columns == df.columns
    assert clean.count() + bad.count() == df.count()


def test_issues_expectations_pass_on_clean_and_catch_orphans(spark):
    import datetime as dt

    from incremental_github_data_pipeline_spark.plans.expectations import (
        evaluate,
        issues_expectations,
    )

    users = spark.createDataFrame(
        [("u1", "alice")], "user_id string, user_login string"
    )
    repos = spark.createDataFrame(
        [("r1", "repo")], "repo_id string, repo_name string"
    )
    schema = (
        "issue_id string, number long, author_id string, assignee_id string,"
        "title string, repo_id string, created_at timestamp,"
        "updated_at timestamp, closed_at timestamp"
    )
    t1, t2 = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2)
    ok = spark.createDataFrame(
        [("i1", 1, "u1", None, "t", "r1", t1, t2, None)], schema
    )
    res = evaluate(ok, issues_expectations(users, repos)).collect()
    cols = res[0].asDict()
    name_col = "expectation" if "expectation" in cols else "name"
    count_col = [c for c in cols if c != name_col][0]
    assert all(r[count_col] == 0 for r in res)
    orphan = spark.createDataFrame(
        [("i2", 2, "u1", None, "t", "NOPE", t1, t2, None)], schema
    )
    res2 = {
        r[name_col]: r[count_col]
        for r in evaluate(orphan, issues_expectations(users, repos)).collect()
    }
    assert res2["issues_repo_fk"] == 1
