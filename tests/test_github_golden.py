"""Golden replay (SURVEY.md §5.2 item 1): run the Spark pipeline over the
reference's committed raw JSON and diff against its committed clean CSVs.
Pins P1-P14, J1-J3, A1-A3, U1, F1-F6 end-to-end, incl. uuid5 bit-exactness.

issues_raw.json was stripped from the snapshot (.MISSING_LARGE_BLOBS), so
the issues/users replay runs over a RECONSTRUCTED raw fixture: the
projection transform.py:215-232 is inverted field-by-field from the
committed issues_clean.csv (the clean rows are exactly the surviving raw
rows — every drop/dedup no-ops on replay, so bit-for-bit equality still
pins the full cleaner). Two fields are not invertible and harmless:
the natural assignee.id (selected then overwritten by the uuid5 key,
transform.py:282-288 — synthesized as 0) and any label name containing a
comma (split-and-rejoin reproduces the identical collapsed string either
way). Key re-derivation tests are kept as an independent check.
"""

from __future__ import annotations

import uuid

import pandas as pd
import pytest

from incremental_github_data_pipeline_spark import keys
from incremental_github_data_pipeline_spark.pipelines import github as gh
from tests.conftest import REF_CLEAN, REF_RAW


@pytest.fixture(scope="module")
def result(spark):
    return gh.run_transform(spark, REF_RAW, issues_available=False)


def _iso(v) -> str | None:
    if pd.isna(v):
        return None
    return pd.Timestamp(v).strftime("%Y-%m-%dT%H:%M:%SZ")


def _reconstruct_issues_raw(path) -> None:
    """Invert transform.py:215-232's projection: clean issues row →
    the 16 consumed raw fields (see module docstring)."""
    import json

    issues = pd.read_csv(f"{REF_CLEAN}/issues_clean.csv")
    repos = pd.read_csv(f"{REF_CLEAN}/repos_clean.csv")
    name_of = repos.set_index("repo_id")["repo_name"]
    records = []
    for _, r in issues.iterrows():
        records.append(
            {
                "id": int(r["github_issue_id"]),
                "repo_name": name_of[r["repo_id"]],
                "number": int(r["number"]),
                "user": {"id": int(r["github_author_id"]), "login": r["author_login"]},
                "title": None if pd.isna(r["title"]) else r["title"],
                "state": None if pd.isna(r["state"]) else r["state"],
                "locked": bool(r["locked"]) if pd.notna(r["locked"]) else None,
                "comments": int(r["comments"]) if pd.notna(r["comments"]) else None,
                "pull_request": (
                    {"merged_at": _iso(r["pr_merged_at"])}
                    if pd.notna(r["pr_merged_at"])
                    else None
                ),
                "created_at": _iso(r["created_at"]),
                "updated_at": _iso(r["updated_at"]),
                "closed_at": _iso(r["closed_at"]),
                "labels": (
                    [{"name": n} for n in str(r["labels"]).split(",")]
                    if pd.notna(r["labels"])
                    else []
                ),
                "assignee": (
                    {"id": 0, "login": r["assignee_login"]}
                    if pd.notna(r["assignee_login"])
                    else None
                ),
            }
        )
    path.write_text(json.dumps(records))


@pytest.fixture(scope="module")
def issues_result(spark, result, tmp_path_factory):
    p = tmp_path_factory.mktemp("issues_fixture") / "issues_raw.json"
    _reconstruct_issues_raw(p)
    issues = gh.clean_issues(
        gh.read_json_array(spark, p, gh.ISSUES_RAW_SCHEMA), result.repos
    )
    return issues


def _norm(series: pd.Series, as_ts: bool = False) -> pd.Series:
    if as_ts:
        return pd.to_datetime(series, utc=True, format="mixed")
    s = series.astype("string")
    return s.replace("", pd.NA)


def _assert_frames_match(got: pd.DataFrame, want: pd.DataFrame, key: str, ts_cols=()):
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        a = _norm(got[c], as_ts=c in ts_cols)
        b = _norm(want[c], as_ts=c in ts_cols)
        eq = ((a.isna() & b.isna()) | (a == b)).fillna(False)
        assert eq.all(), f"column {c}: first mismatch at row {(~eq).idxmax()}"


def test_repos_golden(result):
    got = result.repos.toPandas()
    want = pd.read_csv(f"{REF_CLEAN}/repos_clean.csv")
    _assert_frames_match(
        got, want, "repo_id", ts_cols={"created_at", "updated_at", "pushed_at"}
    )


def test_owners_golden(result):
    got = result.owners.toPandas()
    want = pd.read_csv(f"{REF_CLEAN}/owners_clean.csv")
    _assert_frames_match(got, want, "owner_id")


def test_branches_golden(result):
    got = result.branches.toPandas().drop(columns=["ingested_at"])
    want = pd.read_csv(f"{REF_CLEAN}/branches_clean.csv").drop(columns=["ingested_at"])
    _assert_frames_match(got, want, "branch_id")


def test_issues_golden(issues_result):
    got = issues_result.toPandas()
    want = pd.read_csv(f"{REF_CLEAN}/issues_clean.csv")
    _assert_frames_match(
        got,
        want,
        "issue_id",
        ts_cols={"created_at", "updated_at", "closed_at", "pr_merged_at"},
    )


def test_users_golden(issues_result):
    got = gh.clean_users(issues_result).toPandas()
    want = pd.read_csv(f"{REF_CLEAN}/users_clean.csv")
    _assert_frames_match(got, want, "user_id")


def test_issues_keys_rederive_from_golden():
    """All four surrogate keys in issues_clean.csv reproduce from business
    columns — validates the key-gen contract the issues cleaner encodes."""
    issues = pd.read_csv(f"{REF_CLEAN}/issues_clean.csv")
    repos = pd.read_csv(f"{REF_CLEAN}/repos_clean.csv")
    repo_name = repos.set_index("repo_id")["repo_name"]
    joined = issues.join(repo_name, on="repo_id")
    for _, r in joined.head(500).iterrows():
        assert r["issue_id"] == str(
            uuid.uuid5(keys.NAMESPACE_ISSUE, f"{r['repo_name']}|{r['number']}")
        )
        assert r["author_id"] == str(
            uuid.uuid5(keys.NAMESPACE_USER, r["author_login"])
        )
        if pd.notna(r["assignee_login"]):
            assert r["assignee_id"] == str(
                uuid.uuid5(keys.NAMESPACE_USER, r["assignee_login"])
            )


def test_users_golden_is_union_of_issue_participants():
    users = pd.read_csv(f"{REF_CLEAN}/users_clean.csv")
    issues = pd.read_csv(f"{REF_CLEAN}/issues_clean.csv")
    authors = issues[["author_id", "author_login"]].rename(
        columns={"author_id": "user_id", "author_login": "user_login"}
    )
    assignees = issues[["assignee_id", "assignee_login"]].rename(
        columns={"assignee_id": "user_id", "assignee_login": "user_login"}
    )
    expected = (
        pd.concat([authors, assignees], ignore_index=True)
        .dropna(subset=["user_id", "user_login"])
        .drop_duplicates(subset=["user_id"])
    )
    assert len(users) == len(expected)
    assert set(users["user_id"]) == set(expected["user_id"])


def test_issues_cleaner_on_synthetic_raw(spark, tmp_path):
    """Full issues path on a constructed raw file covering: dup ids
    (keep-last), null author (drop), orphan repo (FK drop), labels
    empty/multi, nullable assignee, malformed timestamp coercion."""
    import json

    raw = [
        {  # survives; assignee + 2 labels
            "id": 1, "repo_name": "r1", "number": 11,
            "user": {"id": 100, "login": "alice"},
            "title": "t1", "state": "open", "locked": False, "comments": 2,
            "pull_request": {"merged_at": "2024-05-06T07:08:09Z"},
            "created_at": "2024-01-01T00:00:00Z",
            "updated_at": "2024-01-02T00:00:00Z", "closed_at": None,
            "labels": [{"name": "bug"}, {"name": "p1"}],
            "assignee": {"id": 200, "login": "bob"},
        },
        {  # dup id=1 — later wins
            "id": 1, "repo_name": "r1", "number": 11,
            "user": {"id": 100, "login": "alice"},
            "title": "t1-updated", "state": "closed", "locked": True, "comments": 3,
            "pull_request": None,
            "created_at": "2024-01-01T00:00:00Z",
            "updated_at": "bogus", "closed_at": "2024-02-02T00:00:00Z",
            "labels": [], "assignee": None,
        },
        {  # null author login — dropped by P3
            "id": 2, "repo_name": "r1", "number": 12,
            "user": {"id": 101, "login": None},
            "title": "t2", "state": "open", "locked": False, "comments": 0,
            "pull_request": None, "created_at": "2024-01-01T00:00:00Z",
            "updated_at": None, "closed_at": None, "labels": None, "assignee": None,
        },
        {  # orphan repo — dropped by J3
            "id": 3, "repo_name": "ghost", "number": 1,
            "user": {"id": 102, "login": "carol"},
            "title": "t3", "state": "open", "locked": False, "comments": 0,
            "pull_request": None, "created_at": "2024-01-01T00:00:00Z",
            "updated_at": None, "closed_at": None, "labels": None, "assignee": None,
        },
    ]
    p = tmp_path / "issues_raw.json"
    p.write_text(json.dumps(raw))
    raw_df = gh.read_json_array(spark, p, gh.ISSUES_RAW_SCHEMA)
    repos = spark.createDataFrame(
        [("rid1", "r1")], "repo_id string, repo_name string"
    )
    out = gh.clean_issues(raw_df, repos).toPandas()
    assert list(out.columns) == gh.ISSUES_CLEAN_COLS
    assert len(out) == 1
    row = out.iloc[0]
    assert row["title"] == "t1-updated"          # keep-last won
    assert row["locked"] == 1                     # bool→int
    assert pd.isna(row["updated_at"])             # coerce on malformed
    assert pd.isna(row["labels"])                 # empty list → NULL (P10)
    assert pd.isna(row["assignee_id"])            # conditional key-gen
    assert row["issue_id"] == str(uuid.uuid5(keys.NAMESPACE_ISSUE, "r1|11"))
    assert row["repo_id"] == "rid1"
