"""The GitHub ELT pipeline (reference /root/reference/transform.py)
re-expressed as one lazy Spark DAG.

Semantics parity (SURVEY.md §3.2):
  repos → {owners, branches, issues} → users, where issues/branches
  resolve repo_id against the cleaned repos dim and users is the union of
  issue authors and assignees. Each cleaner is P1→P2→P3→A1→key-gen→J/P6/
  P7/P8/P9/P10→P14 exactly as the reference, but declarative: Catalyst
  prunes the JSON scan to the selected struct fields, broadcasts the
  repos dim into both fact joins, and the whole five-table run is a
  handful of stages instead of five sequential pandas passes.

Documented deviations from reference behavior (all reference bugs,
SURVEY.md §4.4): the `_log_issues` typo can't crash us (audit is
observe-based), `user_login` is actually cast, and FK-orphan drop applies
to branches too (flag to disable for strict bug-for-bug parity).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from incremental_github_data_pipeline_spark import keys
from incremental_github_data_pipeline_spark.operators import core as ops
from incremental_github_data_pipeline_spark.sources.readers import read_json_array

# ---------------------------------------------------------------------------
# Raw-zone schemas (explicit — SURVEY.md §1.4). Only consumed fields are
# declared; the JSON reader skips the other ~60 keys GitHub sends.
# ---------------------------------------------------------------------------

OWNER_STRUCT = StructType(
    [StructField("id", LongType()), StructField("login", StringType())]
)

REPOS_RAW_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("full_name", StringType()),
        StructField("description", StringType()),
        StructField("topics", ArrayType(StringType())),
        StructField("language", StringType()),
        StructField("owner", OWNER_STRUCT),
        StructField("visibility", StringType()),
        StructField("private", BooleanType()),
        StructField("disabled", BooleanType()),
        StructField("fork", BooleanType()),
        StructField("archived", BooleanType()),
        StructField("default_branch", StringType()),
        StructField("stargazers_count", LongType()),
        StructField("watchers_count", LongType()),
        StructField("forks_count", LongType()),
        StructField("forks", LongType()),
        StructField("open_issues_count", LongType()),
        StructField("created_at", StringType()),
        StructField("updated_at", StringType()),
        StructField("pushed_at", StringType()),
    ]
)

ISSUES_RAW_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("repo_name", StringType()),
        StructField("number", LongType()),
        StructField("user", OWNER_STRUCT),
        StructField("title", StringType()),
        StructField("state", StringType()),
        StructField("locked", BooleanType()),
        StructField("comments", LongType()),
        StructField(
            "pull_request",
            StructType([StructField("merged_at", StringType())]),
        ),
        StructField("created_at", StringType()),
        StructField("updated_at", StringType()),
        StructField("closed_at", StringType()),
        StructField(
            "labels",
            ArrayType(StructType([StructField("name", StringType())])),
        ),
        StructField("assignee", OWNER_STRUCT),
    ]
)

BRANCHES_RAW_SCHEMA = StructType(
    [
        StructField("name", StringType()),
        StructField("protected", BooleanType()),
        StructField("repo_name", StringType()),
        StructField(
            "commit",
            StructType(
                [StructField("sha", StringType()), StructField("url", StringType())]
            ),
        ),
    ]
)

# Pinned output column orders (P14; transform.py:199-206, :341-345, :411).
REPOS_CLEAN_COLS = [
    "repo_id", "github_repo_id", "repo_name", "full_name", "description",
    "topics", "language", "owner_id", "github_owner_id", "owner_login",
    "visibility", "private", "disabled", "fork", "archived",
    "default_branch", "stargazers_count", "watchers_count", "forks_count",
    "forks", "open_issues_count", "created_at", "updated_at", "pushed_at",
]
ISSUES_CLEAN_COLS = [
    "issue_id", "github_issue_id", "number", "author_id", "github_author_id",
    "author_login", "title", "state", "locked", "comments", "pr_merged_at",
    "created_at", "updated_at", "closed_at", "labels", "assignee_id",
    "assignee_login", "repo_id",
]
BRANCHES_CLEAN_COLS = [
    "branch_id", "branch_name", "protected", "commit_sha", "repo_id", "ingested_at",
]


def clean_repos(raw: DataFrame) -> DataFrame:
    """transform.py:81-209 as one declarative chain."""
    df = ops.with_input_seq(raw)
    df = ops.select_rename(
        df,
        {
            "id": "github_repo_id",
            "name": "repo_name",
            "full_name": "full_name",
            "description": "description",
            "topics": "topics",
            "language": "language",
            "owner.id": "github_owner_id",
            "owner.login": "owner_login",
            "visibility": "visibility",
            "private": "private",
            "disabled": "disabled",
            "fork": "fork",
            "archived": "archived",
            "default_branch": "default_branch",
            "stargazers_count": "stargazers_count",
            "watchers_count": "watchers_count",
            "forks_count": "forks_count",
            "forks": "forks",
            "open_issues_count": "open_issues_count",
            "created_at": "created_at",
            "updated_at": "updated_at",
            "pushed_at": "pushed_at",
            ops.SEQ_COL: ops.SEQ_COL,
        },
    )
    df = ops.drop_null_keys(df, ["github_repo_id", "github_owner_id", "owner_login"])
    df = ops.dedupe_keep_last(df, ["github_repo_id"])
    df = df.withColumns(
        {
            "repo_id": keys.uuid5(
                keys.NAMESPACE_REPO,
                keys.business_key(F.col("owner_login"), F.col("repo_name")),
            ),
            "owner_id": keys.uuid5(keys.NAMESPACE_OWNER, F.col("owner_login")),
            "topics": ops.collapse_array("topics"),
        }
    )
    df = ops.parse_timestamps_utc(df, ["created_at", "updated_at", "pushed_at"])
    df = ops.cast_schema(
        df, {c: "long" for c in ["private", "disabled", "fork", "archived"]}
    )
    return df.select(REPOS_CLEAN_COLS)


def clean_owners(repos_clean: DataFrame) -> DataFrame:
    """transform.py:466-489 — project the owner dim out of repos."""
    return ops.dedupe_keep_first(
        ops.drop_null_keys(
            repos_clean.select("owner_id", "owner_login"),
            ["owner_id", "owner_login"],
        ),
        ["owner_id"],
    )


def clean_branches(
    raw: DataFrame,
    repos_clean: DataFrame,
    drop_orphans: bool = True,
    observations: dict[str, Observation] | None = None,
) -> DataFrame:
    """transform.py:350-414. ``drop_orphans=False`` reproduces the
    reference's missing-FK-drop bug (SURVEY.md §4.4 item 3) bit-for-bit;
    default applies J3 uniformly. ``observations`` (if given) collects
    the pre-clean row count and FK orphan count as observe metrics that
    ride the caller's action — the audit counts (A3/A4) cost no extra
    job."""
    df = ops.with_input_seq(raw)
    df = ops.select_rename(
        df,
        {
            "name": "branch_name",
            "protected": "protected",
            "repo_name": "repo_name",
            "commit.sha": "commit_sha",
            ops.SEQ_COL: ops.SEQ_COL,
        },
    )
    fk_obs = None
    if observations is not None:
        pre = Observation("branches_pre")
        fk_obs = Observation("branches_fk")
        observations["branches_pre"] = pre
        observations["branches_fk"] = fk_obs
        df = df.observe(pre, F.count(F.lit(1)).alias("rows"))
    df = ops.drop_null_keys(df, ["branch_name"])
    df = ops.dedupe_keep_last(df, ["repo_name", "branch_name"])
    df = df.withColumn(
        "branch_id",
        keys.uuid5(
            keys.NAMESPACE_BRANCH,
            keys.business_key(F.col("repo_name"), F.col("branch_name")),
        ),
    )
    df = ops.resolve_fk(
        df,
        repos_clean,
        on="repo_name",
        key="repo_id",
        drop_orphans=drop_orphans,
        audit={"name": "branches_fk", "observation": fk_obs},
    )
    df = ops.cast_schema(df, {"protected": "long"})
    df = df.withColumn("ingested_at", F.current_timestamp())
    return df.select(BRANCHES_CLEAN_COLS)


def clean_issues(
    raw: DataFrame,
    repos_clean: DataFrame,
    observations: dict[str, Observation] | None = None,
) -> DataFrame:
    """transform.py:211-348. ``observations`` as in :func:`clean_branches`."""
    df = ops.with_input_seq(raw)
    df = ops.select_rename(
        df,
        {
            "id": "github_issue_id",
            "repo_name": "repo_name",
            "number": "number",
            "user.login": "author_login",
            "user.id": "github_author_id",
            "title": "title",
            "state": "state",
            "locked": "locked",
            "comments": "comments",
            "pull_request.merged_at": "pr_merged_at",
            "created_at": "created_at",
            "updated_at": "updated_at",
            "closed_at": "closed_at",
            "labels": "labels",
            "assignee.login": "assignee_login",
            "assignee.id": "assignee_id",
            ops.SEQ_COL: ops.SEQ_COL,
        },
    )
    fk_obs = None
    if observations is not None:
        pre = Observation("issues_pre")
        fk_obs = Observation("issues_fk")
        observations["issues_pre"] = pre
        observations["issues_fk"] = fk_obs
        df = df.observe(pre, F.count(F.lit(1)).alias("rows"))
    df = ops.drop_null_keys(
        df, ["github_issue_id", "repo_name", "author_login", "github_author_id"]
    )
    df = ops.dedupe_keep_last(df, ["github_issue_id"])
    df = df.withColumns(
        {
            "issue_id": keys.uuid5(
                keys.NAMESPACE_ISSUE,
                keys.business_key(F.col("repo_name"), F.col("number")),
            ),
            "author_id": keys.uuid5(keys.NAMESPACE_USER, F.col("author_login")),
            # Conditional key-gen for nullable assignee (transform.py:282-288)
            # — keys.uuid5 already yields NULL on NULL input.
            "assignee_id": keys.uuid5(keys.NAMESPACE_USER, F.col("assignee_login")),
            "labels": ops.collapse_struct_array("labels", "name"),
        }
    )
    df = ops.resolve_fk(
        df, repos_clean, on="repo_name", key="repo_id",
        drop_orphans=True, audit={"name": "issues_fk", "observation": fk_obs},
    )
    df = ops.parse_timestamps_utc(
        df, ["created_at", "updated_at", "closed_at", "pr_merged_at"]
    )
    df = ops.cast_schema(df, {"locked": "long"})
    return df.select(ISSUES_CLEAN_COLS)


def clean_users(issues_clean: DataFrame) -> DataFrame:
    """transform.py:416-464 — authors ∪ assignees → user dim.

    Deviation (reference bug 2): user_login IS cast to string here; the
    reference's duplicate dict key left it untyped."""
    unioned = ops.union_conform(
        [issues_clean, issues_clean],
        [
            {"author_id": "user_id", "author_login": "user_login"},
            {"assignee_id": "user_id", "assignee_login": "user_login"},
        ],
    )
    users = ops.drop_null_keys(unioned, ["user_id", "user_login"])
    users = ops.dedupe_keep_first(users, ["user_id"])
    return ops.cast_schema(users, {"user_id": "string", "user_login": "string"})


@dataclass
class GithubPipelineResult:
    repos: DataFrame
    owners: DataFrame
    branches: DataFrame
    issues: DataFrame
    users: DataFrame
    observations: dict[str, Observation] = field(default_factory=dict)

    def tables(self) -> dict[str, DataFrame]:
        return {
            "repos_clean": self.repos,
            "owners_clean": self.owners,
            "branches_clean": self.branches,
            "issues_clean": self.issues,
            "users_clean": self.users,
        }

    def emit_audit(self, audit) -> list[str]:
        """Write the reference's pipeline_error_log.txt lines with its
        exact message texts and emission order (transform.py:492-497
        script order; formats at :209, :264, :304, :348, :381, :414,
        :464, :486, :489). Returns the messages for inspection.

        Count sources: one count() per table (repos is cached; the dims
        are tiny) plus the observe metrics collected during those same
        actions — the pre-clean row counts and FK orphan counts ride the
        table counts, no extra jobs.

        Semantics notes, pinned against the reference code:
        - OWNERS drop count is ``og - new`` where og = repos rows (the
          owner frame starts as repos' two owner columns,
          transform.py:467-474) — the committed log's older
          ``'300 - 1 dropped'`` line predates the reference's current
          f-string; we match the current code (``299``).
        - The per-cleaner ``'{TABLE} | n dropped during cleaning.'``
          calls for ISSUES/BRANCHES/USERS hit the ``_log_issues`` typo
          in the reference (transform.py:264,381,456 — AttributeError if
          they ever fire; documented bug, SURVEY.md §4.4 item 1). We
          emit the same texts through the working logger.
        - USERS measures og AFTER the intra-batch dedup
          (transform.py:437-452), so in a single run og == new and no
          drop line is emitted — matching the committed log.
        - BRANCHES has no FK-enforcement line in the reference (the
          forgotten orphan drop, §4.4 item 3); we stay line-compatible
          and emit the FK line only for ISSUES.
        """
        msgs: list[str] = []
        n_repos = self.repos.count()
        msgs.append(f"REPOS - Complete | {n_repos} rows loaded.")
        n_owners = self.owners.count()
        if n_repos != n_owners:
            msgs.append(f"OWNERS | {n_repos - n_owners} dropped during cleaning.")
        msgs.append(f"OWNERS - Complete | {n_owners} rows loaded.")

        n_branches = self.branches.count()
        b_pre, b_orph = self._obs("branches_pre", "rows"), self._obs(
            "branches_fk", "orphans"
        )
        if b_pre is not None:
            dropped = b_pre - (b_orph or 0) - n_branches
            if dropped:
                msgs.append(f"BRANCHES | {dropped} dropped during cleaning.")
        msgs.append(f"BRANCHES - Complete | {n_branches} rows loaded.")

        n_issues = self.issues.count()
        i_pre, i_orph = self._obs("issues_pre", "rows"), self._obs(
            "issues_fk", "orphans"
        )
        if i_pre is not None:
            dropped = i_pre - (i_orph or 0) - n_issues
            if dropped:
                msgs.append(f"ISSUES | {dropped} dropped during cleaning.")
        if i_orph:
            msgs.append(
                f"ISSUES | {i_orph} rows with missing repo_id (FK Enforcement)."
            )
        msgs.append(f"ISSUES - Complete | {n_issues} rows loaded.")

        msgs.append(f"USERS - Complete | {self.users.count()} rows loaded.")
        for m in msgs:
            audit.log(m)
        return msgs

    def _obs(self, name: str, metric: str) -> int | None:
        obs = self.observations.get(name)
        if obs is None:
            return None
        return obs.get[metric]


def run_transform(
    spark: SparkSession,
    raw_dir: str | Path,
    issues_available: bool = True,
    drop_branch_orphans: bool = True,
    audit=None,
) -> GithubPipelineResult:
    """Entry point 2 (transform.py:492-497) as one lazy DAG.

    The repos dim is cached — it feeds owners plus both fact joins
    (broadcast, ≤300 rows) — the only materialization decision in the
    whole pipeline.

    ``audit`` (an AuditLog) receives raw-validation failures with the
    reference's line texts at read time; after materializing, call
    ``result.emit_audit(audit)`` for the per-table completion lines.
    """
    raw_dir = Path(raw_dir)
    obs: dict[str, Observation] = {}
    repos_raw = read_json_array(
        spark, raw_dir / "repos_raw.json", REPOS_RAW_SCHEMA, audit=audit
    )
    repos = clean_repos(repos_raw).cache()
    owners = clean_owners(repos)
    branches = clean_branches(
        read_json_array(
            spark, raw_dir / "branches_raw.json", BRANCHES_RAW_SCHEMA, audit=audit
        ),
        repos,
        drop_orphans=drop_branch_orphans,
        observations=obs,
    )
    if issues_available:
        issues = clean_issues(
            read_json_array(
                spark, raw_dir / "issues_raw.json", ISSUES_RAW_SCHEMA, audit=audit
            ),
            repos,
            observations=obs,
        )
    else:
        issues = spark.createDataFrame([], schema=_issues_clean_schema())
    users = clean_users(issues)
    return GithubPipelineResult(repos, owners, branches, issues, users, obs)


def _issues_clean_schema() -> StructType:
    from pyspark.sql.types import TimestampType

    f = StructField
    return StructType(
        [
            f("issue_id", StringType()), f("github_issue_id", LongType()),
            f("number", LongType()), f("author_id", StringType()),
            f("github_author_id", LongType()), f("author_login", StringType()),
            f("title", StringType()), f("state", StringType()),
            f("locked", LongType()), f("comments", LongType()),
            f("pr_merged_at", TimestampType()), f("created_at", TimestampType()),
            f("updated_at", TimestampType()), f("closed_at", TimestampType()),
            f("labels", StringType()), f("assignee_id", StringType()),
            f("assignee_login", StringType()), f("repo_id", StringType()),
        ]
    )


def repos_for_warehouse(repos: DataFrame) -> DataFrame:
    """Project the clean repos frame onto the warehouse DDL columns:
    the DB drops the github_* natural-key passthroughs (ref load.py:57
    left this unreached) and narrows int widths to the DDL types
    (ref 001_core_schema.sql repo table)."""
    return repos.select(
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
