"""Migration runner with a ``schema_migrations`` ledger — the Spark-side
twin of the reference's idempotent, transactional T-SQL migration
(``migrations/001_core_schema.sql``):

- ledger table created if absent (``:5-16``);
- an already-applied migration is skipped by ledger lookup (``:22-31``);
- each migration's statements + its ledger INSERT run in ONE
  transaction, rolled back together on any failure (``XACT_ABORT`` +
  TRY/CATCH, ``:18,33-34,290-301``) — a half-applied migration can never
  be recorded as applied, and a recorded one is never re-run.

``github_core_migrations()`` reproduces the warehouse contract of
``001_core_schema.sql:45-191`` — the five-table star schema with
PK/FK/UNIQUE/CHECK constraints — in portable DDL (Derby/ANSI): the
T-SQL-only pieces map as UNIQUEIDENTIFIER → VARCHAR(36) uuid5 strings,
BIT → SMALLINT 0/1 (the pipeline's nullable-int bool encoding, P8), and
the ``NOT LIKE '%[^0-9a-fA-F]%'`` hex class check is enforced
Spark-side by expectations (F7) since ANSI LIKE has no character
classes. Secondary indexes (``:194-283``) have no Spark-side equivalent
and map to partition/cluster layout choices (SURVEY.md §4.3).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from incremental_github_data_pipeline_spark.sources.warehouse import Warehouse

LEDGER_TABLE = "schema_migrations"


@dataclass(frozen=True)
class Migration:
    """One named migration: an id recorded in the ledger plus the DDL
    statements that must apply atomically."""

    migration_id: str
    statements: tuple[str, ...]


def applied_migrations(wh: Warehouse) -> list[str]:
    if not wh.table_exists(LEDGER_TABLE):
        return []
    return [
        str(r[0])
        for r in wh.query_rows(
            f"SELECT migration_name FROM {LEDGER_TABLE} ORDER BY migration_name"
        )
    ]


def bootstrap(wh: Warehouse, migrations: Sequence[Migration]) -> list[str]:
    """Apply pending migrations in order; return the ids applied by THIS
    call. Rerunning is a no-op (ledger skip), and a failed migration
    leaves neither its objects nor its ledger row behind."""
    if not wh.table_exists(LEDGER_TABLE):
        wh.execute(
            f"CREATE TABLE {LEDGER_TABLE} ("
            "migration_name VARCHAR(255) PRIMARY KEY, "
            "applied_at TIMESTAMP DEFAULT CURRENT_TIMESTAMP)"
        )
    done = set(applied_migrations(wh))
    applied = []
    for m in migrations:
        if m.migration_id in done:
            continue
        ledger_insert = (
            f"INSERT INTO {LEDGER_TABLE} (migration_name) "
            f"VALUES ('{m.migration_id}')"
        )
        # one transaction: DDL + ledger row commit or roll back together
        wh.execute(*m.statements, ledger_insert)
        applied.append(m.migration_id)
    return applied


def github_core_migrations() -> list[Migration]:
    """The 001_core_schema warehouse contract in portable DDL — tables
    in FK dependency order (owners/users before repos before
    issues/branches, mirroring ``001_core_schema.sql:45-191``)."""
    uuid = "VARCHAR(36)"
    return [
        Migration(
            "001_core_schema",
            (
                f"""CREATE TABLE owners (
                    owner_id {uuid} NOT NULL PRIMARY KEY,
                    owner_login VARCHAR(250) NOT NULL,
                    CONSTRAINT uq_owner_login UNIQUE (owner_login)
                )""",
                f"""CREATE TABLE users (
                    user_id {uuid} NOT NULL PRIMARY KEY,
                    user_login VARCHAR(250) NOT NULL,
                    CONSTRAINT uq_user_login UNIQUE (user_login)
                )""",
                f"""CREATE TABLE repos (
                    repo_id {uuid} NOT NULL PRIMARY KEY,
                    repo_name VARCHAR(200) NOT NULL,
                    full_name VARCHAR(255) NOT NULL,
                    description VARCHAR(1000),
                    topics VARCHAR(1000),
                    language VARCHAR(100),
                    owner_id {uuid} NOT NULL,
                    visibility VARCHAR(50) NOT NULL,
                    private SMALLINT DEFAULT 0,
                    disabled SMALLINT DEFAULT 0,
                    fork SMALLINT DEFAULT 0,
                    archived SMALLINT DEFAULT 0,
                    default_branch VARCHAR(255),
                    stargazers_count INTEGER NOT NULL DEFAULT 0,
                    watchers_count INTEGER NOT NULL DEFAULT 0,
                    forks_count INTEGER NOT NULL DEFAULT 0,
                    open_issues_count INTEGER NOT NULL DEFAULT 0,
                    created_at TIMESTAMP NOT NULL,
                    updated_at TIMESTAMP,
                    pushed_at TIMESTAMP,
                    CONSTRAINT fk_repos_owner_id FOREIGN KEY (owner_id)
                        REFERENCES owners (owner_id) ON DELETE CASCADE,
                    CONSTRAINT uq_repos_full_name UNIQUE (full_name),
                    CONSTRAINT ck_repos_visibility
                        CHECK (visibility IN ('public', 'private', 'internal')),
                    CONSTRAINT ck_non_negative_counts
                        CHECK (stargazers_count >= 0 AND forks_count >= 0
                           AND watchers_count >= 0 AND open_issues_count >= 0),
                    CONSTRAINT ck_repos_timestamps
                        CHECK (updated_at IS NULL OR updated_at >= created_at),
                    CONSTRAINT ck_repos_pushed_at
                        CHECK (pushed_at IS NULL OR pushed_at >= created_at)
                )""",
                f"""CREATE TABLE issues (
                    issue_id {uuid} NOT NULL PRIMARY KEY,
                    number INTEGER NOT NULL,
                    author_id {uuid} NOT NULL,
                    title VARCHAR(250) NOT NULL,
                    locked SMALLINT DEFAULT 0,
                    comments INTEGER NOT NULL DEFAULT 0,
                    pr_merged_at TIMESTAMP,
                    created_at TIMESTAMP NOT NULL,
                    updated_at TIMESTAMP,
                    closed_at TIMESTAMP,
                    labels VARCHAR(1000),
                    assignee_id {uuid},
                    repo_id {uuid} NOT NULL,
                    CONSTRAINT fk_issues_author_id FOREIGN KEY (author_id)
                        REFERENCES users (user_id) ON DELETE CASCADE,
                    CONSTRAINT fk_issues_assignee_id FOREIGN KEY (assignee_id)
                        REFERENCES users (user_id) ON DELETE CASCADE,
                    CONSTRAINT fk_issues_repo_id FOREIGN KEY (repo_id)
                        REFERENCES repos (repo_id) ON DELETE CASCADE,
                    CONSTRAINT ck_issues_timestamps
                        CHECK (updated_at IS NULL OR updated_at >= created_at),
                    CONSTRAINT ck_closed_at
                        CHECK (closed_at IS NULL OR closed_at >= created_at)
                )""",
                f"""CREATE TABLE branches (
                    branch_id {uuid} NOT NULL PRIMARY KEY,
                    branch_name VARCHAR(250) NOT NULL,
                    protected SMALLINT DEFAULT 0,
                    commit_sha VARCHAR(40),
                    repo_id {uuid} NOT NULL,
                    -- reference parity note: 001_core_schema.sql:181
                    -- declares DEFAULT SYSUTCDATETIME(); embedded Derby
                    -- NPEs compiling MERGE against a column with a
                    -- non-constant DEFAULT, and the pipeline always
                    -- supplies ingested_at (P12), so the portable DDL
                    -- omits the default (an MSSQL deployment can add it
                    -- in a dialect migration)
                    ingested_at TIMESTAMP,
                    CONSTRAINT fk_branches_repo_id FOREIGN KEY (repo_id)
                        REFERENCES repos (repo_id) ON DELETE CASCADE,
                    CONSTRAINT uq_repo_branch UNIQUE (repo_id, branch_name)
                )""",
            ),
        ),
    ]
