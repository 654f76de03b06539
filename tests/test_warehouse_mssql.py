"""MSSQL dialect emission tests (VERDICT r3 task 7).

The reference's actual warehouse is MSSQL (``load.py:26-31``), which is
unreachable from this sandbox — the e2e MERGE path is verified against
embedded Derby in test_warehouse.py. These tests close the remaining
S8 gap serverlessly: the SQL the MSSQL dialect EMITS is snapshot-
checked against the reference schema contract's conventions
(``/root/reference/migrations/001_core_schema.sql:45-191``): bracket-
quoted identifiers, VARCHAR (n) strings, BIT flags, INT counts,
DATETIME2 (3) timestamps, UNIQUEIDENTIFIER keys with NO IDENTITY, and
T-SQL's semicolon-terminated MERGE.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from incremental_github_data_pipeline_spark.sources.warehouse import (
    MssqlDialect,
    SqlDialect,
    Warehouse,
)

# Spark-side clean ``branches`` frame (pipelines/github.py) — the
# warehouse target is 001_core_schema.sql:175-191.
BRANCHES_SCHEMA = StructType(
    [
        StructField("branch_id", StringType(), False),
        StructField("branch_name", StringType(), False),
        StructField("protected", BooleanType(), True),
        StructField("commit_sha", StringType(), True),
        StructField("repo_id", StringType(), False),
        StructField("ingested_at", TimestampType(), True),
    ]
)

UUID_OVERRIDES = {
    "branch_id": "UNIQUEIDENTIFIER",
    "repo_id": "UNIQUEIDENTIFIER",
}


def _mssql_wh(spark) -> Warehouse:
    return Warehouse(
        spark, url="jdbc:sqlserver://unreachable", dialect=MssqlDialect()
    )


def test_mssql_branches_ddl_matches_reference_contract(spark):
    wh = _mssql_wh(spark)
    ddl = wh.create_table_ddl(
        "branches",
        BRANCHES_SCHEMA,
        key_cols=["branch_id"],
        varchar_len=250,
        column_types={**UUID_OVERRIDES, "commit_sha": "VARCHAR (40)"},
        extra_constraints=[
            "CONSTRAINT FK_branches_repo_id FOREIGN KEY ([repo_id]) "
            "REFERENCES [repos] ([repo_id]) ON DELETE CASCADE",
            "CONSTRAINT UQ_repo_branch UNIQUE ([repo_id], [branch_name])",
            "CONSTRAINT CK_commit_sha_hex CHECK ([commit_sha] IS NULL "
            "OR [commit_sha] NOT LIKE '%[^0-9a-fA-F]%')",
        ],
    )
    # column-for-column parity with 001_core_schema.sql:175-191
    assert "CREATE TABLE [branches]" in ddl
    assert "[branch_id] UNIQUEIDENTIFIER NOT NULL" in ddl
    assert "[branch_name] VARCHAR (250) NOT NULL" in ddl
    assert "[protected] BIT" in ddl
    assert "[commit_sha] VARCHAR (40)" in ddl
    assert "[repo_id] UNIQUEIDENTIFIER NOT NULL" in ddl
    assert "[ingested_at] DATETIME2 (3)" in ddl
    assert "PRIMARY KEY ([branch_id])" in ddl
    assert "FK_branches_repo_id" in ddl and "UQ_repo_branch" in ddl
    # deterministic uuid5 keys: the reference schema has no IDENTITY
    # anywhere, and neither may the emission
    assert "IDENTITY" not in ddl


def test_mssql_repos_flag_and_count_types(spark):
    """The repos contract's BIT flags / INT counts / DATETIME2 stamps
    (001_core_schema.sql:79-110) come straight from the type map."""
    wh = _mssql_wh(spark)
    schema = StructType(
        [
            StructField("repo_id", StringType(), False),
            StructField("private", BooleanType(), True),
            StructField("fork", BooleanType(), True),
            StructField("stargazers_count", IntegerType(), False),
            StructField("created_at", TimestampType(), False),
        ]
    )
    ddl = wh.create_table_ddl(
        "repos", schema, key_cols=["repo_id"], column_types=UUID_OVERRIDES
    )
    assert "[private] BIT" in ddl  # reserved word usable only bracketed
    assert "[fork] BIT" in ddl
    assert "[stargazers_count] INT NOT NULL" in ddl
    assert "[created_at] DATETIME2 (3) NOT NULL" in ddl


def test_mssql_merge_emission(spark):
    wh = _mssql_wh(spark)
    sql = wh.merge_sql(
        BRANCHES_SCHEMA, "branches", ["branch_id"], "branches_stage"
    )
    # T-SQL requires the terminator; ANSI/Derby must not get one
    assert sql.endswith(";")
    assert "MERGE INTO [branches] t USING [branches_stage] s ON " in sql
    assert "t.[branch_id] = CAST(s.[branch_id] AS NVARCHAR(4000))" in sql
    assert "WHEN MATCHED THEN UPDATE SET" in sql
    assert "WHEN NOT MATCHED THEN INSERT ([branch_id], [branch_name]" in sql
    # non-string columns pass through uncast
    assert "t.[protected] = s.[protected]" in sql


def test_ansi_dialect_emission_unchanged(spark):
    """The default dialect must keep emitting exactly what the Derby
    e2e tests verified: unquoted identifiers, VARCHAR(n), BOOLEAN,
    TIMESTAMP, no terminator."""
    wh = Warehouse(spark, url="jdbc:derby:memory:unused")
    assert isinstance(wh.dialect, SqlDialect)
    ddl = wh.create_table_ddl(
        "branches", BRANCHES_SCHEMA, key_cols=["branch_id"], varchar_len=250
    )
    assert "CREATE TABLE branches" in ddl
    assert "branch_id VARCHAR(250) NOT NULL" in ddl
    assert "protected BOOLEAN" in ddl
    assert "ingested_at TIMESTAMP" in ddl
    assert "[" not in ddl
    sql = wh.merge_sql(
        BRANCHES_SCHEMA, "branches", ["branch_id"], "branches_stage"
    )
    assert not sql.endswith(";")
    assert "t.branch_id = CAST(s.branch_id AS VARCHAR(32672))" in sql
