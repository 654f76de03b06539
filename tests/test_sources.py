"""sources.readers / sources.writers — S4/S5/S7/S10 contracts:
structural validation errors, rotation semantics, audit log."""

from __future__ import annotations

import pytest

from incremental_github_data_pipeline_spark.pipelines.github import (
    BRANCHES_RAW_SCHEMA,
)
from incremental_github_data_pipeline_spark.sources.readers import (
    read_json_array,
    validate_json_array_file,
)
from incremental_github_data_pipeline_spark.sources.writers import (
    AuditLog,
    write_rotating,
)


def test_validate_missing_file_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        validate_json_array_file(tmp_path / "nope.json")


def test_validate_empty_file_raises(tmp_path):
    p = tmp_path / "empty.json"
    p.write_text("")
    with pytest.raises(ValueError):
        validate_json_array_file(p)


def test_validate_non_array_raises(tmp_path):
    p = tmp_path / "obj.json"
    p.write_text('{"a": 1}')
    with pytest.raises(TypeError):
        validate_json_array_file(p)


def test_read_json_array_happy_path(spark, tmp_path):
    p = tmp_path / "branches.json"
    p.write_text(
        '[{"name": "main", "protected": true, "repo_name": "r",'
        ' "commit": {"sha": "ab12", "url": "u"}}]'
    )
    df = read_json_array(spark, p, BRANCHES_RAW_SCHEMA)
    row = df.collect()[0]
    assert row["name"] == "main"
    assert row["commit"]["sha"] == "ab12"


def test_write_rotating_keeps_one_backup(spark, tmp_path):
    df1 = spark.createDataFrame([(1,)], "v long")
    df2 = spark.createDataFrame([(2,)], "v long")
    df3 = spark.createDataFrame([(3,)], "v long")
    write_rotating(df1, tmp_path, "t", coalesce=1)
    write_rotating(df2, tmp_path, "t", coalesce=1)
    write_rotating(df3, tmp_path, "t", coalesce=1)
    assert spark.read.parquet(str(tmp_path / "t")).collect()[0]["v"] == 3
    assert spark.read.parquet(str(tmp_path / "t_backup")).collect()[0]["v"] == 2
    # exactly one backup generation (the reference's rotation contract)
    assert not (tmp_path / "t_backup_backup").exists()


def test_audit_log_appends_timestamped_lines(tmp_path):
    log = AuditLog(tmp_path / "audit.txt")
    log.log("first")
    log.log("second")
    lines = (tmp_path / "audit.txt").read_text().strip().splitlines()
    assert len(lines) == 2
    assert lines[0].endswith("first") and ": " in lines[0]
