"""Audit-log message-format parity (round-2 verdict "What's missing" #4).

The reference appends timestamped lines to pipeline_error_log.txt
(_log_issue, transform.py:35-39). Round 2 pinned the timestamp format;
this module pins the MESSAGE TEXTS: every line our pipeline emits over
the reference's own snapshot must appear verbatim (modulo timestamp) in
the reference's committed log, and the full-run sequence must match the
committed 17:22:38-17:22:40 run line-for-line.

One deliberate deviation is asserted rather than papered over: the
committed log's ``'OWNERS | 300 - 1 dropped during cleaning.'`` predates
the reference's current f-string (transform.py:486 computes
``og_rows - new_rows`` → ``'299'``); we match the current code, and the
committed log also contains the ``'299'`` form from a later run.
"""

from __future__ import annotations

import re
from pathlib import Path

import pytest

from incremental_github_data_pipeline_spark.pipelines import github as gh
from incremental_github_data_pipeline_spark.sources.readers import (
    validate_json_array_file,
)
from incremental_github_data_pipeline_spark.sources.writers import AuditLog
from tests.conftest import REF_RAW
from tests.test_github_golden import _reconstruct_issues_raw

REF_LOG = Path("/root/reference/data/issue_log/pipeline_error_log.txt")
TS_RE = re.compile(r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}: ")

# The committed full-run block (REPOS 17:22:38 → USERS 17:22:40), with
# the owners-drop count per the reference's CURRENT code (see module
# docstring).
EXPECTED_RUN = [
    "REPOS - Complete | 300 rows loaded.",
    "OWNERS | 299 dropped during cleaning.",
    "OWNERS - Complete | 1 rows loaded.",
    "BRANCHES - Complete | 2628 rows loaded.",
    "ISSUES - Complete | 3210 rows loaded.",
    "USERS - Complete | 1582 rows loaded.",
]


def _strip_ts(line: str) -> str:
    assert TS_RE.match(line), f"bad timestamp prefix: {line!r}"
    return TS_RE.sub("", line)


@pytest.fixture(scope="module")
def full_run_messages(spark, tmp_path_factory):
    """Run the pipeline over the reference snapshot (issues via the
    reconstructed fixture) and capture the emitted audit lines."""
    raw = tmp_path_factory.mktemp("audit_raw")
    for f in ("repos_raw.json", "branches_raw.json"):
        (raw / f).write_bytes((Path(REF_RAW) / f).read_bytes())
    _reconstruct_issues_raw(raw / "issues_raw.json")
    log_path = tmp_path_factory.mktemp("audit_log") / "pipeline_error_log.txt"
    audit = AuditLog(log_path)
    res = gh.run_transform(spark, raw, audit=audit)
    msgs = res.emit_audit(audit)
    return msgs, log_path


def test_full_run_sequence_matches_reference_log(full_run_messages):
    msgs, _ = full_run_messages
    assert msgs == EXPECTED_RUN


def test_emitted_lines_are_timestamped_and_verbatim(full_run_messages):
    msgs, log_path = full_run_messages
    written = [_strip_ts(line) for line in log_path.read_text().splitlines()]
    assert written == msgs


def test_every_emitted_text_appears_in_reference_log(full_run_messages):
    """Message-TEXT parity: each line we produce is a line the reference
    actually wrote (its log contains runs with both the repos-only and
    the full five-cleaner invocation, so all six texts are present)."""
    msgs, _ = full_run_messages
    ref_texts = {TS_RE.sub("", ln) for ln in REF_LOG.read_text().splitlines()}
    missing = [m for m in msgs if m not in ref_texts]
    assert missing == [], f"texts never produced by the reference: {missing}"


def test_validation_failure_line_matches_reference(tmp_path):
    """transform.py:61 — '{file}.json does not exist!' with the bare
    file name; the committed log's 'test.json does not exist!' line is
    the exact fixture."""
    log_path = tmp_path / "log.txt"
    audit = AuditLog(log_path)
    with pytest.raises(FileNotFoundError):
        validate_json_array_file(tmp_path / "test.json", audit=audit)
    lines = [_strip_ts(ln) for ln in log_path.read_text().splitlines()]
    assert lines == ["test.json does not exist!"]
    ref_texts = {TS_RE.sub("", ln) for ln in REF_LOG.read_text().splitlines()}
    assert "test.json does not exist!" in ref_texts


def test_validation_empty_and_type_lines(tmp_path):
    log_path = tmp_path / "log.txt"
    audit = AuditLog(log_path)
    empty = tmp_path / "empty_raw.json"
    empty.write_text("")
    with pytest.raises(ValueError):
        validate_json_array_file(empty, audit=audit)
    obj = tmp_path / "obj_raw.json"
    obj.write_text('{"a": 1}')
    with pytest.raises(TypeError):
        validate_json_array_file(obj, audit=audit)
    lines = [_strip_ts(ln) for ln in log_path.read_text().splitlines()]
    assert lines == [
        "empty_raw.json is empty!",
        "Incorrect top-level type in obj_raw.json",
    ]


def test_fk_enforcement_line_fires_on_orphans(spark, tmp_path):
    """transform.py:304 — seed one issue whose repo_name resolves to no
    repo; the FK line must appear with the reference's exact format."""
    import json

    raw = tmp_path / "raw"
    raw.mkdir()
    for f in ("repos_raw.json", "branches_raw.json"):
        (raw / f).write_bytes((Path(REF_RAW) / f).read_bytes())
    issues = [
        {
            "id": 1,
            "repo_name": "no-such-repo",
            "number": 1,
            "user": {"id": 7, "login": "alice"},
            "title": "t",
            "state": "open",
            "locked": False,
            "comments": 0,
            "pull_request": None,
            "created_at": "2024-01-01T00:00:00Z",
            "updated_at": "2024-01-01T00:00:00Z",
            "closed_at": None,
            "labels": [],
            "assignee": None,
        }
    ]
    (raw / "issues_raw.json").write_text(json.dumps(issues))
    audit = AuditLog(tmp_path / "log.txt")
    res = gh.run_transform(spark, raw, audit=audit)
    msgs = res.emit_audit(audit)
    assert "ISSUES | 1 rows with missing repo_id (FK Enforcement)." in msgs
    assert "ISSUES - Complete | 0 rows loaded." in msgs
