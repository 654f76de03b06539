"""Unit tests for the core operator library (SURVEY.md §5.2 item 3):
constructed edge cases — empty arrays, non-list labels, orphan FK rows,
duplicate keys with differing payloads."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from incremental_github_data_pipeline_spark.operators import core as ops


def test_dedupe_keep_last_takes_latest_arrival(spark):
    df = spark.createDataFrame(
        [(1, "first"), (2, "only"), (1, "last")], "k int, payload string"
    )
    out = ops.dedupe_keep_last(ops.with_input_seq(df), ["k"])
    got = {r["k"]: r["payload"] for r in out.collect()}
    assert got == {1: "last", 2: "only"}


def test_dedupe_keep_last_explicit_order_column(spark):
    df = spark.createDataFrame(
        [(1, 10, "old"), (1, 20, "new")], "k int, ts int, payload string"
    )
    out = ops.dedupe_keep_last(df, ["k"], order_by="ts")
    assert out.first()["payload"] == "new"


def test_dedupe_idempotent(spark):
    df = ops.with_input_seq(
        spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], "k int, v string")
    )
    once = ops.dedupe_keep_last(df, ["k"])
    twice = ops.dedupe_keep_last(ops.with_input_seq(once), ["k"])
    assert sorted(once.collect()) == sorted(twice.collect())


def test_drop_null_keys(spark):
    df = spark.createDataFrame(
        [(1, "a"), (None, "b"), (3, None)], "k int, v string"
    )
    out = ops.drop_null_keys(df, ["k", "v"])
    assert out.count() == 1


def test_collapse_array_empty_vs_null(spark):
    df = spark.createDataFrame(
        [Row(t=["a", "b"]), Row(t=[]), Row(t=None)],
        "t array<string>",
    )
    vals = [r["c"] for r in df.select(ops.collapse_array("t").alias("c")).collect()]
    # pandas ','.join parity: empty list → '' ; null → NULL (transform.py:182-184)
    assert vals == ["a,b", "", None]


def test_collapse_struct_array_empty_is_null(spark):
    df = spark.createDataFrame(
        [
            Row(labels=[Row(name="bug"), Row(name="p1")]),
            Row(labels=[]),
            Row(labels=None),
        ],
        "labels array<struct<name:string>>",
    )
    vals = [
        r["c"]
        for r in df.select(
            ops.collapse_struct_array("labels", "name").alias("c")
        ).collect()
    ]
    # reference's `and labels` → empty list is NULL here (transform.py:335-339)
    assert vals == ["bug,p1", None, None]


def test_resolve_fk_drops_orphans_and_broadcasts(spark):
    fact = spark.createDataFrame(
        [("r1", 10), ("r2", 20), ("ghost", 30)], "repo_name string, x int"
    )
    dim = spark.createDataFrame(
        [("id1", "r1"), ("id2", "r2")], "repo_id string, repo_name string"
    )
    out = ops.resolve_fk(fact, dim, on="repo_name", key="repo_id")
    rows = out.collect()
    assert {r["repo_id"] for r in rows} == {"id1", "id2"}
    assert "repo_name" not in out.columns
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_resolve_fk_keep_orphans(spark):
    fact = spark.createDataFrame([("ghost", 1)], "repo_name string, x int")
    dim = spark.createDataFrame([("id1", "r1")], "repo_id string, repo_name string")
    out = ops.resolve_fk(fact, dim, on="repo_name", key="repo_id", drop_orphans=False)
    assert out.count() == 1 and out.first()["repo_id"] is None


def test_union_conform_then_dedup(spark):
    a = spark.createDataFrame([("u1", "alice")], "author_id string, author_login string")
    b = spark.createDataFrame([("u1", "alice"), ("u2", "bob")],
                              "assignee_id string, assignee_login string")
    out = ops.union_conform(
        [a, b],
        [
            {"author_id": "user_id", "author_login": "user_login"},
            {"assignee_id": "user_id", "assignee_login": "user_login"},
        ],
    )
    assert out.count() == 3
    assert ops.dedupe_keep_first(out, ["user_id"]).count() == 2


def test_parse_timestamps_coerce(spark):
    df = spark.createDataFrame(
        [("2024-01-02T03:04:05Z",), ("not-a-date",), (None,)], "t string"
    )
    out = ops.parse_timestamps_utc(df, ["t"])
    vals = [r["t"] for r in out.collect()]
    assert vals[0] is not None and vals[1] is None and vals[2] is None


def test_cast_schema_bool_to_long(spark):
    df = spark.createDataFrame([(True,), (False,), (None,)], "b boolean")
    vals = [r["b"] for r in ops.cast_schema(df, {"b": "long"}).collect()]
    assert vals == [1, 0, None]


def test_let_binding_preserves_value(spark):
    """functions.scalar.let_ is the perf-critical combinator behind the
    signature operators — its rewrite must be value-transparent."""
    from pyspark.sql import functions as F

    from incremental_github_data_pipeline_spark.functions.scalar import let_

    df = spark.createDataFrame(
        [("a b c d",), ("",), (None,)], "s string"
    )
    plain = F.size(F.split(F.col("s"), " ")) * 2
    bound = let_(F.split(F.col("s"), " "), lambda t: F.size(t) * 2)
    rows = df.select(plain.alias("p"), bound.alias("b")).collect()
    assert all(r["p"] == r["b"] for r in rows)
