"""operators.quality — schema-drift presence audit (the oracle query
q_schema_drift covers the bulk path)."""

from __future__ import annotations

from incremental_github_data_pipeline_spark.operators.quality import (
    schema_drift_report,
)

ROWS = [
    # window 1: keys a (2/2), b (1/2)
    (1, '{"a": 1, "b": 2}'),
    (1, '{"a": 3}'),
    # window 2: a drops to 1/2 (50pp shift), b vanishes, c is born
    (2, '{"a": 1, "c": 9}'),
    (2, '{"c": 5}'),
]


def _report(spark, shift_ppm=100_000):
    df = spark.createDataFrame(ROWS, "win long, payload string")
    return {
        (r["win"], r["key"]): r
        for r in schema_drift_report(
            df, "payload", "win", shift_ppm=shift_ppm
        ).collect()
    }


def test_statuses_new_dropped_shifted_baseline(spark):
    got = _report(spark)
    # first window is baseline for every key (incl. c at 0 presence)
    assert got[(1, "a")]["status"] == "baseline"
    assert got[(1, "c")]["status"] == "baseline"
    assert got[(1, "c")]["n_present"] == 0
    # a: 1000000 -> 500000 ppm = shifted at the 10pp threshold
    assert got[(2, "a")]["present_ppm"] == 500_000
    assert got[(2, "a")]["prev_ppm"] == 1_000_000
    assert got[(2, "a")]["status"] == "shifted"
    # b: present -> zero = dropped (the grid keeps the vanished key)
    assert got[(2, "b")]["n_present"] == 0
    assert got[(2, "b")]["status"] == "dropped"
    # c: zero -> present = new
    assert got[(2, "c")]["status"] == "new"


def test_shift_threshold_is_exclusive(spark):
    # with a huge threshold the 50pp move reads stable
    got = _report(spark, shift_ppm=600_000)
    assert got[(2, "a")]["status"] == "stable"


def test_grid_covers_every_window_key_pair(spark):
    got = _report(spark)
    assert set(got) == {(w, k) for w in (1, 2) for k in ("a", "b", "c")}
    # window volumes ride every row
    assert all(r["n_rows"] == 2 for r in got.values())


def test_explicit_key_universe_reports_never_seen_keys(spark):
    """r10 ADVICE: the observed-key default cannot audit a key absent
    from the whole frame; an explicit registry-driven universe must
    report it at 0 ppm in every window (and may prune keys outside
    the registry)."""
    df = spark.createDataFrame(ROWS, "win long, payload string")
    got = {
        (r["win"], r["key"]): r
        for r in schema_drift_report(
            df, "payload", "win", key_universe=["a", "legacy"]
        ).collect()
    }
    assert set(got) == {(w, k) for w in (1, 2) for k in ("a", "legacy")}
    assert got[(1, "legacy")]["status"] == "baseline"
    assert got[(1, "legacy")]["n_present"] == 0
    assert got[(2, "legacy")]["present_ppm"] == 0
    assert got[(2, "legacy")]["status"] == "stable"


class TestVolumeGate:
    def test_planted_drop_spike_and_warmup(self, spark):
        from incremental_github_data_pipeline_spark.operators.quality import (
            volume_gate,
        )

        # 7 baseline days of 10 rows, then a half day, then a triple day
        rows = []
        for d in range(1, 8):
            rows += [(d,)] * 10
        rows += [(8,)] * 4       # drop: -60% vs median 10
        rows += [(9,)] * 30      # spike: +200% vs median 10
        df = spark.createDataFrame(rows, "day long")
        got = {
            r["day"]: r
            for r in volume_gate(
                df, "day", trailing=7, drop_ppm=500_000,
                spike_ppm=1_000_000,
            ).collect()
        }
        for d in range(1, 8):
            assert got[d]["status"] == "warmup", d
        assert got[8]["status"] == "drop"
        assert got[8]["trailing_median"] == 10
        assert got[8]["dev_ppm"] == -600_000
        # day 9's trailing window now contains the bad day 8; lower
        # median of [10]*6 + [4] is still 10
        assert got[9]["status"] == "spike"
        assert got[9]["dev_ppm"] == 2_000_000

    def test_keys_are_isolated(self, spark):
        from incremental_github_data_pipeline_spark.operators.quality import (
            volume_gate,
        )

        rows = [("a", d) for d in range(1, 8) for _ in range(10)]
        rows += [("a", 8)] * 10
        rows += [("b", 8)] * 3  # b has no history: warmup, not drop
        df = spark.createDataFrame(rows, "k string, day long")
        got = {
            (r["k"], r["day"]): r["status"]
            for r in volume_gate(df, "day", key_cols="k").collect()
        }
        assert got[("a", 8)] == "ok"
        assert got[("b", 8)] == "warmup"


# ---------------------------------------------------------------------------
# column_profile
# ---------------------------------------------------------------------------


class TestColumnProfile:
    def test_hand_computed_lanes(self, spark):
        from incremental_github_data_pipeline_spark.operators.quality import (
            column_profile,
        )

        df = spark.createDataFrame(
            [("x", 1), ("x", 2), ("y", None), ("y", 2), (None, 2), ("x", 3)],
            "a string, b int",
        )
        got = {
            r["column"]: r for r in column_profile(df, ["a", "b"]).collect()
        }
        a = got["a"]
        assert (a["n_rows"], a["n_null"], a["null_ppm"]) == (6, 1, 166666)
        assert (a["n_distinct"], a["top_value"], a["top_count"]) == (2, "x", 3)
        assert a["top_share_ppm"] == 600000  # 3 of 5 non-null
        assert a["gini_ppm"] == 480000  # 1 - (9+4)/25
        b = got["b"]
        assert (b["n_distinct"], b["top_value"], b["gini_ppm"]) == (
            3, "2", 560000,  # 1 - (1+9+1)/25
        )

    def test_tie_break_picks_smallest_value(self, spark):
        from incremental_github_data_pipeline_spark.operators.quality import (
            column_profile,
        )

        df = spark.createDataFrame(
            [("b",), ("a",), ("a",), ("b",)], "v string"
        )
        row = column_profile(df, ["v"]).collect()[0]
        assert (row["top_value"], row["top_count"]) == ("a", 2)

    def test_all_null_column_keeps_row(self, spark):
        from incremental_github_data_pipeline_spark.operators.quality import (
            column_profile,
        )

        df = spark.createDataFrame([(None,), (None,)], "c string")
        row = column_profile(df, ["c"]).collect()[0]
        assert (row["n_rows"], row["n_null"], row["null_ppm"]) == (
            2, 2, 1000000,
        )
        assert row["n_distinct"] == 0
        assert row["top_value"] is None and row["gini_ppm"] is None

    def test_constant_column_zero_gini(self, spark):
        from incremental_github_data_pipeline_spark.operators.quality import (
            column_profile,
        )

        df = spark.createDataFrame([("k",)] * 5, "v string")
        row = column_profile(df, ["v"]).collect()[0]
        assert row["gini_ppm"] == 0 and row["top_share_ppm"] == 1000000


class TestParquetLayout:
    def test_multi_row_group_file(self, spark, tmp_path):
        from incremental_github_data_pipeline_spark.operators.quality import (
            parquet_layout,
        )

        import pyarrow as pa
        import pyarrow.parquet as pq

        path = str(tmp_path / "t.parquet")
        table = pa.table({"a": list(range(1000)), "b": ["x"] * 1000})
        pq.write_table(table, path, row_group_size=300)
        got = parquet_layout(spark, [path]).orderBy("row_group").collect()
        assert [r["n_rows"] for r in got] == [300, 300, 300, 100]
        assert all(r["n_columns"] == 2 for r in got)
        assert all(r["file_name"] == "t.parquet" for r in got)
        assert all(r["n_bytes_compressed"] > 0 for r in got)

    def test_matches_footer_ground_truth(self, spark, tmp_path):
        from incremental_github_data_pipeline_spark.operators.quality import (
            parquet_layout,
        )

        import pyarrow as pa
        import pyarrow.parquet as pq

        p1 = str(tmp_path / "a.parquet")
        p2 = str(tmp_path / "b.parquet")
        pq.write_table(pa.table({"x": [1, 2, 3]}), p1)
        pq.write_table(pa.table({"x": [4] * 50, "y": [5] * 50}), p2)
        got = {
            (r["file_name"], r["row_group"]): (r["n_rows"], r["n_columns"])
            for r in parquet_layout(spark, [p1, p2]).collect()
        }
        assert got == {("a.parquet", 0): (3, 1), ("b.parquet", 0): (50, 2)}
