"""operators.temporal — as-of and range join edge semantics on
constructed frames (the oracle queries cover the bulk path)."""

from __future__ import annotations

import datetime as dt

from incremental_github_data_pipeline_spark.operators.temporal import (
    as_of_join,
    range_join,
)


def ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 12, minute, 0)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, "u", ts(10)), (2, "u", ts(20)), (3, "v", ts(10)), (4, "w", ts(10))],
        "id long, k string, t timestamp",
    )
    right = spark.createDataFrame(
        [("u", ts(5), 100.0), ("u", ts(10), 200.0), ("u", ts(25), 300.0),
         ("v", ts(11), 400.0)],
        "k string, rt timestamp, price double",
    )
    return left, right


def test_asof_backward_inclusive(spark):
    left, right = _frames(spark)
    out = as_of_join(left, right, ["k"], "t", "rt", ["price"], direction="backward")
    got = {r["id"]: r["asof_price"] for r in out.collect()}
    assert got == {
        1: 200.0,  # equal timestamp matches (inclusive)
        2: 200.0,  # latest at-or-before 12:20 is 12:10
        3: None,   # v's only quote is later
        4: None,   # no right rows for w at all
    }


def test_asof_forward(spark):
    left, right = _frames(spark)
    out = as_of_join(left, right, ["k"], "t", "rt", ["price"], direction="forward")
    got = {r["id"]: r["asof_price"] for r in out.collect()}
    assert got == {1: 200.0, 2: 300.0, 3: 400.0, 4: None}


def test_asof_keeps_all_left_columns_and_rows(spark):
    left, right = _frames(spark)
    out = as_of_join(left, right, ["k"], "t", "rt", ["price", "rt"])
    assert out.count() == left.count()
    assert set(out.columns) == {"id", "k", "t", "asof_price", "asof_rt"}


def test_range_join_band_boundaries(spark):
    left, right = _frames(spark)
    # band [t, t+15min]: boundaries inclusive on both ends
    out = range_join(
        left, right, ["k"], "t", "rt", 0.0, 900.0, ["rt", "price"], prefix="m_"
    )
    got = sorted((r["id"], r["m_price"]) for r in out.collect())
    assert got == [
        (1, 200.0),  # rt == t (lower boundary inclusive)
        (1, 300.0),  # rt == t + 15min (upper boundary inclusive)
        (2, 300.0),  # rt == t + 5min
        (3, 400.0),  # rt == t + 1min
    ]


def test_range_join_negative_band(spark):
    left, right = _frames(spark)
    # band [t-6min, t-4min]: only u@12:10 sees the 12:05 quote
    out = range_join(
        left, right, ["k"], "t", "rt", -360.0, -240.0, ["price"], prefix="m_"
    )
    assert [(r["id"], r["m_price"]) for r in out.collect()] == [(1, 100.0)]


def test_interval_join_overlap_semantics(spark):
    from datetime import datetime

    from incremental_github_data_pipeline_spark.operators.temporal import interval_join

    def t(m):
        return datetime(2024, 1, 1, 0, 0) + __import__("datetime").timedelta(minutes=m)

    left = spark.createDataFrame(
        [(1, "k", t(0), t(10)), (2, "k", t(30), t(40))],
        "lid long, k string, s timestamp, e timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, "k", t(9), t(15)),    # overlaps lid=1 ([0,10) x [9,15))
            (11, "k", t(10), t(20)),   # touches lid=1 at 10 -> half-open: NO overlap
            (12, "k", t(35), t(36)),   # inside lid=2
            (13, "k", t(5), t(5)),     # empty interval -> matches nothing
            (14, "other", t(0), t(60)),  # key mismatch
        ],
        "rid long, k string, s timestamp, e timestamp",
    )
    got = sorted(
        (r["lid"], r["i_rid"])
        for r in interval_join(
            left, right, on=["k"], left_start="s", left_end="e",
            right_start="s", right_end="e", right_cols=["rid"], bucket_s=60.0,
        ).collect()
    )
    assert got == [(1, 10), (2, 12)]


def test_interval_join_multi_bucket_pair_emitted_once(spark):
    from datetime import datetime

    from incremental_github_data_pipeline_spark.operators.temporal import interval_join

    # both intervals span many 1-minute buckets; the pair must appear once
    left = spark.createDataFrame(
        [(1, "k", datetime(2024, 1, 1, 0, 0), datetime(2024, 1, 1, 1, 0))],
        "lid long, k string, s timestamp, e timestamp",
    )
    right = spark.createDataFrame(
        [(10, "k", datetime(2024, 1, 1, 0, 30), datetime(2024, 1, 1, 2, 0))],
        "rid long, k string, s timestamp, e timestamp",
    )
    rows = interval_join(
        left, right, on=["k"], left_start="s", left_end="e",
        right_start="s", right_end="e", right_cols=["rid"], bucket_s=60.0,
    ).collect()
    assert len(rows) == 1


def test_asof_forward_tolerance_bounds_match(spark):
    left, right = _frames(spark)
    out = as_of_join(
        left, right, ["k"], "t", "rt", ["price"],
        direction="forward", tolerance_s=120.0,
    )
    got = {r["id"]: r["asof_price"] for r in out.collect()}
    # id=1 (u @12:10): forward match at 12:10 within 0s -> kept
    # id=2 (u @12:20): next is 12:25 (300s away) -> nulled by 120s bound
    # id=3 (v @12:10): next v quote 12:11 (60s) -> kept
    assert got[1] == 200.0
    assert got[2] is None
    assert got[3] == 400.0
