"""operators.linkage — blocked Fellegi–Sunter record linkage (the
oracle query q_linkage_blocked covers the bulk path)."""

from __future__ import annotations

import pytest

from incremental_github_data_pipeline_spark.operators.linkage import (
    FieldComparator,
    blocked_linkage,
    fs_weights,
)

LEFT = [
    # (left_id, blk, name, qty)
    (1, "a", "smith", 100),
    (2, "a", "smyth", 500),
    (3, "b", None, 100),
]
RIGHT = [
    (10, "a", "smith", 105),
    (11, "a", "jones", 100),
    (12, "b", None, 300),
    (13, "c", "smith", 100),  # block c: never a candidate
]
SCHEMA_L = "left_id long, blk string, name string, qty long"
SCHEMA_R = "right_id long, blk string, name string, qty long"
COMPS = [
    FieldComparator("name", "name", "name", agree=2000, disagree=-500,
                    mode="levenshtein:1"),
    FieldComparator("qty", "qty", "qty", agree=1000, disagree=-200,
                    mode="abs_diff:10"),
]


def _run(spark, comps=COMPS, upper=2500, lower=-600):
    return {
        (r["left_id"], r["right_id"]): r
        for r in blocked_linkage(
            spark.createDataFrame(LEFT, SCHEMA_L),
            spark.createDataFrame(RIGHT, SCHEMA_R),
            ["blk"],
            comps,
            upper=upper,
            lower=lower,
        ).collect()
    }


def test_blocking_bounds_candidates(spark):
    got = _run(spark)
    # only within-block pairs exist; block c contributes nothing
    assert set(got) == {(1, 10), (1, 11), (2, 10), (2, 11), (3, 12)}


def test_scores_verdicts_and_bands(spark):
    got = _run(spark)
    # (1,10): name lev("smith","smith")=0 agree, |100-105|<=10 agree
    assert got[(1, 10)]["score"] == 3000
    assert got[(1, 10)]["verdict"] == "match"
    # (1,11): name disagree, qty agree -> -500+1000 = 500 possible
    assert got[(1, 11)]["score"] == 500
    assert got[(1, 11)]["verdict"] == "possible"
    # (2,11): both disagree -> -700 non_match
    assert got[(2, 11)]["score"] == -700
    assert got[(2, 11)]["verdict"] == "non_match"
    # (2,10): lev("smyth","smith")=1 agree, qty disagree -> 1800
    assert got[(2, 10)]["score"] == 1800
    assert got[(2, 10)]["verdict"] == "possible"


def test_null_fields_with_levenshtein_disagree(spark):
    got = _run(spark)
    # (3,12): both names NULL -> levenshtein(NULL,NULL) is NULL ->
    # not <= k -> disagree; qty |100-300| disagree
    assert got[(3, 12)]["name_agree"] == 0
    assert got[(3, 12)]["score"] == -700


def test_exact_mode_is_null_safe(spark):
    comps = [
        FieldComparator("name", "name", "name", agree=100, disagree=-100)
    ]
    got = _run(spark, comps=comps, upper=100, lower=-100)
    assert got[(3, 12)]["name_agree"] == 1  # NULL <=> NULL agrees
    assert got[(1, 10)]["name_agree"] == 1
    assert got[(1, 11)]["name_agree"] == 0


def test_prefix_and_suffix_modes(spark):
    comps = [
        FieldComparator("p", "name", "name", agree=10, disagree=-10,
                        mode="prefix:2"),
        FieldComparator("s", "name", "name", agree=1, disagree=-1,
                        mode="suffix:2"),
    ]
    got = _run(spark, comps=comps, upper=11, lower=-11)
    # smith vs smyth: prefix "sm" agrees, suffix "th" agrees
    assert got[(2, 10)]["p_agree"] == 1 and got[(2, 10)]["s_agree"] == 1
    assert got[(2, 10)]["verdict"] == "match"
    # smith vs jones: neither
    assert got[(1, 11)]["verdict"] == "non_match"


def test_null_block_keys_are_dropped(spark):
    """r10 ADVICE: a NULL block key means 'no block' — such rows must
    pair with NOTHING, not pool into one giant all-NULL block (the
    null-safe-equality behavior this pins against: a hidden cross
    product and the worst skew key at scale)."""
    left = LEFT + [(4, None, "smith", 100)]
    right = RIGHT + [(14, None, "smith", 100)]
    got = {
        (r["left_id"], r["right_id"]): r
        for r in blocked_linkage(
            spark.createDataFrame(left, SCHEMA_L),
            spark.createDataFrame(right, SCHEMA_R),
            ["blk"],
            COMPS,
            upper=2500,
            lower=-600,
        ).collect()
    }
    # identical to the no-NULL-row universe: 4/14 appear in no pair
    assert set(got) == {(1, 10), (1, 11), (2, 10), (2, 11), (3, 12)}


def test_fs_weights_signs_and_guard():
    a, d = fs_weights(0.9, 0.1)
    assert a > 0 > d
    assert a == 3170 and d == -3170  # log2(9) scaled, symmetric case
    with pytest.raises(ValueError):
        fs_weights(0.1, 0.9)


def test_threshold_guard(spark):
    with pytest.raises(ValueError, match="upper"):
        _run(spark, upper=-10, lower=10)


def test_plan_is_plain_equi_join(spark):
    out = blocked_linkage(
        spark.createDataFrame(LEFT, SCHEMA_L),
        spark.createDataFrame(RIGHT, SCHEMA_R),
        ["blk"],
        COMPS,
        upper=1,
        lower=0,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
