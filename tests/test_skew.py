"""operators.skew — salted join/aggregate must be result-identical to
their unsalted twins, with the salt spreading hot keys across buckets."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from incremental_github_data_pipeline_spark.operators.skew import (
    apply_skew_mitigation,
    salted_aggregate,
    salted_join,
    suggest_skew_mitigation,
    with_salt,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # one monster key (90%), a tail of normal keys
    return spark.range(2000).select(
        F.when(F.col("id") < 1800, "HOT").otherwise(F.concat(F.lit("k"), F.col("id"))).alias("k"),
        (F.col("id") % 7).alias("v"),
    )


def _dim(spark):
    rows = [("HOT", "hot-dim")] + [(f"k{i}", f"d{i}") for i in range(1800, 2000)]
    return spark.createDataFrame(rows, "k string, label string")


def test_salted_join_equals_plain_join(spark, skewed):
    dim = _dim(spark)
    plain = skewed.join(dim, ["k"], "inner").groupBy("k", "label").count()
    salted = salted_join(skewed, dim, ["k"], buckets=8).groupBy("k", "label").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark, skewed):
    dim = _dim(spark).filter(F.col("k") != "HOT")  # HOT becomes unmatched
    plain = skewed.join(dim, ["k"], "left")
    salted = salted_join(skewed, dim, ["k"], buckets=8, how="left")
    assert plain.count() == salted.count() == 2000
    assert salted.filter(F.col("k") == "HOT").filter(F.col("label").isNull()).count() == 1800


def test_salted_join_rejects_right_joins(spark, skewed):
    with pytest.raises(ValueError, match="how"):
        salted_join(skewed, _dim(spark), ["k"], how="right")


def test_salted_aggregate_equals_plain(spark, skewed):
    plain = skewed.groupBy("k").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"),
        F.min("v").alias("lo"), F.max("v").alias("hi"),
    )
    salted = salted_aggregate(
        skewed, ["k"],
        {"s": ("sum", "v"), "n": ("count", "v"), "lo": ("min", "v"), "hi": ("max", "v")},
        buckets=16,
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_aggregate_rejects_non_algebraic(spark, skewed):
    with pytest.raises(ValueError, match="non-algebraic"):
        salted_aggregate(skewed, ["k"], {"a": ("avg", "v")})


def test_salt_spreads_hot_key(spark, skewed):
    salted = with_salt(skewed.filter(F.col("k") == "HOT"), buckets=8)
    n_buckets = salted.select("_salt").distinct().count()
    assert n_buckets == 8, "hot key must spread over all salt buckets"


class TestSkewAdvisory:
    """r11: suggest_skew_mitigation turns the skew_report measurement
    into a none/aqe/salt verdict (the decision used to be manual)."""

    def test_planted_8020_hot_key_recommends_salt(self, spark):
        # 80% of 5000 rows on one key, 1000 tail keys: the hot key is
        # ~800x a uniform key's share -> salt, buckets sized to pull
        # its per-task share back to ~10x uniform (ceil(800/10)=80 ->
        # clamped to the 64 max)
        df = spark.range(5000).select(
            F.when(F.col("id") < 4000, "HOT")
            .otherwise(F.concat(F.lit("k"), F.col("id") % 1000))
            .alias("k")
        )
        rec = suggest_skew_mitigation(df, ["k"])
        assert rec["verdict"] == "salt"
        assert rec["buckets"] == 64
        assert rec["hot_keys"][0]["k"] == "HOT"
        assert rec["max_share_ppm"] == 800_000
        assert rec["aqe_settings"] == {}

    def test_uniform_keys_recommend_nothing(self, spark):
        df = spark.range(4000).select((F.col("id") % 100).alias("k"))
        rec = suggest_skew_mitigation(df, ["k"])
        assert rec["verdict"] == "none"
        assert rec["buckets"] is None and rec["hot_keys"] == []

    def test_moderate_skew_recommends_aqe_for_joins_salt_for_aggs(
        self, spark
    ):
        # hot key ~25x uniform: AQE's skew-join split absorbs a join,
        # but aggregation shuffles have no AQE rewrite -> salt
        df = spark.range(4000).select(
            F.when(F.col("id") < 400, "HOT")
            .otherwise(F.concat(F.lit("k"), F.col("id") % 225))
            .alias("k")
        )
        rec = suggest_skew_mitigation(df, ["k"])
        assert rec["verdict"] == "aqe"
        assert "spark.sql.adaptive.skewJoin.enabled" in rec["aqe_settings"]
        agg = suggest_skew_mitigation(df, ["k"], for_aggregate=True)
        assert agg["verdict"] == "salt" and agg["buckets"] >= 2

    def test_apply_dispatch_is_result_identical(self, spark, skewed):
        dim = _dim(spark)
        for rec in (
            {"verdict": "salt", "buckets": 8},
            {"verdict": "aqe"},
            {"verdict": "none"},
        ):
            out = apply_skew_mitigation(skewed, dim, ["k"], rec)
            plain = skewed.join(dim, ["k"], "inner")
            assert sorted(map(tuple, out.select("k", "label").collect())) \
                == sorted(map(tuple, plain.select("k", "label").collect()))


def test_salted_keep_first_equals_window(spark):
    """r13: the two-phase salted keep-first is bit-identical to the
    row_number()==1 window whenever order_cols is a total order —
    including on a planted hot key — and returns the input column
    set."""
    from pyspark.sql import Window

    from incremental_github_data_pipeline_spark.operators.skew import (
        salted_keep_first,
    )

    df = spark.range(2000).select(
        # 1000 rows of one viral key, the rest unique-ish
        F.when(F.col("id") < 1000, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), F.col("id") % 377))
        .alias("k"),
        F.col("id").alias("seq"),
        (F.col("id") * 31 % 997).alias("payload"),
    )
    for buckets in (1, 4, 16):
        got = salted_keep_first(df, ["k"], ["seq"], buckets=buckets)
        assert got.columns == df.columns
        w = Window.partitionBy("k").orderBy("seq")
        want = (
            df.withColumn("rn", F.row_number().over(w))
            .filter("rn = 1")
            .drop("rn")
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )


def test_curation_funnel_salted_path_is_result_identical(spark):
    """r13: re-run the funnel's URL dedup both ways on the real
    fixture corpus and require identical surviving docs — the result
    identity the oracle's plain replay rests on."""
    from pyspark.sql import Window

    from incremental_github_data_pipeline_spark.operators import text as tx
    from incremental_github_data_pipeline_spark.operators.skew import (
        salted_keep_first,
    )
    from incremental_github_data_pipeline_spark.queries.ext_curation import (
        _curation_corpus,
    )

    recs = tx.warc_ingest(_curation_corpus(spark))
    ok = recs.filter(
        (F.col("warc_type") == "response") & (F.col("http_status") == 200)
    )
    ext = ok.select(
        "payload_id",
        "record_idx",
        tx.strip_tracking_params(
            tx.canonicalize_url(
                tx.normalize_percent_encoding(F.col("target_uri"))
            )
        ).alias("url"),
    )
    salted = salted_keep_first(
        ext, ["url"], ["payload_id", "record_idx"], buckets=16
    )
    w = Window.partitionBy("url").orderBy("payload_id", "record_idx")
    plain = (
        ext.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .drop("rn")
    )
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )
    # the viral page survives exactly once, under its canonical form
    viral = [
        t for t in salted.collect()
        if t["url"] == "https://viral.example.com/hot?x=1&y=2"
    ]
    assert len(viral) == 1
    assert (viral[0]["payload_id"], viral[0]["record_idx"]) == (0, 3)
