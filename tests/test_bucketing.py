"""write_bucketed — the co-located join contract: two tables bucketed
by the same key must join with NO exchange on either side."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from incremental_github_data_pipeline_spark.sources.readers import read_table
from incremental_github_data_pipeline_spark.sources.writers import write_bucketed

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark):
    write_bucketed(
        read_table(spark, SF, "lineitem"), "li_b", ["l_orderkey"], 8,
        sort_cols=["l_orderkey"],
    )
    write_bucketed(
        read_table(spark, SF, "orders"), "o_b", ["o_orderkey"], 8,
        sort_cols=["o_orderkey"],
    )
    yield spark.table("li_b"), spark.table("o_b")
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    li, o = bucketed
    # disable auto-broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(o, li["l_orderkey"] == o["o_orderkey"]).groupBy(
            "o_orderpriority"
        ).count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        pre_agg = plan.split("HashAggregate")[-1]  # below the aggregation
        assert "Exchange" not in pre_agg, "bucketed join must not shuffle"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))


def test_bucketed_join_matches_plain(spark, bucketed):
    li, o = bucketed
    plain = (
        read_table(spark, SF, "lineitem")
        .join(read_table(spark, SF, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    assert li.join(o, li["l_orderkey"] == o["o_orderkey"]).count() == plain


def test_write_partitioned_prunes_partitions_and_clusters(spark, tmp_path):
    from pyspark.sql import functions as F

    from incremental_github_data_pipeline_spark.sources.readers import read_table
    from incremental_github_data_pipeline_spark.sources.writers import write_partitioned

    events = read_table(spark, "/root/testdata/sf0.001", "events").withColumn(
        "day", F.to_date("ts")
    )
    out = tmp_path / "events_part"
    write_partitioned(events, out, partition_cols=["day"], sort_cols=["user_id"])

    back = spark.read.parquet(str(out))
    one_day = back.filter(F.col("day") == F.lit("2024-01-03").cast("date"))
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    # the day filter must be a partition filter (directory pruning), not
    # a row-level filter over the whole table
    assert "PartitionFilters" in plan and "day" in plan.split("PartitionFilters")[1][:200]
    assert one_day.count() == events.filter(
        F.to_date("ts") == F.lit("2024-01-03").cast("date")
    ).count()

    # range clustering: within one partition file set, user_id ranges of
    # distinct files must not interleave (sorted layout -> row-group skip)
    files = one_day.select(
        F.input_file_name().alias("f"), "user_id"
    ).groupBy("f").agg(F.min("user_id").alias("lo"), F.max("user_id").alias("hi"))
    rows = sorted(files.collect(), key=lambda r: r["lo"])
    for a, b in zip(rows, rows[1:]):
        assert a["hi"] <= b["lo"], "file user_id ranges interleave; not clustered"


def test_zorder_write_narrows_file_stats_on_both_dims(spark, tmp_path):
    """Grid data written z-ordered by (x, y): every parquet file's
    min/max span must be narrow on BOTH columns — the property that
    lets single-column predicates on either dimension skip files. A
    plain x-sorted layout makes y spans global; z-order must not."""
    import pyarrow.parquet as pq

    from incremental_github_data_pipeline_spark.sources.writers import (
        write_zordered,
    )

    n = 64
    df = (
        spark.range(n * n)
        .selectExpr("id % 64 AS x", "id DIV 64 AS y", "id AS payload")
        .repartition(8)  # scrambled input
    )
    path = tmp_path / "z"
    write_zordered(df, path, ["x", "y"], bits=6, n_files=8)

    files = sorted(p for p in path.glob("*.parquet"))
    assert len(files) > 1
    global_span = n - 1
    spans = {"x": [], "y": []}
    for f in files:
        md = pq.read_metadata(f)
        for col_idx, col_name in enumerate(md.schema.names):
            if col_name not in spans:
                continue
            lo = min(
                md.row_group(g).column(col_idx).statistics.min
                for g in range(md.num_row_groups)
            )
            hi = max(
                md.row_group(g).column(col_idx).statistics.max
                for g in range(md.num_row_groups)
            )
            spans[col_name].append(hi - lo)
    for col_name, s in spans.items():
        # z-order's skipping guarantee is STATISTICAL: a segment that
        # crosses a high-order bit flip spans the full domain in one
        # dim (true of Delta/Iceberg Z-ordering too), so assert the
        # aggregate shape — narrow on average and narrow for most
        # files, on BOTH dims. An x-only sort fails this for y: every
        # file would span the full y domain.
        assert sum(s) / len(s) <= global_span * 0.62, (col_name, s)
        narrow = sum(1 for v in s if v <= global_span * 0.6)
        assert narrow >= len(s) * 0.6, (col_name, s)
    # round trip: clustering must not lose or duplicate rows
    assert spark.read.parquet(str(path)).count() == n * n


def test_zorder_key_rejects_sign_bit_overflow():
    """4 cols x 16 bits = 64 bits would write the long's sign bit and
    sort keyed rows negative-first (round-3 ADVICE)."""
    from incremental_github_data_pipeline_spark.sources.writers import (
        zorder_key,
    )

    with pytest.raises(ValueError, match="63-bit"):
        zorder_key(["a", "b", "c", "d"], bits=16)
    zorder_key(["a", "b", "c"], bits=16)  # 48 bits: fine


def test_zorder_wide_domain_range_compressed(spark, tmp_path):
    """Values wider than the bits budget must be coarsened (order-
    preserving right shift), not silently bit-wrapped: with 4-bit keys
    over a 0..4095 domain, far-apart values previously collided and
    file stats degraded to noise; compressed, per-file x-spans must
    stay well under the global span."""
    import pyarrow.parquet as pq

    from incremental_github_data_pipeline_spark.sources.writers import (
        write_zordered,
    )

    n = 4096
    df = (
        spark.range(n)
        .selectExpr("id AS x", "id % 16 AS y", "id AS payload")
        .repartition(8)
    )
    path = tmp_path / "zwide"
    write_zordered(df, path, ["x", "y"], bits=4, n_files=16)
    files = sorted(p for p in path.glob("*.parquet"))
    assert len(files) > 1
    max_span = 0
    for f in files:
        md = pq.read_metadata(f)
        idx = md.schema.names.index("x")
        lo = min(
            md.row_group(g).column(idx).statistics.min
            for g in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(g).column(idx).statistics.max
            for g in range(md.num_row_groups)
        )
        max_span = max(max_span, hi - lo)
    # Bit-wrapped keys (the pre-fix failure) put every x magnitude in
    # every file: spans ~ the full 4095 domain. Compressed Morton with
    # 16 files pins the top two x cell bits per file, so spans stay
    # around a quarter of the domain (+ cell width + sampled range
    # boundary slack) — assert comfortably below the wrapped regime.
    assert max_span <= n // 2, max_span
