"""Relational operator surface (SURVEY.md §2.2-2.7) as oracle-checked
queries over the driver test tables (TESTDATA.md).

Each query demonstrates one operator class with the physical plan we
want at 100 TB: filters that push to the parquet scan, dims broadcast,
aggregations with map-side partial combine, windows with a single
exchange on the partition keys. Floating-point aggregates go through
exact DECIMAL sums (see queries/__init__).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from incremental_github_data_pipeline_spark.queries import register
from incremental_github_data_pipeline_spark.sources.readers import read_table as T


def dsum(col: Column | str, scale: str = "decimal(25,8)") -> Column:
    """Order-independent exact sum of a double column: sum in DECIMAL,
    emit DOUBLE. Matches ``CAST(SUM(CAST(x AS DECIMAL(25,8))) AS DOUBLE)``
    in any ANSI engine — the pattern that makes double aggregates
    hash-comparable across Spark and DuckDB.

    Only safe on *stored* columns whose values are exact at the target
    scale (TPC-H money/quantity columns are 2-dec). Casting a *computed*
    double to decimal is NOT portable: JVM engines convert via the
    shortest decimal repr, C++ engines via the full binary expansion,
    and the 8th-decimal rounding can differ. For products, cast the
    inputs first — see :func:`revenue`."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(scale)).cast("double")


def revenue(price_col: str, *factors: tuple[str, int]) -> Column:
    """Exact Σ price·(1±x)·… : every input is cast to a narrow decimal
    BEFORE multiplying (price → DECIMAL(12,2), each 1±x factor →
    DECIMAL(4,2)), so the whole product stays in exact decimal
    arithmetic and sums identically in any engine. ``factors`` are
    (column, sign) pairs meaning (1 + sign·column)."""
    acc = F.col(price_col).cast("decimal(12,2)")
    for col, sign in factors:
        acc = acc * (F.lit(1.0) + F.lit(float(sign)) * F.col(col)).cast("decimal(4,2)")
    return F.sum(acc).cast("double")


# ---------------------------------------------------------------------------
# Headline multi-operator queries (scan→filter→join→agg→sort)
# ---------------------------------------------------------------------------


@register(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(25,8))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,8))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1-l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1-l_discount AS DECIMAL(4,2)) * CAST(1+l_tax AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(25,8))) AS DOUBLE)/COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_discount AS DECIMAL(25,8))) AS DOUBLE)/COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 pricing summary: full-scan hash aggregation. Filter and "
    "the 7-column projection push into the parquet scan; partial agg "
    "map-side, 6 groups out.",
)
def q01_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            revenue("l_extendedprice", ("l_discount", -1)).alias("sum_disc_price"),
            revenue("l_extendedprice", ("l_discount", -1), ("l_tax", +1)).alias(
                "sum_charge"
            ),
            (dsum("l_quantity") / F.count(F.lit(1))).alias("avg_qty"),
            (dsum("l_discount") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q03_shipping_priority",
    oracle="""
    SELECT l.l_orderkey AS orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * CAST(1-l.l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
           o.o_orderdate AS orderdate
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3: selective dim filter → join → agg → top-k. customer "
    "and orders grow with SF, so join strategy is left to AQE (broadcast "
    "at small SF, shuffle-hash beyond the threshold) — no forced hints "
    "on fact-scale inputs.",
)
def q03_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = T(spark, sf, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    l = T(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        l.join(o.join(c, o.o_custkey == c.c_custkey),
               l.l_orderkey == o.o_orderkey)
        .groupBy(l.l_orderkey.alias("orderkey"), o.o_orderdate.alias("orderdate"))
        .agg(revenue("l_extendedprice", ("l_discount", -1)).alias("revenue"))
        .select("orderkey", "revenue", "orderdate")
        .orderBy(F.col("revenue").desc(), F.col("orderkey"))
        .limit(10)
    )


@register(
    "q05_region_volume",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * CAST(1-l.l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
                  JOIN customer c ON c.c_nationkey = n.n_nationkey
                  JOIN orders o ON o.o_custkey = c.c_custkey
                  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                  JOIN supplier s ON s.s_suppkey = l.l_suppkey
                                 AND s.s_nationkey = n.n_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation
    """,
    doc="TPC-H Q5: six-table star join. Bounded dims (region/nation) "
    "broadcast; supplier, orders and customer all grow with SF (10k/"
    "1.5M/150k rows x SF) so their joins are left to AQE rather than "
    "forced broadcasts — a hint that is right at sf0.1 is an OOM at "
    "sf100k.",
)
def q05_region_volume(spark: SparkSession, sf: str) -> DataFrame:
    r = T(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    n = T(spark, sf, "nation")
    c = T(spark, sf, "customer")
    s = T(spark, sf, "supplier")
    o = T(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = T(spark, sf, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
            c.c_nationkey == n.n_nationkey,
        )
        .join(
            s,
            (l.l_suppkey == s.s_suppkey) & (s.s_nationkey == n.n_nationkey),
        )
        .groupBy(n.n_name.alias("nation"))
        .agg(revenue("l_extendedprice", ("l_discount", -1)).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("nation"))
    )


# ---------------------------------------------------------------------------
# Aggregation / grouping-set operators
# ---------------------------------------------------------------------------


@register(
    "q_group_agg",
    oracle="""
    SELECT o_orderpriority AS priority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,8))) AS DOUBLE) AS total,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
    FROM orders GROUP BY o_orderpriority ORDER BY priority
    """,
    doc="Hash aggregation with partial combine: count/sum/min/max per group.",
)
def q_group_agg(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "orders")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total"),
            F.min("o_totalprice").cast("double").alias("min_price"),
            F.max("o_totalprice").cast("double").alias("max_price"),
        )
        .orderBy("priority")
    )


@register(
    "q_rollup",
    oracle="""
    SELECT r.r_name AS region, n.n_name AS nation,
           COUNT(c.c_custkey) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(25,8))) AS DOUBLE) AS balance
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
                    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP(r.r_name, n.n_name)
    ORDER BY region NULLS FIRST, nation NULLS FIRST
    """,
    doc="ROLLUP grouping sets (region→nation→grand total) over a "
    "broadcast-joined dim snowflake.",
)
def q_rollup(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer")
    n = T(spark, sf, "nation")
    r = T(spark, sf, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        joined.rollup(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count("c_custkey").alias("n_customers"),
            dsum("c_acctbal").alias("balance"),
        )
        .orderBy(F.col("region").asc_nulls_first(), F.col("nation").asc_nulls_first())
    )


@register(
    "q_cube",
    oracle="""
    SELECT o_orderstatus AS status, o_orderpriority AS priority,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,8))) AS DOUBLE) AS total
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    ORDER BY status NULLS FIRST, priority NULLS FIRST
    """,
    doc="CUBE grouping sets: all 2^2 aggregation lattices in one pass.",
)
def q_cube(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "orders")
        .cube(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("total"))
        .orderBy(F.col("status").asc_nulls_first(), F.col("priority").asc_nulls_first())
    )


@register(
    "q_distinct_agg",
    oracle="""
    SELECT l_returnflag AS flag,
           COUNT(DISTINCT l_partkey) AS distinct_parts,
           COUNT(DISTINCT l_suppkey) AS distinct_supps,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY flag
    """,
    doc="Distinct aggregation (expand + two-phase agg in Spark).",
)
def q_distinct_agg(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "lineitem")
        .groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.count_distinct(F.col("l_partkey")).alias("distinct_parts"),
            F.count_distinct(F.col("l_suppkey")).alias("distinct_supps"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("flag")
    )


# ---------------------------------------------------------------------------
# Windows / sorts / dedup
# ---------------------------------------------------------------------------


@register(
    "q_window_topk_per_group",
    oracle="""
    SELECT nation, custkey, acctbal, rnk FROM (
      SELECT n.n_name AS nation, c.c_custkey AS custkey,
             CAST(c.c_acctbal AS DOUBLE) AS acctbal,
             ROW_NUMBER() OVER (PARTITION BY n.n_name
                                ORDER BY c.c_acctbal DESC, c.c_custkey) AS rnk
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    ) WHERE rnk <= 3
    ORDER BY nation, rnk
    """,
    doc="Top-k per group: single exchange on the partition key, "
    "rank-filter before any downstream work (W1 generalized).",
)
def q_window_topk_per_group(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer")
    n = T(spark, sf, "nation")
    w = Window.partitionBy("nation").orderBy(
        F.col("acctbal").desc(), F.col("custkey")
    )
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.col("c_custkey").alias("custkey"),
            F.col("c_acctbal").cast("double").alias("acctbal"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .orderBy("nation", "rnk")
    )


@register(
    "q_window_running_total",
    oracle="""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,8)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_total
    FROM orders
    ORDER BY custkey, orderkey
    """,
    doc="Running total per customer — analytic window with frame; exact "
    "DECIMAL accumulation keeps prefix sums engine-independent.",
)
def q_window_running_total(spark: SparkSession, sf: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        T(spark, sf, "orders")
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.sum(F.col("o_totalprice").cast("decimal(25,8)"))
            .over(w)
            .cast("double")
            .alias("running_total"),
        )
        .orderBy("custkey", "orderkey")
    )


@register(
    "q_dedup_keep_last",
    oracle="""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           o_orderdate AS orderdate, CAST(o_totalprice AS DOUBLE) AS totalprice
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ) WHERE rn = 1
    ORDER BY custkey
    """,
    doc="A1 keep-last dedup at scale: latest order per customer via "
    "recency window with an explicit, total ordering (SURVEY.md §2.4).",
)
def q_dedup_keep_last(spark: SparkSession, sf: str) -> DataFrame:
    from incremental_github_data_pipeline_spark.operators import dedupe_keep_last

    o = T(spark, sf, "orders")
    latest = dedupe_keep_last(
        o,
        ["o_custkey"],
        order_by=F.struct(F.col("o_orderdate"), F.col("o_orderkey")),
    )
    return latest.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_orderdate").alias("orderdate"),
        F.col("o_totalprice").cast("double").alias("totalprice"),
    ).orderBy("custkey")


@register(
    "q_top20_scan",
    oracle="""
    SELECT l_orderkey AS orderkey, l_linenumber AS line,
           CAST(l_extendedprice AS DOUBLE) AS price
    FROM lineitem
    WHERE l_returnflag = 'R'
    ORDER BY price DESC, orderkey, line
    LIMIT 20
    """,
    doc="P1/P2/P4 + global top-k: Spark plans TakeOrderedAndProject — "
    "no full sort, per-partition heaps only.",
)
def q_top20_scan(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select(
            F.col("l_orderkey").alias("orderkey"),
            F.col("l_linenumber").alias("line"),
            F.col("l_extendedprice").cast("double").alias("price"),
        )
        .orderBy(F.col("price").desc(), "orderkey", "line")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Joins beyond the FK patterns
# ---------------------------------------------------------------------------


@register(
    "q_semi_join",
    oracle="""
    SELECT c_custkey AS custkey, c_name AS name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    ORDER BY custkey
    """,
    doc="Left-semi join (J3's semantic core as a first-class operator).",
)
def q_semi_join(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer")
    o = T(spark, sf, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select(F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name"))
        .orderBy("custkey")
    )


@register(
    "q_anti_join",
    oracle="""
    SELECT c_custkey AS custkey, c_name AS name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    ORDER BY custkey
    """,
    doc="Left-anti join: customers with no urgent orders (orphan "
    "detection inverted — the FK-expectations building block).",
)
def q_anti_join(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer")
    o = T(spark, sf, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select(F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name"))
        .orderBy("custkey")
    )


@register(
    "q_fk_resolve_orphans",
    oracle="""
    WITH big_orders AS (SELECT o_orderkey, o_orderpriority FROM orders
                        WHERE o_totalprice > 50000)
    SELECT o_orderpriority AS priority, COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(25,8))) AS DOUBLE) AS qty
    FROM lineitem l JOIN big_orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o_orderpriority ORDER BY priority
    """,
    doc="J1+J3 at fact scale: resolve lineitem→orders against a filtered "
    "dim, orphans dropped (left join + null-filter ≡ inner), broadcast "
    "dim — the GitHub FK-enforcement pattern on TPC-H shapes.",
)
def q_fk_resolve_orphans(spark: SparkSession, sf: str) -> DataFrame:
    from incremental_github_data_pipeline_spark.operators import resolve_fk

    li = T(spark, sf, "lineitem")
    big = (
        T(spark, sf, "orders")
        .filter(F.col("o_totalprice") > 50000)
        .select("o_orderkey", "o_orderpriority")
        .withColumnRenamed("o_orderkey", "l_orderkey")
    )
    resolved = resolve_fk(li, big, on="l_orderkey", key="o_orderpriority")
    return (
        resolved.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).alias("n_lines"), dsum("l_quantity").alias("qty"))
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@register(
    "q_union_conform",
    oracle="""
    SELECT entity_key, entity_name, kind FROM (
      SELECT c_custkey AS entity_key, c_name AS entity_name, 'customer' AS kind
      FROM customer
      UNION ALL
      SELECT s_suppkey, s_name, 'supplier' FROM supplier
    ) ORDER BY kind, entity_key
    """,
    doc="U1 union-conform: two differently-named projections renamed to a "
    "shared schema and unioned by name.",
)
def q_union_conform(spark: SparkSession, sf: str) -> DataFrame:
    from incremental_github_data_pipeline_spark.operators import union_conform

    c = T(spark, sf, "customer").withColumn("kind", F.lit("customer"))
    s = T(spark, sf, "supplier").withColumn("kind", F.lit("supplier"))
    return union_conform(
        [c, s],
        [
            {"c_custkey": "entity_key", "c_name": "entity_name", "kind": "kind"},
            {"s_suppkey": "entity_key", "s_name": "entity_name", "kind": "kind"},
        ],
    ).orderBy("kind", "entity_key")


@register(
    "q_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
    doc="INTERSECT (distinct) of customer vs supplier nations.",
)
def q_intersect(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = T(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s).orderBy("nationkey")


@register(
    "q_except",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    ORDER BY custkey
    """,
    doc="EXCEPT (distinct): customers who ordered, minus those who ever "
    "ordered urgent.",
)
def q_except(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    c = o.select(F.col("o_custkey").alias("custkey"))
    s = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    # subtract == SQL EXCEPT (distinct); exceptAll would keep surplus
    # duplicate occurrences, which is a different operator.
    return c.subtract(s).orderBy("custkey")


# ---------------------------------------------------------------------------
# Scalar functions / casts / conditionals (P6-P8, F1-F10)
# ---------------------------------------------------------------------------


@register(
    "q_scalar_string",
    oracle="""
    SELECT c_custkey AS custkey,
           c_name || '|' || c_mktsegment AS biz_key,
           UPPER(c_mktsegment) AS seg_upper,
           SUBSTR(c_name, 1, 8) AS name_prefix,
           LENGTH(c_name) AS name_len
    FROM customer ORDER BY custkey LIMIT 100
    """,
    doc="F1 business-key concat + string scalar functions, all "
    "codegen-side (no UDFs).",
)
def q_scalar_string(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "customer")
        .select(
            F.col("c_custkey").alias("custkey"),
            F.concat_ws("|", F.col("c_name"), F.col("c_mktsegment")).alias("biz_key"),
            F.upper(F.col("c_mktsegment")).alias("seg_upper"),
            F.substring(F.col("c_name"), 1, 8).alias("name_prefix"),
            F.length(F.col("c_name")).alias("name_len"),
        )
        .orderBy("custkey")
        .limit(100)
    )


@register(
    "q_date_parts",
    oracle="""
    SELECT EXTRACT(year FROM o_orderdate) AS yr,
           EXTRACT(month FROM o_orderdate) AS mo,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,8))) AS DOUBLE) AS total
    FROM orders GROUP BY 1, 2 ORDER BY yr, mo
    """,
    doc="P7/F4 temporal functions: year/month extraction + agg.",
)
def q_date_parts(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "orders")
        .groupBy(
            F.year("o_orderdate").cast("long").alias("yr"),
            F.month("o_orderdate").cast("long").alias("mo"),
        )
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("total"))
        .orderBy("yr", "mo")
    )


@register(
    "q_case_when",
    oracle="""
    SELECT l_returnflag AS flag,
           CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_discounted,
           CAST(SUM(CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_bulk,
           COUNT(CASE WHEN l_tax = 0 THEN 1 END) AS n_taxfree
    FROM lineitem GROUP BY l_returnflag ORDER BY flag
    """,
    doc="Conditional aggregation (A4's null-count pattern generalized).",
)
def q_case_when(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem")
    return (
        li.groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0)).alias(
                "n_discounted"
            ),
            F.sum(F.when(F.col("l_quantity") >= 25, 1).otherwise(0)).alias("n_bulk"),
            F.count(F.when(F.col("l_tax") == 0, 1)).alias("n_taxfree"),
        )
        .orderBy("flag")
    )


@register(
    "q_validation_checks",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) AS n_status_ok,
           CAST(SUM(CASE WHEN o_totalprice >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_price_ok,
           CAST(SUM(CASE WHEN o_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_key_ok
    FROM orders
    """,
    doc="F8/F9 DDL-CHECK expressions as data-quality counters "
    "(plans.expectations building block).",
)
def q_validation_checks(spark: SparkSession, sf: str) -> DataFrame:
    from incremental_github_data_pipeline_spark.functions import in_set, non_negative

    o = T(spark, sf, "orders")
    as_int = lambda c: F.when(c, 1).otherwise(0)  # noqa: E731
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(as_int(in_set("o_orderstatus", ["O", "F", "P"]))).alias("n_status_ok"),
        F.sum(as_int(non_negative("o_totalprice"))).alias("n_price_ok"),
        F.sum(as_int(F.col("o_orderkey").isNotNull())).alias("n_key_ok"),
    )


@register(
    "q_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(CAST(json_extract_string(props, '$.k') AS BIGINT)
                    AS DECIMAL(25,8))) AS DOUBLE) AS k_sum
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="JSON scalar extraction from a string payload column "
    "(get_json_object, JVM-side).",
)
def q_json_extract(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(k.cast("decimal(25,8)")).cast("double").alias("k_sum"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Event-stream shapes (batch twins of the streaming operators)
# ---------------------------------------------------------------------------


@register(
    "q_events_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(25,8))) AS DOUBLE) AS value_sum
    FROM events
    GROUP BY 1, 2 ORDER BY window_start, event_type
    """,
    doc="Tumbling-window aggregation (batch twin of the streaming "
    "window() op; same plan modulo watermarking).",
)
def q_events_hourly(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            F.col("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("value_sum"))
        .orderBy("window_start", "event_type")
    )


@register(
    "q_sessionize",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new,
             event_id
      FROM events
    ), sessions AS (
      SELECT user_id, ts,
             -- CAST: DuckDB window SUM yields HUGEINT, which lands in
             -- pandas as float64 and breaks the driver's dtype-sensitive
             -- value hash against Spark's int64 (r3 FAIL signature:
             -- rows_match, hash mismatch)
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
      FROM marked
    )
    SELECT user_id, session_id, CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM sessions GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
    doc="Gap-based sessionization (30-min inactivity) — batch twin of "
    "session_window(); lag + running-sum windows, one exchange on user_id.",
)
def q_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_ts = F.lag("ts").over(w)
    is_new = F.when(
        lag_ts.isNull()
        | (F.col("ts") > lag_ts + F.expr("INTERVAL 30 MINUTES")),
        1,
    ).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        e.withColumn("is_new", is_new)
        .withColumn("session_id", F.sum("is_new").over(wsum).cast("long"))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .orderBy("user_id", "session_id")
    )


@register(
    "q_expectations_audit",
    oracle="""
    SELECT * FROM (
      SELECT 'li_orderkey_fk' AS expectation, CAST(COUNT(*) AS BIGINT) AS violations
      FROM (SELECT l_orderkey FROM lineitem WHERE l_orderkey IS NOT NULL) l
      LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderkey IS NULL
      UNION ALL
      SELECT 'li_pk_unique',
             CAST(COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT)
      FROM lineitem WHERE l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL
      UNION ALL
      SELECT 'li_quantity_non_negative',
             CAST(COALESCE(SUM(CASE WHEN l_quantity >= 0 THEN 0 ELSE 1 END), 0) AS BIGINT)
      FROM lineitem
      UNION ALL
      SELECT 'li_shipdate_not_null',
             CAST(COALESCE(SUM(CASE WHEN l_shipdate IS NOT NULL THEN 0 ELSE 1 END), 0) AS BIGINT)
      FROM lineitem
    ) ORDER BY expectation
    """,
    doc="plans.expectations end-to-end: the DDL-contract engine "
    "(SURVEY.md §4.3) evaluating CHECK/NOT NULL/UNIQUE in one aggregate "
    "pass plus a broadcast anti-join FK probe, emitting the audit frame.",
)
def q_expectations_audit(spark: SparkSession, sf: str) -> DataFrame:
    from incremental_github_data_pipeline_spark.plans.expectations import (
        Check,
        ForeignKey,
        Unique,
        evaluate,
        not_null,
    )

    li = T(spark, sf, "lineitem")
    orders = T(spark, sf, "orders")
    return evaluate(
        li,
        [
            Check("li_quantity_non_negative", F.col("l_quantity") >= 0),
            not_null("li_shipdate_not_null", "l_shipdate"),
            Unique("li_pk_unique", ("l_orderkey", "l_linenumber")),
            ForeignKey("li_orderkey_fk", ("l_orderkey",), orders, ("o_orderkey",)),
        ],
    )


@register(
    "q_salted_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(25,8))) AS DOUBLE) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="Skew-safe two-phase aggregation (operators.skew."
    "salted_aggregate): partial agg on (key, salt), final combine on "
    "key — hash-identical to the plain GROUP BY oracle, proving the "
    "rewrite is semantics-preserving.",
)
def q_salted_agg(spark: SparkSession, sf: str) -> DataFrame:
    from incremental_github_data_pipeline_spark.operators.skew import (
        salted_aggregate,
    )

    li = T(spark, sf, "lineitem").withColumn(
        "_qty_dec", F.col("l_quantity").cast("decimal(25,8)")
    )
    out = salted_aggregate(
        li,
        ["l_returnflag"],
        {"sum_qty": ("sum", "_qty_dec"), "n": ("count", "_qty_dec")},
        buckets=16,
    )
    return out.select(
        "l_returnflag",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        F.col("n").cast("long").alias("n"),
    ).orderBy("l_returnflag")


@register(
    "q_pivot_event_types",
    oracle="""
    SELECT user_id,
           CAST(COALESCE(SUM(CASE WHEN event_type='click' THEN 1 END), 0) AS BIGINT) AS click,
           CAST(COALESCE(SUM(CASE WHEN event_type='error' THEN 1 END), 0) AS BIGINT) AS error,
           CAST(COALESCE(SUM(CASE WHEN event_type='purchase' THEN 1 END), 0) AS BIGINT) AS purchase,
           CAST(COALESCE(SUM(CASE WHEN event_type='signup' THEN 1 END), 0) AS BIGINT) AS signup,
           CAST(COALESCE(SUM(CASE WHEN event_type='view' THEN 1 END), 0) AS BIGINT) AS view
    FROM events GROUP BY user_id ORDER BY user_id
    """,
    doc="Pivot (wide counts per event type): explicit value list so the "
    "plan is a single hash aggregation — an unpinned pivot would need "
    "an extra distinct-values job first.",
)
def q_pivot_event_types(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "events")
    kinds = ["click", "error", "purchase", "signup", "view"]
    out = (
        e.groupBy("user_id")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "user_id",
        *[F.coalesce(F.col(k), F.lit(0)).cast("long").alias(k) for k in kinds],
    ).orderBy("user_id")


@register(
    "q_quantiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS q25,
           quantile_cont(l_quantity, 0.5)  AS q50,
           quantile_cont(l_quantity, 0.75) AS q75
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="Exact percentiles (linear interpolation) per group. Exact "
    "`percentile`, not approx_percentile — the approximate sketch is "
    "the 100 TB default but is engine-specific; the exact form is the "
    "oracle-comparable semantic anchor. Integral inputs keep the "
    "interpolation arithmetic bit-identical across engines.",
)
def q_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", F.lit(0.25)).alias("q25"),
            F.percentile("l_quantity", F.lit(0.5)).alias("q50"),
            F.percentile("l_quantity", F.lit(0.75)).alias("q75"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_grouping_sets",
    oracle="""
    SELECT n_name, r_name,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(25,8))) AS DOUBLE) AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY GROUPING SETS ((n_name, r_name), (r_name), ())
    ORDER BY n_name NULLS FIRST, r_name NULLS FIRST
    """,
    doc="Explicit GROUPING SETS (beyond rollup/cube): nation×region, "
    "region subtotals, grand total in one Expand+aggregate pass.",
)
def q_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    c, n, r = T(spark, sf, "customer"), T(spark, sf, "nation"), T(spark, sf, "region")
    return (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupingSets([["n_name", "r_name"], ["r_name"], []], "n_name", "r_name")
        .agg(F.count(F.lit(1)).alias("n"), dsum("c_acctbal").alias("total_bal"))
        .orderBy(F.col("n_name").asc_nulls_first(), F.col("r_name").asc_nulls_first())
    )


@register(
    "q_string_agg",
    oracle="""
    SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name ORDER BY r_name
    """,
    doc="Ordered string aggregation: collect_list → array_sort → "
    "array_join pins the (otherwise partition-order-dependent) result.",
)
def q_string_agg(spark: SparkSession, sf: str) -> DataFrame:
    n, r = T(spark, sf, "nation"), T(spark, sf, "region")
    return (
        n.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"))
        .orderBy("r_name")
    )


@register(
    "q_incremental_rollup",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(25,8))) AS DOUBLE) AS value_sum,
           MIN(value) AS value_min,
           MAX(value) AS value_max,
           CAST(SUM(CAST(value AS DECIMAL(25,8))) AS DOUBLE)
             / COUNT(value) AS value_avg
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
    doc="Incremental aggregate maintenance (operators/incremental_agg): "
    "history (ts < 2024-01-15) builds the initial state, two later delta "
    "batches are folded in by algebraic merge, and the finalized rollup "
    "hash-matches a full GROUP BY over everything — the oracle PROVES "
    "incremental == recompute. At scale the merge shuffles |state| + "
    "|delta partials|, never |history|.",
)
def q_incremental_rollup(spark: SparkSession, sf: str) -> DataFrame:
    from incremental_github_data_pipeline_spark.operators.incremental_agg import (
        finalize_rollup,
        merge_rollups,
        partial_rollup,
    )

    e = T(spark, sf, "events")
    measures = {
        "n": ("count", None),
        "value_sum": ("sum", "value"),
        "value_min": ("min", "value"),
        "value_max": ("max", "value"),
        "value_avg": ("avg", "value"),
    }
    keys = ["event_type"]
    cut1 = F.lit("2024-01-15").cast("timestamp")
    cut2 = F.lit("2024-01-22").cast("timestamp")
    state = partial_rollup(e.filter(F.col("ts") < cut1), keys, measures)
    d1 = partial_rollup(
        e.filter((F.col("ts") >= cut1) & (F.col("ts") < cut2)), keys, measures
    )
    d2 = partial_rollup(e.filter(F.col("ts") >= cut2), keys, measures)
    state = merge_rollups(state, d1, keys, measures)
    state = merge_rollups(state, d2, keys, measures)
    return finalize_rollup(state, measures).orderBy("event_type")


@register(
    "q_approx_profile",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS orders_ok, TRUE AS parts_ok,
           TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="Approximate corpus profiling — the 100 TB first-look query: "
    "HyperLogLog distinct counts (approx_count_distinct, mergeable "
    "partial sketches, one reduce, O(1) state per group) and KLL-style "
    "approximate percentiles (percentile_approx) per return flag. "
    "Certified via the assertion pattern: the sketch estimates are "
    "engine-specific, so the compared output is (a) the EXACT distinct "
    "counts (both engines compute them) and (b) booleans asserting each "
    "estimate sits inside its published error bound — HLL relative "
    "error <= 3x the default 5% rsd, percentile_approx rank error <= "
    "1/accuracy (+ slack for ties) — which DuckDB asserts as literal "
    "TRUE. Scalar columns only: the driver's pandas canonicalizer "
    "crashes on array columns (r3 q_approx_profile ERR). Tighter error "
    "tracking stays in tests/test_approx.py.",
)
def q_approx_profile(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_partkey", "l_extendedprice"
    )
    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("a_orders"),
        F.approx_count_distinct("l_partkey").alias("a_parts"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("ap50"),
        F.percentile_approx("l_extendedprice", 0.9, 10000).alias("ap90"),
        F.percentile_approx("l_extendedprice", 0.99, 10000).alias("ap99"),
    )
    # second pass ranks each approx percentile value exactly within its
    # group: the approx table is group-cardinality (tiny) so the join is
    # a broadcast — the fact table still streams map-side
    exact = (
        li.join(F.broadcast(approx), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count_distinct("l_orderkey").alias("exact_orders"),
            F.count_distinct("l_partkey").alias("exact_parts"),
            F.count(F.lit(1)).alias("n_rows"),
            *[
                F.sum(
                    F.when(F.col("l_extendedprice") < F.col(c), 1).otherwise(0)
                ).alias(f"lt_{c}")
                for c in ("ap50", "ap90", "ap99")
            ],
            *[
                F.sum(
                    F.when(F.col("l_extendedprice") <= F.col(c), 1).otherwise(0)
                ).alias(f"le_{c}")
                for c in ("ap50", "ap90", "ap99")
            ],
            F.first("a_orders").alias("a_orders"),
            F.first("a_parts").alias("a_parts"),
        )
    )
    eps = 1.0 / 10000 + 0.001  # rank-error guarantee + tie slack
    n = F.col("n_rows").cast("double")

    def pct_ok(c: str, q: float):
        return (F.col(f"lt_{c}") / n <= F.lit(q + eps)) & (
            F.col(f"le_{c}") / n >= F.lit(q - eps)
        )

    def hll_ok(a: str, ex: str):
        diff = F.abs(F.col(a).cast("double") - F.col(ex).cast("double"))
        return diff / F.col(ex).cast("double") <= F.lit(0.15)  # 3x rsd

    return exact.select(
        "l_returnflag",
        F.col("exact_orders").cast("long").alias("exact_orders"),
        F.col("exact_parts").cast("long").alias("exact_parts"),
        hll_ok("a_orders", "exact_orders").alias("orders_ok"),
        hll_ok("a_parts", "exact_parts").alias("parts_ok"),
        pct_ok("ap50", 0.5).alias("p50_ok"),
        pct_ok("ap90", 0.9).alias("p90_ok"),
        pct_ok("ap99", 0.99).alias("p99_ok"),
    ).orderBy("l_returnflag")


@register(
    "q_events_new_users",
    oracle="""
    WITH f AS (
      SELECT user_id, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ),
    d AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS new_users
      FROM f WHERE rn = 1 GROUP BY 1
    )
    SELECT day, CAST(new_users AS BIGINT) AS new_users,
           CAST(SUM(new_users) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_users
    FROM d ORDER BY day
    """,
    doc="Daily new users + cumulative total — the scalable alternative "
    "to windowed COUNT(DISTINCT): first-seen flag via per-user "
    "row_number (one shuffle on user_id), then a daily aggregate and a "
    "running sum over the tiny per-day series. No distinct-state "
    "explosion at 100 TB; the cumulative window runs on ~365 rows/yr.",
)
def q_events_new_users(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first_seen = e.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    daily = first_seen.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    cum_w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "day",
        "new_users",
        F.sum("new_users").over(cum_w).alias("cum_users"),
    ).orderBy("day")


@register(
    "q_events_funnel",
    oracle="""
    WITH s AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT CAST(COUNT(t_signup) AS BIGINT) AS n_signup,
           CAST(SUM(CASE WHEN t_signup < t_view THEN 1 ELSE 0 END) AS BIGINT)
             AS n_view_after_signup,
           CAST(SUM(CASE WHEN t_signup < t_view AND t_view < t_purchase
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS n_purchase_after_view
    FROM s
    """,
    doc="Funnel analysis (signup → view → purchase ordering per user): "
    "conditional-min step timestamps in ONE shuffle on user_id (no "
    "joins, no self-unions — the per-step pivot is a map-side "
    "conditional aggregate), then a single global reduce. The classic "
    "sequential-conversion query at event-log scale.",
)
def q_events_funnel(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "events")

    def step(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    s = e.groupBy("user_id").agg(
        step("signup").alias("t_signup"),
        step("view").alias("t_view"),
        step("purchase").alias("t_purchase"),
    )
    return s.agg(
        F.count("t_signup").alias("n_signup"),
        F.sum(
            F.when(F.col("t_signup") < F.col("t_view"), 1).otherwise(0)
        ).alias("n_view_after_signup"),
        F.sum(
            F.when(
                (F.col("t_signup") < F.col("t_view"))
                & (F.col("t_view") < F.col("t_purchase")),
                1,
            ).otherwise(0)
        ).alias("n_purchase_after_view"),
    )


@register(
    "q_window_analytics",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           lag(o_totalprice) OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           percent_rank() OVER w AS pct_rank,
           min(o_totalprice) OVER (
             w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS min_3,
           max(o_totalprice) OVER (
             w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS max_3
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_orderpriority, o_orderdate, o_orderkey
    """,
    doc="Analytic window surface in one pass: lag/lead offsets, ntile "
    "bucketing, percent_rank, and a rows-frame min/max — every function "
    "shares the (priority, date, key) window spec, so Catalyst plans a "
    "SINGLE Window operator over ONE shuffle on the partition key. All "
    "outputs are arithmetic-free (offsets, ranks, order-independent "
    "min/max), so the cross-engine compare is exact — no float-"
    "summation-order hazard.",
)
def q_window_analytics(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_orderdate", "o_orderkey"
    )
    wf = w.rowsBetween(-2, 0)
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.min("o_totalprice").over(wf).alias("min_3"),
        F.max("o_totalprice").over(wf).alias("max_3"),
    ).orderBy("o_orderpriority", "o_orderdate", "o_orderkey")


@register(
    "q_events_props_map",
    oracle="""
    WITH kv AS (
      SELECT event_type, u.pkey,
             CAST(json_extract(props, '$.' || u.pkey) AS BIGINT) AS pval
      FROM events, unnest(json_keys(props)) AS u(pkey)
    )
    SELECT event_type, pkey,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(pval) AS BIGINT) AS val_sum,
           CAST(COUNT(DISTINCT pval) AS BIGINT) AS n_distinct_vals
    FROM kv GROUP BY event_type, pkey ORDER BY event_type, pkey
    """,
    doc="Map-typed columns + lateral explode (SURVEY.md §2.7 notes the "
    "reference has no map functions — free in Spark): parse the props "
    "JSON into map<string,bigint> in the scan stage, explode entries "
    "(generic over keys, nothing hardcoded), aggregate per (event_type, "
    "key). One shuffle on the group key; the oracle iterates "
    "json_keys the same generic way.",
)
def q_events_props_map(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "events")
    kv = e.select(
        "event_type",
        F.explode(
            F.from_json("props", "map<string,bigint>")
        ).alias("pkey", "pval"),
    )
    return (
        kv.groupBy("event_type", "pkey")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("pval").alias("val_sum"),
            F.count_distinct("pval").alias("n_distinct_vals"),
        )
        .orderBy("event_type", "pkey")
    )


_CDC_SQL = """
    WITH base AS (
      SELECT o_orderkey AS k, o_orderstatus AS status, o_totalprice AS amt
      FROM orders
    ),
    chg AS (
      SELECT o_orderkey AS k, o_orderstatus AS status,
             o_totalprice + 1000 AS amt, 'update' AS op,
             o_orderkey * 2 + 1 AS lsn
      FROM orders WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT o_orderkey, o_orderstatus, o_totalprice, 'delete',
             o_orderkey * 2 + 2
      FROM orders WHERE o_orderkey % 17 = 0
      UNION ALL
      SELECT o_orderkey + 1000000000, 'N', 1.0, 'insert', 1
      FROM orders WHERE o_orderkey % 100 = 0
    ),
    unioned AS (
      SELECT k, status, amt, CAST(NULL AS BIGINT) AS lsn, 'base' AS op
      FROM base
      UNION ALL SELECT k, status, amt, lsn, op FROM chg
    ),
    win AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY k ORDER BY lsn DESC NULLS LAST) AS rn
      FROM unioned
    )
    SELECT k, status, amt FROM win
    WHERE rn = 1 AND op <> 'delete' AND k IN (SELECT k FROM chg)
    ORDER BY k
"""


@register(
    "q_cdc_apply",
    oracle=_CDC_SQL,
    doc="CDC changelog apply (streaming.incremental.apply_changelog): "
    "fold a deterministic insert/update/delete changelog synthesized "
    "from orders into the base snapshot — latest LSN wins per key, a "
    "winning delete removes the key, an update for a key divisible by "
    "both 10 and 17 loses to the later delete. One shuffle on the key "
    "(keep-last window, one row of per-key state); output restricted "
    "to changelog-touched keys so every CDC code path appears in the "
    "compared rows.",
)
def q_cdc_apply(spark: SparkSession, sf: str) -> DataFrame:
    from incremental_github_data_pipeline_spark.streaming.incremental import (
        apply_changelog,
    )

    o = T(spark, sf, "orders")
    base = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("amt"),
    )
    upd = o.filter(F.col("o_orderkey") % 10 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        (F.col("o_totalprice") + 1000).alias("amt"),
        F.lit("update").alias("op"),
        (F.col("o_orderkey") * 2 + 1).alias("lsn"),
    )
    dele = o.filter(F.col("o_orderkey") % 17 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("amt"),
        F.lit("delete").alias("op"),
        (F.col("o_orderkey") * 2 + 2).alias("lsn"),
    )
    ins = o.filter(F.col("o_orderkey") % 100 == 0).select(
        (F.col("o_orderkey") + 1_000_000_000).alias("k"),
        F.lit("N").alias("status"),
        F.lit(1.0).alias("amt"),
        F.lit("insert").alias("op"),
        F.lit(1).cast("long").alias("lsn"),
    )
    changes = upd.unionByName(dele).unionByName(ins)
    snapshot = apply_changelog(base, changes, ["k"], "lsn")
    touched = changes.select("k").distinct()
    return snapshot.join(touched, "k", "left_semi").orderBy("k")


_IVM_JOIN_SQL = """
    WITH o AS (SELECT o_orderkey, o_orderstatus, o_orderdate FROM orders),
    l AS (SELECT l_orderkey AS o_orderkey, l_shipdate,
                 CAST(l_quantity AS BIGINT) AS qty FROM lineitem),
    o_old AS (SELECT * FROM o WHERE o_orderdate <  TIMESTAMP '1997-01-01'),
    l_old AS (SELECT * FROM l WHERE l_shipdate  <  TIMESTAMP '1997-01-01'),
    full_j AS (SELECT o.o_orderstatus, l.qty FROM o JOIN l USING (o_orderkey)),
    old_j  AS (SELECT o_old.o_orderstatus, l_old.qty
               FROM o_old JOIN l_old USING (o_orderkey)),
    delta  AS (SELECT * FROM full_j EXCEPT ALL SELECT * FROM old_j)
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(qty) AS BIGINT) AS qty_sum
    FROM delta GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


@register(
    "q_incremental_join",
    oracle=_IVM_JOIN_SQL,
    doc="Incremental view maintenance for an inner join "
    "(operators.incremental_agg.incremental_join_delta): the join's "
    "gain under insert-only deltas is ΔA⨝B_old ∪ A_old⨝ΔB ∪ ΔA⨝ΔB — "
    "the two full tables never re-join; each term joins a small delta "
    "(AQE-broadcast) against one side. The oracle computes the same "
    "delta the expensive way (full join EXCEPT ALL old join), so the "
    "maintenance identity itself is what's being hash-compared.",
)
def q_incremental_join(spark: SparkSession, sf: str) -> DataFrame:
    from incremental_github_data_pipeline_spark.operators.incremental_agg import (
        incremental_join_delta,
    )

    cut = "1997-01-01"
    o = T(spark, sf, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderdate"
    )
    l = T(spark, sf, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_shipdate",
        F.col("l_quantity").cast("long").alias("qty"),
    )
    o_old = o.filter(F.col("o_orderdate") < cut)
    o_delta = o.filter(F.col("o_orderdate") >= cut)
    l_old = l.filter(F.col("l_shipdate") < cut)
    l_delta = l.filter(F.col("l_shipdate") >= cut)
    delta = incremental_join_delta(o_old, o_delta, l_old, l_delta, ["o_orderkey"])
    return (
        delta.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("qty").alias("qty_sum"),
        )
        .orderBy("o_orderstatus")
    )


_SCD2_SQL = """
    SELECT o_custkey, o_orderstatus, o_orderdate AS valid_from,
           LEAD(o_orderdate) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey) AS valid_to,
           CAST(CASE WHEN LEAD(o_orderdate) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey) IS NULL
             THEN 1 ELSE 0 END AS INT) AS is_current
    FROM orders
    ORDER BY o_custkey, valid_from, o_orderstatus
"""


@register(
    "q_scd2_history",
    oracle=_SCD2_SQL,
    doc="SCD Type-2 dimension versioning "
    "(streaming.incremental.scd2_history): each customer's order-status "
    "changes become validity-interval rows (valid_from/valid_to/"
    "is_current) — the as-of-reportable history the reference's "
    "snapshot-replace model discards. One shuffle on the key, same "
    "window shape as keep-last dedup. Tie-break on (date, orderkey) "
    "pins cross-engine row order inside equal-date runs.",
)
def q_scd2_history(spark: SparkSession, sf: str) -> DataFrame:
    from incremental_github_data_pipeline_spark.streaming.incremental import (
        scd2_history,
    )

    o = T(spark, sf, "orders").select(
        "o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey"
    )
    # composite order: equal-date changes need a deterministic sequence
    hist = scd2_history(
        o.withColumn(
            "_ord", F.struct("o_orderdate", "o_orderkey")
        ),
        ["o_custkey"],
        "_ord",
    )
    return hist.select(
        "o_custkey",
        "o_orderstatus",
        F.col("valid_from.o_orderdate").alias("valid_from"),
        F.col("valid_to.o_orderdate").alias("valid_to"),
        "is_current",
    ).orderBy("o_custkey", "valid_from", "o_orderstatus")


_SCD2_ASOF_SQL = """
    WITH hist AS (
      SELECT o_custkey, o_orderstatus, o_orderdate AS valid_from,
             LEAD(o_orderdate) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS valid_to
      FROM orders
    )
    SELECT o_custkey, o_orderstatus, valid_from
    FROM hist
    WHERE valid_from <= TIMESTAMP '1996-06-01'
      AND (valid_to IS NULL OR valid_to > TIMESTAMP '1996-06-01')
    ORDER BY o_custkey, valid_from, o_orderstatus
"""


@register(
    "q_scd2_asof",
    oracle=_SCD2_ASOF_SQL,
    doc="Point-in-time dimension lookup over the SCD2 history "
    "(scd2_history + an interval filter): the version of each "
    "customer's status valid AS OF 1996-06-01 — customers whose first "
    "change is later have no row, open intervals qualify. The pushed "
    "interval predicate means time-travel reporting costs one filtered "
    "window pass, not a snapshot restore.",
)
def q_scd2_asof(spark: SparkSession, sf: str) -> DataFrame:
    from incremental_github_data_pipeline_spark.streaming.incremental import (
        scd2_history,
    )

    at = "1996-06-01"
    o = T(spark, sf, "orders").select(
        "o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey"
    )
    hist = scd2_history(
        o.withColumn("_ord", F.struct("o_orderdate", "o_orderkey")),
        ["o_custkey"],
        "_ord",
    ).select(
        "o_custkey",
        "o_orderstatus",
        F.col("valid_from.o_orderdate").alias("valid_from"),
        F.col("valid_to.o_orderdate").alias("valid_to"),
    )
    return (
        hist.filter(
            (F.col("valid_from") <= at)
            & (F.col("valid_to").isNull() | (F.col("valid_to") > at))
        )
        .select("o_custkey", "o_orderstatus", "valid_from")
        .orderBy("o_custkey", "valid_from", "o_orderstatus")
    )


@register(
    "q_sketch_profile",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT value) AS BIGINT) AS exact_distinct,
           TRUE AS distinct_ok, TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="Mergeable DataSketches profiling "
    "(operators.incremental_agg.sketch_profile_state/merge/finalize): "
    "per-event-type KLL quantiles + HLL distinct estimate, computed by "
    "profiling two half-corpus shards separately and MERGING THE "
    "STATES — the incremental path a percentile_approx result cannot "
    "take. Certified via the assertion pattern: the sketch estimates "
    "are engine-specific, so the compared output is the exact row/"
    "distinct counts (both engines) plus booleans asserting each "
    "estimate sits inside its bound — HLL relative error <= 15% (3x "
    "the ~5% rsd at lgK 12 default), KLL rank error <= 5% (k=200 "
    "guarantees ~1.7%; slack for value ties) — which DuckDB asserts as "
    "literal TRUE. Shard-merge-equals-whole and tighter error tracking "
    "stay in test_incremental_agg.py.",
)
def q_sketch_profile(spark: SparkSession, sf: str) -> DataFrame:
    from incremental_github_data_pipeline_spark.operators.incremental_agg import (
        finalize_sketch_profile,
        merge_sketch_profiles,
        sketch_profile_state,
    )

    e = T(spark, sf, "events").select("event_type", "event_id", "value")
    shard_a = sketch_profile_state(
        e.filter(F.col("event_id") % 2 == 0), ["event_type"], "value"
    )
    shard_b = sketch_profile_state(
        e.filter(F.col("event_id") % 2 == 1), ["event_type"], "value"
    )
    fin = finalize_sketch_profile(
        merge_sketch_profiles(shard_a.unionByName(shard_b), ["event_type"])
    )
    # rank the sketch quantiles exactly: the finalized profile is
    # group-cardinality (tiny) → broadcast join back onto the fact
    checked = (
        e.join(F.broadcast(fin), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct("value").alias("exact_distinct"),
            *[
                F.sum(
                    F.when(F.col("value") < F.col(c), 1).otherwise(0)
                ).alias(f"lt_{c}")
                for c in ("p50", "p90", "p99")
            ],
            *[
                F.sum(
                    F.when(F.col("value") <= F.col(c), 1).otherwise(0)
                ).alias(f"le_{c}")
                for c in ("p50", "p90", "p99")
            ],
            F.first("approx_distinct").alias("approx_distinct"),
        )
    )
    eps = 0.05  # KLL k=200 rank-error ~1.7% + tie slack
    n = F.col("n_rows").cast("double")

    def pct_ok(c: str, q: float):
        return (F.col(f"lt_{c}") / n <= F.lit(q + eps)) & (
            F.col(f"le_{c}") / n >= F.lit(q - eps)
        )

    return checked.select(
        "event_type",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
        (
            F.abs(
                F.col("approx_distinct").cast("double")
                - F.col("exact_distinct").cast("double")
            )
            / F.col("exact_distinct").cast("double")
            <= F.lit(0.15)
        ).alias("distinct_ok"),
        pct_ok("p50", 0.5).alias("p50_ok"),
        pct_ok("p90", 0.9).alias("p90_ok"),
        pct_ok("p99", 0.99).alias("p99_ok"),
    ).orderBy("event_type")


@register(
    "q_retention_cohorts",
    oracle="""
    WITH f AS (
      SELECT user_id, ts, MIN(ts) OVER (PARTITION BY user_id) AS first_ts
      FROM events
    ),
    a AS (
      SELECT DISTINCT CAST(date_trunc('week', first_ts) AS DATE) AS cohort_week,
             CAST(date_diff('day',
                            CAST(date_trunc('week', first_ts) AS DATE),
                            CAST(date_trunc('week', ts) AS DATE)) // 7
                  AS BIGINT) AS week_offset,
             user_id
      FROM f
    ),
    r AS (
      SELECT cohort_week, week_offset, CAST(COUNT(*) AS BIGINT) AS n_active
      FROM a GROUP BY 1, 2
    )
    SELECT cohort_week, week_offset, n_active,
           CAST(n_active AS DOUBLE)
             / FIRST_VALUE(n_active) OVER (PARTITION BY cohort_week
                                           ORDER BY week_offset) AS retention
    FROM r ORDER BY cohort_week, week_offset
    """,
    doc="Cohort retention matrix: users bucketed by first-seen week, "
    "activity counted per (cohort, week-offset), retention as the "
    "share of the offset-0 cohort size. Scalable shape: first-seen via "
    "a per-user MIN window (one shuffle on user_id, no global "
    "collect), then DISTINCT (cohort, offset, user) — dedup BEFORE "
    "counting, so no COUNT(DISTINCT) state explosion — then a tiny "
    "per-cohort aggregate; the FIRST_VALUE window runs on "
    "cohorts x offsets rows only.",
)
def q_retention_cohorts(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "events")
    w_user = Window.partitionBy("user_id")
    f = e.select(
        "user_id", "ts", F.min("ts").over(w_user).alias("first_ts")
    )
    a = f.select(
        F.date_trunc("week", F.col("first_ts")).cast("date").alias("cohort_week"),
        (
            F.datediff(
                F.date_trunc("week", F.col("ts")).cast("date"),
                F.date_trunc("week", F.col("first_ts")).cast("date"),
            )
            / 7
        )
        .cast("long")
        .alias("week_offset"),
        "user_id",
    ).distinct()
    r = a.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    w_cohort = Window.partitionBy("cohort_week").orderBy("week_offset")
    return r.select(
        "cohort_week",
        "week_offset",
        "n_active",
        (F.col("n_active").cast("double") / F.first("n_active").over(w_cohort))
        .alias("retention"),
    ).orderBy("cohort_week", "week_offset")


@register(
    "q_unpivot_measures",
    oracle="""
    WITH agg AS (
      SELECT l_returnflag,
             CAST(SUM(CAST(l_quantity AS DECIMAL(25,8))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,8))) AS DOUBLE)
               AS sum_price,
             CAST(COUNT(*) AS DOUBLE) AS n_items
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, measure, value FROM (
      SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM agg
      UNION ALL
      SELECT l_returnflag, 'sum_price', sum_price FROM agg
      UNION ALL
      SELECT l_returnflag, 'n_items', n_items FROM agg
    ) ORDER BY l_returnflag, measure
    """,
    doc="Wide-to-long unpivot (DataFrame.unpivot / SQL UNPIVOT — the "
    "melt operation): per-flag measures rotated into (measure, value) "
    "rows. Decimal-exact sums before the unpivot; the unpivot itself "
    "is a zero-shuffle projection (each input row emits its measures "
    "map-side).",
)
def q_unpivot_measures(spark: SparkSession, sf: str) -> DataFrame:
    agg = (
        T(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_price"),
            F.count(F.lit(1)).cast("double").alias("n_items"),
        )
    )
    return agg.unpivot(
        ["l_returnflag"],
        ["sum_qty", "sum_price", "n_items"],
        "measure",
        "value",
    ).orderBy("l_returnflag", "measure")


@register(
    "q_price_histogram",
    oracle="""
    SELECT CAST(LEAST(FLOOR(CAST(l_extendedprice AS DOUBLE) / 5000.0), 21)
                AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(l_orderkey) AS BIGINT) AS min_orderkey
    FROM lineitem GROUP BY 1 ORDER BY bucket
    """,
    doc="Fixed-width histogram: bucket assignment is scan-stage "
    "arithmetic (one IEEE division + floor — engine-exact), so the "
    "whole histogram is a single map-side-combined aggregate over "
    "~22 groups; no sort, no second pass over the data. The "
    "min_orderkey lane pins bucket MEMBERSHIP, not just counts.",
)
def q_price_histogram(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem")
    bucket = F.least(
        F.floor(F.col("l_extendedprice").cast("double") / 5000.0), F.lit(21)
    ).cast("long")
    return (
        li.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("l_orderkey").alias("min_orderkey"),
        )
        .orderBy("bucket")
    )


@register(
    "q_events_sliding",
    oracle="""
    WITH w AS (
      SELECT e.event_type,
             date_trunc('hour', e.ts) - to_hours(i.i) AS window_start
      FROM events e, range(2) i(i)
    )
    SELECT window_start, event_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM w GROUP BY 1, 2 ORDER BY window_start, event_type
    """,
    doc="Sliding (hopping) window aggregation — batch twin of the "
    "streaming hop: 2-hour windows every hour, so each event lands in "
    "exactly two windows. Spark's window(slide) expansion happens "
    "map-side before the single aggregate shuffle; the oracle "
    "reproduces the epoch-aligned window assignment with a range(2) "
    "cross join.",
)
def q_events_sliding(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "events")
    return (
        e.groupBy(
            F.window("ts", "2 hours", "1 hour").alias("_w"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("_w.start").alias("window_start"), "event_type", "n"
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "q_corr_qty_price",
    oracle="""
    WITH c AS (
      SELECT l_returnflag,
             CAST(ROUND(l_quantity * 100) AS BIGINT) AS qi,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS pi
      FROM lineitem
    ),
    m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(qi) AS BIGINT) AS sx,
             CAST(SUM(pi) AS BIGINT) AS sy,
             CAST(SUM(qi * qi) AS BIGINT) AS sxx,
             CAST(SUM(qi * pi) AS BIGINT) AS sxy,
             CAST(CAST(SUM(CAST(pi AS HUGEINT) * pi) AS DECIMAL(38,0))
                  AS DOUBLE) AS syy
      FROM c GROUP BY l_returnflag
    )
    SELECT l_returnflag, n, sx, sy, sxy,
           (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
             AS corr,
           (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS slope
    FROM m ORDER BY l_returnflag
    """,
    doc="Correlation + regression slope per group WITHOUT the "
    "nondeterministic float path: the five algebraic moments (n, Sx, "
    "Sy, Sxx, Sxy[, Syy]) are summed EXACTLY in integer cent-space "
    "(order-independent — the reason F.corr itself can't hash-match "
    "across engines), then corr and slope come from one fixed "
    "arithmetic expression over the exact moments. Integer moment "
    "lanes are value-compared directly; Syy exceeds int64 so it rides "
    "the exact-decimal-to-double conversion (round-to-nearest of an "
    "exact value — portable, unlike double-to-decimal). Single "
    "map-combined aggregate, no second pass.",
)
def q_corr_qty_price(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem")
    qi = F.round(F.col("l_quantity") * 100).cast("long")
    pi = F.round(F.col("l_extendedprice") * 100).cast("long")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(qi).alias("sx"),
        F.sum(pi).alias("sy"),
        F.sum(qi * qi).alias("sxx"),
        F.sum(qi * pi).alias("sxy"),
        F.sum((pi * pi).cast("decimal(38,0)"))
        .cast("double")
        .alias("syy"),
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    num = nd * F.col("sxy") - sxd * F.col("sy")
    varx = nd * F.col("sxx") - sxd * F.col("sx")
    vary = nd * F.col("syy") - syd * F.col("sy")
    return m.select(
        "l_returnflag", "n", "sx", "sy", "sxy",
        (num / F.sqrt(varx * vary)).alias("corr"),
        (num / varx).alias("slope"),
    ).orderBy("l_returnflag")


@register(
    "q_recursive_hierarchy",
    oracle="""
    WITH RECURSIVE emp AS (
      SELECT r.range AS id,
             CASE WHEN r.range = 0 THEN NULL ELSE (r.range - 1) // 3 END
               AS mgr
      FROM range(200) r
    ),
    d(id, depth) AS (
      SELECT CAST(0 AS BIGINT), 0
      UNION ALL
      SELECT e.id, d.depth + 1 FROM emp e JOIN d ON e.mgr = d.id
    )
    SELECT CAST(depth AS BIGINT) AS depth,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(id) AS BIGINT) AS sum_ids,
           CAST(MAX(id) AS BIGINT) AS max_id
    FROM d GROUP BY depth ORDER BY depth
    """,
    doc="Recursive CTE (Spark 4 WITH RECURSIVE): transitive closure "
    "over a ternary management hierarchy — per-level node counts, the "
    "query class (org charts, BOM explosions, graph reachability) "
    "that needed iterative driver loops before Spark 4. Each "
    "recursion step is one equi-join of the frontier against the edge "
    "table; depth is bounded by the hierarchy height (log3 n), so the "
    "plan is height-many joins, not row-many. Both engines run the "
    "same ANSI recursion; all output lanes are exact integers.",
)
def q_recursive_hierarchy(spark: SparkSession, sf: str) -> DataFrame:
    return spark.sql("""
        WITH RECURSIVE emp AS (
          SELECT id,
                 CASE WHEN id = 0 THEN NULL ELSE (id - 1) DIV 3 END AS mgr
          FROM range(200)
        ),
        d(id, depth) AS (
          SELECT CAST(0 AS BIGINT) AS id, 0 AS depth
          UNION ALL
          SELECT e.id, d.depth + 1 FROM emp e JOIN d ON e.mgr = d.id
        )
        SELECT CAST(depth AS BIGINT) AS depth,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(id) AS BIGINT) AS sum_ids,
               CAST(MAX(id) AS BIGINT) AS max_id
        FROM d GROUP BY depth ORDER BY depth
    """)


@register(
    "q_allocate_cents",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS q
      FROM lineitem WHERE l_orderkey < 100
    ),
    o AS (
      SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS t
      FROM orders WHERE o_orderkey < 100
    ),
    j AS (
      SELECT li.l_orderkey, li.l_linenumber, li.q, o.t,
             CAST(SUM(li.q) OVER (PARTITION BY li.l_orderkey) AS BIGINT) AS qs
      FROM li JOIN o ON li.l_orderkey = o.o_orderkey
    ),
    b AS (
      SELECT *, t * q // qs AS base, (t * q) % qs AS rem FROM j
    ),
    r AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                ORDER BY rem DESC, l_linenumber) AS rk,
             CAST(t - SUM(base) OVER (PARTITION BY l_orderkey) AS BIGINT)
               AS short
      FROM b
    )
    SELECT l_orderkey, l_linenumber,
           CAST(base + CASE WHEN rk <= short THEN 1 ELSE 0 END AS BIGINT)
             AS alloc_cents
    FROM r ORDER BY l_orderkey, l_linenumber
    """,
    doc="Proportional allocation with largest-remainder rounding "
    "(budget disaggregation): each order's total, in integer cents, "
    "split across its lineitems proportionally to quantity so the "
    "allocations sum EXACTLY to the total — floor division plus +1 to "
    "the largest remainders, linenumber tie-break. All integer "
    "arithmetic, fully deterministic; two windows over the same "
    "order-key partitioning collapse into one shuffle.",
)
def q_allocate_cents(spark: SparkSession, sf: str) -> DataFrame:
    li = (
        T(spark, sf, "lineitem")
        .filter(F.col("l_orderkey") < 100)
        .select(
            "l_orderkey", "l_linenumber",
            F.col("l_quantity").cast("long").alias("q"),
        )
    )
    o = (
        T(spark, sf, "orders")
        .filter(F.col("o_orderkey") < 100)
        .select(
            F.col("o_orderkey"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("t"),
        )
    )
    w_order = Window.partitionBy("l_orderkey")
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "l_orderkey", "l_linenumber", "q", "t",
        F.sum("q").over(w_order).alias("qs"),
    )
    b = j.withColumn("base", F.expr("t * q DIV qs")).withColumn(
        "rem", (F.col("t") * F.col("q")) % F.col("qs")
    )
    r = b.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("l_orderkey").orderBy(
                F.desc("rem"), F.asc("l_linenumber")
            )
        ),
    ).withColumn("short", F.col("t") - F.sum("base").over(w_order))
    return r.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.col("base")
            + F.when(F.col("rk") <= F.col("short"), 1).otherwise(0)
        ).alias("alloc_cents"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "q_user_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    g AS (
      SELECT user_id, day,
             day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                           ORDER BY day) AS INTEGER)
               AS island
      FROM days
    ),
    s AS (
      SELECT user_id, island, COUNT(*) AS len
      FROM g GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(MAX(len) AS BIGINT) AS longest_streak,
           CAST(COUNT(*) AS BIGINT) AS n_streaks,
           CAST(SUM(len) AS BIGINT) AS active_days
    FROM s GROUP BY user_id ORDER BY user_id
    """,
    doc="Gaps-and-islands streak detection: longest run of consecutive "
    "active DAYS per user via the date-minus-row_number island key — "
    "the canonical SQL shape for consecutive-sequence analysis, "
    "distinct from time-gap sessionization (q_sessionize). One "
    "user-keyed shuffle feeds the dedup, the window, and both "
    "aggregations; all lanes exact integers.",
)
def q_user_streaks(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "events")
    days = e.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    rn = F.row_number().over(Window.partitionBy("user_id").orderBy("day"))
    g = days.withColumn("island", F.date_sub(F.col("day"), rn))
    s = g.groupBy("user_id", "island").agg(F.count(F.lit(1)).alias("len"))
    return (
        s.groupBy("user_id")
        .agg(
            F.max("len").alias("longest_streak"),
            F.count(F.lit(1)).alias("n_streaks"),
            F.sum("len").alias("active_days"),
        )
        .orderBy("user_id")
    )


@register(
    "q_variant_agg",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS min_k,
           CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS max_k,
           CAST(COUNT(DISTINCT CAST(json_extract(props, '$.k') AS BIGINT))
                AS BIGINT) AS distinct_k
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="Spark 4 VARIANT lane for semi-structured data: parse_json "
    "turns the JSON string payload into the binary shredded VARIANT "
    "representation ONCE in the scan stage, then variant_get does "
    "typed path access without re-parsing — the difference from "
    "q_json_extract's get_json_object (which re-tokenizes the string "
    "per access) and the storage model that makes JSON columns "
    "scan-efficient at 100 TB. Aggregates stay exact integer lanes.",
)
def q_variant_agg(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "events").select(
        "event_type", F.parse_json("props").alias("_v")
    )
    k = F.variant_get(F.col("_v"), "$.k", "long")
    return (
        e.select("event_type", k.alias("_k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_k").alias("sum_k"),
            F.min("_k").alias("min_k"),
            F.max("_k").alias("max_k"),
            F.count_distinct(F.col("_k")).alias("distinct_k"),
        )
        .orderBy("event_type")
    )


@register(
    "q_chi_square_cells",
    oracle="""
    WITH cells AS (
      SELECT event_type,
             CAST(EXTRACT(hour FROM ts) // 6 AS BIGINT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT event_type, bucket, o,
             CAST(SUM(o) OVER (PARTITION BY event_type) AS BIGINT) AS r,
             CAST(SUM(o) OVER (PARTITION BY bucket) AS BIGINT) AS c,
             CAST(SUM(o) OVER () AS BIGINT) AS n
      FROM cells
    )
    SELECT event_type, bucket, o, r, c,
           CAST(CAST(o*n - r*c AS DECIMAL(19,0))
                * CAST(o*n - r*c AS DECIMAL(19,0)) AS DOUBLE)
             / CAST(n * r * c AS DOUBLE) AS contrib
    FROM m ORDER BY event_type, bucket
    """,
    doc="Chi-square test of independence (event type vs 6-hour time "
    "bucket) with per-cell contributions (O*N - R*C)^2 / (N*R*C) — "
    "the standard statistic rearranged so every term is an exact "
    "integer lane: the squared numerator rides DECIMAL (it exceeds "
    "int64), and the only float steps are two exact-value-to-double "
    "conversions plus one IEEE division, deterministic in any engine. "
    "Per-cell rows avoid the order-dependent float total. Physical "
    "shape: one map-combined aggregate to ~20 cells, then window "
    "margins over that tiny frame — the fact table is scanned once.",
)
def q_chi_square_cells(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "events")
    cells = e.groupBy(
        "event_type",
        (F.hour("ts") / 6).cast("long").alias("bucket"),
    ).agg(F.count(F.lit(1)).alias("o"))
    m = cells.select(
        "event_type",
        "bucket",
        "o",
        F.sum("o").over(Window.partitionBy("event_type")).alias("r"),
        F.sum("o").over(Window.partitionBy("bucket")).alias("c"),
        F.sum("o").over(
            Window.partitionBy()
        ).alias("n"),
    )
    num = (F.col("o") * F.col("n") - F.col("r") * F.col("c")).cast(
        "decimal(19,0)"
    )
    return m.select(
        "event_type",
        "bucket",
        "o",
        "r",
        "c",
        (
            (num * num).cast("double")
            / (F.col("n") * F.col("r") * F.col("c")).cast("double")
        ).alias("contrib"),
    ).orderBy("event_type", "bucket")


@register(
    "q_rolling_time_window",
    oracle="""
    WITH c AS (
      SELECT event_id, event_type, ts,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events
    )
    SELECT event_id, event_type, ts,
           CAST(SUM(cents) OVER (
             PARTITION BY event_type ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS rolling_hour_cents,
           CAST(COUNT(*) OVER (
             PARTITION BY event_type ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS rolling_hour_n
    FROM c ORDER BY event_type, ts, event_id
    """,
    doc="Time-based rolling aggregate via a RANGE window frame over "
    "event-time microseconds: at every event, the exact cent sum and "
    "count of the trailing hour for its type — the sliding-window "
    "analytic that ROWS frames cannot express when event spacing is "
    "irregular. The frame bound is an integer microsecond offset "
    "(RANGE over epoch_us), identical in both engines; tied "
    "timestamps are peers and both engines include the full peer "
    "group in RANGE frames, so no tiebreak ambiguity exists. One "
    "window shuffle on the series key.",
)
def q_rolling_time_window(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "events").select(
        "event_id",
        "event_type",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        "event_type",
        "ts",
        F.sum("cents").over(w).cast("long").alias("rolling_hour_cents"),
        F.count(F.lit(1)).over(w).cast("long").alias("rolling_hour_n"),
    ).orderBy("event_type", "ts", "event_id")


@register(
    "q_sequence_pattern",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN prev_type = 'view'
                          AND event_type = 'purchase'
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS n_view_then_purchase,
           CAST(SUM(CASE WHEN prev_type = 'error'
                          AND event_type = 'error'
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS n_error_bursts
    FROM o GROUP BY user_id
    HAVING SUM(CASE WHEN prev_type = 'view' AND event_type = 'purchase'
               THEN 1 ELSE 0 END) > 0
        OR SUM(CASE WHEN prev_type = 'error' AND event_type = 'error'
               THEN 1 ELSE 0 END) > 0
    ORDER BY user_id
    """,
    doc="Sequence-pattern detection (MATCH_RECOGNIZE-lite): per user, "
    "count IMMEDIATELY-ADJACENT event bigrams — view->purchase "
    "(direct conversion, no intervening event) and error->error "
    "(fault bursts) — via one LAG over the deterministic (ts, "
    "event_id) order. Adjacency is what the funnel/conversion queries "
    "deliberately don't test (they allow intervening events); "
    "arbitrary regex-over-sequence patterns compile to the same "
    "lag-chain shape. One window shuffle, exact integer lanes.",
)
def q_sequence_pattern(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = e.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    vp = F.when(
        (F.col("prev_type") == "view") & (F.col("event_type") == "purchase"),
        1,
    ).otherwise(0)
    ee = F.when(
        (F.col("prev_type") == "error") & (F.col("event_type") == "error"), 1
    ).otherwise(0)
    return (
        o.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(vp).alias("n_view_then_purchase"),
            F.sum(ee).alias("n_error_bursts"),
        )
        .filter(
            (F.col("n_view_then_purchase") > 0) | (F.col("n_error_bursts") > 0)
        )
        .orderBy("user_id")
    )


@register(
    "q_equidepth_buckets",
    oracle="""
    WITH o AS (
      SELECT l_extendedprice AS p, l_orderkey, l_linenumber,
             NTILE(8) OVER (ORDER BY l_extendedprice, l_orderkey,
                            l_linenumber) AS bucket
      FROM lineitem
    )
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(ROUND(MIN(p) * 100) AS BIGINT) AS min_cents,
           CAST(ROUND(MAX(p) * 100) AS BIGINT) AS max_cents
    FROM o GROUP BY bucket ORDER BY bucket
    """,
    doc="Equi-depth histogram (the optimizer-statistics shape) with "
    "NTILE-exact output but NO single-partition global window: a "
    "two-pass distributed rank. Pass 1 range-partitions + locally "
    "sorts on the tie-free compound key (price, orderkey, linenumber) "
    "and collects per-partition row COUNTS (bounded by the partition "
    "count, never row data); pass 2 turns the broadcast prefix "
    "offsets plus a per-partition local index (monotonically_"
    "increasing_id's low 33 bits, which count rows in post-sort "
    "iterator order) into the exact global rank, and NTILE(8)'s "
    "closed form — first n%8 buckets get one extra row — maps rank to "
    "bucket as pure codegen arithmetic. The ranged frame is pinned "
    "with localCheckpoint so both passes read ONE materialization "
    "(the range exchange's reservoir sample is seeded per-RDD, so "
    "re-execution could legally pick different bounds and corrupt the "
    "offsets). Every stage is as parallel as the partition count; "
    "oracle (NTILE over a total order) unchanged.",
)
def q_equidepth_buckets(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem")
    keys = ["p", "l_orderkey", "l_linenumber"]
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        li.select(
            F.col("l_extendedprice").alias("p"),
            "l_orderkey",
            "l_linenumber",
        )
        .repartitionByRange(nparts, *[F.col(k) for k in keys])
        .sortWithinPartitions(*keys)
        .select(
            "p",
            F.spark_partition_id().alias("pid"),
            # low 33 bits = per-partition record counter, assigned in
            # the post-sort iterator order => local rank - 1.
            F.monotonically_increasing_id()
            .bitwiseAND(F.lit((1 << 33) - 1))
            .alias("local_idx"),
        )
        .localCheckpoint()
    )
    # Pass 1: per-partition counts -> prefix offsets (driver-side state
    # is one integer per partition — bounded by cluster parallelism).
    counts = {
        r["pid"]: r["cnt"]
        for r in ranged.groupBy("pid").agg(F.count("*").alias("cnt")).collect()
    }
    total = sum(counts.values())
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_map = F.create_map(
        *[F.lit(x) for pid in sorted(offsets) for x in (pid, offsets[pid])]
    )
    # Pass 2: global 0-based rank, then NTILE(8)'s closed form:
    # q = total div 8, rem = total mod 8; the first rem buckets hold
    # q+1 rows, the rest q. Integer `div` keeps the mapping exact at
    # any rank magnitude (float division mis-rounds near 2^53).
    q, rem = divmod(total, 8)
    cut = rem * (q + 1)  # rank of the first small-bucket row
    bucket = F.expr(
        f"CAST(IF({q} = 0 OR r0 < {cut}, r0 div {q + 1}, "
        f"{rem} + (r0 - {cut}) div {max(q, 1)}) AS INT) + 1"
    ).alias("bucket")
    return (
        ranged.select(
            "p", (off_map[F.col("pid")] + F.col("local_idx")).alias("r0")
        )
        .select("p", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("p") * 100).cast("long").alias("min_cents"),
            F.round(F.max("p") * 100).cast("long").alias("max_cents"),
        )
        .orderBy("bucket")
    )


@register(
    "q_group_mode",
    oracle="""
    WITH c AS (
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
      FROM orders GROUP BY 1, 2
    ),
    r AS (
      SELECT o_orderstatus, o_orderpriority, cnt,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                ORDER BY cnt DESC, o_orderpriority) AS rk
      FROM c
    )
    SELECT o_orderstatus, o_orderpriority AS mode_priority,
           CAST(cnt AS BIGINT) AS cnt
    FROM r WHERE rk = 1 ORDER BY o_orderstatus
    """,
    doc="Exact per-group MODE with a deterministic tie-break (highest "
    "count, then smallest value) — the categorical summary statistic "
    "SQL's approx variants can't certify. Two-level aggregate: the "
    "(group, value) counts shuffle once, the per-group argmax is a "
    "window over the |groups x values| count frame — tiny relative to "
    "the fact scan, so the expensive stage is the single map-combined "
    "count aggregate.",
)
def q_group_mode(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    c = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("cnt").desc(), F.col("o_orderpriority")
    )
    return (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            "cnt",
        )
        .orderBy("o_orderstatus")
    )


def _hll_sliding_oracle() -> str:
    from incremental_github_data_pipeline_spark.operators.incremental_agg import (
        _bitwidth_cases,
        _hll_hash_sql,
    )

    p = 6
    rank_bits = 31 - p
    h = _hll_hash_sql("user_id", "xor({a}, {b})", "//")
    rem = f"({h} % {1 << rank_bits})"
    width = _bitwidth_cases(rem, rank_bits)
    return f"""
    WITH ev AS (
      SELECT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    daily AS (
      SELECT day,
             CAST({h} // {1 << rank_bits} AS BIGINT) AS hll_idx,
             CAST(MAX({rank_bits} - {width} + 1) AS BIGINT) AS rho
      FROM ev GROUP BY day, hll_idx
    ),
    grid AS (
      SELECT d.day, CAST(i.range AS BIGINT) AS hll_idx
      FROM (SELECT DISTINCT day FROM ev) d, range({1 << p}) i
    ),
    dense AS (
      SELECT g.day, g.hll_idx, COALESCE(d.rho, 0) AS rho
      FROM grid g LEFT JOIN daily d USING (day, hll_idx)
    )
    SELECT day, hll_idx, CAST(rho AS BIGINT) AS rho,
           CAST(MAX(rho) OVER (
             PARTITION BY hll_idx ORDER BY day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS rho7
    FROM dense ORDER BY day, hll_idx
    """


@register(
    "q_hll_sliding",
    oracle=_hll_sliding_oracle(),
    doc="SLIDING-WINDOW distinct-count sketch (r10): per-day HLL "
    "register tables (operators/incremental_agg.hll_registers, p=6) "
    "merged over a trailing 7-day window by REGISTER MAX — the "
    "trailing-weekly-uniques metric computed without ever re-scanning "
    "7 days of raw events, because the sketch's union law IS max. "
    "The merge runs on the dense (day x 64-register) grid (missing "
    "registers coalesce to 0), so the 6-PRECEDING row frame is "
    "exactly 6 days; state per day is CONSTANT and the whole "
    "monitoring table is days x 2^p rows. Register-exact oracle end "
    "to end — daily sketch, grid, and windowed max all replayed by "
    "DuckDB; estimation stays out of the certified lane as always.",
)
def q_hll_sliding(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    from incremental_github_data_pipeline_spark.operators.incremental_agg import (
        hll_registers,
    )

    ev = T(spark, sf, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    # days×64-sized — materialize once: it feeds the day universe AND
    # the grid join (two consumers would otherwise each replay the
    # events scan + sketch aggregate)
    daily = hll_registers(ev, "day", "user_id", p=6).localCheckpoint(
        eager=True
    )
    # every day has ≥1 occupied register at these volumes… is an
    # assumption; the DAY UNIVERSE must not depend on it, so it still
    # derives from the sketch frame (which carries every day that has
    # ANY row — hll_registers emits ≥1 register per non-empty group)
    days = daily.select("day").distinct()
    # r16: 64 rows in 1 partition (bare range splits into 32 near-empty
    # partitions and drags a no-op task per partition per consumer)
    idxs = spark.range(0, 64, 1, 1).select(F.col("id").alias("hll_idx"))
    dense = (
        days.crossJoin(F.broadcast(idxs))
        .join(daily, ["day", "hll_idx"], "left")
        .select(
            "day",
            "hll_idx",
            F.coalesce(F.col("hll_rho"), F.lit(0))
            .cast("long")
            .alias("rho"),
        )
    )
    w = (
        Window.partitionBy("hll_idx")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    return (
        dense.withColumn("rho7", F.max("rho").over(w).cast("long"))
        .orderBy("day", "hll_idx")
    )


def _hll_oracle() -> str:
    from incremental_github_data_pipeline_spark.operators.incremental_agg import (
        _bitwidth_cases,
        _hll_hash_sql,
    )

    p = 6
    rank_bits = 31 - p
    h = _hll_hash_sql("c_custkey", "xor({a}, {b})", "//")
    rem = f"({h} % {1 << rank_bits})"
    width = _bitwidth_cases(rem, rank_bits)
    return f"""
    SELECT c_mktsegment,
           CAST({h} // {1 << rank_bits} AS BIGINT) AS hll_idx,
           CAST(MAX({rank_bits} - {width} + 1) AS BIGINT) AS hll_rho
    FROM customer
    GROUP BY c_mktsegment, hll_idx
    ORDER BY c_mktsegment, hll_idx
    """


@register(
    "q_hll_registers",
    oracle=_hll_oracle(),
    doc="HyperLogLog distinct sketch whose REGISTER STATE is the "
    "compared object (operators/incremental_agg.hll_registers): "
    "31-bit multiply-xor avalanche hash (an LCG was measured +52% "
    "biased and rejected — see _hll_hash_sql), top-6-bit register "
    "index, exact CASE-chain "
    "bit-width rank — every step integer arithmetic DuckDB replays "
    "verbatim, so unlike guarantee-lane sketch oracles this one "
    "hash-matches the sketch itself. 64 registers per group = "
    "CONSTANT state, mergeable by union+max (merge law pinned in "
    "test_incremental_agg.py); one (group, idx) shuffle with "
    "map-side max combine. Estimation (hll_estimate) is the single "
    "float step, certified separately by a relative-error test.",
)
def q_hll_registers(spark: SparkSession, sf: str) -> DataFrame:
    from incremental_github_data_pipeline_spark.operators.incremental_agg import (
        hll_registers,
    )

    return (
        hll_registers(
            T(spark, sf, "customer"), "c_mktsegment", "c_custkey", p=6
        )
        .select("c_mktsegment", "hll_idx", "hll_rho")
        .orderBy("c_mktsegment", "hll_idx")
    )


def _kmv_oracle_prefix(key_sql: str, table: str, group_sql: str) -> str:
    """DuckDB replay of kmv_sketch(k=64) over ``table``: distinct
    31-bit avalanche hashes of ``key_sql`` per ``group_sql``, bottom-64
    by row_number (the Spark side's salt pre-trim is a pure
    optimization — the k smallest survive it by construction, so the
    direct bottom-k here is the same set)."""
    from incremental_github_data_pipeline_spark.operators.incremental_agg import (
        _hll_hash_sql,
    )

    h = _hll_hash_sql(key_sql, "xor({a}, {b})", "//")
    return f"""
    hashes AS (
      SELECT DISTINCT {group_sql} AS g, {h} AS kh FROM {table}
    ),
    ranked AS (
      SELECT g, kh, row_number() OVER (PARTITION BY g ORDER BY kh) AS rk
      FROM hashes
    ),
    sk AS (SELECT g, kh FROM ranked WHERE rk <= 64)
    """


@register(
    "q_kmv_distinct",
    oracle=r"""
    WITH """ + _kmv_oracle_prefix("c_custkey", "customer", "c_mktsegment") + r""",
    agg AS (
      SELECT g, count(*) AS n, max(kh) AS hk FROM sk GROUP BY g
    ),
    ex AS (
      SELECT c_mktsegment AS g, count(DISTINCT c_custkey) AS exact_d
      FROM customer GROUP BY 1
    )
    SELECT agg.g AS c_mktsegment,
           CAST(agg.n AS BIGINT) AS n_sample,
           CAST(CASE WHEN agg.n < 64 THEN agg.n
                ELSE 135291469824 // (agg.hk + 1) END AS BIGINT)
             AS kmv_est,
           CAST(ex.exact_d AS BIGINT) AS exact_distinct
    FROM agg JOIN ex ON agg.g = ex.g
    ORDER BY c_mktsegment
    """,
    doc="KMV (k-minimum-values) distinct sketch with an INTEGER-EXACT "
    "estimate (r11, operators/incremental_agg.kmv_sketch/kmv_estimate)"
    " — the certifiable counterpart of both the HLL family (whose "
    "estimate is a float harmonic mean, kept out of oracle lanes) and "
    "Spark's native theta_sketch_agg: bottom-64 distinct 31-bit "
    "avalanche hashes per group, estimate = (k-1)·2^31 div (h_k+1), "
    "exact count when the group has fewer than k distinct keys — "
    "every lane, state AND estimate, hash-compared cross-engine next "
    "to the exact distinct count. Mergeable by union+distinct+re-rank "
    "(merge law pinned in tests); one (group, hash) shuffle, then a "
    "salt-bucketed two-level bottom-k so no task sorts a whole "
    "group's hash set at 100 TB.",
)
def q_kmv_distinct(spark: SparkSession, sf: str) -> DataFrame:
    from incremental_github_data_pipeline_spark.operators.incremental_agg import (
        kmv_estimate,
        kmv_sketch,
    )

    cust = T(spark, sf, "customer")
    # the sketch feeds two lanes (size + estimate): materialize its
    # groups x k rows once rather than re-scanning customer per lane
    sk = kmv_sketch(cust, "c_mktsegment", "c_custkey", k=64).localCheckpoint(
        eager=True
    )
    est = kmv_estimate(sk, "c_mktsegment", k=64)
    n = sk.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_sample")
    )
    exact = cust.groupBy("c_mktsegment").agg(
        F.countDistinct("c_custkey").cast("long").alias("exact_distinct")
    )
    return (
        n.join(est, "c_mktsegment")
        .join(exact, "c_mktsegment")
        .select("c_mktsegment", "n_sample", "kmv_est", "exact_distinct")
        .orderBy("c_mktsegment")
    )


@register(
    "q_kmv_jaccard",
    oracle=r"""
    WITH """ + _kmv_oracle_prefix("o_custkey", "orders", "o_orderpriority") + r""",
    pairs AS (
      SELECT a.g AS ga, b.g AS gb
      FROM (SELECT DISTINCT g FROM sk) a, (SELECT DISTINCT g FROM sk) b
      WHERE a.g < b.g
    ),
    un AS (
      SELECT p.ga, p.gb, s.kh,
             max(CASE WHEN s.g = p.ga THEN 1 ELSE 0 END) AS in_a,
             max(CASE WHEN s.g = p.gb THEN 1 ELSE 0 END) AS in_b
      FROM pairs p JOIN sk s ON s.g IN (p.ga, p.gb)
      GROUP BY 1, 2, 3
    ),
    bot AS (
      SELECT ga, gb, kh, in_a, in_b,
             row_number() OVER (PARTITION BY ga, gb ORDER BY kh) AS rk
      FROM un
    ),
    res AS (
      SELECT ga, gb, count(*) AS n, sum(in_a * in_b) AS common,
             max(kh) AS hk
      FROM bot WHERE rk <= 64 GROUP BY 1, 2
    )
    SELECT ga AS group_a, gb AS group_b,
           CAST(n AS BIGINT) AS sample_size,
           CAST(common AS BIGINT) AS n_common_sample,
           CAST(common * 1000000 // n AS BIGINT) AS jaccard_ppm,
           CAST(CASE WHEN n < 64 THEN n
                ELSE 135291469824 // (hk + 1) END AS BIGINT) AS est_union
    FROM res ORDER BY group_a, group_b
    """,
    doc="Sketch-only pairwise set similarity (r11, operators/"
    "incremental_agg.kmv_jaccard) — the theta-sketch trick made "
    "integer-exact: the bottom-64 of the UNION of two groups' KMV "
    "sketches is a uniform union sample, the fraction present in both "
    "estimates J(A,B) as n_common·10^6 div sample_size, and the same "
    "kth hash yields the integer union-size estimate — customer sets "
    "per order priority compared without ever joining the fact table "
    "against itself (G²·k sketch rows total, broadcast-sized). All "
    "four lanes hash-compared against a full DuckDB replay.",
)
def q_kmv_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    from incremental_github_data_pipeline_spark.operators.incremental_agg import (
        kmv_jaccard,
        kmv_sketch,
    )

    sk = kmv_sketch(
        T(spark, sf, "orders"), "o_orderpriority", "o_custkey", k=64
    )
    return kmv_jaccard(sk, "o_orderpriority", k=64).orderBy(
        "group_a", "group_b"
    )
