"""Extended TPC-H-style coverage (adapted to the driver tables'
trimmed schemas — no partsupp/commitdate/shipmode columns, so Q2/Q12
take the nearest expressible form). Exercises the join/agg shapes the
basic suite doesn't: exists/not-exists semi-joins, correlated per-group
thresholds, having-in-subquery, multi-branch OR predicates, and scalar
subquery thresholds — all with exact-decimal aggregation so values
hash-match DuckDB (see queries/__init__).

Physical notes at scale: bounded dims (part slices, nation, region)
carry broadcast hints; customer and orders grow with SF so their join
strategy is left to AQE (broadcast when small, shuffle-hash beyond the
threshold); lineitem↔orders joins shuffle on the order key with AQE
handling skew;
the Q17/Q18 per-key thresholds are window/grouped pre-aggregations that
reuse the same key shuffle as the subsequent join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from incremental_github_data_pipeline_spark.queries import register
from incremental_github_data_pipeline_spark.queries.relational import dsum, revenue
from incremental_github_data_pipeline_spark.sources.readers import read_table as T


@register(
    "q04_order_priority",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 (adapted: ship-after-order instead of the absent "
    "commit/receipt dates): EXISTS → left-semi join, then count per "
    "priority.",
)
def q04_order_priority(spark: SparkSession, sf: str) -> DataFrame:
    o, li = T(spark, sf, "orders"), T(spark, sf, "lineitem")
    late = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"]) & (li["l_shipdate"] > o["o_orderdate"]),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q06_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6: pure scan-filter-aggregate; every predicate pushes to "
    "the parquet scan, no shuffle beyond the final 1-row combine.",
)
def q06_forecast_revenue(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(12,2)")
            * F.col("l_discount").cast("decimal(4,2)")
        )
        .cast("double")
        .alias("revenue")
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1-l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    doc="TPC-H Q10: fact-fact join on orderkey + two broadcast dims, "
    "top-20 by aggregated revenue.",
)
def q10_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    c, o, li, n = (
        T(spark, sf, "customer"),
        T(spark, sf, "orders"),
        T(spark, sf, "lineitem"),
        T(spark, sf, "nation"),
    )
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(revenue("l_extendedprice", ("l_discount", -1)).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q12_late_shipments",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                         THEN 1 ELSE 0 END) AS BIGINT) AS late_count,
           CAST(COUNT(*) AS BIGINT) AS total_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="TPC-H Q12 (adapted: lateness = shipped >60 days after order, "
    "no shipmode column): join + conditional aggregation.",
)
def q12_late_shipments(spark: SparkSession, sf: str) -> DataFrame:
    o, li = T(spark, sf, "orders"), T(spark, sf, "lineitem")
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"), 1
    ).otherwise(0)
    return (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.sum(late).cast("long").alias("late_count"),
            F.count(F.lit(1)).alias("total_count"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q14_promo_revenue",
    oracle="""
    SELECT CAST(100.00 * SUM(CASE WHEN p_type LIKE 'PROMO%'
                 THEN CAST(l_extendedprice AS DECIMAL(12,2))
                      * CAST(1-l_discount AS DECIMAL(4,2)) ELSE 0 END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * CAST(1-l_discount AS DECIMAL(4,2))) AS DOUBLE)
           AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    """,
    doc="TPC-H Q14: broadcast part dim, conditional numerator over the "
    "same exact-decimal aggregate as the denominator.",
)
def q14_promo_revenue(spark: SparkSession, sf: str) -> DataFrame:
    li, p = T(spark, sf, "lineitem"), T(spark, sf, "part")
    disc_price = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1.0) - F.col("l_discount")
    ).cast("decimal(4,2)")
    promo = F.when(F.col("p_type").like("PROMO%"), disc_price).otherwise(F.lit(0))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.00) * F.sum(promo).cast("double")
                / F.sum(disc_price).cast("double")
            ).alias("promo_revenue")
        )
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,8))) AS DOUBLE) / 7.0
           AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (
        SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = lineitem.l_partkey)
    """,
    doc="TPC-H Q17: correlated per-part threshold. The correlated scalar "
    "subquery becomes a window average over l_partkey — one shuffle, "
    "reused by nothing else, instead of a re-scan per row.",
)
def q17_small_quantity_revenue(spark: SparkSession, sf: str) -> DataFrame:
    li, p = T(spark, sf, "lineitem"), T(spark, sf, "part")
    w = Window.partitionBy("l_partkey")
    li2 = li.withColumn("_avg_qty", F.avg("l_quantity").over(w))
    return (
        li2.join(
            p.filter(F.col("p_brand") == "Brand#23"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .filter(F.col("l_quantity") < 0.2 * F.col("_avg_qty"))
        .agg((dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )


@register(
    "q18_large_orders",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(25,8))) AS DOUBLE) AS total_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > 210)
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
    doc="TPC-H Q18: having-in-subquery → grouped pre-aggregate + semi "
    "join; the group-by and the join share the l_orderkey shuffle.",
)
def q18_large_orders(spark: SparkSession, sf: str) -> DataFrame:
    c, o, li = T(spark, sf, "customer"), T(spark, sf, "orders"), T(spark, sf, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 210)
        .select("l_orderkey")
    )
    return (
        li.join(big.withColumnRenamed("l_orderkey", "_ok"), F.col("l_orderkey") == F.col("_ok"), "left_semi")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity").alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@register(
    "q19_discounted_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1-l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19: multi-branch OR predicate across both join sides — "
    "Catalyst extracts the common p_partkey equi-key and keeps the OR "
    "as a post-join filter.",
)
def q19_discounted_revenue(spark: SparkSession, sf: str) -> DataFrame:
    li, p = T(spark, sf, "lineitem"), T(spark, sf, "part")
    branch = lambda brand, sz_hi, q_lo, q_hi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, sz_hi)
        & F.col("l_quantity").between(q_lo, q_hi)
    )
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .filter(
            branch("Brand#12", 5, 1, 11)
            | branch("Brand#23", 10, 10, 20)
            | branch("Brand#34", 15, 20, 30)
        )
        .agg(revenue("l_extendedprice", ("l_discount", -1)).alias("revenue"))
    )


@register(
    "q22_idle_customers",
    oracle="""
    WITH stats AS (
      SELECT CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS BIGINT) AS cents,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM customer WHERE c_acctbal > 0
    )
    SELECT n_name, CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(25,8))) AS DOUBLE) AS totacctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey, stats
    WHERE CAST(ROUND(c_acctbal*100) AS BIGINT) * stats.n > stats.cents
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY n_name ORDER BY n_name
    """,
    doc="TPC-H Q22 (adapted: nation instead of the absent phone prefix, "
    "and 'idle' = no order since 1999 — every synthetic customer has "
    "SOME order): scalar-subquery threshold + NOT EXISTS anti-join. The "
    "above-average comparison runs in exact integer cents (bal*n > sum) "
    "so the boundary set is engine-independent — comparing against a "
    "double average is not portable.",
)
def q22_idle_customers(spark: SparkSession, sf: str) -> DataFrame:
    c, n, o = T(spark, sf, "customer"), T(spark, sf, "nation"), T(spark, sf, "orders")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    stats = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            F.sum(cents).alias("_cents"),
            F.count(F.lit(1)).alias("_n"),
        )
    )
    return (
        c.crossJoin(F.broadcast(stats))
        .filter(cents * F.col("_n") > F.col("_cents"))
        .join(
            o.filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("n_name")
    )
