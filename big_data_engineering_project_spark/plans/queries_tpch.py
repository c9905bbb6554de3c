"""Join/aggregation layer over the TPC-H-ish fixtures (SURVEY.md §2.5:
the reference has no joins — this layer is the north-star extension the
testdata exists to exercise).

Plan-shape notes (verified via .explain in tests/test_plans.py):
- Dimension joins (region/nation/supplier/part) broadcast — the fact
  side is never shuffled for them.
- Fact-fact joins (orders⋈lineitem) sort-merge on the key; AQE handles
  skew at runtime.
- Semi/anti joins stay semi/anti in the physical plan (no join+distinct).
- Aggregates partial-aggregate before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_engineering_project_spark.operators.joins import (
    anti_join,
    broadcast_join,
    salted_join,
    semi_join,
)
from big_data_engineering_project_spark.plans.registry import (
    avg_via_dec,
    register,
    sum_dec,
)
from big_data_engineering_project_spark.sources.catalog import load_table


def _dec(col: str | F.Column) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,6)")


# --- TPC-H Q1: pricing summary (scan → partial agg → 4-group result) ---


@register(
    "q_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
  {sum_dec("l_quantity", "sum_qty")},
  {sum_dec("l_extendedprice", "sum_base_price")},
  {sum_dec("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
  {sum_dec("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
  {avg_via_dec("l_quantity", "avg_qty")},
  {avg_via_dec("l_extendedprice", "avg_price")},
  {avg_via_dec("l_discount", "avg_disc")},
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    doc="TPC-H Q1 pricing summary: filter → hash agg (partial+final) → sort",
    headline=True,
    tags=("tpch", "agg"),
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    cnt = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(_dec(disc_price)).cast("double").alias("sum_disc_price"),
            F.sum(_dec(charge)).cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / cnt).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / cnt).alias("avg_price"),
            (F.sum(_dec("l_discount")).cast("double") / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- TPC-H Q3-ish: shipping priority (two fact joins + topk) ---


@register(
    "q_shipping_priority",
    oracle=f"""
SELECT l_orderkey,
  {sum_dec("l_extendedprice * (1 - l_discount)", "revenue")},
  o_orderdate
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    doc="TPC-H Q3: customer⋈orders⋈lineitem, filters pushed below joins, top-10",
    headline=True,
    tags=("tpch", "join", "topk"),
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    revenue = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        # customer is small → broadcast; orders⋈lineitem is the real join.
        orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# --- TPC-H Q5-ish: revenue by nation via dimension chain ---


@register(
    "q_nation_revenue",
    oracle=f"""
SELECT n_name,
  {sum_dec("l_extendedprice * (1 - l_discount)", "revenue")}
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
    doc="TPC-H Q5-ish: fact ⋈ 3 broadcast dims, region filter pruned pre-join",
    headline=True,
    tags=("tpch", "join"),
)
def q_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # Dimension chain resolved FIRST (all tiny) → one broadcast to the
    # fact scan; lineitem is never shuffled for the joins.
    dims = (
        load_table(spark, sf_dir, "supplier")
        .join(load_table(spark, sf_dir, "nation"), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(load_table(spark, sf_dir, "region"), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .select("s_suppkey", "n_name")
    )
    revenue = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        broadcast_join(li, dims, on=[li["l_suppkey"] == dims["s_suppkey"]][0])
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


# --- Semi join: orders having a heavy lineitem (TPC-H Q4 shape) ---


@register(
    "q_orders_with_heavy_items",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_quantity > 45
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    doc="Semi join (EXISTS): left_semi — no row multiplication, no distinct",
    tags=("tpch", "join", "semi"),
)
def q_orders_with_heavy_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    heavy = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        orders.join(
            heavy, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --- Anti join: customers with no orders ---


@register(
    "q_customers_without_orders",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
""",
    doc="Anti join (NOT EXISTS): left_anti",
    tags=("tpch", "join", "anti"),
)
def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        anti_join(cust, orders, on=[F.col("c_custkey") == F.col("o_custkey")][0])
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# --- Window: top-3 orders per customer ---


@register(
    "q_top_orders_per_customer",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice,
       CAST(rn AS INTEGER) AS rnk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (
           PARTITION BY o_custkey
           ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
)
WHERE rn <= 3
ORDER BY o_custkey, rnk
""",
    doc="Ranking window: top-3 orders per customer (W1 generalized)",
    tags=("tpch", "window"),
)
def q_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
        .orderBy("o_custkey", "rnk")
    )


# --- Broadcast join: brand volume (fact ⋈ small dim) ---


@register(
    "q_brand_volume",
    oracle=f"""
SELECT p_brand, {sum_dec("l_quantity", "total_qty")}
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY total_qty DESC, p_brand
""",
    doc="Broadcast-hash join: part dim ships to executors, lineitem unshuffled",
    tags=("tpch", "join", "broadcast"),
)
def q_brand_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        broadcast_join(li, part, on=[F.col("l_partkey") == F.col("p_partkey")][0])
        .groupBy("p_brand")
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("total_qty"))
        .orderBy(F.desc("total_qty"), F.asc("p_brand"))
    )


# --- Salted join: correctness of skew mitigation (vs plain-join oracle) ---


@register(
    "q_salted_join_orders",
    oracle="""
SELECT o.o_custkey, COUNT(*) AS n_lineitems
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_custkey
ORDER BY n_lineitems DESC, o_custkey
""",
    doc="Salted join == plain join (oracle is the unsalted SQL): skew-spreading correctness",
    tags=("tpch", "join", "skew"),
)
def q_salted_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_orderkey", "key"
    )
    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "key"
    )
    joined = salted_join(li, orders, key="key", salt_buckets=8)
    return (
        joined.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_lineitems"))
        .orderBy(F.desc("n_lineitems"), F.asc("o_custkey"))
    )


# --- TPC-H Q6: single-row forecast aggregate (pure scan-filter-agg) ---


@register(
    "q_revenue_forecast",
    oracle=f"""
SELECT {sum_dec("l_extendedprice * l_discount", "revenue")}
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
""",
    doc="TPC-H Q6: tight filter → 1-row aggregate, every predicate pushed to scan",
    tags=("tpch", "agg"),
)
def q_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(_dec(F.col("l_extendedprice") * F.col("l_discount")))
        .cast("double")
        .alias("revenue")
    )


# --- TPC-H Q10-ish: returned-item revenue per customer, top-20 ---


@register(
    "q_returned_items",
    oracle=f"""
SELECT c_custkey, c_name,
  {sum_dec("l_extendedprice * (1 - l_discount)", "revenue")},
  c_acctbal
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    doc="TPC-H Q10: returned-item revenue per customer, broadcast dim + top-20",
    tags=("tpch", "join", "topk"),
)
def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    revenue = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --- Shared-dialect SQL entry point: ONE string runs on Spark AND DuckDB ---

_SHARED_CTE_SQL = """
WITH heavy AS (
  SELECT l_orderkey, SUM(l_quantity) AS total_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(l_quantity) > 250
)
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM heavy WHERE heavy.l_orderkey = o_orderkey)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register(
    "q_heavy_orders_sql",
    oracle=_SHARED_CTE_SQL,
    doc="CTE + HAVING + correlated EXISTS as ONE shared SQL text (Spark SQL ≡ DuckDB)",
    tags=("tpch", "sql", "semi"),
)
def q_heavy_orders_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("orders", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_SHARED_CTE_SQL)


# --- Analytic window functions: lag / lead / rank / dense_rank ---


@register(
    "q_order_history_analytics",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice,
  lag(o_totalprice) OVER w AS prev_price,
  lead(o_totalprice) OVER w AS next_price,
  CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS INTEGER) AS price_rank,
  CAST(dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS INTEGER) AS prio_rank
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderkey
""",
    doc="Analytic windows: lag/lead over order history + rank/dense_rank (W-layer completeness)",
    tags=("tpch", "window"),
)
def q_order_history_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wr = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"))
    wd = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.rank().over(wr).alias("price_rank"),
        F.dense_rank().over(wd).alias("prio_rank"),
    ).orderBy("o_custkey", "o_orderkey")


# --- Frame-based moving aggregate: ROWS BETWEEN 2 PRECEDING AND CURRENT ---


@register(
    "q_moving_avg_spend",
    oracle="""
SELECT o_custkey, o_orderkey,
  AVG(o_totalprice) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg
FROM orders
ORDER BY o_custkey, o_orderkey
""",
    doc="Explicit rowsBetween frame: 3-order moving average per customer",
    tags=("tpch", "window"),
)
def q_moving_avg_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.avg("o_totalprice").over(w).alias("moving_avg"),
    ).orderBy("o_custkey", "o_orderkey")


# --- Left outer join with COALESCE'd counts (customers incl. zero orders) ---


@register(
    "q_customer_order_counts",
    oracle="""
SELECT c_custkey, c_mktsegment, COUNT(o_orderkey) AS n_orders
FROM customer
LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey, c_mktsegment
ORDER BY c_custkey
""",
    doc="Left outer join: order counts per customer including zeroes",
    tags=("tpch", "join", "outer"),
)
def q_customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
    )
