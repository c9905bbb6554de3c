"""Decision-support suite completion: schema-adapted analogs of the
remaining TPC-H query shapes (SURVEY.md §2.5's north-star join layer).

The fixture schema is a TPC-H SUBSET (no partsupp, no commit/receipt
dates, no comments), so each query here keeps the REFERENCE SHAPE of
its TPC-H number — the join topology, the subquery class, the
aggregate structure — with predicates adapted to the columns that
exist. The point is plan coverage: nation-pair self-join (Q7),
case-sum market share (Q8), multi-dim profit rollup (Q9), scalar
subquery threshold (Q11), lateness buckets (Q12), two-level grouped
distribution (Q13), conditional ratio (Q14), argmax-equality join
(Q15), distinct-count variety (Q16), correlated-average threshold
(Q17), disjunctive predicate pushdown (Q19), HAVING-semi-join chain
(Q20), multi-pass same-table analysis (Q21), anti-join + scalar
subquery (Q22), per-group argmin (Q2).

Determinism follows registry rules: decimal-stabilized sums, total
orders with unique tiebreakers, ratios as one double division of two
exact decimal sums (both engines perform the identical IEEE op).

Plan-shape notes (audited via .explain, pinned for the load-bearing
ones in tests/test_plans.py):
- Every dimension (part/supplier/nation/customer at fixture scale)
  broadcasts; the lineitem/orders fact tables never shuffle for a
  dim join.
- Scalar thresholds (Q11 total, Q15 max, Q17 per-part avg, Q22 avg
  acctbal) are 1-row or bounded aggregates broadcast back — never a
  driver collect.
- Q21 computes all per-order statistics in ONE aggregation pass over
  lineitem, then one fact-fact join back — not three self-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_engineering_project_spark.plans.registry import (
    avg_via_dec,  # noqa: F401  (re-exported convention; used by siblings)
    register,
    sum_dec,
)
from big_data_engineering_project_spark.sources.catalog import load_table


def _dec(col: str | F.Column) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,6)")


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp")


_REV = "l_extendedprice * (1 - l_discount)"


def _rev() -> F.Column:
    return _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))


# --- Q7: volume shipping between a nation pair --------------------------------


@register(
    "q_volume_shipping",
    headline=True,
    oracle=f"""
SELECT supp_nation, cust_nation, l_year, {sum_dec("volume", "revenue")}
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INTEGER) AS l_year,
         {_REV} AS volume
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
     OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18')
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
    doc="TPC-H Q7 shape: nation-pair trade volume by year — the one "
    "fact-fact join (lineitem⋈orders) sort-merges; supplier+nation and "
    "customer+nation resolve to 2-column broadcast maps FILTERED to the "
    "two nations first, so the disjunctive pair predicate drops "
    "non-matching rows at the broadcast probe, not after a wide join",
    tags=("tpch", "join"),
)
def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    nations = ("NATION_18", "NATION_19")
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_name").isin(*nations))
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cus = (
        load_table(spark, sf_dir, "customer")
        .join(nat, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pair = (
        (F.col("supp_nation") == nations[0]) & (F.col("cust_nation") == nations[1])
    ) | ((F.col("supp_nation") == nations[1]) & (F.col("cust_nation") == nations[0]))
    return (
        # BOTH fact sides pre-prune via their broadcast dim (to ~2/25
        # of rows each) BEFORE the fact-fact sort-merge — the orders⋈
        # customer broadcast runs below the big join, not above it.
        li.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            orders.join(F.broadcast(cus), F.col("o_custkey") == F.col("c_custkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --- Q8: national market share in a regional market ---------------------------


@register(
    "q_market_share",
    oracle=f"""
SELECT o_year,
  CAST(SUM(CASE WHEN supp_nation = 'NATION_5'
                THEN CAST(volume AS DECIMAL(18,6)) ELSE 0 END) AS DOUBLE)
  / CAST(SUM(CAST(volume AS DECIMAL(18,6))) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         {_REV} AS volume,
         n1.n_name AS supp_nation
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region   ON n2.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN part     ON l_partkey = p_partkey
  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
) all_nations
GROUP BY o_year
ORDER BY o_year
""",
    doc="TPC-H Q8 shape: NATION_5's share of the ASIA ECONOMY-part "
    "market per year. share = CASE-sum / sum as ONE double division of "
    "two exact decimal sums (combine-order-proof on both engines). The "
    "customer→nation→region chain folds to a broadcast set of ASIA "
    "custkeys; part filter broadcast-prunes the lineitem scan",
    tags=("tpch", "join", "agg"),
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = load_table(spark, sf_dir, "nation")
    asia_cust = (
        load_table(spark, sf_dir, "customer")
        .join(nat, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(
            load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    econ_parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem")
    vol = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    national = F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(
        F.lit(0).cast("decimal(18,6)")
    )
    return (
        li.join(F.broadcast(econ_parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(asia_cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(national).cast("double") / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# --- Q9: product-type profit by nation and year -------------------------------


@register(
    "q_product_profit",
    oracle=f"""
SELECT n_name AS nation, o_year, {sum_dec("amount", "sum_profit")}
FROM (
  SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS o_year,
         l_extendedprice * (1 - l_discount)
           - p_retailprice * l_quantity AS amount
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN part     ON l_partkey = p_partkey
  WHERE p_name LIKE '%widget%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year
""",
    doc="TPC-H Q9 shape: profit (revenue − retail cost proxy; the "
    "fixture has no partsupp) on '%widget%' parts by supplier nation "
    "and order year. Part filter + supplier→nation both broadcast; "
    "lineitem⋈orders is the only exchange before the group-by",
    tags=("tpch", "join", "agg"),
)
def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(
            load_table(spark, sf_dir, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem")
    amount = _dec(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
        .orderBy("nation", "o_year")
    )


# --- Q11: important parts (scalar-subquery threshold) -------------------------

_Q11_FRACTION = "0.0005"


@register(
    "q_important_parts",
    oracle=f"""
SELECT l_partkey, {sum_dec(_REV, "part_value")}
FROM lineitem
GROUP BY l_partkey
HAVING CAST(SUM(CAST({_REV} AS DECIMAL(18,6))) AS DOUBLE) >
  {_Q11_FRACTION} * (
    SELECT CAST(SUM(CAST({_REV} AS DECIMAL(18,6))) AS DOUBLE) FROM lineitem)
ORDER BY part_value DESC, l_partkey
""",
    doc="TPC-H Q11 shape: parts holding more than a fixed fraction of "
    "total revenue. The scalar subquery is a 1-row aggregate broadcast "
    "into the HAVING filter (never a driver collect); both sides of the "
    "threshold are doubles cast from exact decimal sums, so the "
    "comparison is combine-order-proof cross-engine",
    tags=("tpch", "agg", "subquery"),
)
def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(_rev()).cast("double").alias("part_value")
    )
    total = li.agg(F.sum(_rev()).cast("double").alias("__total"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_value") > float(_Q11_FRACTION) * F.col("__total"))
        .select("l_partkey", "part_value")
        .orderBy(F.desc("part_value"), F.asc("l_partkey"))
    )


# --- Q12: shipping lateness buckets vs order priority -------------------------


@register(
    "q_late_shipment_priority",
    oracle="""
SELECT lateness,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM (
  SELECT o_orderpriority,
    CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                        CAST(l_shipdate AS DATE)) > 90 THEN 'late>90d'
         WHEN date_diff('day', CAST(o_orderdate AS DATE),
                        CAST(l_shipdate AS DATE)) > 30 THEN 'late31-90d'
         ELSE 'ontime<=30d' END AS lateness
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  WHERE l_shipdate > o_orderdate
)
GROUP BY lateness
ORDER BY lateness
""",
    doc="TPC-H Q12 shape (no l_shipmode in the fixture — buckets are "
    "ship-lateness days instead): integer day arithmetic on both "
    "engines, priority split as two CASE-sums in one aggregation pass "
    "over the one fact-fact join",
    tags=("tpch", "join", "agg"),
)
def q_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    lateness = (
        F.when(delay > 90, "late>90d")
        .when(delay > 30, "late31-90d")
        .otherwise("ontime<=30d")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy(lateness.alias("lateness"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("lateness")
    )


# --- Q13: customer order-count distribution -----------------------------------


@register(
    "q_custdist",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    doc="TPC-H Q13: two-level aggregation — orders per customer "
    "(left join keeps zero-order customers), then the distribution of "
    "those counts. Second group-by input is one row per customer, so "
    "the second exchange is already small",
    tags=("tpch", "join", "agg"),
)
def q_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    per_cust = (
        cust.join(orders, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# --- Q14: promo revenue ratio -------------------------------------------------


@register(
    "q_promo_revenue",
    oracle=f"""
SELECT
  100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
    THEN CAST({_REV} AS DECIMAL(18,6)) ELSE 0 END) AS DOUBLE)
  / CAST(SUM(CAST({_REV} AS DECIMAL(18,6))) AS DOUBLE) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
""",
    doc="TPC-H Q14: PROMO-part share of 1997 revenue — broadcast part "
    "join, one aggregation, ratio as a single double division of exact "
    "decimal sums",
    tags=("tpch", "join", "agg"),
)
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    vol = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    promo = F.when(F.col("p_type") == "PROMO", vol).otherwise(
        F.lit(0).cast("decimal(18,6)")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(vol).cast("double")
            ).alias("promo_revenue")
        )
    )


# --- Q15: top supplier (argmax via equality join on an exact sum) -------------


@register(
    "q_top_supplier",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, {sum_dec(_REV, "total_revenue")}
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
""",
    doc="TPC-H Q15: supplier(s) with max quarterly revenue. The max is "
    "a 1-row aggregate of the (already small) per-supplier revenue "
    "table, broadcast back for an equality filter — exact because the "
    "compared doubles both come from the same decimal sums. Keeps ties "
    "(per spec) instead of row_number-picking one",
    tags=("tpch", "join", "subquery", "topk"),
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-04-01 00:00:00"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev()).cast("double").alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("__max_rev"))
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__max_rev"))
        .join(F.broadcast(sup), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# --- Q16: part-supplier variety (distinct-count rollup) -----------------------


@register(
    "q_part_supplier_variety",
    oracle="""
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
    doc="TPC-H Q16 shape (supplier variety observed via lineitem — the "
    "fixture has no partsupp): NOT-equal + IN-list filters on the "
    "broadcast part dim, COUNT(DISTINCT) as Spark's two-phase distinct "
    "aggregate (partial dedup map-side, no pre-distinct() exchange)",
    tags=("tpch", "join", "agg"),
)
def q_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"), F.asc("p_size")
        )
    )


# --- Q17: small-quantity-order revenue (correlated average) -------------------


@register(
    "q_small_qty_revenue",
    oracle=f"""
WITH brand_parts AS (
  SELECT p_partkey FROM part WHERE p_brand = 'Brand#3'
),
part_avg AS (
  SELECT l_partkey,
         0.5 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                / COUNT(*)) AS qty_cap
  FROM lineitem JOIN brand_parts ON l_partkey = p_partkey
  GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0
  AS avg_yearly
FROM lineitem JOIN part_avg USING (l_partkey)
WHERE l_quantity < qty_cap
""",
    doc="TPC-H Q17: revenue from orders below half the part's average "
    "quantity (0.2→0.5 so the fixture's uniform quantities yield rows). "
    "The correlated per-part average decorrelates to a bounded "
    "aggregate broadcast back onto the scan; the cap is one double "
    "multiply of an exact decimal average on both engines",
    tags=("tpch", "join", "agg", "subquery"),
)
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    brand_parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#3")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    li_brand = li.join(
        F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey")
    )
    part_avg = li_brand.groupBy("l_partkey").agg(
        (
            F.lit(0.5)
            * (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1)))
        ).alias("qty_cap")
    )
    return (
        li.join(F.broadcast(part_avg), "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_cap"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


# --- Q19: disjunctive brand/size/quantity revenue -----------------------------


@register(
    "q_disjunctive_revenue",
    oracle=f"""
SELECT {sum_dec(_REV, "revenue")}
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 20 AND l_quantity <= 30)
""",
    doc="TPC-H Q19: OR-of-AND predicate triplets across both join "
    "sides. The part-only disjunction (brand+size) is pre-applied to "
    "the broadcast dim so the probe drops non-candidate rows early; "
    "the mixed predicate evaluates post-join inside codegen",
    tags=("tpch", "join", "agg"),
)
def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    # Part-side-only disjunction: prune the broadcast build side first.
    part = part.filter(
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#20") & F.col("p_size").between(1, 15))
    )
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & (q >= 1) & (q <= 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & (q >= 10) & (q <= 20))
        | ((F.col("p_brand") == "Brand#20") & F.col("p_size").between(1, 15)
           & (q >= 20) & (q <= 30))
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


# --- Q20: excess shippers of a part class (HAVING → semi-join chain) ----------


@register(
    "q_excess_shippers",
    oracle=f"""
WITH red_parts AS (
  SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
),
shipped AS (
  SELECT l_suppkey, {sum_dec("l_quantity", "qty")}
  FROM lineitem JOIN red_parts ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_suppkey
  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) > 100.0
)
SELECT s_suppkey, s_name
FROM supplier
WHERE EXISTS (SELECT 1 FROM shipped WHERE l_suppkey = s_suppkey)
ORDER BY s_suppkey
""",
    doc="TPC-H Q20 shape: suppliers who shipped >100 units of 'red%' "
    "parts in 1997 — broadcast part prefilter → grouped HAVING → "
    "left-semi join into supplier (stays semi in the physical plan, "
    "no row multiplication)",
    tags=("tpch", "join", "semi", "subquery"),
)
def q_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    red_parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    shipped = (
        li.join(F.broadcast(red_parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("qty"))
        .filter(F.col("qty") > 100.0)
        .select("l_suppkey")
    )
    sup = load_table(spark, sf_dir, "supplier")
    return (
        sup.join(shipped, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# --- Q21: the supplier every other shipper waited for -------------------------


@register(
    "q_blocking_suppliers",
    headline=True,
    oracle="""
WITH per_so AS (
  SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS s_max
  FROM lineitem
  GROUP BY l_orderkey, l_suppkey
),
flagged AS (
  SELECT l_orderkey, l_suppkey, s_max,
         MAX(s_max)  OVER (PARTITION BY l_orderkey) AS max_ship,
         COUNT(*)    OVER (PARTITION BY l_orderkey) AS n_supp
  FROM per_so
),
flagged2 AS (
  SELECT *, SUM(CASE WHEN s_max = max_ship THEN 1 ELSE 0 END)
              OVER (PARTITION BY l_orderkey) AS n_at_max
  FROM flagged
)
SELECT s_name, COUNT(*) AS numwait
FROM flagged2 JOIN supplier ON l_suppkey = s_suppkey
WHERE n_supp > 1 AND n_at_max = 1 AND s_max = max_ship
GROUP BY s_name
ORDER BY numwait DESC, s_name
""",
    doc="TPC-H Q21 shape (lateness redefined as last-to-ship — the "
    "fixture has no receipt/commit dates): for multi-supplier orders "
    "where exactly ONE supplier shipped last, count the orders each "
    "supplier blocked. Lineitem first collapses to one row per "
    "(order, supplier) in a partial-aggregated pass — the only "
    "event-sized exchange; the per-order windows then run over that "
    "bounded frame (suppliers-per-order rows), not raw lineitems, and "
    "reuse its partitioning (no extra shuffle). No triple self-join",
    tags=("tpch", "join", "window", "agg"),
)
def q_blocking_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE exchange for collapse + both windows: partitioning by
    # l_orderkey alone satisfies the (l_orderkey, l_suppkey) group-by
    # clustering AND the per-order windows, so the explicit repartition
    # replaces two narrower exchanges (partial-agg shuffle + window
    # re-shuffle). The trade: the single exchange carries raw
    # (order, supplier, date) rows with no map-side combine — the right
    # side of the trade here because lineitems per (order, supplier)
    # is small (~1-2) at every scale, so combine would shrink the
    # shuffle barely while the second exchange doubles it. Measured
    # 2.0× at sf0.1 (1.5 s → 0.75 s).
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .repartition("l_orderkey")
    )
    per_so = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("s_max")
    )
    w = Window.partitionBy("l_orderkey")
    flagged = per_so.select(
        "l_orderkey",
        "l_suppkey",
        "s_max",
        F.max("s_max").over(w).alias("max_ship"),
        F.count(F.lit(1)).over(w).alias("n_supp"),
    ).withColumn(
        "n_at_max",
        F.sum(
            F.when(F.col("s_max") == F.col("max_ship"), 1).otherwise(0)
        ).over(w),
    )
    blocking = flagged.filter(
        (F.col("n_supp") > 1)
        & (F.col("n_at_max") == 1)
        & (F.col("s_max") == F.col("max_ship"))
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        blocking.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
    )


# --- Q22: wealthy inactive customers (anti join + scalar subquery) ------------


@register(
    "q_wealthy_inactive",
    oracle=f"""
WITH cutoff AS (
  SELECT {avg_via_dec("c_acctbal", "avg_bal")}
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c_mktsegment, COUNT(*) AS numcust,
  {sum_dec("c_acctbal", "totacctbal")}
FROM customer, cutoff
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
    doc="TPC-H Q22 shape (market segment stands in for the phone "
    "country code; 'no orders' becomes 'no orders since 2000' — every "
    "fixture customer has SOME order): customers with above-average "
    "positive balance gone inactive. Scalar average broadcast + "
    "left-anti join against the date-filtered orders (filter pushed "
    "below the anti join), then a 5-group rollup",
    tags=("tpch", "join", "anti", "subquery"),
)
def q_wealthy_inactive(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    cutoff = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= _ts("2000-01-01 00:00:00"))
        .select("o_custkey")
    )
    return (
        cust.join(F.broadcast(cutoff))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


# --- Q2-ish: cheapest supplier per part (per-group argmin) --------------------


@register(
    "q_min_cost_supplier",
    oracle="""
SELECT p_partkey, p_name, s_suppkey, s_name, unit_price
FROM (
  SELECT l_partkey AS p_partkey, l_suppkey,
         l_extendedprice * (1 - l_discount) / l_quantity AS unit_price,
         ROW_NUMBER() OVER (
           PARTITION BY l_partkey
           ORDER BY l_extendedprice * (1 - l_discount) / l_quantity ASC,
                    l_suppkey ASC, l_orderkey ASC, l_linenumber ASC) AS rn
  FROM lineitem
  WHERE l_quantity > 0
) best
JOIN part USING (p_partkey)
JOIN supplier ON best.l_suppkey = s_suppkey
WHERE rn = 1 AND p_size <= 3
ORDER BY p_partkey
""",
    doc="TPC-H Q2 shape (observed unit price stands in for partsupp "
    "supplycost): the cheapest observed supplier per part in a size "
    "slice. Per-part argmin via a bounded ranking window with a total "
    "tiebreak (price, suppkey, orderkey, linenumber — engine-"
    "independent pick); part/supplier resolve via broadcast AFTER the "
    "winner is chosen, so dims join one row per part, not every "
    "lineitem",
    tags=("tpch", "join", "window"),
)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    unit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount")) / F.col("l_quantity")
    )
    w = Window.partitionBy("l_partkey").orderBy(
        unit.asc(), F.col("l_suppkey").asc(), F.col("l_orderkey").asc(),
        F.col("l_linenumber").asc(),
    )
    best = (
        li.select(
            F.col("l_partkey").alias("p_partkey"),
            "l_suppkey",
            unit.alias("unit_price"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 3).select(
        "p_partkey", "p_name"
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        best.join(F.broadcast(part), "p_partkey")
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "unit_price")
        .orderBy("p_partkey")
    )


# --- Bloom-pruned semi join (explicit runtime-filter pattern) -----------------


@register(
    "q_bloom_semi_orders",
    headline=True,
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_quantity > 49
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    doc="Bloom-pruned semi join ≡ plain semi join (the oracle is the "
    "unpruned EXISTS): the heavy-lineitem orderkey set compresses to "
    "an 8-KiB broadcast bitmap that drops non-matching orders BEFORE "
    "the exact semi-join exchange; false positives die in the exact "
    "join, false negatives cannot exist, so the gate proves the "
    "whole operator every round (operators/bloom.py — the explicit, "
    "storable form of engine-injected runtime filters)",
    tags=("tpch", "join", "semi", "sketch"),
)
def q_bloom_semi_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_engineering_project_spark.operators.bloom import (
        bloom_semi_join,
    )

    orders = load_table(spark, sf_dir, "orders")
    heavy = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 49)
        .select(F.col("l_orderkey").alias("bk"))
    )
    return (
        bloom_semi_join(orders, heavy, "o_orderkey", "bk")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --- ROLLUP / grouping sets (multi-level OLAP aggregation) --------------------


@register(
    "q_revenue_rollup",
    oracle=f"""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
         AS gid,
       {sum_dec(_REV, "revenue")},
       COUNT(*) AS n_items
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY gid, returnflag, linestatus
""",
    doc="ROLLUP grouping sets: (flag, status) → (flag) → () in ONE "
    "aggregation pass — Spark's Expand feeds each input row to every "
    "grouping set before the partial aggregate, so the three levels "
    "cost one exchange, not three scans; GROUPING() bits disambiguate "
    "NULL-as-total from NULL-as-value on both engines",
    tags=("tpch", "agg", "rollup"),
)
def q_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    gid = (
        F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus")
    ).cast("long")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            gid.alias("gid"),
            F.sum(_rev()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "gid",
            "revenue",
            "n_items",
        )
        .orderBy("gid", "returnflag", "linestatus")
    )


# --- PIVOT (wide conditional aggregation) -------------------------------------

_PIVOT_SEGS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")


@register(
    "q_pivot_segment_priority",
    oracle=f"""
SELECT o_orderpriority,
  {", ".join(f'''CAST(SUM(CASE WHEN c_mktsegment = '{s}'
     THEN CAST(o_totalprice AS DECIMAL(18,6)) ELSE 0 END) AS DOUBLE)
     AS {s.lower()}''' for s in _PIVOT_SEGS)}
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    doc="PIVOT: order totals as priority × market-segment matrix. "
    "Spark's pivot with an EXPLICIT value list compiles to exactly the "
    "conditional case-sum aggregation the oracle spells out — one "
    "pass, one exchange, no per-segment scans (an implicit pivot "
    "would add a distinct-values collect; the explicit list is the "
    "scale form). Decimal-stabilized sums per cell",
    tags=("tpch", "agg", "pivot"),
)
def q_pivot_segment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = orders.join(
        F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
    )
    pivoted = (
        joined.groupBy("o_orderpriority")
        .pivot("c_mktsegment", list(_PIVOT_SEGS))
        .agg(
            F.coalesce(F.sum(_dec("o_totalprice")), F.lit(0).cast("decimal(18,6)"))
            .cast("double")
        )
    )
    renamed = pivoted.select(
        "o_orderpriority",
        *[F.col(s).alias(s.lower()) for s in _PIVOT_SEGS],
    )
    return renamed.orderBy("o_orderpriority")


# --- Sharded exact top-k per key (hot-key-safe ranking) -----------------------


@register(
    "q_topk_lineitems_sharded",
    oracle="""
SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
       CAST(rn AS INTEGER) AS rnk
FROM (
  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
         ROW_NUMBER() OVER (
           PARTITION BY l_suppkey
           ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC)
           AS rn
  FROM lineitem
)
WHERE rn <= 2
ORDER BY l_suppkey, rnk
""",
    doc="Sharded exact top-k per key, proven ≡ the plain ranking "
    "window (the oracle IS the plain ROW_NUMBER form): level 1 ranks "
    "inside (key, hash-shard) partitions — a hot key's rows spread "
    "across n_shards tasks instead of one — level 2 re-ranks the "
    "≤ n_shards·k survivors per key. The ranking twin of the salted "
    "as-of/KMV two-level pattern: same answer, bounded partitions. "
    "Total tiebreak (price, orderkey, linenumber) keeps the selected "
    "set engine-independent",
    tags=("tpch", "window", "skew"),
)
def q_topk_lineitems_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    k, n_shards = 2, 16
    order = [
        F.desc("l_extendedprice"),
        F.asc("l_orderkey"),
        F.asc("l_linenumber"),
    ]
    shard = F.pmod(
        F.xxhash64("l_orderkey", "l_linenumber"), F.lit(n_shards)
    )
    w1 = Window.partitionBy("l_suppkey", shard).orderBy(*order)
    survivors = (
        li.withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
    w2 = Window.partitionBy("l_suppkey").orderBy(*order)
    return (
        survivors.withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= k)
        .orderBy("l_suppkey", "rnk")
    )


# --- FULL OUTER join (reconciliation shape) -----------------------------------


@register(
    "q_full_outer_user_activity",
    oracle="""
WITH clicks AS (
  SELECT user_id, COUNT(*) AS n_clicks FROM events
  WHERE event_type = 'click' GROUP BY user_id
),
buys AS (
  SELECT user_id, COUNT(*) AS n_buys FROM events
  WHERE event_type = 'purchase' GROUP BY user_id
)
SELECT COALESCE(c.user_id, b.user_id) AS user_id,
       COALESCE(c.n_clicks, 0) AS n_clicks,
       COALESCE(b.n_buys, 0) AS n_buys
FROM clicks c FULL OUTER JOIN buys b ON c.user_id = b.user_id
ORDER BY user_id
""",
    doc="FULL OUTER join (reconciliation): per-user click vs purchase "
    "counts with zero-fill on both sides — completes the §2.5 join-"
    "type matrix (inner/left/semi/anti/full). Both inputs pre-"
    "aggregate to user cardinality before the join, so the full-outer "
    "exchange carries counters, not events",
    tags=("tpch", "join", "outer"),
)
def q_full_outer_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def per_user(t: str, alias: str):
        return (
            ev.filter(F.col("event_type") == t)
            .groupBy(F.col("user_id").alias(f"{alias}_user"))
            .agg(F.count(F.lit(1)).alias(f"n_{alias}"))
        )

    c, b = per_user("click", "clicks"), per_user("purchase", "buys")
    return (
        c.join(b, c["clicks_user"] == b["buys_user"], "full_outer")
        .select(
            F.coalesce("clicks_user", "buys_user").alias("user_id"),
            F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
            F.coalesce("n_buys", F.lit(0)).alias("n_buys"),
        )
        .orderBy("user_id")
    )


# --- Remaining analytic windows: ntile / percent_rank / cume_dist -------------


@register(
    "q_value_rank_distribution",
    oracle="""
SELECT event_id, event_type,
       CAST(ntile(4) OVER w AS INTEGER) AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY "value" ASC, event_id ASC)
ORDER BY event_id
""",
    doc="Analytic-window completion: ntile / percent_rank / cume_dist "
    "per event type over a TOTAL order (value, event_id) — "
    "percent_rank = (rank−1)/(n−1) and cume_dist = peers/n are single "
    "integer divisions, identical IEEE on both engines given the "
    "engine-independent rank. Scale note (r7 hot-key audit): the "
    "per-type partition materializes a type's ENTIRE total order in "
    "one window partition — INHERENT to exact global-rank semantics "
    "(rank r needs the count of everything before r), not a plan "
    "choice; no runtime can split it without a prefix-sum pass. At "
    "100 TB ask a bounded question instead: sharded top-k "
    "(q_topk_lineitems_sharded) for extremes, histogram/HDR sketches "
    "(q_histogram_quantile_merge, q_hdr_quantile_merge) for ranks at "
    "bounded error, both gate-proven",
    tags=("reference", "window"),
)
def q_value_rank_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("event_type").orderBy(
        F.asc("value"), F.asc("event_id")
    )
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "event_type",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    ).orderBy("event_id")


# --- CUBE (all grouping-set combinations) -------------------------------------


@register(
    "q_revenue_cube",
    oracle=f"""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
         AS gid,
       {sum_dec(_REV, "revenue")}
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY gid, returnflag, linestatus
""",
    doc="CUBE grouping sets: all four combinations — (flag,status), "
    "(flag), (status), () — in the same single Expand pass ROLLUP "
    "uses (×4 row replication before the partial aggregate, one "
    "exchange); the (status)-only level is the set ROLLUP cannot "
    "produce. GROUPING() bits disambiguate totals exactly as in "
    "q_revenue_rollup",
    tags=("tpch", "agg", "rollup"),
)
def q_revenue_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    gid = (
        F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus")
    ).cast("long")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            gid.alias("gid"),
            F.sum(_rev()).cast("double").alias("revenue"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "gid",
            "revenue",
        )
        .orderBy("gid", "returnflag", "linestatus")
    )
