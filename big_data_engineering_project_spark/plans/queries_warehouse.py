"""Warehouse-maintenance queries: SCD2 history build, market-basket
pair mining, OHLC resampling, referential-integrity audit, winsorized
robust means.

North-star extensions rounding out the dimensional-warehouse operator
set the reference's sinks imply: the DynamoDB keyed upsert
(`S/kinesis_processing_2.py`, latest-value-only) generalizes to the
full SCD Type 2 validity history; the Hive/Athena batch tables
(`B/data_warehouse_design.py`) generalize to cross-table FK audits
and basket-level association stats. Every query carries an exact
DuckDB oracle; every window has a TOTAL order per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_engineering_project_spark.operators.association import (
    frequent_pairs,
)
from big_data_engineering_project_spark.operators.cdc import (
    scd2_from_changelog,
)
from big_data_engineering_project_spark.operators.profiling import (
    referential_integrity_audit,
)
from big_data_engineering_project_spark.operators.temporal import (
    ohlc_resample,
)
from big_data_engineering_project_spark.plans.registry import register
from big_data_engineering_project_spark.sources.catalog import load_table


@register(
    "q_scd2_user_type_history",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_id, ts, event_type,
         lag(event_type) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
         row_number() OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
changes AS (
  -- rn = 1 opens the first version unconditionally; IS DISTINCT
  -- FROM is the null-safe change detect matching the operator's
  -- eqNullSafe compaction (a NULL attr value is a real state: A ->
  -- NULL is a change, NULL -> NULL is not). 'prev IS NULL OR prev
  -- <> event_type' would conflate first-row with NULL-prev and
  -- silently compact A -> NULL transitions.
  SELECT user_id, event_id, ts, event_type
  FROM ordered WHERE rn = 1 OR prev IS DISTINCT FROM event_type
),
v AS (
  SELECT user_id, event_type, ts AS effective_from,
         lead(ts) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS effective_to,
         CAST(row_number() OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS INTEGER)
           AS version
  FROM changes
)
SELECT user_id, event_type, effective_from, effective_to, version,
       effective_to IS NULL AS is_current
FROM v
ORDER BY user_id, version
""",
    doc="SCD Type 2 history of each user's event_type 'attribute' from "
    "the events changelog: compact consecutive duplicates (a row that "
    "changes nothing must not open a version), then lead-window "
    "validity intervals + row_number versions — the warehouse-side "
    "generalization of the reference's latest-value-only DynamoDB "
    "upsert (S/kinesis_processing_2.py). One shuffle on user_id "
    "reused by both windows; (ts, event_id) total order makes "
    "compaction, versions, and intervals engine-independent "
    "(operators/cdc.py)",
    headline=True,
    tags=("warehouse", "cdc", "window"),
)
def q_scd2_user_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return scd2_from_changelog(
        ev, key="user_id", ts_col="ts", attr="event_type",
        tiebreak=("event_id",),
    ).orderBy("user_id", "version")


_PAIR_TOPK = 25


@register(
    "q_basket_pair_lift",
    oracle=f"""
WITH items AS (
  SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem
),
n AS (SELECT COUNT(DISTINCT basket) AS nb FROM items),
supp AS (
  SELECT item, CAST(COUNT(*) AS BIGINT) AS s FROM items GROUP BY 1
),
pairs AS (
  SELECT a.item AS item_a, b.item AS item_b,
         CAST(COUNT(*) AS BIGINT) AS pair_support
  FROM items a JOIN items b
    ON a.basket = b.basket AND a.item < b.item
  GROUP BY 1, 2
)
SELECT p.item_a, p.item_b, p.pair_support,
       sa.s AS support_a, sb.s AS support_b,
       CAST(p.pair_support * n.nb AS DOUBLE)
         / CAST(sa.s * sb.s AS DOUBLE) AS lift
FROM pairs p
CROSS JOIN n
JOIN supp sa ON p.item_a = sa.item
JOIN supp sb ON p.item_b = sb.item
ORDER BY p.pair_support DESC, p.item_a, p.item_b
LIMIT {_PAIR_TOPK}
""",
    doc="Market-basket part pairs over orders (basket = l_orderkey, "
    "item = l_partkey): ONE input pass — per-basket sorted item sets, "
    "row-local pair/single/marker emission, one tagged groupBy — then "
    "exact pair support → lift from broadcast item supports, top-25 "
    "by (support DESC, item ids), a TOTAL order so the selected set "
    "is engine-independent; lift is one IEEE division of exact BIGINT "
    "products on both engines (the oracle's self-join form is the "
    "same relation). No all-pairs product: pairs exist only within a "
    "basket (≤ C(7,2) for TPC-H orders); the a-priori min-support "
    "prune in the operator bounds fan-out on real corpora "
    "(operators/association.py)",
    headline=True,
    tags=("warehouse", "association", "join"),
)
def q_basket_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        frequent_pairs(li, "l_orderkey", "l_partkey", min_item_support=1)
        .orderBy(F.desc("pair_support"), "item_a", "item_b")
        .limit(_PAIR_TOPK)
    )


@register(
    "q_ohlc_daily_value",
    oracle="""
WITH r AS (
  SELECT event_type, date_trunc('day', ts) AS bucket_ts, value,
         row_number() OVER (
           PARTITION BY event_type, date_trunc('day', ts)
           ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (
           PARTITION BY event_type, date_trunc('day', ts)
           ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT event_type, bucket_ts,
       MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
       CAST(COUNT(*) AS BIGINT) AS volume
FROM r
GROUP BY 1, 2
ORDER BY event_type, bucket_ts
""",
    doc="Per-(event_type, day) OHLC bars: open/close via "
    "min(struct(ts, event_id, value)) / max(struct(...)) — partial-"
    "aggregable argmin/argmax (O(1) state per group, map-side "
    "combined, NO window), so a hot symbol-day still aggregates at "
    "100 TB where the oracle's row_number formulation would sort one "
    "partition. event_id tiebreaks same-timestamp rows to a total "
    "order (operators/temporal.py:ohlc_resample)",
    headline=True,
    tags=("warehouse", "temporal", "agg"),
)
def q_ohlc_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ohlc_resample(
        ev, key="event_type", time_col="ts", value_col="value",
        id_col="event_id", bucket="day",
    ).orderBy("event_type", "bucket_ts")


def _ri_rel_sql(name: str, fact_sql: str, dim_sql: str) -> str:
    return f"""
SELECT '{name}' AS relation,
       CAST(COUNT(*) AS BIGINT) AS fact_rows,
       CAST(SUM(CASE WHEN f.k IS NOT NULL AND d.dk IS NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS orphan_rows,
       CAST(COUNT(DISTINCT CASE WHEN f.k IS NOT NULL AND d.dk IS NULL
                THEN f.k END) AS BIGINT) AS orphan_keys,
       CAST(SUM(CASE WHEN f.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS null_keys
FROM ({fact_sql}) f LEFT JOIN ({dim_sql}) d ON f.k = d.dk"""


_RI_RELATIONS_SQL = " UNION ALL ".join(
    [
        _ri_rel_sql(
            "lineitem.l_orderkey->orders.o_orderkey",
            "SELECT l_orderkey AS k FROM lineitem",
            "SELECT DISTINCT o_orderkey AS dk FROM orders",
        ),
        _ri_rel_sql(
            "lineitem.l_partkey->part.p_partkey",
            "SELECT l_partkey AS k FROM lineitem",
            "SELECT DISTINCT p_partkey AS dk FROM part",
        ),
        _ri_rel_sql(
            "lineitem.l_suppkey->supplier.s_suppkey",
            "SELECT l_suppkey AS k FROM lineitem",
            "SELECT DISTINCT s_suppkey AS dk FROM supplier",
        ),
        _ri_rel_sql(
            "orders.o_custkey->customer.c_custkey",
            "SELECT o_custkey AS k FROM orders",
            "SELECT DISTINCT c_custkey AS dk FROM customer",
        ),
        _ri_rel_sql(
            "customer.c_nationkey->nation.n_nationkey",
            "SELECT c_nationkey AS k FROM customer",
            "SELECT DISTINCT n_nationkey AS dk FROM nation",
        ),
        _ri_rel_sql(
            "events.user_id->customer.c_custkey",
            "SELECT user_id AS k FROM events",
            "SELECT DISTINCT c_custkey AS dk FROM customer",
        ),
    ]
)


@register(
    "q_ri_orphan_audit",
    oracle=f"{_RI_RELATIONS_SQL}\nORDER BY relation",
    doc="Referential-integrity audit over the star schema's six FK "
    "relations (incl. events.user_id->customer, the one expected to "
    "hold orphans in the synthetic fixture): per relation, fact rows "
    "/ orphan rows / distinct orphan keys / NULL FKs, each a key-"
    "only LEFT join reduced to one row — dims broadcast when small "
    "(AQE), fact-sized dims fall back to sort-merge on the natural "
    "cluster key (operators/profiling.py:referential_integrity_audit)",
    tags=("warehouse", "quality", "join"),
)
def q_ri_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = {
        n: load_table(spark, sf_dir, n)
        for n in (
            "lineitem", "orders", "part", "supplier", "customer",
            "nation", "events",
        )
    }
    rels = [
        ("lineitem.l_orderkey->orders.o_orderkey",
         t["lineitem"], "l_orderkey", t["orders"], "o_orderkey"),
        ("lineitem.l_partkey->part.p_partkey",
         t["lineitem"], "l_partkey", t["part"], "p_partkey"),
        ("lineitem.l_suppkey->supplier.s_suppkey",
         t["lineitem"], "l_suppkey", t["supplier"], "s_suppkey"),
        ("orders.o_custkey->customer.c_custkey",
         t["orders"], "o_custkey", t["customer"], "c_custkey"),
        ("customer.c_nationkey->nation.n_nationkey",
         t["customer"], "c_nationkey", t["nation"], "n_nationkey"),
        ("events.user_id->customer.c_custkey",
         t["events"], "user_id", t["customer"], "c_custkey"),
    ]
    return referential_integrity_audit(rels).orderBy("relation")


@register(
    "q_winsorized_value_by_type",
    oracle="""
WITH st AS (
  SELECT event_type,
         quantile_cont(value, 0.05) AS p05,
         quantile_cont(value, 0.95) AS p95
  FROM events GROUP BY 1
)
SELECT e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       st.p05 AS p05,
       st.p95 AS p95,
       CAST(SUM(CAST(LEAST(GREATEST(e.value, st.p05), st.p95)
                AS DECIMAL(18, 6))) AS DOUBLE) / COUNT(*)
         AS winsorized_mean,
       CAST(SUM(CAST(e.value AS DECIMAL(18, 6))) AS DOUBLE) / COUNT(*)
         AS raw_mean
FROM events e JOIN st USING (event_type)
GROUP BY e.event_type, st.p05, st.p95
ORDER BY e.event_type
""",
    doc="Winsorized (5%/95%-clamped) mean per event type beside the "
    "raw mean — the third robust-stats member with z-score "
    "(q_zscore_anomalies) and median/MAD (q_mad_outliers): one "
    "grouped exact-percentile pass, stats broadcast back, clamp + "
    "decimal-stabilized sum (exact decimal adds → combine-order-"
    "independent; identical interpolation expression both engines, "
    "proven by the MAD/quantile family)",
    tags=("behavior", "quality", "robust"),
)
def q_winsorized_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    st = ev.groupBy("event_type").agg(
        F.percentile("value", 0.05).alias("p05"),
        F.percentile("value", 0.95).alias("p95"),
    )
    clamped = F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95"))
    return (
        ev.join(F.broadcast(st), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("p05").alias("p05"),
            F.min("p95").alias("p95"),
            (
                F.sum(clamped.cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("winsorized_mean"),
            (
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("raw_mean"),
        )
        .orderBy("event_type")
    )


_DIFF_OLD_SQL = """
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM orders WHERE o_orderkey % 103 <> 0
"""
_DIFF_NEW_SQL = """
SELECT o_orderkey,
       CASE WHEN o_orderkey % 97 = 0 THEN 'X' ELSE o_orderstatus END
         AS o_orderstatus,
       o_totalprice
FROM orders WHERE o_orderkey % 101 <> 0
"""


@register(
    "q_snapshot_diff",
    oracle=f"""
WITH old_s AS ({_DIFF_OLD_SQL}),
new_s AS ({_DIFF_NEW_SQL}),
j AS (
  SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
         o.o_orderkey IS NULL AS is_add,
         n.o_orderkey IS NULL AS is_rem,
         (o.o_orderstatus IS DISTINCT FROM n.o_orderstatus)
           OR (o.o_totalprice IS DISTINCT FROM n.o_totalprice) AS is_chg
  FROM old_s o FULL OUTER JOIN new_s n ON o.o_orderkey = n.o_orderkey
)
SELECT o_orderkey,
       CASE WHEN is_add THEN 'added'
            WHEN is_rem THEN 'removed'
            ELSE 'changed' END AS change_type
FROM j WHERE is_add OR is_rem OR is_chg
ORDER BY o_orderkey
""",
    doc="Snapshot reconciliation over two deterministic views of "
    "orders (keys %103 added, %101 removed, %97 status-changed): "
    "each side collapses to (key, xxhash64 row digest) BEFORE the "
    "full-outer join, so the reconciliation exchange carries 16 "
    "bytes/row regardless of row width — the oracle diffs the raw "
    "columns directly, so the gate also proves the digest "
    "classification ≡ column-wise comparison (a hash collision would "
    "hash-mismatch the artifact) (operators/cdc.py:table_diff)",
    headline=True,
    tags=("warehouse", "cdc", "join"),
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_engineering_project_spark.operators.cdc import table_diff

    orders = load_table(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 103 != 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new = orders.filter(F.col("o_orderkey") % 101 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 97 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        "o_totalprice",
    )
    return table_diff(
        old, new, "o_orderkey", ["o_orderstatus", "o_totalprice"]
    ).orderBy("o_orderkey")


def _skew_col_sql(name: str, table: str, col: str, top_n: int = 10) -> str:
    return f"""
SELECT '{name}' AS "column",
       s.r_ AS n_rows, s.k_ AS n_keys, s.m_ AS max_key_rows,
       CAST(s.m_ AS DOUBLE) / CAST(s.r_ AS DOUBLE) AS top1_share,
       CAST(t.t_ AS DOUBLE) / CAST(s.r_ AS DOUBLE) AS topn_share,
       CAST(s.r_ AS DOUBLE) / CAST(s.k_ AS DOUBLE) AS avg_rows_per_key
FROM (
  SELECT CAST(SUM(c_) AS BIGINT) AS r_, CAST(COUNT(*) AS BIGINT) AS k_,
         CAST(MAX(c_) AS BIGINT) AS m_
  FROM (SELECT COUNT(*) AS c_ FROM {table} GROUP BY {col}) cc
) s CROSS JOIN (
  SELECT CAST(SUM(c_) AS BIGINT) AS t_
  FROM (SELECT COUNT(*) AS c_ FROM {table} GROUP BY {col}
        ORDER BY c_ DESC LIMIT {top_n}) tt
) t"""


_SKEW_COLS = [
    ("events.user_id", "events", "user_id"),
    ("events.event_type", "events", "event_type"),
    ("lineitem.l_orderkey", "lineitem", "l_orderkey"),
    ("lineitem.l_partkey", "lineitem", "l_partkey"),
    ("lineitem.l_suppkey", "lineitem", "l_suppkey"),
]


@register(
    "q_key_skew_report",
    oracle=" UNION ALL ".join(
        _skew_col_sql(n, t, c) for n, t, c in _SKEW_COLS
    )
    + '\nORDER BY "column"',
    doc="Shuffle-key skew diagnostics across the five join/agg keys "
    "of the two fact tables: hottest-key share, top-10 concentration, "
    "keys-per-row — the pre-flight report that decides salting / AQE "
    "skew-join / broadcast before keying a 100 TB shuffle. Per key "
    "one map-side-combined groupBy; the top-10 sum is over count "
    "VALUES (tie-insensitive, so deterministic at rank boundaries); "
    "shares are single IEEE divisions of exact BIGINTs "
    "(operators/profiling.py:key_skew_report)",
    headline=True,
    tags=("warehouse", "quality", "profiling"),
)
def q_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_engineering_project_spark.operators.profiling import (
        key_skew_report,
    )

    ev = load_table(spark, sf_dir, "events")
    li = load_table(spark, sf_dir, "lineitem")
    rep_ev = key_skew_report(ev, ["user_id", "event_type"]).withColumn(
        "column", F.concat(F.lit("events."), F.col("column"))
    )
    rep_li = key_skew_report(
        li, ["l_orderkey", "l_partkey", "l_suppkey"]
    ).withColumn("column", F.concat(F.lit("lineitem."), F.col("column")))
    return rep_ev.unionByName(rep_li).orderBy("column")


_JOURNEY_STEPS = 5
_JOURNEY_TOPK = 15


@register(
    "q_top_journeys",
    oracle=f"""
WITH r AS (
  SELECT user_id, CAST(ts AS DATE) AS day, event_type,
         row_number() OVER (
           PARTITION BY user_id, CAST(ts AS DATE)
           ORDER BY ts, event_id) AS rn
  FROM events
),
j AS (
  SELECT user_id, day,
         string_agg(event_type, '>' ORDER BY rn) AS journey
  FROM r WHERE rn <= {_JOURNEY_STEPS} GROUP BY user_id, day
)
SELECT journey, CAST(COUNT(*) AS BIGINT) AS n_users
FROM j GROUP BY journey
ORDER BY n_users DESC, journey ASC
LIMIT {_JOURNEY_TOPK}
""",
    doc="Top-15 user journeys: first 5 event types of each (user, "
    "day) episode joined '>'-separated, counted corpus-wide — the "
    "path-mining view of the event stream. Ranking window over the "
    "(ts, event_id) total order with the rn<=5 cut collapsing "
    "episodes BEFORE the journey shuffle; path assembly is "
    "array_sort(collect_list(struct(rn, step))) — NEVER bare "
    "collect_list, whose order is partition-arrival luck; the oracle "
    "is DuckDB's ordered string_agg. (n_users DESC, journey) is a "
    "total order (operators/behavior.py:top_journeys)",
    headline=True,
    tags=("behavior", "window", "path"),
)
def q_top_journeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_engineering_project_spark.operators.behavior import (
        top_journeys,
    )

    ev = load_table(spark, sf_dir, "events").withColumn(
        "__day", F.to_date("ts")
    )
    return top_journeys(
        ev,
        user_col="user_id",
        ts_col="ts",
        tiebreak_col="event_id",
        step_col="event_type",
        group_cols=["__day"],
        n_steps=_JOURNEY_STEPS,
        top_k=_JOURNEY_TOPK,
    )


_TRI_MIN_SUPPORT = 2
# Hub-center cap for q_link_prediction, applied on BOTH engines: the
# wedge join's quadratic guard (d*(d-1)/2 wedges per center). Sized
# well above the fixture's max co-order degree (13 at sf0.01, 6 at
# sf0.1) so the registered result is cap-invariant here, while any
# real-data celebrity vertex is excluded with bounded RA error
# (contribution ≤ ra_scale/d per pair — see operators/graph.py).
_LINKPRED_MAX_CENTER_DEG = 64


@register(
    "q_triangle_parts",
    oracle=f"""
WITH items AS (
  SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem
),
pairs AS (
  SELECT a.it AS x, b.it AS y, COUNT(*) AS c
  FROM items a JOIN items b ON a.bk = b.bk AND a.it < b.it
  GROUP BY 1, 2 HAVING COUNT(*) >= {_TRI_MIN_SUPPORT}
)
SELECT e1.x AS a, e1.y AS b, e2.y AS c
FROM pairs e1
JOIN pairs e2 ON e1.y = e2.x
JOIN pairs e3 ON e3.x = e1.x AND e3.y = e2.y
ORDER BY a, b, c
""",
    doc="Triangle enumeration over the part co-order graph (edge = "
    "two parts co-ordered in ≥ 2 baskets, from the frequent_pairs "
    "counts): association mining composed with graph analytics — "
    "cliques of mutually co-bought parts. Degree-ordered orientation "
    "bounds every node's wedge fan-out at O(sqrt(m)) regardless of "
    "how hot the part is (the oracle's naive x<y three-way join is "
    "the same relation but would explode on a celebrity vertex); "
    "vertices sorted ascending per triangle → engine-independent "
    "rows (operators/graph.py:triangle_count)",
    headline=True,
    tags=("warehouse", "graph", "join"),
)
def q_triangle_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_engineering_project_spark.operators.graph import (
        triangle_count,
    )

    li = load_table(spark, sf_dir, "lineitem")
    edges = frequent_pairs(li, "l_orderkey", "l_partkey").filter(
        F.col("pair_support") >= _TRI_MIN_SUPPORT
    )
    return triangle_count(edges, src="item_a", dst="item_b").orderBy(
        "a", "b", "c"
    )


_CUSUM_K_HALF = 1  # slack = sigma/2
_CUSUM_H = 4
_CUSUM_SCALE = 1_000_000


@register(
    "q_cusum_drift",
    oracle=f"""
WITH u AS (
  SELECT event_id, event_type, ts, value,
         CAST(FLOOR(value * {_CUSUM_SCALE}) AS BIGINT) AS vu
  FROM events
),
st0 AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(vu AS DECIMAL(38, 0))) AS s1,
         SUM(CAST(vu * vu AS DECIMAL(38, 0))) AS s2
  FROM u GROUP BY 1 HAVING COUNT(*) >= 2
),
st AS (
  SELECT event_type,
         CAST(FLOOR(CAST(s1 AS DOUBLE) / n) AS BIGINT) AS mu_u,
         CAST(FLOOR(SQRT(
           (CAST(s2 AS DOUBLE)
            - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (n - 1)
         )) AS BIGINT) AS sigma_u
  FROM st0
),
y AS (
  SELECT u.event_id, u.event_type, u.ts, u.value, st.sigma_u,
         SUM(u.vu - st.mu_u - (st.sigma_u * {_CUSUM_K_HALF}) // 2) OVER
           (PARTITION BY u.event_type ORDER BY u.ts, u.event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS S
  FROM u JOIN st USING (event_type)
),
c AS (
  SELECT event_id, event_type, ts, value,
         CAST(S - LEAST(0, MIN(S) OVER
           (PARTITION BY event_type ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
           AS BIGINT) AS cusum_micro,
         CAST(sigma_u * {_CUSUM_H} AS BIGINT) AS threshold_micro
  FROM y
)
SELECT event_type, event_id, ts, value, cusum_micro, threshold_micro
FROM c WHERE cusum_micro > threshold_micro
ORDER BY event_type, event_id
""",
    doc="One-sided CUSUM drift alarms per event type (Page 1954): the "
    "sequential complement of q_zscore_anomalies/q_mad_outliers — a "
    "persistent small upward shift trips the cumulative statistic "
    "where no single point would. The non-window recursion max(0, "
    "s+y) is replaced by its closed form S_i − min(0, running-min S) "
    "— two cumulatives over one (ts, event_id)-ordered keyed window, "
    "ALL in integer micro-units (floored values, floored moments, "
    "BIGINT prefix sums — the PageRank discipline), so the statistic "
    "is combine-order-free and the oracle exact; a float formulation "
    "loses the last bits to grouped-AVG combine order "
    "(operators/anomaly.py:cusum_drift)",
    headline=True,
    tags=("behavior", "anomaly", "window"),
)
def q_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_engineering_project_spark.operators.anomaly import (
        cusum_drift,
    )

    ev = load_table(spark, sf_dir, "events")
    return cusum_drift(
        ev, key="event_type", ts_col="ts", id_col="event_id",
        value_col="value", k_half_sigmas=_CUSUM_K_HALF,
        h_sigma=_CUSUM_H, scale=_CUSUM_SCALE,
    ).orderBy("event_type", "event_id")


# ---------------------------------------------------------------------------
# Z-order clustered storage: the layout decision surfaced as a query.
# The scan side of sources/io.py:write_zordered_parquet — a fact table
# clustered on TWO query keys, read back through a 2-D selective
# filter that parquet footer min/max stats can prune on BOTH columns
# (the pytest in tests/test_io.py proves strictly fewer files overlap
# the predicate than were written). The aggregate is over the same
# rows as the raw table, so the DuckDB oracle runs on raw lineitem —
# the gate proves re-layout changes bytes-on-disk, never results.

_ZORDER_PK_LO, _ZORDER_PK_HI = 100, 119
_ZORDER_SK_LO, _ZORDER_SK_HI = 0, 4
_ZORDER_N_FILES = 32


def _zordered_lineitem_path(spark: SparkSession, sf_dir: str) -> str:
    """Write (once per sf_dir per process) the z-ordered lineitem copy
    clustered on (l_partkey, l_suppkey) and return its path. The
    rewrite is skipped when the _SUCCESS marker exists — the layout is
    a deterministic function of the input, so a prior write is
    equivalent to a fresh one."""
    import os

    from big_data_engineering_project_spark.sources.io import (
        write_zordered_parquet,
    )

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    path = f"/tmp/spark_graft_zorder/{tag}/lineitem"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"
        )
        write_zordered_parquet(
            li, path, ["l_partkey", "l_suppkey"], _ZORDER_N_FILES
        )
    return path


@register(
    "q_zorder_pruned_scan",
    oracle=f"""
SELECT l_partkey,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
         AS sum_price
FROM lineitem
WHERE l_partkey BETWEEN {_ZORDER_PK_LO} AND {_ZORDER_PK_HI}
  AND l_suppkey BETWEEN {_ZORDER_SK_LO} AND {_ZORDER_SK_HI}
GROUP BY 1
ORDER BY 1
""",
    doc="Two-dimensionally selective aggregate over the Z-ORDER "
    "clustered lineitem copy (clustered on l_partkey+l_suppkey, "
    "sources/io.py:write_zordered_parquet): both range predicates "
    "reach the parquet reader as PushedFilters, and because the "
    "Morton layout clusters BOTH key spaces within every file, "
    "footer min/max stats skip most files on either predicate — the "
    "single-key sorted layout prunes only its own sort key. Oracle "
    "runs on RAW lineitem: re-layout must never change results. "
    "Decimal-stabilized sums per the registry parity rules "
    "(tests/test_io.py:test_zorder_write_skips_files_on_both_"
    "dimensions proves the file-skip counts; tests/test_plans.py "
    "pins the pushdown)",
    headline=True,
    tags=("warehouse", "storage", "scan"),
)
def q_zorder_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _zordered_lineitem_path(spark, sf_dir)
    z = spark.read.parquet(path).filter(
        F.col("l_partkey").between(_ZORDER_PK_LO, _ZORDER_PK_HI)
        & F.col("l_suppkey").between(_ZORDER_SK_LO, _ZORDER_SK_HI)
    )
    dec = lambda c: F.col(c).cast("decimal(18,6)")  # noqa: E731
    return (
        z.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_price"),
        )
        .orderBy("l_partkey")
    )


@register(
    "q_incremental_snapshot_diff",
    oracle=f"""
WITH old_s AS ({_DIFF_OLD_SQL}),
new_s AS ({_DIFF_NEW_SQL}),
j AS (
  SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
         o.o_orderkey IS NULL AS is_add,
         n.o_orderkey IS NULL AS is_rem,
         (o.o_orderstatus IS DISTINCT FROM n.o_orderstatus)
           OR (o.o_totalprice IS DISTINCT FROM n.o_totalprice) AS is_chg
  FROM old_s o FULL OUTER JOIN new_s n ON o.o_orderkey = n.o_orderkey
)
SELECT o_orderkey,
       CASE WHEN is_add THEN 'added'
            WHEN is_rem THEN 'removed'
            ELSE 'changed' END AS change_type
FROM j WHERE is_add OR is_rem OR is_chg
ORDER BY o_orderkey
""",
    doc="Merkle-bucket INCREMENTAL snapshot reconciliation over the "
    "same two orders views as q_snapshot_diff: level 1 compares "
    "per-key-hash-bucket order-insensitive digests (bit_xor of row "
    "digests + row count — a bounded aggregate per side, no "
    "row-level exchange), level 2 runs the row-digest full-outer "
    "diff ONLY on rows in changed buckets (broadcast semi prune). "
    "The oracle is the DIRECT raw-column diff, so the gate proves "
    "incremental ≡ direct — the sub-linear-shuffle path for daily "
    "diffs of mostly-identical 100 TB snapshots, with the old side's "
    "bucket-digest table persistable across runs (the R-S dedup "
    "corpus-index pattern; two-day pytest) "
    "(operators/cdc.py:table_diff_incremental)",
    headline=True,
    tags=("warehouse", "cdc", "join", "sketch"),
)
def q_incremental_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_engineering_project_spark.operators.cdc import (
        table_diff_incremental,
    )

    orders = load_table(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 103 != 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new = orders.filter(F.col("o_orderkey") % 101 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 97 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        "o_totalprice",
    )
    return table_diff_incremental(
        old, new, "o_orderkey", ["o_orderstatus", "o_totalprice"]
    ).orderBy("o_orderkey")


_ASOF_AT = "2024-01-16 00:00:00"


@register(
    "q_dimension_asof",
    oracle=f"""
WITH ordered AS (
  SELECT user_id, event_id, ts, event_type,
         lag(event_type) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
         row_number() OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
changes AS (
  SELECT user_id, event_id, ts, event_type
  FROM ordered WHERE rn = 1 OR prev IS DISTINCT FROM event_type
),
v AS (
  SELECT user_id, event_type, ts AS effective_from,
         lead(ts) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS effective_to
  FROM changes
),
at_instant AS (
  SELECT user_id, event_type FROM v
  WHERE effective_from <= TIMESTAMP '{_ASOF_AT}'
    AND (effective_to IS NULL OR effective_to > TIMESTAMP '{_ASOF_AT}')
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users
FROM at_instant GROUP BY 1 ORDER BY 1
""",
    doc="Dimension reconstruction AS OF a frozen mid-range instant: "
    "the SCD2 history built from the events changelog, filtered to "
    "the version whose [effective_from, effective_to) interval "
    "covers the instant — time travel as a PURE FILTER over the "
    "history (no shuffle beyond the history build; partition pruning "
    "applies when the history is stored partitioned on "
    "effective_from date), then per-type user counts. The warehouse "
    "read-side completion of the SCD2 family: build "
    "(q_scd2_user_type_history) → maintain (scd2_maintenance stream "
    "check) → query-at-instant (this) "
    "(operators/cdc.py:snapshot_asof)",
    tags=("warehouse", "cdc"),
)
def q_dimension_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_engineering_project_spark.operators.cdc import (
        snapshot_asof,
    )

    ev = load_table(spark, sf_dir, "events")
    hist = scd2_from_changelog(
        ev, key="user_id", ts_col="ts", attr="event_type",
        tiebreak=("event_id",),
    )
    return (
        snapshot_asof(hist, "user_id", _ASOF_AT)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("event_type")
    )


# --- k-core of the part co-order graph ---------------------------------------

_KCORE_K = 2
_KCORE_ITERS = 8  # convergence depth is 4 (sf0.01) / 6 (sf0.1);
# peeling is monotone, so any budget >= depth IS the true core
# (tests/test_operators.py asserts a further peel is a no-op).


def _kcore_oracle(iters: int) -> str:
    lvls = []
    prev = "und0"
    for i in range(1, iters + 1):
        lvls.append(
            f"""k{i} AS MATERIALIZED (
  SELECT a FROM (SELECT a, COUNT(*) AS d FROM {prev} GROUP BY a)
  WHERE d >= {_KCORE_K}
),
u{i} AS MATERIALIZED (
  SELECT u.a, u.b FROM {prev} u
  JOIN k{i} ka ON ka.a = u.a JOIN k{i} kb ON kb.a = u.b
)"""
        )
        prev = f"u{i}"
    joined = ",\n".join(lvls)
    return f"""
WITH items AS (
  SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem
),
pairs AS (
  SELECT a.it AS x, b.it AS y
  FROM items a JOIN items b ON a.bk = b.bk AND a.it < b.it
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
),
und0 AS MATERIALIZED (
  SELECT x AS a, y AS b FROM pairs UNION ALL SELECT y, x FROM pairs
),
{joined}
SELECT a AS part, CAST(COUNT(*) AS BIGINT) AS core_degree
FROM {prev} GROUP BY a ORDER BY part
"""


@register(
    "q_kcore_parts",
    oracle=_kcore_oracle(_KCORE_ITERS),
    doc=(
        f"{_KCORE_K}-core of the part co-order graph ({_KCORE_ITERS} "
        "fixed peels, past both SFs' convergence depth): iterative "
        "degree-<k deletion leaves the cyclic co-purchase backbone — "
        "the dense-subgraph member of the graph family. Each peel is "
        "one partial-aggregable degree count + two endpoint SEMI "
        "joins; integer degrees need no tie-break, so the whole fixed "
        "point holds an unrolled-CTE oracle "
        "(operators/graph.py:k_core)"
    ),
    tags=("warehouse", "graph", "iterative"),
)
def q_kcore_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_engineering_project_spark.operators.association import (
        frequent_pairs,
    )
    from big_data_engineering_project_spark.operators.graph import k_core

    li = load_table(spark, sf_dir, "lineitem")
    edges = frequent_pairs(li, "l_orderkey", "l_partkey").filter(
        F.col("pair_support") >= 2
    )
    return (
        k_core(edges, _KCORE_K, src="item_a", dst="item_b", iters=_KCORE_ITERS)
        .select(F.col("node").alias("part"), "core_degree")
        .orderBy("part")
    )


# --- Join-cardinality forecast (pre-flight planning) -------------------------


@register(
    "q_join_size_forecast",
    oracle="""
WITH rel1 AS (
  SELECT 'lineitem*orders' AS relation,
    (SELECT COUNT(*) FROM lineitem) AS lhs_rows,
    (SELECT COUNT(*) FROM orders) AS rhs_rows,
    COALESCE(SUM(cl * cr), 0) AS join_rows
  FROM (SELECT l_orderkey AS k, COUNT(*) AS cl FROM lineitem GROUP BY 1) a
  JOIN (SELECT o_orderkey AS k, COUNT(*) AS cr FROM orders GROUP BY 1) b
    USING (k)
),
rel1h AS (
  SELECT k AS hottest_key, cl * cr AS hottest_rows
  FROM (SELECT l_orderkey AS k, COUNT(*) AS cl FROM lineitem GROUP BY 1) a
  JOIN (SELECT o_orderkey AS k, COUNT(*) AS cr FROM orders GROUP BY 1) b
    USING (k)
  ORDER BY cl * cr DESC, k ASC LIMIT 1
),
rel2 AS (
  SELECT 'orders*customer' AS relation,
    (SELECT COUNT(*) FROM orders) AS lhs_rows,
    (SELECT COUNT(*) FROM customer) AS rhs_rows,
    COALESCE(SUM(cl * cr), 0) AS join_rows
  FROM (SELECT o_custkey AS k, COUNT(*) AS cl FROM orders GROUP BY 1) a
  JOIN (SELECT c_custkey AS k, COUNT(*) AS cr FROM customer GROUP BY 1) b
    USING (k)
),
rel2h AS (
  SELECT k AS hottest_key, cl * cr AS hottest_rows
  FROM (SELECT o_custkey AS k, COUNT(*) AS cl FROM orders GROUP BY 1) a
  JOIN (SELECT c_custkey AS k, COUNT(*) AS cr FROM customer GROUP BY 1) b
    USING (k)
  ORDER BY cl * cr DESC, k ASC LIMIT 1
),
rel3 AS (
  SELECT 'events*customer' AS relation,
    (SELECT COUNT(*) FROM events) AS lhs_rows,
    (SELECT COUNT(*) FROM customer) AS rhs_rows,
    COALESCE(SUM(cl * cr), 0) AS join_rows
  FROM (SELECT user_id AS k, COUNT(*) AS cl FROM events GROUP BY 1) a
  JOIN (SELECT c_custkey AS k, COUNT(*) AS cr FROM customer GROUP BY 1) b
    USING (k)
),
rel3h AS (
  SELECT k AS hottest_key, cl * cr AS hottest_rows
  FROM (SELECT user_id AS k, COUNT(*) AS cl FROM events GROUP BY 1) a
  JOIN (SELECT c_custkey AS k, COUNT(*) AS cr FROM customer GROUP BY 1) b
    USING (k)
  ORDER BY cl * cr DESC, k ASC LIMIT 1
)
SELECT r.relation, CAST(r.lhs_rows AS BIGINT) AS lhs_rows,
       CAST(r.rhs_rows AS BIGINT) AS rhs_rows,
       CAST(r.join_rows AS BIGINT) AS join_rows,
       h.hottest_key, CAST(h.hottest_rows AS BIGINT) AS hottest_rows
FROM rel1 r, rel1h h
UNION ALL SELECT r.relation, CAST(r.lhs_rows AS BIGINT),
       CAST(r.rhs_rows AS BIGINT), CAST(r.join_rows AS BIGINT),
       h.hottest_key, CAST(h.hottest_rows AS BIGINT)
FROM rel2 r, rel2h h
UNION ALL SELECT r.relation, CAST(r.lhs_rows AS BIGINT),
       CAST(r.rhs_rows AS BIGINT), CAST(r.join_rows AS BIGINT),
       h.hottest_key, CAST(h.hottest_rows AS BIGINT)
FROM rel3 r, rel3h h
ORDER BY relation
""",
    doc=(
        "Equi-join output-size forecast for three fact relations from "
        "per-key count tables (counters on the exchange, never fact "
        "rows): sum(cnt_l*cnt_r), hottest key + its one-reducer "
        "contribution — the pre-flight beside key_skew_report"
    ),
    tags=("warehouse", "profiling"),
)
def q_join_size_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_engineering_project_spark.operators.profiling import (
        join_size_forecast,
    )

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    ev = load_table(spark, sf_dir, "events")
    parts = [
        join_size_forecast(li, "l_orderkey", orders, "o_orderkey",
                           "lineitem*orders"),
        join_size_forecast(orders, "o_custkey", cust, "c_custkey",
                           "orders*customer"),
        join_size_forecast(ev, "user_id", cust, "c_custkey",
                           "events*customer"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("relation")


# --- Weighted shortest paths over the co-order graph -------------------------

_SSSP_ITERS = 4
_SSSP_COST_NUM = 1_000_000  # edge cost = 1e6 div co-order count:
# frequently co-ordered parts are "close", rare pairings expensive —
# an integer -log-likelihood proxy that keeps the fixed point exact.


def _sssp_oracle(iters: int) -> str:
    lvls = []
    prev = "d0"
    for i in range(1, iters + 1):
        lvls.append(
            f"""d{i} AS MATERIALIZED (
  SELECT node, MIN(cost) AS cost FROM (
    SELECT node, cost FROM {prev}
    UNION ALL
    SELECT e.b AS node, {prev}.cost + e.w AS cost
    FROM {prev} JOIN und e ON e.a = {prev}.node
  ) GROUP BY node
)"""
        )
        prev = f"d{i}"
    joined = ",\n".join(lvls)
    return f"""
WITH items AS (
  SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem
),
pairs AS (
  SELECT a.it AS x, b.it AS y,
         {_SSSP_COST_NUM} // COUNT(*) AS w
  FROM items a JOIN items b ON a.bk = b.bk AND a.it < b.it
  GROUP BY 1, 2
),
und AS MATERIALIZED (
  SELECT x AS a, y AS b, w FROM pairs UNION ALL SELECT y, x, w FROM pairs
),
d0 AS (SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS cost),
{joined}
SELECT node AS part, CAST(cost AS BIGINT) AS cost
FROM {prev} ORDER BY part
"""


@register(
    "q_cheapest_part_paths",
    oracle=_sssp_oracle(_SSSP_ITERS),
    doc=(
        f"Bellman-Ford cheapest paths from part 0 over the co-order "
        f"graph ({_SSSP_ITERS} relaxation rounds), edge cost = "
        f"{_SSSP_COST_NUM} div co-order count (rare pairings are "
        "far): the weighted twin of q_hop_distance — settled-first-"
        "reach is invalid under weights, so every round relaxes the "
        "full edge set and keeps the per-node integer MIN; exact "
        "unrolled-CTE oracle (operators/graph.py:shortest_path_costs)"
    ),
    tags=("warehouse", "graph", "iterative"),
)
def q_cheapest_part_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_engineering_project_spark.operators.graph import (
        shortest_path_costs,
    )

    from big_data_engineering_project_spark.operators.association import (
        frequent_pairs,
    )

    li = load_table(spark, sf_dir, "lineitem")
    # Same co-order counts as the oracle's items self-join, but via the
    # one-pass frequent_pairs form (its docstring names the naive
    # 5-scan self-join shape this replaces) — the q_kcore_parts edge
    # source, reused.
    pairs = frequent_pairs(li, "l_orderkey", "l_partkey").select(
        F.col("item_a").alias("x"),
        F.col("item_b").alias("y"),
        F.expr(f"CAST({_SSSP_COST_NUM} AS BIGINT) div pair_support").alias(
            "w"
        ),
    )
    und = pairs.select(
        F.col("x").alias("src"), F.col("y").alias("dst"), "w"
    ).unionByName(
        pairs.select(
            F.col("y").alias("src"), F.col("x").alias("dst"), "w"
        )
    )
    sources = li.sparkSession.createDataFrame([(0,)], "node long")
    return (
        shortest_path_costs(und, sources, iters=_SSSP_ITERS)
        .select(F.col("node").alias("part"), F.col("cost").cast("long").alias("cost"))
        .orderBy("part")
    )


# --- Snapshot profile drift ---------------------------------------------------


@register(
    "q_profile_drift",
    oracle="""
WITH half(tag, lo, hi) AS (VALUES
  ('a', TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-16'),
  ('b', TIMESTAMP '2024-01-16', TIMESTAMP '2099-01-01')
),
s AS (
  SELECT h.tag,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT("value") AS BIGINT) AS nn_value,
         CAST(COUNT(DISTINCT "value") AS BIGINT) AS nd_value,
         CAST(MIN("value") AS DOUBLE) AS min_value,
         CAST(MAX("value") AS DOUBLE) AS max_value,
         CAST(COUNT(user_id) AS BIGINT) AS nn_user,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS nd_user,
         CAST(MIN(user_id) AS DOUBLE) AS min_user,
         CAST(MAX(user_id) AS DOUBLE) AS max_user,
         CAST(COUNT(event_type) AS BIGINT) AS nn_type,
         CAST(COUNT(DISTINCT event_type) AS BIGINT) AS nd_type
  FROM events e JOIN half h ON e.ts >= h.lo AND e.ts < h.hi
  GROUP BY h.tag
),
u AS (
  SELECT tag, 'value' AS "column", n, n - nn_value AS n_nulls,
         nd_value AS n_distinct, min_value AS min_num, max_value AS max_num
  FROM s
  UNION ALL
  SELECT tag, 'user_id', n, n - nn_user, nd_user, min_user, max_user FROM s
  UNION ALL
  SELECT tag, 'event_type', n, n - nn_type, nd_type,
         CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM s
)
SELECT a."column",
       a.n AS n_rows_a, CAST(a.n_nulls AS DOUBLE) / a.n AS null_rate_a,
       a.n_distinct AS n_distinct_a, a.min_num AS min_num_a,
       a.max_num AS max_num_a,
       b.n AS n_rows_b, CAST(b.n_nulls AS DOUBLE) / b.n AS null_rate_b,
       b.n_distinct AS n_distinct_b, b.min_num AS min_num_b,
       b.max_num AS max_num_b
FROM (SELECT * FROM u WHERE tag = 'a') a
JOIN (SELECT * FROM u WHERE tag = 'b') b USING ("column")
ORDER BY "column"
""",
    doc=(
        "Column-level profile drift between two snapshot halves of the "
        "events table (null-rate spikes, cardinality collapse, range "
        "shifts): both single-pass profiles join on the column name — "
        "the comparison frame is #columns rows at any corpus size"
    ),
    tags=("warehouse", "profiling"),
)
def q_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_engineering_project_spark.operators.profiling import (
        profile_drift,
    )

    ev = load_table(spark, sf_dir, "events")
    cut = "2024-01-16"
    before = ev.filter(F.col("ts") < F.lit(cut).cast("timestamp"))
    after = ev.filter(F.col("ts") >= F.lit(cut).cast("timestamp"))
    return (
        profile_drift(
            before, after, num_cols=["value", "user_id"],
            str_cols=["event_type"],
        )
        .select(
            "column",
            "n_rows_a", "null_rate_a", "n_distinct_a", "min_num_a",
            "max_num_a",
            "n_rows_b", "null_rate_b", "n_distinct_b", "min_num_b",
            "max_num_b",
        )
        .orderBy("column")
    )


@register(
    "q_scd2_temporal_join",
    oracle="""
WITH signup AS (
  SELECT user_id, ts, event_id,
         CASE TRY_CAST(regexp_extract(props, '[0-9]+') AS INTEGER) % 3
           WHEN 0 THEN 'bronze' WHEN 1 THEN 'silver' ELSE 'gold'
         END AS tier,
         row_number() OVER (PARTITION BY user_id, ts
                            ORDER BY event_id DESC) AS dup_rn
  FROM events WHERE event_type = 'signup'
),
dedup AS (
  SELECT user_id, ts, event_id, tier FROM signup WHERE dup_rn = 1
),
ordered AS (
  SELECT user_id, ts, event_id, tier,
         lag(tier) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
         row_number() OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM dedup
),
changes AS (
  SELECT user_id, ts, event_id, tier FROM ordered
  WHERE rn = 1 OR prev IS DISTINCT FROM tier
),
v AS (
  SELECT user_id, tier, ts AS effective_from,
         lead(ts) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS effective_to
  FROM changes
),
p AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
),
joined AS (
  SELECT p.user_id, p.ts, p.value, v.tier
  FROM p LEFT JOIN v
    ON p.user_id = v.user_id
   AND p.ts >= v.effective_from
   AND (v.effective_to IS NULL OR p.ts < v.effective_to)
)
SELECT COALESCE(tier, '(pre-signup)') AS tier,
       date_trunc('day', ts) AS day,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS purchase_value
FROM joined
GROUP BY 1, 2
ORDER BY tier, day
""",
    doc="Event-time temporal dimension join (Flink versioned-table "
    "join): each purchase enriched with the SCD2 tier version valid "
    "AT its event time, then per-(tier, day) purchase stats. The "
    "dimension is the SCD2 history of a signup-derived tier; the "
    "oracle is the raw interval-containment LEFT JOIN, so the gate "
    "proves the one-shuffle union+window as-of plan (no fact-times-"
    "versions row multiplication, the 100-TB shape) is containment-"
    "exact, including pre-first-version facts going to the "
    "'(pre-signup)' bucket (operators/cdc.py:scd2_temporal_join)",
    headline=True,
    tags=("warehouse", "cdc", "temporal-join"),
)
def q_scd2_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from big_data_engineering_project_spark.operators.cdc import (
        scd2_temporal_join,
    )

    ev = load_table(spark, sf_dir, "events")
    tier_num = F.regexp_extract("props", "[0-9]+", 0).cast("int") % 3
    tier = (
        F.when(tier_num == 0, "bronze")
        .when(tier_num == 1, "silver")
        .otherwise("gold")
    )
    # Pre-compact per-(user, ts) duplicates so the history satisfies
    # the as-of contract (unique per (key, effective_from)); keep the
    # latest event_id, mirrored in the oracle's dup_rn.
    dup_w = Window.partitionBy("user_id", "ts").orderBy(
        F.col("event_id").desc()
    )
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .select("user_id", "ts", "event_id", tier.alias("tier"))
        .withColumn("__dup", F.row_number().over(dup_w))
        .filter(F.col("__dup") == 1)
        .drop("__dup")
    )
    history = scd2_from_changelog(
        signups, key="user_id", ts_col="ts", attr="tier",
        tiebreak=("event_id",),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    joined = scd2_temporal_join(
        purchases, history, key="user_id", fact_time="ts",
        attr_cols=["tier"],
    )
    return (
        joined.groupBy(
            F.coalesce(F.col("asof_tier"), F.lit("(pre-signup)")).alias(
                "tier"
            ),
            F.date_trunc("day", F.col("ts")).alias("day"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("purchase_value"),
        )
        .orderBy("tier", "day")
    )


@register(
    "q_link_prediction",
    oracle=f"""
WITH items AS (
  SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem
),
pairs AS (
  SELECT a.it AS x, b.it AS y
  FROM items a JOIN items b ON a.bk = b.bk AND a.it < b.it
  GROUP BY 1, 2 HAVING COUNT(*) >= {_TRI_MIN_SUPPORT}
),
und AS MATERIALIZED (
  SELECT x AS a, y AS b FROM pairs UNION ALL SELECT y, x FROM pairs
),
deg AS (SELECT a, COUNT(*) AS deg FROM und GROUP BY 1),
ctr AS (
  SELECT und.a AS z, und.b AS n, 1000000000 // deg.deg AS ra
  FROM und JOIN deg ON deg.a = und.a
  WHERE deg.deg <= {_LINKPRED_MAX_CENTER_DEG}
),
w AS (
  SELECT l.n AS u, r.n AS v, l.ra
  FROM ctr l JOIN ctr r ON l.z = r.z AND l.n < r.n
),
scored AS (
  SELECT u, v, CAST(COUNT(*) AS BIGINT) AS common_neighbors,
         CAST(SUM(ra) AS BIGINT) AS ra_units
  FROM w GROUP BY 1, 2 HAVING COUNT(*) >= 1
)
SELECT s.u, s.v, s.common_neighbors, s.ra_units
FROM scored s
WHERE NOT EXISTS (SELECT 1 FROM pairs p WHERE p.x = s.u AND p.y = s.v)
ORDER BY u, v
""",
    doc="Link prediction over the part co-order graph: for every non-"
    "adjacent pair with >= 1 common neighbor (>= 2 is vacuous at "
    "sf0.1 — the co-order graph THINS with scale as the part "
    "universe outgrows basket sizes; min_common=1 keeps the overlap "
    "semantics exercised at both committed SFs), the common-neighbor "
    "count and the resource-allocation index (sum of 1/deg(z) over "
    "shared neighbors, in integer micro-units so ranking is exact "
    "cross-engine) — 'parts likely to be co-bought next'. Wedge self-"
    "join on the center + anti-join of existing edges; the hub-center "
    "cap (the quadratic-term guard) is ON in this registration on BOTH "
    "engines (max_center_degree, sized above the fixture's max degree "
    "— 13 at sf0.01, 6 at sf0.1 — so it binds only on celebrity "
    "vertices; the exclusion itself is pinned by pytest "
    "test_link_prediction_hub_cut_excludes_celebrity_center) "
    "(operators/graph.py:link_prediction)",
    headline=True,
    tags=("warehouse", "graph", "join"),
)
def q_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_engineering_project_spark.operators.graph import (
        link_prediction,
    )

    li = load_table(spark, sf_dir, "lineitem")
    edges = frequent_pairs(li, "l_orderkey", "l_partkey").filter(
        F.col("pair_support") >= _TRI_MIN_SUPPORT
    )
    return link_prediction(
        edges,
        src="item_a",
        dst="item_b",
        min_common=1,
        max_center_degree=_LINKPRED_MAX_CENTER_DEG,
    ).orderBy("u", "v")


@register(
    "q_erasure_cascade_audit",
    oracle="""
WITH tomb AS (
  SELECT c_custkey AS k FROM customer WHERE c_custkey % 17 = 3
),
ord_tomb AS (
  SELECT o_orderkey AS k FROM orders
  WHERE o_custkey IN (SELECT k FROM tomb)
),
ev AS (
  SELECT 'events.user_id' AS relation,
         CAST(COUNT(*) AS BIGINT) AS total_rows,
         CAST(SUM(CASE WHEN user_id IN (SELECT k FROM tomb)
                  THEN 1 ELSE 0 END) AS BIGINT) AS purged_rows,
         CAST(SUM(CASE WHEN user_id IN (SELECT k FROM tomb)
                  THEN 0 ELSE 1 END) AS BIGINT) AS kept_rows,
         CAST(COUNT(DISTINCT CASE WHEN user_id IN (SELECT k FROM tomb)
                  THEN user_id END) AS BIGINT) AS purged_keys
  FROM events
),
cu AS (
  SELECT 'customer.c_custkey', CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN c_custkey IN (SELECT k FROM tomb)
                  THEN 1 ELSE 0 END) AS BIGINT),
         CAST(SUM(CASE WHEN c_custkey IN (SELECT k FROM tomb)
                  THEN 0 ELSE 1 END) AS BIGINT),
         CAST(COUNT(DISTINCT CASE WHEN c_custkey IN (SELECT k FROM tomb)
                  THEN c_custkey END) AS BIGINT)
  FROM customer
),
orc AS (
  SELECT 'orders.o_custkey', CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN o_custkey IN (SELECT k FROM tomb)
                  THEN 1 ELSE 0 END) AS BIGINT),
         CAST(SUM(CASE WHEN o_custkey IN (SELECT k FROM tomb)
                  THEN 0 ELSE 1 END) AS BIGINT),
         CAST(COUNT(DISTINCT CASE WHEN o_custkey IN (SELECT k FROM tomb)
                  THEN o_custkey END) AS BIGINT)
  FROM orders
),
li AS (
  SELECT 'lineitem.l_orderkey(cascade)', CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN l_orderkey IN (SELECT k FROM ord_tomb)
                  THEN 1 ELSE 0 END) AS BIGINT),
         CAST(SUM(CASE WHEN l_orderkey IN (SELECT k FROM ord_tomb)
                  THEN 0 ELSE 1 END) AS BIGINT),
         CAST(COUNT(DISTINCT CASE WHEN l_orderkey IN (SELECT k FROM ord_tomb)
                  THEN l_orderkey END) AS BIGINT)
  FROM lineitem
)
SELECT * FROM ev UNION ALL SELECT * FROM cu
UNION ALL SELECT * FROM orc UNION ALL SELECT * FROM li
ORDER BY relation
""",
    doc="GDPR/CCPA erasure-cascade audit: a frozen tombstone rule "
    "(c_custkey % 17 = 3) propagated through the FK graph — direct "
    "hits in customer/orders/events, TRANSITIVE cascade into lineitem "
    "via the order keys of tombstoned customers — with per-relation "
    "total/purged/kept/distinct-key counts as the deletion evidence. "
    "Each relation reduces to one row before the union; cascade "
    "tombstones stay key-projected; no forced broadcast "
    "(operators/governance.py)",
    headline=True,
    tags=("warehouse", "governance", "join"),
)
def q_erasure_cascade_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_engineering_project_spark.operators.governance import (
        erasure_audit,
    )

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")
    tomb = cust.filter(F.col("c_custkey") % 17 == 3).select("c_custkey")
    ord_tomb = (
        orders.join(
            tomb, orders["o_custkey"] == tomb["c_custkey"], "left_semi"
        ).select("o_orderkey")
    )
    return erasure_audit(
        [
            ("events.user_id", ev, "user_id", tomb),
            ("customer.c_custkey", cust, "c_custkey", tomb),
            ("orders.o_custkey", orders, "o_custkey", tomb),
            ("lineitem.l_orderkey(cascade)", li, "l_orderkey", ord_tomb),
        ]
    ).orderBy("relation")


@register(
    "q_pareto_parts",
    oracle="""
WITH pts AS MATERIALIZED (
  SELECT p_partkey, p_retailprice AS price, p_size AS size_v FROM part
)
SELECT p.p_partkey, p.price, p.size_v
FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM pts q
  WHERE q.price <= p.price AND q.size_v >= p.size_v
    AND (q.price < p.price OR q.size_v > p.size_v)
)
ORDER BY price, size_v, p_partkey
""",
    doc="Pareto frontier of the part catalog under (minimize retail "
    "price, maximize size): the cheapest-for-their-size parts no "
    "other part dominates. The oracle is the quadratic NOT-EXISTS "
    "self-join; the operator is the linear two-phase prefix-max "
    "(range-repartition + exclusive local running max + broadcast "
    "per-partition offsets — the global_row_number discipline, no "
    "corpus-wide window), so the gate proves skyline-via-prefix-max "
    "== naive dominance semantics, including duplicate-point and "
    "equal-x tie rules (operators/frontier.py:pareto_frontier_2d)",
    headline=True,
    tags=("warehouse", "analytics", "window"),
)
def q_pareto_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_engineering_project_spark.operators.frontier import (
        pareto_frontier_2d,
    )

    part = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_retailprice").alias("price"),
        F.col("p_size").alias("size_v"),
    )
    return pareto_frontier_2d(part, "price", "size_v").orderBy(
        "price", "size_v", "p_partkey"
    )


@register(
    "q_dq_validation",
    oracle="""
WITH a AS (
  SELECT COUNT(*) AS n,
         SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS nulls_v,
         COUNT(DISTINCT event_id) AS d_id,
         CAST(MIN(value) AS DOUBLE) AS min_v,
         CAST(MAX(value) AS DOUBLE) AS max_v,
         SUM(CASE WHEN event_type IN
               ('click','view','purchase','signup','error')
               OR event_type IS NULL THEN 0 ELSE 1 END) AS bad_type
  FROM events
)
SELECT r.rule, r.kind, r.passed, r.observed, r.threshold FROM a,
LATERAL (VALUES
  ('value_null_rate', 'not_null_rate',
   CAST(nulls_v AS DOUBLE) / n <= 0.01,
   CAST(nulls_v AS DOUBLE) / n, 0.01),
  ('event_id_unique', 'unique',
   CAST(n - d_id AS DOUBLE) <= 0.0, CAST(n - d_id AS DOUBLE), 0.0),
  ('value_min', 'min_bound', min_v >= 0.0, min_v, 0.0),
  ('value_max', 'max_bound', max_v <= 1000.0, max_v, 1000.0),
  ('event_type_domain', 'accepted_values',
   CAST(bad_type AS DOUBLE) <= 0.0, CAST(bad_type AS DOUBLE), 0.0)
) AS r(rule, kind, passed, observed, threshold)
ORDER BY rule
""",
    doc="Declarative data-quality assertion suite over events "
    "(Great-Expectations shape): null-rate bound, key uniqueness, "
    "value range, accepted type domain — all five rules compiled "
    "into ONE aggregation over one scan, then exploded to a "
    "rule-per-row verdict table; rates are single IEEE divisions of "
    "exact counts (operators/governance.py:dq_validate)",
    tags=("warehouse", "governance", "profiling"),
)
def q_dq_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_engineering_project_spark.operators.governance import (
        dq_validate,
    )

    ev = load_table(spark, sf_dir, "events")
    rules = [
        {"name": "value_null_rate", "kind": "not_null_rate",
         "col": "value", "max_null_rate": 0.01},
        {"name": "event_id_unique", "kind": "unique", "col": "event_id"},
        {"name": "value_min", "kind": "min_bound", "col": "value",
         "bound": 0.0},
        {"name": "value_max", "kind": "max_bound", "col": "value",
         "bound": 1000.0},
        {"name": "event_type_domain", "kind": "accepted_values",
         "col": "event_type",
         "vals": ["click", "view", "purchase", "signup", "error"]},
    ]
    return dq_validate(ev, rules).orderBy("rule")


@register(
    "q_agg_maintenance",
    oracle="""
WITH facts AS (
  SELECT event_type,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events
),
state AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(cents AS HUGEINT)) AS s1,
         SUM(CAST(cents AS HUGEINT) * cents) AS s2,
         MIN(cents) AS mn, MAX(cents) AS mx
  FROM facts GROUP BY 1
)
SELECT event_type, n,
       CAST(s1 AS BIGINT) AS total,
       CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
       CASE WHEN n > 1 THEN
         CAST(n * s2 - s1 * s1 AS DOUBLE)
           / CAST(n * (n - 1) AS DOUBLE)
       END AS var_samp,
       mn, mx
FROM state ORDER BY event_type
""",
    doc="Incremental aggregate maintenance (materialized-view upkeep): "
    "per-type count/total/mean/sample-variance/min/max served from "
    "MERGED sufficient-statistic states — the month is split at day "
    "20, each half reduced to per-key (n, Σ, Σ², min, max) state, the "
    "two states folded with agg_merge, and the result proven "
    "hash-equal to the oracle's full recompute. The fold is a "
    "commutative monoid, so any load partitioning yields the bit-same "
    "state; linear stats retract under a ±1 changelog (pytest), "
    "min/max refuse retraction loudly. Exact DECIMAL(38,0)/HUGEINT "
    "integer-cents moments; mean and variance each spend exactly one "
    "mirrored IEEE division (operators/ivm.py)",
    headline=False,
    tags=("warehouse", "cdc"),
)
def q_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_engineering_project_spark.operators.ivm import (
        agg_finish,
        agg_merge,
        agg_state,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    split = F.col("ts") < F.lit("2024-01-21").cast("timestamp")
    state = agg_state(ev.filter(split), ["event_type"], "cents")
    delta = agg_state(ev.filter(~split), ["event_type"], "cents")
    return agg_finish(agg_merge(state, delta, ["event_type"]), ["event_type"]).orderBy(
        "event_type"
    )


# --- privacy release gate: k-anonymity / l-diversity ---------------------------


@register(
    "q_k_anonymity_audit",
    oracle="""
SELECT c_nationkey, c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS class_size,
       CAST(COUNT(DISTINCT sens)
            + MAX(CASE WHEN sens IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS sensitive_diversity,
       COUNT(*) < 10 AS below_k,
       (COUNT(DISTINCT sens)
        + MAX(CASE WHEN sens IS NULL THEN 1 ELSE 0 END)) < 3 AS below_l
FROM (
  SELECT c_nationkey, c_mktsegment,
         CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS sens
  FROM customer
)
GROUP BY 1, 2
ORDER BY 1, 2
""",
    doc="Privacy release gate: k-anonymity (class_size < 10) and "
    "l-diversity (< 3 distinct sensitive balance-bands — the "
    "homogeneity attack k alone misses) per (nation, segment) "
    "quasi-identifier class over customer. One partial-aggregable "
    "groupBy; the exchange carries QI values + counters, never rows "
    "— the governance family's sharing-side complement to the "
    "erasure audit (operators/governance.py:k_anonymity_audit)",
    tags=("warehouse", "governance"),
)
def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_engineering_project_spark.operators.governance import (
        k_anonymity_audit,
    )

    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("sens"),
    )
    return k_anonymity_audit(
        cust, ["c_nationkey", "c_mktsegment"], "sens", k=10, l=3
    ).orderBy("c_nationkey", "c_mktsegment")
