"""Temporal join queries (as-of / banded range) over the events fixture.

North-star extensions (the reference is join-free, SURVEY.md §2.5):
the two time-series join shapes Spark lacks a first-class operator
for. Both have exact DuckDB oracles — ASOF JOIN is built into DuckDB,
and the band join's oracle is the plain (IEJoin-planned) inequality
join, so the bucketized rewrite is verified against the naive
formulation it replaces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_engineering_project_spark.operators.temporal import (
    asof_join_backward,
    asof_join_backward_salted,
    asof_join_forward,
    band_join,
)
from big_data_engineering_project_spark.plans.registry import register
from big_data_engineering_project_spark.sources.catalog import load_table

_SPIKE_VALUE = 300.0
_SPIKE_WINDOW_S = 30 * 60


@register(
    "q_asof_last_purchase",
    oracle="""
WITH purch AS (
  SELECT user_id, ts AS purchase_ts, MAX(event_id) AS purchase_id
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
),
clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
)
SELECT c.event_id, c.user_id, c.ts,
       p.purchase_ts AS asof_purchase_ts, p.purchase_id AS asof_purchase_id
FROM clicks c ASOF LEFT JOIN purch p
  ON c.user_id = p.user_id AND c.ts >= p.purchase_ts
ORDER BY c.event_id
""",
    doc="As-of join: each click ⟵ the user's most recent purchase at-or-before "
    "it (union+window form, one shuffle, no row multiplication)",
    headline=True,
    tags=("temporal", "join"),
)
def q_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    # unique per (user, ts): ties collapse to the max event_id, so the
    # carried payload is deterministic (asof_join_backward contract)
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").alias("purchase_ts"))
        .agg(F.max("event_id").alias("purchase_id"))
    )
    return asof_join_backward(
        clicks,
        purchases,
        key="user_id",
        left_time="ts",
        right_time="purchase_ts",
        payload_cols=["purchase_id"],
    ).orderBy("event_id")


@register(
    "q_asof_salted",
    oracle="""
WITH purch AS (
  SELECT user_id, ts AS purchase_ts, MAX(event_id) AS purchase_id
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
),
clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
)
SELECT c.event_id, c.user_id, c.ts,
       p.purchase_ts AS asof_purchase_ts, p.purchase_id AS asof_purchase_id
FROM clicks c ASOF LEFT JOIN purch p
  ON c.user_id = p.user_id AND c.ts >= p.purchase_ts
ORDER BY c.event_id
""",
    doc="Skew-safe as-of join: the same result as q_asof_last_purchase "
    "through the (key, time-bucket)-partitioned two-pass form "
    "(asof_join_backward_salted, 6 h buckets) — the oracle is the "
    "direct ASOF JOIN, so the gate proves salted ≡ unsalted. At 100 TB "
    "this is the plan for hot keys whose history exceeds one partition",
    headline=True,  # r5: timed beside the unsalted form it must match
    tags=("temporal", "join"),
)
def q_asof_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").alias("purchase_ts"))
        .agg(F.max("event_id").alias("purchase_id"))
    )
    return asof_join_backward_salted(
        clicks,
        purchases,
        key="user_id",
        left_time="ts",
        right_time="purchase_ts",
        payload_cols=["purchase_id"],
        bucket_seconds=6 * 3600,
    ).orderBy("event_id")


@register(
    "q_asof_next_purchase",
    oracle="""
WITH purch AS (
  SELECT user_id, ts AS purchase_ts, MAX(event_id) AS purchase_id
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
),
clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
)
SELECT c.event_id, c.user_id, c.ts,
       p.purchase_ts AS asof_purchase_ts, p.purchase_id AS asof_purchase_id
FROM clicks c ASOF LEFT JOIN purch p
  ON c.user_id = p.user_id AND c.ts <= p.purchase_ts
ORDER BY c.event_id
""",
    doc="FORWARD as-of join: each click ⟶ the user's next purchase "
    "at-or-after it (the time-reversed union+window form, one shuffle; "
    "oracle is DuckDB's native forward ASOF) — the conversion-lag "
    "primitive the backward form can't express",
    tags=("temporal", "join"),
)
def q_asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").alias("purchase_ts"))
        .agg(F.max("event_id").alias("purchase_id"))
    )
    return asof_join_forward(
        clicks,
        purchases,
        key="user_id",
        left_time="ts",
        right_time="purchase_ts",
        payload_cols=["purchase_id"],
    ).orderBy("event_id")


@register(
    "q_asof_forward_salted",
    oracle="""
WITH purch AS (
  SELECT user_id, ts AS purchase_ts, MAX(event_id) AS purchase_id
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
),
clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
)
SELECT c.event_id, c.user_id, c.ts,
       p.purchase_ts AS asof_purchase_ts, p.purchase_id AS asof_purchase_id
FROM clicks c ASOF LEFT JOIN purch p
  ON c.user_id = p.user_id AND c.ts <= p.purchase_ts
ORDER BY c.event_id
""",
    doc="Skew-safe FORWARD as-of join — the fourth cell of the "
    "temporal-join matrix {backward, forward} × {unsalted, salted}: "
    "the same result as q_asof_next_purchase through the (key, "
    "time-bucket)-partitioned two-pass form (asof_join_forward_salted, "
    "6 h buckets, carry from strictly LATER buckets). The oracle is "
    "DuckDB's native forward ASOF, so the gate proves salted-forward ≡ "
    "unsalted-forward every round, like the backward pair",
    tags=("temporal", "join"),
)
def q_asof_forward_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_engineering_project_spark.operators.temporal import (
        asof_join_forward_salted,
    )

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").alias("purchase_ts"))
        .agg(F.max("event_id").alias("purchase_id"))
    )
    return asof_join_forward_salted(
        clicks,
        purchases,
        key="user_id",
        left_time="ts",
        right_time="purchase_ts",
        payload_cols=["purchase_id"],
        bucket_seconds=6 * 3600,
    ).orderBy("event_id")


@register(
    "q_spike_window_counts",
    oracle=f"""
WITH spikes AS (
  SELECT event_id AS spike_id, ts AS spike_ts
  FROM events WHERE "value" > {_SPIKE_VALUE}
)
SELECT spike_id, spike_ts, COUNT(*) AS n_events
FROM spikes JOIN events e
  ON e.ts >= spike_ts AND e.ts < spike_ts + INTERVAL {_SPIKE_WINDOW_S} SECOND
GROUP BY 1, 2
ORDER BY spike_id
""",
    doc="Banded range join (no equality key): events inside the 30-min window "
    "after each value spike — band equi-join instead of nested-loop",
    headline=True,
    tags=("temporal", "join"),
)
def q_spike_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    spikes = ev.filter(F.col("value") > _SPIKE_VALUE).select(
        F.col("event_id").alias("spike_id"), F.col("ts").alias("spike_ts")
    )
    pairs = band_join(
        ev.select(F.col("ts")),
        spikes,
        left_time="ts",
        right_time="spike_ts",
        window_seconds=_SPIKE_WINDOW_S,
    )
    return (
        pairs.groupBy("spike_id", "spike_ts")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("spike_id")
    )


@register(
    "q_rollup_cascade",
    oracle="""
SELECT 'minute' AS granularity,
       strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M') AS bucket_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST("value" AS DECIMAL(18, 6))) AS DOUBLE) AS sum_value
FROM events GROUP BY 2
UNION ALL
SELECT 'hour',
       strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M'),
       COUNT(*),
       CAST(SUM(CAST("value" AS DECIMAL(18, 6))) AS DOUBLE)
FROM events GROUP BY 2
UNION ALL
SELECT 'day',
       strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M'),
       COUNT(*),
       CAST(SUM(CAST("value" AS DECIMAL(18, 6))) AS DOUBLE)
FROM events GROUP BY 2
ORDER BY granularity, bucket_start
""",
    doc="Multi-resolution rollup cascade (continuous-aggregate pattern): "
    "minute partials computed ONCE from raw events; hour derives from "
    "minute partials, day from hour — coarser levels re-aggregate "
    "counters instead of re-scanning the fact table (at 100 TB the "
    "minute partials are the only full scan; the oracle computes each "
    "level directly, proving cascade ≡ direct). Decimal-stabilized "
    "value sums keep every level combine-order-independent",
    headline=True,  # r5: the single-scan cascade claim gets timed
    tags=("temporal", "rollup"),
)
def q_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One scan, one fact-table shuffle: minute partials first, then
    # each partial EXPLODES into its (minute, hour, day) bucket labels
    # and a single re-aggregation over the (tiny) partial rows builds
    # every level. A naive union of three per-level aggregations plans
    # three scans (ReuseExchange does not fire across the branches —
    # verified on the physical plan); this form is structurally
    # single-scan. test_plans pins it.
    ev = load_table(spark, sf_dir, "events")
    minute = ev.groupBy(
        F.date_trunc("minute", F.col("ts")).alias("m")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_dec"),
    )
    levels = F.array(
        F.struct(F.lit("minute").alias("granularity"), F.col("m").alias("bucket")),
        F.struct(
            F.lit("hour").alias("granularity"),
            F.date_trunc("hour", F.col("m")).alias("bucket"),
        ),
        F.struct(
            F.lit("day").alias("granularity"),
            F.date_trunc("day", F.col("m")).alias("bucket"),
        ),
    )
    return (
        minute.select(
            F.explode(levels).alias("lv"), "n_events", "sum_dec"
        )
        .groupBy(
            F.col("lv.granularity").alias("granularity"),
            F.col("lv.bucket").alias("bucket"),
        )
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("sum_dec").alias("sum_dec"),
        )
        .select(
            "granularity",
            F.date_format("bucket", "yyyy-MM-dd HH:mm").alias("bucket_start"),
            "n_events",
            F.col("sum_dec").cast("double").alias("sum_value"),
        )
        .orderBy("granularity", "bucket_start")
    )


# --- Gap-fill resampling (LOCF onto a 6-hour grid) ----------------------------

_GF_STEP = 21_600  # 6 hours


@register(
    "q_gap_fill_6h",
    headline=True,
    oracle=f"""
WITH ev AS (
  SELECT user_id AS k, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
         event_id AS id, "value" AS v
  FROM events
),
bounds AS (
  SELECT k, (MIN(sec) // {_GF_STEP}) AS g0, (MAX(sec) // {_GF_STEP}) AS g1
  FROM ev GROUP BY k
),
grid AS (
  SELECT k, CAST(s.g AS BIGINT) AS sec,
         CAST(9000000000000000000 AS BIGINT) AS id,
         CAST(NULL AS DOUBLE) AS v, 0 AS is_obs
  FROM bounds,
       unnest(generate_series(g0 * {_GF_STEP}, g1 * {_GF_STEP}, {_GF_STEP}))
         AS s(g)
),
un AS (
  SELECT k, sec, id, v, 1 AS is_obs FROM ev
  UNION ALL SELECT k, sec, id, v, is_obs FROM grid
),
filled AS (
  SELECT k, sec, is_obs,
         last_value(v IGNORE NULLS) OVER (
           PARTITION BY k ORDER BY sec ASC, is_obs DESC, id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fv
  FROM un
)
SELECT k AS user_id, make_timestamp(sec * 1000000) AS grid_ts,
       fv AS "value"
FROM filled WHERE is_obs = 0
ORDER BY user_id, grid_ts
""",
    doc="LOCF gap-fill of each user's value series onto a regular "
    "6-hour grid (timescale-style locf(time_bucket(...))): per-key "
    "integer-second grid via sequence+explode, ONE keyed window takes "
    "the running last non-null with observations-before-grid-points "
    "tie order (newest event_id wins same-second ties "
    "deterministically). Values are CARRIED doubles — no arithmetic — "
    "so the fill is exact cross-engine; pre-first-observation grid "
    "points stay NULL. Two key exchanges, no join, no row "
    "multiplication beyond the grid (operators/temporal.gap_fill_locf)",
    tags=("temporal", "window"),
)
def q_gap_fill_6h(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_engineering_project_spark.operators.temporal import (
        gap_fill_locf,
    )

    ev = load_table(spark, sf_dir, "events")
    return gap_fill_locf(
        ev, "user_id", "ts", "value", _GF_STEP, "event_id"
    ).orderBy("user_id", "grid_ts")


# --- Native session_window ≡ lag-island sessionization ------------------------


@register(
    "q_session_window_native",
    oracle="""
WITH o AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS sid
  FROM o
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events
FROM s
GROUP BY user_id, sid
ORDER BY user_id, session_start
""",
    doc="Spark's NATIVE session_window aggregation (gap-merged "
    "event-time windows, the batch twin of the streaming session "
    "operator) proven ≡ the classic lag-island sessionization: the "
    "oracle is the lag+cumsum islands form, so the gate pins Spark's "
    "merge semantics (new session iff gap ≥ 30 min; end = last event "
    "+ gap) against the first-principles construction every round — "
    "microsecond-exact, no arithmetic beyond one interval add",
    tags=("temporal", "window", "session"),
)
def q_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


# --- Interval join (batch twin of streaming/joins.interval_join_streams) ------


@register(
    "q_click_purchase_interval",
    oracle="""
SELECT c.event_id AS click_id, b.event_id AS buy_id, c.user_id
FROM events c JOIN events b
  ON c.user_id = b.user_id
 AND b.ts >= c.ts
 AND b.ts <= c.ts + INTERVAL 30 MINUTE
WHERE c.event_type = 'click' AND b.event_type = 'purchase'
ORDER BY click_id, buy_id
""",
    doc="Interval join: every purchase within 30 min of a same-user "
    "click — the BATCH twin of streaming/joins.interval_join_streams "
    "(identical expression; watermarks are no-ops on batch frames), so "
    "the gate pins the operator's time-range semantics while the "
    "stream≡batch pytest pins its state behavior. Equality on user_id "
    "keeps it a keyed sort-merge join with the range as a post-"
    "condition — never a nested-loop product",
    tags=("temporal", "join", "streaming-twin"),
)
def q_click_purchase_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_engineering_project_spark.streaming.joins import (
        interval_join_streams,
    )

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("buy_id"),
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("buy_ts"),
    )
    return (
        interval_join_streams(
            clicks, buys, "c_user", "b_user", "click_ts", "buy_ts", 30 * 60
        )
        .select("click_id", "buy_id", F.col("c_user").alias("user_id"))
        .orderBy("click_id", "buy_id")
    )


# --- Linear-interpolation gap-fill (the other resample mode) -----------------


@register(
    "q_gap_fill_interp_6h",
    oracle=f"""
WITH ev AS (
  SELECT user_id AS k, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
         event_id AS id, "value" AS v
  FROM events
),
bounds AS (
  SELECT k, (MIN(sec) // {_GF_STEP}) AS g0, (MAX(sec) // {_GF_STEP}) AS g1
  FROM ev GROUP BY k
),
grid AS (
  SELECT k, CAST(s.g AS BIGINT) AS sec,
         CAST(9000000000000000000 AS BIGINT) AS id,
         CAST(NULL AS DOUBLE) AS v, 0 AS is_obs
  FROM bounds,
       unnest(generate_series(g0 * {_GF_STEP}, g1 * {_GF_STEP}, {_GF_STEP}))
         AS s(g)
),
un AS (
  SELECT k, sec, id, v, 1 AS is_obs FROM ev
  UNION ALL SELECT k, sec, id, v, is_obs FROM grid
),
br AS (
  SELECT k, sec, is_obs,
    last_value(CASE WHEN is_obs = 1 THEN sec END IGNORE NULLS) OVER (
      PARTITION BY k ORDER BY sec ASC, is_obs DESC, id ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ps,
    last_value(CASE WHEN is_obs = 1 THEN v END IGNORE NULLS) OVER (
      PARTITION BY k ORDER BY sec ASC, is_obs DESC, id ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
    first_value(CASE WHEN is_obs = 1 THEN sec END IGNORE NULLS) OVER (
      PARTITION BY k ORDER BY sec ASC, is_obs DESC, id ASC
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ns,
    first_value(CASE WHEN is_obs = 1 THEN v END IGNORE NULLS) OVER (
      PARTITION BY k ORDER BY sec ASC, is_obs DESC, id ASC
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv
  FROM un
)
SELECT k AS user_id, make_timestamp(sec * 1000000) AS grid_ts,
  CASE WHEN ps = sec THEN pv
       WHEN ps IS NOT NULL AND ns IS NOT NULL THEN
         pv + (nv - pv) * CAST(sec - ps AS DOUBLE) / CAST(ns - ps AS DOUBLE)
  END AS "value"
FROM br WHERE is_obs = 0
ORDER BY user_id, grid_ts
""",
    doc="Linear-interpolation resample onto the 6-hour grid (the "
    "timescale-style interpolate(time_bucket(...)) beside the LOCF "
    "twin): per grid point the bracketing observations come from a "
    "forward and a backward window pass over ONE (key, sec, "
    "obs-first, id) sort — no join; the single interpolation "
    "expression runs on integer seconds + raw parquet doubles, "
    "mirrored operand-for-operand, so it is exact cross-engine; no "
    "extrapolation outside [first, last] "
    "(operators/temporal.gap_fill_interpolate)",
    tags=("temporal", "window"),
)
def q_gap_fill_interp_6h(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_engineering_project_spark.operators.temporal import (
        gap_fill_interpolate,
    )

    ev = load_table(spark, sf_dir, "events")
    return gap_fill_interpolate(
        ev, "user_id", "ts", "value", _GF_STEP, "event_id"
    ).orderBy("user_id", "grid_ts")


@register(
    "q_twap_daily",
    oracle="""
WITH obs AS (
  SELECT event_type, date_trunc('day', ts) AS bucket_ts,
         CAST(round(value * 100, 0) AS BIGINT) AS units,
         epoch_us(ts) AS us,
         lead(epoch_us(ts)) OVER (
           PARTITION BY event_type, date_trunc('day', ts)
           ORDER BY ts, event_id) AS next_us
  FROM events
)
SELECT event_type, bucket_ts,
       CAST(COUNT(*) AS BIGINT) AS n_obs,
       CAST(COALESCE(SUM(next_us - us), 0) AS BIGINT) AS span_us,
       CASE WHEN COALESCE(SUM(next_us - us), 0) > 0 THEN
         CAST(SUM(CAST(units AS HUGEINT) * (next_us - us)) AS DOUBLE)
         / (CAST(SUM(next_us - us) AS DOUBLE) * 100.0)
       END AS twap
FROM obs
GROUP BY 1, 2
ORDER BY event_type, bucket_ts
""",
    doc="Per-(event_type, day) time-weighted average of value — "
    "timescaledb's time_weight('LOCF')/finance TWAP beside the OHLC "
    "bars: each observation weighted by how long it was in effect "
    "(lead-gap integral over the LOCF step function), so bursts don't "
    "over-weight the mean the way plain AVG does. Integer units x "
    "integer epoch-us integral in DECIMAL(38,0)/HUGEINT, one mirrored "
    "IEEE division; last-observation-zero-weight and empty-span->NULL "
    "semantics pinned by the oracle "
    "(operators/temporal.py:time_weighted_avg)",
    headline=True,
    tags=("temporal", "window", "agg"),
)
def q_twap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_engineering_project_spark.operators.temporal import (
        time_weighted_avg,
    )

    ev = load_table(spark, sf_dir, "events")
    return time_weighted_avg(
        ev, keys=["event_type"], time_col="ts", value_col="value",
        id_col="event_id", bucket="day",
    ).orderBy("event_type", "bucket_ts")


# --- Keyless interval-overlap join ---------------------------------------------

_IOJ_TOP_HOURS = 20
_IOJ_BIN_S = 7 * 24 * 3600  # weekly bins ~ typical fulfillment span
# The events table lives in 2024-01 while the order book spans
# 1995-2001 (TESTDATA.md) — raw hours can never overlap a fulfillment
# span. The query REPLAYS each spike hour 27 years back
# (epoch('2024-01-01') - epoch('1997-01-01'), a frozen integer) so the
# replayed windows land mid-book and the overlap join is exercised on
# a non-empty pair set at every SF. spike_hour keeps the original 2024
# identity; only the interval endpoints shift.
_IOJ_REPLAY_SHIFT_S = 851_990_400


@register(
    "q_spike_order_overlap",
    oracle=f"""
WITH oi AS (
  SELECT o.o_orderkey,
         CAST(epoch(o.o_orderdate) AS BIGINT) AS s,
         CAST(epoch(li.mx) AS BIGINT) AS e,
         o.o_totalprice
  FROM orders o
  JOIN (SELECT l_orderkey, MAX(l_shipdate) AS mx
        FROM lineitem GROUP BY 1) li
    ON o.o_orderkey = li.l_orderkey
),
spikes AS (
  SELECT hr, CAST(epoch(hr) AS BIGINT) - {_IOJ_REPLAY_SHIFT_S} AS s,
         CAST(epoch(hr) + 3599 AS BIGINT) - {_IOJ_REPLAY_SHIFT_S} AS e
  FROM (
    SELECT date_trunc('hour', ts) AS hr, COUNT(*) AS c
    FROM events GROUP BY 1
    ORDER BY c DESC, hr ASC LIMIT {_IOJ_TOP_HOURS}
  )
)
SELECT spikes.hr AS spike_hour,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(oi.o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
         AS overlap_value
FROM spikes JOIN oi ON oi.s <= spikes.e AND spikes.s <= oi.e
GROUP BY 1 ORDER BY 1
""",
    doc=f"Keyless interval-overlap join: the {_IOJ_TOP_HOURS} busiest "
    "event hours (total-order top-k), replayed 27 years back into the "
    "order-book epoch (frozen integer shift — the fixtures' event and "
    "order clocks are disjoint), overlapped against every order's "
    "fulfillment span [orderdate, last shipdate] — window×window "
    "temporal matching, the join shape neither the as-of (point→"
    "nearest) nor the band join (point→window) can express. Plan: "
    "both interval sets replicate to weekly bins (bounded explode), "
    "EQUI-join on the bin (AQE-splittable — the naive form is a "
    "cross join with a range filter), overlap verified in-join, each "
    "pair emitted exactly once via the canonical max-start bin (no "
    "dedup shuffle). Oracle is that naive quadratic join; decimal "
    "value sums (operators/temporal.py:interval_overlap_join)",
    tags=("temporal", "join"),
)
def q_spike_order_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_engineering_project_spark.operators.temporal import (
        interval_overlap_join,
    )

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    oi = (
        orders.join(
            li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("mx")),
            orders["o_orderkey"] == F.col("l_orderkey"),
        )
        .select(
            "o_orderkey",
            F.unix_timestamp("o_orderdate").alias("s"),
            F.unix_timestamp("mx").alias("e"),
            "o_totalprice",
        )
    )
    ev = load_table(spark, sf_dir, "events")
    spikes = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hr"))
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("hr").asc())
        .limit(_IOJ_TOP_HOURS)
        .select(
            "hr",
            (F.unix_timestamp("hr") - F.lit(_IOJ_REPLAY_SHIFT_S)).alias("s"),
            (F.unix_timestamp("hr") + 3599 - F.lit(_IOJ_REPLAY_SHIFT_S)).alias(
                "e"
            ),
        )
    )
    pairs = interval_overlap_join(oi, spikes, _IOJ_BIN_S)
    dec = F.col("o_totalprice_a").cast("decimal(18,6)")
    return (
        pairs.groupBy(F.col("hr_b").alias("spike_hour"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(dec).cast("double").alias("overlap_value"),
        )
        .orderBy("spike_hour")
    )


# --- sweep-line concurrency profile ---------------------------------------------


@register(
    "q_order_concurrency",
    oracle="""
WITH oi AS (
  SELECT o.o_orderpriority AS pri, o.o_orderdate AS s,
         li.mx + INTERVAL 1 DAY AS e1
  FROM orders o
  JOIN (SELECT l_orderkey, MAX(l_shipdate) AS mx
        FROM lineitem GROUP BY 1) li
    ON o.o_orderkey = li.l_orderkey
),
deltas AS (
  SELECT pri, t, SUM(d) AS nd FROM (
    SELECT pri, s AS t, 1 AS d FROM oi
    UNION ALL
    SELECT pri, e1 AS t, -1 AS d FROM oi
  ) GROUP BY 1, 2
),
runs AS (
  SELECT pri, t,
         SUM(nd) OVER (PARTITION BY pri ORDER BY t) AS conc
  FROM deltas
),
picked AS (
  SELECT pri, t, conc,
         ROW_NUMBER() OVER (PARTITION BY pri
                            ORDER BY conc DESC, t ASC) AS rn
  FROM runs
)
SELECT pri AS o_orderpriority,
       CAST(conc AS BIGINT) AS max_concurrent,
       t AS peak_ts
FROM picked WHERE rn = 1 ORDER BY 1
""",
    doc="Sweep-line concurrency: per order priority, the PEAK number "
    "of simultaneously-open fulfillment spans [orderdate, last "
    "shipdate] and the first day it is reached — the capacity-"
    "planning question (peak open orders / live sessions / active "
    "incidents) as an event-boundary aggregation. The prefix sum is "
    "TWO-LEVEL (within-month window + rolling per-month offsets), so "
    "a 5-value key never funnels every boundary into one sort task — "
    "the low-cardinality-key hazard the naive single window has; the "
    "oracle IS that naive window (operators/temporal.py:"
    "concurrency_profile)",
    headline=True,
    tags=("temporal", "window"),
)
def q_order_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_engineering_project_spark.operators.temporal import (
        concurrency_profile,
    )

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    oi = orders.join(
        li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("mx")),
        orders["o_orderkey"] == F.col("l_orderkey"),
    ).select(
        F.col("o_orderpriority"),
        F.col("o_orderdate").alias("s"),
        F.col("mx").alias("e"),
    )
    return concurrency_profile(
        oi, ["o_orderpriority"], "s", "e", bucket="month"
    ).orderBy("o_orderpriority")
