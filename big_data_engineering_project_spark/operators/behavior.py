"""User-behavior analytics over the event stream: gap sessionization,
funnel conversion, transition matrices, rolling per-key aggregates,
exact grouped quantiles.

North-star extensions (the reference's per-author running counts,
`S/kinesis_processing_2.py:93-99`, are the seed idea — these are the
standard large-scale generalizations every event warehouse runs).
All pure Catalyst; every operator is one shuffle on its natural key.

Scale posture (100 TB events):
- Every window here partitions by user_id — the natural high-
  cardinality key, so partitions are balanced by construction (no
  single user holds a meaningful fraction of a 100 TB stream; if one
  did, per-user history is still bounded by time retention).
- sessionize / transitions / rolling share ONE Window spec per
  operator: lag + running-sum over the same (partition, order) spec
  plan into a single Exchange + Sort (Catalyst reuses the child), so
  session assignment costs exactly one shuffle of the events.
- funnel reduces each side to per-user scalars BEFORE joining
  (partial-agg pushes the heavy reduction map-side); the join ships
  two (user_id, ts) tables, never raw events.
- grouped_quantiles uses exact percentile (sort-based agg) — right for
  bounded group counts; at 100 TB with high-cardinality groups the
  scale path is approx_percentile (t-digest sketch, map-side
  combinable), same call shape, documented at the call site.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _event_order(ts_col: str, tiebreak_col: str):
    # Total order inside a user: ts then the unique event id — windows
    # over a non-total order are engine/partition-order dependent.
    return [F.col(ts_col), F.col(tiebreak_col)]


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Assign gap-based session indexes: a new session starts when the
    user's inter-event gap exceeds `gap_seconds` (the classic web-
    analytics sessionization every warehouse implements).

    Adds `session_idx` (0-based per user, ordered). Arithmetic is on
    integer epoch-µs (unix_micros) — exact, no float timestamps.
    One shuffle: lag and the running sum share the same window spec.
    """
    w = Window.partitionBy(user_col).orderBy(*_event_order(ts_col, tiebreak_col))
    us = F.unix_micros(F.col(ts_col))
    prev = F.lag(us).over(w)
    brk = F.when(
        prev.isNull() | ((us - prev) > gap_seconds * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_idx", F.sum(brk).over(wsum) - F.lit(1))


def session_stats(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Per-session summary: start/end, event count, exact µs duration.

    groupBy lands on the keys the sessionize window already
    partitioned by, so the aggregation after the window is shuffle-
    free in practice (AQE reuses the exchange; worst case it's a
    partial-agg of already-clustered rows).
    """
    sess = sessionize(df, user_col, ts_col, gap_seconds, tiebreak_col)
    return sess.groupBy(
        F.col(user_col), F.col("session_idx").cast("long").alias("session_idx")
    ).agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (
            F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col))
        ).alias("duration_us"),
    )


def funnel_conversion(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    from_type: str,
    to_type: str,
    within_seconds: int,
) -> DataFrame:
    """Per-user funnel: first `from_type` event, then the earliest
    `to_type` event at-or-after it; converted iff within the window.

    Both sides collapse to per-user scalars before the join (map-side
    partial agg does the heavy lifting); the conditional min over the
    joined frame resolves "earliest B after A" without a window.
    """
    a = (
        df.filter(F.col(type_col) == from_type)
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("entered_ts"))
    )
    b = df.filter(F.col(type_col) == to_type).select(
        user_col, F.col(ts_col).alias("b_ts")
    )
    entered_us = F.unix_micros(F.col("entered_ts"))
    conv = (
        a.join(b, user_col, "left")
        .groupBy(user_col, "entered_ts")
        .agg(
            F.min(
                F.when(F.col("b_ts") >= F.col("entered_ts"), F.col("b_ts"))
            ).alias("converted_ts")
        )
    )
    return conv.select(
        user_col,
        "entered_ts",
        "converted_ts",
        F.when(
            F.col("converted_ts").isNotNull()
            & (
                F.unix_micros(F.col("converted_ts")) - entered_us
                <= within_seconds * 1_000_000
            ),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("converted"),
    )


def event_transitions(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Markov transition counts: consecutive (type → next type) pairs
    within each user's totally-ordered event stream. The output is at
    most |types|² rows — the window shuffle dominates, the count agg
    is map-side-combined down to almost nothing.
    """
    w = Window.partitionBy(user_col).orderBy(*_event_order(ts_col, tiebreak_col))
    nxt = F.lead(F.col(type_col)).over(w)
    return (
        df.withColumn("__next", nxt)
        .filter(F.col("__next").isNotNull())
        .groupBy(
            F.col(type_col).alias("from_type"), F.col("__next").alias("to_type")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def rolling_agg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    n_rows: int,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Rolling sum/mean of the trailing `n_rows` events per key
    (ROWS frame — count-based, not time-based). The sum is decimal-
    stabilized (exact, order-independent adds) so partial-window
    evaluation order can never change the reported double.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(*_event_order(ts_col, tiebreak_col))
        .rowsBetween(-(n_rows - 1), Window.currentRow)
    )
    dec = F.col(value_col).cast("decimal(18,6)")
    roll_sum = F.sum(dec).over(w)
    roll_n = F.count(F.lit(1)).over(w)
    return df.select(
        tiebreak_col,
        key_col,
        ts_col,
        roll_sum.cast("double").alias("roll_sum"),
        roll_n.alias("roll_n"),
        (roll_sum.cast("double") / roll_n).alias("roll_avg"),
    )


def grouped_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: tuple[float, ...],
    exact: bool = True,
) -> DataFrame:
    """Per-group quantiles of a numeric column.

    exact=True → `percentile` (sort-based, linear interpolation):
    right when the group count is bounded (dashboards, per-type
    distributions). exact=False → `approx_percentile` (t-digest
    sketch, map-side combinable, bounded memory): the 100 TB path for
    high-cardinality groups, at the cost of oracle-exactness.
    """
    fn = F.percentile if exact else F.percentile_approx
    aggs = [
        fn(F.col(value_col), F.lit(q)).alias(f"p{int(q * 100):02d}")
        for q in quantiles
    ]
    return df.groupBy(group_col).agg(*aggs)


def cohort_retention(
    df: DataFrame, user_col: str, ts_col: str
) -> DataFrame:
    """Cohort retention table: users grouped by first-active date, and
    for each (cohort, day-offset) the count of cohort members active
    that day plus the retention ratio — the standard product-analytics
    triangle chart.

    Plan: ONE heavy reduction — distinct (user, date) — collapses the
    event stream to at most |users|·|days| rows map-side; the per-user
    cohort date is a min-window over that small table (reusing its
    user partitioning), and the final (cohort, offset) agg is tiny.
    Raw events shuffle once, as date-collapsed pairs.

    The ratio is one double division of exact counts (cross-engine
    bit-stable); cohort dates format as strings so both engines ship
    an identical sortable column type.
    """
    act = df.select(
        F.col(user_col).alias("user"), F.to_date(F.col(ts_col)).alias("d")
    ).distinct()
    w = Window.partitionBy("user")
    with_cohort = act.withColumn("cohort_d", F.min("d").over(w))
    ret = (
        with_cohort.groupBy(
            F.date_format("cohort_d", "yyyy-MM-dd").alias("cohort_date"),
            F.datediff("d", "cohort_d").cast("long").alias("offset_days"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    base = ret.filter(F.col("offset_days") == 0).select(
        "cohort_date", F.col("n_active").alias("cohort_size")
    )
    return ret.join(F.broadcast(base), "cohort_date").select(
        "cohort_date",
        "offset_days",
        "n_active",
        "cohort_size",
        (F.col("n_active").cast("double") / F.col("cohort_size")).alias(
            "retention"
        ),
    )


def rolling_active_users(
    df: DataFrame, user_col: str, ts_col: str, window_days: int = 7
) -> DataFrame:
    """Trailing `window_days`-day distinct active users per observed
    day (the WAU/MAU family) — EXACT windowed count-distinct, which no
    single window function expresses.

    Plan: the event stream collapses to distinct (user, day) pairs
    (the only heavy shuffle, map-side combined); each pair then
    explodes into the ≤`window_days` window-end days it contributes
    to — a bounded ×W blow-up of the ALREADY-COLLAPSED table, not of
    raw events — and a count-distinct per day finishes. Days with no
    events inside the trailing window of an observed day still count
    only observed days (semi join on the day domain).
    """
    act = df.select(
        F.col(user_col).alias("user"), F.to_date(F.col(ts_col)).alias("d")
    ).distinct()
    days = act.select("d").distinct().select(F.col("d").alias("day"))
    contrib = act.select(
        "user",
        F.explode(
            F.sequence(F.lit(0), F.lit(window_days - 1))
        ).alias("off"),
        "d",
    ).select("user", F.date_add("d", F.col("off")).alias("day"))
    return (
        contrib.join(days, "day", "left_semi")
        .groupBy(F.date_format("day", "yyyy-MM-dd").alias("day"))
        .agg(F.count_distinct("user").alias("active_users"))
    )


def top_journeys(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    tiebreak_col: str,
    step_col: str,
    group_cols: list[str] | None = None,
    n_steps: int = 5,
    top_k: int = 15,
    sep: str = ">",
) -> DataFrame:
    """Top-k user journeys: the first `n_steps` step values per
    (user, *group_cols) episode joined into a path string, counted
    corpus-wide — the path-mining view of the event stream (which
    onboarding flows actually happen, and how often).

    Shape: one window ranks steps inside each episode over the
    (ts, tiebreak) TOTAL order (WindowGroupLimit pushes the rn <=
    n_steps cut below the full sort where Spark can); the surviving
    ≤ n_steps rows per episode collapse row-count-wise BEFORE the
    journey groupBy, so the second shuffle carries at most n_steps
    rows per episode. Ordered path assembly is engine-independent:
    collect_list carries (rn, step) structs, array_sort orders by rn,
    THEN the join — never a bare collect_list, whose order is
    partition-arrival luck. Output ties at rank top_k break on the
    path string (total order).
    """
    group_cols = group_cols or []
    ep = [user_col, *group_cols]
    w = Window.partitionBy(*ep).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    steps = (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_steps)
        .groupBy(*ep)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col("__rn"), F.col(step_col).alias("s"))
                        )
                    ),
                    lambda x: x.getField("s"),
                ),
                sep,
            ).alias("journey")
        )
    )
    return (
        steps.groupBy("journey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy(F.desc("n_users"), F.asc("journey"))
        .limit(top_k)
    )


def window_funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    id_col: str,
    type_col: str,
    steps: tuple[str, ...],
    window_seconds: int,
) -> DataFrame:
    """Multi-step strict-order funnel level per user (the warehouse
    `windowFunnel`): the max L such that SOME chain of events typed
    steps[0..L-1] exists in strict (ts, id) order with the last event
    within `window_seconds` of the chain's FIRST event. Generalizes
    `funnel_conversion` (2 steps, first-event anchored) to any-chain
    semantics over k steps.

    DP, not a k-way self-join: per user in (ts, id) order, the level-k
    anchor at a row is the running MAX over previous steps[k-1] rows
    of their level-(k-1) anchor. Maximizing the anchor (latest chain
    start) is optimal — it minimizes elapsed time — and intermediate
    window checks are subsumed by the final one because ts increases
    along a chain. All k window passes share ONE
    partitionBy(user).orderBy(ts, id) exchange; state per row is k
    longs. The k-way join form the oracle uses would explode on a
    power user at 100 TB; this is linear in events per user.

    Returns (user, level), level ∈ [0, len(steps)] — one row per user
    present in `df` (users with no step events score 0).
    """
    from pyspark.sql import Window

    s = F.unix_timestamp(F.col(ts_col)).cast("long")
    e = df.select(
        F.col(user_col).alias("_u"),
        F.col(id_col).alias("_id"),
        F.col(ts_col).alias("_ts"),
        F.col(type_col).alias("_t"),
        s.alias("_s"),
    )
    prev = (
        Window.partitionBy("_u")
        .orderBy("_ts", "_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cur = e.filter(F.col("_t").isin(*steps)).withColumn(
        "_a1", F.when(F.col("_t") == steps[0], F.col("_s"))
    )
    for k in range(1, len(steps)):
        cur = cur.withColumn(
            f"_m{k}", F.max(F.col(f"_a{k}")).over(prev)
        ).withColumn(
            f"_a{k + 1}",
            F.when(F.col("_t") == steps[k], F.col(f"_m{k}")),
        )
    # per-row level, deepest step first (coalesce of whens)
    lvl = None
    for k in range(len(steps), 0, -1):
        if k == 1:
            cond = F.col("_t") == steps[0]
        else:
            cond = (F.col("_t") == steps[k - 1]) & (
                F.col("_s") - F.col(f"_m{k - 1}") <= window_seconds
            )
        w = F.when(cond, F.lit(k))
        lvl = w if lvl is None else F.coalesce(lvl, w)
    scored = cur.withColumn("_lvl", F.coalesce(lvl, F.lit(0)))
    per_user = scored.groupBy(F.col("_u")).agg(
        F.max("_lvl").cast("long").alias("level")
    )
    all_users = df.select(F.col(user_col).alias("_u")).distinct()
    return (
        all_users.join(per_user, "_u", "left")
        .select(
            F.col("_u").alias(user_col),
            F.coalesce(F.col("level"), F.lit(0)).cast("long").alias("level"),
        )
    )


def linear_attribution(
    touches: DataFrame,
    conversions: DataFrame,
    user_col: str,
    touch_ts: str,
    touch_id: str,
    channel_col: str,
    conv_ts: str,
    conv_id: str,
    value_col: str,
    lookback_s: int,
    value_scale: int = 100,
    credit_scale: int = 1_000_000,
) -> DataFrame:
    """Linear multi-touch attribution: each conversion's value is split
    EQUALLY across the user's touches inside the lookback window
    [conv_ts - lookback, conv_ts]; conversions with no touch credit a
    synthetic '(direct)' channel in full — the marketing-analytics
    generalization of the single-touch (as-of) attribution the
    interval join gives for free.

    Exactness: value quantized to integer units (round(v*scale)
    cents), per-touch credit = (cents * credit_scale) div n_touches —
    an INTEGER floor division, so credits, their per-channel sums, and
    the ranking are bit-identical cross-engine (the floor residue,
    < n_touches micro-units per conversion, is the documented price of
    exactness). The one IEEE division producing `attributed_value`
    happens on the final exact sum, mirrored operand-for-operand.

    Plan: equi-join on the user with the time range as a post-
    condition (keyed sort-merge, never a product — the interval-join
    discipline), one conversion-keyed window for the touch count, then
    a partial-aggregable per-channel rollup. Per-user touch density x
    lookback bounds the join fan-out; at 100 TB the lookback plays the
    watermark's state-bound role.
    """
    t = touches.select(
        F.col(user_col).alias("__tu"),
        F.col(touch_ts).alias("__tts"),
        F.col(touch_id).alias("__tid"),
        F.col(channel_col).alias("__ch"),
    )
    c = conversions.select(
        F.col(user_col).alias("__cu"),
        F.col(conv_ts).alias("__cts"),
        F.col(conv_id).alias("__cid"),
        F.round(F.col(value_col) * value_scale, 0)
        .cast("long")
        .alias("__cents"),
    )
    j = c.join(
        t,
        (F.col("__cu") == F.col("__tu"))
        & (F.col("__tts") <= F.col("__cts"))
        & (
            F.col("__tts")
            >= F.col("__cts") - F.expr(f"INTERVAL {int(lookback_s)} SECOND")
        ),
        "left",
    )
    w = Window.partitionBy("__cid")
    jj = j.withColumn("__n", F.count("__tid").over(w)).withColumn(
        "__credit",
        F.when(
            F.col("__n") == 0,
            F.col("__cents") * int(credit_scale),
        ).otherwise(
            F.expr(f"(__cents * {int(credit_scale)}) div __n")
        ),
    )
    divisor = float(credit_scale * value_scale)
    return (
        jj.groupBy(
            F.coalesce(F.col("__ch"), F.lit("(direct)")).alias("channel")
        )
        .agg(
            F.sum(F.col("__credit").cast("decimal(38,0)")).alias("__units"),
            F.count("__tid").alias("n_touches"),
            F.countDistinct("__cid").alias("n_conversions"),
        )
        .select(
            "channel",
            F.col("__units").cast("long").alias("attributed_units"),
            (F.col("__units").cast("double") / divisor).alias(
                "attributed_value"
            ),
            "n_touches",
            "n_conversions",
        )
    )


def time_decay_attribution(
    touches: DataFrame,
    conversions: DataFrame,
    user_col: str,
    touch_ts: str,
    touch_id: str,
    channel_col: str,
    conv_ts: str,
    conv_id: str,
    value_col: str,
    lookback_s: int,
    half_life_s: int,
    value_scale: int = 100,
    credit_scale: int = 1_000_000,
    max_ratio_log2: int = 20,
) -> DataFrame:
    """Time-decay multi-touch attribution: within the lookback window
    each touch's share of the conversion value halves per
    `half_life_s` of age — the recency-weighted sibling of
    `linear_attribution` (same join shape, same '(direct)' fallback).

    Exactness: the decay is NEVER a float pow. A touch's age is
    bucketed to whole half-lives (integer seconds div), and its weight
    is the INTEGER 1 << (b_max − b) where b_max is the conversion's
    oldest bucket — so the newest touch weighs 2^Δ and the oldest
    weighs 1, the exact 2^(−age/h) ladder scaled to integers. The
    exponent is capped at `max_ratio_log2` (weight ratios beyond 2^20
    contribute < 1 micro-unit of credit — a documented clamp, not a
    silent overflow). Credit = (cents · credit_scale · w) div Σw,
    an exact integral division of DECIMAL(38,0) operands, mirrored by
    the oracle in HUGEINT — credits, sums, and ranking are
    bit-identical cross-engine.

    Plan: identical to linear_attribution — user-keyed equi-join with
    the time range as post-condition, one conversion-keyed window
    (here max-bucket + weight sum), partial-aggregable channel rollup;
    lookback × per-user touch rate bounds the fan-out.
    """
    t = touches.select(
        F.col(user_col).alias("__tu"),
        F.col(touch_ts).alias("__tts"),
        F.col(touch_id).alias("__tid"),
        F.col(channel_col).alias("__ch"),
    )
    c = conversions.select(
        F.col(user_col).alias("__cu"),
        F.col(conv_ts).alias("__cts"),
        F.col(conv_id).alias("__cid"),
        F.round(F.col(value_col) * value_scale, 0)
        .cast("long")
        .alias("__cents"),
    )
    j = c.join(
        t,
        (F.col("__cu") == F.col("__tu"))
        & (F.col("__tts") <= F.col("__cts"))
        & (
            F.col("__tts")
            >= F.col("__cts") - F.expr(f"INTERVAL {int(lookback_s)} SECOND")
        ),
        "left",
    ).withColumn(
        "__b",
        F.expr(
            "(CAST(__cts AS LONG) - CAST(__tts AS LONG)) "
            f"div {int(half_life_s)}"
        ),
    )
    w = Window.partitionBy("__cid")
    jj = (
        j.withColumn("__n", F.count("__tid").over(w))
        .withColumn(
            "__d",
            F.least(
                (F.max("__b").over(w) - F.col("__b")).cast("int"),
                F.lit(int(max_ratio_log2)),
            ),
        )
        .withColumn("__w", F.expr("shiftleft(CAST(1 AS BIGINT), __d)"))
        .withColumn("__sw", F.sum("__w").over(w))
        .withColumn(
            "__credit",
            F.when(
                F.col("__n") == 0,
                (F.col("__cents") * int(credit_scale)).cast("decimal(38,0)"),
            ).otherwise(
                F.expr(
                    "CAST(CAST(__cents AS DECIMAL(38,0)) "
                    f"* {int(credit_scale)} * __w "
                    "div CAST(__sw AS DECIMAL(38,0)) AS DECIMAL(38,0))"
                )
            ),
        )
    )
    divisor = float(credit_scale * value_scale)
    return (
        jj.groupBy(
            F.coalesce(F.col("__ch"), F.lit("(direct)")).alias("channel")
        )
        .agg(
            F.sum("__credit").alias("__units"),
            F.count("__tid").alias("n_touches"),
            F.countDistinct("__cid").alias("n_conversions"),
        )
        .select(
            "channel",
            F.col("__units").cast("long").alias("attributed_units"),
            (F.col("__units").cast("double") / divisor).alias(
                "attributed_value"
            ),
            "n_touches",
            "n_conversions",
        )
    )


def weighted_median(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    weight_col: str,
) -> DataFrame:
    """Exact lower weighted median per key: the smallest value whose
    cumulative weight reaches half the group total (2*cumw >= W in
    integers — no float division). The weighted twin of the MAD
    family's exact percentiles: a duplicate-heavy value (or a weight
    column like quantity/bytes) shifts this where the unweighted
    median can't see it.

    Plan: collapse to (key, value) with summed integer weights
    (partial-aggregable — the window then runs over DISTINCT values
    per key, not raw rows), one per-key cumulative window, one min.
    Weights must be non-negative integers (cast upstream)."""
    per_v = df.groupBy(*key_cols, F.col(value_col).alias("__v")).agg(
        F.sum(F.col(weight_col).cast("long")).alias("__w")
    )
    w_tot = Window.partitionBy(*key_cols)
    w_cum = (
        Window.partitionBy(*key_cols)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = per_v.withColumn("__cw", F.sum("__w").over(w_cum)).withColumn(
        "__W", F.sum("__w").over(w_tot)
    )
    return (
        cum.filter(F.col("__cw") * 2 >= F.col("__W"))
        .groupBy(*key_cols)
        .agg(
            F.min("__v").alias("weighted_median"),
            F.max("__W").cast("long").alias("total_weight"),
        )
    )
