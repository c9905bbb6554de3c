"""Tests for behavior-analytics operators (sessions, funnel,
transitions, rolling windows, quantiles) and segment-level dedup."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from big_data_engineering_project_spark.operators.behavior import (
    event_transitions,
    funnel_conversion,
    grouped_quantiles,
    rolling_agg,
    session_stats,
    sessionize,
)
from big_data_engineering_project_spark.operators.text_analysis import (
    dup_segment_fraction,
)


def _ts(h: int, m: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, h, m)


def _events(spark, rows):
    return spark.createDataFrame(
        [Row(event_id=i, user_id=u, ts=t, event_type=ty, value=v)
         for i, (u, t, ty, v) in enumerate(rows)]
    )


def test_sessionize_breaks_on_gap(spark):
    ev = _events(
        spark,
        [
            (1, _ts(0), "view", 1.0),
            (1, _ts(0, 30), "click", 1.0),   # same session (30 min gap)
            (1, _ts(3), "view", 1.0),        # > 1h gap -> new session
            (2, _ts(0), "view", 1.0),        # other user: own session 0
        ],
    )
    out = sessionize(ev, "user_id", "ts", gap_seconds=3600)
    got = {
        (r["user_id"], r["event_id"]): r["session_idx"]
        for r in out.collect()
    }
    assert got == {(1, 0): 0, (1, 1): 0, (1, 2): 1, (2, 3): 0}


def test_session_stats_duration_exact_us(spark):
    ev = _events(
        spark,
        [
            (1, _ts(0), "view", 1.0),
            (1, _ts(0, 45), "click", 1.0),
            (1, _ts(12), "view", 1.0),
        ],
    )
    out = session_stats(ev, "user_id", "ts", gap_seconds=3600).collect()
    by_idx = {r["session_idx"]: r for r in out}
    assert by_idx[0]["n_events"] == 2
    assert by_idx[0]["duration_us"] == 45 * 60 * 1_000_000
    assert by_idx[1]["n_events"] == 1
    assert by_idx[1]["duration_us"] == 0


def test_funnel_conversion_window_edge(spark):
    ev = _events(
        spark,
        [
            # user 1: purchase exactly at the window edge -> converted
            (1, _ts(0), "signup", 1.0),
            (1, _ts(1), "purchase", 1.0),
            # user 2: purchase BEFORE signup only -> not converted
            (2, _ts(0), "purchase", 1.0),
            (2, _ts(1), "signup", 1.0),
            # user 3: purchase after the window -> entered, not converted
            (3, _ts(0), "signup", 1.0),
            (3, _ts(3), "purchase", 1.0),
            # user 4: no signup -> absent from output
            (4, _ts(0), "purchase", 1.0),
        ],
    )
    out = funnel_conversion(
        ev, "user_id", "ts", "event_type", "signup", "purchase",
        within_seconds=3600,
    )
    got = {r["user_id"]: r["converted"] for r in out.collect()}
    assert got == {1: 1, 2: 0, 3: 0}
    # earliest purchase at-or-after signup is carried even if late
    late = {r["user_id"]: r["converted_ts"] for r in out.collect()}
    assert late[3] == _ts(3)


def test_event_transitions_counts(spark):
    ev = _events(
        spark,
        [
            (1, _ts(0), "a", 1.0),
            (1, _ts(1), "b", 1.0),
            (1, _ts(2), "a", 1.0),
            (2, _ts(0), "a", 1.0),
            (2, _ts(1), "b", 1.0),
        ],
    )
    out = event_transitions(ev, "user_id", "ts", "event_type")
    got = {(r["from_type"], r["to_type"]): r["n"] for r in out.collect()}
    assert got == {("a", "b"): 2, ("b", "a"): 1}


def test_rolling_agg_matches_manual_frame(spark):
    vals = [2.0, 4.0, 8.0, 16.0]
    ev = _events(
        spark, [(1, _ts(h), "x", v) for h, v in enumerate(vals)]
    )
    out = rolling_agg(ev, "user_id", "ts", "value", n_rows=2).orderBy("event_id")
    rows = out.collect()
    assert [r["roll_sum"] for r in rows] == [2.0, 6.0, 12.0, 24.0]
    assert [r["roll_n"] for r in rows] == [1, 2, 2, 2]
    assert rows[-1]["roll_avg"] == 12.0


def test_grouped_quantiles_exact_median(spark):
    ev = _events(
        spark,
        [(1, _ts(i), "t", v) for i, v in enumerate([1.0, 2.0, 3.0, 100.0])],
    )
    out = grouped_quantiles(ev, "event_type", "value", (0.5,)).collect()
    assert out[0]["p50"] == 2.5  # interpolated midpoint, not nearest-rank


def test_approx_quantiles_close_to_exact(spark, sf_dir):
    from big_data_engineering_project_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    exact = grouped_quantiles(ev, "event_type", "value", (0.5,), exact=True)
    approx = grouped_quantiles(ev, "event_type", "value", (0.5,), exact=False)
    e = {r["event_type"]: r["p50"] for r in exact.collect()}
    a = {r["event_type"]: r["p50"] for r in approx.collect()}
    for k in e:
        assert abs(a[k] - e[k]) / max(abs(e[k]), 1e-9) < 0.05


def test_dup_segment_fraction_known_corpus(spark):
    # 4-token docs with seg_tokens=2 -> 2 segments each.
    # "a b" appears in docs 1 and 2 (duplicated); every other segment
    # is unique.
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b c d"),
            Row(doc_id=2, text="a b e f"),
            Row(doc_id=3, text="g h i j"),
        ]
    )
    out = dup_segment_fraction(docs, "doc_id", "text", seg_tokens=2)
    got = {r["doc"]: (r["n_segs"], r["n_dup_segs"], r["dup_frac"]) for r in out.collect()}
    assert got == {1: (2, 1, 0.5), 2: (2, 1, 0.5), 3: (2, 0, 0.0)}


def test_dup_segment_ragged_tail_segment(spark):
    # 5 tokens, seg_tokens=2 -> 3 segments, last is the 1-token tail
    docs = spark.createDataFrame([Row(doc_id=1, text="a b c d e")])
    out = dup_segment_fraction(docs, "doc_id", "text", seg_tokens=2).collect()
    assert out[0]["n_segs"] == 3


def test_session_window_plan_single_exchange(spark, sf_dir):
    """lag + running-sum + per-session agg reuse ONE hash exchange:
    the only other exchange is the presentation orderBy's range
    partitioning."""
    from big_data_engineering_project_spark.plans import REGISTRY

    df = REGISTRY["q_session_stats"].builder(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    hash_exchanges = plan.count("Exchange hashpartitioning")
    assert hash_exchanges == 1, plan


def test_cohort_retention_invariants(spark, sf_dir):
    """Offset 0 is the cohort itself (retention exactly 1.0); no offset
    can exceed the cohort size; offsets are non-negative."""
    from big_data_engineering_project_spark.operators.behavior import (
        cohort_retention,
    )
    from big_data_engineering_project_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    rows = cohort_retention(ev, "user_id", "ts").collect()
    assert rows
    for r in rows:
        assert r["offset_days"] >= 0
        assert 0 < r["n_active"] <= r["cohort_size"]
        if r["offset_days"] == 0:
            assert r["n_active"] == r["cohort_size"]
            assert r["retention"] == 1.0


def test_rolling_active_users_dominates_daily_actives(spark, sf_dir):
    """A trailing-7-day distinct count can never be below that day's
    own distinct actives, and never above the total user count."""
    from big_data_engineering_project_spark.operators.behavior import (
        rolling_active_users,
    )
    from big_data_engineering_project_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    wau = {
        r["day"]: r["active_users"]
        for r in rolling_active_users(ev, "user_id", "ts", 7).collect()
    }
    daily = {
        r["day"]: r["n"]
        for r in ev.groupBy(
            F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day")
        ).agg(F.count_distinct("user_id").alias("n")).collect()
    }
    total_users = ev.select("user_id").distinct().count()
    assert set(daily) == set(wau)
    for day, n in daily.items():
        assert n <= wau[day] <= total_users


def test_linear_attribution_split_and_direct(spark):
    """3 in-window touches split a 9.99 conversion into equal integer
    micro-credits (floor residue stays unattributed); out-of-window
    touches are excluded; a touchless conversion credits '(direct)'
    in full."""
    import datetime as dt

    from big_data_engineering_project_spark.operators.behavior import (
        linear_attribution,
    )

    t0 = dt.datetime(2024, 5, 1, 12, 0)

    def m(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    touches = spark.createDataFrame(
        [
            (1, m(-30), 101, "click"),
            (1, m(-20), 102, "view"),
            (1, m(-10), 103, "click"),
            (1, m(-90), 104, "click"),   # outside 1h lookback
            (1, m(5), 105, "click"),     # after conversion
        ],
        "user_id LONG, ts TIMESTAMP, event_id LONG, channel STRING",
    )
    convs = spark.createDataFrame(
        [
            (1, m(0), 201, 9.99),
            (2, m(0), 202, 5.00),        # no touches -> (direct)
        ],
        "user_id LONG, ts TIMESTAMP, event_id LONG, value DOUBLE",
    )
    out = {
        r["channel"]: r
        for r in linear_attribution(
            touches, convs,
            user_col="user_id", touch_ts="ts", touch_id="event_id",
            channel_col="channel", conv_ts="ts", conv_id="event_id",
            value_col="value", lookback_s=3600,
        ).collect()
    }
    share = (999 * 1_000_000) // 3  # 333_000_000
    assert out["click"]["attributed_units"] == 2 * share
    assert out["view"]["attributed_units"] == share
    assert out["click"]["n_touches"] == 2
    assert out["view"]["n_conversions"] == 1
    assert out["(direct)"]["attributed_units"] == 500 * 1_000_000
    assert out["(direct)"]["n_touches"] == 0
    assert abs(out["(direct)"]["attributed_value"] - 5.0) < 1e-12
    # conservation up to the floor residue (< n_touches micro-units)
    total = sum(r["attributed_units"] for r in out.values())
    assert 0 <= (999 + 500) * 1_000_000 - total < 3


def test_gini_known_distributions(spark):
    """Gini of a uniform distribution is 0; a single whale approaches
    (n-1)/n; the rank formula matches the classic definition on a
    hand-computed case."""
    from big_data_engineering_project_spark.plans import REGISTRY  # noqa: F401
    from pyspark.sql import Window

    def gini_of(values):
        rows = [(i, float(v)) for i, v in enumerate(values)]
        df = spark.createDataFrame(rows, "user_id LONG, value DOUBLE")
        per_u = df.select(
            F.lit("t").alias("event_type"), "user_id",
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
        w = Window.partitionBy("event_type").orderBy("cents", "user_id")
        ranked = per_u.withColumn("rn", F.row_number().over(w))
        s = ranked.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("cents").cast("decimal(38,0)")).alias("s1"),
            F.sum(F.col("rn").cast("decimal(38,0)") * F.col("cents")).alias("s2"),
        ).collect()[0]
        n, s1, s2 = s["n"], float(s["s1"]), float(s["s2"])
        return 2.0 * s2 / (n * s1) - (n + 1.0) / n

    assert abs(gini_of([5, 5, 5, 5])) < 1e-12
    # one whale among 10: G = (n-1)/n * (1 - tiny correction) -> 0.9
    assert gini_of([0.01] * 9 + [10000]) > 0.89
    # hand case [1,2,3]: ranks 1,2,3; G = 2*(1+4+9)/(3*6) - 4/3 = 2/9
    assert abs(gini_of([1, 2, 3]) - 2.0 / 9.0) < 1e-12


def test_weighted_median_hand_cases(spark):
    from big_data_engineering_project_spark.operators.behavior import (
        weighted_median,
    )

    df = spark.createDataFrame(
        [
            ("g1", 1.0, 1), ("g1", 2.0, 1), ("g1", 3.0, 98),
            ("g2", 1.0, 1), ("g2", 2.0, 1), ("g2", 3.0, 1), ("g2", 4.0, 1),
            ("g3", 5.0, 2), ("g3", 5.0, 3),  # duplicate values merge
        ],
        "k STRING, v DOUBLE, w LONG",
    )
    got = {r["k"]: r for r in weighted_median(df, ["k"], "v", "w").collect()}
    assert got["g1"]["weighted_median"] == 3.0  # weight mass dominates
    assert got["g1"]["total_weight"] == 100
    assert got["g2"]["weighted_median"] == 2.0  # even count: lower median
    assert got["g3"]["weighted_median"] == 5.0
    assert got["g3"]["total_weight"] == 5


def test_ks_drift_known_and_bruteforce(spark):
    """KS of identical samples is 0, of disjoint samples is 1, and the
    integer cross-multiplied formulation matches a brute-force CDF
    scan on a random fixture with ties."""
    import random

    from big_data_engineering_project_spark.operators.anomaly import (
        ks_drift,
    )

    def run(a_vals, b_vals):
        rows = [("k", float(v), 0) for v in a_vals] + [
            ("k", float(v), 1) for v in b_vals
        ]
        df = spark.createDataFrame(rows, "g STRING, v DOUBLE, b INT")
        r = ks_drift(df, ["g"], "v", F.col("b") == 1).collect()[0]
        return r["ks_stat"]

    assert run([1, 2, 3, 4], [1, 2, 3, 4]) == 0.0
    assert run([1, 2, 3], [10, 11]) == 1.0

    rng = random.Random(5)
    a = [rng.randrange(20) for _ in range(80)]
    b = [rng.randrange(25) for _ in range(60)]
    got = run(a, b)
    vals = sorted(set(a) | set(b))
    want = max(
        abs(
            sum(1 for x in a if x <= v) / len(a)
            - sum(1 for x in b if x <= v) / len(b)
        )
        for v in vals
    )
    assert abs(got - want) < 1e-12
