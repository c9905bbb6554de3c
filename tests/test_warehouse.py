"""Unit tests for the warehouse-maintenance operators: SCD2 history,
as-of snapshot reconstruction, market-basket pairs, OHLC resample,
referential-integrity audit. Hand-computed expectations on planted
fixtures; the registered queries' oracle rows are the integration
layer (tools/oracle_check.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from big_data_engineering_project_spark.operators.association import (
    frequent_pairs,
)
from big_data_engineering_project_spark.operators.cdc import (
    scd2_from_changelog,
    snapshot_asof,
)
from big_data_engineering_project_spark.operators.profiling import (
    referential_integrity_audit,
)
from big_data_engineering_project_spark.operators.temporal import (
    ohlc_resample,
)


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_scd2_compacts_and_versions(spark):
    # key 1: A, A (dup → compacted), B, B (dup), A  → 3 versions A,B,A
    # key 2: single row → 1 open version
    rows = [
        (1, _ts(1), 10, "A"),
        (1, _ts(2), 11, "A"),
        (1, _ts(3), 12, "B"),
        (1, _ts(4), 13, "B"),
        (1, _ts(5), 14, "A"),
        (2, _ts(9), 15, "X"),
    ]
    df = spark.createDataFrame(
        rows, "k LONG, ts TIMESTAMP, id LONG, attr STRING"
    )
    hist = scd2_from_changelog(
        df, key="k", ts_col="ts", attr="attr", tiebreak=("id",)
    )
    got = {
        (r["k"], r["version"]): (
            r["attr"], r["effective_from"], r["effective_to"], r["is_current"]
        )
        for r in hist.collect()
    }
    assert got == {
        (1, 1): ("A", _ts(1), _ts(3), False),
        (1, 2): ("B", _ts(3), _ts(5), False),
        (1, 3): ("A", _ts(5), None, True),
        (2, 1): ("X", _ts(9), None, True),
    }


def test_scd2_same_timestamp_ties_break_by_id(spark):
    # Two changes at the SAME ts: the higher id is the later version —
    # the (ts, id) total order, not partition luck, decides.
    rows = [(1, _ts(1), 5, "A"), (1, _ts(1), 6, "B")]
    df = spark.createDataFrame(
        rows, "k LONG, ts TIMESTAMP, id LONG, attr STRING"
    )
    hist = scd2_from_changelog(
        df, key="k", ts_col="ts", attr="attr", tiebreak=("id",)
    )
    got = sorted((r["version"], r["attr"]) for r in hist.collect())
    assert got == [(1, "A"), (2, "B")]


def test_scd2_snapshot_asof(spark):
    rows = [
        (1, _ts(1), 10, "A"),
        (1, _ts(3), 12, "B"),
        (2, _ts(9), 15, "X"),
    ]
    df = spark.createDataFrame(
        rows, "k LONG, ts TIMESTAMP, id LONG, attr STRING"
    )
    hist = scd2_from_changelog(
        df, key="k", ts_col="ts", attr="attr", tiebreak=("id",)
    )
    # At 02:00: key 1 is in its A version; key 2 not yet born.
    snap = snapshot_asof(hist, "k", _ts(2))
    assert {(r["k"], r["attr"]) for r in snap.collect()} == {(1, "A")}
    # At 10:00: key 1 → B (open), key 2 → X.
    snap2 = snapshot_asof(hist, "k", _ts(10))
    assert {(r["k"], r["attr"]) for r in snap2.collect()} == {
        (1, "B"), (2, "X"),
    }
    # Interval boundary: effective_from is inclusive, effective_to
    # exclusive — at exactly 03:00 key 1 is already B.
    snap3 = snapshot_asof(hist, "k", _ts(3))
    assert {(r["k"], r["attr"]) for r in snap3.collect()} == {(1, "B")}


def test_frequent_pairs_support_and_lift(spark):
    # baskets: {a,b,c}, {a,b}, {a}, {c} → N=4
    # supp: a=3 b=2 c=2; pairs: (a,b)=2 (a,c)=1 (b,c)=1
    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"), (2, "a"),  # dup item in basket → distinct
        (3, "a"),
        (4, "c"),
    ]
    df = spark.createDataFrame(rows, "basket LONG, item STRING")
    got = {
        (r["item_a"], r["item_b"]): (
            r["pair_support"], r["support_a"], r["support_b"], r["lift"]
        )
        for r in frequent_pairs(df, "basket", "item").collect()
    }
    assert got[("a", "b")] == (2, 3, 2, 2 * 4 / (3 * 2))
    assert got[("a", "c")] == (1, 3, 2, 1 * 4 / (3 * 2))
    assert got[("b", "c")] == (1, 2, 2, 1 * 4 / (2 * 2))


def test_frequent_pairs_min_support_prunes_but_keeps_full_n(spark):
    # min_item_support=2 drops the singleton item 'd'; lift stays a
    # full-corpus probability ratio (N counts ALL baskets, including
    # ones emptied by the prune).
    rows = [
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "d"),
    ]
    df = spark.createDataFrame(rows, "basket LONG, item STRING")
    out = frequent_pairs(df, "basket", "item", min_item_support=2)
    got = {
        (r["item_a"], r["item_b"]): (r["pair_support"], r["lift"])
        for r in out.collect()
    }
    assert set(got) == {("a", "b")}
    assert got[("a", "b")] == (2, 2 * 3 / (2 * 2))


def test_ohlc_picks_open_close_by_time_then_id(spark):
    rows = [
        # one symbol, one day; two rows share the open timestamp —
        # the LOWER id must be the open.
        ("s", _ts(9, 0), 1, 5.0),
        ("s", _ts(9, 0), 2, 7.0),
        ("s", _ts(12, 0), 3, 2.0),
        ("s", _ts(16, 0), 4, 4.0),
        # second day
        ("s", dt.datetime(2024, 1, 2, 10), 5, 9.0),
    ]
    df = spark.createDataFrame(
        rows, "sym STRING, ts TIMESTAMP, id LONG, px DOUBLE"
    )
    got = {
        r["bucket_ts"]: (
            r["open"], r["high"], r["low"], r["close"], r["volume"]
        )
        for r in ohlc_resample(
            df, "sym", "ts", "px", "id", bucket="day"
        ).collect()
    }
    assert got[dt.datetime(2024, 1, 1)] == (5.0, 7.0, 2.0, 4.0, 4)
    assert got[dt.datetime(2024, 1, 2)] == (9.0, 9.0, 9.0, 9.0, 1)


def test_ri_audit_counts_orphans_and_nulls(spark):
    fact = spark.createDataFrame(
        [(1,), (1,), (2,), (99,), (99,), (None,)], "fk LONG"
    )
    dim = spark.createDataFrame([(1,), (2,), (3,)], "dk LONG")
    out = referential_integrity_audit(
        [("f.fk->d.dk", fact, "fk", dim, "dk")]
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (
        r["relation"], r["fact_rows"], r["orphan_rows"],
        r["orphan_keys"], r["null_keys"],
    ) == ("f.fk->d.dk", 6, 2, 1, 1)


def test_warehouse_ops_survive_empty_input(spark):
    empty_cl = spark.createDataFrame(
        [], "k LONG, ts TIMESTAMP, id LONG, attr STRING"
    )
    assert scd2_from_changelog(
        empty_cl, "k", "ts", "attr", ("id",)
    ).count() == 0

    empty_b = spark.createDataFrame([], "basket LONG, item STRING")
    assert frequent_pairs(empty_b, "basket", "item").count() == 0

    empty_t = spark.createDataFrame(
        [], "sym STRING, ts TIMESTAMP, id LONG, px DOUBLE"
    )
    assert ohlc_resample(empty_t, "sym", "ts", "px", "id").count() == 0

    empty_f = spark.createDataFrame([], "fk LONG")
    dim = spark.createDataFrame([(1,)], "dk LONG")
    r = referential_integrity_audit(
        [("e", empty_f, "fk", dim, "dk")]
    ).collect()[0]
    assert (r["fact_rows"], r["orphan_rows"], r["null_keys"]) == (0, 0, 0)


def test_table_diff_classifies_and_distinguishes_null_from_empty(spark):
    from big_data_engineering_project_spark.operators.cdc import table_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, ""), (5, "e")],
        "k LONG, v STRING",
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, None), (5, "e"), (6, "f")],
        "k LONG, v STRING",
    )
    got = {
        r["k"]: r["change_type"]
        for r in table_diff(old, new, "k", ["v"]).collect()
    }
    # 1 unchanged (absent), 2 changed, 3 removed, 4 ''→NULL IS a
    # change, 5 unchanged, 6 added
    assert got == {2: "changed", 3: "removed", 4: "changed", 6: "added"}


def test_key_skew_report_planted_hot_key(spark):
    from big_data_engineering_project_spark.operators.profiling import (
        key_skew_report,
    )

    # 10 rows of key 7, one row each of keys 0..4 → 15 rows, 6 keys
    rows = [(7,)] * 10 + [(k,) for k in range(5)]
    df = spark.createDataFrame(rows, "k LONG")
    r = key_skew_report(df, ["k"], top_n=3).collect()[0]
    assert (r["n_rows"], r["n_keys"], r["max_key_rows"]) == (15, 6, 10)
    assert r["top1_share"] == 10 / 15
    assert r["topn_share"] == (10 + 1 + 1) / 15  # top-3 count VALUES
    assert r["avg_rows_per_key"] == 15 / 6


def test_top_journeys_orders_steps_and_counts(spark):
    from big_data_engineering_project_spark.operators.behavior import (
        top_journeys,
    )

    # two users share journey A>B (u1 has a 3rd step beyond n_steps=2);
    # u3 alone on B>A
    rows = [
        (1, _ts(1), 1, "A"), (1, _ts(2), 2, "B"), (1, _ts(3), 3, "C"),
        (2, _ts(1), 4, "A"), (2, _ts(2), 5, "B"),
        (3, _ts(1), 6, "B"), (3, _ts(2), 7, "A"),
    ]
    df = spark.createDataFrame(
        rows, "u LONG, ts TIMESTAMP, id LONG, step STRING"
    )
    got = [
        (r["journey"], r["n_users"])
        for r in top_journeys(
            df, "u", "ts", "id", "step", n_steps=2, top_k=10
        ).collect()
    ]
    assert got == [("A>B", 2), ("B>A", 1)]


def test_top_journeys_same_ts_ties_break_by_id(spark):
    from big_data_engineering_project_spark.operators.behavior import (
        top_journeys,
    )

    rows = [(1, _ts(1), 9, "X"), (1, _ts(1), 3, "Y")]
    df = spark.createDataFrame(
        rows, "u LONG, ts TIMESTAMP, id LONG, step STRING"
    )
    got = top_journeys(df, "u", "ts", "id", "step", n_steps=2).collect()
    assert got[0]["journey"] == "Y>X"  # id 3 before id 9


def test_triangle_count_k4_with_noise(spark):
    from big_data_engineering_project_spark.operators.graph import (
        triangle_count,
    )

    # K4 (4 triangles) + pendant edge + self-loop + reverse duplicate
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (4, 5), (2, 1), (3, 3)]
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    out = sorted(tuple(r) for r in triangle_count(df).collect())
    assert out == [(1, 2, 3), (1, 2, 4), (1, 3, 4), (2, 3, 4)]

    empty = spark.createDataFrame([], "src LONG, dst LONG")
    assert triangle_count(empty).count() == 0


def test_degenerate_arg_guards(spark):
    import pytest as _pytest

    from big_data_engineering_project_spark.operators.cdc import table_diff
    from big_data_engineering_project_spark.operators.profiling import (
        key_skew_report,
        referential_integrity_audit,
    )

    df = spark.createDataFrame([(1,)], "k LONG")
    with _pytest.raises(ValueError):
        table_diff(df, df, "k", [])
    with _pytest.raises(ValueError):
        referential_integrity_audit([])
    with _pytest.raises(ValueError):
        key_skew_report(df, [])


def test_cusum_detects_planted_drift_not_flat(spark):
    """A persistent +1.5-sigma shift in the second half of one key's
    series must raise alarms there; a statistically identical key
    without the shift must stay quiet. Matches a pure-python
    simulation of the textbook recursion max(0, s + y) exactly
    (closed form ≡ recursion)."""
    import datetime as dt

    from big_data_engineering_project_spark.operators.anomaly import (
        cusum_drift,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    i = 0
    # flat key: alternating 10/12 forever
    for j in range(60):
        rows.append(("flat", base + dt.timedelta(minutes=j), i, 10.0 + 2 * (j % 2)))
        i += 1
    # drift key: same start, then shifts up
    for j in range(60):
        v = 10.0 + 2 * (j % 2) + (8.0 if j >= 30 else 0.0)
        rows.append(("drift", base + dt.timedelta(minutes=j), i, v))
        i += 1
    df = spark.createDataFrame(rows, "k STRING, ts TIMESTAMP, id LONG, v DOUBLE")
    out = cusum_drift(df, "k", "ts", "id", "v").collect()
    keys = {r["k"] for r in out}
    assert "drift" in keys and "flat" not in keys

    # python oracle: recursion over integer micro-units
    import math

    SCALE = 1_000_000
    by_key = {"flat": [], "drift": []}
    for k, ts, ident, v in rows:
        by_key[k].append((ts, ident, v))
    alarms = set()
    for k, series in by_key.items():
        vus = [math.floor(v * SCALE) for _, _, v in series]
        n = len(vus)
        s1 = sum(vus)
        s2 = sum(x * x for x in vus)
        mu = math.floor(s1 / n)
        sigma = math.floor(math.sqrt((s2 - s1 * s1 / n) / (n - 1)))
        slack = sigma // 2
        s = 0
        for (_, ident, _), vu in zip(series, vus):
            s = max(0, s + vu - mu - slack)
            if s > 4 * sigma:
                alarms.add(ident)
    got = {r["id"] for r in out}
    assert got == alarms


def test_scd2_null_attr_transitions_are_changes(spark):
    """A transition to NULL (and back) must open versions — a bare !=
    comparison returns NULL there and would silently compact the
    change away; consecutive NULLs still compact."""
    rows = [
        (1, _ts(1), 10, "A"),
        (1, _ts(2), 11, None),   # A -> NULL: a change
        (1, _ts(3), 12, None),   # NULL -> NULL: compacted
        (1, _ts(4), 13, "A"),    # NULL -> A: a change
        (2, _ts(1), 14, None),   # first row with NULL attr: version 1
    ]
    df = spark.createDataFrame(
        rows, "k LONG, ts TIMESTAMP, id LONG, attr STRING"
    )
    hist = scd2_from_changelog(
        df, key="k", ts_col="ts", attr="attr", tiebreak=("id",)
    )
    got = {
        (r["k"], r["version"]): (r["attr"], r["effective_from"])
        for r in hist.collect()
    }
    assert got == {
        (1, 1): ("A", _ts(1)),
        (1, 2): (None, _ts(2)),
        (1, 3): ("A", _ts(4)),
        (2, 1): (None, _ts(1)),
    }


def test_incremental_diff_equals_full_and_persisted_index(
    spark, sf_dir, tmp_path
):
    """table_diff_incremental: (a) identical classification to the
    full table_diff; (b) the persisted old-side bucket-digest table
    (written day 0, read day 1 — the production shape) gives the
    identical result without recomputing the old digests; (c) the
    level-1 index is bounded (<= n_buckets rows)."""
    from big_data_engineering_project_spark.operators.cdc import (
        DIFF_DEFAULT_BUCKETS,
        bucket_digests,
        table_diff,
        table_diff_incremental,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    old = orders.filter(F.col("o_orderkey") % 11 != 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new = orders.filter(F.col("o_orderkey") % 13 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("Z"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        "o_totalprice",
    )
    cols = ["o_orderstatus", "o_totalprice"]
    full = sorted(
        map(tuple, table_diff(old, new, "o_orderkey", cols).collect())
    )
    assert full  # fixture plants adds, removes, and changes
    inc = sorted(
        map(
            tuple,
            table_diff_incremental(old, new, "o_orderkey", cols).collect(),
        )
    )
    assert inc == full

    idx_path = str(tmp_path / "old_bucket_digests")
    bd = bucket_digests(old, "o_orderkey", cols)
    assert bd.count() <= DIFF_DEFAULT_BUCKETS
    bd.write.parquet(idx_path)
    inc2 = sorted(
        map(
            tuple,
            table_diff_incremental(
                old,
                new,
                "o_orderkey",
                cols,
                old_digests=spark.read.parquet(idx_path),
            ).collect(),
        )
    )
    assert inc2 == full


def test_scd2_temporal_join_containment_semantics(spark):
    """Facts join to the version valid AT their event time: before the
    first version -> NULLs; exactly at a version boundary -> the NEW
    version (half-open intervals); after the last change -> the open
    current version."""
    from big_data_engineering_project_spark.operators.cdc import (
        scd2_temporal_join,
    )

    changelog = spark.createDataFrame(
        [
            (1, _ts(2), 10, "A"),
            (1, _ts(5), 11, "B"),
            (1, _ts(9), 12, "C"),
            (2, _ts(4), 20, "X"),
        ],
        "user_id LONG, ts TIMESTAMP, event_id LONG, tier STRING",
    )
    history = scd2_from_changelog(
        changelog, key="user_id", ts_col="ts", attr="tier",
        tiebreak=("event_id",),
    )
    facts = spark.createDataFrame(
        [
            (1, _ts(1), 100.0),   # before first version -> NULL
            (1, _ts(2), 101.0),   # exactly at v1 open -> A (inclusive)
            (1, _ts(4, 59), 102.0),  # inside v1 -> A
            (1, _ts(5), 103.0),   # at the A->B boundary -> B (half-open)
            (1, _ts(23), 104.0),  # open current version -> C
            (2, _ts(3), 200.0),   # other key, before first -> NULL
            (2, _ts(6), 201.0),   # other key, current -> X
        ],
        "user_id LONG, ts TIMESTAMP, value DOUBLE",
    )
    out = scd2_temporal_join(
        facts, history, key="user_id", fact_time="ts", attr_cols=["tier"]
    )
    got = {
        (r["user_id"], r["ts"]): (r["asof_tier"], r["asof_version"])
        for r in out.collect()
    }
    assert got[(1, _ts(1))] == (None, None)
    assert got[(1, _ts(2))] == ("A", 1)
    assert got[(1, _ts(4, 59))] == ("A", 1)
    assert got[(1, _ts(5))] == ("B", 2)
    assert got[(1, _ts(23))] == ("C", 3)
    assert got[(2, _ts(3))] == (None, None)
    assert got[(2, _ts(6))] == ("X", 1)


def test_scd2_temporal_join_filtered_history_guard(spark):
    """On a FILTERED history slice (non-tiling intervals) the post-
    guard keeps containment exact: a fact falling in a gap between
    versions gets NULLs instead of the stale earlier version the raw
    as-of match would carry."""
    from big_data_engineering_project_spark.operators.cdc import (
        scd2_temporal_join,
    )

    changelog = spark.createDataFrame(
        [
            (1, _ts(2), 10, "A"),
            (1, _ts(5), 11, "B"),
            (1, _ts(9), 12, "A"),
        ],
        "user_id LONG, ts TIMESTAMP, event_id LONG, tier STRING",
    )
    history = scd2_from_changelog(
        changelog, key="user_id", ts_col="ts", attr="tier",
        tiebreak=("event_id",),
    ).filter(F.col("tier") == "A")  # drop the middle B version
    facts = spark.createDataFrame(
        [
            (1, _ts(3), 1.0),   # inside surviving v1 [2,5) -> A
            (1, _ts(7), 2.0),   # in the B gap [5,9) -> guard nulls it
            (1, _ts(11), 3.0),  # open v3 -> A
        ],
        "user_id LONG, ts TIMESTAMP, value DOUBLE",
    )
    out = scd2_temporal_join(
        facts, history, key="user_id", fact_time="ts", attr_cols=["tier"]
    )
    got = {r["ts"]: (r["asof_tier"], r["asof_version"]) for r in out.collect()}
    assert got[_ts(3)] == ("A", 1)
    assert got[_ts(7)] == (None, None)
    assert got[_ts(11)] == ("A", 3)


def test_time_weighted_avg_hand_computed(spark):
    """TWAP weights each value by its holding duration: 100 held 3h +
    200 held 1h -> 125.0, while the plain mean of the observations
    would be 400/3. Last observation gets zero weight; single-
    observation buckets have twap NULL and span 0."""
    from big_data_engineering_project_spark.operators.temporal import (
        time_weighted_avg,
    )

    rows = [
        # key "a", day 1: 100 @00:00 (held 3h), 200 @03:00 (held 1h),
        # 999 @04:00 (last obs -> zero weight)
        ("a", dt.datetime(2024, 1, 1, 0), 1, 100.0),
        ("a", dt.datetime(2024, 1, 1, 3), 2, 200.0),
        ("a", dt.datetime(2024, 1, 1, 4), 3, 999.0),
        # key "a", day 2: single observation -> NULL twap
        ("a", dt.datetime(2024, 1, 2, 12), 4, 50.0),
        # key "b", day 1: burst of three instantaneous-ish readings then
        # a long-held value: plain AVG ~ high, TWAP ~ the held value
        ("b", dt.datetime(2024, 1, 1, 0, 0), 5, 1000.0),
        ("b", dt.datetime(2024, 1, 1, 0, 1), 6, 1000.0),
        ("b", dt.datetime(2024, 1, 1, 0, 2), 7, 10.0),
        ("b", dt.datetime(2024, 1, 1, 10, 2), 8, 10.0),
    ]
    df = spark.createDataFrame(
        rows, "k STRING, ts TIMESTAMP, event_id LONG, value DOUBLE"
    )
    out = time_weighted_avg(
        df, keys=["k"], time_col="ts", value_col="value",
        id_col="event_id", bucket="day",
    )
    got = {(r["k"], r["bucket_ts"].day): r for r in out.collect()}
    a1 = got[("a", 1)]
    assert a1["n_obs"] == 3
    assert a1["span_us"] == 4 * 3600 * 10**6
    assert a1["twap"] == (100.0 * 3 + 200.0 * 1) / 4
    a2 = got[("a", 2)]
    assert a2["n_obs"] == 1 and a2["span_us"] == 0 and a2["twap"] is None
    b1 = got[("b", 1)]
    # 1000 held 2 minutes, 10 held 10 hours: TWAP barely above 10.
    span_min = 2 + 10 * 60
    assert b1["twap"] == (1000.0 * 2 + 10.0 * 600) / span_min
    assert b1["twap"] < 15.0  # plain mean would be 505


def test_purge_split_and_erasure_audit(spark):
    """purge_split partitions exactly (NULL keys are kept, never
    purged); erasure_audit counts match the split and dedups
    tombstones; cascade children audit against DERIVED key sets."""
    from big_data_engineering_project_spark.operators.governance import (
        erasure_audit,
        purge_split,
    )

    t = spark.createDataFrame([(2,), (2,), (5,)], "k LONG")  # dup + miss
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "c"), (None, "d"), (3, "e")],
        "k LONG, payload STRING",
    )
    purged, kept = purge_split(df, "k", t)
    assert sorted(r["payload"] for r in purged.collect()) == ["b", "c"]
    assert sorted(r["payload"] for r in kept.collect()) == ["a", "d", "e"]

    # cascade: child rows reference parent rows; child tombstones are
    # the purged parents' child keys.
    child = spark.createDataFrame(
        [(10, 2), (11, 2), (12, 1)], "ck LONG, parent LONG"
    )
    child_tomb = purge_split(child, "parent", t)[0].select("ck")
    grand = spark.createDataFrame(
        [(10, 1.0), (10, 2.0), (12, 3.0), (99, 4.0)], "ck LONG, v DOUBLE"
    )
    audit = {
        r["relation"]: r
        for r in erasure_audit(
            [
                ("df.k", df, "k", t),
                ("grand.ck", grand, "ck", child_tomb),
            ]
        ).collect()
    }
    a = audit["df.k"]
    assert (a["total_rows"], a["purged_rows"], a["kept_rows"]) == (5, 2, 3)
    assert a["purged_keys"] == 1
    g = audit["grand.ck"]
    # child_tomb = {10, 11}; grand rows with ck 10 purged (2 rows).
    assert (g["total_rows"], g["purged_rows"], g["kept_rows"]) == (4, 2, 2)
    assert g["purged_keys"] == 1


def test_pareto_frontier_matches_bruteforce(spark):
    """Two-phase prefix-max skyline == brute-force dominance on a
    fixture with duplicate points, equal-x ties, NULLs, and enough
    rows that the prefix max crosses range partitions."""
    import random

    from big_data_engineering_project_spark.operators.frontier import (
        pareto_frontier_2d,
    )

    rng = random.Random(13)
    rows = [(i, float(rng.randrange(20)), rng.randrange(15))
            for i in range(200)]
    rows += [(900, 3.0, 12), (901, 3.0, 12)]   # duplicate point
    rows += [(902, 3.0, 5)]                    # equal-x, dominated
    rows += [(903, None, 9), (904, 7.0, None)]  # NULL dims excluded
    df = spark.createDataFrame(rows, "id LONG, x DOUBLE, y INT")

    got = sorted(
        (r["id"], r["x"], r["y"])
        for r in pareto_frontier_2d(df, "x", "y", n_parts=5).collect()
    )

    pts = [(i, x, y) for i, x, y in rows if x is not None and y is not None]
    def dominated(p):
        return any(
            q[1] <= p[1] and q[2] >= p[2] and (q[1] < p[1] or q[2] > p[2])
            for q in pts
        )
    want = sorted(p for p in pts if not dominated(p))
    assert got == want
    assert (900, 3.0, 12) in got or (900, 3.0, 12) not in want  # dup rule


def test_dq_validate_rules(spark):
    from big_data_engineering_project_spark.operators.governance import (
        dq_validate,
    )

    df = spark.createDataFrame(
        [(1, 5.0, "a"), (2, None, "a"), (3, -1.0, "zz"), (3, 7.0, "b")],
        "id LONG, v DOUBLE, t STRING",
    )
    rules = [
        {"name": "v_nulls", "kind": "not_null_rate", "col": "v",
         "max_null_rate": 0.2},
        {"name": "id_unique", "kind": "unique", "col": "id"},
        {"name": "v_min", "kind": "min_bound", "col": "v", "bound": 0.0},
        {"name": "v_max", "kind": "max_bound", "col": "v", "bound": 10.0},
        {"name": "t_domain", "kind": "accepted_values", "col": "t",
         "vals": ["a", "b"]},
    ]
    got = {r["rule"]: r for r in dq_validate(df, rules).collect()}
    assert got["v_nulls"]["passed"] is False           # 1/4 > 0.2
    assert abs(got["v_nulls"]["observed"] - 0.25) < 1e-12
    assert got["id_unique"]["passed"] is False          # id 3 dup
    assert got["id_unique"]["observed"] == 1.0
    assert got["v_min"]["passed"] is False and got["v_min"]["observed"] == -1.0
    assert got["v_max"]["passed"] is True and got["v_max"]["observed"] == 7.0
    assert got["t_domain"]["passed"] is False           # 'zz'
    assert got["t_domain"]["observed"] == 1.0


def test_k_anonymity_audit_null_and_homogeneity_semantics(spark):
    """NULL QI values form their own class; NULL sensitive counts as
    one distinct value; a large-but-homogeneous class flags below_l
    while passing k (the homogeneity attack)."""
    from big_data_engineering_project_spark.operators.governance import (
        k_anonymity_audit,
    )

    rows = [
        # class (1, 'A'): 3 rows, all sens=7 → passes k=3, below_l (1 value)
        (1, "A", 7), (1, "A", 7), (1, "A", 7),
        # class (NULL, 'B'): 2 rows, sens {1, NULL} → diversity 2, below_k
        (None, "B", 1), (None, "B", None),
        # class (2, 'C'): 1 row → below both
        (2, "C", 5),
    ]
    df = spark.createDataFrame(rows, "qi1 INT, qi2 STRING, sens INT")
    got = {
        (r["qi1"], r["qi2"]): (
            r["class_size"],
            r["sensitive_diversity"],
            r["below_k"],
            r["below_l"],
        )
        for r in k_anonymity_audit(df, ["qi1", "qi2"], "sens", k=3, l=2).collect()
    }
    assert got == {
        (1, "A"): (3, 1, False, True),
        (None, "B"): (2, 2, True, False),
        (2, "C"): (1, 1, True, True),
    }
