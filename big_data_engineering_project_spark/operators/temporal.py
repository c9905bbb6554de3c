"""Temporal join operators: as-of join and banded range join.

The reference has no joins at all (SURVEY.md §2.5); these are
north-star extensions for event/time-series data — the two join shapes
Spark has no first-class operator for, implemented with the scalable
composition patterns rather than the naive plans Catalyst would pick:

- **As-of join** (`asof_join_backward`): per left row, the most recent
  right row at-or-before its timestamp, per key. The naive formulation
  (equi-join on key + time filter + row_number pick) multiplies rows by
  the full per-key match count before pruning; the union+window form
  here is ONE shuffle on the key, no row multiplication, and streams
  through each key partition in sorted order — the plan survives a
  100× scale-up as long as single keys fit a partition (salt upstream
  if not).

- **Banded range join** (`band_join`): interval predicate with NO
  equality key. Spark plans a raw non-equi join as
  BroadcastNestedLoopJoin — O(|L|·|R|) and a broadcast of a whole
  side. Bucketizing time into bands of exactly the window length turns
  it into an equi-join on the band id: each right interval overlaps at
  most 2 bands, so the exploded right side is ≤2×|R| rows, and the
  exact predicate re-filters inside the matched band. Shuffle-hash /
  sort-merge + AQE apply as with any equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
) -> DataFrame:
    """Left as-of join: every `left` row, plus `payload_cols` (and
    `right_time`) from the latest `right` row with the same `key` and
    `right_time` <= `left_time`; NULLs when no such row exists.

    Contract: `right` must be unique per (key, right_time) — pre-
    aggregate ties away (the tie order would otherwise be
    nondeterministic). Inclusive match: a right row AT the left
    timestamp is visible (right sorts before left on ties).

    Plan: union both sides tagged with a side marker → one window
    (partitionBy key, orderBy time/side) carrying the last non-null
    right payload forward → keep left rows. Single exchange, no join.
    """
    carried = [right_time, *payload_cols]
    l2 = left.select(
        F.col(key).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*left.columns).alias("__row"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}") for c in carried],
    )
    r2 = right.select(
        F.col(key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            l2.schema["__row"].dataType
        ).alias("__row"),
        *[F.col(c).alias(f"__p_{c}") for c in carried],
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # last(ignorenulls) over a struct keeps all payload fields from the
    # SAME right row — per-column last() could mix rows if a payload
    # column were legitimately NULL.
    pstruct = F.struct(*[F.col(f"__p_{c}").alias(c) for c in carried])
    tagged = l2.unionByName(r2).withColumn(
        "__carried",
        F.last(F.when(F.col("__side") == 0, pstruct), ignorenulls=True).over(w),
    )
    return tagged.filter(F.col("__side") == 1).select(
        "__row.*", *[F.col(f"__carried.{c}").alias(f"asof_{c}") for c in carried]
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
) -> DataFrame:
    """Forward as-of: every `left` row, plus payload from the EARLIEST
    `right` row with the same key and `right_time` >= `left_time` —
    the "next event after" join (next restock after a stock-out, next
    deploy after an alert). Same contract as the backward form:
    `right` unique per (key, right_time), inclusive at ties, NULLs
    when nothing follows.

    Identical one-shuffle union+window plan, with the window ordered
    DESCENDING — the last non-null right payload over the reversed
    stream is exactly the nearest following right row.
    """
    carried = [right_time, *payload_cols]
    l2 = left.select(
        F.col(key).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*left.columns).alias("__row"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}")
            for c in carried
        ],
    )
    r2 = right.select(
        F.col(key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l2.schema["__row"].dataType).alias("__row"),
        *[F.col(c).alias(f"__p_{c}") for c in carried],
    )
    # DESC by time; within a tie the right row must still be VISIBLE to
    # the left row (inclusive >=), so right sorts first here as well —
    # __side ASC keeps 0 (right) before 1 (left) at equal __t.
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").desc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pstruct = F.struct(*[F.col(f"__p_{c}").alias(c) for c in carried])
    tagged = l2.unionByName(r2).withColumn(
        "__carried",
        F.last(F.when(F.col("__side") == 0, pstruct), ignorenulls=True).over(w),
    )
    return tagged.filter(F.col("__side") == 1).select(
        "__row.*",
        *[F.col(f"__carried.{c}").alias(f"asof_{c}") for c in carried],
    )


def asof_join_backward_salted(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    bucket_seconds: int,
) -> DataFrame:
    """`asof_join_backward` for SKEWED keys: identical contract and
    output, but the big shuffle partitions by (key, time-bucket) so no
    single key's history ever has to fit one partition — this is the
    "salt upstream" path SCALING.md names for hot keys at 100 TB.

    Exact two-pass algorithm (no approximation):

    1. Per-(key, bucket) right-side summary: the latest right row of
       each bucket (map-side-combined `max_by`, one small shuffle of
       |key·bucket| rows).
    2. Per-key carry: for every bucket either side touches, the latest
       summary from STRICTLY EARLIER buckets (a window over the
       summaries table — rows = touched buckets, not events, so a
       hot key with a billion events but a bounded time range stays a
       few thousand summary rows).
    3. The union+window sweep of `asof_join_backward`, now partitioned
       by (key, bucket), with the carry injected at each bucket's floor
       timestamp (side −1 sorts before any real event in the bucket,
       so a right row AT the boundary overrides it).

    Trade-off vs the unsalted form: two extra small shuffles buy
    unbounded per-key parallelism. Pick `bucket_seconds` so a hot
    key's densest bucket fits a partition.
    """
    from pyspark.sql.types import StructField, StructType

    carried = [right_time, *payload_cols]
    bucket = lambda c: F.floor(  # noqa: E731
        F.unix_timestamp(F.col(c)) / bucket_seconds
    )
    p_type = StructType(
        [StructField(c, right.schema[c].dataType) for c in carried]
    )
    pstruct = F.struct(*[F.col(c).alias(c) for c in carried])

    # Pass 1: latest right row per (key, bucket). Right is unique per
    # (key, right_time) by contract, so max_by has no ties.
    summaries = right.groupBy(
        F.col(key).alias("__k"), bucket(right_time).alias("__b")
    ).agg(F.max_by(pstruct, F.col(right_time)).alias("__summary"))

    # Pass 2: carry-in per touched (key, bucket) — the latest summary
    # among strictly earlier buckets. Window is over summary rows
    # (buckets, not events): tiny by construction.
    dom = (
        left.select(F.col(key).alias("__k"), bucket(left_time).alias("__b"))
        .distinct()
        .unionByName(summaries.select("__k", "__b"))
        .distinct()
        .join(summaries, ["__k", "__b"], "left")
    )
    w_carry = (
        Window.partitionBy("__k")
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        dom.withColumn(
            "__p", F.last("__summary", ignorenulls=True).over(w_carry)
        )
        .filter(F.col("__p").isNotNull())
        .select(
            "__k",
            "__b",
            # bucket floor ≤ every event time in the bucket; side −1
            # loses ties to a right row exactly at the boundary
            F.timestamp_seconds(F.col("__b") * bucket_seconds).alias("__t"),
            F.lit(-1).alias("__side"),
            F.col("__p"),
        )
    )

    # Pass 3: the union+window sweep, partitioned by (key, bucket).
    l2 = left.select(
        F.col(key).alias("__k"),
        bucket(left_time).alias("__b"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*left.columns).alias("__row"),
        F.lit(None).cast(p_type).alias("__p"),
    )
    r2 = right.select(
        F.col(key).alias("__k"),
        bucket(right_time).alias("__b"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l2.schema["__row"].dataType).alias("__row"),
        pstruct.alias("__p"),
    )
    c2 = carry.select(
        "__k",
        "__b",
        "__t",
        "__side",
        F.lit(None).cast(l2.schema["__row"].dataType).alias("__row"),
        "__p",
    )
    w = (
        Window.partitionBy("__k", "__b")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = (
        l2.unionByName(r2)
        .unionByName(c2)
        .withColumn("__carried", F.last("__p", ignorenulls=True).over(w))
    )
    return tagged.filter(F.col("__side") == 1).select(
        "__row.*",
        *[F.col(f"__carried.{c}").alias(f"asof_{c}") for c in carried],
    )


def asof_join_forward_salted(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    bucket_seconds: int,
) -> DataFrame:
    """`asof_join_forward` for skewed keys — the time-mirror of
    `asof_join_backward_salted`: per-(key, bucket) EARLIEST-right
    summaries (`min_by`), a per-key carry from STRICTLY LATER buckets
    (window ordered by bucket DESC over summary rows), and the sweep
    window ordered by time DESC within each (key, bucket). The carry
    injects at the bucket's END timestamp (the next bucket's floor) —
    in the descending sweep it sorts first, and a real right row at
    that exact boundary lives in the NEXT bucket, so it is already part
    of the carry; no tie to lose.
    """
    from pyspark.sql.types import StructField, StructType

    carried = [right_time, *payload_cols]
    bucket = lambda c: F.floor(  # noqa: E731
        F.unix_timestamp(F.col(c)) / bucket_seconds
    )
    p_type = StructType(
        [StructField(c, right.schema[c].dataType) for c in carried]
    )
    pstruct = F.struct(*[F.col(c).alias(c) for c in carried])

    summaries = right.groupBy(
        F.col(key).alias("__k"), bucket(right_time).alias("__b")
    ).agg(F.min_by(pstruct, F.col(right_time)).alias("__summary"))

    dom = (
        left.select(F.col(key).alias("__k"), bucket(left_time).alias("__b"))
        .distinct()
        .unionByName(summaries.select("__k", "__b"))
        .distinct()
        .join(summaries, ["__k", "__b"], "left")
    )
    w_carry = (
        Window.partitionBy("__k")
        .orderBy(F.col("__b").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        dom.withColumn(
            "__p", F.last("__summary", ignorenulls=True).over(w_carry)
        )
        .filter(F.col("__p").isNotNull())
        .select(
            "__k",
            "__b",
            F.timestamp_seconds((F.col("__b") + 1) * bucket_seconds).alias(
                "__t"
            ),
            F.lit(-1).alias("__side"),
            F.col("__p"),
        )
    )

    l2 = left.select(
        F.col(key).alias("__k"),
        bucket(left_time).alias("__b"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*left.columns).alias("__row"),
        F.lit(None).cast(p_type).alias("__p"),
    )
    r2 = right.select(
        F.col(key).alias("__k"),
        bucket(right_time).alias("__b"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l2.schema["__row"].dataType).alias("__row"),
        pstruct.alias("__p"),
    )
    c2 = carry.select(
        "__k",
        "__b",
        "__t",
        "__side",
        F.lit(None).cast(l2.schema["__row"].dataType).alias("__row"),
        "__p",
    )
    # DESC sweep; at equal __t the right row (side 0) must stay visible
    # to the left row (side 1) — side ASC keeps 0 before 1, and the
    # carry (side −1, stamped at the bucket end) leads the bucket.
    w = (
        Window.partitionBy("__k", "__b")
        .orderBy(F.col("__t").desc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = (
        l2.unionByName(r2)
        .unionByName(c2)
        .withColumn("__carried", F.last("__p", ignorenulls=True).over(w))
    )
    return tagged.filter(F.col("__side") == 1).select(
        "__row.*",
        *[F.col(f"__carried.{c}").alias(f"asof_{c}") for c in carried],
    )


def band_join(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_time: str,
    window_seconds: int,
) -> DataFrame:
    """All (left, right) pairs with
    `right_time <= left_time < right_time + window_seconds`, with no
    equality key — via time bands of exactly `window_seconds`.

    Each right interval [t, t+W) overlaps at most 2 bands of width W,
    so the right side explodes to ≤2 rows each; the band equi-join then
    prunes to same-band pairs and the exact predicate filters within.
    A left row matches a given right row in exactly one band (the left
    row's own), so no dedup is needed. Column names must not collide —
    alias before calling.
    """
    band = lambda c: F.floor(F.unix_timestamp(F.col(c)) / window_seconds)  # noqa: E731
    l2 = left.withColumn("__band", band(left_time))
    r2 = right.withColumn(
        "__band",
        F.explode(
            F.sequence(
                band(right_time),
                # Upper band must cover every left row satisfying the
                # exact predicate even with SUB-SECOND timestamps: a
                # left row at t_l < t_r + W has unix_timestamp(t_l)
                # (truncated) ≤ floor(t_r) + W, so its band is at most
                # floor((floor(t_r) + W) / W). Costs at most one extra
                # exploded row vs the tight second-resolution bound
                # (band-aligned intervals explode to 2 rows, not 1).
                F.floor(
                    (F.unix_timestamp(F.col(right_time)) + window_seconds)
                    / window_seconds
                ),
            )
        ),
    )
    # Exact predicate on the raw timestamps (interval arithmetic, not
    # unix_timestamp — that would truncate sub-second precision).
    lt, rt = F.col(left_time), F.col(right_time)
    exact = (lt >= rt) & (lt < rt + F.expr(f"INTERVAL {int(window_seconds)} SECOND"))
    return l2.join(r2, on="__band").filter(exact).drop("__band")


# --- Gap-fill resampling (LOCF onto a regular grid) ---------------------------

_GRID_SENTINEL_ID = 9_000_000_000_000_000_000  # sorts after any real id


def gap_fill_locf(
    df: DataFrame,
    key: str,
    time_col: str,
    value_col: str,
    step_seconds: int,
    id_col: str,
) -> DataFrame:
    """Resample each key's observation series onto a regular
    `step_seconds` grid with last-observation-carried-forward — the
    continuous-grid sibling of the as-of join (every grid point is an
    as-of lookup against the same key's own series), and the
    timescale-style `locf(time_bucket(...))` gap-fill.

    Grid: per key, from floor-aligned min(ts) to floor-aligned
    max(ts) in INTEGER epoch seconds (sequence + explode — bounded by
    span/step per key, never a global calendar). Fill: observations
    and grid points union into one frame; ONE per-key window ordered
    by (second, observations-first, id) takes the running last
    non-null value, so a grid point at second T sees every
    observation with ts ≤ T — the newest (by `id_col`) winning ties
    deterministically in any engine. Grid points before a key's first
    observation stay NULL (nothing to carry).

    Shape: one bounds aggregation + one union + one keyed window —
    two exchanges on the key, no join, no row multiplication beyond
    the grid itself. Output: [key, grid_ts, filled value_col].

    `id_col` must be a non-negative long below 9e18 (the grid
    sentinel orders grid points after every real observation of the
    same second — NULL sort order differs across engines, so the
    sentinel replaces a NULL id)."""
    sec = F.unix_timestamp(F.col(time_col))
    ev = df.select(
        F.col(key).alias("__k"),
        sec.alias("__sec"),
        F.col(id_col).cast("long").alias("__id"),
        F.col(value_col).alias("__v"),
    )
    # F.floor, not truncating cast: for pre-1970 (negative epoch)
    # timestamps truncation rounds toward zero while the documented
    # contract — and the DuckDB `//` oracle — floor toward -inf.
    bounds = ev.groupBy("__k").agg(
        F.floor(F.min("__sec") / step_seconds).cast("long").alias("__g0"),
        F.floor(F.max("__sec") / step_seconds).cast("long").alias("__g1"),
    )
    grid = bounds.select(
        "__k",
        F.explode(
            F.sequence(
                F.col("__g0") * step_seconds,
                F.col("__g1") * step_seconds,
                F.lit(step_seconds),
            )
        ).alias("__sec"),
        F.lit(_GRID_SENTINEL_ID).alias("__id"),
        F.lit(None).cast(dict(df.dtypes)[value_col]).alias("__v"),
    ).withColumn("__is_obs", F.lit(0))
    un = ev.withColumn("__is_obs", F.lit(1)).unionByName(grid)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.asc("__sec"), F.desc("__is_obs"), F.asc("__id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        un.withColumn("__filled", F.last("__v", ignorenulls=True).over(w))
        .filter(F.col("__is_obs") == 0)
        .select(
            F.col("__k").alias(key),
            F.timestamp_seconds(F.col("__sec")).alias("grid_ts"),
            F.col("__filled").alias(value_col),
        )
    )


def ohlc_resample(
    df: DataFrame,
    key: str,
    time_col: str,
    value_col: str,
    id_col: str,
    bucket: str = "day",
) -> DataFrame:
    """Downsample a value series to per-(key, bucket) OHLC bars:
    open / high / low / close / volume — the finance-style resample
    every monitoring and time-series store exposes (timescale
    `time_bucket` + `first`/`last`, influx `aggregateWindow`).

    Open/close are argmin/argmax over event time expressed as
    `min(struct(time, id, value))` / `max(struct(...))`: lexicographic
    struct comparison makes the aggregate PARTIAL-AGGREGABLE (each
    task keeps one candidate struct; combine is a pairwise min), so
    the whole bar computes in ONE map-side-combined groupBy with NO
    window — a hot (key, bucket) never lands in a single window
    partition, unlike the row_number formulation the oracle uses.
    `id_col` (unique) breaks same-timestamp ties, so the selected
    open/close rows are a total order and engine-independent.

    Scale: one shuffle on (key, bucket); state per group is O(1)
    (two candidate structs + 3 numbers). 100 TB of ticks with a hot
    symbol-day still aggregates — partial state merges, nothing
    sorts."""
    b = F.date_trunc(bucket, F.col(time_col))
    o = F.struct(
        F.col(time_col).alias("t"),
        F.col(id_col).alias("i"),
        F.col(value_col).alias("v"),
    )
    return (
        df.select(
            F.col(key).alias(key),
            b.alias("bucket_ts"),
            o.alias("__o"),
            F.col(value_col).alias("__v"),
        )
        .groupBy(key, "bucket_ts")
        .agg(
            F.min("__o").getField("v").alias("open"),
            F.max("__v").alias("high"),
            F.min("__v").alias("low"),
            F.max("__o").getField("v").alias("close"),
            F.count(F.lit(1)).cast("long").alias("volume"),
        )
    )


def gap_fill_interpolate(
    df: DataFrame,
    key: str,
    time_col: str,
    value_col: str,
    step_seconds: int,
    id_col: str,
) -> DataFrame:
    """Resample each key's series onto a regular grid with LINEAR
    interpolation between the surrounding observations — the other
    resample mode beside `gap_fill_locf` (LOCF holds the last value;
    interpolation draws the line through the bracketing samples:
    v = v_prev + (v_next − v_prev)·(t − t_prev)/(t_next − t_prev)).

    Same scale shape as LOCF: bounds agg → per-key integer grid →
    union → TWO window passes over ONE (key, (sec, obs-first, id))
    sort — a running last-observation (sec, value) forward and a
    running next-observation backward frame; Spark plans both over a
    single exchange+sort. No join, no row multiplication beyond the
    grid. Exactness: t/t_prev/t_next are integer seconds and
    v_prev/v_next raw parquet doubles, so the one interpolation
    expression — mirrored operand-for-operand by the oracle — is
    bit-identical cross-engine. Grid points outside [first, last]
    observation emit NULL (no extrapolation); a grid point landing
    exactly on an observation returns that observation's value
    ((t − t_prev) = 0, newest id winning same-second ties via the
    obs-before-grid sort). Ties on observation seconds resolve by
    `id_col` exactly as in gap_fill_locf.
    """
    sec = F.unix_timestamp(F.col(time_col))
    ev = df.select(
        F.col(key).alias("__k"),
        sec.alias("__sec"),
        F.col(id_col).cast("long").alias("__id"),
        F.col(value_col).cast("double").alias("__v"),
    )
    bounds = ev.groupBy("__k").agg(
        F.floor(F.min("__sec") / step_seconds).cast("long").alias("__g0"),
        F.floor(F.max("__sec") / step_seconds).cast("long").alias("__g1"),
    )
    grid = bounds.select(
        "__k",
        F.explode(
            F.sequence(
                F.col("__g0") * step_seconds,
                F.col("__g1") * step_seconds,
                F.lit(step_seconds),
            )
        ).alias("__sec"),
        F.lit(_GRID_SENTINEL_ID).alias("__id"),
        F.lit(None).cast("double").alias("__v"),
    ).withColumn("__is_obs", F.lit(0))
    un = ev.withColumn("__is_obs", F.lit(1)).unionByName(grid)
    order = [F.asc("__sec"), F.desc("__is_obs"), F.asc("__id")]
    back = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fwd = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_sec = F.when(F.col("__is_obs") == 1, F.col("__sec"))
    obs_v = F.when(F.col("__is_obs") == 1, F.col("__v"))
    filled = (
        un.withColumn("__ps", F.last(obs_sec, ignorenulls=True).over(back))
        .withColumn("__pv", F.last(obs_v, ignorenulls=True).over(back))
        .withColumn("__ns", F.first(obs_sec, ignorenulls=True).over(fwd))
        .withColumn("__nv", F.first(obs_v, ignorenulls=True).over(fwd))
    )
    # ps == sec → the grid point IS an observation second: return its
    # value even when no later observation exists (last-point case);
    # otherwise both brackets must exist.
    interp = F.when(
        F.col("__ps") == F.col("__sec"), F.col("__pv")
    ).otherwise(
        F.when(
            F.col("__ps").isNotNull() & F.col("__ns").isNotNull(),
            F.col("__pv")
            + (F.col("__nv") - F.col("__pv"))
            * (F.col("__sec") - F.col("__ps")).cast("double")
            / (F.col("__ns") - F.col("__ps")).cast("double"),
        )
    )
    return (
        filled.filter(F.col("__is_obs") == 0)
        .select(
            F.col("__k").alias(key),
            F.timestamp_seconds(F.col("__sec")).alias("grid_ts"),
            interp.alias(value_col),
        )
    )


def time_weighted_avg(
    df: DataFrame,
    keys: list[str],
    time_col: str,
    value_col: str,
    id_col: str,
    bucket: str = "day",
    value_scale: int = 100,
) -> DataFrame:
    """Time-weighted average per (keys..., bucket): each observation's
    value holds from its timestamp until the NEXT observation in the
    same bucket (LOCF step function), TWAP = integral / covered span —
    timescaledb's `time_weight('LOCF', ...)` / the finance TWAP. The
    plain AVG over-weights bursts; TWAP weights each value by how long
    it was in effect.

    Semantics: the bucket's last observation gets zero weight (nothing
    known after it inside the bucket); single-observation buckets have
    an empty covered span -> `twap` NULL, never a division by zero.

    Exactness: values quantized to integer units (`round(v*scale)`,
    the established cents pattern), durations are integer epoch-µs,
    the integral is SUM(DECIMAL(38,0)) — exact and combine-order-free;
    the single IEEE division happens on a correctly-rounded double
    cast mirrored operand-for-operand by the oracle. `span_us` is
    day-bounded (< 2^53) so its double cast is exact.

    Plan: one window per (keys, bucket) partition for `lead` (the same
    day-bounded per-key sort as sessionization), then a partial-
    aggregable groupBy — the exchange is shared, Spark plans Window +
    HashAggregate over one sort. Hot (key, day) cells bound the window
    partition; salt upstream if a single key-day exceeds a partition.
    """
    bucket_col = F.date_trunc(bucket, F.col(time_col)).alias("__bucket")
    us = F.unix_micros(F.col(time_col))
    units = F.round(F.col(value_col) * value_scale, 0).cast("long")
    base = df.select(
        *keys,
        bucket_col,
        us.alias("__us"),
        F.col(id_col).alias("__id"),
        units.alias("__units"),
    )
    w = Window.partitionBy(*keys, "__bucket").orderBy("__us", "__id")
    stepped = base.withColumn("__dur", F.lead("__us").over(w) - F.col("__us"))
    return (
        stepped.groupBy(*keys, F.col("__bucket").alias("bucket_ts"))
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.coalesce(F.sum("__dur"), F.lit(0)).cast("long").alias("span_us"),
            F.sum(
                F.col("__units").cast("decimal(38,0)") * F.col("__dur")
            ).alias("__integral"),
        )
        .withColumn(
            "twap",
            F.when(
                F.col("span_us") > 0,
                F.col("__integral").cast("double")
                / (F.col("span_us").cast("double") * float(value_scale)),
            ),
        )
        .drop("__integral")
    )


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    bin_seconds: int,
    suffixes: tuple[str, str] = ("_a", "_b"),
) -> DataFrame:
    """KEYLESS interval-overlap join: every pair (row of `a`, row of
    `b`) whose closed integer-second intervals [s, e] overlap
    (a.s ≤ b.e AND b.s ≤ a.e). Both inputs carry columns `s` and `e`
    (epoch seconds, BIGINT, s ≤ e); all other columns pass through
    with the given suffixes. Completes the temporal-join family:
    as-of joins match a POINT to its nearest neighbor, the band join
    matches a point to a time WINDOW — this matches WINDOW to WINDOW
    (sessions × incidents, fulfillment spans × promotion windows),
    which neither can express.

    A naive formulation is a cross join with a range predicate — at
    scale, |a|·|b| pairs examined. Here both sides replicate to the
    fixed time bins their interval covers (explode of a bounded
    sequence), the join is EQUI on the bin (shuffle-partitionable,
    AQE-splittable, skew-salvageable — everything a cross join is
    not), the overlap predicate verifies inside the join, and each
    qualifying pair is emitted EXACTLY ONCE without any dedup pass:
    only the canonical bin — the bin containing max(a.s, b.s), the
    overlap's left edge, which both sides necessarily cover — may
    emit (the standard emit-at-first-overlap-bin trick; a distinct()
    over pair ids would be a second full shuffle).

    `bin_seconds` is the honest knob: replication factor =
    interval_length/bin_seconds + 1 per row, join width = rows per
    bin. Choose it near the typical interval length — the same
    trade-off as the band join's bucket width (temporal.py:band_join).
    """
    sfx_a, sfx_b = suffixes

    def prep(df: DataFrame, sfx: str) -> DataFrame:
        keep = [
            F.col(c).alias(f"{c}{sfx}") for c in df.columns
        ]
        return df.select(
            *keep,
            F.explode(
                F.sequence(
                    F.expr(f"s DIV {int(bin_seconds)}"),
                    F.expr(f"e DIV {int(bin_seconds)}"),
                )
            ).alias("__bin"),
        )

    ea, eb = prep(a, sfx_a), prep(b, sfx_b)
    s_a, e_a = F.col(f"s{sfx_a}"), F.col(f"e{sfx_a}")
    s_b, e_b = F.col(f"s{sfx_b}"), F.col(f"e{sfx_b}")
    canonical = F.expr(
        f"greatest(s{sfx_a}, s{sfx_b}) DIV {int(bin_seconds)}"
    )
    return ea.join(
        eb,
        (ea["__bin"] == eb["__bin"])
        & (s_a <= e_b)
        & (s_b <= e_a)
        & (ea["__bin"] == canonical),
    ).drop("__bin")


def concurrency_profile(
    intervals: DataFrame,
    key_cols: list[str],
    start_col: str,
    end_col: str,
    bucket: str = "month",
) -> DataFrame:
    """Sweep-line concurrency: per key, the MAXIMUM number of
    simultaneously-open closed intervals [start, end] and the first
    instant it is reached — peak load of open orders / sessions /
    incidents, the classic event-boundary aggregation (interval
    endpoints become +1/-1 deltas; concurrency is the running sum).

    Scale shape — the naive form is ONE window ordered over every
    boundary of a key: a low-cardinality key (5 order priorities,
    one global profile) funnels millions of boundaries into a single
    sort task. Here the prefix sum is TWO-LEVEL, the
    linkage.py global-row-number trick applied to time: boundaries
    aggregate to (key, instant) net deltas (partial-aggregable), the
    within-`bucket` running sum is a window over one bucket's
    instants, and each bucket's STARTING offset is the rolling sum of
    per-bucket totals — a window over (key, bucket) rows, bounded by
    the calendar, not the data. No task ever sorts more than one
    (key, bucket) of boundary instants; the skew knob is `bucket`.

    Determinism: counts are integers; the peak instant is the FIRST
    time the max is reached (total order on instants — equal-instant
    deltas pre-collapse into one net row).

    Closed-interval convention: an interval [s, e] is open AT e and
    closes just after — the -1 boundary sits at e + 1 time unit,
    chosen from the END column's type: DATE ends close at e + 1 day
    (the oracle's e + INTERVAL 1 DAY), TIMESTAMP ends at e + 1 second
    (r9 ADVICE #3: F.date_add on a timestamp would silently truncate
    intraday closes to midnight).
    """
    from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

    end_type = intervals.schema[end_col].dataType
    if isinstance(end_type, DateType):
        close = F.date_add(F.col(end_col), 1).cast("timestamp")
    elif isinstance(end_type, (TimestampType, TimestampNTZType)):
        close = F.col(end_col) + F.expr("INTERVAL 1 SECOND")
    else:
        raise TypeError(
            f"concurrency_profile: end column '{end_col}' must be "
            f"DATE or TIMESTAMP, got {end_type.simpleString()}"
        )
    plus = intervals.select(
        *key_cols, F.col(start_col).alias("t"), F.lit(1).alias("d")
    )
    minus = intervals.select(
        *key_cols,
        close.alias("t"),
        F.lit(-1).alias("d"),
    )
    deltas = (
        plus.unionByName(minus)
        .groupBy(*key_cols, "t")
        .agg(F.sum("d").cast("long").alias("nd"))
        .withColumn("b", F.date_trunc(bucket, F.col("t")))
    )
    w_in = (
        Window.partitionBy(*key_cols, "b")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = deltas.withColumn("run_in", F.sum("nd").over(w_in))
    per_bucket = deltas.groupBy(*key_cols, "b").agg(
        F.sum("nd").alias("bucket_total")
    )
    w_off = (
        Window.partitionBy(*key_cols)
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    )
    offsets = per_bucket.withColumn(
        "off", F.coalesce(F.sum("bucket_total").over(w_off), F.lit(0))
    ).select(*key_cols, "b", "off")
    runs = within.join(offsets, [*key_cols, "b"]).withColumn(
        "conc", (F.col("run_in") + F.col("off")).cast("long")
    )
    peak = F.struct(
        F.col("conc").alias("c"), (-F.unix_timestamp("t")).alias("negt")
    )
    return (
        runs.groupBy(*key_cols)
        .agg(F.max(peak).alias("__p"))
        .select(
            *key_cols,
            F.col("__p.c").alias("max_concurrent"),
            F.timestamp_seconds(-F.col("__p.negt")).alias("peak_ts"),
        )
    )
