"""Incremental aggregate maintenance (materialized-view upkeep).

A warehouse serving layer rarely re-scans the fact table to refresh a
grouped aggregate — it keeps per-key SUFFICIENT STATISTICS and folds
each new load into them. This module is that algebra, engine-side:

  state  = agg_state(batch)        one row per key:
                                   n, s1 = Σv, s2 = Σv² (exact
                                   DECIMAL(38,0) over integer
                                   micro-units), mn, mx
  state' = agg_merge(state, agg_state(delta))   component-wise:
                                   counts/sums ADD, min/max fold
  serve  = agg_finish(state')      count / total / min / max / mean /
                                   sample variance, the doubles
                                   appearing only in ONE final
                                   division each (mean = s1/n,
                                   var = (n·s2 − s1²)/(n·(n−1)))

Because (n, s1, s2, mn, mx) is a commutative monoid under agg_merge,
ANY partition of the input into loads folds to the identical state —
the same mergeable-partial-state discipline as the streaming OHLC /
CM / KMV maintenance (streaming/scd2.py), lifted to the generic
grouped aggregate. DELETES: pass sign_col (+1/−1 changelog) — n, s1,
s2 retract exactly (the counting/DBSP rule); min/max are NOT
retractable from state alone, so `agg_state` refuses a sign_col
unless track_minmax=False (a deleted extreme would need the full
group re-read — the documented limit, not a silent wrong answer).

Reference anchor: the DynamoDB keyed upsert (S/kinesis_processing_2
.py:149-163) maintains latest-value state per key; this is the same
incremental posture for aggregate serving, with an exact full-
recompute oracle (the registered query proves maintained ≡ recompute
hash-exactly).

Scale shape: agg_state is ONE partial-aggregable groupBy (map-side
combine collapses each partition to ≤ |keys| rows before the
exchange); agg_merge shuffles only the two STATE tables (key-
cardinality-sized, never facts); agg_finish is a projection. At
100 TB the delta is a day's load and the state table is what the
nightly job touches — the fact table is read exactly once, ever.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_STATE_COLS = ("n", "s1", "s2", "mn", "mx")


def agg_state(
    df: DataFrame,
    keys: list[str],
    value: Column | str,
    sign_col: str | None = None,
    track_minmax: bool = True,
) -> DataFrame:
    """Per-key sufficient statistics of an INTEGER measure (pass
    micro-units; exactness of s1/s2 requires it). With `sign_col`
    (+1/−1), rows retract — only the linear stats are maintainable,
    so track_minmax must be False."""
    if sign_col is not None and track_minmax:
        raise ValueError(
            "min/max are not retractable from state alone; pass "
            "track_minmax=False with a sign column"
        )
    v = F.col(value) if isinstance(value, str) else value
    sgn = (
        F.col(sign_col).cast("decimal(38,0)")
        if sign_col is not None
        else F.lit(1).cast("decimal(38,0)")
    )
    vd = v.cast("decimal(38,0)")
    aggs = [
        F.sum(sgn.cast("long")).alias("n"),
        F.sum(sgn * vd).alias("s1"),
        F.sum(sgn * vd * vd).alias("s2"),
    ]
    if track_minmax:
        aggs += [F.min(v).alias("mn"), F.max(v).alias("mx")]
    return df.groupBy(*keys).agg(*aggs)


def agg_merge(state: DataFrame, delta: DataFrame, keys: list[str]) -> DataFrame:
    """Fold a delta state into an existing state: counts and sums add,
    min/max fold (when both carry them). Commutative + associative —
    any load order yields the identical state."""
    has_minmax = "mn" in state.columns and "mn" in delta.columns
    cols = _STATE_COLS if has_minmax else _STATE_COLS[:3]
    aggs = [
        F.sum("n").alias("n"),
        F.sum("s1").alias("s1"),
        F.sum("s2").alias("s2"),
    ]
    if has_minmax:
        aggs += [F.min("mn").alias("mn"), F.max("mx").alias("mx")]
    return (
        state.select(*keys, *cols)
        .unionByName(delta.select(*keys, *cols))
        .groupBy(*keys)
        .agg(*aggs)
    )


def agg_finish(state: DataFrame, keys: list[str]) -> DataFrame:
    """Serveable aggregates from state. Exact integers for count /
    total / min / max; mean and SAMPLE variance each spend exactly one
    IEEE division on exact decimal operands (cross-engine stable —
    mirror the formula operand-for-operand in oracles). Groups fully
    retracted to n = 0 are dropped (they no longer exist); n = 1
    yields NULL variance."""
    out = state.filter(F.col("n") > 0).select(
        *keys,
        F.col("n"),
        F.col("s1").cast("long").alias("total"),
        (
            F.col("s1").cast("double") / F.col("n").cast("double")
        ).alias("mean"),
        F.when(
            F.col("n") > 1,
            (
                F.col("n").cast("decimal(38,0)") * F.col("s2")
                - F.col("s1") * F.col("s1")
            ).cast("double")
            / (F.col("n") * (F.col("n") - 1)).cast("double"),
        ).alias("var_samp"),
        *(
            [F.col("mn"), F.col("mx")]
            if "mn" in state.columns
            else []
        ),
    )
    return out
