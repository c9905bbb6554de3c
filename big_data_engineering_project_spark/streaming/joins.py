"""Stream-stream interval join (§2.11 extension — the reference joins
nothing, let alone two live streams; this is the idiomatic Spark
Structured Streaming shape for click→conversion style correlation).

A stream-stream inner join buffers BOTH sides in the state store until
a match can be ruled out. Unbounded, that state is 100 TB of history;
the interval condition + watermarks make it finite: a right row can
only match left rows with `left_ts ∈ [right_ts − max_delay, right_ts]`,
so once the watermark passes that horizon the row is evicted. State
held per side ≈ rate · (watermark + max_delay) — a sizing knob, not a
leak. Spark derives the eviction bound from the join predicate itself,
which is why the time-range condition must be part of the JOIN
condition, not a post-filter (a post-filter keeps state unbounded and
Spark rejects the query).

Column-name contract: the two inputs must have disjoint column names
(rename upstream) — stream-stream joins cannot disambiguate later.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    max_delay_seconds: int,
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join: right row within [left_ts, left_ts + max_delay].

    Works identically on batch frames (watermark is a no-op there), so
    stream ≡ batch is testable with the same expression — the repo's
    standard streaming contract.

    how="left_outer" is the funnel-abandonment shape: a left row with
    no match emits with NULL right columns — but only once the
    watermark passes left_ts + max_delay (before that a match could
    still arrive), so unmatched results are themselves
    watermark-delayed. The GLOBAL watermark is the min across both
    inputs: a stream that goes quiet holds back every pending
    null-emission — production jobs that need timely abandonment
    rows keep both sources heartbeating (the streaming check plants
    sentinel rows for exactly this)."""
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = (
        (l[left_key] == r[right_key])
        & (r[right_ts] >= l[left_ts])
        & (
            r[right_ts]
            <= l[left_ts] + F.expr(f"INTERVAL {max_delay_seconds} SECONDS")
        )
    )
    return l.join(r, cond, how)
