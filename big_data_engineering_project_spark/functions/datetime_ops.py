"""Date/time functions D1–D6 (SURVEY.md §2.10).

Session timezone is pinned UTC (session.py), which resolves the
reference's naive-vs-aware mismatch (`reddit_kinesis_1.py:36` vs
`kinesis_processing_2.py:86-87`).

D5 divergence note: the notebook splits a timestamp on the EMPTY
pattern (`F.split(ts,'')[0]`, NB:1820-1821) which yields single
characters — a bug. We implement the intent: `to_date` /
`date_format(..., 'HH:mm:ss')` (SURVEY.md §4 "known reference bugs").
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def from_epoch_seconds(c: Column) -> Column:
    """D1: epoch seconds → timestamp (`reddit_kinesis_1.py:32-36`)."""
    return F.timestamp_seconds(c)


def parse_timestamp(c: Column) -> Column:
    """D2: parse 'yyyy-MM-dd HH:mm:ss' (`kinesis_processing_2.py:54-64`,
    NB:1810). Unparseable strings → NULL (try_to_timestamp), matching
    the consumer's tolerant normalization."""
    return F.try_to_timestamp(c, F.lit(TS_FMT))


def post_age_minutes(created: Column, now: Column) -> Column:
    """D3: (now − created)/60 (`kinesis_processing_2.py:86-87`).
    `now` is injected (frozen in tests) — never wall-clock inside the
    plan, so results are deterministic and oracle-checkable."""
    return (F.unix_timestamp(now) - F.unix_timestamp(created)) / F.lit(60.0)


def date_parts(c: Column) -> dict[str, Column]:
    """D4: year/month/day/hour extraction (NB:1822-1825)."""
    return {
        "year": F.year(c),
        "month": F.month(c),
        "day": F.dayofmonth(c),
        "hour": F.hour(c),
    }


def date_and_time(c: Column) -> tuple[Column, Column]:
    """D5 (intent, not the reference's empty-split bug): date half and
    time half of a timestamp."""
    return F.to_date(c), F.date_format(c, "HH:mm:ss")


def time_of_day(c: Column) -> Column:
    """D6: 'day' if 6 <= hour < 18 else 'night'
    (`kinesis_processing_2.py:96`)."""
    h = F.hour(c)
    return F.when((h >= 6) & (h < 18), F.lit("day")).otherwise(F.lit("night"))
