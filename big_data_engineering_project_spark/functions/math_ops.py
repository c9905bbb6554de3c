"""Math / conditional functions M1–M5 (SURVEY.md §2.10).

All plain column arithmetic — whole-stage-codegen'd, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType


def popularity_score(score: Column, upvote_ratio: Column, num_comments: Column) -> Column:
    """M1: score·upvote_ratio + 0.5·num_comments
    (`kinesis_processing_2.py:90`), with the consumer's default-0
    semantics (M4, `:67-68`) folded in."""
    return (
        F.coalesce(score, F.lit(0)) * F.coalesce(upvote_ratio, F.lit(0.0))
        + F.lit(0.5) * F.coalesce(num_comments, F.lit(0))
    )


def zscore(c: Column, mean: Column, std: Column) -> Column:
    """M2: abs((x − mean)/std) (`kinesis_processing_2.py:115`).
    std == 0 → NULL (pandas yields NaN → no anomaly; SURVEY.md §7.4),
    via nullif to avoid ANSI division-by-zero."""
    return F.abs((c - mean) / F.nullif(std, F.lit(0.0)))


def post_type(thumbnail: Column) -> Column:
    """M3: 'media' if thumbnail != 'self' else 'text'
    (`kinesis_processing_2.py:93`)."""
    return F.when(thumbnail != "self", F.lit("media")).otherwise(F.lit("text"))


def null_default(c: Column, default) -> Column:
    """M4: `record.get(key, 0)` (`kinesis_processing_2.py:67-68`)."""
    return F.coalesce(c, F.lit(default))


def to_storage_decimal(c: Column, precision: int = 38, scale: int = 9) -> Column:
    """M5/P8: the DynamoDB Decimal(str(x)) coercion
    (`kinesis_processing_2.py:153-156`) / Athena DECIMAL(38,9)
    (`reddit_lambda.py:27-44`) — ANSI-safe: failure → NULL."""
    return c.try_cast(DecimalType(precision, scale))
