"""Z-score anomaly detection (A6 + M2 + F6).

Reference: per micro-batch, pandas `df[c].mean()` / `.std()` then flag
`abs((x-μ)/σ) > 3` (`kinesis_processing_2.py:104-119`). pandas .std()
is SAMPLE stddev (ddof=1) → `stddev_samp` here (SURVEY.md §7.4).

Scale shape: the 1-row global aggregate is broadcast back onto the
table (a broadcast nested-loop join of a singleton — no shuffle of the
fact side, one pass to aggregate + one pass to filter). A window
`avg().over(Window.partitionBy())` would funnel ALL rows into a single
partition — the anti-pattern at 100 TB; the two-pass broadcast form is
the one that scales. std == 0 → NULL z (no anomaly), replicating
pandas NaN semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from big_data_engineering_project_spark.operators.joins import broadcast_join
from big_data_engineering_project_spark.functions.math_ops import zscore


def zscore_stats(df: DataFrame, value_col: str) -> DataFrame:
    """A6: 1-row (mean, sample-stddev) aggregate."""
    return df.agg(
        F.avg(value_col).alias("mu"),
        F.stddev_samp(value_col).alias("sigma"),
    )


def with_zscore(df: DataFrame, value_col: str, out: str = "z") -> DataFrame:
    """Stamp |z| on every row via broadcast of the 1-row stats (J1)."""
    stats = zscore_stats(df, value_col)
    joined = df.crossJoin(F.broadcast(stats))
    return joined.withColumn(
        out, zscore(F.col(value_col), F.col("mu"), F.col("sigma"))
    ).drop("mu", "sigma")


def detect_anomalies(
    df: DataFrame, value_col: str, threshold: float = 3.0
) -> DataFrame:
    """F6: rows with |z| > threshold (`kinesis_processing_2.py:116`)."""
    return with_zscore(df, value_col).filter(F.col("z") > threshold)


def detect_anomalies_per_group(
    df: DataFrame, group_col: str, value_col: str, threshold: float = 3.0
) -> DataFrame:
    """Grouped upgrade (idiomatic per-key stats, SURVEY.md J1): stats
    per group, broadcast-joined back on the group key. The stats side
    is |groups| rows — broadcastable at any fact-table size."""
    stats = df.groupBy(group_col).agg(
        F.avg(value_col).alias("mu"),
        F.stddev_samp(value_col).alias("sigma"),
    )
    joined = broadcast_join(df, stats, on=[group_col], how="inner")
    return (
        joined.withColumn("z", zscore(F.col(value_col), F.col("mu"), F.col("sigma")))
        .filter(F.col("z") > threshold)
        .drop("mu", "sigma")
    )
