"""T7 — event-time windows + watermarks (the capability the reference
LACKS: its consumer buckets by wall-clock poll time and has no late-data
story at all; SURVEY.md §2.11 flags this as the idiomatic extension).

`windowed_counts` works on batch AND streaming frames (same expression);
`run_windowed_stream` wires it with a watermark so state is bounded:
windows older than the watermark close and late events drop — without
this, 100 TB of stream history accumulates in the state store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    df: DataFrame,
    ts_col: str = "created_ts",
    key_col: str = "subreddit",
    window: str = "1 hour",
) -> DataFrame:
    """Tumbling event-time window counts per key."""
    return (
        df.groupBy(F.window(F.col(ts_col), window).alias("w"), key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "cnt",
        )
    )


def run_windowed_stream(
    stream_df: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    ts_col: str = "created_ts",
    key_col: str = "subreddit",
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """Watermarked streaming window counts → Parquet, append mode:
    a window emits once, when the watermark passes its end (bounded
    state, late events beyond the watermark dropped)."""
    counts = windowed_counts(
        stream_df.withWatermark(ts_col, watermark), ts_col, key_col, window
    )
    return (
        counts.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
