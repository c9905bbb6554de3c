"""The hot-path pipeline: source → enrichment → stateful stamp →
foreachBatch sinks (SURVEY.md §3.1 engine mapping).

Enrichment is the full `preprocess_record` port
(`kinesis_processing_2.py:48-102`, UD3) decomposed into native column
expressions — the reference's per-record Python loop becomes
whole-stage-codegen'd JVM work; only nothing remains in Python (the
sentiment lexicon is itself a Catalyst expression; see
functions/sentiment.py).

Scale notes:
- Micro-batch caps (`maxFilesPerTrigger`) ≡ the consumer's
  `get_records(Limit=100)` (T1/O7).
- `checkpointLocation` upgrades the reference's at-least-once-no-
  checkpoint loop (T8) to exactly-once sink semantics.
- The per-batch anomaly job (T5) aggregates the BATCH, not the
  stream — a 1-row stats broadcast per micro-batch, never a global
  shuffle.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from big_data_engineering_project_spark.functions.datetime_ops import (
    parse_timestamp,
    post_age_minutes,
    time_of_day,
)
from big_data_engineering_project_spark.functions.math_ops import (
    popularity_score,
    post_type,
)
from big_data_engineering_project_spark.functions.sentiment import sentiment_col
from big_data_engineering_project_spark.functions.text import (
    remove_stopwords,
    strip_punctuation,
    tokenize,
)
from big_data_engineering_project_spark.operators.anomaly import detect_anomalies
from big_data_engineering_project_spark.streaming.stateful import (
    with_author_activity_count,
)

# The 14-field producer record (`reddit_kinesis_1.py:41-56`; FIXTURES.md §2)
# + `seq`, an explicit arrival sequence the tests use to cross-check the
# stateful count against the batch row_number formulation.
STREAM_SCHEMA = StructType(
    [
        StructField("seq", LongType()),
        StructField("id", StringType()),
        StructField("author", StringType()),
        StructField("title", StringType()),
        StructField("subreddit", StringType()),
        StructField("created_time", StringType()),
        StructField("score", IntegerType()),
        StructField("num_comments", IntegerType()),
        StructField("is_self_post", BooleanType()),
        StructField("flair_text", StringType()),
        StructField("upvote_ratio", DoubleType()),
        StructField("edited", StringType()),
        StructField("over_18", BooleanType()),
        StructField("thumbnail", StringType()),
        StructField("stickied", BooleanType()),
    ]
)


def stream_source(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """S2/S3: JSON-lines micro-batch file source — the Kinesis shard
    poll re-expressed (`maxFilesPerTrigger` ≡ get_records Limit)."""
    return (
        spark.readStream.schema(STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(input_dir)
    )


def enrich_stream(df: DataFrame, now: dt.datetime) -> DataFrame:
    """UD3 `preprocess_record` as pure column expressions (works on
    batch AND streaming frames — tests exploit that equivalence).

    `now` is injected (frozen in tests) — kinesis_processing_2.py:86
    uses wall clock, which would make results non-reproducible.
    """
    created = parse_timestamp(F.col("created_time"))
    cleaned_title = strip_punctuation(F.lower(F.col("title")))  # X1+X2
    return (
        df.withColumn("created_ts", created)
        .withColumn(
            "title_tokens", remove_stopwords(tokenize(cleaned_title))  # X8+F5
        )
        .withColumn("sentiment", sentiment_col(F.col("title")))  # UD2
        .withColumn(
            "post_age_minutes",
            post_age_minutes(F.col("created_ts"), F.lit(now)),  # D3
        )
        .withColumn(
            "popularity_score",
            popularity_score(  # M1 + M4 defaults
                F.col("score"), F.col("upvote_ratio"), F.col("num_comments")
            ),
        )
        .withColumn("post_type", post_type(F.col("thumbnail")))  # M3
        .withColumn("time_of_day", time_of_day(F.col("created_ts")))  # D6
    )


def run_hot_path(
    spark: SparkSession,
    input_dir: str,
    table_path: str,
    anomaly_path: str,
    checkpoint_dir: str,
    now: dt.datetime,
    anomaly_col: str = "score",
    threshold: float = 3.0,
    max_files_per_trigger: int = 1,
) -> None:
    """End-to-end hot path with AvailableNow trigger (bounded run ≡ the
    55-min cutoff T3, but data-driven: process everything then stop).

    foreachBatch does both sink jobs per micro-batch:
      a) typed Parquet append — the DynamoDB put_item table (K3/T6);
      b) z-score anomalies OVER THIS BATCH ONLY (T5,
         kinesis_processing_2.py:104-119) appended with batch_id.
    """

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        stamped = batch_df.withColumn("batch_id", F.lit(batch_id))
        stamped.persist()
        try:
            stamped.write.mode("append").parquet(table_path)
            anomalies = detect_anomalies(stamped, anomaly_col, threshold)
            anomalies.write.mode("append").parquet(anomaly_path)
        finally:
            stamped.unpersist()

    enriched = enrich_stream(
        stream_source(spark, input_dir, max_files_per_trigger), now
    )
    stamped = with_author_activity_count(enriched)
    query = (
        stamped.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()


def dedup_stream(
    df: DataFrame, id_col: str = "id", ts_col: str = "created_ts", within: str = "1 hour"
) -> DataFrame:
    """At-least-once → effectively-once: drop duplicate record ids
    arriving within the watermark horizon. The reference's no-checkpoint
    consumer re-reads and double-writes on crash (T8); a keyed
    dropDuplicatesWithinWatermark bounds the dedup state while
    guaranteeing duplicates inside the horizon are removed."""
    return df.withWatermark(ts_col, within).dropDuplicatesWithinWatermark([id_col])


# --- streaming curation (incremental training-data ingest) ---------------------

DOC_STREAM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
    ]
)


def run_curation_stream(
    spark: SparkSession,
    input_dir: str,
    out_path: str,
    checkpoint_dir: str,
    quality_min: float,
    max_files_per_trigger: int = 1,
) -> None:
    """The batch curation pass (`plans.queries_pipeline.curate_documents`)
    as an INCREMENTAL ingest stream — how a production corpus actually
    arrives: quality/lang gate → content-hash split stamp →
    fingerprint → cross-batch exact dedup → parquet sink.

    Stream ≡ batch by construction (tested) for the gate, split and
    fingerprint columns — identical expressions on both paths. Dedup
    keeper semantics are slightly weaker: streaming `dropDuplicates`
    keeps the first MICRO-BATCH's row per fingerprint, but within a
    single micro-batch row order is undefined, so when two
    different-id duplicates land in the SAME batch the survivor is
    arbitrary (the batch pass keeps min doc_id). Stream ≡ batch on
    doc_id therefore holds when duplicates arrive in doc_id-ordered
    batches — an ingest log's natural order, and what the equivalence
    test replays; id-exact parity under arbitrary batching would need
    a per-batch min_by collapse via foreachBatch at the cost of the
    operator-level state store.

    State posture: the fingerprint dedup state is one 8-byte hash per
    UNIQUE document ever seen — the smallest possible exact-dedup
    state, checkpointed with the query. For bounded-state deployments
    swap in `dropDuplicatesWithinWatermark` (accepting horizon-limited
    dedup, cf. `dedup_stream`).
    """
    from big_data_engineering_project_spark.operators.sampling import with_split
    from big_data_engineering_project_spark.operators.text_analysis import (
        fingerprint_col,
        text_profile_named,
    )

    src = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(input_dir)
    )
    prof = text_profile_named("text")
    kept = (
        src.select("doc_id", "source", "text", prof.alias("_prof"))
        .filter(
            (F.col("_prof.quality") >= quality_min)
            & (F.col("_prof.lang") == "en")
        )
        .select(
            "doc_id",
            "source",
            "text",
            F.col("_prof.n_tokens").alias("n_tokens"),
        )
    )
    stamped = with_split(kept, "text").select(
        "doc_id",
        "source",
        "split",
        "n_tokens",
        fingerprint_col(F.col("text")).alias("f"),
    )
    deduped = stamped.dropDuplicates(["f"]).drop("f")
    query = (
        deduped.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
