"""Composed end-to-end batch jobs (SURVEY.md §3.2 / §3.3).

The reference's batch layer is a chain of manual steps across systems:
praw fetch → StringIO CSV → S3 (§3.2), and 32 CSVs → pandas → Spark →
Hive → per-query collect (§3.3). Here each layer is one composed Spark
job: scan → clean/enrich (all Catalyst) → typed Parquet "warehouse"
write → small CSV dashboard artifact — lineage in one plan per sink,
nothing driver-local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_engineering_project_spark.functions.datetime_ops import time_of_day
from big_data_engineering_project_spark.functions.sentiment import sentiment_col
from big_data_engineering_project_spark.functions.text import (
    clean_text,
    remove_stopwords,
    token_count,
    tokenize,
)
from big_data_engineering_project_spark.sources.catalog import load_table
from big_data_engineering_project_spark.sources.io import (
    write_csv_artifact,
    write_parquet_table,
)


def enrich_documents(docs: DataFrame) -> DataFrame:
    """§3.3 notebook flow (cells 36-45) as one projection: clean →
    tokenize → de-stopword → sentiment + token stats."""
    cleaned = clean_text(F.col("text"))
    toks = remove_stopwords(tokenize(cleaned))
    return docs.select(
        "doc_id",
        "lang",
        "source",
        cleaned.alias("cleaned_text"),
        toks.alias("tokens"),
        F.size(toks).cast("long").alias("n_tokens"),
        token_count(F.col("text")).cast("long").alias("n_raw_tokens"),
        sentiment_col(F.col("text")).alias("sentiment"),
    )


def batch_document_layer(
    spark: SparkSession, sf_dir: str, warehouse_path: str, artifact_path: str
) -> dict[str, int]:
    """Full batch layer: enrich → warehouse table (K4, partitioned by
    lang for downstream pruning) → top-100 dashboard CSV (K1/K5: the
    reference's first-100-rows artifact, reddit_batch_processing.py:68).
    """
    docs = load_table(spark, sf_dir, "documents")
    enriched = enrich_documents(docs)
    write_parquet_table(enriched.drop("tokens"), warehouse_path, partition_by=["lang"])
    top = (
        enriched.select("doc_id", "lang", "n_tokens", "sentiment")
        .orderBy(F.desc("n_tokens"), F.asc("doc_id"))
    )
    write_csv_artifact(top, artifact_path, limit=100)
    return {
        "warehouse_rows": spark.read.parquet(warehouse_path).count(),
        "artifact_rows": spark.read.option("header", "true").csv(artifact_path).count(),
    }


def batch_event_layer(
    spark: SparkSession, sf_dir: str, warehouse_path: str, artifact_path: str
) -> dict[str, int]:
    """Event analog: time-bucketed typed warehouse + peak-hour artifact."""
    ev = load_table(spark, sf_dir, "events")
    enriched = ev.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.hour("ts").alias("event_hour"),
        time_of_day(F.col("ts")).alias("time_of_day"),
    )
    write_parquet_table(enriched, warehouse_path, partition_by=["event_type"])
    counts = (
        spark.read.parquet(warehouse_path)
        .groupBy("event_type", "event_hour")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "event_type", "event_hour")
    )
    write_csv_artifact(counts, artifact_path)
    return {
        "warehouse_rows": spark.read.parquet(warehouse_path).count(),
        "artifact_rows": spark.read.option("header", "true").csv(artifact_path).count(),
    }


def write_curated_corpus(
    spark: SparkSession, sf_dir: str, out_path: str
) -> dict[str, int]:
    """North-star curation job end-to-end: quality gate → lang filter →
    hash split → fingerprint dedup (plans.queries_pipeline.
    curate_documents, the same transform the q_curation_pipeline
    accounting query verifies against its DuckDB oracle) → curated
    corpus WRITTEN partitioned by split, so downstream training reads
    train/val/test via partition pruning instead of re-filtering 100 TB.
    Returns per-split row counts (read back from the written table —
    counts what actually landed, not what the plan promised)."""
    from big_data_engineering_project_spark.plans.queries_pipeline import (
        curate_documents,
    )

    docs = load_table(spark, sf_dir, "documents")
    curated = curate_documents(docs, keep_text=True)
    write_parquet_table(curated, out_path, partition_by=["split"])
    written = spark.read.parquet(out_path)
    return {
        r["split"]: r["n"]
        for r in written.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
