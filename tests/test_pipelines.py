"""End-to-end batch layer jobs (§3.2/§3.3 composition)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from big_data_engineering_project_spark.pipelines import (
    batch_document_layer,
    batch_event_layer,
    enrich_documents,
)
from big_data_engineering_project_spark.sources.catalog import load_table


def test_document_layer_end_to_end(spark, sf_dir, tmp_path):
    stats = batch_document_layer(
        spark, sf_dir, str(tmp_path / "wh"), str(tmp_path / "art")
    )
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert stats["warehouse_rows"] == n_docs
    assert stats["artifact_rows"] == min(100, n_docs)
    # warehouse partitioned by lang → pruning layout on disk
    assert glob.glob(str(tmp_path / "wh" / "lang=*"))


def test_event_layer_end_to_end(spark, sf_dir, tmp_path):
    stats = batch_event_layer(
        spark, sf_dir, str(tmp_path / "wh"), str(tmp_path / "art")
    )
    n_events = load_table(spark, sf_dir, "events").count()
    assert stats["warehouse_rows"] == n_events
    assert stats["artifact_rows"] > 0


def test_enrich_documents_columns(spark, sf_dir):
    out = enrich_documents(load_table(spark, sf_dir, "documents"))
    row = out.first()
    assert row["n_tokens"] <= row["n_raw_tokens"]  # stopwords removed
    assert -1.0 <= row["sentiment"] <= 1.0
    sw = out.filter(F.array_contains("tokens", "the")).count()
    assert sw == 0  # no stopwords survive
