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


def test_write_curated_corpus_partitions_and_counts(spark, sf_dir, tmp_path):
    """The curated-corpus write lands partitioned by split, and the
    per-split counts read back from disk equal the oracle-verified
    accounting query's totals — the written artifact IS the audited
    corpus, not a divergent re-computation."""
    import os

    from big_data_engineering_project_spark.pipelines import write_curated_corpus
    from big_data_engineering_project_spark.plans import REGISTRY

    out = str(tmp_path / "curated")
    counts = write_curated_corpus(spark, sf_dir, out)
    dirs = {d for d in os.listdir(out) if d.startswith("split=")}
    assert dirs == {f"split={s}" for s in counts}
    audited = {
        (r["split"], r["source"]): r["n_docs"]
        for r in REGISTRY["q_curation_pipeline"].builder(spark, sf_dir).collect()
    }
    per_split: dict[str, int] = {}
    for (s, _src), n in audited.items():
        per_split[s] = per_split.get(s, 0) + n
    assert counts == per_split
    # text survives into the corpus (the write job's whole point)
    assert "text" in spark.read.parquet(out).columns
