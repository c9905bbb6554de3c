"""PySpark-native analytics engine.

A from-scratch, Spark-first reimplementation of every data operation the
reference pipeline (Rofhiwa33/Big-Data-Engineering-Project) performs —
batch analytics, text cleaning/enrichment, serving-layer SQL with
TRY_CAST data-quality filtering, z-score anomaly detection, and the
streaming hot path — plus the large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing)
the north star calls for.

Design stance (SURVEY.md §7.0): declarative DataFrame/SQL plans so
Catalyst owns optimization; Parquet + explicit schemas; pandas UDFs only
where built-ins genuinely can't express the semantics (sentiment
lexicon, stemming, multimodal decode); Structured Streaming for the hot
path. Every operator is written for a 1000-executor / 100 TB cluster
even though tests run on local[32].
"""

from big_data_engineering_project_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
