"""Multimodal columns (north-star): image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

The container has no image/audio codecs, so the DECODE step is either
a clearly-marked stub (raises NotImplementedError for real formats) or
a deterministic fake codec for the synthetic fixture format — but all
the Spark-side plumbing is real and tested: schemas, binary columns,
Arrow batch shapes, partition-parallel UDF execution, and the
partitioning strategy a 100 TB media table needs.
"""

from big_data_engineering_project_spark.multimodal.columns import (
    MEDIA_SCHEMA,
    decode_media,
    extract_features,
    sample_frames,
    synthetic_media,
)

__all__ = [
    "MEDIA_SCHEMA",
    "decode_media",
    "extract_features",
    "sample_frames",
    "synthetic_media",
]
