"""Scalar/array function layer (SURVEY.md §2.10, §2.12).

Everything here is a pure `Column` expression unless physically
impossible JVM-side; the reference's row-at-a-time Python enrichment
(`kinesis_processing_2.py:48-102`) decomposes entirely into native
expressions (UD3 → X/D/M ops), so the hot path stays inside
whole-stage codegen. The irreducible Python pieces (stemmer) are
Arrow-batched pandas UDFs.
"""

from big_data_engineering_project_spark.functions import (
    datetime_ops,
    math_ops,
    sentiment,
    text,
)

__all__ = ["datetime_ops", "math_ops", "sentiment", "text"]
