"""UD2 — sentiment polarity (replaces TextBlob,
`kinesis_processing_2.py:82-83`).

Contract matches the reference: double in [-1, 1], 0 = neutral.
Semantics (deterministic lexicon): (pos_hits − neg_hits) / n_tokens
over lowercased whitespace tokens, 0.0 for empty text.

Two implementations with identical results:
- `sentiment_col`   — pure Catalyst (filter/size on the token array);
  the default: JVM-side, codegen'd, oracle-checkable in SQL.
- `sentiment_pandas_udf` — Arrow-batched pandas UDF; exists to exercise
  the engine's Python-UDF surface (the one op SURVEY.md §7.3 calls
  irreducible when a real ML model sits here). Tests assert equality
  with the Catalyst form.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from big_data_engineering_project_spark.functions.lexicons import (
    NEGATIVE_WORDS,
    POSITIVE_WORDS,
)

_POS = set(POSITIVE_WORDS)
_NEG = set(NEGATIVE_WORDS)


def sentiment_col(text: Column) -> Column:
    """Lexicon polarity as a native expression (JVM-side hot path)."""
    tokens = F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")
    pos = F.size(F.filter(tokens, lambda t: t.isin(*POSITIVE_WORDS)))
    neg = F.size(F.filter(tokens, lambda t: t.isin(*NEGATIVE_WORDS)))
    n = F.size(tokens)
    # coalesce BEFORE clamping: least/greatest skip NULL arguments (in
    # Spark and DuckDB alike), so clamp(NULL) would yield -1.0, not NULL.
    raw = F.coalesce(
        (pos - neg) / F.nullif(n.cast("double"), F.lit(0.0)), F.lit(0.0)
    )
    return F.least(F.lit(1.0), F.greatest(F.lit(-1.0), raw))


@F.pandas_udf(DoubleType())
def sentiment_pandas_udf(text: pd.Series) -> pd.Series:
    """Same semantics, Arrow-batched through Python (UDF-surface demo)."""

    def score(s: str | None) -> float:
        if not s:
            return 0.0
        tokens = s.lower().split()
        if not tokens:
            return 0.0
        pos = sum(t in _POS for t in tokens)
        neg = sum(t in _NEG for t in tokens)
        raw = (pos - neg) / len(tokens)
        return max(-1.0, min(1.0, raw))

    return text.map(score)
