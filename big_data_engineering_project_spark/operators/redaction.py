"""PII redaction for training-data pipelines.

Scrubs emails / phone numbers / IPv4 addresses from a text column and
counts what was removed, entirely with JVM-side `regexp_replace` /
`regexp_extract_all` — no Python in the path, one narrow projection,
no shuffle. Patterns are restricted to the regex subset that behaves
identically under Java regex (Spark) and RE2 (DuckDB), so the oracle
reproduces the redaction byte-for-byte.

Replacement ORDER is part of the contract: emails first (they contain
dotted digit runs), then phones, then IPs — callers and oracles must
apply the same order.

Reference parity: the reference pipeline stores raw Reddit text with
no scrubbing; this is a north-star training-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (pattern, replacement-tag) in application order. \b, \d, {m,n} and
# character classes are common to Java regex and RE2; no lookarounds,
# no backreferences (RE2 has neither).
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def redact_col(text: Column) -> Column:
    """Text with all PII patterns replaced by their tags (in order)."""
    out = text
    for pattern, tag in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, tag)
    return out


def pii_count_col(text: Column) -> Column:
    """Number of PII matches in the ORIGINAL text (sum over patterns,
    counted in application order on the progressively-redacted string
    so overlapping classes aren't double-counted)."""
    total = F.lit(0)
    cur = text
    for pattern, tag in PII_PATTERNS:
        total = total + F.size(F.regexp_extract_all(cur, F.lit(pattern), F.lit(0)))
        cur = F.regexp_replace(cur, pattern, tag)
    return total


def redact(df: DataFrame, text_col: str) -> DataFrame:
    """Add `redacted` + `n_pii` columns in one projection."""
    text = F.col(text_col)
    return df.withColumn("redacted", redact_col(text)).withColumn(
        "n_pii", pii_count_col(text)
    )
