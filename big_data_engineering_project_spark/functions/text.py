"""Text functions X1–X10 + tokenization + stopword removal + analysis.

All pure Catalyst `Column` expressions (JVM-side, whole-stage codegen)
— no Python in the hot path. The reference does these row-at-a-time in
Python (`kinesis_processing_2.py:71-79`) or via a Spark UDF
(`NB:1740-1742`, UD1); here only the order-sensitive regex chain from
`NB:1726-1744 (cell 36)` is preserved semantically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from big_data_engineering_project_spark.functions.lexicons import STOPWORDS

# Regexes from the notebook's clean_post (NB:1730-1736), order matters:
# email → 'emailaddress', unicode escapes → '', non-ASCII → '',
# URL → 'website', keep [a-zA-Z#@ ], collapse whitespace, trim, lower.
RE_EMAIL = r"^.+@[^\.].*\.[a-z]{2,}$"
RE_UNICODE_ESCAPE = r"(\\u[0-9A-Fa-f]+)"
RE_NON_ASCII = r"[^\x00-\x7f]"
RE_URL = r"((www\.[^\s]+)|(https?://[^\s]+))"
RE_KEEP_ALPHA = r"[^a-zA-Z#@ ]"
RE_MULTI_SPACE = r" {2,}"
RE_PUNCT = r"[^\w\s]"


def clean_text(c: Column) -> Column:
    """The notebook's clean_post chain (X3→X4→X5→X6→X7→lower),
    NB:1726-1744 (cell 36), as one Catalyst expression pipeline."""
    c = F.regexp_replace(c, RE_EMAIL, "emailaddress")
    c = F.regexp_replace(c, RE_UNICODE_ESCAPE, "")
    c = F.regexp_replace(c, RE_NON_ASCII, "")
    c = F.regexp_replace(c, RE_URL, "website")
    c = F.regexp_replace(c, RE_KEEP_ALPHA, "")
    c = F.regexp_replace(c, RE_MULTI_SPACE, " ")
    return F.lower(F.trim(c))


def strip_punctuation(c: Column) -> Column:
    """X2: `re.sub(r'[^\\w\\s]','')` (`kinesis_processing_2.py:76`;
    pandas variant NB:2309)."""
    return F.regexp_replace(c, RE_PUNCT, "")


def tokenize(c: Column) -> Column:
    """X8 whitespace tokenize (`kinesis_processing_2.py:79`, NB:1918).
    Splits on runs of whitespace and drops empty tokens so ''.split
    artifacts never pollute counts."""
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


def remove_stopwords(tokens: Column) -> Column:
    """F5/UD1/UD6 stopword filter — the reference's only real Spark UDF
    (NB:1740-1742) re-expressed as pure Catalyst `array_except` (keeps
    execution JVM-side; also dedupes, matching set-membership filtering
    order-stably via original order)."""
    # array_except preserves left order and drops duplicates of removed
    # words; use filter() to preserve duplicates of kept words (the UDF
    # keeps duplicates, so match that).
    return F.filter(tokens, lambda t: ~t.isin(*STOPWORDS))


def rejoin(tokens: Column) -> Column:
    """X9: ' '.join(tokens) (NB:1742, NB:1866)."""
    return F.array_join(tokens, " ")


def title_length(c: Column) -> Column:
    """X10 (PPTX slide 14 ML feature)."""
    return F.length(c)


def token_count(c: Column) -> Column:
    """Token counting for pipeline stats: whitespace tokens."""
    return F.size(tokenize(c))


def punct_ratio(c: Column) -> Column:
    """Share of characters that are punctuation (quality scoring)."""
    stripped = F.length(strip_punctuation(c))
    return (F.length(c) - stripped) / F.greatest(F.length(c), F.lit(1))


def stopword_ratio(tokens: Column) -> Column:
    """Share of tokens that are stopwords (quality scoring)."""
    sw = F.size(F.filter(tokens, lambda t: t.isin(*STOPWORDS)))
    return sw / F.greatest(F.size(tokens), F.lit(1))
