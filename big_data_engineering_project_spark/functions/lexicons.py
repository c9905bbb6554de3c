"""Shared word lists — single source of truth for Spark expressions,
DuckDB oracle SQL, and tests.

STOPWORDS mirrors the role of the NLTK English stopword set the
reference loads (`kinesis_processing_2.py:16-31` hardcodes a 174-word
copy; `NB:1718-1722 (cell 35)` downloads it). We pin an explicit subset
so results are deterministic and oracle-computable without NLTK.

The sentiment lexicon replaces TextBlob polarity
(`kinesis_processing_2.py:82-83`, UD2): score = (pos_hits − neg_hits) /
token_count, clamped to [-1, 1] — deterministic, same contract
(0 = neutral, range [-1, 1]).
"""

from __future__ import annotations

# Deterministic English stopword list (subset of the classic NLTK set
# the reference hardcodes at kinesis_processing_2.py:16-31).
STOPWORDS: tuple[str, ...] = (
    "i", "me", "my", "we", "our", "you", "your", "he", "him", "his",
    "she", "her", "it", "its", "they", "them", "their", "what", "which",
    "who", "this", "that", "these", "those", "am", "is", "are", "was",
    "were", "be", "been", "being", "have", "has", "had", "do", "does",
    "did", "a", "an", "the", "and", "but", "if", "or", "because", "as",
    "until", "while", "of", "at", "by", "for", "with", "about", "into",
    "through", "to", "from", "up", "down", "in", "out", "on", "off",
    "over", "under", "again", "then", "once", "here", "there", "when",
    "where", "why", "how", "all", "any", "both", "each", "few", "more",
    "most", "other", "some", "such", "no", "nor", "not", "only", "own",
    "same", "so", "than", "too", "very", "can", "will", "just", "should",
    "now",
)

# Small deterministic polarity lexicon (public-domain word choices).
POSITIVE_WORDS: tuple[str, ...] = (
    "good", "great", "best", "love", "happy", "excellent", "amazing",
    "awesome", "fast", "win", "nice", "helpful", "easy", "cool", "fun",
    "wonderful", "fantastic", "positive", "success", "beautiful",
)
NEGATIVE_WORDS: tuple[str, ...] = (
    "bad", "worst", "hate", "sad", "terrible", "awful", "slow", "lose",
    "hard", "angry", "poor", "broken", "fail", "ugly", "boring",
    "horrible", "negative", "wrong", "problem", "dup",
)

# Per-language marker words for the n-gram/stopword language-ID
# heuristic (documents fixture has lang ∈ {en, es, de, fr, zh}; zh has
# no Latin markers — texts with zero marker hits classify as 'unknown').
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "is", "that", "it"),
    "es": ("el", "la", "de", "que", "y", "los", "es", "una"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "zu"),
    "fr": ("le", "la", "et", "les", "des", "est", "une", "que"),
}


def sql_string_list(words: tuple[str, ...]) -> str:
    """Render a word tuple as a SQL list literal: ('a','b',...)."""
    return "(" + ", ".join("'" + w.replace("'", "''") + "'" for w in words) + ")"


def sql_array(words: tuple[str, ...]) -> str:
    """Render a word tuple as a SQL array literal: ['a','b',...] (DuckDB)."""
    return "[" + ", ".join("'" + w.replace("'", "''") + "'" for w in words) + "]"
