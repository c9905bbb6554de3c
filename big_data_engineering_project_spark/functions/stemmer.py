"""UD4/UD5 — tokenizer + stemmer (SURVEY.md §2.12).

Reference: NLTK TreebankWordTokenizer (`NB:2332-2335, cell 63`) and
SnowballStemmer over token lists (`NB:2353-2359, cell 65`), both
applied driver-side in pandas — a scalability cliff.

Here: a pure-Python Porter stemmer (Porter 1980 algorithm — public
domain; implemented from the paper's rules, no NLTK dependency) run as
an Arrow-batched pandas UDF on executors — the one legitimately-Python
op in the text layer, kept vectorized per batch. The tokenizer is pure
Catalyst (functions/text.py tokenize); a Treebank-style variant that
splits punctuation is provided as a regex expression too.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

_VOWEL = "aeiou"


def _is_cons(word: str, i: int) -> bool:
    ch = word[i]
    if ch in _VOWEL:
        return False
    if ch == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """Porter's m: number of VC sequences in [C](VC){m}[V]."""
    m, i, n = 0, 0, len(stem)
    while i < n and _is_cons(stem, i):
        i += 1
    while i < n:
        while i < n and not _is_cons(stem, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _is_cons(stem, i):
            i += 1
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_cvc(stem: str) -> bool:
    if len(stem) < 3:
        return False
    if not (
        _is_cons(stem, len(stem) - 3)
        and not _is_cons(stem, len(stem) - 2)
        and _is_cons(stem, len(stem) - 1)
    ):
        return False
    return stem[-1] not in "wxy"


def porter_stem(word: str) -> str:
    """Porter stemming, steps 1a–5b (Porter 1980)."""
    w = word.lower()
    if len(w) <= 2:
        return w

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif (w.endswith("ed") and _has_vowel(w[:-2])) or (
        w.endswith("ing") and _has_vowel(w[:-3])
    ):
        w = w[:-2] if w.endswith("ed") else w[:-3]
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif (
            len(w) >= 2
            and w[-1] == w[-2]
            and _is_cons(w, len(w) - 1)
            and w[-1] not in "lsz"
        ):
            w = w[:-1]
        elif _measure(w) == 1 and _ends_cvc(w):
            w += "e"

    # Step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Step 2 (suffix -> replacement, m > 0)
    for suf, rep in (
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
        ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
        ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
        ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
        ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
        ("biliti", "ble"),
    ):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # Step 3
    for suf, rep in (
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # Step 4 (drop suffix, m > 1)
    for suf in (
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    ):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 1:
                w = w[: -len(suf)]
            break
    else:
        if w.endswith("ion") and len(w) > 3 and w[-4] in "st":
            if _measure(w[:-3]) > 1:
                w = w[:-3]

    # Step 5a
    if w.endswith("e"):
        stem = w[:-1]
        if _measure(stem) > 1 or (_measure(stem) == 1 and not _ends_cvc(stem)):
            w = stem
    # Step 5b
    if w.endswith("ll") and _measure(w) > 1:
        w = w[:-1]
    return w


@F.pandas_udf(ArrayType(StringType()))
def stem_tokens_udf(tokens: pd.Series) -> pd.Series:
    """UD5: stem a token array per row — Arrow-batched, executor-side
    (vs the reference's driver-local pandas apply, NB:2356-2359)."""
    return tokens.map(
        lambda arr: [porter_stem(t) for t in arr] if arr is not None else None
    )


# Treebank-ish tokenizer as pure Catalyst (UD4): split out punctuation
# groups, then whitespace-split. Approximates TreebankWordTokenizer for
# the common cases (contractions are NOT specially handled).
_PUNCT_GROUP = r"([^\w\s]+)"


def treebank_tokenize(c: Column) -> Column:
    spaced = F.regexp_replace(c, _PUNCT_GROUP, r" $1 ")
    return F.filter(F.split(spaced, r"\s+"), lambda t: t != "")
