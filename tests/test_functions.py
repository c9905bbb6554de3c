"""Unit tests for the scalar/array function layer (SURVEY.md §5.3:
cleaning regexes on adversarial strings, boundary cases for D6/M3,
M4 null defaults, sentiment determinism)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from big_data_engineering_project_spark.functions.datetime_ops import (
    parse_timestamp,
    post_age_minutes,
    time_of_day,
)
from big_data_engineering_project_spark.functions.math_ops import (
    popularity_score,
    post_type,
    to_storage_decimal,
)
from big_data_engineering_project_spark.functions.sentiment import (
    sentiment_col,
    sentiment_pandas_udf,
)
from big_data_engineering_project_spark.functions.text import (
    clean_text,
    remove_stopwords,
    stopword_ratio,
    tokenize,
)


def one(spark, col, **cols):
    df = spark.createDataFrame([Row(**cols)]) if cols else spark.range(1)
    return df.select(col.alias("out")).first()["out"]


def test_clean_text_chain(spark):
    # URL → 'website', punctuation stripped, lowered, whitespace collapsed
    # (NB:1726-1744 semantics).
    out = one(
        spark,
        clean_text(F.col("s")),
        s="Check https://spam.example/x?y=1  NOW!!  éé ok",
    )
    assert out == "check website now ok"


def test_clean_text_keeps_hash_at(spark):
    out = one(spark, clean_text(F.col("s")), s="email me @user #tag 42 times")
    assert out == "email me @user #tag times"


def test_tokenize_drops_empties(spark):
    out = one(spark, tokenize(F.col("s")), s="  a  b   c ")
    assert out == ["a", "b", "c"]


def test_remove_stopwords_keeps_duplicates(spark):
    # The reference UDF (NB:1740-1742) keeps duplicates of non-stopwords.
    out = one(
        spark,
        remove_stopwords(tokenize(F.col("s"))),
        s="the cat and the cat sat",
    )
    assert out == ["cat", "cat", "sat"]


def test_stopword_ratio_empty_safe(spark):
    assert one(spark, stopword_ratio(tokenize(F.col("s"))), s="") == 0.0


def test_time_of_day_boundaries(spark):
    # 6 → day, 17:59 → day, 18 → night, 5:59 → night
    # (kinesis_processing_2.py:96 boundary semantics).
    for hour, expect in [(6, "day"), (17, "day"), (18, "night"), (5, "night")]:
        out = one(
            spark,
            time_of_day(F.col("t")),
            t=dt.datetime(2024, 1, 1, hour, 59, 0),
        )
        assert out == expect, hour


def test_parse_timestamp_dirty_to_null(spark):
    assert one(spark, parse_timestamp(F.col("s")), s="not a date") is None
    assert one(spark, parse_timestamp(F.col("s")), s="2024-03-01 12:30:00") == dt.datetime(
        2024, 3, 1, 12, 30, 0
    )


def test_post_age_minutes_frozen_now(spark):
    created = dt.datetime(2024, 1, 1, 0, 0, 0)
    now = dt.datetime(2024, 1, 1, 2, 30, 0)
    out = one(
        spark, post_age_minutes(F.col("c"), F.col("n")), c=created, n=now
    )
    assert out == 150.0


def test_post_type(spark):
    assert one(spark, post_type(F.col("t")), t="self") == "text"
    assert one(spark, post_type(F.col("t")), t="http://img") == "media"


def test_popularity_score_null_defaults(spark):
    # score=None → 0, ratio=None → 0.0 (kinesis_processing_2.py:67-68,90).
    df = spark.createDataFrame(
        [(None, None, 10)], "s INT, r DOUBLE, n INT"
    )
    out = df.select(
        popularity_score(F.col("s"), F.col("r"), F.col("n")).alias("out")
    ).first()["out"]
    assert out == 5.0


def test_storage_decimal_dirty_null(spark):
    assert one(spark, to_storage_decimal(F.col("s")), s="junk") is None
    assert float(one(spark, to_storage_decimal(F.col("s")), s="1.5")) == 1.5


def test_sentiment_catalyst_vs_pandas_udf(spark):
    rows = [
        Row(t="good good bad day"),
        Row(t=""),
        Row(t="terrible awful slow"),
        Row(t="neutral words only here"),
        Row(t=None),
    ]
    df = spark.createDataFrame(rows)
    got = df.select(
        sentiment_col(F.col("t")).alias("c"),
        sentiment_pandas_udf(F.col("t")).alias("p"),
    ).collect()
    for r in got:
        assert r["c"] == r["p"]
    assert got[0]["c"] == 0.25  # (2-1)/4
    assert got[2]["c"] == -1.0


def test_from_epoch_seconds(spark):
    # D1: epoch seconds → UTC timestamp (reddit_kinesis_1.py:32-36).
    from big_data_engineering_project_spark.functions.datetime_ops import (
        from_epoch_seconds,
    )

    out = one(spark, from_epoch_seconds(F.col("e")), e=1704067200)
    assert out == dt.datetime(2024, 1, 1, 0, 0, 0)


def test_treebank_tokenizer_splits_punct(spark):
    from big_data_engineering_project_spark.functions.stemmer import (
        treebank_tokenize,
    )

    out = one(spark, treebank_tokenize(F.col("s")), s="hello, world!! (ok)")
    assert out == ["hello", ",", "world", "!!", "(", "ok", ")"]


def test_porter_stem_published_vectors():
    # UD5 invariant anchor for the rows-only q_stemmed_docs: the
    # classic example set from Porter (1980), "An algorithm for
    # suffix stripping" — one vector per rule family (plurals, -eed,
    # -ing with consonant doubling, -ational/-tional, y→i, and the
    # m>1 suffix strips).
    from big_data_engineering_project_spark.functions.stemmer import porter_stem

    vectors = {
        "caresses": "caress", "ponies": "poni", "ties": "ti",
        "cats": "cat", "feed": "feed", "agreed": "agre",
        "plastered": "plaster", "motoring": "motor", "sing": "sing",
        "hopping": "hop", "relational": "relat",
        "conditional": "condit", "rational": "ration",
        "happy": "happi", "generalization": "gener",
        "oscillators": "oscil", "adjustable": "adjust",
        "defensible": "defens", "probate": "probat", "rate": "rate",
        "controlling": "control",
    }
    got = {w: porter_stem(w) for w in vectors}
    assert got == vectors
