"""Batch analytics operators — the notebook's query set (SURVEY.md
§2.6–2.9) as composable DataFrame transforms.

Scale notes (these run on 100 TB, not 37,580 rows):
- Every groupBy here benefits from Spark's partial (map-side)
  aggregation — the shuffle carries one row per (partition, key), not
  per input row.
- Top-k uses orderBy().limit(k) which Catalyst executes as
  TakeOrderedAndProject — per-partition heaps, no global sort.
- Argmax-per-group uses a ranking window; the window shuffle is on the
  group key, same key as the preceding aggregation, so AQE/Catalyst
  reuses the partitioning instead of shuffling twice.
- The word-frequency query keeps the corpus DISTRIBUTED (explode →
  groupBy) — the reference collects the whole corpus to the driver
  (`NB:1865-1881`, `collect()[0]`), which is the #1 scalability cliff
  this engine removes.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F



def group_count(df: DataFrame, *keys: str, out: str = "cnt") -> DataFrame:
    """A1: groupBy(keys).count() (NB:1341, cell 21) with deterministic
    output naming. Also covers A3/A4 (derived/multi-key variants)."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias(out))


def group_sum(df: DataFrame, key: str, value: Column | str, out: str) -> DataFrame:
    """A2: groupBy(key).agg(sum(value)) (NB:1441, cell 25)."""
    return df.groupBy(key).agg(F.sum(value).alias(out))


def top_k(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """O3/O6: orderBy(...).limit(k) → TakeOrderedAndProject (no global
    sort; per-partition heap then driver-side k-way merge of k·P rows).
    Callers MUST make `order` a total order (unique tiebreaker) or the
    selected set is nondeterministic at ties (NB:1629-1632 top-10)."""
    return df.orderBy(*order).limit(k)


def argmax_per_group(
    df: DataFrame, group: list[str], order: list[Column], keep_rank: bool = False
) -> DataFrame:
    """W1+F4: row_number over partitionBy(group).orderBy(order), keep
    rank==1 (NB:2231-2237, cell 58 — "peak posting hour per subreddit").
    `order` must be total (tiebreakers) for a deterministic winner."""
    w = Window.partitionBy(*group).orderBy(*order)
    out = df.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") == 1)
    return out if keep_rank else out.drop("rank")


def union_all(dfs: list[DataFrame]) -> DataFrame:
    """U1/A9: 32-frame concat (`pd.concat`, NB:170) → unionByName
    reduce. Name-based (the pandas concat is positional but all frames
    share a header — name-union is the intent)."""
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)


def word_counts(
    df: DataFrame, text_col: str, k: int | None = None, drop_stopwords: bool = True
) -> DataFrame:
    """A7/UD8: word-frequency analysis, distributed form.

    Reference: filter → concat_ws(collect_list) → collect()[0] →
    driver-local NLTK FreqDist → nlargest(15) (NB:1865-1931, cells
    44-45). Here: explode(tokenize) → groupBy(word).count, which
    partial-aggregates before the shuffle and never materializes a
    corpus string anywhere.
    """
    from big_data_engineering_project_spark.functions.lexicons import STOPWORDS
    from big_data_engineering_project_spark.sources.catalog import spread

    # Explode FIRST, filter at row level: the split+explode stays in
    # whole-stage codegen and the stopword test compiles to an InSet
    # hash probe — a higher-order array filter before the explode would
    # run interpreted, ~|tokens|·|stopwords| comparisons per doc.
    words = spread(df.select(F.col(text_col))).select(
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word")
    )
    words = words.filter(F.col("word") != "")
    if drop_stopwords:
        words = words.filter(~F.col("word").isin(*STOPWORDS))
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    if k is not None:
        counts = top_k(counts, [F.desc("cnt"), F.asc("word")], k)
    return counts


def top_words_per_group(
    df: DataFrame, group_col: str, text_col: str, k: int
) -> DataFrame:
    """A7 per-group variant: top-k words for every group in one pass
    (the reference re-runs the whole collect pipeline per subreddit ×5,
    NB:1865-1881). One explode + one grouped count + one rank window."""
    from big_data_engineering_project_spark.functions.lexicons import STOPWORDS
    from big_data_engineering_project_spark.sources.catalog import spread

    # Same explode-then-row-filter shape as word_counts (codegen +
    # InSet probe instead of an interpreted array lambda).
    words = spread(df.select(group_col, text_col)).select(
        F.col(group_col),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word"),
    )
    words = words.filter(
        (F.col("word") != "") & ~F.col("word").isin(*STOPWORDS)
    )
    counts = words.groupBy(group_col, "word").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy(group_col).orderBy(F.desc("cnt"), F.asc("word"))
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .drop("rnk")
    )


def running_count_per_key(
    df: DataFrame, key: str, order: list[Column], out: str = "running_count"
) -> DataFrame:
    """A8 batch form: the consumer's cross-batch `author_activity`
    running count (`kinesis_processing_2.py:42-43,98-100`) ≡
    row_number over (partitionBy key, orderBy arrival). The streaming
    per-record form lives in streaming/stateful.py."""
    w = Window.partitionBy(key).orderBy(*order)
    return df.withColumn(out, F.row_number().over(w))
