"""Reference-derived queries (SURVEY.md §2 inventory → named plans).

The notebook's analytics ran on `reddit_posts` (subreddit/title/
creation_date/...); per FIXTURES.md §4 the driver's `events` table
(event_type ≈ subreddit, ts ≈ creation_date, value ≈ upvotes, user_id ≈
author, props ≈ raw JSON payload) and `documents` (text ≈ post body)
stand in. Every query cites the reference op IDs it implements.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_engineering_project_spark.functions.datetime_ops import time_of_day
from big_data_engineering_project_spark.functions.lexicons import (
    NEGATIVE_WORDS,
    POSITIVE_WORDS,
    STOPWORDS,
    sql_string_list,
)
from big_data_engineering_project_spark.functions.math_ops import popularity_score
from big_data_engineering_project_spark.functions.sentiment import sentiment_col
from big_data_engineering_project_spark.functions.text import clean_text
from big_data_engineering_project_spark.operators import analytics
from big_data_engineering_project_spark.operators.anomaly import detect_anomalies
from big_data_engineering_project_spark.operators.serving import (
    serving_query_sql,
    stringly_select_sql,
)
from big_data_engineering_project_spark.plans.registry import (
    avg_via_dec,
    register,
    sum_dec,
)
from big_data_engineering_project_spark.sources.catalog import load_table, spread

_SW = sql_string_list(STOPWORDS)


# ---------------------------------------------------------------------------
# A1/O1 — group-count + sort (NB:1341-1346, cell 21)


@register(
    "q_counts_by_type",
    oracle="""
SELECT event_type, COUNT(*) AS cnt
FROM events
GROUP BY event_type
ORDER BY cnt DESC, event_type
""",
    doc="A1/O1: groupBy(key).count().orderBy(desc) — NB cell 21",
    headline=True,
    tags=("reference", "agg"),
)
def q_counts_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return analytics.group_count(ev, "event_type").orderBy(
        F.desc("cnt"), F.asc("event_type")
    )


# A2/O1 — group-sum + alias (NB:1441/1541, cells 25/29)


@register(
    "q_value_sum_by_type",
    oracle=f"""
SELECT event_type, {sum_dec("value", "total_value")}
FROM events
GROUP BY event_type
ORDER BY total_value DESC, event_type
""",
    doc="A2: groupBy(key).agg(sum(value).alias(...)) — NB cell 25",
    tags=("reference", "agg"),
)
def q_value_sum_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"))
        .orderBy(F.desc("total_value"), F.asc("event_type"))
    )


# A3/D4/O2 — counts by derived date parts (NB cells 49/52/55)


def _date_part_query(part: str):
    def build(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        col = {"year": F.year, "month": F.month, "hour": F.hour}[part]
        return (
            ev.groupBy(col("ts").alias(f"event_{part}"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.asc(f"event_{part}"))
        )

    return build


for _part in ("year", "month", "hour"):
    register(
        f"q_events_by_{_part}",
        oracle=f"""
SELECT CAST(date_part('{_part}', ts) AS INTEGER) AS event_{_part}, COUNT(*) AS cnt
FROM events
GROUP BY 1
ORDER BY event_{_part}
""",
        doc=f"A3/D4/O2: count by {_part}(ts) — NB cells 49/52/55",
        tags=("reference", "agg", "datetime"),
    )(_date_part_query(_part))


# A4 + W1 + F4 — multi-key count then argmax-per-group (NB cell 58)


@register(
    "q_counts_by_type_hour",
    oracle="""
SELECT event_type, CAST(date_part('hour', ts) AS INTEGER) AS event_hour,
       COUNT(*) AS cnt
FROM events
GROUP BY 1, 2
ORDER BY event_type, event_hour
""",
    doc="A4: groupBy(type, hour).count() — NB cell 58 first half",
    tags=("reference", "agg"),
)
def q_counts_by_type_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return analytics.group_count(
        ev.withColumn("event_hour", F.hour("ts")), "event_type", "event_hour"
    ).orderBy("event_type", "event_hour")


@register(
    "q_peak_hour_per_type",
    oracle="""
WITH counts AS (
  SELECT event_type, CAST(date_part('hour', ts) AS INTEGER) AS event_hour,
         COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY event_type ORDER BY cnt DESC, event_hour ASC) AS rn
  FROM counts
)
SELECT event_type, event_hour, cnt FROM ranked WHERE rn = 1
""",
    doc="W1+F4: peak posting hour per group via row_number rank=1 — NB cell 58",
    headline=True,
    tags=("reference", "window"),
)
def q_peak_hour_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    counts = analytics.group_count(
        ev.withColumn("event_hour", F.hour("ts")), "event_type", "event_hour"
    )
    return analytics.argmax_per_group(
        counts, ["event_type"], [F.desc("cnt"), F.asc("event_hour")]
    )


# O3 — top-k by value (NB:1629-1632, cell 32: top-10 titles by upvotes)


@register(
    "q_top10_by_value",
    oracle="""
SELECT event_id, event_type, value
FROM events
ORDER BY value DESC, event_id ASC
LIMIT 10
""",
    doc="O3: orderBy(desc).limit(10) → TakeOrderedAndProject — NB cell 32",
    tags=("reference", "topk"),
)
def q_top10_by_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return analytics.top_k(
        ev.select("event_id", "event_type", "value"),
        [F.desc("value"), F.asc("event_id")],
        10,
    )


# U1/A9 — 32-way union (NB:170, cell 7), modeled as per-type slices


@register(
    "q_union_slices",
    oracle="""
SELECT event_type, COUNT(*) AS cnt FROM (
  SELECT * FROM events WHERE event_type = 'click'
  UNION ALL SELECT * FROM events WHERE event_type = 'view'
  UNION ALL SELECT * FROM events WHERE event_type = 'purchase'
) GROUP BY event_type ORDER BY event_type
""",
    doc="U1/A9: pd.concat row-union → unionByName reduce — NB cell 7",
    tags=("reference", "union"),
)
def q_union_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    slices = [ev.filter(F.col("event_type") == t) for t in ("click", "view", "purchase")]
    return (
        analytics.group_count(analytics.union_all(slices), "event_type")
        .orderBy("event_type")
    )


# F1 — numeric filter (process_dynamo.py:23 `score > 1`)


@register(
    "q_filter_high_value",
    oracle="""
SELECT event_id, event_type, value
FROM events
WHERE value > 190.0
ORDER BY event_id
""",
    doc="F1: df.filter(col > threshold) — process_dynamo.py:23",
    tags=("reference", "filter"),
)
def q_filter_high_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("value") > 190.0)
        .select("event_id", "event_type", "value")
        .orderBy("event_id")
    )


# JSON extraction (producer json.dumps / consumer json.loads,
# reddit_kinesis_1.py:63 / kinesis_processing_2.py:133)


@register(
    "q_json_extract",
    oracle="""
SELECT CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER) AS k,
       COUNT(*) AS cnt
FROM events
GROUP BY 1
ORDER BY k
""",
    doc="JSON schema-on-read: from_json(props).k — kinesis_processing_2.py:133",
    tags=("reference", "json"),
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(F.from_json("props", "k INT").getField("k").alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("k")
    )


# D6 — time-of-day bucket (kinesis_processing_2.py:96)


@register(
    "q_time_of_day",
    oracle="""
SELECT CASE WHEN date_part('hour', ts) >= 6 AND date_part('hour', ts) < 18
            THEN 'day' ELSE 'night' END AS time_of_day,
       COUNT(*) AS cnt
FROM events
GROUP BY 1
ORDER BY time_of_day
""",
    doc="D6: day/night bucket — kinesis_processing_2.py:96",
    tags=("reference", "datetime"),
)
def q_time_of_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(time_of_day(F.col("ts")).alias("time_of_day"))
        .groupBy("time_of_day")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("time_of_day")
    )


# M1/M4 + O3 — popularity score top-k (kinesis_processing_2.py:90)


@register(
    "q_popularity_top20",
    oracle="""
SELECT event_id,
       value * (value / 1000.0) + 0.5 * CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER) AS popularity
FROM events
ORDER BY popularity DESC, event_id ASC
LIMIT 20
""",
    doc="M1+M4: popularity = score·upvote_ratio + 0.5·num_comments — kinesis_processing_2.py:90",
    tags=("reference", "scalar"),
)
def q_popularity_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json("props", "k INT").getField("k")
    pop = popularity_score(F.col("value"), F.col("value") / 1000.0, k)
    return analytics.top_k(
        ev.select("event_id", pop.alias("popularity")),
        [F.desc("popularity"), F.asc("event_id")],
        20,
    )


# A8 batch form — running per-key count (kinesis_processing_2.py:42-43,98-100)


@register(
    "q_running_user_count",
    oracle="""
SELECT event_id, user_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS INTEGER)
         AS running_count
FROM events
ORDER BY event_id
""",
    doc="A8 batch form: author_activity running count ≡ row_number per key",
    tags=("reference", "window"),
)
def q_running_user_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        analytics.running_count_per_key(
            ev.select("event_id", "user_id"), "user_id", [F.asc("event_id")]
        )
        .orderBy("event_id")
    )


# A6 + M2 + F6 — z-score anomaly detection (kinesis_processing_2.py:104-119)


@register(
    "q_zscore_anomalies",
    oracle="""
WITH stats AS (
  SELECT AVG(value) AS mu, STDDEV_SAMP(value) AS sigma FROM events
)
SELECT event_id, value, ABS((value - mu) / NULLIF(sigma, 0.0)) AS z
FROM events, stats
WHERE ABS((value - mu) / NULLIF(sigma, 0.0)) > 3.0
ORDER BY event_id
""",
    doc="A6+M2+F6: z-score outliers, stddev_samp (pandas ddof=1 parity)",
    headline=True,
    tags=("reference", "anomaly"),
)
def q_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        detect_anomalies(ev.select("event_id", "value"), "value", 3.0)
        .orderBy("event_id")
    )


# X1–X7 — the notebook clean_post regex chain (NB:1726-1744, cell 36)


@register(
    "q_clean_text",
    oracle=r"""
SELECT doc_id,
  lower(trim(
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(
                'Visit https://example.com/' || CAST(doc_id AS STRING)
                  || ' NOW!! ' || upper(substr(text, 1, 40)),
                '^.+@[^\.].*\.[a-z]{2,}$', 'emailaddress', 'g'),
              '(\\u[0-9A-Fa-f]+)', '', 'g'),
            '[^\x00-\x7f]', '', 'g'),
          '((www\.[^\s]+)|(https?://[^\s]+))', 'website', 'g'),
        '[^a-zA-Z#@ ]', '', 'g'),
      ' {2,}', ' ', 'g')
  )) AS cleaned
FROM documents
ORDER BY doc_id
""",
    doc="X1–X7: order-sensitive cleaning chain — NB cell 36 clean_post",
    tags=("reference", "text"),
)
def q_clean_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    # Documents are already clean ASCII; prepend deterministic dirt
    # (URL + punctuation + upper case) so the chain has work to do.
    dirty = F.concat(
        F.lit("Visit https://example.com/"),
        F.col("doc_id").cast("string"),
        F.lit(" NOW!! "),
        F.upper(F.substring("text", 1, 40)),
    )
    return (
        docs.select("doc_id", clean_text(dirty).alias("cleaned"))
        .orderBy("doc_id")
    )


# A7/UD8 — distributed word frequency, top-15 (NB cells 44-45)


@register(
    "q_word_counts_top15",
    oracle=f"""
SELECT word, COUNT(*) AS cnt
FROM (
  SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents
)
WHERE word != '' AND word NOT IN {_SW}
GROUP BY word
ORDER BY cnt DESC, word ASC
LIMIT 15
""",
    doc="A7: word frequency, distributed explode form (vs collect()[0] — NB cell 44-45)",
    headline=True,
    tags=("reference", "text", "agg"),
)
def q_word_counts_top15(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return analytics.word_counts(docs, "text", k=15, drop_stopwords=True)


# A7 per-group — top-3 words per lang in one pass


@register(
    "q_top_words_per_lang",
    oracle=f"""
WITH words AS (
  SELECT lang, unnest(string_split(lower(text), ' ')) AS word FROM documents
), counts AS (
  SELECT lang, word, COUNT(*) AS cnt FROM words
  WHERE word != '' AND word NOT IN {_SW}
  GROUP BY lang, word
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY cnt DESC, word ASC) rn
  FROM counts
)
SELECT lang, word, cnt FROM ranked WHERE rn <= 3 ORDER BY lang, cnt DESC, word
""",
    doc="A7 per-group: top words per group in ONE pass (reference reruns ×5)",
    tags=("reference", "text", "window"),
)
def q_top_words_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return analytics.top_words_per_group(docs, "lang", "text", 3).orderBy(
        "lang", F.desc("cnt"), "word"
    )


# UD2 — deterministic lexicon sentiment (kinesis_processing_2.py:82-83)

_POS_ARR = "[" + ", ".join(f"'{w}'" for w in POSITIVE_WORDS) + "]"
_NEG_ARR = "[" + ", ".join(f"'{w}'" for w in NEGATIVE_WORDS) + "]"


@register(
    "q_sentiment",
    oracle=f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x != '') AS t
  FROM documents
)
SELECT doc_id,
  LEAST(1.0, GREATEST(-1.0, COALESCE(
    (len(list_filter(t, x -> list_contains({_POS_ARR}, x)))
     - len(list_filter(t, x -> list_contains({_NEG_ARR}, x))))
    / NULLIF(CAST(len(t) AS DOUBLE), 0.0)
  , 0.0))) AS sentiment
FROM toks
ORDER BY doc_id
""",
    doc="UD2: lexicon polarity in [-1,1] (TextBlob replacement) — kinesis_processing_2.py:82-83",
    tags=("reference", "text", "udf"),
)
def q_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id", sentiment_col(F.col("text")).alias("sentiment")
    ).orderBy("doc_id")


# P8 + F2 — the Athena serving query (reddit_lambda.py:24-68)

_SERVING_SQL = serving_query_sql(stringly_select_sql("events")) + "\nORDER BY event_id"


@register(
    "q_serving_try_cast",
    oracle=_SERVING_SQL,
    doc="P8+F2: Athena serving port — TRY_CAST DECIMAL(38,9) + dirty-row filter",
    headline=True,
    tags=("reference", "serving", "sql"),
)
def q_serving_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events")
    # Same SQL text runs on both engines — the engine's SQL entry point.
    return spark.sql(_SERVING_SQL)


# UD3 — the full preprocess_record enrichment as one projection
# (kinesis_processing_2.py:48-102): D1-D3, D6, M1, M3, M4 composed.

_FROZEN_NOW = "2026-01-16 00:00:00"


@register(
    "q_enrich_events",
    oracle=f"""
SELECT event_id,
  (epoch(TIMESTAMP '{_FROZEN_NOW}') - FLOOR(epoch(ts))) / 60.0 AS age_minutes,
  value * (value / 1000.0)
    + 0.5 * CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER) AS popularity,
  CASE WHEN event_type != 'click' THEN 'media' ELSE 'text' END AS post_type,
  CASE WHEN date_part('hour', ts) >= 6 AND date_part('hour', ts) < 18
       THEN 'day' ELSE 'night' END AS time_of_day
FROM events
ORDER BY event_id
""",
    doc="UD3: whole-record enrichment decomposed to native exprs — kinesis_processing_2.py:48-102",
    headline=True,
    tags=("reference", "enrich"),
)
def q_enrich_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_engineering_project_spark.functions.datetime_ops import (
        post_age_minutes,
    )

    ev = load_table(spark, sf_dir, "events")
    now = F.lit(_FROZEN_NOW).cast("timestamp")
    k = F.from_json("props", "k INT").getField("k")
    # M3 post_type analog on events: event_type stands in for thumbnail.
    ptype = F.when(F.col("event_type") != "click", "media").otherwise("text")
    return ev.select(
        "event_id",
        post_age_minutes(F.col("ts"), now).alias("age_minutes"),
        popularity_score(F.col("value"), F.col("value") / 1000.0, k).alias(
            "popularity"
        ),
        ptype.alias("post_type"),
        time_of_day(F.col("ts")).alias("time_of_day"),
    ).orderBy("event_id")


# D5 (intent) — date and time halves of a timestamp (the reference's
# empty-pattern split bug NB:1820-1821 implemented as intended).


@register(
    "q_date_time_parts",
    oracle="""
SELECT event_id, strftime(ts, '%Y-%m-%d') AS event_date,
       strftime(ts, '%H:%M:%S') AS event_time
FROM events
ORDER BY event_id
""",
    doc="D5 intent: to_date + HH:mm:ss halves (reference bug NB:1820 fixed)",
    tags=("reference", "datetime"),
)
def q_date_time_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_engineering_project_spark.functions.datetime_ops import (
        date_and_time,
    )

    ev = load_table(spark, sf_dir, "events")
    d, t = date_and_time(F.col("ts"))
    # String halves — the reference stored stringly date/time columns
    # (NB cell 40); also keeps the comparison representation-stable.
    return ev.select(
        "event_id", d.cast("string").alias("event_date"), t.alias("event_time")
    ).orderBy("event_id")


# A5 — string-concat aggregate (NB:1865-1881, cell 44), kept DISTRIBUTED
# and deterministic: sorted collect_list, never collect()[0] to the driver.


@register(
    "q_group_concat_texts",
    oracle="""
SELECT lang, string_agg(text, ' ' ORDER BY text) AS corpus
FROM documents
GROUP BY lang
ORDER BY lang
""",
    doc="A5: concat_ws(collect_list) per group — sorted for determinism, stays distributed",
    tags=("reference", "agg", "text"),
)
def q_group_concat_texts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.array_join(F.array_sort(F.collect_list("text")), " ").alias("corpus")
        )
        .orderBy("lang")
    )


# Exact distinct aggregation (engine completeness; expand/distinct-agg path)


@register(
    "q_distinct_users_by_type",
    oracle="""
SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    doc="COUNT(DISTINCT) per group (two-phase distinct aggregation)",
    tags=("reference", "agg"),
)
def q_distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


# ROLLUP — hierarchical subtotals (engine completeness beyond the
# reference's plain GROUP BY; Catalyst Expand operator).


@register(
    "q_rollup_type_hour",
    oracle="""
SELECT event_type, CAST(date_part('hour', ts) AS INTEGER) AS event_hour,
       COUNT(*) AS cnt
FROM events
GROUP BY ROLLUP(event_type, CAST(date_part('hour', ts) AS INTEGER))
ORDER BY event_type NULLS FIRST, event_hour NULLS FIRST
""",
    doc="GROUP BY ROLLUP: grand total + per-type subtotals + leaf counts",
    tags=("reference", "agg", "rollup"),
)
def q_rollup_type_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("event_hour", F.hour("ts"))
        .rollup("event_type", "event_hour")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(
            F.col("event_type").asc_nulls_first(),
            F.col("event_hour").asc_nulls_first(),
        )
    )


# T7 extension — event-time tumbling window aggregation (ABSENT in the
# reference, SURVEY.md §2.11: exposed as the idiomatic upgrade of its
# wall-clock micro-batching; streaming form in streaming/windows.py).


@register(
    "q_tumbling_hourly_counts",
    oracle="""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS window_start,
       event_type,
       COUNT(*) AS cnt
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
""",
    doc="T7: tumbling 1h event-time window counts (F.window ≡ date_trunc)",
    tags=("reference", "window", "streaming"),
)
def q_tumbling_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias(
                "window_start"
            ),
            "event_type",
            "cnt",
        )
        .orderBy("window_start", "event_type")
    )


# Exact percentiles (engine completeness: ordered-set aggregates).


@register(
    "q_value_percentiles",
    oracle="""
SELECT event_type,
  quantile_cont(value, 0.5) AS p50,
  quantile_cont(value, 0.9) AS p90,
  quantile_cont(value, 0.99) AS p99
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    doc="Exact linear-interpolated percentiles per group (ordered-set agg)",
    tags=("reference", "agg"),
)
def q_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.percentile("value", 0.5).alias("p50"),
            F.percentile("value", 0.9).alias("p90"),
            F.percentile("value", 0.99).alias("p99"),
        )
        .orderBy("event_type")
    )


# Pivot — wide-format cross-tab (engine completeness; the notebook's
# groupby tables are long-format, dashboards want wide).


@register(
    "q_pivot_hour_by_type",
    oracle="""
SELECT CAST(date_part('hour', ts) AS INTEGER) AS event_hour,
  COUNT(*) FILTER (WHERE event_type = 'click') AS click,
  COUNT(*) FILTER (WHERE event_type = 'error') AS error,
  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
  COUNT(*) FILTER (WHERE event_type = 'view') AS view
FROM events
GROUP BY 1
ORDER BY event_hour
""",
    doc="Pivot: hour × event_type cross-tab (groupBy().pivot())",
    tags=("reference", "agg", "pivot"),
)
def q_pivot_hour_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    out = (
        ev.withColumn("event_hour", F.hour("ts"))
        .groupBy("event_hour")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    # pivot yields NULL for absent (hour, type) combos; the oracle's
    # FILTER count yields 0 — align.
    return out.select(
        "event_hour", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in types]
    ).orderBy("event_hour")


# UD8 as a true Python UDTF (table function): one input row → N output
# rows. The reference's word_count FreqDist is UDTF-shaped (NB:1917-1920);
# explode covers it natively (A7) — this exercises the engine's UDTF
# surface itself.

from pyspark.sql.functions import udtf  # noqa: E402


@udtf(returnType="word: string, pos: int")
class _SplitWordsUDTF:
    def eval(self, text: str):  # noqa: D102
        if text:
            for i, w in enumerate(text.lower().split()):
                if w:
                    yield (w, i)


@register(
    "q_udtf_word_positions",
    oracle="""
SELECT doc_id,
       unnest(list_filter(string_split(lower(text), ' '), x -> x != '')) AS word,
       CAST(unnest(range(0, len(list_filter(string_split(lower(text), ' '), x -> x != '')))) AS INTEGER) AS pos
FROM documents
WHERE doc_id < 50
ORDER BY doc_id, pos
""",
    doc="UD8: Python UDTF (row → word rows with positions) ≡ unnest oracle",
    tags=("reference", "udf", "udtf"),
)
def q_udtf_word_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return (
        docs.lateralJoin(_SplitWordsUDTF(F.col("text").outer()))
        .select("doc_id", "word", "pos")
        .orderBy("doc_id", "pos")
    )


# Sessionization — gap-based session windows (the classic event
# analytics op; streaming-capable via the same F.session_window).


@register(
    "q_user_sessions",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       CAST(SUM(new_session) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM flagged
GROUP BY user_id
ORDER BY user_id
""",
    doc="Sessionization: 30-min-gap session windows per user (F.session_window ≡ lag-island oracle)",
    tags=("reference", "window", "session"),
)
def q_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sessions = ev.groupBy(
        "user_id", F.session_window("ts", "30 minutes").alias("w")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return (
        sessions.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        )
        .orderBy("user_id")
    )


# CUBE — all grouping combinations (completes the grouping-set family
# with q_rollup_type_hour).


@register(
    "q_cube_type_timeofday",
    oracle="""
SELECT event_type,
       CASE WHEN date_part('hour', ts) >= 6 AND date_part('hour', ts) < 18
            THEN 'day' ELSE 'night' END AS time_of_day,
       COUNT(*) AS cnt
FROM events
GROUP BY CUBE(event_type,
              CASE WHEN date_part('hour', ts) >= 6 AND date_part('hour', ts) < 18
                   THEN 'day' ELSE 'night' END)
ORDER BY event_type NULLS FIRST, time_of_day NULLS FIRST
""",
    doc="GROUP BY CUBE: every (type × day/night) grouping combination",
    tags=("reference", "agg", "cube"),
)
def q_cube_type_timeofday(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("time_of_day", time_of_day(F.col("ts")))
        .cube("event_type", "time_of_day")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(
            F.col("event_type").asc_nulls_first(),
            F.col("time_of_day").asc_nulls_first(),
        )
    )


# --- Set operations: INTERSECT / EXCEPT (§2.7-2.9 completion) ------------------


@register(
    "q_user_set_ops",
    oracle="""
WITH clickers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
buyers   AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
err      AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
SELECT 'click_and_buy' AS cohort, COUNT(*) AS n_users
FROM (SELECT user_id FROM clickers INTERSECT SELECT user_id FROM buyers)
UNION ALL
SELECT 'click_not_buy', COUNT(*)
FROM (SELECT user_id FROM clickers EXCEPT SELECT user_id FROM buyers)
UNION ALL
SELECT 'all_three', COUNT(*)
FROM (SELECT user_id FROM clickers
      INTERSECT SELECT user_id FROM buyers
      INTERSECT SELECT user_id FROM err)
ORDER BY cohort
""",
    doc="Set-operator completion (U-layer): INTERSECT / EXCEPT / "
    "chained INTERSECT over per-type distinct user sets — Spark plans "
    "these as LeftSemi / LeftAnti over the deduped inputs, i.e. the "
    "same join machinery the §2.5 layer pins, not a row-matching "
    "special case",
    tags=("reference", "setops"),
)
def q_user_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def users_of(t: str):
        return (
            ev.filter(F.col("event_type") == t).select("user_id").distinct()
        )

    clickers, buyers, err = users_of("click"), users_of("purchase"), users_of("error")

    def count_as(df, label: str):
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(label).alias("cohort"), "n_users"
        )

    return (
        count_as(clickers.intersect(buyers), "click_and_buy")
        .unionByName(count_as(clickers.subtract(buyers), "click_not_buy"))
        .unionByName(count_as(clickers.intersect(buyers).intersect(err), "all_three"))
        .orderBy("cohort")
    )


# --- Table profiling (data-quality pass) --------------------------------------


@register(
    "q_profile_events",
    oracle="""
WITH s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT("value") AS BIGINT) AS nn_value,
         CAST(COUNT(DISTINCT "value") AS BIGINT) AS nd_value,
         CAST(MIN("value") AS DOUBLE) AS min_value,
         CAST(MAX("value") AS DOUBLE) AS max_value,
         CAST(COUNT(user_id) AS BIGINT) AS nn_user,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS nd_user,
         CAST(MIN(user_id) AS DOUBLE) AS min_user,
         CAST(MAX(user_id) AS DOUBLE) AS max_user,
         CAST(COUNT(event_type) AS BIGINT) AS nn_type,
         CAST(COUNT(DISTINCT event_type) AS BIGINT) AS nd_type,
         MIN(event_type) AS smin_type,
         MAX(event_type) AS smax_type
  FROM events
)
SELECT 'value' AS "column", n AS n_rows, n - nn_value AS n_nulls,
       nd_value AS n_distinct, min_value AS min_num, max_value AS max_num,
       CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
FROM s
UNION ALL
SELECT 'user_id', n, n - nn_user, nd_user, min_user, max_user, NULL, NULL
FROM s
UNION ALL
SELECT 'event_type', n, n - nn_type, nd_type, NULL, NULL,
       smin_type, smax_type
FROM s
ORDER BY "column"
""",
    doc="Per-column data-quality profile (null counts, exact "
    "cardinalities, typed ranges) in ONE aggregation pass + a bounded "
    "unpivot — the engine-side replacement for the reference "
    "notebook's N driver round-trips of df.count()/describe() poking. "
    "Numeric ranges stay double, string ranges stay string: a "
    "double→string cast would hit engine formatting differences. "
    "Exact multi-column distincts cost an Expand (documented; "
    "operators/profiling.py names approx_count_distinct as the "
    "no-Expand scale path)",
    tags=("reference", "profiling", "agg"),
)
def q_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_engineering_project_spark.operators.profiling import (
        profile_table,
    )

    ev = load_table(spark, sf_dir, "events")
    return profile_table(
        ev, num_cols=["value", "user_id"], str_cols=["event_type"]
    ).orderBy("column")


@register(
    "q_unpivot_hourly_measures",
    oracle="""
WITH wide AS (
  SELECT event_type, hour(ts) AS hr,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
         CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS total_cents
  FROM events GROUP BY 1, 2
)
SELECT event_type, hr, 'n_events' AS measure, n_events AS val FROM wide
UNION ALL
SELECT event_type, hr, 'n_users', n_users FROM wide
UNION ALL
SELECT event_type, hr, 'total_cents', total_cents FROM wide
ORDER BY event_type, hr, measure
""",
    doc="UNPIVOT (melt): the wide per-(type, hour) measure table "
    "turned long — (keys, measure, val), the shape metric stores and "
    "the pivot family's inverse ingest. Spark's native unpivot is a "
    "row-local Expand over the ALREADY-AGGREGATED frame (×n_measures "
    "on group-cardinality-bounded rows, never on facts), so the melt "
    "adds zero shuffles; integer measures only — a mixed-type melt "
    "would force casts that diverge cross-engine",
    headline=False,
    tags=("reference", "agg"),
)
def q_unpivot_hourly_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    wide = ev.groupBy("event_type", F.hour("ts").alias("hr")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(
            F.round(F.col("value") * 100, 0).cast("long")
        ).alias("total_cents"),
    )
    return wide.unpivot(
        ["event_type", "hr"],
        ["n_events", "n_users", "total_cents"],
        "measure",
        "val",
    ).orderBy("event_type", "hr", "measure")
