"""Serving-layer query — the Athena/Presto port (SURVEY.md §3.1 step 4).

Reference: `reddit_lambda.py:24-68` — a 20-column SELECT where 7
numeric-ish columns stored stringly in DynamoDB are `TRY_CAST(x AS
DECIMAL(38,9))` and rows failing `x IS NOT NULL AND x != '' AND
TRY_CAST(x) IS NOT NULL` on ANY of the 7 are dropped (F2 + P8).

The driver's testdata has no stringly table, so `stringly_view`
manufactures the same bronze shape deterministically from `events`
(stringified numerics + injected dirt keyed on event_id mod primes —
reproducible in ANSI SQL for the oracle). The serving query itself is
expressed as `spark.sql` text, like the original: this is the engine's
SQL entry point demo.

Scale: the query is scan → filter → project. All 21 filter terms push
down to the Parquet scan (PushedFilters on the NOT NULL terms; the
try_cast terms evaluate in the scan stage inside codegen) — one pass,
no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (name, numeric source expression in Spark-SQL-and-DuckDB-common syntax)
# Each becomes a stringly column with dirt: '' / 'junk' / NULL injected
# on event_id mod 97/89/83 respectively.
STRINGLY_COLS: list[tuple[str, str]] = [
    ("score_s", "value"),
    ("num_comments_s", "CAST(user_id AS DOUBLE)"),
    ("popularity_s", "value * 0.5 + CAST(user_id AS DOUBLE)"),
]

# FLOOR(x·100)/100, not ROUND(x,2): round-half behavior on doubles is
# engine-specific at representation boundaries; floor is not.
_DIRT = (
    "CASE WHEN event_id % 97 = 0 THEN '' "
    "WHEN event_id % 89 = 0 THEN 'junk' "
    "WHEN event_id % 83 = 0 THEN NULL "
    "ELSE CAST(FLOOR(({src}) * 100) / 100 AS STRING) END"
)


def stringly_select_sql(table: str = "events") -> str:
    """SELECT producing the bronze (all-string) serving table from
    `events` — valid in both Spark SQL and DuckDB (shared dialect
    subset; DuckDB treats STRING as VARCHAR)."""
    cols = ",\n  ".join(
        [_DIRT.format(src=src) + f" AS {name}" for name, src in STRINGLY_COLS]
    )
    return f"SELECT event_id, event_type,\n  {cols}\nFROM {table}"


def serving_query_sql(bronze_subquery: str) -> str:
    """The Athena query shape (`reddit_lambda.py:24-68`): TRY_CAST
    projection + AND-chained data-quality filter over every stringly
    column. Shared Spark-SQL/DuckDB dialect."""
    # Decimal try_cast is the data-quality gate (reddit_lambda.py:27-44);
    # the projected value is surfaced as DOUBLE so both engines emit an
    # identical wire type.
    casts = ",\n  ".join(
        f"CAST(TRY_CAST({name} AS DECIMAL(38, 9)) AS DOUBLE) AS {name.removesuffix('_s')}"
        for name, _ in STRINGLY_COLS
    )
    preds = "\n  AND ".join(
        f"{name} IS NOT NULL AND {name} != '' "
        f"AND TRY_CAST({name} AS DECIMAL(38, 9)) IS NOT NULL"
        for name, _ in STRINGLY_COLS
    )
    return (
        f"SELECT event_id, event_type,\n  {casts}\n"
        f"FROM ({bronze_subquery})\n"
        f"WHERE {preds}"
    )


def serving_query(spark: SparkSession, events: DataFrame) -> DataFrame:
    """Run the serving query end-to-end via the SQL entry point."""
    events.createOrReplaceTempView("events")
    return spark.sql(serving_query_sql(stringly_select_sql("events")))


def quality_filter(df: DataFrame, cols: list[str]) -> DataFrame:
    """F2 as a DataFrame-API combinator: keep rows where every listed
    stringly column is present, non-empty and decimal-castable."""
    pred = F.lit(True)
    for c in cols:
        col = F.col(c)
        pred = (
            pred
            & col.isNotNull()
            & (col != "")
            & col.try_cast("decimal(38,9)").isNotNull()
        )
    return df.filter(pred)
