"""Table catalog over the driver's Parquet testdata.

Stands in for the reference's three storage layers (SURVEY.md §1.1):
the Hive warehouse table (`NB:1238` saveAsTable → `spark.sql` reads),
the DynamoDB keyed table (`process_dynamo.py:14-17`), and the Athena
external table (`reddit_lambda.py:46`). All become Parquet scans with
full Catalyst pushdown (predicate + column pruning reach the scan).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def ensure_package_on_executors(spark: SparkSession) -> None:
    """Ship this package to executor Python workers via addPyFile.

    pandas UDFs (stemmer, sentiment, multimodal decoders) pickle BY
    REFERENCE to their module; workers must be able to import it. When
    the driver loads __spark_entry__.py by path from an arbitrary cwd,
    the repo is on the DRIVER's sys.path only — the workers' PYTHONPATH
    was fixed at JVM launch. addPyFile distributes a zip that workers
    prepend to sys.path, which works in local and cluster mode alike.
    """
    if getattr(spark, "_bde_pkg_shipped", False):
        return
    import zipfile

    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zip_path = os.path.join(
        tempfile.gettempdir(), f"bde_spark_pkg_{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        zf.write(full, rel)
    spark.sparkContext.addPyFile(zip_path)
    spark._bde_pkg_shipped = True


def ensure_engine_confs(spark: SparkSession) -> None:
    """Set the runtime-settable confs the engine's correctness depends
    on, for sessions we didn't build (the driver passes its own):
    - nanosAsLong: events.parquet stores timestamp[ns], unreadable by
      Spark 4 otherwise;
    - UTC session timezone: hour()/day() parity with the timezone-naive
      oracle (and the reference's pinned-UTC semantics, SURVEY.md §7.4).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Performance parity with get_spark-built sessions (r14 ADVICE):
    # AQE inside cached plans — re-adjudicated r15 in a committed
    # interleaved A/B (plans/r15/ab_cachedplan_aqe.json: keep ON).
    # Runtime-settable; values unchanged (partition boundaries only).
    spark.conf.set(
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true"
    )
    ensure_package_on_executors(spark)


# One scan plan per (session, dir, table): spark.read.parquet re-reads
# the footer for schema inference and re-lists the path on EVERY call,
# and ensure_engine_confs adds py4j roundtrips — pure driver overhead
# repeated for every builder invocation in a multi-query session. The
# memoized DataFrame is an immutable plan object (reusing it caches no
# data); the key includes BOTH the Spark applicationId (a restarted
# context never sees a stale plan) and id(spark) (sibling sessions
# from newSession() share one applicationId but must each get their
# own DataFrame and their own ensure_engine_confs pass — session confs
# like nanosAsLong are per-session). Bounded by sessions × dirs ×
# tables, a handful of plan handles in practice. Caveat: the plan
# snapshots the file listing — callers that REWRITE a catalog parquet
# in place mid-session must not rely on load_table re-listing (no
# current caller does; the fixture dirs are read-only). Explicit
# reclaim: clear_catalog_memos().
_TABLE_MEMO: dict[tuple[int, str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one catalog table.

    Parquet so that Catalyst's PushedFilters / ReadSchema pruning apply;
    at 100 TB the table would additionally be partitioned (e.g. orders
    by month of o_orderdate) for partition pruning — the query code is
    identical either way.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog has {TABLES}")
    key = (id(spark), spark.sparkContext.applicationId, sf_dir, name)
    memo = _TABLE_MEMO.get(key)
    if memo is not None:
        return memo
    ensure_engine_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # Normalize ts to a session-TZ (UTC-pinned) TIMESTAMP whatever
        # the physical parquet type — the generator has shipped both:
        #   - timestamp[ns]: Spark reads it as long under the
        #     nanosAsLong conf → integer-divide to µs (a double
        #     division would lose precision at 1.7e18 ns magnitudes);
        #   - timestamp[us] (isAdjustedToUTC=false): Spark reads
        #     TIMESTAMP_NTZ → reinterpret in the UTC session TZ, a
        #     value-level no-op that restores the type every downstream
        #     query was built against.
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    _TABLE_MEMO[key] = df
    return df


_SPREAD_MEMO: dict[tuple[int, int], DataFrame] = {}


def clear_catalog_memos() -> None:
    """Drop the memoized scan plans and spread results (plan objects
    only — nothing is persisted, so there is nothing to unpersist).
    Companion to caches.clear_all_owned_caches, which deliberately does
    NOT clear these: the bench calls that between every query, and
    re-planning every table scan per query is exactly the driver
    overhead the memos remove."""
    _TABLE_MEMO.clear()
    _SPREAD_MEMO.clear()


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Parallelism hint for expression-heavy operators.

    Small local fixture files arrive as ONE scan partition (a parquet
    file below maxPartitionBytes with a single row group cannot be
    split), which serializes CPU-heavy per-row work (shingling,
    hashing, folds). Repartition ONLY when the scan is narrower than
    the cluster — at real scale the scan already has thousands of
    partitions and this is a no-op (a blanket repartition of 100 TB
    would be a catastrophic full shuffle).
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    # df.rdd re-plans the query just to read the partition count — a
    # driver-side cost paid per call. Memoize ONLY for frames that are
    # themselves _TABLE_MEMO entries: those are the repeated callers
    # (id(df) is stable because the table memo retains the frame), and
    # restricting to them bounds the memo at tables × targets. A fresh
    # df.select(...) input would never hit its id again — memoizing it
    # would retain one dead DataFrame per call (r14 ADVICE leak).
    is_table_frame = any(df is v for v in _TABLE_MEMO.values())
    key = (id(df), target)
    if is_table_frame:
        memo = _SPREAD_MEMO.get(key)
        if memo is not None:
            return memo
    out = df.repartition(target) if df.rdd.getNumPartitions() < target else df
    if is_table_frame:
        _SPREAD_MEMO[key] = out
    return out


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register catalog tables as temp views so `spark.sql` queries work
    by name (the reference's Hive/Athena access pattern, SURVEY.md S6/S7).
    """
    for name in tables or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
