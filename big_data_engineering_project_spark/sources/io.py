"""Batch IO: the reference's CSV/JSON/keyed-table reads and writes.

Maps (SURVEY.md §2.1/§2.2):
- S4  32× `pd.read_csv` (`NB:102-141`)         → one `spark.read.csv` call
- K1  StringIO CSV → `s3.put_object`
      (`reddit_batch_processing.py:62-76`)     → `write_csv_artifact`
- K3  DynamoDB `put_item` keyed upsert
      (`kinesis_processing_2.py:149-163`)      → `write_parquet_table`
- K5  `toPandas().to_csv` (`NB:1836-1846`)     → `write_csv_artifact`
- K6  Athena result → stable S3 key
      (`reddit_lambda.py:91-108`)              → `write_csv_artifact`
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    paths: str | list[str],
    schema: StructType | None = None,
    header: bool = True,
) -> DataFrame:
    """Multi-path CSV scan. The reference loops `pd.read_csv` over 32
    files on the driver (`NB:102-141`) then concatenates (`NB:170`);
    one distributed scan over the path list replaces both — the
    union is implicit and each file is read where it lives.
    """
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        # Schema inference costs an extra pass; acceptable for artifact
        # reads, never for the 100 TB hot path (pass a StructType there).
        reader = reader.option("inferSchema", "true")
    return reader.csv(paths)


def read_json(
    spark: SparkSession, paths: str | list[str], schema: StructType
) -> DataFrame:
    """JSON-lines scan with an explicit schema (schema-on-read like the
    Kinesis consumer's `json.loads`, `kinesis_processing_2.py:133`, but
    typed up-front — no inference pass)."""
    return spark.read.schema(schema).json(paths)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_parquet_table(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Columnar keyed-table sink (replaces DynamoDB put_item, K3).

    `partition_by` enables partition pruning downstream — at 100 TB the
    serving table would be partitioned by a low-cardinality time column
    so the serving query scans only recent partitions.
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv_artifact(df: DataFrame, path: str, limit: int | None = None) -> None:
    """Small CSV artifact for a dashboard (K1/K5/K6): optional head
    slice (the reference writes first-100, `reddit_batch_processing.py:68`)
    and coalesce(1) for a single stable object.

    coalesce(1) is only sane because the artifact is small by
    construction (limit or post-aggregation); never coalesce a big
    frame to 1.
    """
    if limit is not None:
        df = df.limit(limit)
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)


def write_sorted_parquet(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int | None = None,
) -> None:
    """Zone-map-friendly write: range-partition on `sort_cols`, sort
    within each partition, write parquet. Every row group's min/max
    statistics then cover a NARROW slice of the sort key, so a later
    filtered scan skips whole row groups (and with one file per range,
    whole files) instead of reading everything — the layout that makes
    predicate pushdown actually cheap at 100 TB. An unsorted write
    scatters each key across every row group and the same PushedFilter
    still decompresses the full table.

    The range partitioner samples the key distribution, so output
    files are balanced even on skewed keys (a hash layout would not
    keep ranges disjoint, which is the property pruning needs)."""
    parted = (
        df.repartitionByRange(n_files, *sort_cols)
        if n_files is not None
        else df.repartitionByRange(*sort_cols)
    )
    parted.sortWithinPartitions(*sort_cols).write.mode("overwrite").parquet(
        path
    )


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    dynamic_overwrite: bool = True,
) -> None:
    """Hive-layout partitioned write (K4's bucketed saveAsTable,
    path-based): `path/pcol=value/...` directories so downstream
    filtered reads partition-prune at the FILE LISTING level (the
    scan never opens non-matching directories — cheaper than row-group
    pruning, the first layout decision for a 100 TB fact table).

    With `dynamic_overwrite` (the incremental-backfill mode), only the
    partitions PRESENT IN `df` are replaced; untouched partitions
    survive. That is what makes re-running one day's pipeline safe:
    `mode("overwrite")` with STATIC overwrite semantics would delete
    the whole table first. Implemented with Spark's
    `spark.sql.sources.partitionOverwriteMode=dynamic` session conf,
    scoped to this write and restored after (the conf is
    session-global; leaking it would silently change other writers'
    delete semantics).

    Choose partition columns with BOUNDED cardinality (date, region —
    not user_id): each distinct value is a directory, and a
    million-directory listing costs more than the pruning saves.
    """
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, None)
    try:
        if dynamic_overwrite:
            spark.conf.set(key, "dynamic")
        (
            df.write.mode("overwrite")
            .partitionBy(*partition_cols)
            .parquet(path)
        )
    finally:
        if prev is not None:
            spark.conf.set(key, prev)
        else:
            spark.conf.unset(key)


def zorder_value(cols: list, mins: list, maxs: list, bits: int = 16):
    """Z-order (Morton) key: quantize each column to `bits`-bit rank
    inside its [min, max] range, then interleave the bits. Returns a
    Column; callers pass per-column bounds (exact aggregates,
    broadcast or literal). bits * len(cols) must be ≤ 63."""
    n = len(cols)
    if bits * n > 63:
        raise ValueError("zorder_value: bits * n_cols must fit a BIGINT")
    q = []
    for c, lo, hi in zip(cols, mins, maxs):
        c, lo, hi = F.col(c) if isinstance(c, str) else c, F.lit(lo) if not isinstance(lo, Column) else lo, F.lit(hi) if not isinstance(hi, Column) else hi
        span = F.greatest(hi - lo, F.lit(1)).cast("double")
        q.append(
            F.least(
                F.lit((1 << bits) - 1),
                F.floor(
                    (c.cast("double") - lo.cast("double"))
                    * ((1 << bits) - 1)
                    / span
                ).cast("long"),
            )
        )
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, qc in enumerate(q):
            bit = F.shiftright(qc, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def write_zordered_parquet(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = 16,
) -> None:
    """Multi-dimensional clustered layout: range-partition + sort on
    the Z-order key of `cols`, so EVERY listed column's values are
    locally clustered in every file — a filter on ANY of them skips
    most files via footer min/max stats. The single-column
    `write_sorted_parquet` gives perfect pruning on its sort key and
    NONE on the others; Z-order trades a little of the first
    dimension's pruning for skipping on all dimensions — the standard
    layout decision for a fact table with several selective query
    keys (Delta/Iceberg OPTIMIZE ZORDER).

    Bounds are exact aggregates of the input (one pass), broadcast
    into the key expression — no driver-side collect, no sampling
    (quantized ranks only need the range, not the distribution; the
    range partitioner balances file sizes on the skewed key space).
    """
    bounds = df.agg(
        *[
            f(c).cast("double").alias(f"__{tag}_{c}")
            for c in cols
            for tag, f in (("min", F.min), ("max", F.max))
        ]
    )
    z = zorder_value(
        cols,
        [F.col(f"__min_{c}") for c in cols],
        [F.col(f"__max_{c}") for c in cols],
        bits=bits,
    )
    (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop(*[f"__{t}_{c}" for c in cols for t in ("min", "max")])
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
