"""J2/K3 — keyed upsert (the DynamoDB `put_item` storage semantics,
`kinesis_processing_2.py:149-163`: last write per key wins).

Without a transactional table format (Delta/Iceberg ship MERGE INTO;
not in this container), the idiomatic Parquet pattern is
read-merge-overwrite with last-writer-wins dedup. At 100 TB you'd use
Delta MERGE (partition-pruned, file-level rewrite); the logical
semantics implemented — and tested — here are identical:

    merged = updates ∪ (existing ⟕anti updates on key)

so every key keeps exactly one row and updates shadow existing rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_upsert(existing: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Pure-plan upsert: updates win per key, one row per key kept.

    Updates may themselves contain duplicate keys — the LAST by the
    frame's `_seq` column wins if present, else an arbitrary-but-
    deterministic max-by-key reduction applies.
    """
    if "_seq" in updates.columns:
        # Last-writer-wins as ONE max_by aggregation (partial-
        # aggregable: a hot key's updates collapse map-side) rather
        # than a row_number window, which would pile every update for
        # one hot key into a single window partition (r7 audit).
        payload = [c for c in updates.columns if c not in (key, "_seq")]
        out_cols = [c for c in updates.columns if c != "_seq"]
        w_updates = (
            updates.groupBy(key)
            .agg(F.max_by(F.struct(*payload), "_seq").alias("__r"))
            .select(
                *[
                    F.col(key) if c == key else F.col(f"__r.{c}").alias(c)
                    for c in out_cols
                ]
            )
        )
    else:
        w_updates = updates.dropDuplicates([key])
    survivors = existing.join(w_updates, on=key, how="left_anti")
    return survivors.unionByName(w_updates)


def upsert_parquet(
    spark: SparkSession, path: str, updates: DataFrame, key: str
) -> None:
    """Read-merge-overwrite upsert into a Parquet table. First write
    creates the table."""
    try:
        existing = spark.read.parquet(path)
        merged = merge_upsert(existing, updates, key)
    except Exception:  # AnalysisException: path does not exist
        merged = (
            updates.dropDuplicates([key])
            if "_seq" not in updates.columns
            else merge_upsert(updates.limit(0), updates, key)
        )
    # Materialize BEFORE overwriting the path being read (overwrite of
    # the input path would otherwise race the lazy scan).
    merged.persist()
    merged.count()
    merged.write.mode("overwrite").parquet(path)
    merged.unpersist()
