"""Join layer (SURVEY.md §2.5).

The reference itself contains no joins (verified §2.5) — but the engine
ships a full join layer because (a) the TPC-H-ish testdata exists to
exercise it and (b) the north star requires designing beyond the
reference surface.

Strategy guidance baked in:
- `broadcast_join` for dimension tables (region/nation/supplier/part —
  small at ANY scale factor): no shuffle of the fact side at all.
- Plain `.join` on two facts → Catalyst picks sort-merge; with AQE on
  (session.py) skewed keys are split at runtime.
- `semi`/`anti` never materialize right-side columns — Catalyst plans
  them as broadcast/shuffled hash SEMI joins, cheaper than join+distinct.
- `salted_join` for when one side has a few pathological hot keys and
  AQE's skew handling isn't available (e.g. pre-3.0 clusters) or the
  skew is in a broadcast-ineligible aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def broadcast_join(
    fact: DataFrame, dim: DataFrame, on: list[str] | F.Column, how: str = "inner"
) -> DataFrame:
    """Broadcast-hash join: ships `dim` to every executor once; the
    fact side is never shuffled. Correct whenever dim fits in executor
    memory (dimension tables at any SF)."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """EXISTS: left rows with ≥1 match; right columns never surface, no
    row multiplication, no dedup needed."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """NOT EXISTS: left rows with no match."""
    return left.join(right, on=on, how="left_anti")


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigating join: salt the skewed side's key into
    `salt_buckets` sub-keys and explode the other side across all
    buckets, so one hot key spreads over `salt_buckets` tasks.

    Deterministic salt (hash of a stable column mod buckets), not
    rand() — keeps the plan re-executable/retry-safe.
    """
    salted = skewed.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(key)), F.lit(salt_buckets)).cast("int")
    )
    exploded = other.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
    )
    return salted.join(exploded, on=[key, "_salt"], how=how).drop("_salt")
