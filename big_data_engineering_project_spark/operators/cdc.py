"""Change-data-capture style history building (SCD Type 2).

The reference's DynamoDB upsert sink (`S/kinesis_processing_2.py`,
keyed put_item) keeps ONLY the latest value per key; a warehouse that
ingests the same change stream usually also wants the full validity
history — the classic slowly-changing-dimension Type 2 build. This
module derives that history from an append-only changelog:

  changelog (key, order_cols..., attr)  →
  history   (key, attr, effective_from, effective_to, version,
             is_current)

Two steps, both expressed as per-key windows over a TOTAL order:

1. **Compaction** — drop rows whose attribute equals the immediately
   preceding value for the same key (`lag`). A changelog row that
   does not change anything must not open a new version, otherwise
   version counts depend on upstream delivery chattiness.
2. **Validity intervals** — `effective_from` = the change's own
   timestamp, `effective_to` = the NEXT change's timestamp (`lead`,
   NULL for the open current version), `version` = `row_number`.

Scale posture: one shuffle on `key`; every window is
`partitionBy(key)` over that same exchange, so Spark plans a single
Exchange reused by all three window functions (compaction lag,
validity lead, version row_number collapse into two Window nodes over
one sort). Per-key history length bounds the window partition — the
same per-user bound as sessionization (operators/behavior.py), and
the same documented hot-key hazard: a single key receiving an
unbounded fraction of the changelog needs upstream splitting, which
SCD semantics (a linear per-key version chain) inherently require.

Determinism: `order_cols` must be a total order per key (callers pass
a unique tiebreaker, e.g. (ts, event_id)); with that, compaction,
versions, and intervals are all engine-independent — the registered
query carries an exact DuckDB oracle of the same two windows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_changelog(
    changelog: DataFrame,
    key: str,
    ts_col: str,
    attr: str,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Build an SCD Type 2 history table from an append-only changelog.

    Parameters
    ----------
    changelog : one row per observed (key, attr) state; duplicates of
        the current value are allowed (compacted away).
    key : the dimension's natural key column.
    ts_col : event-time column ordering the changes.
    attr : the tracked attribute column.
    tiebreak : extra columns making (ts_col, *tiebreak) a TOTAL order
        per key — REQUIRED whenever ts_col alone can tie, or versions
        are engine/partition-order dependent.

    Returns one row per version: (key, attr, effective_from,
    effective_to, version, is_current), effective_to NULL on the open
    current version.
    """
    order: list[Column] = [F.col(ts_col)] + [F.col(c) for c in tiebreak]
    w = Window.partitionBy(key).orderBy(*order)
    # Null-safe change test: a transition TO or FROM a NULL attribute
    # IS a change and must open a version (a bare `!=` returns NULL
    # there and the filter would silently compact it away). The first
    # row per key has no predecessor marker to distinguish from a NULL
    # attr, so it rides on row_number == 1.
    compacted = (
        changelog.select(key, ts_col, *tiebreak, attr)
        .withColumn("__prev", F.lag(attr).over(w))
        .withColumn("__rn", F.row_number().over(w))
        .filter(
            (F.col("__rn") == 1)
            | ~F.col("__prev").eqNullSafe(F.col(attr))
        )
        .drop("__prev", "__rn")
    )
    return (
        compacted.withColumn(
            "effective_to", F.lead(ts_col).over(w)
        )
        .withColumn("version", F.row_number().over(w))
        .select(
            F.col(key),
            F.col(attr),
            F.col(ts_col).alias("effective_from"),
            "effective_to",
            "version",
            F.col("effective_to").isNull().alias("is_current"),
        )
    )


def snapshot_asof(history: DataFrame, key: str, at) -> DataFrame:
    """Reconstruct the dimension AS OF a point in time from an SCD2
    history: the version whose [effective_from, effective_to) interval
    covers `at` (a timestamp literal or Column). Pure filter — no
    shuffle; partition pruning applies if the history is stored
    partitioned on effective_from date."""
    at_c = at if isinstance(at, Column) else F.lit(at).cast("timestamp")
    return history.filter(
        (F.col("effective_from") <= at_c)
        & (F.col("effective_to").isNull() | (F.col("effective_to") > at_c))
    )


def scd2_temporal_join(
    facts: DataFrame,
    history: DataFrame,
    key: str,
    fact_time: str,
    attr_cols: Sequence[str],
) -> DataFrame:
    """Event-time dimension enrichment (the versioned-table / temporal
    table join): every fact row, plus the SCD2 version's attributes
    valid AT the fact's event time — `[effective_from, effective_to)`
    containment, NULL attributes for facts before the key's first
    version. Completes the SCD2 family's read side for FACT STREAMS the
    way `snapshot_asof` completes it for a single frozen instant.

    Scale posture: the naive formulation is a range join (key equality
    + interval predicate). Spark plans that as an equi-join on the key
    that multiplies each fact row by ALL versions of its key before
    filtering — a hot dimension key with thousands of versions
    explodes the exchange. Because a FULL SCD2 history tiles the
    timeline per key (each effective_to equals the next version's
    effective_from; only the current version is open), interval
    containment is equivalent to a backward as-of match on
    effective_from — so this reuses the one-shuffle union+window as-of
    plan (operators/temporal.py:asof_join_backward): no row
    multiplication, one exchange on the dimension key.

    A defensive post-guard nulls the carried attributes when the
    matched version's effective_to <= fact time. On a full tiling
    history the guard can never fire; it becomes load-bearing when the
    caller passes a FILTERED slice of the history (e.g. only versions
    with a given attribute value), keeping containment semantics exact
    either way.

    Contract (inherited from the as-of machinery): `history` unique
    per (key, effective_from) — `scd2_from_changelog` over a changelog
    with per-(key, ts) duplicates pre-compacted satisfies this.

    Returns `facts.*` plus `asof_effective_from`, `asof_<attr>`...,
    `asof_effective_to`, `asof_version`.
    """
    from big_data_engineering_project_spark.operators.temporal import (
        asof_join_backward,
    )

    payload = [*attr_cols, "effective_to", "version"]
    joined = asof_join_backward(
        facts,
        history.select(key, "effective_from", *payload),
        key=key,
        left_time=fact_time,
        right_time="effective_from",
        payload_cols=payload,
    )
    # Evaluate validity ONCE before overwriting any carried column —
    # the guard reads asof_effective_to, which is itself nulled below.
    out = joined.withColumn(
        "__valid",
        F.col("asof_effective_to").isNull()
        | (F.col("asof_effective_to") > F.col(fact_time)),
    )
    for c in ["effective_from", *payload]:
        out = out.withColumn(
            f"asof_{c}", F.when(F.col("__valid"), F.col(f"asof_{c}"))
        )
    return out.drop("__valid")


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: Sequence[str],
) -> DataFrame:
    """Snapshot reconciliation: classify every key as 'added' (only in
    new), 'removed' (only in old), or 'changed' (in both, any compare
    column differs) — the anti-entropy pass that turns two full table
    snapshots into the changelog `scd2_from_changelog` consumes, and
    the verification step behind every backfill/migration sign-off.

    Each side collapses to (key, row_digest) BEFORE the join — the
    digest is xxhash64 over the null-tagged compare columns, so the
    full-outer reconciliation exchange carries 16 bytes per row, never
    the row itself (same text-never-shuffles discipline as the dedup
    family). Unchanged keys are filtered out post-join; with AQE the
    filter halves downstream work but the join itself must see every
    key — there is no sub-linear diff without a pre-maintained Merkle
    index, which is the documented scale-up path for repeated diffs
    of mostly-identical snapshots.

    NULL vs absent disambiguation: each column is tagged with an
    is-null marker inside the hash input, so (NULL) and ('') differ
    and a column going NULL is a change.

    `key` must be unique per snapshot (enforced nowhere — duplicate
    keys make 'changed' ill-defined; pre-aggregate first).
    """
    if not compare_cols:
        raise ValueError(
            "table_diff needs at least one compare column — with none, "
            "'changed' is undefined (only added/removed would be "
            "meaningful; select the key into compare_cols for a "
            "presence-only diff)"
        )

    def digest(df: DataFrame) -> DataFrame:
        # Hash the RAW TYPED columns (xxhash64 accepts any type) —
        # never a string rendering, which would classify two values
        # that merely format identically (-0.0 vs 0.0, a widened
        # read of the same timestamp) as unchanged. xxhash64 SKIPS
        # null inputs, so each column keeps an explicit is-null tag
        # to disambiguate NULL from absent-from-hash.
        parts: list[Column] = []
        for c in compare_cols:
            parts.append(F.col(c).isNull().cast("int"))
            parts.append(F.col(c))
        return df.select(
            F.col(key).alias("__k"),
            F.xxhash64(*parts).alias("__h"),
        )

    o = digest(old).withColumnRenamed("__h", "__h_old")
    n = digest(new).withColumnRenamed("__h", "__h_new")
    j = o.join(n, "__k", "full_outer")
    return (
        j.withColumn(
            "change_type",
            F.when(F.col("__h_old").isNull(), F.lit("added"))
            .when(F.col("__h_new").isNull(), F.lit("removed"))
            .when(F.col("__h_old") != F.col("__h_new"), F.lit("changed"))
            .otherwise(F.lit(None)),
        )
        .filter(F.col("change_type").isNotNull())
        .select(F.col("__k").alias(key), "change_type")
    )


DIFF_DEFAULT_BUCKETS = 4096


def _row_digest_cols(
    key: str, compare_cols: Sequence[str]
) -> tuple[Column, Column]:
    """(row digest, bucket) shared by table_diff_incremental's two
    levels: the digest covers key + null-tagged compare columns (raw
    typed values — see table_diff); the bucket is a key-hash shard,
    so a key lands in the SAME bucket in every snapshot and a changed
    /added/removed key always dirties exactly its own bucket."""
    parts: list[Column] = [F.col(key)]
    for c in compare_cols:
        parts.append(F.col(c).isNull().cast("int"))
        parts.append(F.col(c))
    return F.xxhash64(*parts), F.pmod(
        F.xxhash64(F.col(key)), F.lit(DIFF_DEFAULT_BUCKETS)
    )


def bucket_digests(
    df: DataFrame, key: str, compare_cols: Sequence[str]
) -> DataFrame:
    """Merkle-style level-1 index for incremental snapshot diffs: one
    row per key-hash bucket with an ORDER-INSENSITIVE digest
    (bit_xor of row digests — commutative/associative, so partial
    aggregation combines map-side in any order) and the bucket row
    count (xor alone cannot see a row REPLACED by another whose
    digest xors equal, and cancels pairs of identical rows; `key`
    uniqueness per snapshot is already table_diff's contract, and the
    count catches pure add/remove imbalances). Persist this table per
    snapshot (it is n_buckets rows — KBs) and daily diffs never
    re-shuffle the unchanged part of the table."""
    digest, bucket = _row_digest_cols(key, compare_cols)
    return (
        df.select(digest.alias("__h"), bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.bit_xor("__h").alias("bucket_digest"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )


def table_diff_incremental(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: Sequence[str],
    old_digests: DataFrame | None = None,
    new_digests: DataFrame | None = None,
) -> DataFrame:
    """table_diff, sub-linear in SHUFFLED bytes for mostly-identical
    snapshots: level 1 compares n_buckets (bucket_digest, n_rows)
    pairs — a bounded aggregate on each side, no row-level exchange —
    and level 2 runs the row-digest full-outer reconciliation ONLY on
    rows whose bucket changed. A changed/added/removed key always
    dirties its own bucket (key-hash bucketing), so the result is
    IDENTICAL to table_diff over the full snapshots — the registered
    query's oracle diffs the raw columns directly, proving exactly
    that.

    `old_digests`: a persisted bucket_digests(old, ...) table — the
    production shape (the R-S dedup corpus-index pattern): yesterday's
    index is stored, today's diff scans only the NEW snapshot plus
    the changed buckets' OLD rows (partition-pruned if the old
    snapshot is stored bucketed by the same key hash). Both scans
    are unavoidable without storage-level change tracking; what the
    index removes is the full-table row-digest SHUFFLE, which is the
    cost that scales with snapshot width × row count.

    `new_digests`: the symmetric persisted index for the NEW side —
    the continuous-reconciliation shape, where a streaming maintainer
    (streaming/scd2.py:run_table_diff_stream) keeps the replica's
    bucket digests current via XOR deltas per micro-batch; with both
    indexes supplied, level 1 costs zero table scans.
    """
    bd_old = (
        bucket_digests(old, key, compare_cols)
        if old_digests is None
        else old_digests
    )
    bd_new = (
        bucket_digests(new, key, compare_cols)
        if new_digests is None
        else new_digests
    )
    o = bd_old.select(
        "bucket",
        F.col("bucket_digest").alias("__do"),
        F.col("n_rows").alias("__no"),
    )
    n = bd_new.select(
        "bucket",
        F.col("bucket_digest").alias("__dn"),
        F.col("n_rows").alias("__nn"),
    )
    changed_buckets = (
        o.join(n, "bucket", "full_outer")
        .filter(
            ~(
                F.col("__do").eqNullSafe(F.col("__dn"))
                & F.col("__no").eqNullSafe(F.col("__nn"))
            )
        )
        .select("bucket")
    )
    _, bucket = _row_digest_cols(key, compare_cols)
    # changed_buckets is ≤ n_buckets rows — broadcast semi prune on
    # both row-level sides before the only row-level exchange
    old_dirty = old.withColumn("__b", bucket).join(
        F.broadcast(changed_buckets),
        F.col("__b") == F.col("bucket"),
        "left_semi",
    ).drop("__b")
    new_dirty = new.withColumn("__b", bucket).join(
        F.broadcast(changed_buckets),
        F.col("__b") == F.col("bucket"),
        "left_semi",
    ).drop("__b")
    return table_diff(old_dirty, new_dirty, key, compare_cols)
