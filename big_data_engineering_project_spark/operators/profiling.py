"""Data-quality profiling: per-column stats in one logical pass.

The ingestion-side health check every pipeline fronts its tables with
(null rates, cardinalities, ranges) — reference analog: the notebook's
ad-hoc `df.count()` / `printSchema` poking (`NB` cells 6-12), done as
one engine pass with an exact oracle instead of N driver round-trips.

Scale note (visible in .explain): EXACT distinct counts for N columns
make Catalyst plan an Expand — each input row is replicated N+1 times
into per-distinct-aggregate groups before the partial aggregate. That
is the honest cost of exact multi-column cardinality in one query
(still one scan, and partial aggregation collapses each Expand group
map-side). At 100 TB, either profile cardinality for the handful of
columns where it matters (the `distinct_cols` knob) or swap in
approx_count_distinct (HLL, single pass, no Expand) and give up the
exact oracle — same trade documented at q_hll_distinct_users.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    num_cols: list[str],
    str_cols: list[str],
    distinct_cols: list[str] | None = None,
) -> DataFrame:
    """One row per profiled column: n_rows, n_nulls, n_distinct
    (exact; only for `distinct_cols`, default all), and typed min/max
    (numeric columns fill min_num/max_num, string columns fill
    min_str/max_str — never a cross-engine double→string cast, whose
    formatting differs between engines). One aggregation, then a
    bounded unpivot of the single stats row. With no columns to
    profile, returns an EMPTY DataFrame with the profile schema (the
    degenerate call used to IndexError — r6 ADVICE)."""
    distinct_cols = (
        (num_cols + str_cols) if distinct_cols is None else distinct_cols
    )
    if not num_cols and not str_cols:
        return df.sparkSession.createDataFrame(
            [],
            "column STRING, n_rows BIGINT, n_nulls BIGINT, "
            "n_distinct BIGINT, min_num DOUBLE, max_num DOUBLE, "
            "min_str STRING, max_str STRING",
        )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in num_cols + str_cols:
        aggs.append(F.count(c).alias(f"__nn_{c}"))
        if c in distinct_cols:
            aggs.append(F.count_distinct(c).alias(f"__nd_{c}"))
    for c in num_cols:
        aggs.append(F.min(c).cast("double").alias(f"__min_{c}"))
        aggs.append(F.max(c).cast("double").alias(f"__max_{c}"))
    for c in str_cols:
        aggs.append(F.min(c).alias(f"__smin_{c}"))
        aggs.append(F.max(c).alias(f"__smax_{c}"))
    one = df.agg(*aggs)

    rows = []
    for c in num_cols + str_cols:
        is_num = c in num_cols
        rows.append(
            one.select(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{c}")).alias("n_nulls"),
                (
                    F.col(f"__nd_{c}")
                    if c in distinct_cols
                    else F.lit(None).cast("long")
                ).alias("n_distinct"),
                (
                    F.col(f"__min_{c}") if is_num else F.lit(None).cast("double")
                ).alias("min_num"),
                (
                    F.col(f"__max_{c}") if is_num else F.lit(None).cast("double")
                ).alias("max_num"),
                (
                    F.col(f"__smin_{c}") if not is_num else F.lit(None).cast("string")
                ).alias("min_str"),
                (
                    F.col(f"__smax_{c}") if not is_num else F.lit(None).cast("string")
                ).alias("max_str"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def referential_integrity_audit(
    relations: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Foreign-key orphan audit across a star/snowflake schema: for
    each (name, fact, fact_key, dim, dim_key) relation, one summary
    row (relation, fact_rows, orphan_rows, orphan_keys) where an
    orphan is a non-NULL fact key with no matching dim row (NULL FKs
    are optional references, reported separately as null_keys — the
    standard DQ decomposition).

    Shape per relation: dim keys are DISTINCT-ed then LEFT-joined
    under the fact (key-only projections — the audit never moves
    non-key columns), and the whole verdict reduces in one aggregate.
    Small dims broadcast automatically (AQE); a fact-sized dim (e.g.
    lineitem→orders at 100 TB) falls back to a sort-merge join on the
    key both sides are naturally clustered by. The per-relation
    results are 1-row frames; the union is free.
    """
    if not relations:
        raise ValueError(
            "referential_integrity_audit needs at least one relation"
        )
    outs: list[DataFrame] = []
    for name, fact, fkey, dim, dkey in relations:
        dk = dim.select(F.col(dkey).alias("__dk")).distinct().withColumn(
            "__hit", F.lit(1)
        )
        j = fact.select(F.col(fkey).alias("__fk")).join(
            dk, F.col("__fk") == F.col("__dk"), "left"
        )
        orphan = F.col("__fk").isNotNull() & F.col("__hit").isNull()
        outs.append(
            j.agg(
                F.lit(name).alias("relation"),
                F.count(F.lit(1)).cast("long").alias("fact_rows"),
                F.coalesce(F.sum(orphan.cast("long")), F.lit(0))
                .cast("long")
                .alias("orphan_rows"),
                F.countDistinct(F.when(orphan, F.col("__fk")))
                .cast("long")
                .alias("orphan_keys"),
                F.coalesce(F.sum(F.col("__fk").isNull().cast("long")), F.lit(0))
                .cast("long")
                .alias("null_keys"),
            )
        )
    out = outs[0]
    for r in outs[1:]:
        out = out.unionByName(r)
    return out


def key_skew_report(
    df: DataFrame, key_cols: list[str], top_n: int = 10
) -> DataFrame:
    """Shuffle-key skew diagnostics: for each candidate key column,
    one row (column, n_rows, n_keys, max_key_rows, top1_share,
    topn_share, avg_rows_per_key) — the pre-flight check before
    keying a 100 TB join/agg on a column. top1_share is the fraction
    of the table owned by the hottest key (the partition that one
    reducer will receive); topn_share the fraction owned by the
    `top_n` hottest.

    Per column: one groupBy(key).count() (map-side combined), then
    scalar aggregates over the counts table plus a distributed
    TakeOrdered top-n of the count VALUES (sum of the n largest
    counts is tie-insensitive — the multiset of values is what sums,
    not which keys carry them — so the report is deterministic even
    with rank-boundary ties). All shares are single IEEE divisions
    of exact BIGINTs.
    """
    if not key_cols:
        raise ValueError("key_skew_report needs at least one key column")
    if top_n < 1:
        raise ValueError("key_skew_report: top_n must be >= 1")
    outs: list[DataFrame] = []
    for c in key_cols:
        counts = df.groupBy(F.col(c).alias("__k")).agg(
            F.count(F.lit(1)).cast("long").alias("__c")
        )
        stats = counts.agg(
            F.sum("__c").cast("long").alias("__rows"),
            F.count(F.lit(1)).cast("long").alias("__keys"),
            F.max("__c").cast("long").alias("__max"),
        )
        topn = (
            counts.select("__c")
            .orderBy(F.desc("__c"))
            .limit(top_n)
            .agg(F.sum("__c").cast("long").alias("__topn"))
        )
        outs.append(
            stats.crossJoin(F.broadcast(topn)).select(
                F.lit(c).alias("column"),
                F.col("__rows").alias("n_rows"),
                F.col("__keys").alias("n_keys"),
                F.col("__max").alias("max_key_rows"),
                (
                    F.col("__max").cast("double")
                    / F.col("__rows").cast("double")
                ).alias("top1_share"),
                (
                    F.col("__topn").cast("double")
                    / F.col("__rows").cast("double")
                ).alias("topn_share"),
                (
                    F.col("__rows").cast("double")
                    / F.col("__keys").cast("double")
                ).alias("avg_rows_per_key"),
            )
        )
    out = outs[0]
    for r in outs[1:]:
        out = out.unionByName(r)
    return out


def join_size_forecast(
    lhs: DataFrame,
    lhs_key: str,
    rhs: DataFrame,
    rhs_key: str,
    relation: str,
) -> DataFrame:
    """Predict an equi-join's output size WITHOUT running the join —
    the pre-flight companion to `key_skew_report`: join_rows =
    Σ_k cnt_lhs(k)·cnt_rhs(k) computed from the two per-key count
    tables (each |keys| rows — the exchange carries counters, never
    fact rows), plus the hottest key and its contribution (the rows
    ONE reducer would receive). A forecast that says 10¹² rows or a
    0.4 hottest-share is the signal to salt/broadcast BEFORE spending
    the cluster on the real join.

    Returns one row: (relation, lhs_rows, rhs_rows, join_rows,
    hottest_key, hottest_rows) — all exact BIGINTs; the hottest tie
    breaks (contribution DESC, key ASC), a total order.
    """
    lc = lhs.groupBy(F.col(lhs_key).alias("__k")).agg(
        F.count(F.lit(1)).cast("long").alias("__cl")
    )
    rc = rhs.groupBy(F.col(rhs_key).alias("__k")).agg(
        F.count(F.lit(1)).cast("long").alias("__cr")
    )
    per_key = lc.join(rc, "__k").select(
        "__k", (F.col("__cl") * F.col("__cr")).alias("__prod")
    )
    hottest = per_key.orderBy(
        F.desc("__prod"), F.asc("__k")
    ).limit(1).select(
        F.lit(1).alias("__j"),
        F.col("__k").alias("hottest_key"),
        F.col("__prod").alias("hottest_rows"),
    )
    totals = per_key.agg(
        F.coalesce(F.sum("__prod"), F.lit(0)).cast("long").alias("join_rows")
    )
    sizes = lhs.agg(F.count(F.lit(1)).cast("long").alias("lhs_rows")).crossJoin(
        rhs.agg(F.count(F.lit(1)).cast("long").alias("rhs_rows"))
    )
    # hottest is EMPTY when the key sets are disjoint — a left join on
    # a constant (not a crossJoin) keeps the promised single row with
    # NULL hottest_* and join_rows = 0 in that case.
    return (
        sizes.crossJoin(F.broadcast(totals))
        .withColumn("__j", F.lit(1))
        .join(F.broadcast(hottest), "__j", "left")
        .select(
            F.lit(relation).alias("relation"),
            "lhs_rows",
            "rhs_rows",
            "join_rows",
            "hottest_key",
            "hottest_rows",
        )
    )


def profile_drift(
    before: DataFrame,
    after: DataFrame,
    num_cols: list[str],
    str_cols: list[str],
    distinct_cols: list[str] | None = None,
) -> DataFrame:
    """Column-level drift between two snapshots of the same table —
    the data-quality REGRESSION check on top of `profile_table`
    (schema drift, null-rate spikes, cardinality collapse, range
    shifts between yesterday's load and today's): both profiles run
    their single-pass aggregation, then FULL-OUTER join on the column
    name — the joined frames are #columns rows, so the comparison is
    free at any corpus size. Each side profiles only the requested
    columns that snapshot actually HAS, so a column added or dropped
    between loads (schema drift) surfaces as a row with one side all
    NULL instead of erroring. Returns one row per column:
    (column, n_rows_a/b, null_rate_a/b, n_distinct_a/b,
    min_num_a/b, max_num_a/b)."""

    def present(df: DataFrame, cols: list[str]) -> list[str]:
        have = set(df.columns)
        return [c for c in cols if c in have]

    pa = profile_table(
        before, present(before, num_cols), present(before, str_cols),
        distinct_cols,
    )
    pb = profile_table(
        after, present(after, num_cols), present(after, str_cols),
        distinct_cols,
    )

    def side(p: DataFrame, tag: str) -> DataFrame:
        return p.select(
            "column",
            F.col("n_rows").alias(f"n_rows_{tag}"),
            (
                F.col("n_nulls").cast("double") / F.col("n_rows")
            ).alias(f"null_rate_{tag}"),
            F.col("n_distinct").alias(f"n_distinct_{tag}"),
            F.col("min_num").alias(f"min_num_{tag}"),
            F.col("max_num").alias(f"max_num_{tag}"),
        )

    return side(pa, "a").join(side(pb, "b"), "column", "full_outer")
