"""Query registry — keeps every Spark plan and its DuckDB oracle SQL
side by side so they cannot drift apart.

Driver contract (README / __spark_entry__.py): `queries()` maps name →
(spark, sf_dir) → DataFrame; `oracle_sql()` maps the same names to
ANSI SQL DuckDB runs on the same parquet tables. Column names (and
where possible types) must match — every computed column is aliased
identically on both sides.

Determinism rules enforced here (SURVEY.md §7.4 + parity experiments):
- Double SUMs are decimal-stabilized: SUM(CAST(x AS DECIMAL(18,6))) on
  both sides — decimal addition is exact/associative, so partial-agg
  combine order (Spark) vs thread merge order (DuckDB) can't change
  the value. AVG = CAST(decimal-sum AS DOUBLE)/COUNT.
- Every top-k / row_number ORDER BY is a total order (unique
  tiebreaker column) so the selected set is engine-independent.
- No wall-clock, no rand(): frozen literals only.
- Decimal literals feeding FLOAT ARITHMETIC in oracle SQL must be
  CAST(x AS DOUBLE): DuckDB parses 1.96 as DECIMAL and folds
  1.96*1.96 to the EXACT 3.8416 while Spark computes the double
  3.8415999999999997 — a 1-ULP divergence (bit us in the Wilson
  bounds); same for FLOOR/CEIL(frac * n) DF cuts, where the decimal
  product is exact at integral boundaries and the double one is not.
  Comparisons are safe (DuckDB promotes DECIMAL→DOUBLE there,
  verified); arithmetic is not. Exactly-representable literals
  (0.5, 0.25, 2.0, integers) are safe anywhere.
- Threshold FILTERS on float divisions prefer exact integer rationals
  (inter·den ≥ num·min — tf_cosine/containment style) over comparing
  the division against a float literal.
- No ln()/log() in hash-compared output: JVM and libm ln diverge at
  the ULP; emit the exact rational (lift) instead — ranking by lift ≡
  ranking by ln(lift). sqrt and a single division are correctly
  rounded and safe.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB SQL, or None → driver does rows-only check
    doc: str = ""
    headline: bool = False  # include in bench.py's timed set
    tags: tuple[str, ...] = field(default_factory=tuple)
    # For rows-only queries (oracle None): the pytest node ids that
    # pin the query's correctness invariants (accuracy/error-bound/
    # determinism). Recorded into the rows-only row of every
    # correctness artifact so the evidence trail names the checks
    # that DO verify the query.
    invariants: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    headline: bool = False,
    tags: tuple[str, ...] = (),
    invariants: tuple[str, ...] = (),
) -> Callable[[Builder], Builder]:
    """Decorator: `@register("q_x", oracle="SELECT ...")` on a builder."""

    def wrap(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name,
            builder=fn,
            oracle=oracle,
            doc=doc or (fn.__doc__ or ""),
            headline=headline,
            tags=tags,
            invariants=invariants,
        )
        return fn

    return wrap


# NOTE: get_queries/get_oracles live in plans/__init__.py — the export
# order there is the driver-gate priority order, not registration order.

# ---------------------------------------------------------------------------
# Shared SQL fragments (dialect subset valid in BOTH Spark SQL & DuckDB
# where used in both; DuckDB-only fragments are marked).


def sum_dec(expr: str, alias: str) -> str:
    """Order-stable SUM of a double expression: exact decimal adds
    internally (combine-order independent), double on the wire (both
    engines present the identical decimal as the identical double)."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18, 6))) AS DOUBLE) AS {alias}"


def avg_via_dec(expr: str, alias: str) -> str:
    """Order-stable AVG: exact decimal sum, one double division."""
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(18, 6))) AS DOUBLE) / COUNT(*) AS {alias}"
    )
