"""Named query plans + DuckDB oracle SQL (the driver contract).

Importing this package populates the registry: every operator from
SURVEY.md §2 (and the north-star pipeline extensions) is exposed as a
named (spark, sf_dir) → DataFrame builder with, where SQL-expressible,
a matching ANSI-SQL oracle string.
"""

from big_data_engineering_project_spark.plans.registry import (
    REGISTRY,
    QuerySpec,
    get_queries,
    get_oracles,
)

# Populate the registry (import side effects, order = display order).
from big_data_engineering_project_spark.plans import queries_reference  # noqa: E402,F401
from big_data_engineering_project_spark.plans import queries_tpch  # noqa: E402,F401
from big_data_engineering_project_spark.plans import queries_pipeline  # noqa: E402,F401
from big_data_engineering_project_spark.plans import queries_temporal  # noqa: E402,F401

__all__ = ["REGISTRY", "QuerySpec", "get_queries", "get_oracles"]
