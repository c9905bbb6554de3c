"""Registry-level tests: every registered query builds, runs at
sf0.001, and matches its DuckDB oracle (the driver's gate, mirrored
via tools/oracle_check helpers)."""

from __future__ import annotations

import duckdb
import pytest

from big_data_engineering_project_spark.plans import REGISTRY
from big_data_engineering_project_spark.sources.catalog import TABLES
from tools.oracle_check import compare


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf_dir, duck, name):
    spec = REGISTRY[name]
    sdf = spec.builder(spark, sf_dir).toPandas()
    if spec.oracle is None:
        assert len(sdf) >= 0  # rows-only smoke
        return
    ddf = duck.execute(spec.oracle).fetchdf()
    problems = compare(name, sdf, ddf)
    assert not problems, problems
