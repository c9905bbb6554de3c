"""Sources/sinks round trips (SURVEY.md §2.1/§2.2: S4, K1, K3, K5/K6)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from big_data_engineering_project_spark.sources.io import (
    read_csv,
    read_json,
    write_csv_artifact,
    write_parquet_table,
)
from big_data_engineering_project_spark.sources.catalog import load_table


def test_csv_multi_path_read_replaces_32_file_loop(spark, tmp_path):
    """S4/A9: one spark.read.csv over a path list ≡ pd.read_csv loop +
    concat (NB:102-170)."""
    paths = []
    for i in range(4):
        p = str(tmp_path / f"part{i}.csv")
        with open(p, "w") as f:
            f.write("id,grp\n")
            for j in range(10):
                f.write(f"{i * 10 + j},g{i}\n")
        paths.append(p)
    schema = StructType(
        [StructField("id", IntegerType()), StructField("grp", StringType())]
    )
    df = read_csv(spark, paths, schema=schema)
    assert df.count() == 40
    assert df.select("grp").distinct().count() == 4


def test_csv_artifact_writes_single_limited_file(spark, tmp_path, sf_dir):
    """K1: first-100 slice to ONE csv object (reddit_batch_processing.py:62-76)."""
    ev = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "artifact")
    write_csv_artifact(ev.select("event_id", "event_type"), out, limit=100)
    files = glob.glob(out + "/*.csv")
    assert len(files) == 1  # coalesce(1): a single stable object
    back = spark.read.option("header", "true").csv(out)
    assert back.count() == 100


def test_parquet_keyed_table_partitioned_write(spark, tmp_path, sf_dir):
    """K3 + partition pruning: partitioned layout prunes at read time."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_hour", F.hour("ts")
    )
    out = str(tmp_path / "keyed")
    write_parquet_table(ev, out, partition_by=["event_type"])
    pruned = spark.read.parquet(out).filter(F.col("event_type") == "click")
    plan = pruned.sparkSession._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan
    assert pruned.count() == ev.filter(F.col("event_type") == "click").count()


def test_json_schema_on_read(spark, tmp_path):
    """Kinesis-style JSON lines with explicit schema, no inference pass."""
    p = str(tmp_path / "records.json")
    with open(p, "w") as f:
        f.write('{"id": "a", "score": 5}\n{"id": "b"}\n{"id": "c", "score": null}\n')
    schema = StructType(
        [StructField("id", StringType()), StructField("score", IntegerType())]
    )
    df = read_json(spark, p, schema)
    rows = {r["id"]: r["score"] for r in df.collect()}
    assert rows == {"a": 5, "b": None, "c": None}
