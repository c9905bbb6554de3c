"""Sources & sinks (SURVEY.md §2.1/§2.2).

The reference reads from the Reddit API, Kinesis, 32 CSVs, DynamoDB and
Hive (S1–S7) and writes to S3 CSV, Kinesis, DynamoDB, Hive and Athena
result objects (K1–K6). Spark-first, those collapse to: columnar Parquet
tables (the keyed/warehouse layers), CSV/JSON batch IO (the artifact
layers), and a file-based micro-batch stream source (the Kinesis layer —
see `streaming/`).
"""

from big_data_engineering_project_spark.sources.catalog import (
    TABLES,
    load_table,
    register_views,
)
from big_data_engineering_project_spark.sources.io import (
    read_csv,
    read_json,
    read_parquet,
    write_csv_artifact,
    write_parquet_table,
)

__all__ = [
    "TABLES",
    "load_table",
    "register_views",
    "read_csv",
    "read_json",
    "read_parquet",
    "write_csv_artifact",
    "write_parquet_table",
]
