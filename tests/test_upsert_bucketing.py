"""J2 keyed-upsert semantics + bucketed-table co-located joins."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from big_data_engineering_project_spark.operators.upsert import (
    merge_upsert,
    upsert_parquet,
)
from big_data_engineering_project_spark.sources.catalog import load_table


def test_merge_upsert_last_writer_wins(spark):
    existing = spark.createDataFrame(
        [Row(id="a", v=1), Row(id="b", v=2), Row(id="c", v=3)]
    )
    updates = spark.createDataFrame([Row(id="b", v=20), Row(id="d", v=40)])
    got = {r["id"]: r["v"] for r in merge_upsert(existing, updates, "id").collect()}
    assert got == {"a": 1, "b": 20, "c": 3, "d": 40}


def test_merge_upsert_dedupes_update_batch_by_seq(spark):
    existing = spark.createDataFrame([Row(id="a", v=1)])
    updates = spark.createDataFrame(
        [Row(id="a", v=10, _seq=1), Row(id="a", v=99, _seq=2)]
    )
    got = merge_upsert(existing, updates, "id").collect()
    assert len(got) == 1 and got[0]["v"] == 99  # last _seq wins


def test_upsert_parquet_roundtrips(spark, tmp_path):
    """The DynamoDB put_item loop (kinesis_processing_2.py:149-163)
    replayed as two micro-batch upserts into a keyed Parquet table."""
    path = str(tmp_path / "keyed")
    b1 = spark.createDataFrame([Row(id="x", score=1), Row(id="y", score=2)])
    upsert_parquet(spark, path, b1, "id")
    b2 = spark.createDataFrame([Row(id="y", score=22), Row(id="z", score=3)])
    upsert_parquet(spark, path, b2, "id")
    got = {r["id"]: r["score"] for r in spark.read.parquet(path).collect()}
    assert got == {"x": 1, "y": 22, "z": 3}


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    """Bucketing both join sides on the key pre-shuffles ONCE at write
    time; subsequent joins are exchange-free — the 100 TB pattern for
    repeatedly-joined fact tables."""
    # (warehouse dir is a static conf — bucketed tables land in the
    # default ./spark-warehouse, which is gitignored)
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    orders.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).saveAsTable("t_orders_b")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).saveAsTable("t_lineitem_b")
    # Fixture tables are broadcast-small; disable auto-broadcast so the
    # plan shows the bucketed sort-merge shape big facts would take.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.table("t_orders_b")
        b = spark.table("t_lineitem_b")
        joined = a.join(b, a["o_orderkey"] == b["l_orderkey"]).groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = spark._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "simple"
        )
        # The join itself must not shuffle either side (bucket layout
        # satisfies the distribution); only the final small aggregation
        # exchanges.
        join_part = plan[: plan.index("HashAggregate")] if "HashAggregate" in plan else plan
        assert "SortMergeJoin" in plan
        assert plan.count("Exchange") <= 1  # agg only, not the join inputs
        # correctness unchanged vs unbucketed join
        expect = (
            orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, expect.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")
