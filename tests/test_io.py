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


def test_sorted_write_produces_prunable_row_groups(spark, sf_dir, tmp_path):
    """write_sorted_parquet must yield DISJOINT narrow per-file value
    ranges (the zone-map property scan pruning needs): with 8 range
    files, a point-range predicate overlaps ~1 file's [min,max] span,
    while an unsorted write leaves every file spanning the full value
    range (every file would be read). Verified from the actual parquet
    footer statistics via pyarrow — the same stats Spark's reader
    prunes row groups with."""
    import glob

    import pyarrow.parquet as pq

    from big_data_engineering_project_spark.sources.io import (
        write_sorted_parquet,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sorted_dir = str(tmp_path / "sorted")
    plain_dir = str(tmp_path / "plain")
    write_sorted_parquet(ev, sorted_dir, ["value"], n_files=8)
    ev.repartition(8).write.mode("overwrite").parquet(plain_dir)

    def file_ranges(d):
        spans = []
        for f in glob.glob(f"{d}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            col_idx = next(
                i for i in range(len(md.schema))
                if md.schema.column(i).name == "value"
            )
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(col_idx).statistics
                assert st is not None and st.has_min_max
                mins.append(st.min)
                maxs.append(st.max)
            spans.append((min(mins), max(maxs)))
        return spans

    lo, hi = (
        ev.selectExpr("min(value)", "max(value)").first()
    )
    full = hi - lo
    sorted_spans = file_ranges(sorted_dir)
    plain_spans = file_ranges(plain_dir)
    assert len(sorted_spans) == 8
    # Sorted: ranges are disjoint (zone maps select files); each file
    # covers a fraction of the domain. Unsorted: every file spans
    # nearly everything.
    ordered = sorted(sorted_spans)
    for (a_lo, a_hi), (b_lo, b_hi) in zip(ordered, ordered[1:]):
        assert a_hi <= b_lo  # disjoint
    # Disjoint ranges tile the domain: total sorted span ≈ the domain
    # once; unsorted files EACH span nearly the whole domain (~8×).
    assert sum(s_hi - s_lo for s_lo, s_hi in sorted_spans) <= 1.01 * full
    assert sum(p_hi - p_lo for p_lo, p_hi in plain_spans) > 6 * full


def test_corrupt_json_records_permissive_vs_dropmalformed(spark, tmp_path):
    """Ingestion robustness: a corrupt line in a JSON batch must not
    kill the job. PERMISSIVE mode lands it in _corrupt_record with
    NULL data columns; DROPMALFORMED silently drops it; counts agree."""
    p = str(tmp_path / "in.json")
    with open(p, "w") as f:
        f.write('{"a": 1, "b": "x"}\n')
        f.write("{not json at all\n")
        f.write('{"a": 3, "b": "z"}\n')

    schema = "a LONG, b STRING, _corrupt_record STRING"
    perm = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(p)
    )
    rows = perm.collect()
    assert len(rows) == 3
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(bad) == 1 and bad[0]["a"] is None

    dropped = (
        spark.read.schema("a LONG, b STRING")
        .option("mode", "DROPMALFORMED")
        .json(p)
    )
    assert dropped.count() == 2


def test_parquet_schema_evolution_mergeschema(spark, tmp_path):
    """Schema evolution: a column added mid-history must surface via
    mergeSchema (NULL-filled for old files), and the default read
    (single-footer schema) must still work — the contract long-lived
    100 TB tables rely on when producers add fields."""
    base = str(tmp_path / "tbl")
    spark.createDataFrame([(1, "a")], "id LONG, v STRING").write.parquet(
        f"{base}/day=1"
    )
    spark.createDataFrame(
        [(2, "b", 9.5)], "id LONG, v STRING, score DOUBLE"
    ).write.parquet(f"{base}/day=2")

    merged = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(merged.columns) == {"id", "v", "score", "day"}
    got = {r["id"]: r["score"] for r in merged.collect()}
    assert got == {1: None, 2: 9.5}


def test_dynamic_partition_overwrite_keeps_untouched_partitions(
    spark, tmp_path
):
    """Incremental backfill contract: re-writing ONE day must replace
    only that day's directory; static overwrite semantics would wipe
    the whole table — the difference between a safe re-run and a data
    loss at 100 TB."""
    from big_data_engineering_project_spark.sources.io import (
        write_partitioned_parquet,
    )

    path = str(tmp_path / "t")
    full = spark.createDataFrame(
        [("2024-01-01", 1, 10.0), ("2024-01-01", 2, 20.0),
         ("2024-01-02", 3, 30.0)],
        "day STRING, id INT, v DOUBLE",
    )
    write_partitioned_parquet(full, path, ["day"])
    # backfill day 1 with corrected values (one row now)
    fix = spark.createDataFrame(
        [("2024-01-01", 9, 99.0)], "day STRING, id INT, v DOUBLE"
    )
    write_partitioned_parquet(fix, path, ["day"])
    got = {
        # partition-column type inference reads day=... back as DATE
        (str(r["day"]), r["id"], r["v"])
        for r in spark.read.parquet(path).collect()
    }
    # day 2 survived; day 1 fully replaced by the backfill
    assert got == {("2024-01-01", 9, 99.0), ("2024-01-02", 3, 30.0)}
    # partition pruning: a day filter lists only that directory
    import os

    assert sorted(
        d for d in os.listdir(path) if d.startswith("day=")
    ) == ["day=2024-01-01", "day=2024-01-02"]
    # conf restored (scoped override must not leak)
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
        .lower()
        == "static"
    )


def test_zorder_write_skips_files_on_both_dimensions(spark, sf_dir, tmp_path):
    """Z-order layout must give footer-stats file skipping on BOTH
    clustered columns, where the single-column sorted layout prunes
    only its own sort key. Probe: fraction of files whose [min, max]
    for a column overlaps a 10%-range predicate."""
    import pyarrow.parquet as pq

    from big_data_engineering_project_spark.sources.io import (
        write_sorted_parquet,
        write_zordered_parquet,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    n_files = 16
    zpath = str(tmp_path / "z")
    spath = str(tmp_path / "s")
    write_zordered_parquet(li, zpath, ["l_partkey", "l_suppkey"], n_files)
    write_sorted_parquet(li, spath, ["l_partkey"], n_files)

    import os

    def overlap_fraction(path, col, lo, hi):
        files = [
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet")
        ]
        assert files
        hit = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            fmin = min(
                md.row_group(i).column(
                    [md.schema.column(j).name for j in range(md.num_columns)].index(col)
                ).statistics.min
                for i in range(md.num_row_groups)
            )
            fmax = max(
                md.row_group(i).column(
                    [md.schema.column(j).name for j in range(md.num_columns)].index(col)
                ).statistics.max
                for i in range(md.num_row_groups)
            )
            if fmax >= lo and fmin <= hi:
                hit += 1
        return hit / len(files)

    stats = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
    ).first()
    pk_lo, pk_hi = stats[0], stats[0] + (stats[1] - stats[0]) // 10
    sk_lo, sk_hi = stats[2], stats[2] + max(1, (stats[3] - stats[2]) // 10)

    # sorted-by-partkey: perfect partkey pruning, NO suppkey pruning
    assert overlap_fraction(spath, "l_partkey", pk_lo, pk_hi) <= 0.25
    assert overlap_fraction(spath, "l_suppkey", sk_lo, sk_hi) >= 0.9
    # z-order: BOTH dimensions skip a majority of files
    zf_pk = overlap_fraction(zpath, "l_partkey", pk_lo, pk_hi)
    zf_sk = overlap_fraction(zpath, "l_suppkey", sk_lo, sk_hi)
    assert zf_pk <= 0.6, zf_pk
    assert zf_sk <= 0.6, zf_sk


def test_zorder_pruned_scan_query_reads_fewer_files_than_written(
    spark, sf_dir
):
    """The registered q_zorder_pruned_scan must actually benefit from
    its layout: (a) BOTH range predicates reach the parquet reader as
    PushedFilters, and (b) footer min/max stats admit strictly fewer
    files than were written for each predicate — i.e. the scan skips
    files, it doesn't just filter rows."""
    import os

    import pyarrow.parquet as pq

    from big_data_engineering_project_spark.plans import REGISTRY
    from big_data_engineering_project_spark.plans.queries_warehouse import (
        _ZORDER_PK_HI,
        _ZORDER_PK_LO,
        _ZORDER_SK_HI,
        _ZORDER_SK_LO,
        _zordered_lineitem_path,
    )

    df = REGISTRY["q_zorder_pruned_scan"].builder(spark, sf_dir)
    plan = df.sparkSession._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    scan = plan[plan.index("Scan parquet"):]
    pushed = scan[scan.index("PushedFilters"): scan.index(
        "\n", scan.index("PushedFilters"))]
    assert "l_partkey" in pushed and "l_suppkey" in pushed, pushed

    path = _zordered_lineitem_path(spark, sf_dir)
    files = [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    ]
    assert len(files) > 1

    def admitted(col, lo, hi):
        hit = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            names = [md.schema.column(j).name for j in range(md.num_columns)]
            ci = names.index(col)
            fmin = min(md.row_group(i).column(ci).statistics.min
                       for i in range(md.num_row_groups))
            fmax = max(md.row_group(i).column(ci).statistics.max
                       for i in range(md.num_row_groups))
            if fmax >= lo and fmin <= hi:
                hit += 1
        return hit

    n_pk = admitted("l_partkey", _ZORDER_PK_LO, _ZORDER_PK_HI)
    n_sk = admitted("l_suppkey", _ZORDER_SK_LO, _ZORDER_SK_HI)
    # each dimension individually skips files; their conjunction can
    # only skip more
    assert n_pk < len(files), (n_pk, len(files))
    assert n_sk < len(files), (n_sk, len(files))
