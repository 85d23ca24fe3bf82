"""Sink (S4) and sketch (A3 approx) coverage the DuckDB oracle can't gate."""

import os

import pyspark.sql.functions as F

from adb_south_caucasus_etl_spark.sources.registry import Catalog
from adb_south_caucasus_etl_spark.sources.sinks import read_parquet, write_parquet

SF = "/root/testdata/sf0.001"


def test_partitioned_parquet_roundtrip(spark, tmp_path):
    out = str(tmp_path / "orders_by_year")
    orders = Catalog(spark, SF).orders.withColumn(
        "o_year", F.year("o_orderdate").cast("int")
    )
    write_parquet(orders, out, partition_by=["o_year"])

    # hive layout: one directory per year value
    year_dirs = [d for d in os.listdir(out) if d.startswith("o_year=")]
    assert len(year_dirs) >= 2

    back = read_parquet(spark, out)
    assert back.count() == orders.count()

    # partition-pruning filter reads a strict subset of files
    one_year = int(year_dirs[0].split("=")[1])
    pruned = back.filter(F.col("o_year") == one_year)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert back.filter(F.col("o_year") == one_year).count() == orders.filter(
        F.col("o_year") == one_year
    ).count()
    # the pushed partition filter must appear in the physical scan
    assert "o_year" in plan


def test_approx_count_distinct_accuracy(spark):
    li = Catalog(spark, SF).lineitem
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("exact"),
            F.approx_count_distinct("l_orderkey", 0.02).alias("approx"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r["approx"] - r["exact"]) <= max(3, 0.05 * r["exact"])


def test_max_records_per_file_splits_output(spark, tmp_path):
    out = str(tmp_path / "split")
    li = Catalog(spark, SF).lineitem.repartition(1)
    write_parquet(li, out, max_records_per_file=1000)
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) >= 2  # 6k rows / 1k per file
