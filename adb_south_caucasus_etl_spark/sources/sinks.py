"""Sinks (SURVEY §2.A S4).

The reference never writes anywhere — results are returned in-process
(``return df``, reference oec.py:25,66). A real pipeline needs sinks, and at
the 100 TB tier the default is **partitioned parquet**: one directory per
logical table, hive-partitioned on a low-cardinality pruning key (date/year),
so downstream reads get partition pruning for free. CSV/JSON writers are
provided for interchange, not for scale.

Design notes for 100 TB:

- ``partition_by`` should be a bounded-cardinality key (e.g. order year, not
  order key) — each distinct value becomes a directory, and thousands of tiny
  partitions poison the file listing.
- ``max_records_per_file`` bounds individual file size so a skewed partition
  value still yields splittable files.
- We never coalesce(1): output parallelism follows the upstream partitioning,
  which is what a 1000-executor writer needs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", True).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Read a sink back; hive partition columns come back as inferred types."""
    return spark.read.parquet(path)
