"""SparkSession factory.

Local defaults tuned for the test harness (local[N], single JVM), but every
setting is the one you'd want on a real cluster too: AQE for runtime
re-planning (skew joins, partition coalescing), Arrow for any pandas
interchange, UTC session timezone so timestamp semantics match the DuckDB
oracle and are deployment-independent.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "adb_south_caucasus_etl_spark") -> SparkSession:
    """Build (or fetch) the SparkSession.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default ``*``).
    Shuffle partitions are sized to the local core count — on a real
    cluster you'd size to 2-3x total executor cores and let AQE coalesce.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = f"local[{cpus}]"
    shuffle = cpus if cpus.isdigit() else str(os.cpu_count() or 8)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # parquet TIMESTAMP(isAdjustedToUTC=false) loads as plain TIMESTAMP
        # (stored micros taken as epoch micros) instead of TIMESTAMP_NTZ:
        # matches the DuckDB oracle's treat-naive-as-UTC epoch semantics and
        # keeps unix_micros()/window() applicable regardless of which writer
        # produced the files (the driver testdata has shipped both flavors)
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # Let the planner pick shuffled-hash join where its size
        # conditions hold instead of defaulting to sort-merge (the
        # optimization-guide baseline): SHJ skips both per-partition
        # sorts, and AQE's local-map threshold converts SMJ->SHJ at
        # runtime when every post-shuffle partition is provably small.
        # Queries whose CLAIM is sort-merge-specific (bucketed scan
        # satisfying SMJ's ordering with zero exchange/sort) pin it
        # with an explicit MERGE hint — picking the strategy
        # deliberately either way. Measured r15 (interleaved min-of-3
        # suite): ~8% off a 10-query mix; env knobs because the right
        # threshold is memory-geometry-dependent on a real cluster.
        .config(
            "spark.sql.join.preferSortMergeJoin",
            os.environ.get("SPARK_GRAFT_PREFER_SMJ", "false"),
        )
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("SPARK_GRAFT_SHJ_LOCALMAP", "64m"),
        )
        # Answer MIN/MAX/COUNT-shaped scans from parquet footer
        # statistics instead of reading row groups — the ledger/census
        # queries in this workload count just-written scratch tables,
        # and at 100 TB a footer read is O(files), not O(bytes).
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # local mode = executors live IN the driver JVM, so this is the
        # whole engine's heap: 8g made 32 task threads GC/spill on the
        # shuffle-heavy graph/kNN queries (-25% at 16g: triangle 8.1->7.0s,
        # kNN 6.4->4.7s), while heaps past 16g start taxing the sub-second
        # queries (GC geometry). On a real cluster this maps to executor
        # memory instead.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
