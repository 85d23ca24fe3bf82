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


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 8,
    sort_cols: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """Write an external bucketed (+ optionally sorted) parquet table.

    Bucketing is THE co-located-join tool at 100 TB: two tables bucketed on
    the join key with the same bucket count join with ZERO exchange — the
    scan's output partitioning already satisfies the join's distribution
    requirement (verified by the no-Exchange plan assertion in
    tests/test_sinks_sketches.py). Sorted buckets additionally drop the
    sort-merge join's per-task sort. The price is paid once at write time
    (one shuffle into buckets), then every downstream join of both tables
    on that key is shuffle-free — the right trade for facts joined
    repeatedly on the same key (orders ⋈ lineitem on orderkey).

    Bucketed tables need the session catalog (bucket metadata lives there,
    not in parquet footers) — hence ``saveAsTable`` with an explicit
    ``path`` (external: dropping the table keeps the files).
    """
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", True).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Read a sink back; hive partition columns come back as inferred types."""
    return spark.read.parquet(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """ORC sink — same layout contract as ``write_parquet`` (hive
    partitioning, no coalesce). ORC is the interchange format for
    Hive/Trino-side consumers; both formats carry min/max stats and
    support predicate pushdown + column pruning in Spark's scan."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_csv(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """CSV read-back with an EXPLICIT schema — inference costs an extra
    full pass and guesses types from samples (both wrong at 100 TB)."""
    return spark.read.option("header", True).schema(schema).csv(path)


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction — the maintenance job every long-lived 100 TB
    table needs: streaming appends and dynamic-partition repairs leave
    thousands of KB-sized files whose open/footer overhead eventually
    dominates scans. Rewrites ``src_path`` into ``ceil(bytes/target)``
    files of ~``target_file_bytes`` via ``repartition(n)`` (full shuffle —
    deliberate: it rebalances skewed input files; use coalesce only when
    input sizes are already even). Returns the output file count.

    File sizing reads the FILE LISTING (driver metadata op), never the
    data.
    """
    import math

    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(src_path)
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
    total = sum(
        f.getLen()
        for f in fs.listStatus(jvm_path)
        if f.getPath().getName().endswith(".parquet")
    )
    n = max(1, math.ceil(total / target_file_bytes))
    spark.read.parquet(src_path).repartition(n).write.mode(
        "overwrite"
    ).parquet(dst_path)
    return n


def list_parquet_files(
    spark: SparkSession, path: str
) -> list[tuple[str, int]]:
    """Recursive ``(uri_path, bytes)`` listing of the ``*.parquet``
    files under ``path`` via the Hadoop FS API — works on any
    filesystem Spark can reach (local, HDFS, object stores). Driver
    metadata op, no data read. Shared by the compaction byte targeting
    below and the GEMM grid footer-truth sizing
    (``operators/similarity._footer_truth``).

    Applies Spark's ``InMemoryFileIndex`` hidden-file rule to every
    path segment BELOW ``path``: a segment starting with ``_`` or ``.``
    (``_temporary`` job-commit debris, ``.staging`` dirs, dotfiles) is
    invisible to Spark's reader, so counting it here would desync this
    listing from what a scan actually reads — fatal for the
    footer-truth path, which labels its result exact (ADVICE r10)."""
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
    root_uri = fs.makeQualified(jvm_path).toUri().getPath().rstrip("/")
    it = fs.listFiles(jvm_path, True)
    files: list[tuple[str, int]] = []
    while it.hasNext():
        f = it.next()
        p = f.getPath().toUri().getPath()
        if not p.endswith(".parquet"):
            continue
        rel = p[len(root_uri):].lstrip("/") if p.startswith(root_uri) else p
        # Spark's InMemoryFileIndex hidden rule EXEMPTS partition
        # directories: a segment like `__cell=0` is underscore-prefixed
        # but perfectly visible to a scan (the rule is
        # `startsWith("_") && !contains("=")`). Without the exemption,
        # every hive layout whose partition column starts with an
        # underscore listed as 0 bytes — which silently turned the
        # byte-targeted compactor into a one-row-per-file shredder
        # (rows_per_file_for_bytes degraded to 1; caught by the IVF-PQ
        # postings compaction roundtrip, r14). The `=` exemption is
        # UNDERSCORE-ONLY (ADVICE r14): Spark hides dot-prefixed
        # segments unconditionally, so a `.foo=bar` segment must stay
        # hidden here too or the listing would count files a scan
        # never reads.
        if any(
            seg.startswith(".")
            or (seg.startswith("_") and "=" not in seg)
            for seg in rel.split("/")
        ):
            continue
        files.append((p, f.getLen()))
    return files


def rows_per_file_for_bytes(
    spark: SparkSession,
    src_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Convert a per-file BYTE target into the ROW target
    ``compact_partitioned_parquet`` actually enforces: average encoded
    row width = total parquet bytes (recursive file listing, driver
    metadata op) / total rows (parquet footer counts via a count()
    aggregate — no data read), then ``target_bytes / avg_row_bytes``.
    Separated from the compactor so the oracle-facing file-count
    arithmetic (``ceil(rows/k)``) stays exact in ROW space while the
    bytes→rows conversion — inherently encoding-dependent — lives in
    one testable place."""
    total = sum(b for _, b in list_parquet_files(spark, src_path))
    rows = spark.read.parquet(src_path).count()
    if rows <= 0 or total <= 0:
        return 1
    avg = max(1, total // rows)
    return max(1, int(target_file_bytes // avg))


def compact_partitioned_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    part_col: str,
    max_rows_per_file: int | None = None,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> None:
    """Per-partition small-file compaction of a hive layout — the
    SCALE.md 100 TB recipe made executable: rewrite
    ``src/part=X/many-small-files`` into ``ceil(rows_X / k)`` files per
    partition directory, where ``k`` is ``max_rows_per_file`` (or the
    byte target converted via :func:`rows_per_file_for_bytes`).

    The mechanism is deliberately Spark-native and EXACT:
    ``repartition(part_col)`` lands every partition's rows in exactly
    one task (hash collisions merge partitions into a task, never split
    one), and the writer's ``maxRecordsPerFile`` rolls that task's
    output per directory — so each directory gets exactly
    ``ceil(rows_p / k)`` files, a number an external oracle can state
    from row counts alone. One shuffle, no per-partition driver loop,
    no second job.

    Skew note: one-task-per-partition caps parallelism at the partition
    count and serializes a giant partition; at that point switch the
    exchange to ``repartition(part_col, pmod(xxhash64(id), m))`` —
    ``maxRecordsPerFile`` still bounds file SIZE, the per-directory
    file-count arithmetic just loosens from exact to ≤ m · ceil."""
    if max_rows_per_file is None:
        max_rows_per_file = rows_per_file_for_bytes(
            spark, src_path, target_file_bytes
        )
    (
        spark.read.parquet(src_path)
        .repartition(part_col)
        .write.option("maxRecordsPerFile", int(max_rows_per_file))
        .mode("overwrite")
        .partitionBy(part_col)
        .parquet(dst_path)
    )


def zorder_key(cols: Sequence[str], bits: int = 16):
    """Morton (Z-order) interleave of ``cols`` (each rank-normalized to
    ``bits`` bits beforehand) — multi-column clustering: sorting by the
    interleaved key keeps rows close in EVERY dimension, so parquet
    min/max footers prune scans filtered on ANY of the clustered columns
    (single-column range sort only helps its own column). Pure bit
    arithmetic, JVM codegen, no UDF."""
    from pyspark.sql import functions as F

    z = F.lit(0).cast("long")
    for bit in range(bits):
        for i, c in enumerate(cols):
            pos = bit * len(cols) + i
            one = F.shiftright(F.col(c).cast("long"), bit).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(one, pos))
    return z


def expire_partitions(
    spark: SparkSession,
    table_dir: str,
    partition_dirs: Sequence[str],
) -> int:
    """Partition RETENTION expire: drop whole hive partition directories
    (``col=value`` names relative to ``table_dir``) via the filesystem —
    the metadata-only mechanism Hive/Iceberg retention uses under the
    hood. Surviving data is not rewritten or even read: at 100 TB,
    expiring 300 of 3000 day-directories touches exactly those 300
    directory entries, never the other 99%'s bytes (a filtered-rewrite
    "expire" would re-shuffle the entire table to delete 10% of it).
    Returns the number of directories actually removed (a name that is
    already gone counts 0 — expire is idempotent)."""
    import os

    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    HPath = jvm.org.apache.hadoop.fs.Path
    fs = HPath(table_dir).getFileSystem(hconf)
    removed = 0
    for name in partition_dirs:
        p = HPath(os.path.join(table_dir, name))
        # count only CONFIRMED deletes: fs.delete returns false on
        # failure (permissions, concurrent writer) and the contract is
        # "directories actually removed" — a retention job must not be
        # told data is gone while it survives on disk
        if fs.exists(p) and fs.delete(p, True):
            removed += 1
    return removed
