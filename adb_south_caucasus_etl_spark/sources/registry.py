"""Table catalog over the driver-generated parquet star schema.

The reference (oec.py) addresses data by *cube name* and lets a remote server
resolve it; here the catalog resolves table names to parquet scans, which
gives Catalyst predicate pushdown + column pruning for free (SURVEY §4).

At 100 TB the only change is the path layout: each logical table becomes a
directory of parquet files (optionally hive-partitioned by a date key), and
``spark.read.parquet`` picks up partition pruning automatically. Nothing in
this module assumes single-file tables.
"""

from __future__ import annotations

import glob
import os
import weakref

import pyarrow.parquet as pq
from pyarrow import types as patypes
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: every table the driver ships (TESTDATA.md)
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: dimensions small enough to broadcast at any scale factor — these are
#: bounded by the real world (countries, regions), not by fact volume,
#: so broadcasting them is safe even at the 100 TB tier.
BROADCAST_SAFE = frozenset({"region", "nation"})

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def _table_path(sf_dir: str, name: str) -> str:
    """Resolve a table to its parquet path. Accepts either a single
    ``<name>.parquet`` file (the test harness layout) or a ``<name>/``
    directory of parquet files (cluster layout)."""
    file_path = os.path.join(sf_dir, f"{name}.parquet")
    dir_path = os.path.join(sf_dir, name)
    if os.path.isdir(dir_path):
        return dir_path
    return file_path


def _ns_timestamp_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects outright (PARQUET_TYPE_ILLEGAL). Footer-only inspection —
    one metadata read on the driver, no data scanned."""
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not files:
            return []
        path = files[0]
    schema = pq.read_schema(path)
    return [
        f.name
        for f in schema
        if patypes.is_timestamp(f.type) and f.type.unit == "ns"
    ]


#: session-scoped DataFrame handle cache: (sf_dir, table) → DataFrame.
#: ``spark.read.parquet`` costs a driver-side file listing + footer schema
#: read every call (~0.5 s across a 5-table star at bench scale).
#:
#: IMMUTABLE-INPUT ASSUMPTION: the cached handle freezes the file listing
#: at first load, so files added to / rewritten under the same (sf_dir,
#: table) path later in the session are invisible to subsequent queries.
#: That is the right trade for this engine's inputs (the driver testdata is
#: generated once; 100 TB lake tables are append-by-new-partition, which a
#: directory-path scan re-lists per query anyway) — but any writer that
#: targets a cached path must call ``invalidate_table_cache`` with the
#: matching sf_dir/name (or no args to drop everything).
#: Weak-keyed on the session so stopped sessions don't pin JVM references.
_TABLE_CACHE: weakref.WeakKeyDictionary = weakref.WeakKeyDictionary()


def invalidate_table_cache(
    spark: SparkSession | None = None,
    sf_dir: str | None = None,
    name: str | None = None,
) -> None:
    """Drop cached table handles so the next ``load_table`` re-lists files.
    Filters are conjunctive; omitted args match everything (e.g.
    ``invalidate_table_cache(name="orders")`` drops orders for every sf_dir
    in every live session)."""
    sessions = [spark] if spark is not None else list(_TABLE_CACHE.keys())
    for sess in sessions:
        per_session = _TABLE_CACHE.get(sess)
        if not per_session:
            continue
        for key in [
            k
            for k in per_session
            if (sf_dir is None or k[0] == sf_dir)
            and (name is None or k[1] == name)
        ]:
            del per_session[key]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    per_session = _TABLE_CACHE.setdefault(spark, {})
    key = (sf_dir, name)
    if key in per_session:
        return per_session[key]
    df = _load_table_uncached(spark, sf_dir, name)
    per_session[key] = df
    return df


class _scoped_conf:
    """Set a SQL conf for the duration of a ``with`` block, then restore the
    caller's value. Parquet schema inference happens eagerly inside
    ``spark.read.parquet(...)`` (footer read on the driver), so the inferred
    LTZ-vs-NTZ decision is baked into the returned DataFrame's schema before
    the conf is restored — intentional NTZ reads elsewhere in the session are
    unaffected."""

    def __init__(self, spark: SparkSession, key: str, value: str):
        self.spark, self.key, self.value = spark, key, value

    def __enter__(self):
        try:
            self.prior = self.spark.conf.get(self.key)
        except Exception:
            self.prior = None
        self.spark.conf.set(self.key, self.value)

    def __exit__(self, *exc):
        if self.prior is None:
            self.spark.conf.unset(self.key)
        else:
            self.spark.conf.set(self.key, self.prior)
        return False


def ensure_ltz_timestamps(spark: SparkSession) -> _scoped_conf:
    """Context manager: within the block, parquet
    TIMESTAMP(isAdjustedToUTC=false) columns load as plain TIMESTAMP (the
    stored micros ARE the epoch micros, no timezone interpretation) rather
    than TIMESTAMP_NTZ. Rationale: the DuckDB oracle's ``epoch_us`` treats
    naive timestamps as UTC, and ``unix_micros`` (epoch semantics used
    throughout the workload) requires LTZ inputs — so LTZ is the
    engine-neutral reading for untagged inputs. Scoped set/restore so an
    intentional TIMESTAMP_NTZ parquet read elsewhere in the same session is
    not silently coerced (round-3 ADVICE)."""
    return _scoped_conf(
        spark, "spark.sql.parquet.inferTimestampNTZ.enabled", "false"
    )


def _load_table_uncached(
    spark: SparkSession, sf_dir: str, name: str
) -> DataFrame:
    path = _table_path(sf_dir, name)
    ns_cols = _ns_timestamp_cols(path)
    if not ns_cols:
        with ensure_ltz_timestamps(spark):
            return spark.read.parquet(path)
    # Read NANOS columns as raw int64 nanos, then convert to Spark's native
    # microsecond timestamps (floor division — same truncation DuckDB applies
    # when it loads ns into its µs TIMESTAMP, so oracles agree).
    # nanosAsLong stays session-wide (not scoped): unlike NTZ inference it is
    # consulted again at scan execution per-file, so restoring it after the
    # lazy read would break the plan at runtime.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    with ensure_ltz_timestamps(spark):
        df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


class Catalog:
    """Lazy table registry bound to one scale-factor directory.

    ``catalog.table("lineitem")`` returns the DataFrame (cached handle, not
    cached data); ``catalog.register_views()`` exposes every table as a temp
    view so operators can be written in SQL where that is clearer.
    """

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self.spark = spark
        self.sf_dir = sf_dir
        self._tables: dict[str, DataFrame] = {}

    def table(self, name: str) -> DataFrame:
        if name not in self._tables:
            self._tables[name] = load_table(self.spark, self.sf_dir, name)
        return self._tables[name]

    def register_views(self, names: tuple[str, ...] = TABLES) -> None:
        for name in names:
            self.table(name).createOrReplaceTempView(name)

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLES:
            return self.table(name)
        raise AttributeError(name)
