"""Staged test fixtures that reshape the driver's single-file parquet
tables into the CLUSTER directory layouts SCALE.md's 100 TB posture
assumes (VERDICT r07 item 6).

The driver testdata ships one ``events.parquet`` file per scale factor,
so dynamic partition pruning, partition-wise maintenance and compaction
queries used to exercise synthetic per-query layouts only.
:func:`partitioned_events_dir` stages the REAL shape once per scale
factor — ``events_by_date/event_date=YYYY-MM-DD/*.parquet``, the
date-partitioned fact directory a production lake would have — and every
interested query reads that directory, so their plan assertions
(PartitionFilters, dynamicpruningexpression) run against genuine hive
partitions.

Staging is cached and SAFE under concurrency and change:

- the cache key embeds a staging-schema version plus the source file's
  (mtime, size) signature, so a regenerated testdata file or a changed
  staging transform gets a FRESH directory instead of silently reusing a
  stale layout;
- writers stage into a process-private temp directory and atomically
  ``os.rename`` it into place — two concurrent processes can both
  stage, but only one rename wins and the loser discards its copy, so a
  ``_SUCCESS``-marked directory is always one complete job's output
  (a check-then-overwrite into the shared path could interleave two
  jobs' task files under one marker).

Everything lives under the system temp dir — the read-only testdata
tree is never touched.
"""

from __future__ import annotations

import os
import re
import shutil
import tempfile
import uuid

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .registry import Catalog, _table_path

#: bump when the staging transform changes shape (partition key, derived
#: columns, …) — part of the cache key, so old layouts are abandoned
#: rather than reused
_STAGING_VERSION = 1


def _fixture_root(sf_dir: str) -> str:
    safe = re.sub(r"[^A-Za-z0-9]+", "_", sf_dir.strip("/"))
    return os.path.join(tempfile.gettempdir(), f"adb_sc_fixture_{safe}")


def _source_signature(sf_dir: str, table: str) -> str:
    """(mtime_ns, size) signature of the source table — cheap stat-only
    freshness key; a regenerated testdata file changes it. For a
    DIRECTORY source the directory inode's own mtime/size would miss
    in-place rewrites of same-named files, so the signature aggregates
    the contained parquet files instead (max mtime + total size)."""
    path = _table_path(sf_dir, table)
    try:
        if os.path.isdir(path):
            import glob as _glob

            files = sorted(_glob.glob(os.path.join(path, "*.parquet")))
            if not files:
                return "emptydir"
            stats = [os.stat(f) for f in files]
            return (
                f"{max(s.st_mtime_ns for s in stats)}_"
                f"{sum(s.st_size for s in stats)}_{len(stats)}"
            )
        st = os.stat(path)
        return f"{st.st_mtime_ns}_{st.st_size}"
    except OSError:
        return "nosrc"


def partitioned_events_dir(spark: SparkSession, sf_dir: str) -> str:
    """Path of the hive-partitioned events copy for ``sf_dir``, staging it
    on first use: ``event_date=YYYY-MM-DD`` directories derived from the
    event timestamp (the natural partition key of an event-log fact —
    ~30 partitions in the driver testdata)."""
    sig = _source_signature(sf_dir, "events")
    out = os.path.join(
        _fixture_root(sf_dir), f"events_by_date_v{_STAGING_VERSION}_{sig}"
    )
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    # stage into a private dir, then atomically rename into place: rename
    # onto an existing non-empty directory fails, so whichever process
    # wins owns a COMPLETE job output and losers discard their copy.
    # The finally-cleanup also covers a FAILED/interrupted write, so a
    # crashed staging attempt never leaks a partial .stage-* tree into
    # the shared fixture root (each retry would otherwise add one).
    tmp = f"{out}.stage-{uuid.uuid4().hex[:12]}"
    try:
        (
            Catalog(spark, sf_dir)
            .events.withColumn("event_date", F.to_date("ts"))
            .write.mode("overwrite")
            .partitionBy("event_date")
            .parquet(tmp)
        )
        try:
            os.rename(tmp, out)
        except OSError:
            # a concurrent stager won the rename — keep whichever
            # complete copy is in place, discard ours
            if not os.path.exists(os.path.join(out, "_SUCCESS")):
                raise
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out
