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


#: grace window between a generation being OBSERVED superseded and its
#: deletion: a job that resolved the OLD path just before testdata
#: regeneration may still be scanning it — deleting parquet files
#: mid-scan fails its tasks even though the data it reads is stale
#: (ADVICE r09). One hour outlives any query in this suite by orders
#: of magnitude.
_PRUNE_GRACE_SECONDS = 3600

#: tombstone dropped into a superseded generation on the prune pass
#: that first OBSERVES it stale; deletion happens on a later pass once
#: the tombstone has aged past the grace window. Age since STAGING
#: would not protect readers (a generation staged days ago can be
#: superseded seconds ago); supersession is only observable at prune
#: time, so the marker records it.
_TOMBSTONE = ".superseded"


def _prune_stale_generations(root: str, prefix: str, keep: str) -> None:
    """Best-effort deletion of ABANDONED fixture generations (ADVICE r08):
    every staging-version bump or source (mtime, size) change stages a
    fresh full copy and the old directory would otherwise accumulate in
    the temp root forever. Only siblings of the SAME fixture prefix with
    a different version/signature suffix are touched; a different suffix
    means the testdata they were staged from no longer exists in that
    form — but a long-running job that resolved the old path BEFORE the
    regeneration may still be mid-scan on it, so deletion is
    TWO-PHASED (ADVICE r09): the pass that first observes a sibling
    stale only drops a :data:`_TOMBSTONE` marker inside it; the files
    are removed by a later pass once the marker is older than
    :data:`_PRUNE_GRACE_SECONDS` — by then any reader that predates the
    supersession has long finished. In-progress ``.stage-*``
    directories are NEVER touched — a concurrent stager for a different
    signature (testdata regenerated mid-flight) must not have its
    private write tree deleted under it; each stager's own ``finally``
    cleans its debris. Errors are ignored — pruning is hygiene, not
    correctness."""
    import glob as _glob
    import time

    now = time.time()
    for path in _glob.glob(os.path.join(root, f"{prefix}_v*_*")):
        if path == keep:
            # a signature can REVERT (testdata restored to a prior
            # form), turning a tombstoned generation back into the keep
            # target. Remove the stale marker (ADVICE r10): left in
            # place, a LATER supersession would see an already-aged
            # tombstone and rmtree on its very first observation — no
            # grace window, the mid-scan reader protection gone.
            try:
                os.remove(os.path.join(path, _TOMBSTONE))
            except OSError:
                pass
            continue
        if ".stage-" in os.path.basename(path):
            continue
        marker = os.path.join(path, _TOMBSTONE)
        try:
            if not os.path.exists(marker):
                with open(marker, "w", encoding="utf-8") as fh:
                    fh.write(f"{now}\n")
                continue
            if now - os.stat(marker).st_mtime < _PRUNE_GRACE_SECONDS:
                continue
        except OSError:
            continue
        shutil.rmtree(path, ignore_errors=True)


def _staged_partitioned_dir(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    prefix: str,
    stage,
) -> str:
    """Generic once-per-SF hive-layout staging (see module docstring for
    the cache-key and atomic-rename discipline). ``stage(catalog)`` maps
    the source table to the partitioned frame to write; the writer must
    call ``.partitionBy`` itself via the returned (frame, part_col)."""
    sig = _source_signature(sf_dir, table)
    out = os.path.join(
        _fixture_root(sf_dir), f"{prefix}_v{_STAGING_VERSION}_{sig}"
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
        frame, part_col = stage(Catalog(spark, sf_dir))
        frame.write.mode("overwrite").partitionBy(part_col).parquet(tmp)
        try:
            os.rename(tmp, out)
            _prune_stale_generations(_fixture_root(sf_dir), prefix, out)
        except OSError:
            # a concurrent stager won the rename — keep whichever
            # complete copy is in place, discard ours
            if not os.path.exists(os.path.join(out, "_SUCCESS")):
                raise
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def partitioned_events_dir(spark: SparkSession, sf_dir: str) -> str:
    """Path of the hive-partitioned events copy for ``sf_dir``, staging it
    on first use: ``event_date=YYYY-MM-DD`` directories derived from the
    event timestamp (the natural partition key of an event-log fact —
    ~30 partitions in the driver testdata). The partition column reads
    back as DATE (hive partition-type inference parses the dir values)."""
    return _staged_partitioned_dir(
        spark,
        sf_dir,
        "events",
        "events_by_date",
        lambda cat: (
            cat.events.withColumn("event_date", F.to_date("ts")),
            "event_date",
        ),
    )


def partitioned_orders_dir(spark: SparkSession, sf_dir: str) -> str:
    """Path of the month-partitioned orders copy for ``sf_dir``:
    ``o_month=YYYY-MM`` directories derived from ``o_orderdate`` (the
    classic monthly fact layout; ~80 partitions over TPC-H's 7-year
    order span). Deliberately the OTHER partition-column type class than
    the events fixture: ``YYYY-MM`` does not parse as a date, so hive
    partition inference types the column STRING — DPP and partition
    filters must work against string directories exactly as they do
    against DATE ones (VERDICT r08 item 7)."""
    return _staged_partitioned_dir(
        spark,
        sf_dir,
        "orders",
        "orders_by_month",
        lambda cat: (
            cat.orders.withColumn(
                "o_month", F.date_format("o_orderdate", "yyyy-MM")
            ),
            "o_month",
        ),
    )
