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

Staging is idempotent per (scale factor): the testdata is immutable, so
a present ``_SUCCESS`` marker means the layout is complete and is reused
for the rest of the session (and by later processes). Everything lives
under the system temp dir — the read-only testdata tree is never
touched.
"""

from __future__ import annotations

import os
import re
import tempfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .registry import Catalog


def _fixture_root(sf_dir: str) -> str:
    safe = re.sub(r"[^A-Za-z0-9]+", "_", sf_dir.strip("/"))
    return os.path.join(tempfile.gettempdir(), f"adb_sc_fixture_{safe}")


def partitioned_events_dir(spark: SparkSession, sf_dir: str) -> str:
    """Path of the hive-partitioned events copy for ``sf_dir``, staging it
    on first use: ``event_date=YYYY-MM-DD`` directories derived from the
    event timestamp (the natural partition key of an event-log fact —
    ~30 partitions in the driver testdata)."""
    out = os.path.join(_fixture_root(sf_dir), "events_by_date")
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    (
        Catalog(spark, sf_dir)
        .events.withColumn("event_date", F.to_date("ts"))
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(out)
    )
    return out
