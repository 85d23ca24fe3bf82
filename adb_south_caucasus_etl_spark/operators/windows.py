"""Time-window operators over event streams (SURVEY §2.I) — batch-first.

Each operator is expressed on a plain DataFrame so the DuckDB oracle can
verify it; ``streaming.wrappers`` lifts the same expressions onto a
``readStream`` source (identical column semantics, same ``F.window`` /
``F.session_window`` calls — Structured Streaming's incremental execution
is a property of the source, not the expression).

Scale: tumbling/sliding aggregation is a hash agg keyed on (window, keys) —
partial aggregation happens map-side, so the shuffle carries one row per
(window, key) per task. Sessionization shuffles once on the session key and
sorts within partitions (window function) — the same shape Structured
Streaming's state store maintains incrementally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    group_cols: list[str] | None = None,
    aggs: list | None = None,
) -> DataFrame:
    """T1: non-overlapping fixed windows. Output has window_start/window_end
    as epoch microseconds (engine-neutral)."""
    aggs = aggs or [F.count(F.lit(1)).alias("n")]
    out = df.groupBy(F.window(ts_col, duration), *(group_cols or [])).agg(*aggs)
    return out.select(
        F.unix_micros("window.start").alias("window_start_us"),
        F.unix_micros("window.end").alias("window_end_us"),
        *[c for c in out.columns if c != "window"],
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    group_cols: list[str] | None = None,
    aggs: list | None = None,
) -> DataFrame:
    """T2: overlapping windows (each event lands in duration/slide windows)."""
    aggs = aggs or [F.count(F.lit(1)).alias("n")]
    out = df.groupBy(
        F.window(ts_col, duration, slide), *(group_cols or [])
    ).agg(*aggs)
    return out.select(
        F.unix_micros("window.start").alias("window_start_us"),
        F.unix_micros("window.end").alias("window_end_us"),
        *[c for c in out.columns if c != "window"],
    )


def sessionize(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    gap: str = "30 minutes",
) -> DataFrame:
    """T3 (batch formulation): gap-based sessions via the lag/cumsum-islands
    pattern — a new session starts when the gap to the previous event of the
    same key exceeds ``gap``. Adds ``session_id`` (0-based per key).

    The streaming formulation uses ``F.session_window`` (see
    streaming.wrappers); the island boundaries are identical for the same
    gap because both close a session only after STRICTLY more than
    ``gap`` of inactivity — an event at exactly gap distance merges in
    both (session_window extends whenever ts <= last_ts + gap; probed
    and pinned in test_streaming_semantics.py::
    test_session_window_merges_at_exact_gap_boundary, since
    microsecond-random testdata never lands on the boundary).
    """
    gap_us = F.lit(_interval_to_us(gap))
    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).asc())
    prev_ts = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    new_session = (
        prev_ts.isNull()
        | ((F.unix_micros(F.col(ts_col)) - prev_ts) > gap_us)
    ).cast("long")
    run = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_id", F.sum(new_session).over(run) - 1)


def session_agg(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    gap: str = "30 minutes",
) -> DataFrame:
    """Session summary: bounds (epoch µs), event count, per (key, session)."""
    s = sessionize(df, ts_col, key_cols, gap)
    return s.groupBy(*key_cols, "session_id").agg(
        F.unix_micros(F.min(ts_col)).alias("session_start_us"),
        F.unix_micros(F.max(ts_col)).alias("session_end_us"),
        F.count(F.lit(1)).alias("n_events"),
    )


def drop_late(
    df: DataFrame, ts_col: str, delay: str = "10 minutes"
) -> DataFrame:
    """T4 (batch formulation of a watermark): keep rows with
    ``ts >= max(ts) - delay``. Streaming uses ``withWatermark`` (state
    eviction); the batch filter reproduces which rows survive.

    The global max is computed as a 1-row aggregate joined back by broadcast
    — no driver ``collect()``, so the operator composes lazily and scales."""
    delay_us = _interval_to_us(delay)
    wm = df.agg(
        (F.max(F.unix_micros(F.col(ts_col))) - F.lit(delay_us)).alias("__wm_us")
    )
    return (
        df.crossJoin(F.broadcast(wm))
        .filter(F.unix_micros(F.col(ts_col)) >= F.col("__wm_us"))
        .drop("__wm_us")
    )


_UNITS_US = {
    "second": 1_000_000,
    "seconds": 1_000_000,
    "minute": 60_000_000,
    "minutes": 60_000_000,
    "hour": 3_600_000_000,
    "hours": 3_600_000_000,
    "day": 86_400_000_000,
    "days": 86_400_000_000,
}


def _interval_to_us(spec: str) -> int:
    n, unit = spec.strip().split()
    return int(n) * _UNITS_US[unit.lower()]
