"""Structured Streaming wrappers (SURVEY §2.I T1-T5).

Each batch operator in ``operators.windows`` has a streaming lift here: the
same expression tree applied to a ``readStream`` source with a watermark.
The driver's correctness oracle runs the batch form; these wrappers prove
the expressions are streaming-legal (append-mode windows, state eviction via
watermark) and are exercised by tests with a file source + memory sink.
"""

from __future__ import annotations

import contextlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import (
    _ns_timestamp_cols,
    _table_path,
    ensure_ltz_timestamps,
)

#: shuffle partitions for STREAMING starts (r15). Every stateful
#: streaming operator instantiates one state store PER shuffle
#: partition, and each store pays an open/commit/snapshot cycle per
#: micro-batch — with the batch session's partition count (32 here) the
#: fixture-sized streams spent 2-3x more wall in state-store bookkeeping
#: than in data (measured: stream-stream interval join at sf0.1,
#: min-of-2 — 32 partitions 5.9 s, 8 partitions 2.5 s; values
#: identical, each key group lives wholly in one partition either way).
#: Unlike batch shuffles, this number is not AQE-coalescible and gets
#: PINNED into the query's checkpoint, so production sizes it from
#: expected STATE VOLUME (~100 MB-1 GB per store), not core count —
#: that is what the env override is for at 100 TB. The local default 8
#: is a state-size decision for the bounded fixtures (KBs of state),
#: never raises the session value (min), and leaves batch queries
#: untouched.
STREAM_SHUFFLE_ENV = "SPARK_GRAFT_STREAM_SHUFFLE"


@contextlib.contextmanager
def stream_shuffle_scope(spark: SparkSession):
    """Scope ``spark.sql.shuffle.partitions`` down to the streaming
    state-store sizing (see ``STREAM_SHUFFLE_ENV``) around a stream's
    start→awaitTermination window; the batch value is restored on exit.
    The conf is read at query START (and pinned into the checkpoint),
    so the scope must cover the whole drain, not just ``.start()``."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        want = int(os.environ.get(STREAM_SHUFFLE_ENV, "8"))
        eff = str(min(int(old), want)) if want > 0 else old
    except ValueError:
        eff = old
    spark.conf.set("spark.sql.shuffle.partitions", eff)
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def read_events_stream(
    spark: SparkSession, sf_dir: str, table: str = "events"
) -> DataFrame:
    """File-based streaming source over the driver parquet (one-batch replay;
    in production this is Kafka/Kinesis — the downstream plan is identical).
    Handles the same TIMESTAMP(NANOS) quirk as the batch catalog."""
    path = _table_path(sf_dir, table)
    ns_cols = _ns_timestamp_cols(path)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # streaming sources need an explicit schema: reuse the batch reader's
    # (inference is eager, so the LTZ scope can end before the stream starts)
    with ensure_ltz_timestamps(spark):
        schema = spark.read.parquet(path).schema
    if os.path.isdir(path):
        stream_dir, glob_filter = path, "*.parquet"
    else:
        stream_dir, glob_filter = os.path.dirname(path), os.path.basename(path)
    df = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", glob_filter)
        .parquet(stream_dir)
    )
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def tumbling_counts_stream(
    events: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """T1+T4: watermarked tumbling count by event_type (append-legal)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, duration), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_micros("window.start").alias("window_start_us"),
            F.unix_micros("window.end").alias("window_end_us"),
            "event_type",
            "n",
        )
    )


def sliding_counts_stream(
    events: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """T2+T4: watermarked sliding-window count by event_type — the live
    form of ``operators.windows.sliding_agg`` (each event lands in
    duration/slide overlapping windows; state per open window, evicted by
    the watermark)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, duration, slide), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_micros("window.start").alias("window_start_us"),
            F.unix_micros("window.end").alias("window_end_us"),
            "event_type",
            "n",
        )
    )


def session_counts_stream(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """T3+T4: native session_window aggregation with watermark state eviction."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_micros("session_window.start").alias("session_start_us"),
            F.unix_micros("session_window.end").alias("session_end_us"),
            "user_id",
            "n_events",
        )
    )


def dedup_stream(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """T5: stateful streaming dedup bounded by the watermark."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def running_totals_stream(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """T5 custom stateful operator via ``applyInPandasWithState``: per-key
    running (event_count, value_total) carried in explicit group state
    across micro-batches, emitting the updated totals for every key seen in
    a batch.

    This is the escape hatch for stateful logic Spark's built-ins can't
    express (per-key model state, custom eviction, cross-batch counters);
    state is a tuple per key, partitioned by the grouping key, so it scales
    horizontally like any keyed stream. With an ``availableNow`` one-batch
    replay the emitted rows equal the batch ``groupBy(key).agg`` — which is
    exactly the DuckDB oracle used for the workload entry.

    The UDF emits the UNROUNDED running total; rounding happens engine-side
    on the output column through the decimal-mediated pattern the rest of
    the workload uses (Python ``round`` is half-to-even while SQL ROUND is
    half-away-from-zero — rounding inside the state function would bake a
    cross-engine midpoint mismatch into the emitted state).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n_events": [n],
                "total_value": [total],
            }
        )

    out = events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} bigint, n_events bigint, total_value double",
        stateStructType="n bigint, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return out.withColumn(
        "total_value",
        F.round(F.col("total_value").cast("decimal(18,6)"), 2).cast("double"),
    )


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    within: str = "30 minutes",
    watermark: str = "10 minutes",
    right_key: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join with a time-range condition: right rows
    within ``[left_ts, left_ts + within]`` for the same key. Watermarks on
    BOTH sides plus the explicit time bound are what let Spark evict join
    state (without them, every row waits forever for future matches) — the
    canonical enrich-one-stream-with-another shape. With an availableNow
    one-batch replay the output equals the batch interval join, which is
    the DuckDB oracle of the workload entry.

    ``how="left_outer"`` adds watermark-gated NULL emission: an unmatched
    left row is released (with null right columns) only once the global
    watermark passes ``left_ts + within`` — i.e. once no future right row
    could still match it. The global watermark is the MIN over both
    sides' (max event time − delay), so with a bounded replay the emitted
    outer set is exactly the unmatched rows older than
    ``least(max_left_ts, max_right_ts) − delay − within`` — a batch-
    computable rule, which is what lets the left-outer workload entry
    carry a full oracle. Rows younger than that stay in state unemitted
    (on a real stream they would flush as the watermark advances)."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[right_key or key])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {within}"))
    )
    return lw.join(rw, cond, how)


def _log_stream_phase(q, label: str) -> None:
    """One-line drain profile to stderr (VERDICT r15 item 7): micro-batch
    count and total state rows, so a perf reading of a streaming query
    can split fixed micro-batch latency from state-store cost without
    re-instrumenting. stderr, never stdout — the bench contract tails
    stdout for one JSON line."""
    import sys

    try:
        prog = q.lastProgress
        if not prog:
            return
        state_rows = sum(
            int(s.get("numRowsTotal", 0) or 0)
            for s in prog.get("stateOperators", []) or []
        )
        print(
            f"[stream-phase] {label}: batches={int(prog.get('batchId', -1)) + 1}"
            f" state_rows={state_rows}",
            file=sys.stderr,
            flush=True,
        )
    except Exception:  # noqa: BLE001 — observability must never fail a drain
        pass


def run_to_memory(
    spark: SparkSession, stream_df: DataFrame, name: str, mode: str = "append"
) -> DataFrame:
    """Drive a (bounded) stream to completion into a memory sink and return
    the materialized result — the test/smoke harness for the wrappers."""
    with stream_shuffle_scope(spark):
        q = (
            stream_df.writeStream.outputMode(mode)
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    _log_stream_phase(q, name)
    return spark.sql(f"SELECT * FROM {name}")


def stream_to_parquet_refresh(
    spark: SparkSession, stream_df: DataFrame, path: str, checkpoint: str
) -> None:
    """foreachBatch file sink, full-refresh pattern: each micro-batch
    OVERWRITES the parquet output with the complete-mode aggregate state.
    Overwrite-per-batch is idempotent — a batch replayed after failure
    rewrites the same rows, so end-to-end exactly-once falls out without
    transactional sinks (the checkpoint tracks which batch is committed).
    This is the right sink shape for small hot aggregates (dashboards);
    for append-scale facts use append mode + partitioned writes instead."""

    def _write(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(path)

    with stream_shuffle_scope(spark):
        q = (
            stream_df.writeStream.outputMode("complete")
            .foreachBatch(_write)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    _log_stream_phase(q, "parquet_refresh")


def topk_values_tws_stream(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    id_col: str = "event_id",
    k: int = 3,
) -> DataFrame:
    """T5 via Spark 4's arbitrary-state API (``transformWithStateInPandas``
    + ``StatefulProcessor``): per-key top-``k`` values carried in a
    ListState across micro-batches, re-emitted (ranked) whenever the key
    sees new rows.

    This is the successor surface to ``applyInPandasWithState`` (which
    ``running_totals_stream`` above exercises): typed named state objects
    on a handle instead of one opaque tuple, per-state TTL, timers. State
    here is bounded at ``k`` rows per key — the merge keeps only the top
    ``k`` by ``(value DESC, id ASC)``, so a key that sees a billion events
    still stores three. Partitioned by the grouping key; scales like any
    keyed stream. Requires the RocksDB state store provider (the caller
    sets it — see the workload entry).

    With an availableNow one-batch replay the emitted rows equal the batch
    window ``row_number() <= k`` — the DuckDB oracle of the workload entry.
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class TopKProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            # one ListState row per retained (value, id) pair
            self._top = handle.getListState(
                "topk", f"{value_col} double, {id_col} bigint"
            )

        def handleInputRows(self, key, rows, timerValues):
            merged = [tuple(r) for r in self._top.get()]
            for pdf in rows:
                merged.extend(
                    zip(pdf[value_col].astype(float), pdf[id_col].astype(int))
                )
            # top-k by (value DESC, id ASC) — deterministic under ties
            merged.sort(key=lambda t: (-t[0], t[1]))
            merged = merged[:k]
            self._top.put(merged)
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(merged),
                    "rnk": range(1, len(merged) + 1),
                    value_col: [t[0] for t in merged],
                    id_col: [t[1] for t in merged],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy(key_col).transformWithStateInPandas(
        TopKProcessor(),
        outputStructType=(
            f"{key_col} bigint, rnk int, {value_col} double, {id_col} bigint"
        ),
        outputMode="append",
        timeMode="None",
    )


def has_transform_with_state() -> bool:
    """transformWithStateInPandas needs google.protobuf on the Python side
    (the state-server wire protocol); absent in some minimal images."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except Exception:
        return False


def topk_values_apply_stream(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    id_col: str = "event_id",
    k: int = 3,
) -> DataFrame:
    """Per-key top-``k`` with ``applyInPandasWithState`` — the same bounded
    per-key state as :func:`topk_values_tws_stream` on the older (protobuf-
    free) arbitrary-state API: state is the top-``k`` (value, id) pairs,
    merged with each batch's rows and re-emitted ranked. Used as the
    fallback where the transformWithState wire protocol's protobuf
    dependency is unavailable; semantics (and the workload oracle) are
    identical."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        # ids stay in their own bigint array — stuffing them into the
        # value's double array would corrupt ids above 2^53
        merged = (
            list(zip(state.get[0], state.get[1])) if state.exists else []
        )
        merged = [(float(v), int(i)) for v, i in merged]
        for pdf in pdfs:
            merged.extend(
                zip(pdf[value_col].astype(float), pdf[id_col].astype(int))
            )
        merged.sort(key=lambda t: (-t[0], t[1]))
        merged = merged[:k]
        state.update(([v for v, _ in merged], [i for _, i in merged]))
        yield pd.DataFrame(
            {
                key_col: [key[0]] * len(merged),
                "rnk": range(1, len(merged) + 1),
                value_col: [t[0] for t in merged],
                id_col: [t[1] for t in merged],
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=(
            f"{key_col} bigint, rnk int, {value_col} double, {id_col} bigint"
        ),
        stateStructType="vals array<double>, ids array<bigint>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def session_summaries_timeout_stream(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Sessionization with EVENT-TIME TIMEOUT (``GroupStateTimeout.
    EventTimeTimeout`` — the state surface ``running_totals_stream``'s
    NoTimeout variant doesn't touch): a session summary is emitted when
    the session CLOSES — either because a later in-batch event exceeded
    the gap, or because the watermark passed ``last_event + gap`` and the
    registered timer fired (the no-future-event proof). State per key is
    one open session tuple; closed sessions leave state immediately.

    Emission rule under a bounded replay (what the workload oracle
    encodes): every non-final session of a key emits, and the final one
    emits iff ``floor((end_us + gap)/1000) < floor(max_ts_us/1000) −
    delay_ms`` — the millisecond arithmetic because Spark tracks
    watermarks and timers in epoch millis even over microsecond data.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def update(key, pdfs, state: GroupState):
        cols = {
            key_col: [],
            "session_start_us": [],
            "session_end_us": [],
            "n_events": [],
        }

        def close(st, en, n):
            cols[key_col].append(key[0])
            cols["session_start_us"].append(st)
            cols["session_end_us"].append(en)
            cols["n_events"].append(n)

        if state.hasTimedOut:
            st, en, n = state.get
            state.remove()
            close(st, en, n)
            yield pd.DataFrame(cols)
            return

        us: list[int] = []
        for pdf in pdfs:
            us.extend(int(v) for v in pdf["__us"])
        us.sort()
        if state.exists:
            st, en, n = state.get
        else:
            st = en = None
            n = 0
        for t in us:
            if en is not None and t - en > gap_us:
                close(st, en, n)
                st, en, n = t, t, 1
            else:
                st = t if st is None else st
                en = t
                n += 1
        state.update((st, en, n))
        state.setTimeoutTimestamp((en + gap_us) // 1000)  # epoch millis
        yield pd.DataFrame(cols)

    inp = events.withWatermark(ts_col, watermark).select(
        key_col, F.col(ts_col), F.unix_micros(F.col(ts_col)).alias("__us")
    )
    return inp.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=(
            f"{key_col} bigint, session_start_us bigint, "
            f"session_end_us bigint, n_events bigint"
        ),
        stateStructType="st bigint, en bigint, n bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def chained_hourly_daily_stream(
    events: DataFrame,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Two CHAINED event-time window aggregations in one streaming query
    (multiple stateful operators, Spark 3.4+): an hourly tumbling count per
    event_type feeds a daily rollup that re-aggregates the finalized hourly
    windows — ``window(col("window"), "1 day")`` groups on the upstream
    window struct directly. The daily output also carries ``n_hours``, the
    number of distinct finalized hourly windows it merged, which is only
    observable if the intermediate hourly aggregation really ran.

    Emission composes: the hourly op finalizes windows whose end ≤ global
    watermark, the daily op finalizes days whose end ≤ the same watermark —
    and a finalized day implies all its hours were already finalized, so
    the chain needs no extra delay. State is bounded by (open hourly
    windows + open daily windows) per event_type, both evicted by the one
    global watermark. At 100 TB this is the streaming rollup-pyramid shape:
    fine-grain state stays small because it drains into the coarse grain
    instead of being re-scanned from the source.
    """
    hourly = (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        hourly.groupBy(F.window(F.col("window"), "1 day"), "event_type")
        .agg(F.sum("n").alias("n"), F.count(F.lit(1)).alias("n_hours"))
        .select(
            F.unix_micros("window.start").alias("day_start_us"),
            F.unix_micros("window.end").alias("day_end_us"),
            "event_type",
            "n",
            "n_hours",
        )
    )
