"""Validation of the watermark emission rules three oracle-matched
queries depend on (streaming_outer_join_live,
streaming_full_outer_join_live, streaming_session_timeout_live).

Two layers: seeded RANDOM event streams with microsecond jitter assert
the rules predict the streaming output exactly on arbitrary data, and
an adversarial fixture pins the exact boundary to the microsecond —
Spark floors watermarks to epoch milliseconds and the join-state
watermark carries an extra 1 ms buffer, so an outer row is released
iff ``ts + within + 1ms <= floor_ms(min side max) − delay`` (left) /
``ts + 1ms <= …`` (right), while event-time TIMERS fire on the plain
``floor_ms(timeout) < watermark_ms`` with no buffer. A Spark semantics
change or a bad generalization from the driver data fails here, not as
a silent oracle mismatch.
"""

from __future__ import annotations

import datetime
import random

from pyspark.sql import Window
from pyspark.sql import functions as F

DELAY_US = 10 * 60 * 1_000_000
WITHIN_US = 30 * 60 * 1_000_000
GAP_US = 30 * 60 * 1_000_000
BASE = datetime.datetime(2024, 3, 1)


def _write_events(spark, tmp_path, seed, n=300):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                BASE
                + datetime.timedelta(
                    seconds=rng.randint(0, 5 * 86400),
                    microseconds=rng.randint(0, 999_999),
                ),
                rng.randint(0, 6),
                rng.choice(["error", "purchase", "view"]),
                round(rng.uniform(0, 100), 2),
                "{}",
            )
        )
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    path = str(tmp_path / f"events_{seed}")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return path


def _stream(spark, path):
    schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(path)


def test_left_outer_emission_rule_random(spark, tmp_path):
    from adb_south_caucasus_etl_spark.streaming.wrappers import (
        interval_join_stream,
        run_to_memory,
    )

    for seed in (11, 29):
        path = _write_events(spark, tmp_path, seed)
        ev = _stream(spark, path)
        errs = ev.filter("event_type = 'error'").select(
            "user_id", F.col("ts").alias("err_ts"), F.col("event_id").alias("err_id")
        )
        buys = ev.filter("event_type = 'purchase'").select(
            F.col("user_id").alias("buyer_id"),
            F.col("ts").alias("buy_ts"),
            F.col("event_id").alias("buy_id"),
        )
        out = run_to_memory(
            spark,
            interval_join_stream(
                errs, buys, key="user_id", left_ts="err_ts", right_ts="buy_ts",
                within="30 minutes", watermark="10 minutes",
                right_key="buyer_id", how="left_outer",
            ),
            f"lo_rand_{seed}",
            mode="append",
        )
        got = {(r["err_id"], r["buy_id"]) for r in out.select("err_id", "buy_id").collect()}

        batch = spark.read.parquet(path)
        e = batch.filter("event_type='error'").select(
            F.col("user_id").alias("eu"), F.unix_micros("ts").alias("eus"),
            F.col("event_id").alias("err_id"),
        )
        p = batch.filter("event_type='purchase'").select(
            F.col("user_id").alias("pu"), F.unix_micros("ts").alias("pus"),
            F.col("event_id").alias("buy_id"),
        )
        jc = (
            (F.col("eu") == F.col("pu"))
            & (F.col("pus") >= F.col("eus"))
            & (F.col("pus") <= F.col("eus") + WITHIN_US)
        )
        lj = e.join(p, jc, "left_outer")
        sides = batch.filter("event_type in ('error','purchase')").groupBy(
            "event_type"
        ).agg(F.max(F.unix_micros("ts")).alias("mx"))
        # ms-floored watermark + Spark's extra 1 ms state-watermark buffer
        # (boundary pinned to the µs in test_outer_join_boundary_exact)
        wm_us = (min(r["mx"] for r in sides.collect()) // 1000 - 600_000) * 1000
        want = {
            (r["err_id"], r["buy_id"])
            for r in lj.filter(
                F.col("buy_id").isNotNull()
                | (F.col("eus") + WITHIN_US + 1000 <= F.lit(wm_us))
            ).collect()
        }
        assert got == want, f"seed {seed}: {len(got)} vs {len(want)}"


def test_session_timeout_emission_rule_random(spark, tmp_path):
    from adb_south_caucasus_etl_spark.streaming.wrappers import (
        run_to_memory,
        session_summaries_timeout_stream,
    )

    for seed in (7, 83):
        path = _write_events(spark, tmp_path, seed)
        out = run_to_memory(
            spark,
            session_summaries_timeout_stream(_stream(spark, path)),
            f"st_rand_{seed}",
            mode="append",
        )
        got = {tuple(r) for r in out.collect()}

        ev = spark.read.parquet(path).select(
            "user_id", F.unix_micros("ts").alias("us")
        )
        w = Window.partitionBy("user_id").orderBy("us")
        brk = F.when(
            F.lag("us").over(w).isNull()
            | (F.col("us") - F.lag("us").over(w) > GAP_US),
            1,
        ).otherwise(0)
        g = ev.withColumn("brk", brk).withColumn(
            "sid",
            F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        agg = g.groupBy("user_id", "sid").agg(
            F.min("us").alias("st"), F.max("us").alias("en"),
            F.count(F.lit(1)).alias("n"),
        )
        wm_ms = ev.agg(F.max("us")).collect()[0][0] // 1000 - 600_000
        last = agg.groupBy("user_id").agg(F.max("sid").alias("maxsid"))
        want = {
            (r["user_id"], r["st"], r["en"], r["n"])
            for r in agg.join(last, "user_id")
            .filter(
                (F.col("sid") < F.col("maxsid"))
                | (F.floor((F.col("en") + GAP_US) / 1000) < F.lit(wm_ms))
            )
            .collect()
        }
        assert got == want, f"seed {seed}: {len(got)} vs {len(want)}"


def test_outer_join_boundary_exact(spark, tmp_path):
    """Pin the eviction boundary to the microsecond: rows at exactly
    cutoff emit, 1 µs above do not — on both join sides."""
    from adb_south_caucasus_etl_spark.streaming.wrappers import (
        interval_join_stream,
        run_to_memory,
    )

    T = BASE + datetime.timedelta(days=1, microseconds=700)
    rows = [
        (9000, T, 999, "purchase", 0.0, "{}"),
        (9001, T, 998, "error", 0.0, "{}"),
    ]
    d40 = datetime.timedelta(minutes=40)
    d10 = datetime.timedelta(minutes=10)
    us = datetime.timedelta(microseconds=1)
    # left side: cutoff at delta=-1700 µs relative to T − 40 min
    rows += [
        (101, T - d40 - 1700 * us, 11, "error", 0.0, "{}"),   # emits
        (102, T - d40 - 1699 * us, 12, "error", 0.0, "{}"),   # held
        # right side: cutoff at delta=-1700 µs relative to T − 10 min
        (201, T - d10 - 1700 * us, 21, "purchase", 0.0, "{}"),  # emits
        (202, T - d10 - 1699 * us, 22, "purchase", 0.0, "{}"),  # held
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    path = str(tmp_path / "boundary")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    ev = _stream(spark, path)
    errs = ev.filter("event_type='error'").select(
        F.col("user_id").alias("err_user"),
        F.col("ts").alias("err_ts"),
        F.col("event_id").alias("err_id"),
    )
    buys = ev.filter("event_type='purchase'").select(
        F.col("user_id").alias("buy_user"),
        F.col("ts").alias("buy_ts"),
        F.col("event_id").alias("buy_id"),
    )
    out = run_to_memory(
        spark,
        interval_join_stream(
            errs, buys, key="err_user", left_ts="err_ts", right_ts="buy_ts",
            within="30 minutes", watermark="10 minutes",
            right_key="buy_user", how="full_outer",
        ),
        "boundary_exact",
        mode="append",
    )
    null_err = {r["err_id"] for r in out.filter("buy_id is null").collect()}
    null_buy = {r["buy_id"] for r in out.filter("err_id is null").collect()}
    assert 101 in null_err and 102 not in null_err, null_err
    assert 201 in null_buy and 202 not in null_buy, null_buy


def test_chained_agg_daily_emission_boundary(spark, tmp_path):
    """Chained hourly→daily aggregation: a daily window emits iff its end
    (epoch ms) <= floor_ms(max ts) - delay_ms — NON-strict at equality.
    Pinned with three fixtures: watermark exactly on the day end, 1 ms
    past it, and 1 ms short of it. Also asserts n_hours counts the
    distinct finalized hourly windows (the chain's intermediate grain)."""
    from adb_south_caucasus_etl_spark.streaming.wrappers import (
        chained_hourly_daily_stream,
        run_to_memory,
    )

    day = datetime.datetime(2024, 1, 2)
    cases = {
        # max ts = day end + 10 min → wm == day end exactly → emits
        "exact": (datetime.datetime(2024, 1, 3, 0, 10, 0), True),
        "past": (datetime.datetime(2024, 1, 3, 0, 10, 0, 1000), True),
        "short": (datetime.datetime(2024, 1, 3, 0, 9, 59, 999000), False),
    }
    for tag, (max_ts, emits) in cases.items():
        rows = [
            (1, day + datetime.timedelta(hours=5), "a"),
            (2, day + datetime.timedelta(hours=7), "a"),
            (3, max_ts, "a"),
        ]
        df = spark.createDataFrame(rows, "id long, ts timestamp, event_type string")
        path = str(tmp_path / f"chain_{tag}")
        df.coalesce(1).write.mode("overwrite").parquet(path)
        out = run_to_memory(
            spark,
            chained_hourly_daily_stream(_stream(spark, path), "ts", "10 minutes"),
            f"chain_{tag}",
            mode="append",
        ).collect()
        target = [r for r in out if r["day_start_us"] == int(day.replace(tzinfo=datetime.timezone.utc).timestamp()) * 1_000_000]
        if emits:
            assert len(target) == 1, (tag, out)
            assert target[0]["n"] == 2 and target[0]["n_hours"] == 2, (tag, target)
        else:
            assert not target, (tag, out)


def test_session_window_merges_at_exact_gap_boundary(spark):
    """Boundary semantics the oracle of streaming_session_live depends
    on: two events EXACTLY gap apart belong to ONE session (session_window
    extends whenever ts <= current_end = last_ts + gap), while the
    sessionization-SQL convention must therefore break only on
    STRICTLY > gap. The driver testdata's microsecond-random timestamps
    never land on the boundary, so only this synthetic probe pins the
    convention — a >= break in the oracle would green-stamp on testdata
    and still be wrong."""
    from pyspark.sql import functions as F

    rows = [
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:30:00"),  # exactly gap after the first
        (2, "2024-01-01 00:00:00"),
        (2, "2024-01-01 00:30:00.000001"),  # one microsecond past gap
    ]
    df = spark.createDataFrame(rows, "user_id int, ts string").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    out = sorted(
        (r.user_id, r.n, r.e - r.s)
        for r in (
            df.groupBy(F.session_window("ts", "30 minutes"), "user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                "user_id",
                F.unix_micros("session_window.start").alias("s"),
                F.unix_micros("session_window.end").alias("e"),
                "n",
            )
            .collect()  # bounded: 3 session rows from 4 synthetic events
        )
    )
    gap_us = 1_800_000_000
    # user 1: ONE merged session of 2 events spanning 2*gap;
    # user 2: TWO singleton sessions (a LIST, not a set — the two split
    # sessions are identical in (n, duration) and a set would collapse
    # them, hiding a merge bug)
    assert out == [
        (1, 2, 2 * gap_us),
        (2, 1, gap_us),
        (2, 1, gap_us),
    ], f"session_window boundary semantics changed: {out}"
