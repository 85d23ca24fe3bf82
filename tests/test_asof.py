import datetime as dt

import pytest

from pyspark.sql import functions as F

from adb_south_caucasus_etl_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def quotes_trades(spark):
    trades = spark.createDataFrame(
        [
            (1, "A", _ts("2024-01-01T10:00:00")),
            (2, "A", _ts("2024-01-01T10:05:00")),
            (3, "B", _ts("2024-01-01T10:01:00")),
            (4, "C", _ts("2024-01-01T10:00:00")),  # no quotes at all
        ],
        "trade_id long, sym string, ts timestamp",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01T09:59:00"), 10.0),
            ("A", _ts("2024-01-01T10:05:00"), 11.0),  # exact tie with trade 2
            ("A", _ts("2024-01-01T10:30:00"), 12.0),
            ("B", _ts("2024-01-01T10:02:00"), 20.0),  # only after trade 3
        ],
        "sym string, ts timestamp, px double",
    )
    return trades, quotes


def test_asof_backward(spark, quotes_trades):
    trades, quotes = quotes_trades
    out = {
        r["trade_id"]: r["px"]
        for r in asof_join(trades, quotes, on="sym", left_ts="ts").collect()
    }
    assert out == {1: 10.0, 2: 11.0, 3: None, 4: None}  # tie at 10:05 matches


def test_asof_forward(spark, quotes_trades):
    trades, quotes = quotes_trades
    out = {
        r["trade_id"]: r["px"]
        for r in asof_join(
            trades, quotes, on="sym", left_ts="ts", direction="forward"
        ).collect()
    }
    # trade 1 at 10:00 → earliest quote at-or-after is 10:05 (px 11.0)
    assert out == {1: 11.0, 2: 11.0, 3: 20.0, 4: None}


def test_asof_column_collision_raises(spark, quotes_trades):
    trades, quotes = quotes_trades
    with pytest.raises(ValueError, match="collide"):
        asof_join(trades, quotes.withColumnRenamed("px", "trade_id"),
                  on="sym", left_ts="ts")


def test_asof_bad_direction(spark, quotes_trades):
    trades, quotes = quotes_trades
    with pytest.raises(ValueError, match="backward|forward"):
        asof_join(trades, quotes, on="sym", left_ts="ts", direction="sideways")


def test_asof_nearest(spark, quotes_trades):
    trades, quotes = quotes_trades
    rows = asof_join(
        trades, quotes, on="sym", left_ts="ts", direction="nearest"
    ).collect()
    out = {r["trade_id"]: (r["px"], r["__asof_dir"]) for r in rows}
    # trade 1 at 10:00: backward 09:59 (1 min) beats forward 10:05 (5 min)
    # trade 2 at 10:05: exact match, gap 0 both ways -> backward wins tie
    # trade 3 at 10:01: only forward candidate exists (10:02)
    # trade 4: no quotes at all -> null payload, null direction
    assert out == {
        1: (10.0, "backward"),
        2: (11.0, "backward"),
        3: (20.0, "forward"),
        4: (None, None),
    }


def test_asof_nearest_tie_prefers_backward(spark):
    left = spark.createDataFrame(
        [(1, "A", _ts("2024-01-01T10:10:00"))],
        "id long, sym string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01T10:00:00"), 1.0),  # 10 min before
            ("A", _ts("2024-01-01T10:20:00"), 2.0),  # 10 min after
        ],
        "sym string, ts timestamp, px double",
    )
    [r] = asof_join(
        left, right, on="sym", left_ts="ts", direction="nearest"
    ).collect()
    assert (r["px"], r["__asof_dir"]) == (1.0, "backward")


def test_asof_backward_tolerance(spark, quotes_trades):
    trades, quotes = quotes_trades
    out = {
        r["trade_id"]: r["px"]
        for r in asof_join(
            trades, quotes, on="sym", left_ts="ts", tolerance_s=90.0
        ).collect()
    }
    # trade 1 at 10:00: backward quote 09:59 is 60s away -> in tolerance
    # trade 2 at 10:05: exact match, 0s -> kept
    # trades 3, 4: no backward quote at all -> null
    assert out == {1: 10.0, 2: 11.0, 3: None, 4: None}
    strict = {
        r["trade_id"]: r["px"]
        for r in asof_join(
            trades, quotes, on="sym", left_ts="ts", tolerance_s=30.0
        ).collect()
    }
    # 60s gap now exceeds the 30s bound
    assert strict == {1: None, 2: 11.0, 3: None, 4: None}


def test_asof_nearest_tolerance_rejects_far_side(spark):
    left = spark.createDataFrame(
        [(1, "A", _ts("2024-01-01T10:10:00"))],
        "id long, sym string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01T10:00:00"), 1.0),  # 10 min before
            ("A", _ts("2024-01-01T10:13:00"), 2.0),  # 3 min after
        ],
        "sym string, ts timestamp, px double",
    )
    # tolerance 5 min: backward (10 min) is out, forward (3 min) wins
    [r] = asof_join(
        left, right, on="sym", left_ts="ts",
        direction="nearest", tolerance_s=300.0,
    ).collect()
    assert (r["px"], r["__asof_dir"]) == (2.0, "forward")
    # tolerance 1 min: both out -> null payload, null direction
    [r2] = asof_join(
        left, right, on="sym", left_ts="ts",
        direction="nearest", tolerance_s=60.0,
    ).collect()
    assert (r2["px"], r2["__asof_dir"]) == (None, None)


def test_asof_null_payload_in_matched_row_stays_null(spark):
    """The matched right row's values must be taken ATOMICALLY: when the
    nearest/backward match carries NULL in a payload column, the result is
    NULL — a staler row's non-null value must not bleed through (the
    pre-r06 per-column last(ignorenulls) did exactly that, and under
    tolerance it validated the wrong row's distance)."""
    left = spark.createDataFrame(
        [(1, "A", _ts("2024-01-01T10:10:00"))],
        "id long, sym string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01T09:00:00"), 1.0, "stale"),
            ("A", _ts("2024-01-01T10:09:00"), None, "fresh"),
        ],
        "sym string, ts timestamp, px double, tag string",
    )
    for direction in ("backward", "nearest"):
        [r] = asof_join(
            left, right, on="sym", left_ts="ts", direction=direction
        ).collect()
        assert r["tag"] == "fresh", (direction, r)
        assert r["px"] is None, (direction, r)
    # tolerance must measure the MATCHED row's distance (1 min, in
    # bounds), not fall back to the stale row 70 min away
    [r] = asof_join(
        left, right, on="sym", left_ts="ts",
        direction="backward", tolerance_s=120.0,
    ).collect()
    assert (r["tag"], r["px"]) == ("fresh", None)


def test_asof_timestamp_ntz_tolerance_and_nearest(spark):
    """TIMESTAMP_NTZ inputs work through tolerance and nearest: the gap
    math casts through TIMESTAMP (exact for NTZ under the fixed UTC
    session zone), and the struct-packed payload needs no hand-built
    typed sentinel — the pre-r06 code hard-cast a 'timestamp' NULL
    sentinel and broke unionByName type resolution for NTZ."""
    left = spark.createDataFrame(
        [(1, "A", "2024-01-01T10:10:00")],
        "id long, sym string, ts_s string",
    ).select("id", "sym", F.col("ts_s").cast("timestamp_ntz").alias("ts"))
    right = spark.createDataFrame(
        [
            ("A", "2024-01-01T10:00:00", 1.0),
            ("A", "2024-01-01T10:13:00", 2.0),
        ],
        "sym string, ts_s string, px double",
    ).select(
        "sym", F.col("ts_s").cast("timestamp_ntz").alias("ts"), "px"
    )
    [r] = asof_join(
        left, right, on="sym", left_ts="ts",
        direction="nearest", tolerance_s=300.0,
    ).collect()
    assert (r["px"], r["__asof_dir"]) == (2.0, "forward")
    [r2] = asof_join(
        left, right, on="sym", left_ts="ts",
        direction="backward", tolerance_s=3600.0,
    ).collect()
    assert r2["px"] == 1.0


@pytest.mark.parametrize("ts_type", ["timestamp", "timestamp_ntz"])
@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_direction_matrix_both_timestamp_types(spark, ts_type, direction):
    """Full direction × timestamp-type matrix (r6 verdict item 7): the
    plain backward/forward paths must give the same matches for
    TIMESTAMP and TIMESTAMP_NTZ inputs carrying the same wall-clock
    values — the union-tag window compares the ts column natively, no
    tz-sensitive cast is involved until a tolerance is requested."""
    def mk(df, cols):
        return df.select(
            *[F.col(c).cast(ts_type).alias(c) if c == "ts" else F.col(c)
              for c in cols]
        )

    left = mk(
        spark.createDataFrame(
            [
                (1, "A", "2024-01-01T10:10:00"),
                (2, "A", "2024-01-01T09:00:00"),
                (3, "B", "2024-01-01T12:00:00"),
            ],
            "id long, sym string, ts string",
        ),
        ["id", "sym", "ts"],
    )
    right = mk(
        spark.createDataFrame(
            [
                ("A", "2024-01-01T10:00:00", 1.0),
                ("A", "2024-01-01T10:13:00", 2.0),
                ("B", "2024-01-01T11:00:00", 3.0),
            ],
            "sym string, ts string, px double",
        ),
        ["sym", "ts", "px"],
    )
    rows = {
        r["id"]: r["px"]
        for r in asof_join(
            left, right, on="sym", left_ts="ts", direction=direction
        ).collect()
    }
    expected = {
        "backward": {1: 1.0, 2: None, 3: 3.0},
        "forward": {1: 2.0, 2: 1.0, 3: None},
        "nearest": {1: 2.0, 2: 1.0, 3: 3.0},
    }[direction]
    assert rows == expected


@pytest.mark.parametrize("ts_type", ["timestamp", "timestamp_ntz"])
def test_time_range_frame_both_timestamp_types(spark, ts_type):
    """The time-RANGE frame spelling (rangeBetween over unix_micros, the
    window_time_range_frame pattern) must produce identical rolling sums
    for TIMESTAMP and TIMESTAMP_NTZ inputs of the same wall-clock values
    (NTZ goes through the cast-through-timestamp, exact under the pinned
    UTC session zone)."""
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [
            (1, "2024-01-01T00:00:00", 10.0),
            (1, "2024-01-02T23:59:59", 20.0),
            (1, "2024-01-04T00:00:01", 40.0),  # 3d window drops row 1
            (2, "2024-01-01T00:00:00", 5.0),
        ],
        "user_id long, ts_s string, value double",
    ).select(
        "user_id", F.col("ts_s").cast(ts_type).alias("ts"), "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-259_200_000_000, 0)
    )
    rows = sorted(
        (r["user_id"], r["roll"])
        for r in df.select(
            "user_id", F.sum("value").over(w).alias("roll")
        ).collect()
    )
    assert rows == [(1, 10.0), (1, 30.0), (1, 60.0), (2, 5.0)]
