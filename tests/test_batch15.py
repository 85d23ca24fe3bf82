"""Round-5 batch-15 operators: DDL defaults, forecast backtest, interval
sweeps, point-in-polygon. Oracle stamps values; these pin rerun
idempotency and brute-force equivalence on the interval/geometry math.
"""

import random

from pyspark.sql import functions as F

from adb_south_caucasus_etl_spark.workload import WORKLOAD

SF = "/root/testdata/sf0.001"


class TestDdlDefaults:
    def test_rerun_is_idempotent(self, spark):
        a = sorted(
            r.asDict().items() if False else tuple(r)
            for r in WORKLOAD["sql_ddl_defaults"].fn(spark, SF).collect()
        )
        b = sorted(
            tuple(r) for r in WORKLOAD["sql_ddl_defaults"].fn(spark, SF).collect()
        )
        assert a == b and len(a) == 4  # INSERT INTO would double to 8


class TestPeakConcurrency:
    def test_matches_brute_force(self, spark):
        rows = WORKLOAD["events_peak_concurrency"].fn(spark, SF).collect()
        ev = spark.read.parquet(f"{SF}/events.parquet")
        iv = [
            (r["t"], r["t"] + 900_000_000)
            for r in ev.select(F.unix_micros("ts").alias("t")).collect()
        ]
        # brute force: concurrency evaluated at every boundary instant
        # (half-open [s, e)), max per day of the boundary
        bounds = sorted({t for s, e in iv for t in (s, e)})
        per_day = {}
        for t in bounds:
            c = sum(1 for s, e in iv if s <= t < e)
            d = t // 86_400_000_000
            per_day[d] = max(per_day.get(d, 0), c)
        got = {r["day_idx"]: r["peak_concurrency"] for r in rows}
        assert got == per_day

    def test_interval_coverage_matches_merge(self, spark):
        rows = WORKLOAD["events_interval_coverage"].fn(spark, SF).collect()
        ev = spark.read.parquet(f"{SF}/events.parquet")
        iv = {}
        for r in ev.select("user_id", F.unix_micros("ts").alias("t")).collect():
            iv.setdefault(r["user_id"], []).append(
                (r["t"], r["t"] + 900_000_000)
            )
        for r in rows:
            spans = sorted(iv[r["user_id"]])
            covered, cur_s, cur_e = 0, None, None
            for s, e in spans:
                if cur_e is None or s > cur_e:
                    if cur_e is not None:
                        covered += cur_e - cur_s
                    cur_s, cur_e = s, e
                else:
                    cur_e = max(cur_e, e)
            covered += cur_e - cur_s
            assert r["covered_us"] == covered
            assert r["n_intervals"] == len(spans)


def _ray_cast(px, py, poly):
    k = 0
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        if (y1 <= py) != (y2 <= py):
            cross = (x2 - x1) * (py - y1) - (px - x1) * (y2 - y1)
            if cross * (1 if y2 > y1 else -1) > 0:
                k += 1
    return k % 2 == 1


class TestPointInPolygon:
    POLY = [
        (2_000_000, 1_000_000),
        (8_000_000, 3_000_000),
        (6_000_000, 9_000_000),
        (1_000_000, 6_000_000),
    ]

    def test_matches_independent_raycast(self, spark):
        from adb_south_caucasus_etl_spark.operators.curation import md5_u32

        out = {
            r["id"]: r["inside"]
            for r in WORKLOAD["geo_point_in_polygon"].fn(spark, SF).collect()
        }
        cust = spark.read.parquet(f"{SF}/customer.parquet")
        ks = F.col("c_custkey").cast("string")
        pts = cust.select(
            F.col("c_custkey").alias("id"),
            (md5_u32(F.concat(F.lit("cx:"), ks)) % 10_000_000).alias("px"),
            (md5_u32(F.concat(F.lit("cy:"), ks)) % 10_000_000).alias("py"),
        ).collect()
        n_inside = 0
        for p in pts:
            want = _ray_cast(p["px"], p["py"], self.POLY)
            assert out[p["id"]] == want
            n_inside += want
        # the polygon covers a large chunk of the box: both classes occur
        assert 0 < n_inside < len(pts)

    def test_known_points(self):
        assert _ray_cast(4_000_000, 5_000_000, self.POLY)  # centroid-ish
        assert not _ray_cast(0, 0, self.POLY)
        assert not _ray_cast(9_999_999, 9_999_999, self.POLY)


class TestSeasonalNaive:
    def test_errors_recompute_from_daily_truth(self, spark):
        out = WORKLOAD["forecast_seasonal_naive_eval"].fn(spark, SF).collect()
        ev = spark.read.parquet(f"{SF}/events.parquet")
        daily = {
            r["d"]: r["c"]
            for r in ev.filter(F.col("event_type") == "purchase")
            .groupBy(
                F.datediff(
                    F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
                ).alias("d")
            )
            .agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("c"))
            .collect()
        }
        assert len(out) > 0
        for r in out:
            assert r["actual_cents"] == daily[r["day_idx"]]
            assert r["forecast_cents"] == daily[r["day_idx"] - 7]
            assert r["abs_err_cents"] == abs(
                r["actual_cents"] - r["forecast_cents"]
            )
