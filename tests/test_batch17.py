"""Round-5 batch-17: ETL pipeline composition, FIFO lot matching.

The FIFO test is the important one: the relational interval-intersection
formulation must equal a literal pop-from-queue simulation, user by user.
"""

from collections import deque

from pyspark.sql import functions as F

from adb_south_caucasus_etl_spark.workload import WORKLOAD

SF = "/root/testdata/sf0.001"


class TestFifoMatching:
    def test_matches_queue_simulation(self, spark):
        out = WORKLOAD["ledger_fifo_matching"].fn(spark, SF).collect()
        got = {
            (r["user_id"], r["buy_eid"], r["sell_eid"]): r["qty_matched"]
            for r in out
        }
        ev = spark.read.parquet(f"{SF}/events.parquet").select(
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("us"),
            F.greatest(F.round("value").cast("bigint"), F.lit(1)).alias("q"),
        )
        per_user = {}
        for r in ev.collect():
            per_user.setdefault(r["user_id"], []).append(
                (r["us"], r["event_id"], r["q"])
            )
        want = {}
        for uid, rows in per_user.items():
            rows.sort()
            buys = deque(
                (eid, q) for _, eid, q in rows if eid % 2 == 0
            )
            sells = [(eid, q) for _, eid, q in rows if eid % 2 == 1]
            inv = deque(buys)
            for seid, sq in sells:
                need = sq
                while need > 0 and inv:
                    beid, bq = inv[0]
                    take = min(bq, need)
                    want[(uid, beid, seid)] = take
                    need -= take
                    if take == bq:
                        inv.popleft()
                    else:
                        inv[0] = (beid, bq - take)
                # short portion (need > 0) matches nothing, by design
        assert got == want
        assert len(want) > 0

    def test_conservation_bounds(self, spark):
        out = WORKLOAD["ledger_fifo_matching"].fn(spark, SF)
        ev = spark.read.parquet(f"{SF}/events.parquet").select(
            F.col("event_id"),
            F.greatest(F.round("value").cast("bigint"), F.lit(1)).alias("q"),
        )
        per_buy = out.groupBy(F.col("buy_eid").alias("event_id")).agg(
            F.sum("qty_matched").alias("m")
        )
        j = per_buy.join(ev, "event_id")
        assert j.filter(F.col("m") > F.col("q")).count() == 0
        per_sell = out.groupBy(F.col("sell_eid").alias("event_id")).agg(
            F.sum("qty_matched").alias("m")
        )
        j2 = per_sell.join(ev, "event_id")
        assert j2.filter(F.col("m") > F.col("q")).count() == 0


class TestPipelineEndToEnd:
    def test_conservation_and_artifacts(self, spark):
        import glob

        from adb_south_caucasus_etl_spark.workload import _scratch_dir

        out = WORKLOAD["pipeline_end_to_end"].fn(spark, SF)
        tot = out.agg(
            F.sum("n_docs_kept").alias("k"), F.sum("n_dups_removed").alias("d")
        ).collect()[0]
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        n_valid = docs.filter(
            F.col("text").isNotNull() & (F.trim("text") != "")
        ).count()
        assert tot["k"] + tot["d"] == n_valid
        base = _scratch_dir("pipeline_e2e", SF)
        # the stage boundaries are real materialized tables
        assert glob.glob(f"{base}/norm/*.parquet")
        assert glob.glob(f"{base}/survivors/*.parquet")
