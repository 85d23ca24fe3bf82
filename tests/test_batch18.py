"""Round-5 batch-18: format federation, bitmap retention, RI audit.

The bitmap test is the valuable one: two completely different plans
(bitwise algebra vs lag-window growth accounting) must agree on total
retained user-days.
"""

from pyspark.sql import functions as F

from adb_south_caucasus_etl_spark.workload import WORKLOAD

SF = "/root/testdata/sf0.001"


class TestDayBitmask:
    def test_consecutive_pairs_equal_growth_accounting_retained(self, spark):
        masks = WORKLOAD["events_day_bitmask_retention"].fn(spark, SF)
        pairs_total = masks.agg(F.sum("n_consecutive_pairs")).collect()[0][0]
        growth = WORKLOAD["growth_accounting_daily"].fn(spark, SF)
        retained_total = growth.agg(F.sum("n_retained")).collect()[0][0]
        assert pairs_total == retained_total

    def test_active_days_match_distinct_user_days(self, spark):
        masks = WORKLOAD["events_day_bitmask_retention"].fn(spark, SF)
        total_bits = masks.agg(F.sum("n_active_days")).collect()[0][0]
        ev = spark.read.parquet(f"{SF}/events.parquet")
        n_user_days = (
            ev.select("user_id", F.col("ts").cast("date").alias("d"))
            .distinct()
            .count()
        )
        assert total_bits == n_user_days


class TestReferentialIntegrity:
    def test_clean_data_has_zero_orphans(self, spark):
        row = WORKLOAD["dq_referential_integrity"].fn(spark, SF).collect()[0]
        # generator guarantees FK closure: orphan counts MUST be zero
        assert row["orphan_lineitems"] == 0
        assert row["orphan_orders"] == 0
        # reverse direction (unreferenced dims) is data-dependent but bounded
        assert 0 <= row["customers_inactive"]
        assert 0 <= row["parts_never_sold"]

    def test_detects_planted_orphan(self, spark):
        # plant one orphan lineitem and rerun the anti-join count logic
        li = spark.read.parquet(f"{SF}/lineitem.parquet").limit(1).select(
            F.lit(-999999).alias("l_orderkey")
        )
        orders = spark.read.parquet(f"{SF}/orders.parquet")
        n = (
            li.join(
                orders, li["l_orderkey"] == orders["o_orderkey"], "left_anti"
            ).count()
        )
        assert n == 1


class TestFederatedFormats:
    def test_totals_match_native_parquet(self, spark):
        out = WORKLOAD["source_federated_formats"].fn(spark, SF)
        tot = out.agg(
            F.sum("n_customers").alias("c"), F.sum("n_suppliers").alias("s")
        ).collect()[0]
        cust = spark.read.parquet(f"{SF}/customer.parquet").count()
        supp = spark.read.parquet(f"{SF}/supplier.parquet").count()
        assert (tot["c"], tot["s"]) == (cust, supp)
