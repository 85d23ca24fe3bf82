"""Round-5 batch-13 operators: resampling statistics, ledger folds,
attribution, quantile normalization, growth accounting, hard negatives.

Value correctness is oracle-stamped; these tests pin the operators'
declared invariants (reconciliation identities, clamp bounds, label
constraints) and the determinism the derandomized designs promise.
"""

import pytest
from pyspark.sql import functions as F

from adb_south_caucasus_etl_spark.workload import WORKLOAD

SF = "/root/testdata/sf0.001"


class TestBootstrapCI:
    def test_ci_brackets_mean_and_is_ordered(self, spark):
        row = WORKLOAD["stats_bootstrap_ci"].fn(spark, SF).collect()[0]
        assert row["n"] > 0 and row["b_resamples"] == 50
        assert row["ci_lo_milli"] <= row["ci_hi_milli"]
        # at n=150 the 95% CI half-width is far under the data range;
        # the point estimate must fall inside
        assert row["ci_lo_milli"] <= row["mean_milli"] <= row["ci_hi_milli"]

    def test_deterministic_under_shuffle_partitions(self, spark):
        a = WORKLOAD["stats_bootstrap_ci"].fn(spark, SF).collect()[0]
        old = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "7")
            b = WORKLOAD["stats_bootstrap_ci"].fn(spark, SF).collect()[0]
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)
        assert a.asDict() == b.asDict()


class TestClampedBalance:
    def test_balance_never_negative_and_covers_all_users(self, spark):
        rows = WORKLOAD["events_clamped_balance_fold"].fn(spark, SF).collect()
        assert len(rows) > 0
        assert all(r["final_balance"] >= 0.0 for r in rows)


class TestAttribution:
    def test_credit_reconciles_to_purchase_cents(self, spark):
        out = WORKLOAD["attribution_linear_credit"].fn(spark, SF)
        per_purchase = out.groupBy("pid").agg(
            F.sum("credit_cents").alias("s"), F.count("*").alias("k")
        )
        ev = spark.read.parquet(f"{SF}/events.parquet")
        truth = ev.filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("pid"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        j = per_purchase.join(truth, "pid")
        assert j.count() > 0
        assert j.filter(F.col("s") != F.col("cents")).count() == 0

    def test_no_touch_after_purchase(self, spark):
        out = WORKLOAD["attribution_linear_credit"].fn(spark, SF)
        ev = spark.read.parquet(f"{SF}/events.parquet")
        touches = ev.select(F.col("event_id").alias("tid"), F.col("ts").alias("tts"))
        purch = ev.select(F.col("event_id").alias("pid"), F.col("ts").alias("pts"))
        j = out.join(touches, "tid").join(purch, "pid")
        assert j.filter(F.col("tts") >= F.col("pts")).count() == 0


class TestQuantileNormalize:
    def test_segments_share_distribution_up_to_min_size(self, spark):
        out = WORKLOAD["stats_quantile_normalize"].fn(spark, SF)
        sizes = out.groupBy("segment").count().collect()
        min_size = min(r["count"] for r in sizes)
        # within the shared rank range, every segment maps rank -> the
        # SAME normalized value (that's the whole point of the method)
        shared = out.filter(F.col("rnk") <= min_size)
        per_rank = shared.groupBy("rnk").agg(
            F.countDistinct("norm_milli").alias("nv"),
            F.count("*").alias("nseg"),
        )
        bad = per_rank.filter(F.col("nv") != 1).count()
        assert bad == 0
        assert per_rank.filter(F.col("nseg") != len(sizes)).count() == 0


class TestChi2Independence:
    def test_marginals_reconstruct(self, spark):
        out = WORKLOAD["dq_chi2_independence"].fn(spark, SF)
        n = out.agg(F.sum("obs")).collect()[0][0]
        cust = spark.read.parquet(f"{SF}/customer.parquet")
        assert n == cust.count()
        # dev_xn must be exactly obs*N - row*col recomputed from obs
        rows_t = out.groupBy("nationkey").agg(F.sum("obs").alias("rt"))
        cols_t = out.groupBy("segment").agg(F.sum("obs").alias("ct"))
        j = (
            out.join(rows_t, "nationkey")
            .join(cols_t, "segment")
            .withColumn("want", F.col("obs") * F.lit(n) - F.col("rt") * F.col("ct"))
        )
        assert j.filter(F.col("dev_xn") != F.col("want")).count() == 0


class TestHardNegatives:
    def test_all_negatives_cross_label(self, spark):
        out = WORKLOAD["curation_hard_negatives"].fn(spark, SF)
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        lab = emb.select(
            F.col("vec_id").alias("query_id"), F.col("label").alias("qlab")
        )
        nlab = emb.select(
            F.col("vec_id").alias("neighbor_id"), F.col("label").alias("nlab")
        )
        j = out.join(lab, "query_id").join(nlab, "neighbor_id")
        assert j.count() == out.count()
        assert j.filter(F.col("qlab") == F.col("nlab")).count() == 0

    def test_three_per_query_ranked(self, spark):
        rows = WORKLOAD["curation_hard_negatives"].fn(spark, SF).collect()
        per_q = {}
        for r in rows:
            per_q.setdefault(r["query_id"], []).append(r["rank"])
        assert all(sorted(v) == [1, 2, 3] for v in per_q.values())


class TestGrowthAccounting:
    def test_activity_identity_and_conservation(self, spark):
        rows = WORKLOAD["growth_accounting_daily"].fn(spark, SF).collect()
        assert len(rows) > 0
        for r in rows:
            assert (
                r["n_active"]
                == r["n_new"] + r["n_retained"] + r["n_resurrected"]
            )
        # every user is new exactly once
        ev = spark.read.parquet(f"{SF}/events.parquet")
        n_users = ev.select("user_id").distinct().count()
        assert sum(r["n_new"] for r in rows) == n_users
        # flow conservation: actives today = actives yesterday - churned
        # + new + resurrected (retained = yesterday's survivors)
        by_day = {r["day_idx"]: r for r in rows}
        for d, r in by_day.items():
            prev = by_day.get(d - 1)
            if prev is not None:
                assert r["n_retained"] == prev["n_active"] - r["n_churned"]
