"""Round-5 batch-21: IVM delta rule, Pareto frontier, unknown member."""

from pyspark.sql import functions as F

from adb_south_caucasus_etl_spark.workload import WORKLOAD

SF = "/root/testdata/sf0.001"


class TestIvmDeltaRule:
    def test_maintained_view_has_zero_discrepancy(self, spark):
        row = WORKLOAD["ivm_join_delta_propagation"].fn(spark, SF).collect()[0]
        assert row["n_extra"] == 0 and row["n_missing"] == 0
        assert row["n_maintained"] == row["n_recomputed"]
        assert 0 < row["n_delta_rows"] < row["n_recomputed"]


class TestParetoFrontier:
    def test_frontier_is_exactly_the_undominated_set(self, spark):
        out = {
            (r["p_partkey"], r["price_cents"], r["size"])
            for r in WORKLOAD["pareto_frontier_parts"].fn(spark, SF).collect()
        }
        pts = [
            (r["k"], r["p"], r["s"])
            for r in spark.read.parquet(f"{SF}/part.parquet")
            .select(
                F.col("p_partkey").alias("k"),
                F.round(F.col("p_retailprice") * 100).cast("bigint").alias("p"),
                F.col("p_size").cast("bigint").alias("s"),
            )
            .collect()
        ]
        # brute-force: keep points not strictly dominated, with the
        # deterministic representative rule for exact duplicates
        # (smallest key per (price, size) frontier point)
        def beaten(k, p, s):
            for k2, p2, s2 in pts:
                if (p2, k2) < (p, k) and s2 >= s:
                    return True
            return False

        want = {(k, p, s) for k, p, s in pts if not beaten(k, p, s)}
        assert out == want and len(want) > 0


class TestUnknownMember:
    def test_totals_reconcile_and_orphans_visible(self, spark):
        out = WORKLOAD["dim_unknown_member_repair"].fn(spark, SF)
        tot = out.agg(
            F.sum("n_orders").alias("n"), F.sum("cents").alias("c")
        ).collect()[0]
        orders = spark.read.parquet(f"{SF}/orders.parquet")
        want_n = orders.count()
        want_c = orders.agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        ).collect()[0][0]
        assert (tot["n"], tot["c"]) == (want_n, want_c)
        unk = {r["segment"]: r for r in out.collect()}["UNKNOWN"]
        assert unk["n_unknown"] == unk["n_orders"] > 0
        # no orphans leak into real segments
        for seg, r in {r["segment"]: r for r in out.collect()}.items():
            if seg != "UNKNOWN":
                assert r["n_unknown"] == 0
