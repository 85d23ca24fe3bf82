"""Round-2 curation/rollup operator tests: decontamination, sharding,
PII scrubbing, materialized-rollup fold correctness, grouped-agg UDAF."""

from __future__ import annotations

import math
import tempfile

import pytest
from pyspark.sql import functions as F

from adb_south_caucasus_etl_spark.functions.text import pii_counts, pii_redact
from adb_south_caucasus_etl_spark.operators.curation import (
    assign_shards,
    decontaminate,
)
from adb_south_caucasus_etl_spark.plans.cube import CubeQuery, compile_query
from adb_south_caucasus_etl_spark.plans.rollup import (
    materialize_rollup,
    rollup_drilldown,
)


def test_decontaminate_flags_overlapping_doc(spark):
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta"),  # contains test 5-gram
            (2, "one two three four five six seven eight"),  # disjoint
        ],
        "doc_id long, text string",
    )
    test = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in decontaminate(train, test, n=5, threshold=0.1).collect()
    }
    # doc 1 has 3 distinct 5-grams, exactly one equals the test doc's single
    assert rows[1]["n_grams"] == 3 and rows[1]["n_hits"] == 1
    assert rows[1]["contaminated"] is True
    assert rows[2]["n_hits"] == 0 and rows[2]["contaminated"] is False


def test_assign_shards_stable_and_bounded(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    a = assign_shards(df, "k", n_shards=8).orderBy("k").collect()
    # same rows, different physical partitioning → identical shards
    b = (
        assign_shards(df.repartition(13), "k", n_shards=8)
        .orderBy("k")
        .collect()
    )
    assert [r["shard"] for r in a] == [r["shard"] for r in b]
    shards = {r["shard"] for r in a}
    assert shards <= set(range(8)) and len(shards) == 8


def test_pii_redact_and_counts(spark):
    df = spark.createDataFrame(
        [(1, "mail me at jo.doe@example.com or call 555-123-4567 now")],
        "id long, t string",
    )
    counts = pii_counts("t")
    row = df.select(
        counts["email"], counts["phone"], pii_redact("t").alias("clean")
    ).first()
    assert row["n_email"] == 1 and row["n_phone"] == 1
    assert "@" not in row["clean"] and "555" not in row["clean"]
    assert row["clean"].count("[PII]") == 2


def test_rollup_serve_matches_direct_query(spark, sf_dir):
    fine = CubeQuery(
        cube="lineitem",
        drilldowns=("Region", "Nation", "Year"),
        measures=("Revenue", "Line Count", "Avg Discount"),
    )
    out = tempfile.mkdtemp(prefix="rollup_test_")
    materialize_rollup(spark, sf_dir, fine, out)
    served = {
        (r["region"], r["year"]): r
        for r in rollup_drilldown(
            spark, out, ["Region", "Year"], ["Revenue", "Line Count", "Avg Discount"]
        ).collect()
    }
    direct = {
        (r["region"], r["year"]): r
        for r in compile_query(
            spark,
            sf_dir,
            CubeQuery(
                cube="lineitem",
                drilldowns=("Region", "Year"),
                measures=("Revenue", "Line Count", "Avg Discount"),
            ),
        ).collect()
    }
    assert served.keys() == direct.keys()
    for k, s in served.items():
        d = direct[k]
        assert s["line_count"] == d["line_count"]
        assert math.isclose(s["revenue"], d["revenue"], rel_tol=1e-9)
        # the algebraic fold: avg recomposed from sum+count, never avg-of-avgs
        assert math.isclose(s["avg_discount"], d["avg_discount"], rel_tol=1e-9)


def test_rollup_rejects_holistic_measure(spark, sf_dir):
    q = CubeQuery(
        cube="lineitem",
        drilldowns=("Region",),
        measures=("Order Count",),  # count_distinct: not foldable
    )
    with pytest.raises(ValueError, match="holistic"):
        materialize_rollup(spark, sf_dir, q, tempfile.mkdtemp(prefix="rt_"))


def test_geometric_mean_udaf(spark):
    # imported lazily: a GROUPED_AGG pandas_udf parses its return type at
    # import, which needs an active session
    from adb_south_caucasus_etl_spark.functions.vectors import geometric_mean

    df = spark.createDataFrame(
        [("a", 2.0), ("a", 8.0), ("b", 5.0)], "g string, x double"
    )
    rows = {
        r["g"]: r["gm"]
        for r in df.groupBy("g").agg(geometric_mean("x").alias("gm")).collect()
    }
    assert math.isclose(rows["a"], 4.0, rel_tol=1e-12)
    assert math.isclose(rows["b"], 5.0, rel_tol=1e-12)


def test_rollup_hll_estimate_within_5pct(spark, sf_dir):
    out = tempfile.mkdtemp(prefix="hll_test_")
    fine = CubeQuery(
        cube="lineitem",
        drilldowns=("Region", "Nation", "Year"),
        measures=("Order Count",),
    )
    materialize_rollup(spark, sf_dir, fine, out, sketch_distinct=True)
    est = {
        (r["region"], r["year"]): r["order_count"]
        for r in rollup_drilldown(
            spark, out, ["Region", "Year"], ["Order Count"]
        ).collect()
    }
    exact = {
        (r["region"], r["year"]): r["order_count"]
        for r in compile_query(
            spark,
            sf_dir,
            CubeQuery(
                cube="lineitem",
                drilldowns=("Region", "Year"),
                measures=("Order Count",),
            ),
        ).collect()
    }
    assert est.keys() == exact.keys()
    for k, e in exact.items():
        assert abs(est[k] - e) <= max(1, 0.05 * e), (k, est[k], e)


def test_refresh_rollup_overwrites_only_named_partition(spark, sf_dir):
    from adb_south_caucasus_etl_spark.plans.rollup import (
        refresh_rollup_partitions,
    )

    out = tempfile.mkdtemp(prefix="refresh_test_")
    fine = CubeQuery(
        cube="lineitem",
        drilldowns=("Region", "Year"),
        measures=("Line Count",),
    )
    materialize_rollup(spark, sf_dir, fine, out, partition_by=["year"])
    # corrupt one partition's counts by rewriting it with zeros, then refresh
    spark.read.parquet(out).createOrReplaceTempView("rt_before")
    years = [r["year"] for r in spark.sql("SELECT DISTINCT year FROM rt_before").collect()]
    target = years[0]
    corrupt = (
        spark.read.parquet(out)
        .filter(F.col("year") == target)
        .withColumn("line_count__count", F.lit(0).cast("long"))
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        corrupt.write.mode("overwrite").partitionBy("year").parquet(out)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    assert (
        spark.read.parquet(out)
        .filter((F.col("year") == target) & (F.col("line_count__count") > 0))
        .count()
        == 0
    )
    # the dynamic refresh must repair exactly that partition
    refresh_rollup_partitions(spark, sf_dir, fine, out, "year", [target])
    served = {
        (r["region"], r["year"]): r["line_count"]
        for r in rollup_drilldown(
            spark, out, ["Region", "Year"], ["Line Count"]
        ).collect()
    }
    direct = {
        (r["region"], r["year"]): r["line_count"]
        for r in compile_query(spark, sf_dir, fine).collect()
    }
    assert served == direct


def test_percentile_approx_close_to_exact(spark):
    from adb_south_caucasus_etl_spark.sources.registry import Catalog
    from adb_south_caucasus_etl_spark.workload import WORKLOAD

    sf = "/root/testdata/sf0.01"
    approx = {
        r["o_orderpriority"]: (r["p50"], r["p90"], r["p99"])
        for r in WORKLOAD["agg_percentile_approx"].fn(spark, sf).collect()
    }
    exact = {
        r["o_orderpriority"]: r["pctl"]
        for r in Catalog(spark, sf)
        .orders.groupBy("o_orderpriority")
        .agg(F.percentile("o_totalprice", F.lit([0.5, 0.9, 0.99])).alias("pctl"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for k, ex in exact.items():
        for a, e in zip(approx[k], ex):
            assert abs(a - e) <= 0.02 * e, (k, a, e)


def test_backfill_fills_only_missing_partitions(spark, sf_dir):
    from adb_south_caucasus_etl_spark.plans.rollup import (
        backfill_missing_partitions,
        materialize_rollup,
    )

    out = tempfile.mkdtemp(prefix="backfill_test_")
    fine = CubeQuery(
        cube="lineitem",
        drilldowns=("Region", "Year"),
        measures=("Line Count",),
    )
    materialize_rollup(spark, sf_dir, fine, out, partition_by=["year"])
    # drop one year's directory to simulate a hole
    import glob
    import shutil

    parts = sorted(glob.glob(f"{out}/year=*"))
    victim = parts[0]
    year = int(victim.split("=")[1])
    shutil.rmtree(victim)
    filled = backfill_missing_partitions(spark, sf_dir, fine, out, "year")
    assert filled == [year]
    # second run: nothing missing
    assert backfill_missing_partitions(spark, sf_dir, fine, out, "year") == []
