"""Sink (S4) and sketch (A3 approx) coverage the DuckDB oracle can't gate."""

import os

import pyspark.sql.functions as F

from adb_south_caucasus_etl_spark.sources.registry import Catalog
from adb_south_caucasus_etl_spark.sources.sinks import read_parquet, write_parquet

SF = "/root/testdata/sf0.001"


def test_partitioned_parquet_roundtrip(spark, tmp_path):
    out = str(tmp_path / "orders_by_year")
    orders = Catalog(spark, SF).orders.withColumn(
        "o_year", F.year("o_orderdate").cast("int")
    )
    write_parquet(orders, out, partition_by=["o_year"])

    # hive layout: one directory per year value
    year_dirs = [d for d in os.listdir(out) if d.startswith("o_year=")]
    assert len(year_dirs) >= 2

    back = read_parquet(spark, out)
    assert back.count() == orders.count()

    # partition-pruning filter reads a strict subset of files
    one_year = int(year_dirs[0].split("=")[1])
    pruned = back.filter(F.col("o_year") == one_year)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert back.filter(F.col("o_year") == one_year).count() == orders.filter(
        F.col("o_year") == one_year
    ).count()
    # the pushed partition filter must appear in the physical scan
    assert "o_year" in plan


def test_approx_count_distinct_accuracy(spark):
    li = Catalog(spark, SF).lineitem
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("exact"),
            F.approx_count_distinct("l_orderkey", 0.02).alias("approx"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r["approx"] - r["exact"]) <= max(3, 0.05 * r["exact"])


def test_max_records_per_file_splits_output(spark, tmp_path):
    out = str(tmp_path / "split")
    li = Catalog(spark, SF).lineitem.repartition(1)
    write_parquet(li, out, max_records_per_file=1000)
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) >= 2  # 6k rows / 1k per file


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    from adb_south_caucasus_etl_spark.sources.sinks import write_bucketed

    cat = Catalog(spark, SF)
    write_bucketed(
        cat.orders, "t_orders_b", str(tmp_path / "ob"),
        ["o_orderkey"], num_buckets=4, sort_cols=["o_orderkey"],
    )
    write_bucketed(
        cat.lineitem, "t_lineitem_b", str(tmp_path / "lb"),
        ["l_orderkey"], num_buckets=4, sort_cols=["l_orderkey"],
    )
    try:
        o = spark.table("t_orders_b")
        li = spark.table("t_lineitem_b")
        joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderstatus"
        ).agg(F.count(F.lit(1)).alias("n"))
        rows = {r.o_orderstatus: r.n for r in joined.collect()}
        # correctness vs the plain (shuffling) join
        plain = {
            r.o_orderstatus: r.n
            for r in cat.lineitem.join(
                cat.orders, F.col("l_orderkey") == F.col("o_orderkey")
            )
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert rows == plain
        # the bucketed join itself must add no exchange before the join:
        # only the final groupBy aggregation may shuffle
        plan = joined._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        import re
        exchanges = re.findall(r"Exchange hashpartitioning\(([^,]+)", final)
        assert all(e.startswith("o_orderstatus") for e in exchanges), exchanges
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_bucketed_join_has_no_exchange(spark):
    """The registered bucketed_join_segments entry: the orders ⋈ customer
    join itself must run with NO Exchange and NO per-task Sort — both sides
    are bucketed+sorted on the key, so the scan satisfies the sort-merge
    join's distribution and ordering requirements directly."""
    from adb_south_caucasus_etl_spark.workload import (
        bucketed_orders_customer_join,
    )

    joined = bucketed_orders_customer_join(spark, SF)
    assert joined.count() > 0
    plan = joined._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "SortMergeJoin" in final, final
    assert "Exchange" not in final, final


def test_dynamic_partition_pruning_on_partitioned_sink(spark, tmp_path):
    """Hive-partitioned writes + a filtered dim join give runtime partition
    pruning (the fact scan's partition filter is a dynamicpruning subquery,
    not a static literal) — the 100 TB scan-reduction path."""
    out = str(tmp_path / "orders_by_year")
    orders = Catalog(spark, SF).orders.withColumn(
        "o_year", F.year("o_orderdate").cast("int")
    )
    write_parquet(orders, out, partition_by=["o_year"])
    fact = spark.read.parquet(out).select(
        "o_orderkey", "o_totalprice", "o_year"
    )
    dim = (
        Catalog(spark, SF)
        .orders.select(
            F.year("o_orderdate").cast("int").alias("y"),
            F.col("o_orderpriority").alias("prio"),
        )
        .distinct()
    )
    j = (
        fact.join(dim.filter(F.col("prio") == "1-URGENT"), fact.o_year == F.col("y"))
        .groupBy("prio")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert j.collect()
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()


def test_compact_parquet_reduces_file_count(spark, sf_dir, tmp_path):
    import glob

    from adb_south_caucasus_etl_spark.sources.registry import Catalog
    from adb_south_caucasus_etl_spark.sources.sinks import compact_parquet

    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    orders = Catalog(spark, sf_dir).orders
    orders.repartition(40).write.mode("overwrite").parquet(src)
    n_in = len(glob.glob(f"{src}/*.parquet"))
    assert n_in == 40
    n_out = compact_parquet(spark, src, dst, target_file_bytes=256 * 1024)
    files = glob.glob(f"{dst}/*.parquet")
    assert len(files) == n_out < n_in
    assert spark.read.parquet(dst).count() == orders.count()


def test_compact_partitioned_parquet_exact_per_dir_counts(spark, tmp_path):
    """The partitioned byte-target compactor's contract is EXACT
    per-directory arithmetic: after repartition(part_col) +
    maxRecordsPerFile=k, every part= directory holds ceil(rows_p / k)
    files — including partitions that were never fragmented — and the
    data survives losslessly."""
    import glob
    import math

    from adb_south_caucasus_etl_spark.sources.sinks import (
        compact_partitioned_parquet,
    )

    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compact")
    # skewed partitions: p=0 → 5 rows, p=1 → 23, p=2 → 101
    rows = [(p, i) for p, n in ((0, 5), (1, 23), (2, 101)) for i in range(n)]
    df = spark.createDataFrame(rows, "p int, v long")
    # fragment: one file per (partition, v%4 bucket)
    for b in range(4):
        (
            df.filter(F.col("v") % 4 == b)
            .coalesce(1)
            .write.mode("overwrite" if b == 0 else "append")
            .partitionBy("p")
            .parquet(src)
        )
    compact_partitioned_parquet(spark, src, dst, "p", max_rows_per_file=10)
    for p, n in ((0, 5), (1, 23), (2, 101)):
        got = len(glob.glob(f"{dst}/p={p}/*.parquet"))
        assert got == math.ceil(n / 10), (p, got)
    out = spark.read.parquet(dst)
    assert out.count() == len(rows)
    assert out.groupBy().sum("v").first()[0] == sum(v for _, v in rows)


def test_rows_per_file_for_bytes_conversion(spark, tmp_path):
    """bytes→rows conversion: k scales linearly with the byte target
    (avg encoded row width is measured from the actual listing), never
    returns < 1, and a target at least the table's own size maps to a
    k that keeps the table in one file."""
    from adb_south_caucasus_etl_spark.sources.sinks import (
        rows_per_file_for_bytes,
    )

    src = str(tmp_path / "t")
    spark.range(10_000).withColumn("pad", F.md5(F.col("id").cast("string"))).write.mode(
        "overwrite"
    ).parquet(src)
    k_small = rows_per_file_for_bytes(spark, src, target_file_bytes=1)
    assert k_small == 1
    k_big = rows_per_file_for_bytes(spark, src, target_file_bytes=1 << 30)
    assert k_big >= 10_000, k_big
    k1 = rows_per_file_for_bytes(spark, src, target_file_bytes=64 << 10)
    k2 = rows_per_file_for_bytes(spark, src, target_file_bytes=128 << 10)
    assert 1 <= k1 <= k2, (k1, k2)


def test_list_parquet_files_skips_hidden_debris(spark, tmp_path):
    """ADVICE r10: the recursive listing must apply Spark's
    InMemoryFileIndex hidden-file rule — path segments starting with
    '_' or '.' below the root (``_temporary`` commit debris, dot-dirs)
    are invisible to Spark's reader, so counting them would desync the
    footer-truth row count from what a scan actually reads, with the
    result mislabeled exact."""
    import os

    from adb_south_caucasus_etl_spark.sources.sinks import (
        list_parquet_files,
    )

    src = str(tmp_path / "_underscored_root" / "tbl")
    spark.range(100).write.mode("overwrite").parquet(src)
    visible = list_parquet_files(spark, src)
    assert visible and all(p.endswith(".parquet") for p, _ in visible)
    # plant reader-invisible debris: a _temporary subtree, a dot-dir,
    # and leading-underscore / dot files in the root itself
    for d in ("_temporary/0/task", ".staging"):
        os.makedirs(os.path.join(src, d), exist_ok=True)
        with open(os.path.join(src, d, "part-x.parquet"), "wb") as fh:
            fh.write(b"not really parquet")
    for f in ("_debris.parquet", ".hidden.parquet"):
        with open(os.path.join(src, f), "wb") as fh:
            fh.write(b"junk")
    after = list_parquet_files(spark, src)
    assert sorted(after) == sorted(visible), (after, visible)
    # the root's OWN ancestors may contain underscored segments (the
    # rule applies only BELOW the listing root)
    assert "_underscored_root" in after[0][0]
    # and the surviving listing agrees with what Spark actually reads
    assert spark.read.parquet(src).count() == 100


def test_zorder_key_interleaves_bits(spark):
    from adb_south_caucasus_etl_spark.sources.sinks import zorder_key

    df = spark.createDataFrame([(0b101, 0b011)], "x long, y long")
    z = df.select(zorder_key(["x", "y"], bits=3).alias("z")).first()["z"]
    # bit layout pos = bit*2 + i: x bits at even positions, y at odd
    # x=101, y=011 -> z = x0,y0,x1,y1,x2,y2 = 1,1,0,1,1,0 -> 0b011011
    assert z == 0b011011, bin(z)


class TestThetaKll:
    def test_theta_algebra_on_disjoint_sets(self, spark):
        """Exact-mode theta sketches: users 0-999 in A, 500-1499 in B →
        intersection 500, union 1500, difference 500 — exactly."""
        from pyspark.sql import functions as F

        rows = [(i, "A") for i in range(1000)] + [
            (i, "B") for i in range(500, 1500)
        ]
        df = spark.createDataFrame(rows, "user_id long, t string")
        sk = df.groupBy("t").agg(
            F.expr("theta_sketch_agg(user_id, 16)").alias("sk")
        )
        a = sk.filter("t = 'A'").select(F.col("sk").alias("a_sk"))
        b = sk.filter("t = 'B'").select(F.col("sk").alias("b_sk"))
        [r] = (
            a.crossJoin(b)
            .select(
                F.expr(
                    "cast(round(theta_sketch_estimate("
                    "theta_intersection(a_sk, b_sk))) as bigint)"
                ).alias("i"),
                F.expr(
                    "cast(round(theta_sketch_estimate("
                    "theta_union(a_sk, b_sk))) as bigint)"
                ).alias("u"),
                F.expr(
                    "cast(round(theta_sketch_estimate("
                    "theta_difference(a_sk, b_sk))) as bigint)"
                ).alias("d"),
            )
            .collect()
        )
        assert (r["i"], r["u"], r["d"]) == (500, 1500, 500)

    def test_kll_rollup_quantiles_close_to_exact(self, spark):
        """Merged KLL p50/p95 per year within 2% relative of the exact
        percentile (k=4096 → ~0.4% normalized rank error; at the small
        SFs every cell fits the sketch so it is exact)."""
        from pyspark.sql import functions as F

        from adb_south_caucasus_etl_spark.workload import WORKLOAD

        sf_dir = "/root/testdata/sf0.01"
        got = {
            r["yr"]: (r["p50_totalprice"], r["p95_totalprice"])
            for r in WORKLOAD["rollup_kll_quantile_serve"]
            .fn(spark, sf_dir)
            .collect()
        }
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        exact = {
            r["yr"]: (r["p50"], r["p95"])
            for r in orders.groupBy(F.year("o_orderdate").alias("yr"))
            .agg(
                F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
                F.expr("percentile(o_totalprice, 0.95)").alias("p95"),
            )
            .collect()
        }
        assert got.keys() == exact.keys()
        for yr in exact:
            for g, e in zip(got[yr], exact[yr]):
                assert abs(g - e) / e < 0.02, (yr, got[yr], exact[yr])


def test_expire_partitions_metadata_only(spark, tmp_path):
    """Retention expire drops exactly the named hive directories, is
    idempotent (a name already gone counts 0), and never touches the
    surviving partitions' files (same file paths before and after)."""
    import os

    from pyspark.sql import functions as F

    from adb_south_caucasus_etl_spark.sources.sinks import (
        expire_partitions,
    )

    tbl = str(tmp_path / "t")
    df = spark.range(0, 100).select(
        (F.col("id") % 5).cast("string").alias("p"), "id"
    )
    df.write.mode("overwrite").partitionBy("p").parquet(tbl)
    survivors_before = {
        r["f"]
        for r in spark.read.parquet(tbl)
        .filter(F.col("p") >= 2)
        .select(F.col("_metadata.file_path").alias("f"))
        .distinct()
        # bounded: file-manifest grain (a handful of staged files)
        .collect()
    }
    n = expire_partitions(spark, tbl, ["p=0", "p=1", "p=9"])
    assert n == 2  # p=9 never existed
    assert expire_partitions(spark, tbl, ["p=0", "p=1"]) == 0  # idempotent
    back = spark.read.parquet(tbl)
    # hive inference types the partition column INT ("0".."4" parse)
    assert sorted(
        int(r["p"]) for r in back.select("p").distinct().collect()
    ) == [2, 3, 4]
    assert back.count() == 60
    survivors_after = {
        r["f"]
        for r in back.select(
            F.col("_metadata.file_path").alias("f")
        ).distinct()
        # bounded: file-manifest grain
        .collect()
    }
    assert survivors_after == survivors_before
    assert not os.path.exists(os.path.join(tbl, "p=0"))
