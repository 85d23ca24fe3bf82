"""Property tests for the distributed ordinal / prefix-scan primitives
against their single-partition window references.

These exist because of a scale-only bug class: repartitionByRange boundary
SAMPLING is nondeterministic per execution, so an ordinal design whose
offsets manifest and rank pass can read two different partitionings (the
pre-r06 persist+collect shape, or ReuseExchange failing to fire when the
primitive nests). That corrupted 97% of ordinals at sf0.1 while
sf0.001/0.01 stayed green. The tests below force the dangerous regime —
more rows than the sampler keeps per partition, heavy ties, chained
(nested) calls — on synthetic data so the suite catches any future
re-introduction without needing the big fixtures.
"""

from decimal import Decimal

from pyspark.sql import Window
from pyspark.sql import functions as F

from adb_south_caucasus_etl_spark.operators.curation import (
    global_ordinal,
    global_running_agg,
    ntile_from_ordinal,
)


def _synth(spark, n=60_000):
    """n rows, unique id, heavy-tie group key (40 values), skewed value."""
    return spark.range(n).select(
        F.col("id"),
        (F.col("id") % 40).alias("ties"),
        F.pmod(F.xxhash64("id"), F.lit(1000)).alias("val"),
    )


def test_global_ordinal_matches_row_number_under_ties_and_nesting(spark):
    df = _synth(spark)
    # chained (nested) calls — the regime where exchange reuse broke down
    got = global_ordinal(
        global_ordinal(
            df, [F.asc("ties"), F.asc("id")], ordinal_col="rn_a"
        ),
        [F.desc("val"), F.asc("id")],
        ordinal_col="rn_b",
    )
    ref = df.select(
        "id",
        F.row_number()
        .over(Window.orderBy(F.asc("ties"), F.asc("id")))
        .alias("ja"),
        F.row_number()
        .over(Window.orderBy(F.desc("val"), F.asc("id")))
        .alias("jb"),
    )
    j = got.join(ref, "id")
    assert (
        j.filter(
            (F.col("rn_a") != F.col("ja")) | (F.col("rn_b") != F.col("jb"))
        ).count()
        == 0
    )


def test_global_running_agg_matches_window_sums_and_max(spark):
    df = _synth(spark)
    order = [F.asc("ties"), F.asc("id")]
    got = global_running_agg(
        global_running_agg(
            df, order, ["val"], out_col=["cs"], agg="sum"
        ),
        order,
        "val",
        out_col="rm",
        agg="max",
        include_current=False,
    )
    w_inc = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    w_exc = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
    ref = df.select(
        "id",
        F.sum("val").over(w_inc).alias("cs_ref"),
        F.max("val").over(w_exc).alias("rm_ref"),
    )
    j = got.join(ref, "id")
    bad = j.filter(
        (F.col("cs") != F.col("cs_ref"))
        | ~(
            (F.col("rm") == F.col("rm_ref"))
            | (F.col("rm").isNull() & F.col("rm_ref").isNull())
        )
    )
    assert bad.count() == 0


def test_global_running_agg_decimal_types_survive(spark):
    """Decimal prefix sums (the ABC/Gini money path): offsets are cast to
    the window-sum dtype, so driver-side Decimal totals must round-trip."""
    df = spark.range(5_000).select(
        "id",
        (F.col("id") % 7).alias("g"),
        (F.col("id") % 100 / 100 + 1)
        .cast("decimal(18,2)")
        .alias("amt"),
    )
    got = global_running_agg(
        df, [F.asc("g"), F.asc("id")], "amt", out_col="cum", agg="sum"
    )
    w = Window.orderBy(F.asc("g"), F.asc("id")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    ref = df.select("id", F.sum("amt").over(w).alias("cum_ref"))
    j = got.join(ref, "id")
    assert j.filter(F.col("cum") != F.col("cum_ref")).count() == 0
    [first] = got.orderBy("g", "id").limit(1).collect()
    assert first["cum"] == Decimal("1.00")


def test_ntile_from_ordinal_matches_ntile(spark):
    for n, k in ((9_973, 5), (10_000, 10), (3, 5)):
        df = spark.range(n).select(
            "id", F.pmod(F.xxhash64("id"), F.lit(500)).alias("m")
        )
        order = [F.asc("m"), F.asc("id")]
        ranked = global_ordinal(df, order, ordinal_col="rn").crossJoin(
            F.broadcast(
                df.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
            )
        )
        got = ranked.select(
            "id",
            ntile_from_ordinal(F.col("rn"), F.col("n"), k).alias("t"),
        )
        ref = df.select(
            "id", F.ntile(k).over(Window.orderBy(*order)).alias("t_ref")
        )
        j = got.join(ref, "id")
        assert (
            j.filter(F.col("t") != F.col("t_ref")).count() == 0
        ), (n, k)
