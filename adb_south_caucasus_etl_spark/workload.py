"""Named query workload — one entry per implemented operator (SURVEY §2).

Each entry pairs a Spark implementation ``(spark, sf_dir) -> DataFrame`` with
an ANSI-SQL oracle string DuckDB runs over the same parquet views. The driver
hash-compares them (row-count + schema + order-insensitive value hash), so:

- every computed column is aliased identically on both sides
- floating aggregates are rounded to a fixed scale on both sides (double
  summation order differs between engines; SURVEY §7 hard-part 3)
- timestamps in outputs are projected as epoch seconds or dates to avoid
  timezone-representation mismatches
- types are aligned (e.g. DuckDB ``year()`` returns BIGINT, Spark ``year()``
  INT → explicit casts)

Queries that are genuinely non-SQL-expressible (LSH approximations,
stateful streaming) register ``oracle=None`` → rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .plans.cube import CubeQuery, compile_query, members
from .sources.registry import Catalog

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class WorkloadEntry:
    fn: QueryFn
    oracle: str | None
    doc: str = ""


WORKLOAD: dict[str, WorkloadEntry] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn: QueryFn) -> QueryFn:
        WORKLOAD[name] = WorkloadEntry(fn, oracle, doc)
        return fn

    return deco


def _round2(df: DataFrame, *cols: str) -> DataFrame:
    out = df
    for c in cols:
        out = out.withColumn(c, F.round(F.col(c), 2))
    return out


# --------------------------------------------------------------------------
# flagship (SURVEY §7 Phase 1): the reference's whole [API] surface in one
# query — star join (J1/J2), cut (P2), drilldown agg (A1), date scalar,
# normalized names (P3), sort (O1).

FLAGSHIP_QUERY = CubeQuery(
    cube="lineitem",
    drilldowns=("Region", "Year"),
    measures=("Revenue",),
    cuts={"Order Status": "F"},
)


@register(
    "cube_flagship_revenue",
    """
    SELECT r_name AS region,
           CAST(year(o_orderdate) AS INTEGER) AS year,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderstatus = 'F'
    GROUP BY 1, 2
    """,
    doc="A1 drilldown agg + P2 cut + J1 star join via the CubeQuery compiler",
)
def cube_flagship_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = compile_query(spark, sf_dir, FLAGSHIP_QUERY)
    return _round2(df.withColumn("year", F.col("year").cast("int")), "revenue")


@register(
    "cube_members_nation",
    """
    SELECT DISTINCT n_nationkey AS nation_id, n_name AS nation
    FROM nation ORDER BY nation_id
    """,
    doc="A2/E2 member enumeration (intended sort the reference drops, oec.py:23)",
)
def cube_members_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return members(spark, sf_dir, "lineitem", "Nation")


@register(
    "cube_multi_cut_isin",
    """
    SELECT c_mktsegment AS segment,
           CAST(year(o_orderdate) AS INTEGER) AS year,
           ROUND(SUM(l_quantity), 2) AS quantity,
           COUNT(*) AS line_count
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE l_returnflag IN ('A', 'R')
    GROUP BY 1, 2
    """,
    doc="P2 multi-member cut (comma wire grammar, util.py:1-9) → isin",
)
def cube_multi_cut_isin(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = CubeQuery(
        cube="lineitem",
        drilldowns=("Segment", "Year"),
        measures=("Quantity", "Line Count"),
        cuts={"Return Flag": "A,R"},  # comma-joined multi-member cut
    )
    df = compile_query(spark, sf_dir, q)
    return _round2(df.withColumn("year", F.col("year").cast("int")), "quantity")


@register(
    "cube_rollup_geo",
    """
    SELECT r_name AS region, n_name AS nation,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    doc="A4 hierarchy subtotals: Geography rollup Region→Nation + grand total",
)
def cube_rollup_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = CubeQuery(
        cube="lineitem",
        drilldowns=("Region", "Nation"),
        measures=("Revenue",),
        rollup=True,
    )
    return _round2(compile_query(spark, sf_dir, q), "revenue")


@register(
    "cube_filtered_measure",
    """
    SELECT CAST(year(o_orderdate) AS INTEGER) AS year,
           ROUND(SUM(CASE WHEN l_returnflag = 'R'
                          THEN l_extendedprice * (1 - l_discount) END), 2)
             AS returned_revenue,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1
    """,
    doc="A5 cut-within-measure: conditional aggregate beside the plain one",
)
def cube_filtered_measure(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    df = (
        cat.lineitem.join(
            cat.orders, F.col("l_orderkey") == F.col("o_orderkey"), "inner"
        )
        .groupBy(F.year("o_orderdate").alias("year"))
        .agg(
            F.sum(F.when(F.col("l_returnflag") == "R", disc_price)).alias(
                "returned_revenue"
            ),
            F.sum(disc_price).alias("revenue"),
        )
    )
    return _round2(df, "returned_revenue", "revenue")


@register(
    "cube_agg_registry",
    """
    SELECT c_mktsegment AS segment,
           ROUND(AVG(l_discount), 4) AS avg_discount,
           ROUND(MIN(l_extendedprice), 2) AS min_price,
           ROUND(MAX(l_extendedprice), 2) AS max_price,
           COUNT(*) AS line_count,
           COUNT(DISTINCT l_orderkey) AS order_count
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    GROUP BY 1
    """,
    doc="A3 aggregator registry: avg/min/max/count/count_distinct measures",
)
def cube_agg_registry(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    df = (
        cat.lineitem.join(
            cat.orders, F.col("l_orderkey") == F.col("o_orderkey"), "inner"
        )
        .join(cat.customer, F.col("o_custkey") == F.col("c_custkey"), "inner")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.round(F.avg("l_discount"), 4).alias("avg_discount"),
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
            F.count(F.lit(1)).alias("line_count"),
            F.countDistinct("l_orderkey").alias("order_count"),
        )
    )
    return df


# --------------------------------------------------------------------------
# relational core

@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 2) AS avg_qty,
           ROUND(AVG(l_extendedprice), 2) AS avg_price,
           ROUND(AVG(l_discount), 2) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: multi-agg groupBy with filter pushdown",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    df = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).alias("sum_disc_price"),
            F.sum(charge).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    return _round2(
        df,
        "sum_qty",
        "sum_base_price",
        "sum_disc_price",
        "sum_charge",
        "avg_qty",
        "avg_price",
        "avg_disc",
    )
