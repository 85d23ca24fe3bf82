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

from .operators.asof import asof_join
from .operators.topk import topk_per_group
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


# --------------------------------------------------------------------------
# joins (SURVEY §2.C)

@register(
    "join_left_agg",
    """
    SELECT c_custkey, c_name,
           COUNT(o_orderkey) AS order_count,
           ROUND(COALESCE(SUM(o_totalprice), 0), 2) AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY 1, 2
    """,
    doc="J2 left outer join + null-safe aggregate (customers with zero orders kept)",
)
def join_left_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return (
        cat.customer.join(
            cat.orders, F.col("c_custkey") == F.col("o_custkey"), "left"
        )
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("order_count"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias(
                "total_spent"
            ),
        )
    )


@register(
    "join_semi_anti",
    """
    SELECT 'has_orders' AS tag, COUNT(*) AS n
    FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
    UNION ALL
    SELECT 'no_orders' AS tag, COUNT(*) AS n
    FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
    doc="J3 left-semi (EXISTS) and left-anti (NOT EXISTS) joins",
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    on = F.col("c_custkey") == F.col("o_custkey")
    semi = (
        cat.customer.join(cat.orders, on, "left_semi")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("has_orders").alias("tag"), "n")
    )
    anti = (
        cat.customer.join(cat.orders, on, "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("no_orders").alias("tag"), "n")
    )
    return semi.unionByName(anti)


@register(
    "join_range_tiers",
    """
    WITH tiers(tier, lo, hi) AS (
      VALUES ('low', 0.0, 100.0), ('mid', 100.0, 300.0), ('high', 300.0, 1000.0)
    )
    SELECT tier, COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
    FROM events JOIN tiers ON value >= lo AND value < hi
    GROUP BY 1
    """,
    doc="J4 theta/range join: events binned into value tiers (broadcast nested loop)",
)
def join_range_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    tiers = spark.createDataFrame(
        [("low", 0.0, 100.0), ("mid", 100.0, 300.0), ("high", 300.0, 1000.0)],
        "tier string, lo double, hi double",
    )
    cond = (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi"))
    return (
        cat.events.join(F.broadcast(tiers), cond, "inner")
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@register(
    "asof_last_error",
    """
    WITH err AS (
      SELECT user_id, ts, max_by(value, event_id) AS err_value
      FROM events WHERE event_type = 'error' GROUP BY user_id, ts
    )
    SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
           ROUND(err.err_value, 2) AS last_error_value
    FROM events e ASOF LEFT JOIN err
      ON e.user_id = err.user_id AND e.ts >= err.ts
    """,
    doc="J5 as-of join: latest error value at-or-before each event, per user "
        "(union-tag single-shuffle operator vs DuckDB native ASOF JOIN)",
)
def asof_last_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    events = cat.events.select("event_id", "user_id", "ts")
    err = (
        cat.events.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("err_value"))
    )
    joined = asof_join(events, err, on="user_id", left_ts="ts")
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.round("err_value", 2).alias("last_error_value"),
    )


# --------------------------------------------------------------------------
# sorts / top-k / window analytics (SURVEY §2.E, §2.J)

@register(
    "topk_customers_per_region",
    """
    WITH rev AS (
      SELECT r_name AS region, c_custkey,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY 1, 2
    )
    SELECT region, c_custkey, revenue, CAST(rn AS INTEGER) AS rank
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY region ORDER BY revenue DESC, c_custkey
      ) AS rn FROM rev
    ) t WHERE rn <= 3
    """,
    doc="O2/O3 top-k per group with deterministic tiebreak on the unique key",
)
def topk_customers_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = CubeQuery(
        cube="lineitem", drilldowns=("Region", "Customer"), measures=("Revenue",)
    )
    # drill to customer *keys*: reuse the star but group by key not label
    cat = Catalog(spark, sf_dir)
    rev = (
        cat.lineitem.join(cat.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cat.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cat.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(cat.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"), "c_custkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    return topk_per_group(
        rev,
        ["region"],
        [F.col("revenue").desc(), F.col("c_custkey").asc()],
        k=3,
        rank_col="rank",
    )


@register(
    "window_running_orders",
    """
    SELECT o_custkey, o_orderkey,
           CAST(row_number() OVER w AS INTEGER) AS rn,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS UNBOUNDED PRECEDING), 2) AS running_spent,
           ROUND(lag(o_totalprice) OVER w, 2) AS prev_price,
           ROUND(lead(o_totalprice) OVER w, 2) AS next_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="§2.J analytic windows: row_number, running frame sum, lag, lead",
)
def window_running_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cat = Catalog(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return cat.orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.round(F.sum("o_totalprice").over(run), 2).alias("running_spent"),
        F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
    )


# --------------------------------------------------------------------------
# set operations (SURVEY §2.F)

@register(
    "setops_nation_roles",
    """
    WITH cn AS (SELECT DISTINCT n_name FROM nation
                JOIN customer ON n_nationkey = c_nationkey),
         sn AS (SELECT DISTINCT n_name FROM nation
                JOIN supplier ON n_nationkey = s_nationkey)
    SELECT 'both' AS role, n_name FROM (SELECT * FROM cn INTERSECT SELECT * FROM sn) t
    UNION ALL
    SELECT 'customer_only' AS role, n_name FROM (SELECT * FROM cn EXCEPT SELECT * FROM sn) t
    UNION ALL
    SELECT 'supplier_only' AS role, n_name FROM (SELECT * FROM sn EXCEPT SELECT * FROM cn) t
    """,
    doc="§2.F set ops: intersect / except / union over nation roles",
)
def setops_nation_roles(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    cn = (
        cat.nation.join(
            cat.customer, F.col("n_nationkey") == F.col("c_nationkey"), "inner"
        )
        .select("n_name")
        .distinct()
    )
    sn = (
        cat.nation.join(
            cat.supplier, F.col("n_nationkey") == F.col("s_nationkey"), "inner"
        )
        .select("n_name")
        .distinct()
    )
    tag = lambda df, t: df.select(F.lit(t).alias("role"), "n_name")  # noqa: E731
    return (
        tag(cn.intersect(sn), "both")
        .unionByName(tag(cn.subtract(sn), "customer_only"))
        .unionByName(tag(sn.subtract(cn), "supplier_only"))
    )


# --------------------------------------------------------------------------
# scalar functions (SURVEY §2.G)

@register(
    "scalar_string_funcs",
    """
    SELECT p_partkey,
           upper(substring(p_name, 1, 8)) AS name_prefix,
           CAST(length(p_name) AS INTEGER) AS name_len,
           replace(p_brand, 'Brand#', 'B-') AS brand_code,
           split_part(p_name, ' ', 1) AS first_word,
           CASE WHEN p_type LIKE '%ECO%' THEN 1 ELSE 0 END AS is_eco,
           concat_ws('|', p_brand, p_type) AS brand_type,
           ROUND(p_retailprice * 1.1, 2) AS inflated_price
    FROM part
    """,
    doc="§2.G string/math scalars: upper, substring, length, replace, split, like, concat_ws",
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return cat.part.select(
        "p_partkey",
        F.upper(F.substring("p_name", 1, 8)).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.regexp_replace("p_brand", "Brand#", "B-").alias("brand_code"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
        F.when(F.col("p_type").like("%ECO%"), 1).otherwise(0).alias("is_eco"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.round(F.col("p_retailprice") * 1.1, 2).alias("inflated_price"),
    )


@register(
    "scalar_date_funcs",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS y,
           CAST(month(o_orderdate) AS INTEGER) AS m,
           CAST(day(o_orderdate) AS INTEGER) AS d,
           CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS month_start,
           CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS VARCHAR) AS due_date,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end
    FROM orders
    """,
    doc="§2.G date/time scalars: year/month/day extraction, trunc, arithmetic, last_day",
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    od = F.col("o_orderdate")
    return cat.orders.select(
        "o_orderkey",
        F.year(od).alias("y"),
        F.month(od).alias("m"),
        F.dayofmonth(od).alias("d"),
        F.date_trunc("month", od).cast("date").cast("string").alias("month_start"),
        F.date_add(od.cast("date"), 30).cast("string").alias("due_date"),
        F.last_day(od.cast("date")).cast("string").alias("month_end"),
    )


@register(
    "events_json_props",
    """
    SELECT event_type,
           COALESCE(CAST(props->>'k' AS INTEGER), -1) AS k,
           COUNT(*) AS n,
           ROUND(AVG(value), 2) AS avg_value
    FROM events GROUP BY 1, 2
    """,
    doc="§2.G JSON access (events.props) + null handling via coalesce",
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    k = F.from_json("props", "k INT").getField("k")
    return (
        cat.events.select(
            "event_type", F.coalesce(k, F.lit(-1)).alias("k"), "value"
        )
        .groupBy("event_type", "k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 2).alias("avg_value"),
        )
    )
