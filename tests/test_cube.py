import pytest
from pyspark.sql import functions as F

from adb_south_caucasus_etl_spark.plans.cube import (
    DEFAULT_CUBES,
    CubeQuery,
    _needed_tables,
    compile_query,
    members,
)


def test_join_pruning_minimal():
    schema = DEFAULT_CUBES["lineitem"]
    q = CubeQuery("lineitem", ("Return Flag",), ("Quantity",))
    assert _needed_tables(schema, q) == set()


def test_join_pruning_transitive_parents():
    schema = DEFAULT_CUBES["lineitem"]
    q = CubeQuery("lineitem", ("Region",), ("Revenue",))
    # Region needs region → nation → customer → orders
    assert _needed_tables(schema, q) == {"region", "nation", "customer", "orders"}


def test_cut_does_not_mutate_input(spark, sf_dir):
    cuts = {"Order Status": "F"}
    q = CubeQuery("lineitem", ("Year",), ("Revenue",), cuts=cuts)
    compile_query(spark, sf_dir, q)
    assert cuts == {"Order Status": "F"}  # oec.py:48 discipline


def test_flagship_shape(spark, sf_dir):
    q = CubeQuery(
        "lineitem", ("Region", "Year"), ("Revenue",), cuts={"Order Status": "F"}
    )
    df = compile_query(spark, sf_dir, q)
    assert df.columns == ["region", "year", "revenue"]
    rows = df.collect()
    assert len(rows) > 0
    # cut respected: recompute one cell by hand
    region, year = rows[0]["region"], rows[0]["year"]
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    manual = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .filter((F.col("o_orderstatus") == "F") & (F.col("r_name") == region))
        .filter(F.year("o_orderdate") == year)
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        .collect()[0][0]
    )
    assert manual == pytest.approx(rows[0]["revenue"], rel=1e-9)


def test_multi_member_cut_isin(spark, sf_dir):
    q = CubeQuery(
        "lineitem", ("Return Flag",), ("Line Count",), cuts={"Return Flag": "A,R"}
    )
    got = {r["return_flag"] for r in compile_query(spark, sf_dir, q).collect()}
    assert got == {"A", "R"}


def test_members_sorted(spark, sf_dir):
    df = members(spark, sf_dir, "lineitem", "Nation")
    assert df.columns == ["nation_id", "nation"]
    ids = [r["nation_id"] for r in df.collect()]
    assert ids == sorted(ids)
    assert len(ids) == len(set(ids))


def test_members_full_payload_parity(spark, sf_dir):
    # default stays the drill-friendly (id, label) projection; full_payload
    # restores the reference's whole-endpoint-payload behavior (oec.py:22)
    slim = members(spark, sf_dir, "lineitem", "Nation")
    full = members(spark, sf_dir, "lineitem", "Nation", full_payload=True)
    assert slim.columns == ["nation_id", "nation"]
    assert full.columns == ["nation_id", "nation", "n_regionkey"]
    # same member set either way, one attribute row per member, sorted
    assert [r["nation_id"] for r in full.collect()] == [
        r["nation_id"] for r in slim.collect()
    ]


def test_registry_cache_invalidation(spark, sf_dir, tmp_path):
    import shutil

    from adb_south_caucasus_etl_spark.sources.registry import (
        invalidate_table_cache,
        load_table,
    )

    # copy a table to a private dir so we can rewrite it mid-session
    d = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    shutil.copy(f"{sf_dir}/region.parquet", f"{d}/region.parquet")
    first = load_table(spark, d, "region")
    n = first.count()
    # rewrite the table in the directory layout with fewer rows (write
    # BEFORE removing the source — the plan reads lazily)
    first.limit(2).write.parquet(str(tmp_path / "region_new"))
    import os

    os.remove(f"{d}/region.parquet")
    shutil.copytree(str(tmp_path / "region_new"), f"{d}/region")
    # the stale cached handle still lists the deleted file; the hook makes
    # the next load re-list
    invalidate_table_cache(spark, sf_dir=d, name="region")
    assert load_table(spark, d, "region").count() == 2 < n


def test_rollup_subtotals(spark, sf_dir):
    q = CubeQuery("lineitem", ("Return Flag", "Line Status"), ("Quantity",), rollup=True)
    rows = compile_query(spark, sf_dir, q).collect()
    # rollup adds (flag, NULL) subtotals and a (NULL, NULL) grand total
    nulls = [r for r in rows if r["return_flag"] is None and r["line_status"] is None]
    assert len(nulls) == 1


def test_unknown_level_raises():
    schema = DEFAULT_CUBES["lineitem"]
    with pytest.raises(KeyError, match="no level"):
        schema.level("Nope")


# --------------------------------------------------------------------------
# runtime cube registration (infer_cube)


def test_infer_cube_levels_and_measures(spark, sf_dir):
    from adb_south_caucasus_etl_spark.plans.cube import Join, infer_cube
    from adb_south_caucasus_etl_spark.sources.registry import Catalog

    cat = Catalog(spark, sf_dir)
    schema = infer_cube(
        "orders_adhoc",
        cat.orders,
        joins=(Join("customer", "o_custkey", "c_custkey", broadcast=False),),
        dim_frames={"customer": cat.customer},
    )
    # string columns of fact AND dim become levels; date columns become
    # Year/Month; join keys never appear
    assert "O Orderstatus" in schema.levels
    assert "C Mktsegment" in schema.levels
    assert "O Orderdate Year" in schema.levels
    assert "O Orderdate Month" in schema.levels
    assert not any("Custkey" in name for name in schema.levels)
    # numeric columns become summed measures; Row Count always present
    assert schema.measures["Total O Totalprice"].agg == "sum"
    assert schema.measures["Row Count"].agg == "count"
    # dim-frame levels carry requires chains so join pruning works
    assert schema.levels["C Mktsegment"].requires == ("customer",)
    assert schema.levels["O Orderstatus"].requires == ()


def test_infer_cube_compiles_and_prunes(spark, sf_dir):
    from adb_south_caucasus_etl_spark.plans.cube import (
        Join,
        _needed_tables,
        infer_cube,
    )
    from adb_south_caucasus_etl_spark.sources.registry import Catalog

    cat = Catalog(spark, sf_dir)
    schema = infer_cube(
        "orders_adhoc",
        cat.orders,
        joins=(Join("customer", "o_custkey", "c_custkey", broadcast=False),),
        dim_frames={"customer": cat.customer},
    )
    cubes = {"orders_adhoc": schema}
    # fact-only query prunes the customer join entirely
    q_fact = CubeQuery(
        "orders_adhoc", ("O Orderstatus",), ("Total O Totalprice",)
    )
    assert _needed_tables(schema, q_fact) == set()
    df = compile_query(spark, sf_dir, q_fact, cubes=cubes)
    assert df.columns == ["o_orderstatus", "total_o_totalprice"]
    assert df.count() == 3  # O, F, P
    # dim drilldown + cut compiles through the attached frames
    q_dim = CubeQuery(
        "orders_adhoc",
        ("C Mktsegment",),
        ("Row Count",),
        cuts={"O Orderstatus": "F"},
    )
    rows = compile_query(spark, sf_dir, q_dim, cubes=cubes).collect()
    assert len(rows) == 5  # five market segments
    assert all(r["row_count"] > 0 for r in rows)


def test_infer_cube_overlays_and_members(spark, sf_dir):
    from adb_south_caucasus_etl_spark.plans.cube import (
        Join,
        Level,
        Measure,
        infer_cube,
        members,
    )
    from adb_south_caucasus_etl_spark.sources.registry import Catalog

    cat = Catalog(spark, sf_dir)
    schema = infer_cube(
        "orders_adhoc",
        cat.orders,
        joins=(Join("customer", "o_custkey", "c_custkey", broadcast=False),),
        dim_frames={"customer": cat.customer},
        levels={
            "Quarter": Level("Quarter", "quarter(o_orderdate)"),
        },
        measures={
            # same-name override replaces the inferred sum with avg
            "Total O Totalprice": Measure(
                "Total O Totalprice", "o_totalprice", agg="avg"
            ),
        },
    )
    assert schema.levels["Quarter"].label_expr == "quarter(o_orderdate)"
    assert schema.measures["Total O Totalprice"].agg == "avg"
    # members() resolves the runtime frames too (customer-backed level)
    m = members(
        spark, sf_dir, "orders_adhoc", "C Mktsegment",
        cubes={"orders_adhoc": schema},
    )
    assert m.count() == 5
