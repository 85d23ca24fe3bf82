"""Empty- and tiny-input robustness: every operator must degrade to an
empty/1-row result with the right schema, never raise — the failure mode
that bites at 100 TB is a FILTERED partition or date range coming back
empty and a downstream operator exploding at 3 a.m."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


@pytest.fixture(scope="module")
def one_doc(spark):
    return spark.createDataFrame([(1, "just one tiny document")], "doc_id long, text string")


def test_dedup_ops_on_empty_and_single(spark, empty_docs, one_doc):
    from adb_south_caucasus_etl_spark.operators.dedup import (
        dedup_exact,
        jaccard_pairs,
        lsh_candidate_pairs,
    )

    assert dedup_exact(empty_docs, "doc_id", "text").count() == 0
    assert dedup_exact(one_doc, "doc_id", "text").count() == 1
    assert jaccard_pairs(empty_docs, "doc_id", "text", threshold=0.5).count() == 0
    assert jaccard_pairs(one_doc, "doc_id", "text", threshold=0.5).count() == 0
    assert (
        lsh_candidate_pairs(empty_docs, "doc_id", "text").count() == 0
    )


def test_connected_components_empty(spark):
    from adb_south_caucasus_etl_spark.operators.dedup import connected_components

    edges = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(edges, "id_a", "id_b").count() == 0


def test_decontaminate_empty_test_set(spark, one_doc, empty_docs):
    from adb_south_caucasus_etl_spark.operators.curation import decontaminate

    out = decontaminate(one_doc, empty_docs, n=5).collect()
    assert len(out) == 1 and out[0]["n_hits"] == 0
    assert out[0]["contaminated"] is False
    # empty train side: nothing to report
    assert decontaminate(empty_docs, one_doc, n=5).count() == 0


def test_asof_empty_right_keeps_left(spark):
    from adb_south_caucasus_etl_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 100)], "k long, ts long"
    ).withColumn("ts", F.timestamp_micros("ts"))
    right = spark.createDataFrame(
        [], "k long, ts long, payload string"
    ).withColumn("ts", F.timestamp_micros("ts"))
    out = asof_join(left, right, on="k", left_ts="ts").collect()
    assert len(out) == 1 and out[0]["payload"] is None


def test_cosine_blocked_empty_and_single(spark):
    from adb_south_caucasus_etl_spark.operators.similarity import (
        cosine_pairs_blocked,
    )

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert cosine_pairs_blocked(empty, threshold=0.5).count() == 0
    single = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    assert cosine_pairs_blocked(single, threshold=0.5).count() == 0


def test_fuzzy_match_no_candidates(spark):
    from adb_south_caucasus_etl_spark.operators.fuzzy import fuzzy_match

    messy = spark.createDataFrame([(1, "zzzzz")], "id long, name string")
    canon = spark.createDataFrame([("aaaaa",)], "cname string")
    assert (
        fuzzy_match(messy, canon, "id", "name", "cname", max_dist=1).count()
        == 0
    )


def test_topk_k_larger_than_group(spark):
    from adb_south_caucasus_etl_spark.operators.topk import topk_per_group

    df = spark.createDataFrame([("a", 1), ("a", 2)], "g string, v int")
    out = topk_per_group(df, ["g"], [F.col("v").desc()], k=10)
    assert out.count() == 2


def test_rollup_drilldown_on_empty_cut(spark, sf_dir, tmp_path):
    from adb_south_caucasus_etl_spark.plans.cube import CubeQuery
    from adb_south_caucasus_etl_spark.plans.rollup import (
        materialize_rollup,
        rollup_drilldown,
    )

    q = CubeQuery(
        cube="lineitem",
        drilldowns=("Region", "Year"),
        measures=("Revenue",),
        cuts={"Order Status": "NO_SUCH_STATUS"},
    )
    out = str(tmp_path / "empty_rollup")
    materialize_rollup(spark, sf_dir, q, out)
    assert rollup_drilldown(spark, out, ["Region"], ["Revenue"]).count() == 0


def test_soundex_canonical_vectors(spark):
    # the classic published test vectors for American Soundex
    df = spark.createDataFrame(
        [("Robert",), ("Rupert",), ("Ashcraft",), ("Tymczak",), ("Pfister",)],
        "name string",
    )
    got = [r["s"] for r in df.select(F.soundex("name").alias("s")).collect()]
    assert got == ["R163", "R163", "A261", "T522", "P236"], got


def test_observe_metrics_side_channel(spark, sf_dir):
    """df.observe(): data-quality metrics collected DURING the query (one
    pass, no second scan) — the runtime-observability hook a production
    pipeline attaches alongside its real output."""
    from pyspark.sql import Observation

    from adb_south_caucasus_etl_spark.sources.registry import Catalog

    obs = Observation("orders_dq")
    o = Catalog(spark, sf_dir).orders.observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.count_if(F.col("o_totalprice") <= 0).alias("bad_price"),
    )
    n = o.filter(F.col("o_orderstatus") == "F").count()
    assert n > 0
    got = obs.get
    assert got["rows_seen"] > 0 and got["bad_price"] == 0
