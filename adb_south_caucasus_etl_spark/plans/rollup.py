"""Materialized rollups (summary tables) — answer drilldown queries from a
pre-aggregated cube instead of the fact table.

The reference delegates every ``get_data`` call to its OLAP server, which
(like any tesseract-style engine) pre-aggregates hot drilldown combinations.
This module is the Spark-native version of that idea: materialize the cube
once at a FINE grain, then serve any COARSER drilldown by re-aggregating the
(tiny) rollup — at 100 TB the difference between a fact scan (minutes, full
cluster) and a summary-table scan (sub-second, one executor).

Correctness rule: only DISTRIBUTIVE aggregates (sum, count, min, max)
re-aggregate from partials. ALGEBRAIC ones (avg) are stored as their
additive components (sum + count) and recomposed at query time — never
avg-of-avgs. HOLISTIC ones (count_distinct, percentiles) do NOT fold from
partials at all; ``materialize_rollup`` rejects them so a user cannot
silently get wrong numbers (store an HLL sketch instead if approximate
distinct-at-any-grain is needed — see ``agg_approx_distinct``).

Scale notes: the materialize side is one shuffle (the fine-grain hash agg)
plus a partitioned write; the serve side scans only the rollup, whose row
count is bounded by the fine grain's cardinality product, and prunes
partitions when the coarse query cuts on the partition key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import Catalog
from .cube import DEFAULT_CUBES, CubeQuery, CubeSchema, _apply_cuts, _build_star, _needed_tables

#: aggs whose partials fold with a plain SUM at the coarser grain
_DISTRIBUTIVE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def _component_cols(
    schema: CubeSchema, measures: Sequence[str], sketch_distinct: bool = False
) -> list:
    """Fine-grain component expressions, one or two per measure."""
    cols = []
    for m in measures:
        meas = schema.measure(m)
        expr = F.lit(1) if meas.expr == "*" else F.expr(meas.expr)
        if meas.agg in ("sum", "min", "max"):
            fn = {"sum": F.sum, "min": F.min, "max": F.max}[meas.agg]
            cols.append(fn(expr).alias(f"{meas.out_name}__{meas.agg}"))
        elif meas.agg == "count":
            cols.append(F.count(expr).alias(f"{meas.out_name}__count"))
        elif meas.agg == "avg":
            cols.append(F.sum(expr).alias(f"{meas.out_name}__sum"))
            cols.append(F.count(expr).alias(f"{meas.out_name}__count"))
        elif meas.agg == "count_distinct" and sketch_distinct:
            # opt-in: store a mergeable Datasketches HLL sketch instead of
            # the unfoldable exact distinct — serve estimates at ANY grain
            cols.append(F.hll_sketch_agg(expr).alias(f"{meas.out_name}__hll"))
        else:
            raise ValueError(
                f"measure {m!r} uses holistic agg {meas.agg!r}: it cannot be "
                "re-aggregated from a rollup — query the fact table, or pass "
                "sketch_distinct=True to store a mergeable HLL sketch "
                "(approximate) for count_distinct measures"
            )
    return cols


def materialize_rollup(
    spark: SparkSession,
    sf_dir: str,
    query: CubeQuery,
    path: str,
    partition_by: Sequence[str] = (),
    cubes: dict[str, CubeSchema] | None = None,
    sketch_distinct: bool = False,
) -> None:
    """Aggregate the cube at ``query.drilldowns`` grain, storing additive
    COMPONENTS (``m__sum``/``m__count``/...) rather than finished measures,
    and write it hive-partitioned for pruning at serve time."""
    fine = _fine_grain(spark, sf_dir, query, cubes, sketch_distinct)
    writer = fine.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def _fine_grain(
    spark: SparkSession,
    sf_dir: str,
    query: CubeQuery,
    cubes: dict[str, CubeSchema] | None,
    sketch_distinct: bool,
) -> DataFrame:
    cubes = cubes or DEFAULT_CUBES
    schema = cubes[query.cube]
    catalog = Catalog(spark, sf_dir)
    star = _apply_cuts(
        _build_star(catalog, schema, _needed_tables(schema, query)),
        schema,
        query.cuts,
    )
    dd = [
        F.expr(schema.level(d).label_expr).alias(schema.level(d).out_name)
        for d in query.drilldowns
    ]
    return star.groupBy(*dd).agg(
        *_component_cols(schema, query.measures, sketch_distinct)
    )


def refresh_rollup_partitions(
    spark: SparkSession,
    sf_dir: str,
    query: CubeQuery,
    path: str,
    partition_col: str,
    partition_values: Sequence[object],
    cubes: dict[str, CubeSchema] | None = None,
    sketch_distinct: bool = False,
) -> None:
    """Incremental rollup maintenance: recompute ONLY the named partitions
    from the facts and dynamically overwrite them in place — late-arriving
    data for one day/year never forces a full rebuild. Uses Spark's
    dynamic partition-overwrite mode: untouched partitions keep their
    files, the listed ones are atomically replaced; the operation is
    idempotent (re-running a refresh rewrites identical rows), which is
    the recovery contract a scheduled 100 TB pipeline needs."""
    fine = _fine_grain(spark, sf_dir, query, cubes, sketch_distinct).filter(
        F.col(partition_col).isin(list(partition_values))
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        fine.write.mode("overwrite").partitionBy(partition_col).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def rollup_drilldown(
    spark: SparkSession,
    path: str,
    drilldowns: Sequence[str],
    measures: Sequence[str],
    cube: str = "lineitem",
    cubes: dict[str, CubeSchema] | None = None,
) -> DataFrame:
    """Serve a coarser drilldown from a materialized rollup: SUM the stored
    components over the coarse keys, then recompose algebraic measures
    (avg = folded sum / folded count). ``drilldowns`` must be a subset of
    the grain the rollup was materialized at."""
    cubes = cubes or DEFAULT_CUBES
    schema = cubes[cube]
    rollup = spark.read.parquet(path)
    keys = [schema.level(d).out_name for d in drilldowns]
    folds, finals = [], []
    for m in measures:
        meas = schema.measure(m)
        out = meas.out_name
        if meas.agg in ("sum", "min", "max"):
            folds.append(
                _DISTRIBUTIVE[meas.agg](f"{out}__{meas.agg}").alias(out)
            )
            finals.append(F.col(out))
        elif meas.agg == "count":
            folds.append(F.sum(f"{out}__count").alias(out))
            finals.append(F.col(out))
        elif meas.agg == "avg":
            folds.append(F.sum(f"{out}__sum").alias(f"{out}__sum"))
            folds.append(F.sum(f"{out}__count").alias(f"{out}__count"))
            finals.append(
                (F.col(f"{out}__sum") / F.col(f"{out}__count")).alias(out)
            )
        elif meas.agg == "count_distinct":
            # HLL sketches union losslessly at any grain; the estimate is
            # approximate (~2% at default lgK) — rows-only + pytest-gated
            folds.append(F.hll_union_agg(f"{out}__hll").alias(f"{out}__hll"))
            finals.append(F.hll_sketch_estimate(f"{out}__hll").alias(out))
        else:  # pragma: no cover - materialize_rollup already rejects
            raise ValueError(f"holistic agg {meas.agg!r} not servable")
    return rollup.groupBy(*keys).agg(*folds).select(*keys, *finals)


def backfill_missing_partitions(
    spark: SparkSession,
    sf_dir: str,
    query: CubeQuery,
    path: str,
    partition_col: str,
    cubes: dict[str, CubeSchema] | None = None,
) -> list:
    """Backfill orchestration: diff the partition values the FACTS produce
    against the ones the rollup sink already has (anti join on the
    partition key — two metadata-sized frames, one tiny shuffle), then
    dynamically overwrite exactly the missing ones. Returns the backfilled
    values (a small driver list by construction — it is the job manifest).
    Idempotent: a crashed backfill re-runs with the same diff minus
    whatever completed."""
    expected = (
        _fine_grain(spark, sf_dir, query, cubes, False)
        .select(partition_col)
        .distinct()
    )
    try:
        existing = spark.read.parquet(path).select(partition_col).distinct()
        missing_df = expected.join(existing, partition_col, "left_anti")
    except Exception:  # first run: sink does not exist yet
        missing_df = expected
    # bounded: distinct-partition manifest (anti-join of partition values)
    missing = [r[partition_col] for r in missing_df.collect()]
    if missing:
        refresh_rollup_partitions(
            spark, sf_dir, query, path, partition_col, missing, cubes
        )
    return sorted(missing)
