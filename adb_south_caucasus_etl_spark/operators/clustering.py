"""Distributed Lloyd k-means over embedding columns (SURVEY §2.R R1).

The canonical iterative-ML-on-Spark pattern, built on DataFrames only (no
MLlib dependency): centroids live on the driver (k x dim doubles — bounded
control-plane state), each iteration broadcasts them into the plan as
LITERALS, distance + argmin run entirely in JVM codegen (zip_with/
aggregate over the array column — no Python crossing, no UDF), and the
new means come back from one combiner-friendly aggregation. Iteration
count is fixed (training pipelines run Lloyd a fixed budget, convergence
is checked offline), so the lineage is a straight chain — no checkpoint
needed at small k; for huge k or dim move centroids from literals to a
broadcast join on a crossJoin'd centroid table.

Determinism: init picks the k vectors with the smallest md5_u32(id) —
derandomized like every sample in this repo, so retries/partitioning/
cluster size cannot change the clustering. Distances tie-break to the
smallest centroid id (array_min over (dist, cid) structs). Float caveat:
per-component centroid means are double sums whose order Spark controls —
a bit-identical external oracle is impossible (the numpy replica in
tests/test_round5_ops.py matches to 1e-9 and asserts identical
assignments), so the registered query is rows-only by design.

Scale: one pass per iteration, shuffle = k x dim partial sums per mapper
(map-side combine), driver traffic = k x dim doubles per iteration. The
standard way to k-means a 100 TB embedding table; for k beyond literal-
expansion comfort (~thousands), pre-assign with an ANN index (see
operators/similarity.py ivf_topk) and Lloyd only refines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .curation import md5_u32


def _dist2(vec, centroid: list[float]):
    """Squared L2 distance between an array column and a literal centroid,
    fully JVM-side."""
    lit = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec, lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kmeans_lloyd(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iterations: int = 5,
) -> DataFrame:
    """Run ``iterations`` Lloyd steps; returns (id, cluster_id, dist2) —
    the final assignment with its squared distance."""
    base = df.select(
        F.col(id_col).alias("__id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v"),
    )

    # derandomized init: k rows with the smallest md5_u32(id); k-row
    # driver collect (bounded control-plane, like the CC convergence probe)
    seed_rows = (
        base.withColumn("__h", md5_u32(F.col("__id")))
        .orderBy("__h", "__id")
        .limit(k)
        .collect()  # bounded: k seed rows by construction
    )
    centroids = [list(r["__v"]) for r in seed_rows]

    assigned = None
    for _ in range(iterations):
        dists = F.array(
            *[
                F.struct(
                    _dist2(F.col("__v"), c).alias("d"),
                    F.lit(i).alias("c"),
                )
                for i, c in enumerate(centroids)
            ]
        )
        best = F.array_min(dists)
        assigned = base.select(
            "__id",
            "__v",
            best["c"].alias("cluster_id"),
            best["d"].alias("dist2"),
        )
        # new means: elementwise avg via posexplode → (cluster, pos) avg →
        # k x dim rows back to the driver (bounded control-plane)
        means = (
            assigned.select(
                "cluster_id", F.posexplode("__v").alias("pos", "x")
            )
            .groupBy("cluster_id", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()  # bounded: k x dim centroid aggregate rows
        )
        new_c = {}
        for r in means:
            new_c.setdefault(r["cluster_id"], {})[r["pos"]] = r["m"]
        centroids = [
            [new_c[i][p] for p in sorted(new_c[i])] if i in new_c
            else centroids[i]  # empty cluster keeps its centroid
            for i in range(k)
        ]

    return assigned.select(
        F.col("__id").alias(id_col), "cluster_id", "dist2"
    )
