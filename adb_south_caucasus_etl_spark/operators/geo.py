"""Grid-blocked spatial distance join (SURVEY §2.Z Z3).

The standard way to run "all pairs within radius R" on a cluster without a
cross join: snap every point to a square grid cell of side >= R, equi-join
each left point's cell against the 3x3 neighborhood of right-point cells
(a bounded 9x fan-out on ONE side), then apply the exact distance filter.
Soundness: any two points within R are at most one cell apart on each axis
when the cell side is >= R, so every qualifying pair shares a (cell,
neighbor-cell) key — the residual filter only REMOVES false candidates.

Geometry here is planar on integer micro-degrees (scaled 1e6): squared
Euclidean distance in micro-degree units, all bigint, so engine and oracle
agree bit-for-bit. A true haversine variant only changes the residual
filter to transcendental math (and the cell size to R/cos(lat) at high
latitudes); the JOIN SHAPE — the part that matters at 100 TB — is
identical. Antimeridian wraparound is not handled (documented; production
grids use modular cell ids for that).

Scale: shuffle is an equi-join on cell ids; output is bounded by true
neighbor density x 9. No CartesianProduct anywhere in the plan. Skewed
cells (urban cores) are ordinary hot keys — AQE skew split applies, or
sub-tile the dense cells by one more grid level.

No counterpart in the reference; [NS] pipeline suite addition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: 3x3 neighborhood offsets applied to the RIGHT side at plan time
_NEIGHBOR_OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def grid_distance_join(
    left: DataFrame,
    right: DataFrame,
    radius_micro: int,
    cell_micro: int | None = None,
) -> DataFrame:
    """All (left, right) pairs with squared planar distance
    <= radius_micro^2, via grid blocking.

    Both inputs need integer micro-degree columns ``x`` and ``y`` plus an
    ``id`` column. ``cell_micro`` defaults to ``radius_micro`` (the
    smallest sound cell). Returns ``(left_id, right_id, dist2)``.
    """
    cell = int(cell_micro or radius_micro)
    if cell < radius_micro:
        raise ValueError(
            f"cell_micro {cell} < radius_micro {radius_micro}: 3x3 "
            "neighborhood blocking would miss qualifying pairs"
        )
    r2 = int(radius_micro) * int(radius_micro)

    lcell = left.select(
        F.col("id").alias("left_id"),
        F.col("x").alias("lx"),
        F.col("y").alias("ly"),
        F.expr(f"x div {cell}").alias("cx"),
        F.expr(f"y div {cell}").alias("cy"),
    )
    # replicate each right point into its 9 neighbor cells so the join is
    # a plain equi-join on (cx, cy); 9x on the (typically smaller) right
    # side beats any shuffle asymmetry a theta-join would force
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in _NEIGHBOR_OFFSETS
        ]
    )
    rcell = (
        right.select(
            F.col("id").alias("right_id"),
            F.col("x").alias("rx"),
            F.col("y").alias("ry"),
            F.expr(f"x div {cell}").alias("rcx"),
            F.expr(f"y div {cell}").alias("rcy"),
        )
        .withColumn("off", F.explode(offsets))
        .select(
            "right_id",
            "rx",
            "ry",
            (F.col("rcx") + F.col("off.dx")).alias("cx"),
            (F.col("rcy") + F.col("off.dy")).alias("cy"),
        )
    )
    dist2 = (F.col("lx") - F.col("rx")) * (F.col("lx") - F.col("rx")) + (
        F.col("ly") - F.col("ry")
    ) * (F.col("ly") - F.col("ry"))
    return (
        lcell.join(rcell, ["cx", "cy"])
        .withColumn("dist2", dist2.cast("bigint"))
        .filter(F.col("dist2") <= F.lit(r2))
        .select("left_id", "right_id", "dist2")
    )
