"""Distributed graph analytics on DataFrames (SURVEY §2.Z Z1–Z2).

Two classic large-graph kernels re-expressed as pure equi-join/agg plans,
both ENGINE-EXACT (bit-identical to an independent SQL oracle) by keeping
every intermediate an integer:

- :func:`pagerank_integer` — PageRank with INTEGER mass. Real PageRank is a
  float fixpoint whose summation order no two engines share; here each node
  starts with a large integer mass and every step sends ``mass div out_deg``
  to each out-neighbor, damps with ``(d_num * in_mass) div d_den``, and adds
  an integer teleport base. ``div`` (floor division on non-negative ints) is
  deterministic in every engine, so a fixed-iteration run hash-matches an
  external oracle EXACTLY — a property float PageRank cannot have. The
  ranking it induces converges to float PageRank's as mass0 grows (mass0 =
  1e12 ⇒ relative quantization error ~1e-9 per step). Dangling-node mass is
  dropped (documented simplification, standard in MapReduce formulations).

- :func:`triangle_count` — triangle counting via DEGREE ORDERING (the
  MapReduce-compatible algorithm of Suri & Vassilvitskii, WWW'11 "Counting
  triangles and the curse of the last reducer"): orient each undirected edge
  from the endpoint of smaller (degree, id) to the larger, enumerate wedges
  only at each edge's LOWER-degree endpoint, and close them with one more
  equi-join. Wedge count is bounded by O(m^{3/2}) regardless of skew — a
  celebrity node with 10M neighbors generates no wedges at itself because
  every edge points INTO it. The naive triple self-join explodes exactly
  there.

Scale: both are shuffle-on-key joins and combiner-friendly counts — no
cross products, no driver state beyond the plan. PageRank's per-iteration
lineage is a straight chain; for many iterations checkpoint every ~5 like
connected_components (operators/dedup.py) does.

No counterpart in the reference (oec.py is an HTTP client); these are
[NS] additions from the north-star pipeline suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_integer(
    edges: DataFrame,
    iterations: int = 3,
    mass0: int = 1_000_000_000_000,
    damping_num: int = 85,
    damping_den: int = 100,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """Fixed-iteration integer-mass PageRank.

    ``edges`` must have columns ``src`` and ``dst`` (directed; pass both
    directions for an undirected graph). Returns ``(node, mass)`` after
    ``iterations`` steps. All arithmetic is bigint ``div`` — bit-exact
    across engines. Teleport base is ``((d_den - d_num) * mass0) div
    d_den`` per node (uniform), incoming mass is damped by
    ``d_num/d_den``.

    ``seeds`` (optional, one ``node`` column) switches to PERSONALIZED
    PageRank: initial mass and the teleport base go to seed nodes ONLY
    (non-seeds start at 0 and receive no teleport), so the stationary
    mass measures proximity to the seed set — the recommendation /
    similar-entities workhorse. Same integer arithmetic, same bit-exact
    cross-engine property.
    """
    # NOTE measured: localCheckpoint/persist here made the loop ~2x
    # SLOWER on local[32] — the per-iteration subtrees are byte-identical,
    # so Catalyst's ReusedExchange already serves the repeated edge scan
    # from the first shuffle's output; materializing breaks that reuse.
    # Checkpointing EDGES once before the loop was also measured (sf0.1,
    # min-of-3 isolated): 4.51s vs 4.17s as-is — the materialization
    # costs more than the ~3 redundant FileScans it removes. Reuse is
    # therefore load-bearing (pinned by test_plan_shapes.py). On a
    # multi-executor cluster with eviction pressure, checkpoint every
    # ~5 iterations instead (the connected-components rule).
    edges = edges.select("src", "dst").distinct()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    out_deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    base = (damping_den - damping_num) * mass0 // damping_den

    if seeds is not None:
        seed_flag = seeds.select(F.col("node")).distinct().withColumn(
            "is_seed", F.lit(True)
        )
        nodes = nodes.join(seed_flag, "node", "left").withColumn(
            "is_seed", F.coalesce(F.col("is_seed"), F.lit(False))
        )
        base_col = F.when(F.col("is_seed"), F.lit(base)).otherwise(
            F.lit(0)
        ).cast("bigint")
        init_col = F.when(F.col("is_seed"), F.lit(mass0)).otherwise(
            F.lit(0)
        ).cast("bigint")
    else:
        base_col = F.lit(base).cast("bigint")
        init_col = F.lit(mass0).cast("bigint")

    rank = nodes.withColumn("mass", init_col)
    # SHUFFLE_HASH hints on the loop joins (r16, guide §3.1 — pick the
    # strategy deliberately, per-join where measured): every hinted build
    # side is NODE-grain (out_deg, the per-node share frame, the in_mass
    # sums) — strictly bounded by nodes/shuffle-partitions, never
    # edge-grain — so the per-partition hash maps stay small while SHJ
    # skips the sort of BOTH sides that sort-merge pays 3x per iteration.
    # Interleaved A/B at sf0.1 (one JVM, 5 alternating reps): 9 SMJ -> 9
    # SHJ, median 3.23 -> 3.00 s, min 3.05 -> 2.92 s; results
    # bit-identical (integer arithmetic, join strategy is value-neutral).
    # This is the per-join re-application VERDICT r15 asked for after the
    # session-wide preferSortMergeJoin flip was reverted.
    for _ in range(iterations):
        # share going to EACH out-neighbor; dangling nodes have no row in
        # out_deg and simply send nothing (their damped mass evaporates).
        sends = (
            rank.join(out_deg.hint("shuffle_hash"), "node")
            .select(
                F.col("node").alias("src"),
                F.expr("mass div out_deg").alias("share"),
            )
            .hint("shuffle_hash")
            .join(edges, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("share").alias("in_mass"))
        )
        rank = (
            nodes.join(sends.hint("shuffle_hash"), "node", "left")
            .withColumn(
                "mass",
                (
                    base_col
                    + F.expr(
                        f"({damping_num} * coalesce(in_mass, 0L))"
                        f" div {damping_den}"
                    )
                ).cast("bigint"),
            )
            .select("node", "mass")
        )
    return rank


def triangle_count(edges: DataFrame) -> DataFrame:
    """Global triangle count over an undirected simple graph.

    ``edges`` needs columns ``a`` and ``b`` (one row per undirected edge,
    any orientation; self-loops and duplicates are removed here). Returns
    a single row ``(n_nodes, n_edges, n_wedges, n_triangles)``.

    Degree-ordered orientation: edge {u,v} becomes u→v iff
    (deg(u), u) < (deg(v), v). Every triangle then has exactly ONE node
    with two out-edges (its minimum under the order), so counting closed
    wedges counts each triangle exactly once.
    """
    und = (
        edges.filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .distinct()
        # pinned (r15): four consumers (two degree union branches, the
        # orientation join, the n_edges ledger count) each re-ran the
        # distinct's final hash aggregate over the full canonicalized
        # edge stream — at this query's grain that is the output of the
        # co-purchase self-join, the widest frame in the plan
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionByName(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(
        F.col("node").alias("u"), F.col("deg").alias("du")
    )
    dv = deg.select(
        F.col("node").alias("v"), F.col("deg").alias("dv")
    )
    # orient low → high under (deg, id)
    oriented = (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("s"), F.col("v").alias("t")),
            )
            .otherwise(
                F.struct(F.col("v").alias("s"), F.col("u").alias("t"))
            )
            .alias("e")
        )
        .select(F.col("e.s").alias("s"), F.col("e.t").alias("t"))
        # pinned (r15, guide §3.3): three consumers (both wedge sides
        # and the closing list) re-ran the edge-build + degree joins
        # above the reused exchanges; the pin materializes m oriented
        # 16-byte edges once. (Contrast pagerank_integer's NOTE — there
        # the loop subtrees reuse one exchange and a pin LOSES; here
        # each consumer re-executed two joins, measured ~20% off the
        # whole query at sf0.1.)
        .localCheckpoint(eager=True)
    )
    e1 = oriented.alias("e1")
    e2 = oriented.alias("e2")
    # wedges at the low node: s → {t1, t2} with t1 < t2 (canonicalized by
    # id — a pure projection, no shuffle)
    wedges = (
        e1.join(e2, F.col("e1.s") == F.col("e2.s"))
        .filter(F.col("e1.t") < F.col("e2.t"))
        .select(
            F.least(F.col("e1.t"), F.col("e2.t")).alias("w1"),
            F.greatest(F.col("e1.t"), F.col("e2.t")).alias("w2"),
        )
    )
    # close the wedge: the third edge is oriented w1→w2 or w2→w1 — but
    # under a total order it is exactly min→max of (deg,id); joining on
    # the canonical (least, greatest) form covers either orientation.
    # The closing side is 16 B/edge — LINEAR in the edge list, so a
    # hardcoded broadcast hint would be a driver OOM at cluster-scale
    # graphs (tens of GB of edges). No hint: AQE reads the closing
    # side's RUNTIME shuffle size and flips the sort-merge join to
    # broadcast only when it actually fits (it does at test SFs); on a
    # giant graph the plan stays a shuffle join on (w1, w2), which both
    # sides hash-partition — the O(m^1.5) wedge stream still never
    # collects anywhere. test_plan_shapes.py pins the no-hint shape by
    # asserting the join degrades to SortMergeJoin when the broadcast
    # threshold is forced off.
    closing = oriented.select(
        F.least("s", "t").alias("w1"),
        F.greatest("s", "t").alias("w2"),
        F.lit(1).alias("closed"),
    )
    tri = wedges.join(closing, ["w1", "w2"], "left").agg(
        F.count(F.lit(1)).alias("n_wedges"),
        F.coalesce(F.sum("closed"), F.lit(0)).alias("n_triangles"),
    )
    summary = (
        deg.agg(F.count(F.lit(1)).alias("n_nodes"))
        .crossJoin(und.agg(F.count(F.lit(1)).alias("n_edges")))
        .crossJoin(tri)
    )
    return summary.select(
        F.col("n_nodes").cast("bigint").alias("n_nodes"),
        F.col("n_edges").cast("bigint").alias("n_edges"),
        F.col("n_wedges").cast("bigint").alias("n_wedges"),
        F.col("n_triangles").cast("bigint").alias("n_triangles"),
    )
