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

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .curation import md5_u32


def lit_double_array(values) -> "F.Column":
    """``array<double>`` literal built with ONE SQL parse instead of one
    py4j round trip per element. ``F.array(*[F.lit(x) ...])`` costs
    ~1 ms of driver↔JVM latency per scalar, so a dim-64 centroid is
    ~64 ms of pure PLAN-BUILD time — and the iterative operators here
    rebuild such literals k× per training round (measured r15:
    kmeans_lloyd spent 3.2 s of its 4.0 s wall in py4j literal
    construction; the parsed form is 6 ms for the same five rounds).
    ``repr(float)`` is the shortest round-trip representation, so the
    parsed literal is BIT-IDENTICAL to the F.lit one (verified incl.
    -0.0 sign and subnormals); non-finite values fall back to the py4j
    form (SQL has no inf/nan double literal)."""
    vals = [float(x) for x in values]
    if all(math.isfinite(x) for x in vals):
        return F.expr(_double_array_sql_unchecked(vals))
    return F.array(*[F.lit(x) for x in vals])


def _double_array_sql_unchecked(vals: list[float]) -> str:
    return "array(" + ",".join(repr(x) + "D" for x in vals) + ")"


def double_array_sql(values) -> str | None:
    """SQL text of an ``array<double>`` literal (same bit-identical
    ``repr`` contract as :func:`lit_double_array`), for callers that
    embed the literal inside a LARGER generated expression so the whole
    thing costs ONE parse (r16 — the §18/§19 one-parse class extended
    from leaf literals to composite expressions). Returns ``None`` for
    non-finite values — the caller must fall back to the Column form."""
    vals = [float(x) for x in values]
    if all(math.isfinite(x) for x in vals):
        return _double_array_sql_unchecked(vals)
    return None


def _dist2(vec, centroid: list[float]):
    """Squared L2 distance between an array column and a literal centroid,
    fully JVM-side."""
    lit = lit_double_array(centroid)
    return F.aggregate(
        F.zip_with(vec, lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cell_topn_udf(centroids: list[list[float]], n: int):
    """Vectorized top-``n``-nearest-cells assignment against UNIT-norm
    centroids: one Arrow-batched numpy matmul per batch, descending dot
    product, ties to the smallest cell id (stable argsort — exactly
    ``kmeans_lloyd``'s struct tie-break extended past the argmin).
    Ranking by dot against unit centroids is invariant to positive row
    scale, so callers can feed RAW vectors (no pre-normalization); an
    all-zero vector ties everywhere and deterministically probes cells
    ``0..n-1``.

    This is the same deliberate, measured Python-UDF exception as
    ``similarity._table_buckets_udf``, for the same two reasons
    compounded: the per-centroid literal-expression formulation costs
    one py4j call per scalar at plan build (~14 s for the trained-IVF
    query at 16×64 literals across two join sides and five training
    iterations), and the one-parse higher-order ``transform``
    alternative fixes the build but EXECUTES interpreted — Spark's HOF
    path evaluates the lambda per element with no codegen, measured
    ~2 s per 2000×16×64 assignment pass. The (batch × dim) @
    (dim × k) matmul is both the fast and the scale-shaped path."""
    C = np.asarray(centroids, dtype=np.float64)  # (k, dim)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def topn(vs: pd.Series) -> pd.Series:
        if not len(vs):
            return pd.Series([], dtype=object)
        v = np.asarray(vs.tolist(), dtype=np.float64)  # (n_rows, dim)
        sims = v @ C.T
        order = np.argsort(-sims, axis=1, kind="stable")[:, :n]
        return pd.Series(order.astype("int32").tolist())

    return topn


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
        # whole distance array in ONE SQL parse per round (r16 — the
        # §18/§19 one-parse class): the Column form made ~8 py4j round
        # trips per centroid per round. Resolved tree identical (same
        # zip_with/aggregate chain, same summation order — the stamped
        # inertia rounding is untouched); non-finite centroids (never
        # produced by the mean update, defensive only) fall back.
        arrs = [double_array_sql(c) for c in centroids]
        if all(a is not None for a in arrs):
            dists = F.expr(
                "array(%s)"
                % ",".join(
                    f"struct(aggregate(zip_with(__v, {arr}, (a, b) ->"
                    " (a - b) * (a - b)), 0.0D, (acc, x) -> acc + x)"
                    f" AS d, {i} AS c)"
                    for i, arr in enumerate(arrs)
                )
            )
        else:
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


def spherical_centroids(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    iterations: int = 5,
    unit: DataFrame | None = None,
) -> list[list[float]]:
    """SPHERICAL k-means centroids (unit-norm, cosine geometry) — the
    trained coarse quantizer for :func:`~..similarity.ivf_trained_topk`
    (FAISS-style IVF trains its cell centroids instead of hashing with
    random hyperplanes; Dhillon & Modha, Mach. Learn. 2001 for the
    spherical variant).

    Same control-plane pattern as :func:`kmeans_lloyd`: centroids live
    on the driver (k × dim doubles), assignment is a vectorized
    Arrow-batched matmul argmax (:func:`cell_topn_udf` — the measured
    fast path; the JVM literal/HOF formulations lose at plan build and
    interpreted execution respectively), new means come back
    from one combiner-friendly ``(cluster, pos)`` aggregation. Two
    deltas for cosine geometry: rows are L2-NORMALIZED up front
    (zero-norm rows are dropped — they have no direction to cluster;
    cosine against them is the module's documented NaN case), and each
    round's mean is re-normalized on the driver, so the L2 argmin
    against unit centroids IS the cosine argmax (``‖x−c‖² = 2−2cosθ``
    on the sphere) — and it reuses Lloyd's exact tie-break (smallest
    centroid id). Empty clusters keep their centroid. Deterministic
    init: k rows with the smallest ``md5_u32(id)``.

    Scale: identical to Lloyd — one pass per iteration, k × dim partial
    sums per mapper, k × dim doubles of driver traffic per round. Train
    on a deterministic sample (``md5_bucket`` filter upstream) when the
    corpus is 100 TB; the quantizer needs cluster shape, not every row.

    ``unit`` (r15, guide §1.2 — don't compute things twice): a caller
    that ALREADY holds the unit-normalized, zero-norm-filtered, PINNED
    ``(id, vec)`` frame (``similarity._unit_vectors`` output — its
    ``zip_with(v,v,x*y)`` norm is expression-for-expression the same
    float pipeline as the ``transform(v,x*x)`` norm here, so the values
    are bit-identical) passes it in and the trainer skips its own
    normalize+checkpoint pass entirely: one corpus scan and one
    checkpoint job serve both the trainer and the caller's encode
    stage. Columns are taken positionally as (id, vec).

    Determinism caveat (ADVICE r12): init and iteration budget are
    fixed, but each round's means come from ``F.avg`` partial
    aggregates whose FLOAT COMBINE ORDER follows the partition layout —
    trained centroids are bit-stable only for a fixed partitioning
    (local[32] with pinned shuffle partitions in this repo's gates).
    Across cluster configs the centroids can differ in final ulps,
    which can flip a cell-boundary assignment; downstream recall floors
    must therefore carry a margin (the IVF twin stamps 0.94 vs a 0.9
    floor), not assume bit-identical centroids. Making the mean
    order-insensitive would need fixed-point/decimal sums — not worth
    the cast cost for a quantizer whose QUALITY, not bit pattern, is
    the contract.
    """
    if unit is not None:
        uid, uvec = unit.columns[0], unit.columns[1]
        unit = unit.select(
            F.col(uid).alias("__id"), F.col(uvec).alias("__v")
        )
        seed_rows = (
            unit.withColumn("__h", md5_u32(F.col("__id")))
            .orderBy("__h", "__id")
            .limit(k)
            .collect()  # bounded: k seed rows by construction
        )
        return _spherical_rounds(unit, seed_rows, k, iterations)

    base = df.select(
        F.col(id_col).alias("__id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(
            "__v"
        ),
    )
    nrm = F.sqrt(
        F.aggregate(
            F.transform("__v", lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    # nullif keeps the division ANSI-TOTAL: Catalyst merges the guard
    # filter and this projection into one stage and may evaluate the
    # division as a shared subexpression BEFORE the __n > 0 predicate
    # (observed: DIVIDE_BY_ZERO from inside the filter's codegen on a
    # zero vector) — dividing by NULL instead yields NULL, and the row
    # is filtered either way
    # pinned ONCE (the iterative-ML caching discipline, as in
    # center_corpus): the seed job and every Lloyd round read the
    # lineage-truncated RDD instead of re-running the scan + the
    # interpreted-HOF normalization (~0.7 s/pass at sf0.1 — it was
    # re-executed 6x). At 100 TB train on a md5_bucket sample upstream;
    # the pin then holds the sample, not the corpus.
    unit = (
        base.select("__id", "__v", nrm.alias("__n"))
        .filter(F.col("__n") > 0.0)
        .select(
            "__id",
            F.transform(
                "__v", lambda x: x / F.nullif(F.col("__n"), F.lit(0.0))
            ).alias("__v"),
        )
        .localCheckpoint(eager=True)
    )
    seed_rows = (
        unit.withColumn("__h", md5_u32(F.col("__id")))
        .orderBy("__h", "__id")
        .limit(k)
        .collect()  # bounded: k seed rows by construction
    )
    return _spherical_rounds(unit, seed_rows, k, iterations)


def _spherical_rounds(
    unit: DataFrame, seed_rows, k: int, iterations: int
) -> list[list[float]]:
    """The Lloyd rounds of :func:`spherical_centroids` over a pinned
    unit-norm ``(__id, __v)`` frame — split out so the caller-supplied-
    ``unit`` fast path and the normalize-here path run the exact same
    loop (bit-identical means, same tie-breaks)."""
    import math

    if not seed_rows:
        raise ValueError(
            "spherical_centroids: no rows with a non-zero-norm vector — "
            "nothing to cluster on the unit sphere"
        )
    centroids = [list(r["__v"]) for r in seed_rows]

    for _ in range(iterations):
        # vectorized assignment (see cell_topn_udf): argmax dot against
        # unit centroids over unit rows == the L2 argmin, one Arrow
        # matmul per batch instead of interpreted per-element lambdas
        assign = cell_topn_udf(centroids, 1)
        assigned = unit.select(
            "__v",
            F.element_at(assign(F.col("__v")), 1).alias("cluster_id"),
        )
        means = (
            assigned.select(
                "cluster_id", F.posexplode("__v").alias("pos", "x")
            )
            .groupBy("cluster_id", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()  # bounded: k x dim centroid aggregate rows
        )
        new_c: dict[int, dict[int, float]] = {}
        for r in means:
            new_c.setdefault(r["cluster_id"], {})[r["pos"]] = r["m"]
        out = []
        for i in range(len(centroids)):
            if i not in new_c:
                out.append(centroids[i])  # empty cluster keeps centroid
                continue
            v = [new_c[i][p] for p in sorted(new_c[i])]
            nv = math.sqrt(sum(x * x for x in v))
            # a zero mean (perfectly cancelling cluster) keeps the old
            # direction rather than dividing by zero
            out.append([x / nv for x in v] if nv > 0.0 else centroids[i])
        centroids = out
    return centroids


def center_corpus(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[float], int]:
    """Centered, localCheckpoint-PINNED embedding corpus — the shared
    setup of every spectral operator here (:func:`top_principal_component`
    and the blocked :func:`top_k_principal_components`). Returns
    ``(cent, mu, n)``: the pinned ``(__id, __c)`` frame, the per-dim
    means, and the row count.

    Split out so multi-component queries (PC2 by deflation, top-k
    subspace iteration) center and pin ONCE instead of once per
    component (ADVICE r11: embedding_pca_second rebuilt the pin twice).

    Input validation (ADVICE r11): an empty corpus raises a descriptive
    ValueError instead of IndexError, and ragged vectors — per-dim
    non-null counts that disagree, i.e. NULL cells or mixed lengths —
    raise instead of silently skewing the means and eigenvalues. Rows
    whose ENTIRE vector is NULL never reach posexplode (Spark drops
    them), so they are excluded from the corpus by construction, which
    the count check cannot and should not flag."""
    base = df.select(
        F.col(id_col).alias("__id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(
            "__v"
        ),
    )
    # per-dim means: dim rows back to the driver
    mean_rows = (
        base.select(F.posexplode("__v").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.avg("x").alias("m"), F.count("x").alias("n"))
        .collect()  # bounded: dim aggregate rows (control plane)
    )
    if not mean_rows:
        raise ValueError(
            "center_corpus: empty embedding corpus — no rows with a "
            "non-null vector, so there is no mean to center on"
        )
    counts = {r["n"] for r in mean_rows}
    if len(counts) != 1:
        raise ValueError(
            "center_corpus: ragged corpus — per-dimension non-null "
            f"counts disagree ({sorted(counts)}): vectors have mixed "
            "lengths or NULL cells, which would silently skew the "
            "covariance"
        )
    mean_rows.sort(key=lambda r: r["pos"])
    mu = [r["m"] for r in mean_rows]
    n = mean_rows[0]["n"]
    mu_lit = lit_double_array(mu)
    # centered corpus, pinned ONCE — every iteration reads the
    # lineage-truncated RDD instead of re-scanning the source
    cent = base.select(
        "__id",
        F.zip_with("__v", mu_lit, lambda x, m: x - m).alias("__c"),
    ).localCheckpoint(eager=True)
    return cent, mu, n


def top_principal_component(
    df: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iterations: int = 3,
    orthogonal_to: list[float] | None = None,
    centered: tuple[DataFrame, list[float], int] | None = None,
) -> DataFrame:
    """Top principal component of an embedding table by POWER ITERATION
    — the spectral sibling of :func:`kmeans_lloyd`, same Spark pattern:
    the iterate ``v`` lives on the driver (dim doubles — bounded
    control-plane state), each step broadcasts it into the plan as
    LITERALS, and the matvec ``w = Cᵀ(Cv)`` comes back from one
    combiner-friendly per-dimension aggregation (never materializing
    the dim×dim covariance). Centering means and the per-step ``w`` are
    the only driver round-trips (dim doubles each).

    Determinism: ``v₀ = 1/√dim`` (all-positive, so the returned sign is
    the eigenvector's correlation with the uniform direction), a fixed
    iteration budget, and pure float arithmetic whose operand ORDER an
    external oracle can restate — each step is two grouped sums, no
    argmin/tie-break anywhere, so unlike Lloyd's assignments the result
    is oracle-roundable (drift is 1-ulp-per-sum class, absorbed by
    round-4).

    Returns dim rows ``(dim, loading, eigval)``: the unit top
    eigenvector of the sample covariance ``(1/n) Σ (x-μ)(x-μ)ᵀ`` after
    ``iterations`` steps, with the Rayleigh-style eigenvalue estimate
    ``‖w‖/n`` computed IN Spark (the final normalize is a crossJoin
    with the norm aggregate, not a driver step).

    100 TB shape: the centered corpus is materialized once
    (localCheckpoint — the iterative-ML caching discipline); each
    iteration is one JVM-expression pass for the scores plus one
    posexplode aggregation for the matvec, shuffling dim partial sums
    per mapper. Driver traffic = dim doubles per iteration.

    Pass ``centered=`` (the :func:`center_corpus` triple) to reuse an
    already-pinned corpus across components — PC2-by-deflation and the
    audit twins call this twice on the same table, and without reuse
    each call re-scans, re-centers, and re-pins (ADVICE r11).
    """
    import math

    if iterations < 2:
        raise ValueError(
            "top_principal_component needs iterations >= 2: the "
            "zero-variance guard lives on the driver-side normalize, "
            "and a 1-step run would skip it and emit 0/0 NULL loadings"
        )
    if centered is None:
        if df is None:
            raise ValueError(
                "top_principal_component needs either df= or centered="
            )
        centered = center_corpus(df, id_col=id_col, vec_col=vec_col)
    cent, mu, n = centered
    dim = len(mu)

    if orthogonal_to is not None:
        # DEFLATION for lower components: iterate in the subspace
        # orthogonal to a previously-found unit direction u by removing
        # each row's projection, c := c - (c·u)u. The projection is a
        # NAMED column (the aHash CollapseProject lesson: an inlined
        # 64-term sum referenced dim times explodes the expression
        # tree), and the deflated corpus is re-pinned so the iterations
        # below read one frame either way.
        if len(orthogonal_to) != dim:
            raise ValueError(
                "orthogonal_to must have one loading per dimension: "
                f"got {len(orthogonal_to)}, corpus is {dim}-dim"
            )
        u_lit = lit_double_array(orthogonal_to)
        proj = F.aggregate(
            F.zip_with("__c", u_lit, lambda c, u: c * u),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        cent = (
            cent.select("__id", "__c", proj.alias("__p"))
            .select(
                "__id",
                F.zip_with(
                    "__c", u_lit, lambda c, u: c - F.col("__p") * u
                ).alias("__c"),
            )
            .localCheckpoint(eager=True)
        )

    v = [1.0 / math.sqrt(dim)] * dim

    def w_frame(v_now: list[float]) -> DataFrame:
        # one SQL parse (r16 — §18/§19 one-parse class), Column fallback
        # for non-finite iterates (never produced by the MGS normalize)
        arr = double_array_sql(v_now)
        if arr is not None:
            score = F.expr(
                f"aggregate(zip_with(__c, {arr}, (c, b) -> c * b),"
                " 0.0D, (acc, x) -> acc + x) AS __s"
            )
        else:
            score = F.aggregate(
                F.zip_with("__c", lit_double_array(v_now), lambda c, b: c * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("__s")
        scored = cent.select("__c", score)
        return (
            scored.select(F.posexplode("__c").alias("pos", "c"), "__s")
            .groupBy("pos")
            .agg(F.sum(F.col("c") * F.col("__s")).alias("w"))
        )

    for _ in range(iterations - 1):
        rows = w_frame(v).collect()  # bounded: dim aggregate rows
        rows.sort(key=lambda r: r["pos"])
        nrm = math.sqrt(sum(r["w"] * r["w"] for r in rows))
        if nrm == 0.0:
            # zero-variance corpus (all rows identical, or a single
            # row): the covariance is the zero matrix and there is no
            # principal direction — fail loudly instead of dividing by
            # zero here or emitting 0/0 NULL loadings from the final
            # in-Spark normalize
            raise ValueError(
                "top_principal_component: zero-variance corpus — the "
                "centered matvec vanished, no principal direction "
                "exists"
            )
        v = [r["w"] / nrm for r in rows]

    # final step stays IN Spark: normalize w against its own norm
    # aggregate and attach the eigenvalue estimate ||w|| / n plus its
    # explained-variance share against the total variance
    # trace(C) = sum(c^2) / n, read from the same pinned corpus
    w = w_frame(v)
    nw = w.agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("__nw")
    )
    totvar = cent.agg(
        (
            F.sum(
                F.aggregate(
                    F.transform("__c", lambda c: c * c),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            )
            / F.lit(float(n))
        ).alias("__tv")
    )
    return (
        w.crossJoin(F.broadcast(nw))
        .crossJoin(F.broadcast(totvar))
        .select(
            F.col("pos").cast("int").alias("dim"),
            (F.col("w") / F.col("__nw")).alias("loading"),
            (F.col("__nw") / F.lit(float(n))).alias("eigval"),
            (F.col("__nw") / F.lit(float(n)) / F.col("__tv")).alias(
                "var_share"
            ),
        )
    )


def top_k_principal_components(
    df: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    iterations: int = 3,
    centered: tuple[DataFrame, list[float], int] | None = None,
) -> DataFrame:
    """Top-``k`` principal components by BLOCKED ORTHOGONAL ITERATION
    (subspace iteration — Golub & Van Loan §8.2): the k-column iterate
    ``V`` lives on the driver (dim × k doubles — control plane), each
    round is ONE k-column matvec ``W = Cᵀ(C V)`` over the pinned
    centered corpus (k dot products per row, then one posexplode
    aggregation emitting k sums per dimension — the covariance is never
    materialized), followed by re-orthonormalization via MODIFIED
    GRAM-SCHMIDT. Sequential deflation (:func:`top_principal_component`
    ``orthogonal_to=``) pays one full driver round-trip PER COMPONENT
    per step; here every component advances in the same pass (VERDICT
    r11 item 6).

    Determinism and oracle-roundability, same contract as PC1: ``V₀``
    is the exact-literal block-indicator basis (column j = 1/√(dim/k)
    on its own dim/k-chunk — requires ``dim % k == 0``), the iteration
    budget is fixed, and every step is grouped sums + MGS divisions an
    external oracle restates verbatim; round-4 absorbs the
    1-ulp-per-sum drift. Intermediate MGS rounds run on the driver
    (dim × k doubles in, same out); the FINAL round's matvec and MGS
    stay IN Spark — the residual norms of that MGS are exactly the
    ``R_jj`` of the QR, so ``eigval_j = R_jj / n`` (the orthogonal-
    iteration eigenvalue estimate) rides the same frame for free. A
    rank-deficient corpus (some R_jj = 0) yields NULL loadings for the
    dead component via the nullif-guarded divide (ANSI-total, same
    speculative-evaluation rationale as :func:`spherical_centroids`);
    the driver-side MGS rounds raise on it first with a descriptive
    error.

    Returns k × dim rows ``(component, dim, loading, eigval)``,
    component 1-based in decreasing-eigenvalue order.

    100 TB shape: per round, one JVM-expression pass for the k scores
    plus one posexplode aggregation shuffling dim × k partial sums per
    mapper; driver traffic dim × k doubles. The final MGS is k(k+1)/2
    scalar aggregates over a PINNED dim-row frame (localCheckpoint —
    without the pin each aggregate would re-run the matvec).
    """
    import math

    if iterations < 2:
        raise ValueError(
            "top_k_principal_components needs iterations >= 2 (the "
            "same driver-side zero-variance guard argument as "
            "top_principal_component)"
        )
    if centered is None:
        if df is None:
            raise ValueError(
                "top_k_principal_components needs either df= or "
                "centered="
            )
        centered = center_corpus(df, id_col=id_col, vec_col=vec_col)
    cent, mu, n = centered
    dim = len(mu)
    if k < 1 or k > dim:
        raise ValueError(f"k must be in [1, {dim}], got {k}")
    if dim % k != 0:
        raise ValueError(
            f"dim ({dim}) must be divisible by k ({k}) so the "
            "block-indicator V0 is an exact SQL literal"
        )
    block = dim // k
    val = 1.0 / math.sqrt(block)
    v = [
        [val if i // block == j else 0.0 for i in range(dim)]
        for j in range(k)
    ]  # k columns of length dim

    def w_frame(v_now: list[list[float]]) -> DataFrame:
        # one SQL parse per score column (r16 — §18/§19 one-parse
        # class): literal array + both lambdas in one string; resolved
        # tree and summation order identical to the Column form
        scores = []
        for j in range(k):
            arr = double_array_sql(v_now[j])
            if arr is not None:
                scores.append(
                    F.expr(
                        f"aggregate(zip_with(__c, {arr}, (c, b) ->"
                        " c * b), 0.0D, (acc, x) -> acc + x)"
                        f" AS __s{j + 1}"
                    )
                )
            else:
                scores.append(
                    F.aggregate(
                        F.zip_with(
                            "__c",
                            lit_double_array(v_now[j]),
                            lambda c, b: c * b,
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ).alias(f"__s{j + 1}")
                )
        scored = cent.select("__c", *scores)
        return (
            scored.select(
                F.posexplode("__c").alias("pos", "c"),
                *[f"__s{j + 1}" for j in range(k)],
            )
            .groupBy("pos")
            .agg(
                *[
                    F.sum(F.col("c") * F.col(f"__s{j + 1}")).alias(
                        f"w{j + 1}"
                    )
                    for j in range(k)
                ]
            )
        )

    def mgs_driver(
        cols: list[list[float]],
    ) -> list[list[float]]:
        qs: list[list[float]] = []
        for j in range(k):
            u = list(cols[j])
            for q in qs:
                p = sum(u[i] * q[i] for i in range(dim))
                u = [u[i] - p * q[i] for i in range(dim)]
            nrm = math.sqrt(sum(x * x for x in u))
            if nrm == 0.0:
                raise ValueError(
                    "top_k_principal_components: rank-deficient corpus "
                    f"— MGS residual of component {j + 1} vanished; "
                    "fewer than k principal directions exist"
                )
            qs.append([x / nrm for x in u])
        return qs

    for _ in range(iterations - 1):
        rows = w_frame(v).collect()  # bounded: dim x k aggregate rows
        rows.sort(key=lambda r: r["pos"])
        v = mgs_driver(
            [[r[f"w{j + 1}"] for r in rows] for j in range(k)]
        )

    # final round stays IN Spark: matvec, pin the dim-row frame, then
    # MGS as chained scalar-aggregate broadcast crossJoins
    cur = w_frame(v).localCheckpoint(eager=True)
    qcols: list[str] = []
    for j in range(1, k + 1):
        ucol = f"__u{j}"
        cur = cur.withColumn(ucol, F.col(f"w{j}"))
        for qc in qcols:
            p = cur.agg(
                F.sum(F.col(ucol) * F.col(qc)).alias("__p")
            )
            cur = (
                cur.crossJoin(F.broadcast(p))
                .withColumn(
                    ucol, F.col(ucol) - F.col("__p") * F.col(qc)
                )
                .drop("__p")
            )
        nj = cur.agg(
            F.sqrt(F.sum(F.col(ucol) * F.col(ucol))).alias(f"__r{j}")
        )
        cur = cur.crossJoin(F.broadcast(nj)).withColumn(
            f"__q{j}",
            F.col(ucol) / F.nullif(F.col(f"__r{j}"), F.lit(0.0)),
        )
        qcols.append(f"__q{j}")
        # re-pin so the next component's aggregates read 64 rows, not a
        # growing crossJoin lineage
        cur = cur.localCheckpoint(eager=True)

    stack_args = ", ".join(
        f"{j}, __q{j}, __r{j}" for j in range(1, k + 1)
    )
    return cur.select(
        F.col("pos").cast("int").alias("dim"),
        F.expr(
            f"stack({k}, {stack_args}) AS (component, loading, __rr)"
        ),
    ).select(
        F.col("component").cast("int").alias("component"),
        "dim",
        "loading",
        (F.col("__rr") / F.lit(float(n))).alias("eigval"),
    )
