"""Deduplication operators (SURVEY §2.H L1/L2) — exact, Jaccard, MinHash-LSH,
SimHash.

Scale design:

- ``dedup_exact`` / fingerprint dedup: one hash-partition shuffle on the key
  (or its md5), deterministic survivor (min id), no driver involvement.
- ``exploded_shingles``: the shared tokenize→shingle pipeline for Jaccard and
  MinHash. Deliberately *lambda-free* (posexplode + window ``lead``, no
  higher-order functions): HOF lambda variables defeat both codegen
  subexpression elimination (the array formulation re-tokenized every row
  ~6×) and physical-plan canonicalization (self-join sides each recomputed
  the explode instead of sharing a ReusedExchange). Measured 3× faster than
  the ``zip_with``-fold array formulation at bench scale. One shuffle on the
  doc id; the per-doc distinct and shingle-set size then piggyback on that
  partitioning (no further exchange).
- ``jaccard_pairs``: the *inverted index* formulation — explode shingles,
  self-join on shingle, count co-occurrences — never materializes the n²
  pair space, only pairs that actually share a shingle. Set sizes ride
  through the join as payload columns (no extra joins). This is the exact
  counterpart of a MinHash candidate join and the standard 100-TB-safe way
  to compute exact Jaccard.
- ``minhash_signatures`` / ``lsh_candidate_pairs``: hand-rolled MinHash on
  top of ``xxhash64`` (JVM, codegen'd, deterministic — no Python in the hot
  path, unlike ml.feature.MinHashLSH which needs a Vector UDT conversion).
  The min-aggregate reuses the shingle pipeline's doc-id partitioning
  (zero-exchange agg); band hashes are built from the wide min columns
  (again lambda-free) so the banded self-join shares one ReusedExchange.
  Banding turns near-dup search into an equi-join on (band, band_hash):
  shuffle is keyed on the band hash, so it scales like any large join and
  AQE handles skewed bands.
- ``simhash64``: vectorized Arrow-batched pandas UDF (SURVEY §2.K L6) —
  the canonical "slow path done right": numpy bit-twiddling per batch,
  no per-row Python.
"""

from __future__ import annotations

import warnings

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dedup_exact(
    df: DataFrame, key_cols: list[str] | str, order_col: str
) -> DataFrame:
    """Keep exactly one row per ``key_cols`` group — the one with the
    smallest ``order_col`` (deterministic, unlike ``dropDuplicates``).

    Survivor election is a ``min_by`` AGGREGATE, not a row_number window:
    the min combines map-side, so the one shuffle carries a single
    candidate row per (mapper, key) instead of every duplicate, there is
    no per-key sort, and a hot key (the same boilerplate document a
    billion times — the exact situation dedup exists for) reduces on the
    mappers instead of melting one reducer. A bare string means ONE key
    column (without this guard a ``*"text"`` splat would silently
    partition on the string's characters)."""
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    cols = df.columns
    # ordering is (isNull, value): a NULL order value never beats a real
    # one, and an all-NULL group still elects a real row (bare min_by
    # ignores NULL orderings entirely — an all-NULL group would emit a
    # corrupt all-NULL survivor). Ties on order_col elect an unspecified
    # row, as before.
    null_safe_order = F.struct(
        F.col(order_col).isNull().alias("n"), F.col(order_col).alias("v")
    )
    return (
        df.groupBy(*key_cols)
        .agg(F.min_by(F.struct(*cols), null_safe_order).alias("__survivor"))
        .select("__survivor.*")
    )


def exploded_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, unit: str = "word"
) -> DataFrame:
    """Distinct ``(__id, __s)`` n-gram shingle hashes, one row per shingle.
    ``unit="word"`` shingles over whitespace tokens; ``unit="char"`` over
    single characters (classic character-n-gram dedup à la CCNet).

    Lambda-free pipeline (see module docstring for why that matters):
    ``posexplode(split(...))`` → ``xxhash64`` per token → window ``lead`` to
    fold each token with its n-1 successors → filter to real shingle starts
    → per-doc distinct. Documents shorter than ``n`` tokens keep exactly one
    (shorter-fold) shingle, matching ``word_shingles`` string semantics.

    Exactly ONE exchange (hash on ``__id`` for the window); the trailing
    distinct is an aggregate on ``(__id, __s)`` whose clustering requirement
    is already satisfied by the ``__id`` partitioning, so it runs map-side.
    The output stays partitioned by ``__id`` — downstream per-doc aggregates
    (shingle-set size, MinHash mins) add no shuffle either.
    """
    # generated-SQL construction (r16, the §18/§19 one-parse precedent):
    # this operator is built by EVERY jaccard/minhash consumer, and the
    # Column-function form cost ~0.35-0.5 s of driver py4j round trips
    # per build (one driver↔JVM call per F.* node). selectExpr takes the
    # whole projection as strings — one py4j call per select — and the
    # parsed expressions resolve to the IDENTICAL tree (diffed plan-for-
    # plan against the retired form; oracle-verified at 3 SFs).
    # Identifiers are backtick-quoted with embedded backticks doubled.
    qid = "`%s`" % id_col.replace("`", "``")
    qtext = "`%s`" % text_col.replace("`", "``")
    if unit == "word":
        units_sql = f"split(trim({qtext}), '\\\\s+')"
    elif unit == "char":
        units_sql = f"split({qtext}, '')"
    else:
        raise ValueError(f"unit must be word|char, got {unit!r}")
    tok = df.selectExpr(
        f"{qid} AS __id", f"posexplode({units_sql}) AS (__p, __t)"
    ).selectExpr("__id", "__p", "xxhash64(__t) AS __h0")
    over = "OVER (PARTITION BY __id ORDER BY __p)"
    leads = [
        f"lead(__h0, {k}) {over} AS __h{k}" for k in range(1, n)
    ]
    folded = tok.selectExpr("__id", "__p", "__h0", *leads)
    # keep positions that start a full n-shingle; position 0 always survives
    # so a doc with < n tokens contributes one shorter-fold shingle
    # (xxhash64 skips null inputs, so missing leads just shorten the fold)
    keep = f"__h{n - 1} IS NOT NULL OR __p = 0"
    shingle = "xxhash64(%s)" % ", ".join(f"__h{k}" for k in range(n))
    return (
        folded.filter(keep)
        .selectExpr("__id", f"{shingle} AS __s")
        .distinct()  # zero-exchange: clustering on (__id,__s) ⊇ __id holds
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    unit: str = "word",
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-word-shingle Jaccard similarity for every document pair that
    shares ≥1 shingle, filtered to ``jaccard >= threshold``.

    Inverted-index join: |output shuffle| ∝ co-occurring shingles, not n².
    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded to 4.

    Scale choices (measured at sf0.1, see BENCH; reshaped r15 — guide
    §2.3/§2.4, "shuffle fewer bytes / remove shuffles outright"):
    - shingles are ``xxhash64``-ed to int64 *before* the shuffle — 8-byte
      join keys instead of ~30-byte strings (collision odds at 64 bits are
      ~m²/2⁶⁵, irrelevant below ~10⁹ distinct shingles);
    - the df-cap window's hash partitioning on the shingle key IS the
      join partitioning: both self-join sides (and the sizes branch)
      consume the ONE ``__s`` exchange via AQE stage reuse — no explicit
      repartition, and the window's ``__s`` sort already satisfies the
      sort-merge requirement. The r14 shape carried per-doc sizes as a
      second full-shingle-row window (an extra ``__id`` exchange + sort
      over every shingle row) and re-materialized an explicit
      ``repartition(__s)`` that duplicated the partitioning the window
      exchange already provided — 4 full-data exchanges; this shape
      moves the same rows through 2;
    - per-doc set sizes are a combiner aggregate over the SAME capped
      subtree (ReusedExchange; partial aggregation reduces map-side to
      one row per doc per partition) joined onto the already-aggregated
      pair table — at bench scale AQE broadcasts the size table, at
      corpus scale the joins shuffle pair-grain rows, never shingle-grain;
    - ``max_df`` (document-frequency cap) drops shingles present in more
      than that many documents BEFORE the join — the standard guard
      against stop-shingles, whose posting lists make the join quadratic
      (a shingle in p docs yields p·(p-1)/2 pairs). Jaccard is then
      computed over the capped shingle universe on both the numerator and
      the per-doc set sizes (consistent denominators). Leave None when
      the shingle unit already discriminates.
    """
    sh = exploded_shingles(df, id_col, text_col, n, unit)
    if max_df is not None:
        # df per shingle via ONE window over __s, then the capped
        # posting frame is localCheckpoint-PINNED (r16, VERDICT r15
        # item 1b): its three consumers (join side a, join side b, the
        # sizes branch) would otherwise each re-run the local
        # sort+window over the reused __s exchange — the r15 lazy shape
        # measured 2.41 s median vs 2.15 s pinned at sf0.1 (9
        # alternating reps), and the driver's cold r15 run had the lazy
        # re-execution at -34% vs r14. The pin costs one eager job and
        # one extra exchange of the capped postings into the self-join;
        # it removes two full sort+window passes. At 100 TB the pin
        # holds CAPPED postings (stop-shingles already dropped) on
        # local executor storage — linear, no network.
        capped = (
            sh.select(
                "__id",
                "__s",
                F.count(F.lit(1))
                .over(Window.partitionBy("__s"))
                .alias("__df"),
            )
            .filter(F.col("__df") <= max_df)
            .select("__id", "__s")
            .localCheckpoint(eager=True)
        )
    else:
        capped = sh.select("__id", "__s")
    a, b = capped.alias("a"), capped.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.__s") == F.col("b.__s"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .groupBy(
            F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("__inter"))
    )
    # capped per-doc set sizes: combiner aggregate on the reused capped
    # subtree (map-side partial reduces shingle rows to doc rows), then
    # two equi-joins onto the PAIR-grain table — identical __na/__nb
    # values to the retired payload-window form (exact integer counts)
    sizes = capped.groupBy("__id").agg(F.count(F.lit(1)).alias("__n"))
    scored = inter.join(
        sizes.select(
            F.col("__id").alias("id_a"), F.col("__n").alias("__na")
        ),
        "id_a",
    ).join(
        sizes.select(
            F.col("__id").alias("id_b"), F.col("__n").alias("__nb")
        ),
        "id_b",
    )
    return (
        scored.withColumn(
            "jaccard",
            F.round(
                F.col("__inter")
                / (F.col("__na") + F.col("__nb") - F.col("__inter")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _minhash_wide(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
) -> DataFrame:
    """(__id, __h0..__h{k-1}) MinHash mins as WIDE columns: for seed i, the
    min ``xxhash64(shingle, i)`` over the document's distinct shingle set.

    Rides the ``exploded_shingles`` partitioning: the groupBy(__id) needs no
    exchange, so the whole signature build costs one shuffle total. Wide
    columns (not an array) so callers can derive band hashes lambda-free.
    """
    sh = exploded_shingles(df, id_col, text_col, n)
    # one SQL parse per min column (r16 — §18/§19 one-parse precedent):
    # the Column-function form made 4 py4j round trips per seed
    mins = [
        F.expr(f"min(xxhash64(__s, {i})) AS __h{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("__id").agg(*mins)


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
) -> DataFrame:
    """(__id, __sig: array<bigint>) MinHash signatures — array packaging of
    ``_minhash_wide`` (one doc-id shuffle end to end; every shingle hashed
    exactly ``num_hashes`` times, each shingle string xxhash64-ed once).
    (The tempting pure-expression form ``array_min(transform(shingles, ...))``
    re-evaluates the shingle-building expression once per seed after
    Catalyst's projection collapse — 32× the work; measured 15× slower.)
    """
    wide = _minhash_wide(df, id_col, text_col, n, num_hashes)
    return wide.select(
        "__id",
        F.array(*[f"__h{i}" for i in range(num_hashes)]).alias("__sig"),
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash + banded LSH near-duplicate pairs.

    Signature of ``num_hashes`` minhashes split into ``bands`` bands of
    ``num_hashes // bands`` rows; documents colliding in ≥1 band become
    candidates; candidates are verified with the *estimated* Jaccard
    (matching minhash fraction) and filtered to ``>= threshold``.
    Returns (id_a, id_b, est_jaccard).
    """
    rows = num_hashes // bands
    wide = _minhash_wide(df, id_col, text_col, n, num_hashes)
    # one row per band: (band_idx, xxhash64 of the band's min columns, id,
    # full sig). Band hashes come straight off the wide min columns — no
    # array slicing, no lambdas — so the whole subtree canonicalizes and the
    # self-join's two sides share ONE ReusedExchange. The signature rides
    # along through the band join: carrying it costs bytes but zero extra
    # passes — measured faster at bench scale than the "slim join + rejoin
    # signatures" variant, which recomputes or caches the signature subtree
    # three times. At petabyte scale flip to the slim variant with an
    # explicitly materialized signature table.
    # one SQL parse for the whole band array and one for the signature
    # (r16 — §18/§19 one-parse precedent; the struct/lit loop made ~6
    # py4j round trips per band)
    band_structs = ", ".join(
        "struct({bi} AS band, xxhash64({cols}) AS bhash)".format(
            bi=bi,
            cols=", ".join(f"__h{bi * rows + r}" for r in range(rows)),
        )
        for bi in range(bands)
    )
    sig_arr = "array(%s)" % ", ".join(
        f"__h{i}" for i in range(num_hashes)
    )
    banded = wide.selectExpr(
        "__id",
        f"{sig_arr} AS __sig",
        f"explode(array({band_structs})) AS __b",
    ).select("__id", "__sig", "__b.band", "__b.bhash")

    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bhash") == F.col("b.bhash"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__sig").alias("sig_a"),
            F.col("b.__sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    # one SQL parse (r16): Python-lambda HOFs cost several py4j round
    # trips per lambda at build time; the SQL arrow form parses to the
    # same LambdaFunction tree (plan-identical, value-identical)
    est = F.expr(
        "round(size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y),"
        f" eq -> eq)) / {float(num_hashes)!r}D, 4)"
    )
    return (
        cand.withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    on_nonconverged: str = "warn",
) -> DataFrame:
    """Connected components over an undirected edge list by min-label
    propagation: every node's label converges to the smallest node id in its
    component. Returns ``(node, label)`` — one row per node that appears in
    ``edges``. This is what turns near-dup *pairs* into near-dup *clusters*
    ("keep one doc per near-duplicate cluster", SURVEY §2.H L2): survivor =
    the node whose ``label == node``.

    Scale design: each round is ONE shuffle keyed on node id (neighbor-min
    groupBy) plus a broadcast-free left join on the same key; rounds needed
    = component diameter, which for near-dup clusters is tiny (near-dup
    similarity is near-transitive, so clusters are dense and shallow).
    The symmetrized edge list is materialized ONCE via ``localCheckpoint``
    before the loop — ``edges`` is typically the expensive Jaccard
    inverted-index pipeline, and without the checkpoint every round (plus
    the seed) would re-execute it from scratch. ``localCheckpoint`` after
    every round likewise truncates the label lineage — without it the plan
    doubles per iteration and analysis time explodes. The per-round
    convergence check is a scalar ``count`` (never collects rows).

    If ``max_iter`` rounds pass without convergence (component diameter >
    ``max_iter``) the labels are NOT final; ``on_nonconverged`` picks the
    reaction: ``"warn"`` (default, RuntimeWarning), ``"raise"``, or
    ``"ignore"``. For graphs whose diameter can be deep, use
    ``connected_components_star`` (O(log n)-ish rounds, diameter-free).
    """
    # symmetrize in ONE pass over the (possibly very expensive) edge
    # pipeline and pin the result (r16): the r15 shape pinned edges
    # first (so the union's two branches would not re-execute the
    # upstream pair pipeline) and then pinned the union — two
    # SEQUENTIAL eager jobs. An explode of the two orientations emits
    # the identical row multiset in a single pass, so one pin job does
    # the work of both; every propagation round reads checkpointed
    # rows, not the lineage.
    sym = edges.select(
        F.explode(
            F.array(
                F.struct(
                    F.col(src).alias("node"), F.col(dst).alias("nbr")
                ),
                F.struct(
                    F.col(dst).alias("node"), F.col(src).alias("nbr")
                ),
            )
        ).alias("__e")
    ).select("__e.node", "__e.nbr").localCheckpoint(eager=True)
    # seed one hop ahead: label(n) = min(n, min over neighbors)
    labels = sym.groupBy("node").agg(
        F.least(F.col("node"), F.min("nbr")).alias("label")
    ).localCheckpoint(eager=True)
    converged = False
    for _ in range(max_iter):
        prop = (
            sym.join(labels.withColumnRenamed("node", "nbr"), "nbr")
            .groupBy("node")
            .agg(F.min("label").alias("__nlabel"))
        )
        # the convergence signal rides the SAME select as the new label
        # (r15): comparing new-vs-old needs no second join — the old
        # label is an input attribute of this projection. The count then
        # scans the already-pinned rows (one cheap job) instead of
        # re-joining two checkpointed frames (a shuffle join per round).
        newl = F.least(
            F.col("label"),
            F.coalesce(F.col("__nlabel"), F.col("label")),
        )
        flagged = (
            labels.join(prop, "node", "left")
            .select(
                "node",
                newl.alias("__newl"),
                (newl != F.col("label")).alias("__chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = flagged.filter(F.col("__chg")).count()
        labels = flagged.select(
            "node", F.col("__newl").alias("label")
        )
        if changed == 0:
            converged = True
            break
    if not converged:
        msg = (
            f"connected_components: label propagation did not converge in "
            f"{max_iter} rounds (component diameter exceeds max_iter); "
            f"labels are NOT final. Raise max_iter or use "
            f"connected_components_star for deep graphs."
        )
        if on_nonconverged == "raise":
            raise RuntimeError(msg)
        if on_nonconverged != "ignore":
            warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return labels


def connected_components_star(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components by alternating **large-star / small-star** rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14). Same output contract as ``connected_components``:
    ``(node, label)`` with label = component-minimum id, one row per node
    appearing in ``edges``.

    Why a second algorithm: min-label propagation needs *diameter* rounds —
    fine for shallow near-dup clusters, hopeless for path-shaped graphs
    (a 10⁶-node chain would need 10⁶ shuffles). Star contraction halves
    component height every other round independent of diameter
    (O(log² n) worst case, O(log n) in practice), which is the 100 TB-safe
    default whenever the graph shape is unknown.

    Each round is two phases over the current edge set E (self-loops
    dropped, orientation canonicalized):

    - **large-star**: for every node u with neighborhood Γ(u) in the
      symmetrized E, let m = min(Γ(u) ∪ {u}); emit edge (v, m) for every
      strictly-larger neighbor v > u. (Hooks big nodes onto small ones.)
    - **small-star**: orient edges high→low (u > v); for every u let
      m = min(Γ⁻(u)); emit (v, m) for every smaller neighbor v plus (u, m).
      (Flattens each partial star onto its minimum.)

    Both phases are a groupBy-min plus a same-key join — exactly the
    primitives the rest of the engine shuffles on; no driver-side state.
    Convergence = the edge set reaches a fixed point, detected with a
    scalar (count, sum-of-hashes) checksum per round — one tiny action,
    never a row collect. At the fixed point E is a disjoint set of stars
    whose centers are the component minima, so the final labels fall out
    of one neighbor-min aggregation; nodes whose component fully collapsed
    earlier are restored from the original node set with label = their
    star minimum (left join + coalesce).
    """
    # pin the (possibly very expensive) edge pipeline once up front —
    # this function references ``edges`` FOUR times (two explode
    # orientations for the node set, two for canonicalization); without
    # the pin the pair pipeline's post-exchange operators executed once
    # per reference (r15, guide §3.3)
    edges = edges.localCheckpoint(eager=True)
    nodes = (
        edges.select(
            F.explode(F.array(F.col(src), F.col(dst))).alias("node")
        )
        .distinct()
    )
    # canonical high→low orientation, no self-loops, distinct
    e = (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("u"),
            F.least(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    # the node set and the canonical edge set are independent reads of
    # the pinned edges — pin them CONCURRENTLY (guide §2.6) so the two
    # fixed job latencies overlap instead of queueing
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as _pool:
        _nf = _pool.submit(lambda: nodes.localCheckpoint(eager=True))
        _ef = _pool.submit(lambda: e.localCheckpoint(eager=True))
        nodes = _nf.result()
        e = _ef.result()

    def _checksum(df: DataFrame) -> tuple:
        # bit_xor is order-independent and overflow-free (ANSI-safe, unlike
        # sum); e is distinct so xor cancellation can't mask a real change
        # without also changing the count
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("u", "v")).alias("h"),
        ).collect()[0]  # bounded: 1-row convergence checksum aggregate
        return (row["n"], row["h"])

    prev = _checksum(e)
    converged = False
    for _ in range(max_iter):
        # ---- large-star ----
        sym = e.select("u", "v").union(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(
            F.least(F.col("u"), F.min("v")).alias("m")
        )
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )
        # ---- small-star (edges already oriented u > v after canonicalize) ----
        d = large.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).distinct()
        smins = d.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            d.join(smins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(smins.select(F.col("u"), F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
        )
        e = (
            small.select(
                F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        cur = _checksum(e)
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        warnings.warn(
            f"connected_components_star: edge set not stable after "
            f"{max_iter} rounds; labels may be partial.",
            RuntimeWarning,
            stacklevel=2,
        )
    # fixed point is a star forest centered on component minima: every
    # node's label is min(self, min neighbor) over the final edge set
    sym = e.select("u", "v").union(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    star_labels = sym.groupBy("u").agg(
        F.least(F.col("u"), F.min("v")).alias("label")
    )
    return (
        nodes.join(star_labels, nodes["node"] == star_labels["u"], "left")
        .select("node", F.coalesce("label", F.col("node")).alias("label"))
    )


@F.pandas_udf(T.LongType())
def simhash64(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens — Arrow-batched, vectorized
    across the WHOLE batch: tokens are flattened into one array, md5-hashed
    once per *distinct* token (word-soup corpora repeat tokens heavily),
    the (total_tokens × 64) bit matrix is built in one numpy op, and
    per-document bit sums come from ``np.add.reduceat`` over segment
    offsets — no per-document Python loop. Token hash: first 8 bytes of
    md5 (stable across processes; no PYTHONHASHSEED dependence)."""
    import hashlib

    out = np.zeros(len(texts), dtype=np.uint64)
    tok_lists = [(t or "").split() for t in texts]
    lens = np.array([len(t) for t in tok_lists], dtype=np.int64)
    flat = [tok for toks in tok_lists for tok in toks]
    if flat:
        cache: dict[str, int] = {}

        def h(tok: str) -> int:
            v = cache.get(tok)
            if v is None:
                v = int.from_bytes(
                    hashlib.md5(tok.encode("utf-8")).digest()[:8], "big"
                )
                cache[tok] = v
            return v

        hashes = np.fromiter(
            (h(t) for t in flat), dtype=np.uint64, count=len(flat)
        )
        bits = (
            (hashes[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        ).astype(np.uint8)
        offsets = np.concatenate(([0], np.cumsum(lens)))[:-1]
        # reduceat quirks: equal/decreasing indices (empty docs) return a
        # single row instead of a zero sum, and indices must stay in range —
        # clamp, then mask empty docs back to 0
        idx = np.minimum(offsets, len(flat) - 1)
        seg = np.add.reduceat(bits, idx, axis=0).astype(np.int64)
        sim = (seg * 2 >= lens[:, None]).astype(np.uint64)
        powers = np.uint64(1) << np.arange(64, dtype=np.uint64)
        vals = (sim * powers).sum(axis=1, dtype=np.uint64)
        nonempty = lens > 0
        out[nonempty] = vals[nonempty]
    # reinterpret the 64 bits as a signed long (Spark LongType)
    return pd.Series(out.view(np.int64))


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """All pairs with SimHash hamming distance ≤ ``max_hamming`` — COMPLETE
    by the pigeonhole blocking of Manku et al. (WWW'07 simhash dedup): the
    64 bits are split into ``max_hamming + 1`` blocks, so any pair within
    the hamming budget agrees on at least one whole block; the self-join is
    an equi-join on (block_idx, block_bits), never an n² comparison."""
    blocks = max_hamming + 1
    if blocks > 16:
        raise ValueError("max_hamming > 15 makes blocks too small to prune")
    base, extra = divmod(64, blocks)
    # block i covers [offset, offset+width); first `extra` blocks get +1 bit
    widths = [base + (1 if i < extra else 0) for i in range(blocks)]
    offsets = [sum(widths[:i]) for i in range(blocks)]

    # coalesce → non-nullable __sh: otherwise join-key constraint inference
    # adds isnotnull(simhash64(text)) filters that each re-run the UDF (the
    # naive plan evaluated it FOUR times: filter + project on both sides).
    # The explicit hash repartition is a materialization point both
    # self-join sides read through ONE ReusedExchange — net: one scan, one
    # Python pass (verified in the physical plan).
    sh = df.select(
        F.col(id_col).alias("__id"),
        F.coalesce(simhash64(F.col(text_col)), F.lit(0)).alias("__sh"),
    ).repartition(F.col("__id"))
    block_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("bi"),
                (
                    F.shiftrightunsigned("__sh", offsets[i]).bitwiseAND(
                        F.lit((1 << widths[i]) - 1)
                    )
                ).alias("bits"),
            )
            for i in range(blocks)
        ]
    )
    keyed = sh.select("__id", "__sh", F.explode(block_structs).alias("__b"))
    a, b = keyed.alias("a"), keyed.alias("b")
    ham = F.bit_count(F.col("a.__sh").bitwiseXOR(F.col("b.__sh")))
    return (
        a.join(
            b,
            (F.col("a.__b") == F.col("b.__b"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            ham.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def span_corpus_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    span_tokens: int = 8,
) -> DataFrame:
    """C4/MassiveText-style duplicated-passage removal: split every document
    into tumbling ``span_tokens``-token spans, keep only the FIRST corpus
    occurrence of each distinct span (ordered by ``(id, span_idx)``), and
    reassemble the surviving spans per document in original order.

    Returns ``(id_col, clean_text, n_spans_removed)``. Documents whose every
    span was seen earlier disappear from the output (their text is empty) —
    the caller anti-joins against the input if it wants tombstones.

    Scale shape: first-occurrence election is a ``min_by`` AGGREGATE on the
    64-bit span hash, not a window — the min over ``(id, span_idx)`` structs
    combines map-side, so the shuffle carries one candidate per (mapper,
    distinct span) instead of every span row, there is no per-key sort, and
    a pathologically hot span ("the the the…" across the whole corpus)
    reduces mostly on the mappers instead of melting one reducer. The
    elected row IS the aggregate output (``min_by`` carries the payload), so
    no join-back either. One more combiner-friendly shuffle on the doc id
    reassembles. Exchange keys are 8 bytes (same collision-odds argument as
    ``jaccard_pairs``). No n² anything — exact dedup at span grain.

    NULL/empty text is dropped up front: without the filter the behavior
    is ANSI-dependent (``size(null)`` is -1 with ANSI off, so
    ``sequence(0, -1)`` yields ``[0, -1]`` and every null-text document's
    null spans xxhash64-collide into one garbage survivor; with ANSI on
    the rows vanish silently). Filtering makes the output well-defined
    and engine-config-independent: no-token documents simply do not
    appear, same as fully-duplicated ones.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    df = df.filter(
        F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != "")
    )
    n_spans = F.ceil(F.size(toks) / F.lit(span_tokens)).cast("int")
    spans = F.transform(
        F.sequence(F.lit(0), n_spans - 1),
        lambda i: F.array_join(
            F.slice(toks, i * span_tokens + 1, span_tokens), " "
        ),
    )
    exploded = df.select(
        F.col(id_col).alias("__id"),
        n_spans.alias("__n_spans"),
        F.posexplode(spans).alias("__span_idx", "__span"),
    )
    kept = (
        exploded.groupBy(F.xxhash64("__span").alias("__sh"))
        .agg(
            F.min_by(
                F.struct("__id", "__span_idx", "__span", "__n_spans"),
                F.struct("__id", "__span_idx"),
            ).alias("__first")
        )
        .select("__first.*")
    )
    return (
        kept.groupBy(F.col("__id").alias(id_col))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__span_idx", "__span"))
                    ),
                    lambda s: s["__span"],
                ),
                " ",
            ).alias("clean_text"),
            (F.any_value("__n_spans") - F.count(F.lit(1))).alias(
                "n_spans_removed"
            ),
        )
    )


def jaccard_pairs_incremental(
    new_df: DataFrame,
    corpus_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Incremental exact near-dup: score NEW documents against an existing
    CORPUS without scoring corpus×corpus — the shape of "dedupe today's
    crawl against everything already ingested". Returns
    ``(new_id, corpus_id, jaccard)`` with jaccard rounded to 4, filtered to
    ``>= threshold``.

    Same inverted-index formulation as :func:`jaccard_pairs`, but the
    posting-list join is new⋈corpus only: shuffle and compute scale with
    |new| + |shared postings|, not |corpus|² — at 100 TB the corpus-side
    shingle table is the thing you persist between ingests (write it once,
    bucket it by shingle hash, and each day's join is co-located against
    yesterday's buckets). Set sizes per side ride the same aggregates as
    the batch variant; a stop-shingle ``max_df`` cap composes exactly as
    in :func:`jaccard_pairs` (over the union) when the corpus needs it.
    """
    sh_new = exploded_shingles(new_df, id_col, text_col, n)
    sh_old = exploded_shingles(corpus_df, id_col, text_col, n)
    sizes_new = sh_new.groupBy(F.col("__id").alias("new_id")).agg(
        F.count(F.lit(1)).alias("__na")
    )
    sizes_old = sh_old.groupBy(F.col("__id").alias("corpus_id")).agg(
        F.count(F.lit(1)).alias("__nb")
    )
    inter = (
        sh_new.select(F.col("__id").alias("new_id"), "__s")
        .join(
            sh_old.select(F.col("__id").alias("corpus_id"), "__s"),
            "__s",
        )
        .groupBy("new_id", "corpus_id")
        .agg(F.count(F.lit(1)).alias("__inter"))
    )
    return (
        inter.join(sizes_new, "new_id")
        .join(sizes_old, "corpus_id")
        .withColumn(
            "jaccard",
            F.round(
                F.col("__inter")
                / (F.col("__na") + F.col("__nb") - F.col("__inter")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("new_id", "corpus_id", "jaccard")
    )


def jaccard_pairs_ppjoin(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    unit: str = "word",
) -> DataFrame:
    """Exact Jaccard-threshold set-similarity join via PREFIX FILTERING
    (the PPJoin family, Xiao et al., WWW'08): identical output to the
    brute-force / full-inverted-index formulation — ``(id_a, id_b,
    jaccard)`` with ``jaccard >= threshold`` — but the candidate join
    touches only each document's PREFIX postings instead of all of them.

    Under a global token order by ascending document frequency (rarest
    first), a document with ``m`` shingles keeps a prefix of
    ``m - ceil(t*m) + 1`` shingles; any pair with ``J >= t`` must share a
    prefix token (J >= t implies overlap >= ceil(t*m) for both sides, and
    an empty prefix intersection would cap the overlap at
    ``ceil(t*m) - 1``) — so pruning the rest loses nothing. Candidates
    are then verified exactly with one ``array_intersect`` over the two
    full sorted shingle arrays.

    The scale contrast with :func:`jaccard_pairs` is the point: the full
    inverted index shuffles EVERY posting into the self-join and needs
    ``max_df`` as an explicit guard against stop-shingle blowup; here a
    shingle occurring in p documents lands in almost no prefixes
    precisely BECAUSE its df is high (it sorts last), so the join input
    shrinks to ~(1-t) of the postings and the stop-shingle quadratic
    never happens — no cap, no changed semantics, exact answer. At t=0.8
    that is a 5x smaller shuffle before any data-dependent pruning.

    Shuffle plan: df-count window on the shingle key, position window on
    the doc key (also yields the full sorted array as join payload), the
    prefix-posting self-join, and the pair verification join — all
    equi-joins on 8-byte keys, nothing pairwise outside matched buckets.
    """
    sh = exploded_shingles(df, id_col, text_col, n, unit)
    # document frequency per shingle — the global order key (rarest first)
    with_df = sh.select(
        "__id",
        "__s",
        F.count(F.lit(1)).over(Window.partitionBy("__s")).alias("__df"),
    )
    # per-doc: position under the global (df, shingle) order, set size,
    # and the full ordered shingle array (verification payload) in ONE
    # doc-key window pass
    w_doc = Window.partitionBy("__id").orderBy("__df", "__s")
    w_all = Window.partitionBy("__id").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    positioned = with_df.select(
        "__id",
        "__s",
        F.row_number().over(w_doc).alias("__pos"),
        F.count(F.lit(1)).over(w_all).alias("__m"),
        F.collect_list("__s").over(w_all.orderBy("__df", "__s")).alias("__toks"),
    )
    prefix_len = F.col("__m") - F.ceil(F.col("__m") * F.lit(threshold)) + 1
    prefix = positioned.filter(F.col("__pos") <= prefix_len)
    docs = positioned.filter(F.col("__pos") == 1).select(
        "__id", "__m", "__toks"
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.__s") == F.col("b.__s"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b")
        )
        .distinct()
    )
    verified = (
        cands.join(
            docs.select(
                F.col("__id").alias("id_a"),
                F.col("__m").alias("__ma"),
                F.col("__toks").alias("__ta"),
            ),
            "id_a",
        )
        .join(
            docs.select(
                F.col("__id").alias("id_b"),
                F.col("__m").alias("__mb"),
                F.col("__toks").alias("__tb"),
            ),
            "id_b",
        )
        .withColumn(
            "__inter", F.size(F.array_intersect("__ta", "__tb"))
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("__inter")
                / (F.col("__ma") + F.col("__mb") - F.col("__inter")),
                4,
            ),
        )
    )
    return verified.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "jaccard"
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.6,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-shingle CONTAINMENT pairs (Broder, SEQUENCES'97):
    ``containment(src ⊆ dst) = |S_src ∩ S_dst| / |S_src|`` — the
    ASYMMETRIC near-dup signal symmetric Jaccard structurally misses: a
    short document quoted wholesale inside a long one has containment
    ≈ 1 while its Jaccard is diluted by the long side's size (a 200-
    token article inside a 10k-token page scores J ≈ 0.02). Returns
    DIRECTED rows ``(src_id, dst_id, containment, jaccard)`` with
    ``containment >= threshold``, both metrics rounded to 4; the
    Jaccard rides along so consumers can see exactly which pairs are
    containment-only catches.

    Same inverted-index formulation, shuffle plan, and ``max_df``
    stop-shingle cap as :func:`jaccard_pairs` (consistent denominators
    over the capped universe): the undirected intersection is computed
    ONCE per (a < b) pair and emitted in both directions with each
    side's own size as the denominator — no second join, no second
    shuffle. Scale shape identical to jaccard_pairs: |shuffle| ∝
    co-occurring shingles, never n².
    """
    sh = exploded_shingles(df, id_col, text_col, n)
    if max_df is not None:
        sized_src = (
            sh.select(
                "__id",
                "__s",
                F.count(F.lit(1))
                .over(Window.partitionBy("__s"))
                .alias("__df"),
            )
            .filter(F.col("__df") <= max_df)
            .select("__id", "__s")
        )
    else:
        sized_src = sh.select("__id", "__s")
    sized = sized_src.select(
        "__id",
        "__s",
        F.count(F.lit(1)).over(Window.partitionBy("__id")).alias("__n"),
    )
    ex = sized.repartition(F.col("__s"))
    a, b = ex.alias("a"), ex.alias("b")
    scored = (
        a.join(
            b,
            (F.col("a.__s") == F.col("b.__s"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .groupBy(
            F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b")
        )
        .agg(
            F.count(F.lit(1)).alias("__inter"),
            F.any_value(F.col("a.__n")).alias("__na"),
            F.any_value(F.col("b.__n")).alias("__nb"),
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("__inter")
                / (F.col("__na") + F.col("__nb") - F.col("__inter")),
                4,
            ),
        )
    )
    directed = scored.select(
        F.col("id_a").alias("src_id"),
        F.col("id_b").alias("dst_id"),
        F.round(F.col("__inter") / F.col("__na"), 4).alias("containment"),
        "jaccard",
    ).unionByName(
        scored.select(
            F.col("id_b").alias("src_id"),
            F.col("id_a").alias("dst_id"),
            F.round(F.col("__inter") / F.col("__nb"), 4).alias(
                "containment"
            ),
            "jaccard",
        )
    )
    return directed.filter(F.col("containment") >= threshold)
