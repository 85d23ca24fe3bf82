"""Training-data curation operators (SURVEY §2.H [NS] tier) — the steps a
pretraining pipeline runs between raw documents and a training mix:
deterministic sampling, per-source caps, token budgeting, and the composed
quality→dedup→cap pipeline. All pure DataFrame expressions (JVM codegen),
every one oracle-verified in the workload.

Scale notes:

- Sampling is a FILTER, not Spark's ``df.sample``: ``sample`` is seeded
  per-partition, so results change with partitioning/retries — useless for
  reproducible corpus construction. A modulus on a uniform key (or a hash
  of a non-uniform key) is stable under any partitioning, any retry, any
  cluster size, and pushes down to the scan.
- Per-source caps and token budgets are window functions partitioned by
  bounded keys (source, lang) — no global sort, no single-partition window.
- The composed pipeline is one plan: Catalyst fuses the quality projection
  into the dedup aggregate's scan; one combiner-friendly min_by aggregate
  shuffle (fingerprint) and one window shuffle (source cap) survive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import fingerprint, text_profile, token_count


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    rates_pct: dict[str, int],
    default_pct: int = 10,
    hash_key: bool = False,
) -> DataFrame:
    """Deterministic stratified sampling: keep a row iff
    ``key mod 100 < pct(stratum)``. Reproducible by construction —
    independent of partitioning, task retries, and cluster size (unlike
    ``df.sample``, whose per-partition seeding ties results to the physical
    plan). With sequential ids the modulus IS the sampling rate; for
    non-uniform keys pass ``hash_key=True`` to sample on
    ``xxhash64(key)`` instead (not ANSI-SQL-reproducible → rows-only
    check, hence the registered query keeps it off)."""
    key = F.col(key_col)
    if hash_key:
        key = F.xxhash64(key)
    pct = F.lit(default_pct)
    for stratum, rate in sorted(rates_pct.items()):
        pct = F.when(F.col(stratum_col) == stratum, F.lit(rate)).otherwise(pct)
    return df.filter(F.pmod(key, F.lit(100)) < pct)


def cap_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list,
    k: int,
) -> DataFrame:
    """Keep at most ``k`` rows per group (per-domain cap in a training mix).
    One window shuffle on the group key; Spark's WindowGroupLimit prunes
    each partition to k rows before the final filter."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def token_budget_filter(
    df: DataFrame,
    budget_tokens: int,
    stratum_col: str = "lang",
    order_col: str = "doc_id",
    text_col: str = "text",
    cum_col: str | None = None,
) -> DataFrame:
    """Fill each stratum up to a token budget: docs taken in deterministic
    ``order_col`` order, kept while the running (inclusive) token total
    stays within ``budget_tokens``. The "give me ~N tokens per language"
    mixing primitive. One window shuffle on the stratum. Pass ``cum_col``
    to keep the running total in the output."""
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_tok = token_count(text_col)
    out = (
        df.withColumn("__tok", n_tok)
        .withColumn("__cum", F.sum("__tok").over(w).cast("bigint"))
        .filter(F.col("__cum") <= budget_tokens)
        .drop("__tok")
    )
    if cum_col is None:
        return out.drop("__cum")
    return out.withColumnRenamed("__cum", cum_col)


def curate(
    df: DataFrame,
    min_quality: float = 0.5,
    per_source_cap: int = 40,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """The composed curation pipeline: quality floor → exact dedup
    (canonical fingerprint, min-id survivor) → per-source cap keeping the
    highest-quality docs. Returns (doc_id, lang, source, quality).

    Quality is rounded to 6 decimals BEFORE it is used for ranking so the
    keep/drop decision is identical across engines (raw float ulp noise
    between Spark and the SQL oracle could otherwise flip the rank of two
    near-equal docs at the cap boundary)."""
    profiled = text_profile(df, text_col).withColumn(
        "quality", F.round(F.col("quality"), 6)
    )
    passed = profiled.filter(F.col("quality") >= min_quality)
    # min_by survivor election (not a row_number window): combines
    # map-side, no per-key sort, and the boilerplate-repeated-a-billion-
    # times hot fingerprint reduces on the mappers — same argument as
    # dedup_exact, which this is a fused copy of (fingerprint computed
    # in the same pass as the quality projection)
    cols = passed.columns
    null_safe_id = F.struct(
        F.col(id_col).isNull().alias("n"), F.col(id_col).alias("v")
    )  # same guard as dedup_exact: an all-NULL-id group must not emit
    # a corrupt all-NULL survivor (bare min_by ignores NULL orderings)
    deduped = (
        passed.groupBy(fingerprint(text_col).alias("__fp"))
        .agg(F.min_by(F.struct(*cols), null_safe_id).alias("__survivor"))
        .select("__survivor.*")
    )
    capped = cap_per_group(
        deduped,
        [source_col],
        [F.col("quality").desc(), F.col(id_col).asc()],
        per_source_cap,
    )
    return capped.select(id_col, "lang", source_col, "quality")


def decontaminate(
    train: DataFrame,
    test: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.1,
) -> DataFrame:
    """Test-set decontamination: flag training documents whose n-gram sets
    overlap the held-out test corpus (the GPT-3 appendix-C / PaLM
    "13-gram collision" check, with ``n`` sized to this corpus).

    Returns ``(doc_id, n_grams, n_hits, contamination, contaminated)``
    where ``contamination = n_hits / n_grams`` over the train doc's
    DISTINCT n-grams and ``n_hits`` counts how many of them appear
    ANYWHERE in the test corpus.

    Scale shape: the test side collapses to one GLOBAL distinct n-gram set
    (no per-doc identity) — at 100 TB train / GB-scale test that set is
    broadcast-sized, so the probe is a broadcast left-semi-style join: the
    train side never shuffles beyond its own shingle build, and no
    train×test pair blow-up can occur because hits are counted against the
    deduplicated global set. Shingles ride ``exploded_shingles``'s single
    exchange (operators/dedup.py:62)."""
    from .dedup import exploded_shingles

    tr = exploded_shingles(train, id_col, text_col, n=n)
    te = (
        exploded_shingles(test, id_col, text_col, n=n)
        .select("__s")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    per_doc = (
        tr.join(F.broadcast(te), "__s", "left")
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("__hit").alias("n_hits"),
        )
    )
    contamination = F.round(
        (F.col("n_hits") / F.col("n_grams")).cast("decimal(18,6)"), 4
    ).cast("double")
    return per_doc.select(
        F.col("__id").alias(id_col),
        "n_grams",
        "n_hits",
        contamination.alias("contamination"),
        (contamination >= threshold).alias("contaminated"),
    )


def md5_bucket(key_col: str, n: int):
    """First 32 md5 bits of the key's string form, mod ``n`` — THE
    derandomization primitive shared by sharding, split assignment,
    sequence packing, and weighted sampling. md5 (not xxhash64) because
    DuckDB computes the identical value, so every consumer keeps an exact
    oracle; the uniform u32 itself is ``md5_bucket(col, 1 << 32)``-shaped
    via :func:`md5_u32`."""
    return F.pmod(md5_u32(key_col), F.lit(n))


def md5_u32(key_col):
    """Uniform int in [0, 2^32) as a pure function of the key (a column
    name or a Column expression)."""
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    return F.conv(
        F.substring(F.md5(key.cast("string")), 1, 8), 16, 10
    ).cast("bigint")


def assign_shards(
    df: DataFrame,
    key_col: str,
    n_shards: int = 16,
    shard_col: str = "shard",
) -> DataFrame:
    """Deterministic shard assignment for training-data export: shard =
    first 32 md5 bits of the key, mod ``n_shards``. Stable under
    partitioning, retries, and cluster size — the property a resumable
    100 TB export needs (re-running a failed shard re-selects exactly the
    same rows). md5 is used instead of ``xxhash64`` because it is
    reproducible in ANSI SQL (the oracle casts the same hex prefix);
    swap in ``F.xxhash64`` for a ~5× cheaper hash when cross-engine
    verifiability is not required. Pure projection — no shuffle; the
    subsequent partitioned write (``sources/sinks.py``) is what groups
    rows physically."""
    return df.withColumn(shard_col, md5_bucket(key_col, n_shards))


def weighted_sample_per_group(
    df: DataFrame,
    group_cols: list[str],
    weight_col: str,
    id_col: str,
    k: int,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, ``k`` per group
    (Efraimidis–Spirakis A-ES): each row gets key ``u^(1/w)`` — here in log
    form ``ln(u)/w`` — and the top-``k`` keys per group are the sample.
    Heavier rows draw keys nearer 0, so selection probability is
    proportional to weight, exactly (Efraimidis & Spirakis, IPL 2006).

    ``u`` is NOT random: it is the first 32 md5 bits of the id mapped to
    (0, 1] — the same derandomization as ``assign_shards`` (md5 because
    both engines and any re-run agree on it), so the sample is stable
    under partitioning, retries, and cluster size, and the DuckDB oracle
    reproduces it. One window shuffle on the group key; WindowGroupLimit
    prunes partitions to ``k`` before the filter.

    Cross-engine precision caveat: the key ``ln(u)/w`` is JVM ``Math.log``
    on the Spark side and libm ``log`` in DuckDB/CPython, which may differ
    by 1 ulp for the same ``u``. Two keys straddling the per-group ``k``
    boundary within 1 ulp could therefore select different rows per
    engine. The id tiebreak only resolves EXACT key ties, not 1-ulp
    near-ties, so an oracle mismatch here that reproduces only for one
    boundary row should be diagnosed as float precision, not logic. Not
    observed at any tested SF; if it ever flakes, pre-round the key to a
    coarse fixed grid (the id tiebreak then resolves the collisions).

    A-ES requires w > 0: rows with zero/negative/null weight are DROPPED
    before keying (zero weight means zero selection probability; a
    negative weight would flip the key sign and always win — silently
    corrupting the sample).
    """
    df = df.filter(F.col(weight_col).cast("double") > 0)
    u = (md5_u32(id_col) + 1) / F.lit(4294967296.0)
    key = F.log(u) / F.col(weight_col).cast("double")
    return cap_per_group(
        df, group_cols, [key.desc(), F.col(id_col).asc()], k
    )


def negative_sample_per_anchor(
    df: DataFrame,
    id_col: str,
    group_col: str,
    k: int = 3,
    n_buckets: int = 8,
) -> DataFrame:
    """Derandomized contrastive negative sampling (SURVEY §2.P P8): for
    each anchor row, pick ``k`` "negatives" — rows whose ``group_col``
    differs (a different language/source/label) — without ever forming the
    anchors × candidates cross product.

    Blocking makes it linear-ish: both sides get ``md5_bucket(id,
    n_buckets)`` and only same-bucket pairs are considered, so the join
    emits ~n²/B pairs instead of n². Within a bucket, each anchor's
    candidates are ranked by ``md5(anchor_id:candidate_id)`` — a pairwise
    uniform draw both engines reproduce bit-for-bit — and the top ``k``
    survive via the same WindowGroupLimit path as every cap in this
    module. The sample is therefore stable under retries, partitioning,
    and engine (the DuckDB oracle runs the identical arithmetic), and
    each anchor's negatives are an unbiased uniform draw from its bucket's
    opposite-group rows.

    At 100 TB: ``n_buckets`` is the knob — pairs-per-bucket is
    (n/B)² x B = n²/B, so B scales quadratically with corpus growth to
    hold per-bucket work constant; anchors in a bucket with fewer than
    ``k`` opposite-group rows simply emit fewer negatives (re-bucket with
    a second hash seed to top up, same shape again). The md5 pair-rank
    means NO coordination state — no RNG seed distribution problem across
    1000 executors.
    """
    a = df.select(
        F.col(id_col).alias("anchor_id"),
        F.col(group_col).alias("anchor_group"),
        md5_bucket(id_col, n_buckets).alias("__bucket"),
    )
    c = df.select(
        F.col(id_col).alias("neg_id"),
        F.col(group_col).alias("neg_group"),
        md5_bucket(id_col, n_buckets).alias("__bucket"),
    )
    pairs = a.join(c, "__bucket").filter(
        F.col("anchor_group") != F.col("neg_group")
    )
    pair_key = F.md5(
        F.concat_ws(
            ":",
            F.col("anchor_id").cast("string"),
            F.col("neg_id").cast("string"),
        )
    )
    ranked = cap_per_group(
        pairs.withColumn("__pk", pair_key),
        ["anchor_id"],
        [F.col("__pk").asc(), F.col("neg_id").asc()],
        k,
    )
    return ranked.select("anchor_id", "anchor_group", "neg_id", "neg_group")


def global_ordinal(
    df: DataFrame,
    order_cols: list,
    ordinal_col: str = "position",
    n_partitions: int = 32,
) -> DataFrame:
    """Global 1-based rank over a TOTAL order without the single-partition
    window (SURVEY §2.P P10). ``ROW_NUMBER() OVER (ORDER BY ...)`` with no
    PARTITION BY funnels every row through ONE task — the canonical
    100 TB anti-pattern (the fleet plan audit would flag the empty
    partition spec). The scalable spelling is two-phase:

    1. ``repartitionByRange`` on the order key — Spark range-samples the
       key and assigns contiguous key ranges to partitions, so partition
       ``i`` holds keys strictly below partition ``i+1``'s.
    2. A per-partition ``row_number`` window PARTITIONED BY the physical
       partition id (parallel — p independent sorts of n/p rows), plus a
       p-row offset manifest (count per partition, prefix-summed over a
       p-row window — bounded grain regardless of data size) broadcast-
       joined back. ``position = offset[pid] + local_rank``.

    The offsets branch and the rank branch MUST read the identical
    physical partitioning: range-boundary SAMPLING is nondeterministic
    per execution, so any design that lets the two branches recompute the
    exchange independently is silently wrong. The pre-r06 persist+collect
    design had exactly that hole (after unpersist, a recompute resampled
    boundaries and every ordinal past partition 0 skewed at sf0.1), and
    relying on Catalyst's ReuseExchange is not enough either — reuse
    stops firing when the primitive is NESTED (chained ordinals, the RFM
    triple-rank), which re-executes the inner exchange per branch. The
    hard guarantee is ``localCheckpoint``: lineage is TRUNCATED, so every
    consumer must read the one materialized copy — recompute divergence
    is structurally impossible. (On a multi-node deployment swap for a
    reliable ``checkpoint`` dir or DISK-replicated persist; the shape —
    materialize the range-partitioned table once, then two cheap reads —
    is the same at 100 TB.)

    Because the range partitions are key-ordered and ``order_cols`` must
    form a total order (include a unique tiebreak!), the result equals the
    global row_number exactly — the sampled partition BOUNDARIES vary run
    to run, the assigned ordinals never do. This is how training-data
    curricula get a global position column at corpus scale.
    """
    from pyspark.sql import Window

    parted = (
        df.repartitionByRange(n_partitions, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # p-row offset manifest: count per partition, exclusive prefix sum.
    # The unpartitioned window is BOUNDED grain (p rows, p = n_partitions).
    woff = (
        Window.orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        parted.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__n"))
        .select(
            "__pid",
            F.coalesce(F.sum("__n").over(woff), F.lit(0)).alias("__off"),
        )
    )
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    return (
        parted.join(F.broadcast(offsets), "__pid")
        .withColumn(
            ordinal_col,
            (
                F.col("__off").cast("bigint")
                + F.row_number().over(w).cast("bigint")
            ),
        )
        .drop("__pid", "__off")
    )


def global_running_agg(
    df: DataFrame,
    order_cols: list,
    value_col,
    out_col="running",
    agg: str = "sum",
    n_partitions: int = 32,
    include_current: bool = True,
) -> DataFrame:
    """Distributed running aggregate (``SUM``/``MAX`` ... OVER (ORDER BY
    ...)) without the single-partition window — the prefix-scan sibling of
    :func:`global_ordinal` and the scale spelling for cumulative revenue
    (ABC/Pareto curves), rank-weighted sums (Gini), and skyline running
    maxima.

    Same one-plan shape as :func:`global_ordinal`: ``repartitionByRange``
    on the order key so partition ``i``'s keys all precede partition
    ``i+1``'s, a parallel per-partition window PARTITIONED BY the physical
    partition id, and a p-row offset manifest (each partition's TOTAL,
    exclusive-prefix-combined over a p-row bounded window) broadcast-
    joined back in: ``running = combine(offset[pid], within_running)``.
    The range-partitioned table is pinned with ``localCheckpoint`` so the
    offsets branch and the scan branch cannot resample different range
    boundaries — see global_ordinal's docstring for why anything weaker
    (persist+collect, ReuseExchange) is silently wrong under recompute.

    ``include_current=False`` gives the strictly-preceding frame
    (``ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING``): NULL when no
    row precedes globally — what skyline dominance checks need.
    ``order_cols`` must form a total order (include a unique tiebreak) for
    run-to-run determinism, exactly as with ``global_ordinal``.

    ``value_col``/``out_col`` may be lists to compute several running
    aggregates over the SAME order in one pass (one checkpoint, one
    manifest, one window sort) — a two-sample CDF needs two.
    """
    from pyspark.sql import Window

    if agg not in ("sum", "max"):
        raise ValueError(f"unsupported running agg {agg!r}")
    fagg = F.sum if agg == "sum" else F.max
    value_cols = [value_col] if isinstance(value_col, str) else list(value_col)
    out_cols = [out_col] if isinstance(out_col, str) else list(out_col)
    if len(value_cols) != len(out_cols):
        raise ValueError("value_col and out_col lengths differ")
    parted = (
        df.repartitionByRange(n_partitions, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # p-row offset manifest: per-partition totals, exclusive prefix combine
    # (NULL when no partition precedes). Bounded grain: p rows.
    woff = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        parted.groupBy("__pid")
        .agg(*[fagg(v).alias(f"__t{i}") for i, v in enumerate(value_cols)])
        .select(
            "__pid",
            *[
                fagg(f"__t{i}").over(woff).alias(f"__off{i}")
                for i in range(len(value_cols))
            ],
        )
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0 if include_current else -1)
    )
    tmp = parted.join(F.broadcast(offsets), "__pid")
    drop = ["__pid"]
    for i, (vcol, ocol) in enumerate(zip(value_cols, out_cols)):
        tmp = tmp.withColumn(f"__within{i}", fagg(vcol).over(w))
        vtype = tmp.schema[f"__within{i}"].dataType
        within = F.col(f"__within{i}")
        off = F.col(f"__off{i}").cast(vtype)
        if agg == "sum":
            merged = F.when(
                within.isNull() & off.isNull(), F.lit(None).cast(vtype)
            ).otherwise(
                (
                    F.coalesce(within, F.lit(0).cast(vtype))
                    + F.coalesce(off, F.lit(0).cast(vtype))
                ).cast(vtype)
            )
        else:
            # greatest() skips NULLs and returns NULL only when both are —
            # exactly the no-preceding-row-globally semantics
            merged = F.greatest(within, off)
        tmp = tmp.withColumn(ocol, merged)
        drop += [f"__off{i}", f"__within{i}"]
    return tmp.drop(*drop)


def ntile_from_ordinal(rn, n, k: int):
    """Exact ``NTILE(k)`` bucket from a 1-based global ordinal ``rn`` and
    total count ``n`` (both Columns) — the distributed NTILE: pair with
    :func:`global_ordinal` instead of an unpartitioned window.

    Standard NTILE semantics: with ``q = n div k`` and ``r = n mod k``,
    the first ``r`` buckets hold ``q+1`` rows and the rest ``q`` — which
    both Spark's and DuckDB's NTILE implement, so the result is
    oracle-exact against a real NTILE over the same total order.

    All arithmetic is integral: ``ceil(x/d)`` is spelled
    ``div(x-1, d) + 1`` (bigint IntegralDivide), never a double ``/`` —
    a float quotient loses 53-bit exactness once ``rn`` enters the 1e15+
    regime and boundary rows would misround into the adjacent bucket.
    """

    def iceil(x, d):
        # exact ceil(x / d) for x >= 1, d >= 1, all-bigint
        return F.call_function("div", x - F.lit(1), d) + F.lit(1)

    q = F.call_function("div", n, F.lit(k))
    r = n % k
    head = r * (q + 1)
    # greatest(q,1) only guards the branch ANSI-eval never selects when
    # q=0 (n<k puts every row in the first-r-buckets branch)
    return (
        F.when(rn <= head, iceil(rn, q + 1))
        .otherwise(r + iceil(rn - head, F.greatest(q, F.lit(1))))
        .cast("int")
    )


def span_corruption_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mask_pct: int = 15,
) -> DataFrame:
    """T5-style span-corruption training pairs (SURVEY §2.Q): ~``mask_pct``%
    of whitespace tokens are masked, CONTIGUOUS masked runs collapse to one
    ``<extra_id_k>`` sentinel in the input, and the target lists each
    sentinel followed by the span it replaced — the standard denoising
    objective (Raffel et al., JMLR 2020 §3.1.4).

    The mask is derandomized: token ``pos`` of document ``d`` is masked iff
    ``md5(d:pos) % 100 < mask_pct`` — retry/partitioning/engine-stable, so
    the DuckDB oracle reproduces every pair bit-for-bit (no RNG seed
    distribution across executors). Runs become islands by the classic
    gaps-and-islands key ``pos - rank_among_masked``; sentinel numbering is
    the island's ordinal by start position.

    Shuffle shape: one Generate (posexplode) fans tokens out, two
    partitioned windows (island key, sentinel ordinal) and two grouped
    re-aggregations fold them back — all partitioned by document id, so
    the work is embarrassingly parallel over docs and linear in tokens.
    Assembly uses ``array_sort(collect_list(struct(pos, tok)))`` —
    order-deterministic because ``pos`` is unique per document (a bare
    ``collect_list`` would be arrival-ordered and non-reproducible).
    Documents with no maskable token emit an empty target and n_spans 0.
    """
    from pyspark.sql import Window

    toks = (
        df.filter(
            F.col(text_col).isNotNull()
            & (F.trim(F.col(text_col)) != "")
        )
        .select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias(
                "pos", "tok"
            ),
        )
        .withColumn(
            "masked",
            F.pmod(md5_u32(_pos_key()), F.lit(100)) < F.lit(mask_pct),
        )
    )

    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    masked_t = toks.filter(F.col("masked")).withColumn(
        "island", F.col("pos") - F.row_number().over(w_doc)
    )
    spans = masked_t.groupBy("doc_id", "island").agg(
        F.min("pos").alias("start"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", "tok"))
                ),
                lambda s: s["tok"],
            ),
        ).alias("span_text"),
        F.count(F.lit(1)).alias("span_len"),
    )
    w_span = Window.partitionBy("doc_id").orderBy("start")
    spans = spans.withColumn("k", F.row_number().over(w_span) - 1)

    sentinel = F.concat(
        F.lit("<extra_id_"), F.col("k").cast("string"), F.lit(">")
    )
    input_parts = (
        toks.filter(~F.col("masked")).select("doc_id", "pos", "tok")
    ).unionByName(
        spans.select(
            "doc_id",
            F.col("start").alias("pos"),
            sentinel.alias("tok"),
        )
    )
    inputs = input_parts.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("input_text")
    )
    targets = spans.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "k",
                            F.concat(
                                sentinel, F.lit(" "), F.col("span_text")
                            ).alias("part"),
                        )
                    )
                ),
                lambda s: s["part"],
            ),
        ).alias("target_text"),
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        F.sum("span_len").cast("bigint").alias("n_masked"),
    )
    stats = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens")
    )
    return (
        stats.join(inputs, "doc_id", "left")
        .join(targets, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("n_masked"), F.lit(0).cast("bigint")).alias(
                "n_masked"
            ),
            F.coalesce(F.col("n_spans"), F.lit(0).cast("bigint")).alias(
                "n_spans"
            ),
            F.coalesce(F.col("input_text"), F.lit("")).alias("input_text"),
            F.coalesce(F.col("target_text"), F.lit("")).alias("target_text"),
        )
    )


def _pos_key():
    """(doc_id, pos) mask key rendered exactly as the oracle renders it."""
    return F.concat_ws(
        ":", F.col("doc_id").cast("string"), F.col("pos").cast("string")
    )
