"""Deduplication operators (SURVEY §2.H L1/L2) — exact, Jaccard, MinHash-LSH,
SimHash.

Scale design:

- ``dedup_exact`` / fingerprint dedup: one hash-partition shuffle on the key
  (or its md5), deterministic survivor (min id), no driver involvement.
- ``jaccard_pairs``: the *inverted index* formulation — explode shingles,
  self-join on shingle, count co-occurrences — never materializes the n²
  pair space, only pairs that actually share a shingle. This is the exact
  counterpart of a MinHash candidate join and the standard 100-TB-safe way
  to compute exact Jaccard.
- ``minhash_signatures`` / ``lsh_candidate_pairs``: hand-rolled MinHash on
  top of ``xxhash64`` (JVM, codegen'd, deterministic — no Python in the hot
  path, unlike ml.feature.MinHashLSH which needs a Vector UDT conversion).
  Banding turns near-dup search into an equi-join on (band, band_hash):
  shuffle is keyed on the band hash, so it scales like any large join and
  AQE handles skewed bands.
- ``simhash64``: vectorized Arrow-batched pandas UDF (SURVEY §2.K L6) —
  the canonical "slow path done right": numpy bit-twiddling per batch,
  no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import shingle_hashes


def dedup_exact(
    df: DataFrame, key_cols: list[str], order_col: str
) -> DataFrame:
    """Keep exactly one row per ``key_cols`` group — the one with the
    smallest ``order_col`` (deterministic, unlike ``dropDuplicates``).
    One shuffle on the key columns."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-word-shingle Jaccard similarity for every document pair that
    shares ≥1 shingle, filtered to ``jaccard >= threshold``.

    Inverted-index join: |output shuffle| ∝ co-occurring shingles, not n².
    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded to 4.

    Scale choices (measured at sf0.1, see BENCH):
    - shingles are ``xxhash64``-ed to int64 *before* the shuffle — 8-byte
      join keys instead of ~30-byte strings (collision odds at 64 bits are
      ~m²/2⁶⁵, irrelevant below ~10⁹ distinct shingles);
    - NO ``.distinct()`` after the explode: ``word_shingles`` is
      ``array_distinct`` per doc, so (id, shingle) is already unique —
      the distinct was a second full shuffle for nothing;
    - set sizes come from ``F.size`` on the un-exploded array — zero-shuffle,
      recomputing tokenization once more is pure map-side CPU.
    """
    shingles = shingle_hashes(text_col, n)
    sh = df.select(
        F.col(id_col).alias("__id"),
        F.explode(shingles).alias("__shingle"),
    )
    # partition on the join key BEFORE the self-join: both sides then read
    # the SAME shuffle output (ReusedExchange) already co-located on
    # __shingle, so the explode+hash runs once and the join adds no shuffle
    sh = sh.repartition(F.col("__shingle"))
    sizes = df.select(
        F.col(id_col).alias("__id"), F.size(shingles).alias("__n")
    )
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.__shingle") == F.col("b.__shingle"))
               & (F.col("a.__id") < F.col("b.__id")))
        .groupBy(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("__inter"))
    )
    sa = sizes.select(F.col("__id").alias("id_a"), F.col("__n").alias("__na"))
    sb = sizes.select(F.col("__id").alias("id_b"), F.col("__n").alias("__nb"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
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


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
) -> DataFrame:
    """(__id, __sig: array<bigint>) MinHash signatures: for seed i, the min
    ``xxhash64(shingle, i)`` over the document's shingle set.

    Computed as ``num_hashes`` min-aggregates over *exploded* shingles — one
    shuffle on the doc id, every shingle hashed exactly ``num_hashes`` times.
    (The tempting pure-expression form ``array_min(transform(shingles, ...))``
    re-evaluates the shingle-building expression once per seed after
    Catalyst's projection collapse — 32× the work; measured 15× slower.)

    Each shingle string is hashed ONCE (``xxhash64`` → int64); the per-seed
    hashes mix that 8-byte value, not the full string. No ``.distinct()``
    before the agg: min() is duplicate-insensitive, and ``word_shingles``
    is already distinct per doc anyway.
    """
    sh = df.select(
        F.col(id_col).alias("__id"),
        F.explode(shingle_hashes(text_col, n)).alias("__s"),
    )
    mins = [
        F.min(F.xxhash64("__s", F.lit(i))).alias(f"__h{i}")
        for i in range(num_hashes)
    ]
    return (
        sh.groupBy("__id")
        .agg(*mins)
        .select(
            "__id",
            F.array(*[f"__h{i}" for i in range(num_hashes)]).alias("__sig"),
        )
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
    sig = minhash_signatures(df, id_col, text_col, n, num_hashes)
    # one row per band: (band_idx, hash of the band's slice, id, full sig).
    # The signature rides along through the band join: the min-agg's shuffle
    # output is reused by BOTH sides of the self-join (ReusedExchange), so
    # carrying sig costs bytes but zero extra passes — measured faster at
    # bench scale than the "slim join + rejoin signatures" variant, which
    # recomputes or caches the signature subtree three times. At petabyte
    # scale flip to the slim variant with an explicitly materialized
    # signature table.
    banded = sig.select(
        "__id",
        "__sig",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(F.col("__sig"), b * rows + 1, rows),
                                lambda x: x.cast("string"),
                            ),
                        )
                    ).alias("bhash"),
                ),
            )
        ).alias("__b"),
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
    est = F.round(
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                lambda eq: eq,
            )
        )
        / F.lit(float(num_hashes)),
        4,
    )
    return (
        cand.withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
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

    sh = df.select(
        F.col(id_col).alias("__id"), simhash64(F.col(text_col)).alias("__sh")
    )
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
