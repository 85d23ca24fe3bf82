"""Fuzzy entity resolution (dimension-cleanup tier): match messy strings
to a canonical list under an edit-distance budget WITHOUT the n×m cross
join.

The 100 TB shape is block → compare → rank: a cheap blocking key that the
expected error modes cannot change (here: the last-3-character suffix — a
single deletion/substitution anywhere before the tail preserves it) turns
the cross join into a per-block equi-join, levenshtein runs only inside
blocks, and a window keyed on the messy id keeps the single best match
(min distance, lexicographic tiebreak — deterministic). Blocking recall is
a MODELING decision: a key the typo can break loses the pair silently, so
pick it from the error model (edit ops never touch the suffix here);
production systems union several keys (prefix, suffix, phonetic) to cover
several error modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fuzzy_match(
    messy: DataFrame,
    canonical: DataFrame,
    messy_id: str,
    messy_col: str,
    canon_col: str,
    max_dist: int = 2,
    block_suffix: int = 3,
) -> DataFrame:
    """Best canonical match per messy row: ``(messy_id, <messy_col>,
    matched, distance)`` with ``distance <= max_dist``, blocked on the
    last ``block_suffix`` characters of both sides."""
    m = messy.select(
        F.col(messy_id).alias("__mid"),
        F.col(messy_col).alias("__m"),
        F.substring(F.col(messy_col), -block_suffix, block_suffix).alias("__blk"),
    )
    c = canonical.select(
        F.col(canon_col).alias("__c"),
        F.substring(F.col(canon_col), -block_suffix, block_suffix).alias("__blk"),
    ).distinct()
    scored = (
        m.join(c, "__blk")
        .withColumn("__d", F.levenshtein("__m", "__c"))
        .filter(F.col("__d") <= max_dist)
    )
    w = Window.partitionBy("__mid").orderBy(F.col("__d").asc(), F.col("__c").asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("__mid").alias(messy_id),
            F.col("__m").alias(messy_col),
            F.col("__c").alias("matched"),
            F.col("__d").alias("distance"),
        )
    )


def editdist_self_join(
    words: DataFrame,
    word_col: str = "w",
    max_dist: int = 1,
    short_len: int = 3,
) -> DataFrame:
    """All UNORDERED pairs of distinct words within ``max_dist`` edits
    (currently proven sound only for ``max_dist=1``), without a cross
    join.

    Blocking is a SOUND candidate filter for one edit: a single
    substitution destroys at most 2 of a word's ``len-1`` bigrams, and a
    single indel at most 1, so any pair of words of length >= 4 (or a
    3/4-length indel pair) within one edit still SHARES at least one
    character bigram — those pairs meet in a bigram block. The only pairs
    the bigram argument cannot cover are both-short words (a substitution
    on a length-3 word can destroy both its bigrams), so words of length
    <= ``short_len`` additionally land in one dedicated SHORT block.
    Candidates meet in >= 1 block, are deduped, and verified with the
    exact ``levenshtein``.

    Scale: an equi-join on block keys — candidate volume is sum of
    squared block sizes, linear for natural vocabularies (bigram df is
    zipfian but bounded); a stop-bigram cap like dedup.py's max_df
    applies verbatim if a corpus has a degenerate hot bigram.

    Returns ``(w1, w2, dist)`` with ``w1 < w2``.
    """
    if max_dist != 1:
        raise ValueError(
            "bigram+short blocking is proven sound for max_dist=1 only"
        )
    w = (
        words.select(F.col(word_col).alias("w"))
        .filter(F.col("w").isNotNull() & (F.length("w") > 0))
        .distinct()
    )
    bigram_blocks = w.select(
        "w",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(length(w) - 1, 1)),"
                " i -> substring(w, i, 2))"
            )
        ).alias("blk"),
    ).distinct()
    short_blocks = w.filter(F.length("w") <= short_len).select(
        "w", F.lit("#SHORT").alias("blk")
    )
    blocks = bigram_blocks.unionByName(short_blocks)
    lhs = blocks.select(F.col("w").alias("w1"), "blk")
    rhs = blocks.select(F.col("w").alias("w2"), "blk")
    # verify with THRESHOLD levenshtein (3-arg, SPARK-40571): the DP
    # early-exits once a row of the matrix exceeds max_dist and returns
    # -1 — measured ~1.5x faster than the unbounded verify on ID-heavy
    # vocabularies where most candidates are distance 2-3. (A
    # |len1-len2| prefilter measured SLOWER here: Catalyst pushes it
    # below the distinct, re-evaluating it on every pre-dedup join row.)
    return (
        lhs.join(rhs, "blk")
        .filter(F.col("w1") < F.col("w2"))
        .select("w1", "w2")
        .distinct()
        .withColumn(
            "dist", F.levenshtein("w1", "w2", max_dist).cast("int")
        )
        .filter((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
    )


def editdist_self_join_passjoin(
    words: DataFrame,
    word_col: str = "w",
    max_dist: int = 1,
) -> DataFrame:
    """PassJoin-style positional pigeonhole blocking for 1-edit pairs
    (Li, Deng, Feng — VLDB'11 "PASS-JOIN"), the segment alternative to
    :func:`editdist_self_join`'s content bigrams.

    Each word of length L splits at h = L div 2 into seg1 = w[1..h] and
    seg2 = w[h+1..L]. One edit touches at most one segment, so for a
    pair (v, w) with |v| in {L-1, L, L+1}: either w's seg1 appears as
    v's prefix of length h, or w's seg2 appears in v at start position
    h+1+delta for a shift delta bounded by the length difference
    (insertion before the split shifts the tail right, deletion shifts
    it left). INDEX keys carry (segment id, L, content); PROBE keys
    enumerate both segments at every candidate index length — constant
    fan-out per word (2 index + <= 8 probe keys), versus ~L bigram keys,
    and segment blocks are far more selective than single bigrams on
    natural vocabularies. Verification is the same threshold
    levenshtein.

    Returns ``(w1, w2, dist)`` with ``w1 < w2`` — EXACTLY the
    editdist_self_join result set (equivalence is pytest-pinned).
    """
    if max_dist != 1:
        raise ValueError("passjoin segments implemented for max_dist=1 only")
    w = (
        words.select(F.col(word_col).alias("w"))
        .filter(F.col("w").isNotNull() & (F.length("w") > 0))
        .distinct()
    )
    # INDEX keys: the word's own two segments, tagged with its length
    idx = w.select(
        "w",
        F.explode(
            F.expr(
                """
                array(
                  struct(1 AS seg, length(w) AS tlen,
                         substring(w, 1, length(w) div 2) AS content),
                  struct(2 AS seg, length(w) AS tlen,
                         substring(w, length(w) div 2 + 1,
                                   length(w) - length(w) div 2) AS content)
                )
                """
            )
        ).alias("k"),
    ).select("w", "k.seg", "k.tlen", "k.content")
    # PROBE keys: for each candidate index length L in {len-1, len, len+1},
    # the prefix of length L div 2 (seg1 probe) and the substrings of
    # length L - L div 2 starting at L div 2 + 1 + delta (seg2 probes),
    # delta in {-1, 0, 1} clipped to valid starts
    probe = w.select(
        "w",
        F.explode(
            F.expr(
                """
                filter(
                  flatten(transform(
                    sequence(greatest(length(w) - 1, 1), length(w) + 1),
                    L -> array(
                      struct(1 AS seg, L AS tlen,
                             substring(w, 1, L div 2) AS content),
                      struct(2 AS seg, L AS tlen,
                             substring(w, L div 2, L - L div 2) AS content),
                      struct(2 AS seg, L AS tlen,
                             substring(w, L div 2 + 1, L - L div 2)
                               AS content),
                      struct(2 AS seg, L AS tlen,
                             substring(w, L div 2 + 2, L - L div 2)
                               AS content)
                    )
                  )),
                  k -> length(k.content) > 0
                )
                """
            )
        ).alias("k"),
    ).select("w", "k.seg", "k.tlen", "k.content")
    cand = (
        idx.alias("i")
        .join(
            probe.alias("p"),
            (F.col("i.seg") == F.col("p.seg"))
            & (F.col("i.tlen") == F.col("p.tlen"))
            & (F.col("i.content") == F.col("p.content")),
        )
        .filter(F.col("i.w") != F.col("p.w"))
        .select(
            F.least(F.col("i.w"), F.col("p.w")).alias("w1"),
            F.greatest(F.col("i.w"), F.col("p.w")).alias("w2"),
        )
    )
    # the one pair class segments cannot reach: two length-1 words under
    # substitution (their only nonempty segment IS the edited char, and
    # the empty seg1 prefix matches only trivially). One dedicated tiny
    # block covers it.
    ones = w.filter(F.length("w") == 1)
    one_pairs = (
        ones.select(F.col("w").alias("w1"), F.lit(1).alias("blk"))
        .join(ones.select(F.col("w").alias("w2"), F.lit(1).alias("blk")), "blk")
        .filter(F.col("w1") < F.col("w2"))
        .select("w1", "w2")
    )
    cand = cand.unionByName(one_pairs).distinct()
    return cand.withColumn(
        "dist", F.levenshtein("w1", "w2", max_dist).cast("int")
    ).filter((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
