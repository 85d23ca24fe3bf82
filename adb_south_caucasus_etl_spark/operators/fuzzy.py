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
