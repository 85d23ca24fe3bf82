"""Skew mitigation operators (SURVEY §4 shuffle/spill row; north-star 100 TB).

AQE's skew-join splitting handles sort-merge joins automatically, but two
shapes still need explicit salting at the 100 TB tier:

- an aggregation whose group key has a handful of dominant values (e.g.
  ``l_returnflag`` — 3 values over the whole fact table): every row of a hot
  key lands on ONE reducer. ``salted_agg_sum`` splits each key into
  ``num_salts`` sub-groups (two-phase: partial agg on (key, salt), final agg
  on key) so hot keys use ``num_salts`` reducers. Exact for any
  associative+commutative aggregate; SUM/COUNT here.
- an equi-join where the probe side has hot keys. ``salted_join`` salts the
  big side deterministically and replicates the small side once per salt
  value — the join result is row-identical to the unsalted join.

Salts are derived with ``xxhash64`` from row content, never ``rand()`` —
results must be deterministic under retries (a re-executed task must salt
rows identically, or shuffle-stage retries double-count).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(cols: Sequence[str], num_salts: int) -> Column:
    return F.pmod(F.xxhash64(*cols), F.lit(num_salts))


def salted_agg_sum(
    df: DataFrame,
    group_cols: Sequence[str],
    sum_cols: dict[str, Column],
    salt_from: Sequence[str],
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation: SUM/COUNT expressions in ``sum_cols``
    (alias -> expression) are partially aggregated per (group, salt), then
    combined per group. Identical result to the direct groupBy for
    associative aggregates; the first shuffle spreads each hot key over
    ``num_salts`` reducers."""
    partial = (
        df.withColumn("__salt", _salt(salt_from, num_salts))
        .groupBy(*group_cols, "__salt")
        .agg(*[expr.alias(f"__p_{name}") for name, expr in sum_cols.items()])
    )
    return partial.groupBy(*group_cols).agg(
        *[F.sum(f"__p_{name}").alias(name) for name in sum_cols]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over ``num_salts``
    partitions. The big side gets a content-derived salt; the small side is
    replicated ``num_salts``× (explode over the salt range) so every salted
    big row still finds its match. Row-identical to the plain join."""
    # salt from FULL row content, not the join key — a salt derived from the
    # key alone would map every row of a hot key to the same salt value,
    # defeating the spread
    big_salted = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*big.columns), F.lit(num_salts))
    )
    small_rep = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    joined = big_salted.join(
        small_rep,
        (F.col(big_key) == F.col(small_key))
        & (big_salted["__salt"] == small_rep["__salt"]),
        how,
    )
    return joined.drop("__salt")
