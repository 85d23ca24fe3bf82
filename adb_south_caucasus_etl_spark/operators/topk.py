"""Top-k per group (SURVEY §2.E O3) and global top-k.

``row_number`` over a per-group window + filter — partial top-k runs
map-side inside the window sort, so only k rows per group per partition
survive the shuffle when AQE + rank pushdown apply. Always pass a
deterministic tiebreaker: order-insensitive hash comparison (and any sane
consumer) needs ties broken by a unique key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Keep the top ``k`` rows of each group, ranked 1..k by ``order_cols``
    (include a unique tiebreaker column last for determinism)."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
