"""As-of join (SURVEY §2.C J5) — Spark-native, single-shuffle.

Spark has no built-in as-of join. Instead of a per-group
``pd.merge_asof`` (Python-side, skew-fragile), this uses the union-tag
algorithm, which stays entirely in JVM window code:

1. tag left rows 1, right rows 0; union them aligned on
   ``(keys, ts, right-payload-as-null-on-left)``
2. one window per key ordered by ``(ts, tag)`` carries the last non-null
   right payload forward (``last(..., ignorenulls=True)``)
3. keep only left rows

Cost: ONE shuffle on the join keys (the window sort), regardless of table
sizes — no broadcast requirement, no nested-loop. At 100 TB this is the
shape you want: both sides hash-partition by key, sort within partition.
Skewed keys can be handled upstream by AQE since the shuffle is a plain
window exchange.

Tie semantics: a right row at exactly ``left_ts`` matches (``<=``, like
``pd.merge_asof`` default). If the right side has duplicate ``(keys, ts)``,
which duplicate wins is unspecified — dedupe the right side first for
deterministic output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TAG = "__asof_is_left"
_TS = "__asof_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the payload of the right row with the
    largest ``right_ts <= left_ts`` (direction="backward") or smallest
    ``right_ts >= left_ts`` ("forward") within the same key group.

    Right payload columns (everything except keys + ts) must not collide
    with left column names. Unmatched left rows keep null payloads
    (left-join semantics).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts

    payload = [c for c in right.columns if c not in keys and c != right_ts]
    collisions = set(payload) & set(left.columns)
    if collisions:
        raise ValueError(
            f"right payload columns collide with left: {sorted(collisions)}; "
            "rename before joining"
        )

    l_tagged = left.withColumns(
        {_TS: F.col(left_ts), _TAG: F.lit(1)}
        | {c: F.lit(None).cast(right.schema[c].dataType) for c in payload}
    )
    r_tagged = right.withColumns({_TS: F.col(right_ts), _TAG: F.lit(0)}).select(
        *keys, _TS, _TAG, *payload
    )
    # align columns for unionByName; left-only columns become null on right rows
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    if direction == "backward":
        order = [F.col(_TS).asc(), F.col(_TAG).asc()]
    else:
        order = [F.col(_TS).desc(), F.col(_TAG).asc()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumns(
        {c: F.last(c, ignorenulls=True).over(w) for c in payload}
    )
    return filled.filter(F.col(_TAG) == 1).drop(_TAG, _TS)
