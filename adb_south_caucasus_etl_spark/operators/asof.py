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
    tolerance_s: float | None = None,
) -> DataFrame:
    """For each left row, attach the payload of the right row with the
    largest ``right_ts <= left_ts`` (direction="backward") or smallest
    ``right_ts >= left_ts`` ("forward") within the same key group.

    ``tolerance_s`` (seconds, like ``pd.merge_asof(tolerance=...)``)
    rejects matches farther than the bound: the row keeps null payloads
    instead. For "nearest", the bound applies per direction BEFORE the
    nearer candidate is chosen, so a too-far backward match cannot
    shadow an in-range forward one.

    Right payload columns (everything except keys + ts) must not collide
    with left column names. Unmatched left rows keep null payloads
    (left-join semantics).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if tolerance_s is not None and tolerance_s < 0:
        raise ValueError(f"tolerance_s must be >= 0, got {tolerance_s}")
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    if direction == "nearest":
        return _asof_nearest(left, right, keys, left_ts, right_ts, tolerance_s)

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
    mts = "__asof_mts"
    rts_src = F.when(F.col(_TAG) == 0, F.col(_TS))
    filled = unioned.withColumns(
        {c: F.last(c, ignorenulls=True).over(w) for c in payload}
        | {mts: F.last(rts_src, ignorenulls=True).over(w)}
    ).filter(F.col(_TAG) == 1)
    if tolerance_s is not None:
        gap = F.abs(F.unix_micros(F.col(_TS)) - F.unix_micros(F.col(mts)))
        in_tol = gap <= int(tolerance_s * 1_000_000)
        filled = filled.withColumns(
            {c: F.when(in_tol, F.col(c)) for c in payload}
        )
    return filled.drop(_TAG, _TS, mts)


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    tolerance_s: float | None = None,
) -> DataFrame:
    """direction="nearest": attach the right row whose timestamp is
    CLOSEST to the left timestamp in either direction; exact-distance
    ties resolve backward (the earlier right row), matching the
    convention of ``pd.merge_asof(direction="nearest")``.

    Same union-tag shape as backward/forward, but the single keyed
    exchange feeds TWO window sorts (ascending carries the
    last-at-or-before candidate, descending the first-at-or-after),
    then a per-row CASE picks the nearer candidate. Still one shuffle
    total — Spark reuses the hash partitioning for both sorts — so the
    100 TB cost model is identical to the one-directional forms plus
    one extra in-partition sort. Adds a ``__asof_dir`` column
    ('backward' | 'forward' | null) reporting which side won.

    Right-side duplicate ``(keys, ts)`` rows: which duplicate wins is
    unspecified (same caveat as backward/forward) — dedupe first.
    """
    payload = [c for c in right.columns if c not in keys and c != right_ts]
    collisions = set(payload) & set(left.columns)
    if collisions:
        raise ValueError(
            f"right payload columns collide with left: {sorted(collisions)}; "
            "rename before joining"
        )

    rts = "__asof_rts"
    l_tagged = left.withColumns(
        {_TS: F.col(left_ts), _TAG: F.lit(1), rts: F.lit(None).cast("timestamp")}
        | {c: F.lit(None).cast(right.schema[c].dataType) for c in payload}
    )
    r_tagged = right.withColumns(
        {_TS: F.col(right_ts), _TAG: F.lit(0), rts: F.col(right_ts)}
    ).select(*keys, _TS, _TAG, rts, *payload)
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    wb = (
        Window.partitionBy(*keys)
        .orderBy(F.col(_TS).asc(), F.col(_TAG).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*keys)
        .orderBy(F.col(_TS).desc(), F.col(_TAG).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    both = unioned.withColumns(
        {f"__bw_{c}": F.last(c, ignorenulls=True).over(wb) for c in payload}
        | {f"__fw_{c}": F.last(c, ignorenulls=True).over(wf) for c in payload}
        | {
            "__bw_ts": F.last(rts, ignorenulls=True).over(wb),
            "__fw_ts": F.last(rts, ignorenulls=True).over(wf),
        }
    ).filter(F.col(_TAG) == 1)

    bw_gap = F.unix_micros(F.col(_TS)) - F.unix_micros(F.col("__bw_ts"))
    fw_gap = F.unix_micros(F.col("__fw_ts")) - F.unix_micros(F.col(_TS))
    if tolerance_s is not None:
        tol = int(tolerance_s * 1_000_000)
        both = both.withColumns(
            # null the payload alongside the marker: an out-of-tolerance
            # candidate must not leak its carried values into the pick
            {
                f"__bw_{c}": F.when(bw_gap <= tol, F.col(f"__bw_{c}"))
                for c in payload
            }
            | {
                f"__fw_{c}": F.when(fw_gap <= tol, F.col(f"__fw_{c}"))
                for c in payload
            }
            | {
                "__bw_ts": F.when(bw_gap <= tol, F.col("__bw_ts")),
                "__fw_ts": F.when(fw_gap <= tol, F.col("__fw_ts")),
            }
        )
    # backward wins ties and wherever forward is absent
    use_bw = F.col("__fw_ts").isNull() | (
        F.col("__bw_ts").isNotNull() & (bw_gap <= fw_gap)
    )
    picked = both.withColumns(
        {
            c: F.when(use_bw, F.col(f"__bw_{c}")).otherwise(
                F.col(f"__fw_{c}")
            )
            for c in payload
        }
        | {
            "__asof_dir": F.when(
                F.col("__bw_ts").isNull() & F.col("__fw_ts").isNull(),
                F.lit(None).cast("string"),
            )
            .when(use_bw, F.lit("backward"))
            .otherwise(F.lit("forward"))
        }
    )
    drop = (
        [_TAG, _TS, rts, "__bw_ts", "__fw_ts"]
        + [f"__bw_{c}" for c in payload]
        + [f"__fw_{c}" for c in payload]
    )
    return picked.drop(*drop)
