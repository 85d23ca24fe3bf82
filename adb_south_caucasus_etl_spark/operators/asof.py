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

TIMESTAMP_NTZ + tolerance caveat: tolerance gaps are computed via
``unix_micros(ts.cast("timestamp"))``, and casting NTZ → TZ applies the
SESSION timezone. The two casts cancel in the gap only when the session
zone has a FIXED offset; under a DST-observing session zone two NTZ
values straddling a transition shift by different offsets and the gap is
off by the DST delta. This repo pins ``spark.sql.session.timeZone=UTC``
(session.py), which makes the cast exact; deployments that unpin the
session zone must keep it fixed-offset for NTZ + tolerance joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TAG = "__asof_is_left"
_TS = "__asof_ts"
# reserved field name inside the carried struct — a payload column literally
# named "mts" must not create a duplicate/ambiguous struct field
_MTS = "__asof_mts"


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
    reserved = {c for c in payload if c.startswith("__asof")}
    if reserved:
        raise ValueError(
            f"right payload columns use reserved __asof* names: "
            f"{sorted(reserved)}; rename before joining"
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
    # Carry the matched right ROW as one struct (ts + every payload column)
    # and unpack after the window: a right row's struct is never null, so
    # last(ignorenulls) picks the match atomically. Carrying columns
    # individually would let a STALER row's value survive wherever the
    # matched row holds NULL in that column — payload and matched-ts could
    # then come from different rows, breaking pd.merge_asof parity (and,
    # under tolerance, validating the wrong row's distance).
    pk = "__asof_pack"
    pack = F.when(
        F.col(_TAG) == 0,
        F.struct(
            F.col(_TS).alias(_MTS), *[F.col(c).alias(c) for c in payload]
        ),
    )
    filled = (
        unioned.withColumn(pk, F.last(pack, ignorenulls=True).over(w))
        .filter(F.col(_TAG) == 1)
    )
    matched = F.col(pk)
    if tolerance_s is not None:
        # cast-through-timestamp keeps unix_micros applicable to
        # TIMESTAMP_NTZ inputs; the session-tz shift cancels in the gap
        gap = F.abs(
            F.unix_micros(F.col(_TS).cast("timestamp"))
            - F.unix_micros(matched[_MTS].cast("timestamp"))
        )
        matched = F.when(gap <= int(tolerance_s * 1_000_000), matched)
    return filled.withColumns(
        {c: matched[c] for c in payload}
    ).drop(_TAG, _TS, pk)


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
    # '__bw'/'__fw' carry the two directional candidates here and are
    # dropped at the end — a payload column with either name would be
    # silently clobbered and then deleted, so reject it like __asof*
    reserved = {
        c for c in payload if c.startswith("__asof") or c in ("__bw", "__fw")
    }
    if reserved:
        raise ValueError(
            f"right payload columns use reserved names (__asof*, __bw, "
            f"__fw): {sorted(reserved)}; rename before joining"
        )

    l_tagged = left.withColumns(
        {_TS: F.col(left_ts), _TAG: F.lit(1)}
        | {c: F.lit(None).cast(right.schema[c].dataType) for c in payload}
    )
    r_tagged = right.withColumns(
        {_TS: F.col(right_ts), _TAG: F.lit(0)}
    ).select(*keys, _TS, _TAG, *payload)
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
    # each direction carries its candidate right ROW as one atomic struct
    # (ts + payload) — see asof_join for why per-column carrying is wrong
    pack = F.when(
        F.col(_TAG) == 0,
        F.struct(
            F.col(_TS).alias(_MTS), *[F.col(c).alias(c) for c in payload]
        ),
    )
    both = unioned.withColumns(
        {
            "__bw": F.last(pack, ignorenulls=True).over(wb),
            "__fw": F.last(pack, ignorenulls=True).over(wf),
        }
    ).filter(F.col(_TAG) == 1)

    def _micros(col):
        # cast-through-timestamp keeps unix_micros applicable to
        # TIMESTAMP_NTZ inputs; the session-tz shift cancels in the gaps
        return F.unix_micros(col.cast("timestamp"))

    bw, fw = F.col("__bw"), F.col("__fw")
    bw_gap = _micros(F.col(_TS)) - _micros(bw[_MTS])
    fw_gap = _micros(fw[_MTS]) - _micros(F.col(_TS))
    if tolerance_s is not None:
        tol = int(tolerance_s * 1_000_000)
        # null the whole candidate: an out-of-tolerance row must not leak
        # its values into the pick
        both = both.withColumns(
            {
                "__bw": F.when(bw_gap <= tol, bw),
                "__fw": F.when(fw_gap <= tol, fw),
            }
        )
    # backward wins ties and wherever forward is absent
    use_bw = fw.isNull() | (bw.isNotNull() & (bw_gap <= fw_gap))
    winner = F.when(use_bw, bw).otherwise(fw)
    picked = both.withColumns(
        {c: winner[c] for c in payload}
        | {
            "__asof_dir": F.when(
                bw.isNull() & fw.isNull(), F.lit(None).cast("string")
            )
            .when(use_bw, F.lit("backward"))
            .otherwise(F.lit("forward"))
        }
    )
    return picked.drop(_TAG, _TS, "__bw", "__fw")
