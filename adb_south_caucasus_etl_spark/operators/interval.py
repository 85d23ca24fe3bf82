"""Binned interval-overlap join (SURVEY §2.P P5).

``point ts BETWEEN interval.start AND interval.end`` is a non-equi
predicate: expressed naively it plans as a broadcast-nested-loop (or
cartesian) join — O(points x intervals) comparisons, the single worst
plan shape at 100 TB. The standard scale rewrite is BINNING: quantize
time into fixed buckets, explode each interval into the buckets it
covers (bounded fan-out when interval length is bounded), tag each
point with its single containing bucket, equi-join on the bucket, and
re-check the exact bounds as a cheap residual filter.

Cost model: a point's bucket matches at most ONE of an interval's
exploded buckets, so the equi-join emits each qualifying
(interval, point) pair at most once — no dedup pass needed, and the
join is a plain shuffled/broadcast hash join whose work is
O(points + intervals x avg_buckets_per_interval + matches). Bucket
width tunes the trade: wider buckets mean fewer exploded rows but more
residual-filter misses; set it near the median interval length so the
fan-out is O(1) per interval. Skewed buckets (a hot hour) are ordinary
join skew — AQE's skew split applies, which it never could to a
nested-loop plan.

The oracle is the literal non-equi join (DuckDB plans IEJoin), so the
rewrite's exactness is hash-checked, not argued.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str | Column,
    start: str | Column,
    end: str | Column,
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Inner-join ``points`` to every interval containing them.

    ``start``/``end`` are inclusive timestamp bounds on ``intervals``;
    ``point_ts`` is the timestamp on ``points``. Returns the joined frame
    (all columns of both inputs; supply disjoint column names). Intervals
    with ``end < start`` match nothing (empty by definition, and
    ``sequence`` would raise on a negative range, so they are filtered).
    """
    p_ts = F.col(point_ts) if isinstance(point_ts, str) else point_ts
    i_lo = F.col(start) if isinstance(start, str) else start
    i_hi = F.col(end) if isinstance(end, str) else end
    # the cast("timestamp") is a no-op on TIMESTAMP columns and lifts
    # TIMESTAMP_NTZ (session timezone is pinned to UTC in session.py), so
    # unix_micros accepts either flavor
    b = F.lit(int(bucket_seconds) * 1_000_000).cast("bigint")

    lo_b = F.floor(F.unix_micros(i_lo.cast("timestamp")) / b).cast("bigint")
    hi_b = F.floor(F.unix_micros(i_hi.cast("timestamp")) / b).cast("bigint")
    exploded = (
        intervals.filter(i_hi >= i_lo)
        .withColumn("__lo_b", lo_b)
        .withColumn("__hi_b", hi_b)
        .withColumn(
            "__bucket", F.explode(F.sequence(F.col("__lo_b"), F.col("__hi_b")))
        )
        .drop("__lo_b", "__hi_b")
    )
    tagged = points.withColumn(
        "__bucket",
        F.floor(F.unix_micros(p_ts.cast("timestamp")) / b).cast("bigint"),
    )
    joined = tagged.join(exploded, "__bucket").filter(
        (p_ts >= i_lo) & (p_ts <= i_hi)
    )
    return joined.drop("__bucket")
