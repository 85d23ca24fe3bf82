"""Benchmark harness: runs the headline workload at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
compact JSON line as the LAST line of stdout:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

The full per-query sweep (all registered queries, batch and streaming walls
split, errors) is written to BENCH_FULL.json next to this file — kept OUT of
the stdout line so the driver's tail capture always parses the headline
(round 2 lost its perf datum to a truncated 127-query inline dict).

Each query executes end-to-end into Spark's noop sink — full plan runs
(scans, shuffles, aggs), nothing is transferred to the driver, so the
number measures the engine, not pandas conversion.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from adb_south_caucasus_etl_spark.session import get_spark  # noqa: E402
from adb_south_caucasus_etl_spark.workload import WORKLOAD  # noqa: E402

#: min-of-N iterations for each headline query (used by both the loop and
#: the emitted metadata — r2 shipped a stale hand-written count)
ITERATIONS = 3

#: headline set — every operator family, weighted toward the scale-relevant
#: shapes (star agg, window, as-of, dedup, similarity, streaming-batch)
HEADLINE = [
    "cube_flagship_revenue",
    "q1_pricing_summary",
    "cube_rollup_geo",
    "q18_large_volume_customer",
    "join_left_agg",
    "topk_customers_per_region",
    "window_running_orders",
    "asof_last_error",
    "events_json_props",
    "stream_tumbling_hour",
    "stream_session_30m",
    "dedup_exact_docs",
    "neardup_jaccard_pairs",
    "minhash_lsh_neardup",
    "cosine_topk_exact",
    "text_stats_by_lang",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("bench")

    # JVM/codegen warmup on the smallest scale so per-query numbers measure
    # the plan, not first-job startup
    WORKLOAD["cube_flagship_revenue"].fn(
        spark, "/root/testdata/sf0.001"
    ).write.format("noop").mode("overwrite").save()

    # ITERATIONS runs per query, report the min: every iteration rebuilds
    # the DataFrame from scratch (full analysis/optimization/codegen +
    # execution end-to-end into the noop sink), so the number still measures
    # the whole engine path — the min suppresses JIT/GC warm-up noise
    # (measured on this rig: a shuffle-heavy query ran 4.5 / 2.65 / 1.9 s on
    # iterations 1/2/3, steady thereafter — min-of-2 still carried ~40%
    # first-touch JIT). ONE timing loop serves both the headline set and
    # the top_min3 re-runs, so a methodology change cannot drift the two
    # tiers apart.
    def min_of_n(name: str, reraise: bool = False) -> float | None:
        best = float("inf")
        for _ in range(ITERATIONS):
            t0 = time.time()
            try:
                WORKLOAD[name].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception:  # noqa: BLE001 — caller decides the fallback
                if reraise:
                    raise  # headline failures keep their real traceback
                return None
            best = min(best, time.time() - t0)
        return round(best, 3)

    times: dict[str, float] = {}
    for name in HEADLINE:
        times[name] = min_of_n(name, reraise=True)

    # full per-query sweep: every registered query, so round-over-round
    # regressions are visible per operator, not just for the headline set.
    # Queries whose FIRST run exceeds SLOW_SECOND_PASS_SEC get one more run
    # and record the min — single-shot numbers above that wall carry enough
    # first-touch JIT / GC-geometry noise to fake 2–9× regressions (r13's
    # alloc_largest_remainder read 4.64 s in-sweep vs 0.83 s isolated;
    # VERDICT r13 item 8), while sub-2 s queries are cheap enough that the
    # noise never crosses a triage threshold. Failures record null rather
    # than erasing the bench.
    SLOW_SECOND_PASS_SEC = 2.0
    full: dict[str, float | None] = {}
    errors: dict[str, str] = {}
    for name, entry in WORKLOAD.items():
        if name in times:
            full[name] = times[name]
            continue
        try:
            t0 = time.time()
            entry.fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            t = round(time.time() - t0, 3)
            if t > SLOW_SECOND_PASS_SEC and not name.startswith(
                "streaming_"
            ):
                # second pass for slow batch queries; streaming walls are
                # micro-batch start/stop latency, a re-run measures nothing
                t0 = time.time()
                entry.fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                t = min(t, round(time.time() - t0, 3))
            full[name] = t
        except Exception as exc:  # noqa: BLE001 — bench must survive one bad query
            full[name] = None
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
        # isolate queries from each other's session debris: cached tables
        # (sql_cache_table_reuse) and the memory-sink temp views that every
        # *_live streaming query registers otherwise accumulate across the
        # 260+ query sweep and the resulting JVM heap/GC pressure inflated
        # the TAIL of the sweep up to ~3x (measured round 5; the driver
        # runs each query in a fresh process and never sees that state)
        try:
            spark.catalog.clearCache()
            for tv in spark.catalog.listTables():
                if tv.isTemporary and tv.tableType == "TEMPORARY":
                    spark.catalog.dropTempView(tv.name)
        except Exception:  # noqa: BLE001 — cleanup must never fail the bench
            pass

    # min-of-3 isolated re-runs for the top-15 most expensive BATCH sweep
    # queries (plus any drift-suspects named below): the one-shot sweep
    # numbers carry first-touch JIT and GC geometry from whatever ran
    # before them — r7's round-over-round diff flagged two +2s "regressions"
    # that were pure sweep noise. The min-of-3 map ships in the printed
    # tail so the round artifact itself carries a noise-free per-query
    # signal beside the sweep number. Streaming queries are excluded (their
    # wall is micro-batch start/stop latency, not plan cost).
    DRIFT_SUSPECTS = {"sketch_cms_heavy_hitters", "schema_compat_check"}
    top = sorted(
        (
            (v, n)
            for n, v in full.items()
            if v and not n.startswith("streaming_") and n not in times
        ),
        reverse=True,
    )[:15]
    recheck = {n for _, n in top} | (DRIFT_SUSPECTS & set(full))
    top_min3: dict[str, float] = {}
    for name in sorted(recheck):
        t = min_of_n(name)
        if t is not None:
            top_min3[name] = t
        try:
            spark.catalog.clearCache()
        except Exception:  # noqa: BLE001
            pass

    # batch vs streaming split: the five streaming_*_live queries run real
    # Structured Streaming starts (availableNow replay) whose fixed start/stop
    # cost (~2-8 s each) would drown batch-plan regressions in the full wall.
    batch_wall = round(
        sum(v for n, v in full.items() if v and not n.startswith("streaming_")), 3
    )
    streaming_wall = round(
        sum(v for n, v in full.items() if v and n.startswith("streaming_")), 3
    )
    total = round(sum(times.values()), 3)
    full_report = {
        "iterations_headline": ITERATIONS,
        "sweep_second_pass_over_sec": SLOW_SECOND_PASS_SEC,
        # headline duplicated into the artifact so tools/bench_compare.py
        # can diff rounds from BENCH_FULL.json alone (it used to live only
        # in the printed tail, forcing commit-message archaeology)
        "headline_value": total,
        "headline_queries": times,
        "full_wall_batch": batch_wall,
        "full_wall_streaming": streaming_wall,
        "queries_full": full,
        "top_min3": top_min3,
        "errors": errors,
        "sf": sf,
    }
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"),
        "w",
        encoding="utf-8",
    ) as fh:
        json.dump(full_report, fh, indent=1, sort_keys=True)

    out = {
        "metric": "headline_suite_wall",
        "value": total,
        "unit": "sec",
        "iterations": ITERATIONS,
        "queries": times,
        "full_wall_batch": batch_wall,
        "full_wall_streaming": streaming_wall,
        "top_min3": top_min3,
        "n_queries": len(full),
        "n_errors": len(errors),
        "sf": sf,
    }
    # the compact headline line is the LAST stdout line, nothing after it —
    # the driver tails stdout for one parseable JSON object
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
