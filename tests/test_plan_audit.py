"""Fleet-wide plan audit: every registered query's physical plan is checked
for the two unconditional 100 TB scale-killers —

- ``CartesianProduct``: an unkeyed pair blow-up. The two documented exact
  similarity baselines avoid it too (broadcast nested-loop with a pruned
  probe side), so NO query is allowed one.
- ``BatchEvalPython``: a row-at-a-time Python UDF in the plan. Every Python
  crossing in this repo is Arrow-batched (``ArrowEvalPython`` /
  ``FlatMapGroupsInPandas`` / ``MapInPandas``) — a BatchEvalPython means
  someone added ``F.udf`` to a hot path.

and for the driver-contract killer —

- container-typed top-level output columns (Array/Map/Struct/Binary): the
  driver canonicalizes results with a multi-column pandas ``sort_values``,
  which hashes cells and raises ``TypeError: unhashable type`` on lists —
  the query can then never be stamped, not even rows-only (r4's one red
  row, ``agg_percentile_approx``, was exactly this). Vectors must be
  emitted as canonical strings (``array_join``) or exploded to rows.

Per-query plan-shape claims live in test_plan_shapes.py; this file is the
backstop that newly added queries cannot dodge (it iterates WORKLOAD, so a
query added without a shape test is still smell-checked).

Plans are read from the shared fleet cache (tests/conftest.py): every
query is built once and executed once at sf0.001 for the WHOLE suite, and
this audit reads the AQE-FINAL plan of that execution — the same honest
artifact test_scan_census always gated on. (Before r16 this file built
all 434 queries a second time and read pre-execution plans; the rebuild
re-ran every eager build-time side effect — index builds, staged
pipeline writes — once per sweep and pushed the suite past the driver's
pytest budget.)
"""

import pytest
from pyspark.sql.types import ArrayType, BinaryType, MapType, StructType

from adb_south_caucasus_etl_spark.plans.audit import (
    data_scale_broadcasts,
    unpartitioned_windows,
)
from adb_south_caucasus_etl_spark.workload import WORKLOAD

SF = "/root/testdata/sf0.001"

SMELLS = ("CartesianProduct", "BatchEvalPython")

CONTAINER_TYPES = (ArrayType, MapType, StructType, BinaryType)

#: SinglePartition exchanges are allowed only when they feed from an
#: AGGREGATE (a bounded manifest: __pid offsets, per-group rollups) —
#: over raw rows they are the single-partition-window scale killer the
#: round-6 rewrites removed. Two queries funnel a non-aggregate but
#: BOUNDED-BY-CONSTRUCTION frame (channel scenarios; generated calendar
#: days) and are allowlisted with that argument.
SINGLE_PARTITION_OVER_ROWS_OK = {
    "attribution_markov_removal",  # scenario grain = n_channels + 1
    "calendar_business_day_lag",  # generated calendar-day sequence
}

#: Unpartitioned-Window census (plans/audit.py unpartitioned_windows):
#: a Window with an empty partition spec sorts its whole input in ONE
#: task; the census passes it only when the recursive grain rules can
#: SEE the input is bounded (aggregated / limited / literal / dim).
#: Entries here are per-finding leaf names for windows whose frame is
#: bounded in a way the auditor cannot see, with the argument written
#: out — same contract as BROADCAST_DATA_SCALE_OK.
#: Fleet census state (r10 sweep): 53 windows bounded by Aggregate, 2 by
#: Range, 1 by GlobalLimit — trusted on merit; the 2 entries below are
#: the only author-vouched ones.
UNPARTITIONED_WINDOW_OK: dict[str, tuple[str, ...]] = {
    # localCheckpoint-pinned frames are LogicalRDD leaves (checkpoint
    # truncates lineage) — the bounded origin is invisible:
    "attribution_markov_removal": (
        # scenario grain: n_channels + 1 rows, checkpoint-pinned
        "LogicalRDD",
    ),
    "timeseries_linear_interpolate": (
        # day-grain spine: explode(sequence(min_d, max_d)) over a 1-row
        # global aggregate — row count is the CALENDAR SPAN in days
        # (decades ≈ 1e4 rows), independent of fact volume; the
        # data-dependent Generate rule cannot see that bound
        "Generate[data-dependent fan-out]",
    ),
}

#: Broadcast-hint audit (plans/audit.py): a broadcast hint whose subtree
#: has no grain-defining node, no bounded leaves, and no dim-table
#: source broadcasts a frame that GROWS WITH THE DATA — the round-6
#: scale-killer class (triangle closing edges, the 20% kNN test split;
#: both since rewritten). Every survivor below broadcasts a frame the
#: auditor cannot SEE is bounded and documents why it is. The allowlist
#: is per-FINDING, not per-query: ``leaves`` lists the leaf names the
#: documented hint legitimately reports, so a NEW data-scale hint added
#: to an allowlisted query (different leaf) still fails the gate.
BROADCAST_DATA_SCALE_OK = {
    # localCheckpoint-pinned frames — inherently LogicalRDD (checkpoint
    # truncates lineage), so the literal/bounded origin is invisible:
    "attribution_markov_removal": {
        "why": "scenario frames over the bounded channel set "
        "(n_channels + 1 rows), localCheckpoint-pinned",
        "leaves": ("LogicalRDD",),
    },
    "ml_boosted_stumps": {
        "why": "localCheckpoint-pinned split tables (8-row grid argmin, "
        "1-row summaries) broadcast back into the residual pass",
        "leaves": ("LogicalRDD",),
    },
    "ann_ivf_pq_recall_audit": {
        "why": "the 10-row probe set (literal id cut + limit(10)) is "
        "localCheckpoint-pinned so four consumers share one execution "
        "(scan census, round 13) — the pin makes the exact yardstick's "
        "broadcast hint a LogicalRDD leaf whose GlobalLimit bound the "
        "auditor can no longer see",
        "leaves": ("LogicalRDD",),
    },
    "ann_ivf_pq_append_recall_audit": {
        "why": "same shape as ann_ivf_pq_recall_audit: the 10-row probe "
        "set (literal id cut + limit(10)) is localCheckpoint-pinned and "
        "feeds both the exact yardstick and the appended-index serve — "
        "the exact side's query broadcast becomes a LogicalRDD leaf "
        "whose GlobalLimit bound the auditor can no longer see; the "
        "cellsizes leaf is the artifact's persisted ADC-bucket table — "
        "n_cells rows of quantizer-grain metadata by construction "
        "(ivf_pq_persist writes one row per cell), a bound that lives "
        "in the artifact contract, not in the plan",
        "leaves": ("LogicalRDD", "cellsizes"),
    },
    # the two serve-from-artifact queries broadcast the same persisted
    # cellsizes table (n_cells rows by the ivf_pq_persist contract —
    # the whole point is sizing ADC buckets WITHOUT re-scanning the
    # data-scale postings, so the bound is artifact-semantic and
    # invisible to the plan auditor):
    "ann_ivf_pq_persisted_serve": {
        "why": "persisted cellsizes table — n_cells rows of "
        "quantizer-grain metadata by the ivf_pq_persist contract",
        "leaves": ("cellsizes",),
    },
    "ann_ivf_pq_append_serve": {
        "why": "persisted cellsizes table — n_cells rows of "
        "quantizer-grain metadata by the ivf_pq_persist contract, "
        "kept current by ivf_pq_append",
        "leaves": ("cellsizes",),
    },
    "ann_ivf_pq_delete_serve": {
        "why": "persisted cellsizes table — n_cells rows of "
        "quantizer-grain metadata by the ivf_pq_persist contract "
        "(tombstoned postings may be overcounted until reclaim, which "
        "only makes the salting bound conservative)",
        "leaves": ("cellsizes",),
    },
    # the three planted-cluster recall audits (round 14): the planted
    # fixture is localCheckpoint-pinned (_planted_embeddings — one
    # broadcast join + zip_with shared by the exact and approximate
    # sides), and the 10-row probe cut (limit(10)) on top of it is
    # pinned again; the exact yardstick's PROBE broadcast is therefore
    # a LogicalRDD leaf whose GlobalLimit bound is invisible. The
    # corpus side is never broadcast — the hint sits on the 10-row
    # query frame only (similarity.cosine_topk_exact:83).
    "ann_ivf_planted_recall_audit": {
        "why": "pinned 10-row probe cut over the pinned planted "
        "fixture — GlobalLimit bound invisible behind two pins",
        "leaves": ("LogicalRDD",),
    },
    "ann_ivf_trained_planted_recall_audit": {
        "why": "pinned 10-row probe cut over the pinned planted "
        "fixture — GlobalLimit bound invisible behind two pins",
        "leaves": ("LogicalRDD",),
    },
    "ann_ivf_pq_planted_recall_audit": {
        "why": "pinned 10-row probe cut over the pinned planted "
        "fixture — GlobalLimit bound invisible behind two pins",
        "leaves": ("LogicalRDD",),
    },
    # greedy set cover (round 15): each step's argmax row is
    # localCheckpoint-pinned to break the exponential re-execution of
    # the greedy cascade (3 lazy consumers per step), so the
    # new-coverage broadcast hint now sits over a LogicalRDD leaf whose
    # limit(1) bound the auditor can no longer see — exactly one row
    # per step by construction.
    "curation_greedy_coverage": {
        "why": "pinned 1-row greedy argmax (orderBy + limit(1), "
        "checkpointed per step) broadcast into the new-coverage join — "
        "the GlobalLimit bound is behind the pin",
        "leaves": ("LogicalRDD",),
    },
    # rank-1 ALS (round 15): the brand-factor half-step is
    # localCheckpoint-pinned (it feeds both the next user half-step and
    # the prediction join), so its two broadcast hints now sit over a
    # LogicalRDD leaf whose grouping-by-p_brand Aggregate bound the
    # auditor can no longer see — at most |p_brand distinct values|
    # rows (25 brand labels in the TPC-H generator's domain).
    "ml_als_rank1": {
        "why": "pinned brand-grain factor table (groupBy p_brand "
        "aggregate, <= brand-domain rows) broadcast into the user "
        "half-step and the prediction join — the Aggregate bound is "
        "behind the pin",
        "leaves": ("LogicalRDD",),
    },
    # (the former literal-id-cut entries — semdedup centroids, hard
    # negatives, cosine_topk_exact / ann_ivf probes — now pass on merit:
    # the cuts carry an explicit no-op LIMIT, so the hinted subtrees
    # contain a GlobalLimit the auditor can see. join_strategy_hints,
    # the last data-scale entry, now demos the hint API on a bounded
    # order slice with the same in-plan LIMIT bound.)
}


def test_every_driver_side_collect_declares_boundedness():
    """Source-level gate for the OTHER driver-funnel class: every
    ``.collect()`` / ``.toPandas()`` / ``.toLocalIterator()`` in package
    code pulls rows onto the driver, which is only legitimate for frames
    bounded by construction (scalar aggregates, limit-k seeds, manifests,
    control-plane staging). Each site must say so: a comment containing
    'bounded' on the same line or within the 3 preceding lines. A new
    collect without the justification fails here before it can ship an
    unbounded driver funnel (the r6 verdict's collect census, made a
    standing gate like the broadcast audit)."""
    import pathlib
    import re

    pkg = pathlib.Path(__file__).resolve().parent.parent / (
        "adb_south_caucasus_etl_spark"
    )
    # open-paren only: `.collect(...)` with arguments or a line-wrapped
    # argument list must not evade the gate
    pat = re.compile(r"\.(collect|toPandas|toLocalIterator)\(")
    offenders = []
    for path in sorted(pkg.rglob("*.py")):
        lines = path.read_text().splitlines()
        for i, line in enumerate(lines):
            if not pat.search(line):
                continue
            window = "\n".join(lines[max(0, i - 3) : i + 1]).lower()
            if "bounded" not in window:
                offenders.append(f"{path.name}:{i + 1}: {line.strip()}")
    assert not offenders, (
        "driver-side collect without a boundedness comment (add "
        "'# bounded: <why>' on or just above the call, or make the frame "
        "distributed):\n" + "\n".join(offenders)
    )


def test_generate_bounded_only_for_literal_fanout(spark):
    """A Generate whose fan-out is DATA-CONTROLLED must classify
    data-scale even over a bounded child: explode(sequence(1, col)) over
    the 25-row nation table can emit any number of rows the data chooses
    (nothing bounds the column's values), so broadcasting it is not
    provably safe. A literal generator (constant fan-out per child row)
    stays bounded."""
    from pyspark.sql import functions as F

    from adb_south_caucasus_etl_spark.plans.audit import data_scale_broadcasts
    from adb_south_caucasus_etl_spark.sources.registry import Catalog

    nation = Catalog(spark, SF).nation
    # data-dependent fan-out over a bounded child → finding
    bad = nation.select(
        F.explode(F.sequence(F.lit(1), F.col("n_nationkey") + 1)).alias("i")
    )
    probe = nation.join(F.broadcast(bad), nation["n_nationkey"] == bad["i"])
    findings = data_scale_broadcasts(probe)
    assert findings and any(
        "Generate[data-dependent fan-out]" in f for f in findings
    ), f"data-dependent Generate passed the audit: {findings}"
    # literal fan-out over the same bounded child → clean
    ok = nation.select(
        "n_nationkey", F.explode(F.array(F.lit(1), F.lit(2))).alias("i")
    )
    probe2 = nation.join(
        F.broadcast(ok), nation["n_nationkey"] == ok["n_nationkey"]
    )
    assert data_scale_broadcasts(probe2) == []


def test_aggregate_grain_census_reports_trusted_hints(spark):
    """The Aggregate rule's documented false-negative class (see
    plans/audit.py docstring): broadcast(fact.groupBy(key).agg(...)) is
    trusted — the gate stays green — but aggregate_grain_broadcasts must
    SURFACE it so the trust is reviewable. An unkeyed (global) aggregate
    and a dim-grain aggregate produce no note."""
    from pyspark.sql import functions as F

    from adb_south_caucasus_etl_spark.plans.audit import (
        aggregate_grain_broadcasts,
        data_scale_broadcasts,
    )
    from adb_south_caucasus_etl_spark.sources.registry import Catalog

    cat = Catalog(spark, SF)
    # order-grain aggregate over the fact table: gate-green but censused
    per_order = cat.lineitem.groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    probe = cat.orders.join(
        F.broadcast(per_order),
        cat.orders["o_orderkey"] == per_order["l_orderkey"],
    )
    assert data_scale_broadcasts(probe) == [], "trusted grain must stay green"
    notes = aggregate_grain_broadcasts(probe)
    assert notes and "lineitem" in notes[0], notes
    # global aggregate: bounded on merit, no census note
    total = cat.lineitem.agg(F.sum("l_quantity").alias("qty"))
    probe2 = cat.nation.crossJoin(F.broadcast(total))
    assert data_scale_broadcasts(probe2) == []
    assert aggregate_grain_broadcasts(probe2) == []
    # a hint that is DATA-SCALE overall (keyed aggregate joined back to
    # the raw fact) is the main gate's red finding, NOT a trusted pass —
    # the census must not double-report it
    probe3 = cat.orders.join(
        F.broadcast(
            per_order.join(
                cat.lineitem.select(F.col("l_orderkey").alias("lk")),
                per_order["l_orderkey"] == F.col("lk"),
            )
        ),
        cat.orders["o_orderkey"] == per_order["l_orderkey"],
    )
    assert data_scale_broadcasts(probe3) != []
    assert aggregate_grain_broadcasts(probe3) == []
    # NESTED keyed aggregates: the outer agg's child is itself an
    # Aggregate (bounded grain), so only the INNER one is trusted over a
    # data-scale subtree — it must still be censused (the pre-fix census
    # walked the outer node's children without the notes buffer and came
    # back empty for exactly this order-grain broadcast)
    nested = (
        per_order.groupBy("l_orderkey")
        .agg(F.max("qty").alias("mq"))
    )
    probe4 = cat.orders.join(
        F.broadcast(nested),
        cat.orders["o_orderkey"] == nested["l_orderkey"],
    )
    assert data_scale_broadcasts(probe4) == []
    notes4 = aggregate_grain_broadcasts(probe4)
    assert notes4 and "lineitem" in notes4[0], notes4


def test_unpartitioned_window_census(spark):
    """The census must (a) pass-and-cite a global window over an
    aggregated frame, (b) red-flag a global window straight over a fact
    table, and (c) ignore windows that carry a partition spec."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from adb_south_caucasus_etl_spark.sources.registry import Catalog

    cat = Catalog(spark, SF)
    # (a) month-grain aggregate then a global cumulative window: bounded
    monthly = cat.orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("mo")
    ).agg(F.sum("o_totalprice").alias("rev"))
    cum = monthly.withColumn(
        "cum", F.sum("rev").over(Window.orderBy("mo"))
    )
    findings, notes = unpartitioned_windows(cum)
    assert findings == [], findings
    assert notes and "Aggregate" in notes[0], notes
    # (b) global rank straight over the fact table: data-scale finding
    ranked = cat.lineitem.withColumn(
        "rk", F.row_number().over(Window.orderBy("l_extendedprice"))
    )
    findings, _ = unpartitioned_windows(ranked)
    assert findings and "lineitem" in findings[0], findings
    # (c) keyed window over the same fact table: out of scope, clean
    keyed = cat.lineitem.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("l_orderkey").orderBy("l_extendedprice")
        ),
    )
    assert unpartitioned_windows(keyed) == ([], [])


def _single_partition_over_raw_rows(plan: str) -> list[str]:
    lines = plan.splitlines()
    bad = []
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        # AQE-final plans print `ReusedExchange [...], Exchange
        # SinglePartition, ...` REFERENCE lines; the exchange itself is
        # audited where it is defined (its own `Exchange
        # SinglePartition` line with its real child below) — a
        # reference line's following lines belong to a different
        # subtree entirely
        if "ReusedExchange" in ln:
            continue
        below = "\n".join(lines[i + 1 : i + 4])
        # an exchange fed by an Aggregate (bounded manifest) or a
        # LocalLimit (a LIMIT funnel — per-partition capped before the
        # single-partition merge, so the funneled volume is K rows) is
        # bounded by construction
        if "Aggregate" not in below and "LocalLimit" not in below:
            bad.append("\n".join(lines[i : i + 4]))
    return bad


@pytest.mark.parametrize("name", sorted(WORKLOAD))
def test_no_scale_smells(spark, fleet, name):
    # shared fleet build (conftest._FleetCache): plan smells and the
    # driver schema contract are checked on the same DataFrame the
    # other sweeps use (side-effectful queries — sinks, rollup
    # refreshes, streaming replays — run once per SUITE now, not once
    # per sweep). The physical checks read the AQE-FINAL plan (r16):
    # the smells (CartesianProduct, BatchEvalPython, SinglePartition
    # funnels) survive adaptive re-planning, and the final plan is the
    # honest artifact — the same standard test_scan_census always used.
    df = fleet.df(name)
    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, CONTAINER_TYPES)
    ]
    assert not bad, (
        f"{name}: container-typed output columns {bad} — the driver "
        "canonicalizer cannot hash Array/Map/Struct/Binary cells; emit "
        "a canonical string (array_join/to_json) or explode to rows"
    )
    plan = fleet.final_plan(name)
    for smell in SMELLS:
        assert smell not in plan, f"{name}: {smell} in plan\n{plan}"
    if name not in SINGLE_PARTITION_OVER_ROWS_OK:
        bad = _single_partition_over_raw_rows(plan)
        assert not bad, (
            f"{name}: Exchange SinglePartition over unaggregated rows — "
            "an unpartitioned window/sort is funneling unbounded grain "
            "through one task; use global_ordinal/global_running_agg "
            "(operators/curation.py) or aggregate first:\n"
            + "\n---\n".join(bad)
        )
    win_findings, _win_notes = unpartitioned_windows(df)
    win_allowed = UNPARTITIONED_WINDOW_OK.get(name, ())
    win_bad = [
        f
        for f in win_findings
        if not any(leaf in f for leaf in win_allowed)
    ]
    assert not win_bad, (
        f"{name}: unpartitioned Window over a data-scale frame — one "
        "task sorts the whole input at cluster scale. Partition the "
        "window by a real key, aggregate first, or use the distributed "
        "global-scan operators (operators/curation.py); if the frame "
        "is bounded in a way the auditor cannot see, add an "
        "UNPARTITIONED_WINDOW_OK entry (per-finding leaves) with the "
        "boundedness argument: " + "; ".join(win_bad)
    )
    findings = data_scale_broadcasts(df)
    allowed = BROADCAST_DATA_SCALE_OK.get(name, {}).get("leaves", ())
    bad_findings = [
        f
        for f in findings
        if not any(leaf in f for leaf in allowed)
    ]
    assert not bad_findings, (
        f"{name}: broadcast hint over a data-scale frame — the build "
        "side grows with the input (driver OOM at cluster scale). "
        "Drop the hint (planner/AQE stats broadcast it when it "
        "actually fits), aggregate/limit the frame first, or add a "
        "BROADCAST_DATA_SCALE_OK entry (per-finding leaves) with a "
        "boundedness argument: " + "; ".join(bad_findings)
    )
