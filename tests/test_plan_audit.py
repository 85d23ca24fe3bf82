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

Plans are built at sf0.001 without executing the batch queries
(``executedPlan`` materializes the pre-execution AQE plan, enough for smell
detection). Queries with eager build-time side effects (sinks, rollup
refreshes, streaming replays) still run them — at sf0.001 that costs
seconds and keeps the audit honest end-to-end.
"""

import pytest
from pyspark.sql.types import ArrayType, BinaryType, MapType, StructType

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


def _single_partition_over_raw_rows(plan: str) -> list[str]:
    lines = plan.splitlines()
    bad = []
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        if "Aggregate" not in "\n".join(lines[i + 1 : i + 4]):
            bad.append("\n".join(lines[i : i + 4]))
    return bad


@pytest.mark.parametrize("name", sorted(WORKLOAD))
def test_no_scale_smells(spark, name):
    # one build per query: plan smells and the driver schema contract
    # are both checked on the same DataFrame (side-effectful queries —
    # sinks, rollup refreshes, streaming replays — run only once)
    df = WORKLOAD[name].fn(spark, SF)
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
    plan = df._jdf.queryExecution().executedPlan().toString()
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
