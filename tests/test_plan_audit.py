"""Fleet-wide plan audit: every registered query's physical plan is checked
for the two unconditional 100 TB scale-killers —

- ``CartesianProduct``: an unkeyed pair blow-up. The two documented exact
  similarity baselines avoid it too (broadcast nested-loop with a pruned
  probe side), so NO query is allowed one.
- ``BatchEvalPython``: a row-at-a-time Python UDF in the plan. Every Python
  crossing in this repo is Arrow-batched (``ArrowEvalPython`` /
  ``FlatMapGroupsInPandas`` / ``MapInPandas``) — a BatchEvalPython means
  someone added ``F.udf`` to a hot path.

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

from adb_south_caucasus_etl_spark.workload import WORKLOAD

SF = "/root/testdata/sf0.001"

SMELLS = ("CartesianProduct", "BatchEvalPython")


@pytest.mark.parametrize("name", sorted(WORKLOAD))
def test_no_scale_smells(spark, name):
    df = WORKLOAD[name].fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for smell in SMELLS:
        assert smell not in plan, f"{name}: {smell} in plan\n{plan}"
