"""Fleet-wide scan-multiplicity census (VERDICT r10 item 3).

The recompute class VERDICT r10 found in the perceptual queries — a
frame consumed by N differently-keyed consumers forks above any
canonically shareable exchange, so the SAME documents scan + Python
chunker executed up to 9x in one query — is invisible to all three
existing plan audits (broadcast boundedness, aggregate grain,
unpartitioned windows): they walk the analyzed LOGICAL plan, where
multiple references are normal and runtime exchange reuse hasn't been
applied yet. The honest artifact is the FINAL adaptive physical plan
after an action, censused here for every registered query at sf0.001.

Gate rules (``plans/audit.scan_census_findings`` holds the parser; the
thresholds live here with the allowlist):

- a data-scale source scanned more than twice in a final plan that ALSO
  crosses into Python is a finding — re-scanning into a re-executed
  Python stage is linear waste that multiplies with the corpus;
- any source scanned more than 6x is a finding regardless (the ivm
  query reached 18x orders through count branches re-running joins);
- pure-JVM re-scans (py == 0, count <= 6) pass: each is a distinct
  column-pruned, predicate-pushed projection feeding a distinct
  consumer — Spark's design trades re-scan for pipeline freedom, and
  materializing would often cost more than the pruned read;
- allowlisted queries carry a written argument, mirroring the broadcast
  audit's discipline.
"""

from __future__ import annotations

import pytest

from adb_south_caucasus_etl_spark.plans.audit import scan_multiplicity
from adb_south_caucasus_etl_spark.workload import WORKLOAD

SF = "/root/testdata/sf0.001"

#: queries whose scan census exceeds the thresholds BY DESIGN — each
#: entry is a written argument the reviewer can re-judge, not a waiver
ALLOWLIST: dict[str, str] = {
    "knn_label_classify": (
        "6 embeddings scans, 1 Python stage: the GEMM's two sides, its "
        "vector re-score joins, the label table, and the truth table "
        "are six DISTINCT column-pruned projections; nothing executes "
        "twice. The corpus slice is ~98% of the table, so pinning it "
        "would materialize the whole table to executor storage — more "
        "IO than the pruned re-scans at any scale."
    ),
    "ml_knn_confusion": (
        "4 embeddings scans, 1 Python stage: GEMM sides + label/truth "
        "projections, all distinct consumers of distinct column sets; "
        "same full-table-corpus argument as knn_label_classify."
    ),
    "ann_ivf_recall_audit": (
        "4 embeddings scans, 2 Python stages: the IVF path and the "
        "exact-GEMM yardstick are two genuinely different pipelines "
        "run over the same table ON PURPOSE (the audit compares them); "
        "each pipeline executes once."
    ),
    "ann_ivf_trained_recall_audit": (
        "4 embeddings scans, 2 Python stages: same shape and argument "
        "as ann_ivf_recall_audit — the trained-cell probe (Arrow "
        "matmul assignment) and the exact-cosine yardstick are two "
        "different pipelines compared on purpose; each executes once. "
        "Training jobs run eagerly before the final plan and read a "
        "pinned unit-vector frame, not the parquet."
    ),
    "ann_ivf_pq_recall_audit": (
        "4 embeddings scans, 8 Python stages: the IVF-PQ probe "
        "(encode UDF, probe-cell UDF, ADC applyInPandas) and the "
        "exact-cosine yardstick are two different pipelines compared "
        "on purpose; each executes once, over a pinned 10-row query "
        "frame (pinning dropped the census from 9 scans to 4 — the "
        "remaining four are the two corpus-side pipelines' pruned "
        "projections). Training and the corpus unit-normalization run "
        "eagerly before the final plan against pinned frames."
    ),
}


@pytest.mark.parametrize("name", sorted(WORKLOAD))
def test_scan_multiplicity(name, spark, fleet):
    # shared fleet build+execution (conftest._FleetCache): same final
    # adaptive plan as before, executed once per suite instead of once
    # per sweep
    plan = fleet.final_plan(name)
    scans, py = scan_multiplicity(plan)
    findings = []
    for src, n in sorted(scans.items()):
        if n > 6:
            findings.append(f"source {src} scanned {n}x")
        elif n > 2 and py > 0:
            findings.append(
                f"source {src} scanned {n}x alongside {py} Python "
                "stage(s)"
            )
    if not findings:
        return
    assert name in ALLOWLIST, (
        f"{name}: {'; '.join(findings)} in the FINAL plan — the "
        "VERDICT r10 recompute class. Materialize the shared "
        "derivative once (eager localCheckpoint / scratch stage) or "
        "add a written allowlist argument.\n" + plan[:2000]
    )
