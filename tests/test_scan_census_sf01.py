"""sf0.1 final-plan scan census for the pin-fixed recompute queries
(VERDICT r15 item 8).

The committed sf0.001 census provably misses duplicate-subtree shapes:
at the gate SF, AQE broadcast conversions collapse the duplicated join
subtrees that re-appear at sf0.1 (r15's full-scale census found six
true recompute shapes — 8-12x per-table re-scans — that were
census-clean at sf0.001). This file re-asserts the census thresholds at
sf0.1 for exactly the queries whose fix WAS a pin, so a regression that
un-pins them (or a plan change that re-introduces the duplicate
subtree) fails at the scale where it is visible.

Kept to the pinned set — a full 434-query sweep at sf0.1 would add
minutes to the suite for queries the sf0.001 gate already covers.
"""

import pytest

from adb_south_caucasus_etl_spark.plans.audit import scan_multiplicity
from adb_south_caucasus_etl_spark.workload import WORKLOAD

SF01 = "/root/testdata/sf0.1"

#: queries whose r15/r16 fix pinned a shared frame; the census numbers
#: in the comments are the BEFORE shapes the pins removed
PINNED = [
    "graph_label_propagation",     # was 56 lineitem scans / 142 Exchange
    "graph_degree_assortativity",  # was 48 scans / 94 Exchange
    "dedup_semdedup_cells",        # was 12 embeddings scans
    "curation_greedy_coverage",    # was 36 documents scans
    "ml_ranking_metrics",          # was 3x filtered-NN Python GEMM
    "corpus_dedup_pipeline_lsh_agreement",  # was 12 documents scans
    "text_tfidf_cosine_pairs",     # was 12 documents scans
    "text_js_divergence_sources",  # was 12 documents scans
    "text_rank_drift_spearman",    # was 8 documents scans
    "ml_als_rank1",                # was 6x orders/lineitem/part scans
    "ml_woe_iv_bins",              # was 8 orders scans
    "session_incremental_merge",   # was 12 events scans / 16 Windows
    "neardup_jaccard_pairs",       # r16 pin: capped posting frame
]


@pytest.mark.parametrize("name", PINNED)
def test_scan_multiplicity_at_sf01(name, spark):
    df = WORKLOAD[name].fn(spark, SF01)
    df.write.format("noop").mode("overwrite").save()
    plan = (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
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
    assert not findings, (
        f"{name}: {'; '.join(findings)} in the sf0.1 FINAL plan — the "
        "pin that fixed this query's recompute shape has regressed "
        "(the sf0.001 gate cannot see this class; see module "
        "docstring).\n" + plan[:2000]
    )
