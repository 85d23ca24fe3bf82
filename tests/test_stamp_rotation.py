"""Dirty-aware driver-stamp rotation (VERDICT r07 item 1).

The ordering contract of ``__spark_entry__._ordered_names()``:
latest-red first, then DIRTY (register block changed since the code the
latest stamp verified, or FORCE_RESTAMP), then never-stamped, then
ascending stamp count — so a query rewritten after a green stamp is
re-verified in the next driver window instead of hiding behind a stale
stamp for rounds.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from adb_south_caucasus_etl_spark.stamphash import (
    block_local_modules,
    query_block_hashes,
    query_fingerprints,
    register_blocks,
)

SAMPLE = '''
from x import register

@register(
    "q_alpha",
    """SELECT 1 AS one""",
    doc="first",
)
def q_alpha(spark, sf_dir):
    from .operators.similarity import cosine_topk_exact
    return cosine_topk_exact(None, None)


def helper():
    return 1


@register("q_beta", None)
def q_beta(spark, sf_dir):
    return None
'''


def test_register_blocks_exact_boundaries():
    blocks = register_blocks(SAMPLE)
    assert set(blocks) == {"q_alpha", "q_beta"}
    # decorator (incl. the oracle string) through function end, nothing more
    assert blocks["q_alpha"].startswith("@register(")
    assert '"""SELECT 1 AS one"""' in blocks["q_alpha"]
    assert "helper" not in blocks["q_alpha"]
    assert "q_beta" not in blocks["q_alpha"]
    assert blocks["q_beta"].startswith('@register("q_beta"')


def test_block_hash_changes_on_oracle_edit_only():
    h1 = query_block_hashes(SAMPLE)
    h2 = query_block_hashes(SAMPLE.replace("SELECT 1 AS one", "SELECT 2 AS one"))
    assert h1["q_alpha"] != h2["q_alpha"], "oracle edits must dirty the query"
    assert h1["q_beta"] == h2["q_beta"], "unrelated queries must stay clean"


def test_deep_fingerprint_tracks_local_module_imports():
    assert block_local_modules(register_blocks(SAMPLE)["q_alpha"]) == [
        "adb_south_caucasus_etl_spark/operators/similarity.py"
    ]
    fp_a = query_fingerprints(SAMPLE, lambda p: "module v1")
    fp_b = query_fingerprints(SAMPLE, lambda p: "module v2")
    assert fp_a["q_alpha"] != fp_b["q_alpha"], "module rewrite must deep-dirty"
    assert fp_a["q_beta"] == fp_b["q_beta"], "no local imports -> unaffected"


def test_every_registered_query_has_a_block_hash():
    """The rotation can only dirty-track what the ast extraction sees: every
    WORKLOAD entry must be a decorator-registered function in workload.py
    (a registration that dodges this would silently opt out of
    dirty-tracking)."""
    path = os.path.join(
        os.path.dirname(entry.__file__),
        "adb_south_caucasus_etl_spark",
        "workload.py",
    )
    with open(path, encoding="utf-8") as fh:
        hashes = query_block_hashes(fh.read())
    missing = sorted(set(entry.WORKLOAD) - set(hashes))
    assert not missing, f"queries invisible to dirty-tracking: {missing}"


def test_ordering_puts_red_then_dirty_then_never_stamped(monkeypatch):
    names = list(entry.WORKLOAD)
    red, dirty, fresh = names[0], names[1], names[2]
    stamped_clean = names[3]
    old_stamp, new_stamp = names[4], names[5]
    monkeypatch.setattr(
        entry,
        "_stamp_state",
        lambda: (
            {red: 2, dirty: 3, stamped_clean: 1, old_stamp: 1, new_stamp: 1},
            {red},
            {red: 9, dirty: 9, stamped_clean: 1, old_stamp: 2, new_stamp: 8},
        ),
    )
    monkeypatch.setattr(entry, "_dirty_names", lambda: {dirty})
    ordered = entry._ordered_names()
    assert ordered[0] == red
    assert ordered[1] == dirty
    assert ordered.index(fresh) < ordered.index(stamped_clean), (
        "never-stamped must precede stamped-clean"
    )
    # freshness rotation (VERDICT r10 item 4): within an equal stamp
    # count, the OLDEST latest-stamp refreshes first — regardless of
    # registration order (stamped_clean/old_stamp/new_stamp all carry
    # count 1; their latest rounds are 1 < 2 < 8)
    assert ordered.index(stamped_clean) < ordered.index(old_stamp)
    assert ordered.index(old_stamp) < ordered.index(new_stamp)


def test_force_restamp_entries_are_real_queries():
    unknown = entry.FORCE_RESTAMP - set(entry.WORKLOAD)
    assert not unknown, f"FORCE_RESTAMP names not in WORKLOAD: {unknown}"


def test_priority_stamp_entries_are_real_queries():
    """A renamed audit twin would otherwise silently lose its window
    priority — the sort key just never matches the stale name (the same
    silent-no-op mode the FORCE_RESTAMP guard exists for)."""
    unknown = entry.PRIORITY_STAMP - set(entry.WORKLOAD)
    assert not unknown, f"PRIORITY_STAMP names not in WORKLOAD: {unknown}"


def test_live_dirty_set_is_sane(monkeypatch):
    """On the real tree: dirty ⊆ sidecar-stamped ∪ FORCE_RESTAMP, and every
    stamped query is either already in the on-disk sidecar or COVERABLE by
    a rebuild.

    The coverable clause is the round-boundary window (ADVICE r08 /
    VERDICT r08 item 1): the driver drops a fresh CORRECTNESS_rN.json
    that the committed sidecar predates, and the round-start ritual runs
    ``tools/stamp_sources.py rebuild`` to fold it. That staleness is
    legitimate and must stay green; what must FAIL is a stamped query no
    rebuild can fingerprint (a registration invisible to the ast
    extraction, or a round whose artifact git cannot anchor) — that
    would silently opt the query out of dirty-tracking forever."""
    dirty = entry._dirty_names()
    assert entry.FORCE_RESTAMP <= dirty
    sidecar_path = os.path.join(entry._REPO, "STAMP_SOURCES.json")
    if not os.path.exists(sidecar_path):
        return
    with open(sidecar_path, encoding="utf-8") as fh:
        sidecar = json.load(fh)
    assert dirty <= set(sidecar) | entry.FORCE_RESTAMP
    counts, _, _ = entry._stamp_state()
    stamped = {n for n, c in counts.items() if c > 0 and n in entry.WORKLOAD}
    uncovered = stamped - set(sidecar)
    if uncovered:
        # stale on-disk sidecar — tolerate iff an in-memory rebuild
        # (which anchors uncommitted rounds at HEAD) covers the gap
        monkeypatch.syspath_prepend(os.path.join(entry._REPO, "tools"))
        import stamp_sources

        fresh = stamp_sources.rebuild()
        still = uncovered - set(fresh)
        assert not still, (
            "stamped queries that NO sidecar rebuild can fingerprint: "
            f"{sorted(still)[:5]}"
        )


def test_dirty_tracking_degrades_visibly_on_corrupt_sidecar(
    monkeypatch, capsys, tmp_path
):
    """ADVICE r08: a corrupt STAMP_SOURCES.json must degrade to
    FORCE_RESTAMP-only (the driver always gets a valid ordering) but
    VISIBLY — a one-line stderr warning — so a disabled stale-stamp
    guard shows up in round logs instead of silently eating the tier."""
    (tmp_path / "STAMP_SOURCES.json").write_text("{not json", encoding="utf-8")
    (tmp_path / "adb_south_caucasus_etl_spark").mkdir()
    monkeypatch.setattr(entry, "_REPO", str(tmp_path))
    monkeypatch.setattr(entry, "FORCE_RESTAMP", {"x_forced"})
    assert entry._dirty_names() == {"x_forced"}
    err = capsys.readouterr().err
    assert "dirty-stamp tracking degraded" in err, err


def test_uncommitted_round_anchors_at_head(monkeypatch, tmp_path, capsys):
    """VERDICT r08 item 1: a CORRECTNESS_rN.json with no adding commit
    (the driver's fresh, still-untracked round artifact) must anchor at
    HEAD — the driver commits all pending work before the gate, so HEAD
    IS the stamped tree. Skipping such rounds left the fresh stamps
    unfoldable and reported the whole window as false-dirty.

    Runs against a THROWAWAY git repo (ADVICE r09: writing the fake
    artifact into the live repo root risked leaving it behind on a hard
    crash, and later rebuilds would anchor a phantom round at HEAD).
    Also pins the ADVICE r09 escalation: HEAD-anchoring with UNCOMMITTED
    workload edits must warn loudly — the anchor would bind fingerprints
    to code the driver never stamped."""
    import subprocess

    monkeypatch.syspath_prepend(os.path.join(entry._REPO, "tools"))
    import stamp_sources

    repo = tmp_path / "repo"
    repo.mkdir()

    def git(*args):
        subprocess.run(
            ["git", "-C", str(repo), *args], check=True, capture_output=True
        )

    git("init", "-q")
    git("config", "user.email", "t@example.com")
    git("config", "user.name", "t")
    (repo / "CORRECTNESS_r1.json").write_text(
        json.dumps({"cube_flagship_revenue": {"rows_match": True}}),
        encoding="utf-8",
    )
    git("add", "-A")
    git("commit", "-qm", "round 1: verdict/advice/correctness/bench")
    (repo / "CORRECTNESS_r999.json").write_text(
        json.dumps({"cube_flagship_revenue": {"rows_match": True}}),
        encoding="utf-8",
    )
    monkeypatch.setattr(stamp_sources, "REPO", str(repo))
    commits = stamp_sources._round_commits()
    assert commits.get(999) == "HEAD"
    # committed rounds keep their parent-of-add anchor
    assert commits.get(1) not in (None, "HEAD")
    assert "did NOT stamp" not in capsys.readouterr().err
    # now dirty the workload in the drop window: the HEAD anchor is no
    # longer faithful and the note must escalate to a hard warning
    wl = repo / "adb_south_caucasus_etl_spark"
    wl.mkdir()
    (wl / "workload.py").write_text("# uncommitted edit", encoding="utf-8")
    assert stamp_sources._round_commits().get(999) == "HEAD"
    assert "did NOT stamp" in capsys.readouterr().err


from hypothesis import given, settings
from hypothesis import strategies as st

_IDENT = st.from_regex(r"[a-z][a-z0-9_]{0,20}", fullmatch=True)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(_IDENT, st.booleans(), st.text(alphabet="abc\n ", max_size=40)),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    )
)
def test_register_blocks_complete_and_disjoint(entries):
    """Property: for any sequence of registered functions (with or
    without oracle strings and interleaved helpers), ast extraction finds
    EVERY registered name, each block starts at its own decorator, and no
    block leaks a neighbor's registration."""
    parts = ["from x import register\n"]
    for name, with_oracle, doc in entries:
        oracle = '"""SELECT 1"""' if with_oracle else "None"
        parts.append(
            f"@register(\n    \"q_{name}\",\n    {oracle},\n"
            f"    doc={doc!r},\n)\ndef q_{name}(spark, sf_dir):\n"
            f"    return {len(name)}\n"
        )
        parts.append(f"def helper_{name}():\n    return 0\n")
    src = "\n".join(parts)
    blocks = register_blocks(src)
    assert set(blocks) == {f"q_{n}" for n, _, _ in entries}
    for name, _, _ in entries:
        block = blocks[f"q_{name}"]
        assert block.startswith("@register(")
        others = {f'"q_{m}"' for m, _, _ in entries if m != name}
        assert not any(o in block for o in others), (name, block)
        assert f"helper_{name}" not in block


@settings(max_examples=120, deadline=None)
@given(
    st.integers(min_value=1, max_value=10**9),
    st.integers(min_value=1, max_value=10**9),
    st.integers(min_value=1024, max_value=1 << 40),
    st.integers(min_value=1, max_value=4096),
)
def test_gemm_grid_budget_invariant_fuzz(q, c, budget, min_cells):
    """Property: for ANY sizes, budget, and parallelism floor, the
    returned grid is valid (1..n per side), the per-cell float64 matrix
    fits the budget whenever a fitting grid exists at all (1x1 cells are
    8 bytes), and the WORK-DAMPED floor is met: the grid reaches
    min_cells only while every cell can keep >= 2^20 score pairs —
    below that, extra cells are pure per-group overhead and the floor
    deliberately yields (small inputs get small grids)."""
    from adb_south_caucasus_etl_spark.operators.similarity import gemm_grid

    nq, nc = gemm_grid(q, c, budget, min_cells=min_cells)
    assert 1 <= nq <= q and 1 <= nc <= c
    # integer form of (q/nq)*(c/nc)*8 <= budget: float grouping error at
    # the exact-equality boundary (settled grids hit nq*nc == k) would
    # otherwise fail a budget that holds precisely
    assert q * c * 8 <= budget * nq * nc, (nq, nc)
    damped = min(min_cells, max(1, (q * c) >> 20))
    assert nq * nc >= damped, (nq, nc, min_cells, damped)
