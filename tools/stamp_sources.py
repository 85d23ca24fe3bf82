#!/usr/bin/env python
"""Rebuild STAMP_SOURCES.json — the hash-at-last-driver-stamp sidecar the
dirty-aware rotation in __spark_entry__.py compares against.

For every round R with a CORRECTNESS_rR.json at the repo root, the code
the driver actually stamped is the PARENT of the driver's artifact commit
("round R: verdict/advice/correctness/bench"); each query stamped in
round R gets its fingerprint (see adb_south_caucasus_etl_spark/stamphash)
computed from that commit's sources. Ascending rounds overwrite, so the
sidecar ends at each query's LATEST stamped fingerprint. Fully
reconstructed from git + the CORRECTNESS files — idempotent, safe to run
at any point in a round (it never reads the working tree).

Usage:
    python tools/stamp_sources.py rebuild   # write STAMP_SOURCES.json
    python tools/stamp_sources.py dirty     # list stamped-but-changed queries
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from adb_south_caucasus_etl_spark.stamphash import (  # noqa: E402
    query_block_hashes,
    query_fingerprints,
)

WORKLOAD_PATH = "adb_south_caucasus_etl_spark/workload.py"
SIDECAR = os.path.join(REPO, "STAMP_SOURCES.json")


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", "-C", REPO, *args],
        check=True,
        capture_output=True,
        text=True,
    ).stdout


def _round_commits() -> dict[int, str]:
    """round number -> the code commit the driver ran.

    Anchored on the commit that ADDED each CORRECTNESS_rR.json (not on
    commit-subject matching, which any later commit titled 'round N: …'
    would silently hijack, binding the round's fingerprints to post-stamp
    code and disabling the dirty-tracking). The adding commit is the
    driver's artifact commit; its parent is the last code commit of the
    round — the tree the driver actually stamped.

    A CORRECTNESS file that exists on disk but has NO adding commit is
    the fresh, still-uncommitted artifact the driver drops at each round
    boundary. The driver commits all pending work before running the
    gate, so the code it stamped IS HEAD — anchor the round there
    (VERDICT r08 item 1: skipping it left 33 false-dirties and a red
    pytest in the between-drop-and-commit window)."""
    out: dict[int, str] = {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        base = os.path.basename(path)
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", base)
        if not m:
            continue
        added = _git(
            "log", "--diff-filter=A", "--format=%H", "--", base
        ).split()
        if added:
            # oldest add wins if the file was ever re-added
            anchor = added[-1] + "^"
            if _show(anchor, WORKLOAD_PATH) != _show(added[-1], WORKLOAD_PATH):
                print(
                    f"warning: round {m.group(1)} artifact commit "
                    f"{added[-1][:12]} also changed {WORKLOAD_PATH}; "
                    "fingerprints bind to the PARENT tree and may not "
                    "match what the driver stamped",
                    file=sys.stderr,
                )
            out[int(m.group(1))] = anchor
        else:
            # ADVICE r09: HEAD-anchoring reads the COMMITTED tree, so it
            # is only faithful while the working-tree workload matches
            # HEAD — with uncommitted workload edits in the drop window,
            # fingerprints would bind to code the driver never stamped
            # and the dirty tier would silently clear. Escalate.
            dirty_workload = _git(
                "status", "--porcelain", "--", WORKLOAD_PATH
            ).strip()
            if dirty_workload:
                print(
                    f"WARNING: round {m.group(1)} artifact is uncommitted "
                    f"AND {WORKLOAD_PATH} has uncommitted edits — the "
                    "HEAD anchor binds fingerprints to code the driver "
                    "did NOT stamp; commit (or stash) the workload edits "
                    "and rerun rebuild before trusting the dirty tier",
                    file=sys.stderr,
                )
            else:
                print(
                    f"note: round {m.group(1)} artifact is uncommitted — "
                    "anchored at HEAD (valid only while HEAD is the tree "
                    "the driver stamped; rerun rebuild after the artifact "
                    "commit so the anchor binds to the true "
                    "parent-of-add)",
                    file=sys.stderr,
                )
            out[int(m.group(1))] = "HEAD"
    return out


def _show(commit: str, path: str) -> str | None:
    try:
        return _git("show", f"{commit}:{path}")
    except subprocess.CalledProcessError:
        return None


def _stamped_names(rnd: int) -> list[str]:
    # round numbers in filenames may be zero-padded (CORRECTNESS_r01.json)
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m or int(m.group(1)) != rnd:
            continue
        try:
            with open(path, encoding="utf-8") as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            return []
        return sorted(rows) if isinstance(rows, dict) else []
    return []


def rebuild() -> dict[str, dict]:
    commits = _round_commits()
    sidecar: dict[str, dict] = {}
    for rnd in sorted(commits):
        names = _stamped_names(rnd)
        if not names:
            continue
        commit = commits[rnd]
        workload = _show(commit, WORKLOAD_PATH)
        if workload is None:
            print(f"round {rnd}: no {WORKLOAD_PATH} at {commit}, skipped")
            continue
        blocks = query_block_hashes(workload)
        deeps = query_fingerprints(workload, lambda p, c=commit: _show(c, p))
        hit = 0
        for name in names:
            if name in blocks:
                sidecar[name] = {
                    "hash": blocks[name],
                    "deep": deeps[name],
                    "round": rnd,
                }
                hit += 1
        print(f"round {rnd}: {hit}/{len(names)} stamped queries fingerprinted")
    return sidecar


def _read_tree(path: str) -> str | None:
    try:
        with open(os.path.join(REPO, path), encoding="utf-8") as fh:
            return fh.read()
    except OSError:
        return None


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "rebuild"
    if mode == "rebuild":
        sidecar = rebuild()
        with open(SIDECAR, "w", encoding="utf-8") as fh:
            json.dump(sidecar, fh, indent=1, sort_keys=True)
            fh.write("\n")
        print(f"wrote {len(sidecar)} entries to {SIDECAR}")
        return 0
    if mode == "dirty":
        deep = "--deep" in sys.argv
        try:
            with open(SIDECAR, encoding="utf-8") as fh:
                sidecar = json.load(fh)
        except (OSError, ValueError):
            print("no sidecar; run rebuild first")
            return 1
        workload = _read_tree(WORKLOAD_PATH)
        if workload is None:
            print(f"cannot read {WORKLOAD_PATH} from the working tree")
            return 1
        if deep:
            cur = query_fingerprints(workload, _read_tree)
            key = "deep"
        else:
            cur = query_block_hashes(workload)
            key = "hash"
        dirty = sorted(
            n
            for n, rec in sidecar.items()
            if n in cur and cur[n] != rec.get(key)
        )
        for n in dirty:
            print(f"dirty: {n} (stamped r{sidecar[n].get('round')})")
        print(f"{len(dirty)} {'deep-' if deep else ''}dirty / {len(sidecar)} stamped")
        return 0
    print(__doc__)
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
