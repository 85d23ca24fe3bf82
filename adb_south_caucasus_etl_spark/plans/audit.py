"""Plan-level broadcast audit (SURVEY §4 scale discipline).

Walks a DataFrame's ANALYZED logical plan and classifies every broadcast
HINT (``ResolvedHint`` with a broadcast strategy) as bounded-by-construction
or data-scale. The round-6 verdict found two hints whose build side grew
linearly with the data (a graph's closing edge list; a 20% held-out
split) — unconditional driver OOMs at cluster scale. This module is the
fleet gate for that CLASS: ``tests/test_plan_audit.py`` runs it over every
registered query, and any data-scale hint must carry an allowlist entry
with an explicit boundedness argument.

A hint subtree is *bounded* when any of:

- it contains an Aggregate / Deduplicate / Limit — the frame's grain was
  chosen explicitly (group keys, distinct keys, top-N): a manifest, not a
  data mirror;
- every leaf is a LocalRelation / OneRowRelation / Range — literal grids,
  scenario frames, generated sequences;
- its file-backed leaves read only the bounded dimension tables (nation,
  region — 25 / 5 rows at every scale factor by TPC-H construction), in
  any staged format.

Everything else is data-scale: the hinted frame's row count grows with
the input. Note the walk sees the analyzed TREE, so a frame consumed
twice reports its hint twice — the finding count is an upper bound, the
per-query verdict (any finding at all) is what matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: leaf sources whose BASENAME starts with one of these are the bounded
#: dimension tables, in any staged format (nation.parquet, nation_csv, …)
BOUNDED_DIM_PREFIXES = ("nation", "region")
BOUNDED_LEAVES = ("LocalRelation", "OneRowRelation", "Range")
BOUNDED_NODES = ("Aggregate", "GlobalLimit", "LocalLimit", "Deduplicate")


def _children(node):
    seq = node.children()
    return [seq.apply(i) for i in range(seq.size())]


def _cls(node) -> str:
    return node.getClass().getSimpleName()


def _walk(node):
    yield node
    for c in _children(node):
        yield from _walk(c)


def _leaf_source(node) -> str:
    """Best-effort source description for a leaf plan node."""
    name = _cls(node)
    if name in ("LogicalRelation", "LogicalRDD"):
        try:
            paths = node.relation().location().rootPaths()
            return paths.apply(0).toString()
        except Exception:
            return name
    return name


def hint_is_bounded(hint_node) -> tuple[bool, str]:
    """Classify one ResolvedHint subtree. Returns (bounded, reason)."""
    classes = [_cls(n) for n in _walk(hint_node)]
    for b in BOUNDED_NODES:
        if b in classes:
            return True, f"contains {b}"
    leaves = [n for n in _walk(hint_node) if not _children(n)]
    srcs = []
    for leaf in leaves:
        name = _cls(leaf)
        if name in BOUNDED_LEAVES:
            continue
        src = _leaf_source(leaf)
        base = src.rstrip("/").rsplit("/", 1)[-1]
        if base.startswith(BOUNDED_DIM_PREFIXES):
            continue
        srcs.append(src)
    if not srcs:
        return True, "bounded leaves only"
    return False, "data-scale leaves: " + ", ".join(
        s.rsplit("/", 1)[-1] for s in sorted(set(srcs))
    )


def broadcast_hints(df: DataFrame):
    """All ResolvedHint nodes with a broadcast strategy in the analyzed plan."""
    plan = df._jdf.queryExecution().analyzed()
    out = []
    for node in _walk(plan):
        if _cls(node) != "ResolvedHint":
            continue
        if "broadcast" in node.hints().toString().lower():
            out.append(node)
    return out


def data_scale_broadcasts(df: DataFrame) -> list[str]:
    """Data-scale broadcast findings ('reason' strings) for one DataFrame."""
    findings = []
    for hint in broadcast_hints(df):
        ok, reason = hint_is_bounded(hint)
        if not ok:
            findings.append(reason)
    return findings
