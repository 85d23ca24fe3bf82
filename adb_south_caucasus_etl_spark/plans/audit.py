"""Plan-level broadcast + unpartitioned-window audit (SURVEY §4 scale
discipline).

Walks a DataFrame's ANALYZED logical plan and classifies every broadcast
HINT (``ResolvedHint`` with a broadcast strategy) as bounded-by-construction
or data-scale. :func:`unpartitioned_windows` applies the same recursive
grain rules to every ``Window`` node with an empty partition spec (the
single-task sort funnel), citing the bounding construct for trusted
passes. The round-6 verdict found two hints whose build side grew
linearly with the data (a graph's closing edge list; a 20% held-out
split) — unconditional driver OOMs at cluster scale. This module is the
fleet gate for that CLASS: ``tests/test_plan_audit.py`` runs it over every
registered query, and any data-scale hint must carry an allowlist entry
with an explicit boundedness argument.

Boundedness is decided RECURSIVELY from the hint's root down, so a
grain-defining node only vouches for the frame it actually defines
(an "Aggregate somewhere in the subtree" rule would wave through
``broadcast(small_agg.join(lineitem))`` — the join output is fact-sized
even though an Aggregate exists below one input):

- Aggregate / Deduplicate / Limit ⇒ bounded — this node CHOSE the output
  grain (group keys, distinct keys, top-N); its inputs are irrelevant;
- grain-preserving unary nodes (Project, Filter, Sort, Window,
  repartitions, aliases, …) ⇒ classify their child;
- Generate (explode/posexplode/inline/sequence fan-out) ⇒ bounded only
  when the generator expression references NO input column (a literal
  array / literal-bound sequence multiplies the child by a constant) AND
  the child is bounded; a data-dependent generator — e.g.
  ``explode(sequence(1, col))`` — makes the fan-out data-controlled even
  over a bounded child, so it classifies data-scale;
- everything else (Join, Union, any multi-child node) ⇒ bounded only if
  EVERY child is bounded;
- leaves: LocalRelation / OneRowRelation / Range ⇒ bounded (literal
  grids, scenario frames, generated sequences); file relations over the
  bounded dimension tables (nation, region — 25 / 5 rows at every scale
  factor by TPC-H construction, any staged format) ⇒ bounded; all other
  leaves ⇒ data-scale.

Note the walk sees the analyzed TREE, so a frame consumed twice reports
its hint twice — the finding count is an upper bound, the per-query
verdict (any finding at all) is what matters.

KNOWN FALSE-NEGATIVE CLASS (documented, deliberately not gated): the
Aggregate/Deduplicate rule trusts the node's declared grain without
asking whether the grain KEYS are themselves bounded —
``broadcast(lineitem.groupBy("l_orderkey").agg(...))`` is an order-grain,
data-scale frame that passes the gate silently. Static key-cardinality
analysis can't separate that from ``groupBy("l_returnflag")`` (3 values
over the same fact table), so the audit treats choosing a grain as the
author vouching for it. :func:`aggregate_grain_broadcasts` reports every
hint that is bounded ONLY by this trust (a keyed Aggregate/Deduplicate
over a data-scale subtree) so reviews and the fleet census in
``tests/test_plan_audit.py`` can eyeball the trusted set instead of
discovering it post-OOM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: leaf sources whose BASENAME starts with one of these are the bounded
#: dimension tables, in any staged format (nation.parquet, nation_csv, …)
BOUNDED_DIM_PREFIXES = ("nation", "region")
BOUNDED_LEAVES = ("LocalRelation", "OneRowRelation", "Range")
#: grain-DEFINING nodes: their output size is set by the grain they
#: declare, not by their input size
BOUNDED_NODES = ("Aggregate", "GlobalLimit", "LocalLimit", "Deduplicate")
#: grain-PRESERVING unary nodes: classify through to the child
TRANSPARENT_NODES = (
    "Project",
    "Filter",
    "Sort",
    "Window",
    "SubqueryAlias",
    "ResolvedHint",
    "Repartition",
    "RepartitionByExpression",
    "RebalancePartitions",
    "WithCTE",
    "CTERelationDef",
    "CTERelationRef",
    "Distinct",
    "View",
)


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


def _expr_refs_input(expr) -> bool:
    """True when the expression tree contains any AttributeReference —
    i.e. its value depends on input rows, not just literals."""
    if _cls(expr) == "AttributeReference":
        return True
    kids = expr.children()
    return any(_expr_refs_input(kids.apply(i)) for i in range(kids.size()))


def _node_bounded(node, srcs: list[str], agg_notes: list[str] | None = None) -> bool:
    """Recursive grain classification; data-scale leaf sources accumulate
    into ``srcs`` for the finding message. When ``agg_notes`` is given,
    every keyed Aggregate/Deduplicate that vouches for a data-scale
    subtree (the documented false-negative class) appends a note."""
    name = _cls(node)
    if name in BOUNDED_NODES:
        if agg_notes is not None and name in ("Aggregate", "Deduplicate"):
            keyed = True
            try:
                if name == "Aggregate":
                    keyed = node.groupingExpressions().size() > 0
            except Exception:
                pass
            if keyed:
                sub: list[str] = []
                # no short-circuit: walk EVERY child so the note names
                # the full data-scale leaf set, not a prefix; agg_notes
                # propagates so a NESTED keyed aggregate (which makes
                # this node's children look bounded) is still censused
                # on its own data-scale input
                kid_flags = [
                    _node_bounded(k, sub, agg_notes)
                    for k in _children(node)
                ]
                if kid_flags and not all(kid_flags):
                    agg_notes.append(
                        f"{name} grain trusted over data-scale input: "
                        + ", ".join(
                            s.rsplit("/", 1)[-1] for s in sorted(set(sub))
                        )
                    )
        return True
    kids = _children(node)
    if not kids:
        if name in BOUNDED_LEAVES:
            return True
        src = _leaf_source(node)
        base = src.rstrip("/").rsplit("/", 1)[-1]
        if base.startswith(BOUNDED_DIM_PREFIXES):
            return True
        srcs.append(src)
        return False
    if name in TRANSPARENT_NODES and len(kids) == 1:
        return _node_bounded(kids[0], srcs, agg_notes)
    if name == "Generate":
        # fan-out is part of the output grain: only a literal generator
        # (explode of a literal array, sequence with literal bounds)
        # multiplies the child by a CONSTANT — explode(sequence(1, col))
        # over a bounded child is data-controlled and must not pass
        try:
            data_dep = _expr_refs_input(node.generator())
        except Exception:
            data_dep = True  # unreadable generator: assume the worst
        if data_dep:
            srcs.append("Generate[data-dependent fan-out]")
            # keep walking so the finding also names the subtree's leaves
            for kid in kids:
                _node_bounded(kid, srcs, agg_notes)
            return False
    # joins, unions, literal generates, unknown nodes: the output grain
    # is only bounded when every input's is (bounded × bounded ≤ product)
    ok = True
    for kid in kids:
        if not _node_bounded(kid, srcs, agg_notes):
            ok = False
    return ok


def hint_is_bounded(hint_node) -> tuple[bool, str]:
    """Classify one ResolvedHint subtree. Returns (bounded, reason)."""
    srcs: list[str] = []
    if _node_bounded(hint_node, srcs):
        return True, "bounded grain"
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


def _grain_citation(node) -> str:
    """Short human-readable citation of WHAT bounds a subtree's grain:
    the grain-defining node (Aggregate/Limit/Deduplicate), the bounded
    leaf (LocalRelation/Range/dim table), or — for multi-child nodes —
    the joined combination. Only meaningful for subtrees
    :func:`_node_bounded` already classified as bounded."""
    name = _cls(node)
    if name in BOUNDED_NODES:
        return name
    kids = _children(node)
    if not kids:
        if name in BOUNDED_LEAVES:
            return name
        src = _leaf_source(node).rstrip("/").rsplit("/", 1)[-1]
        return f"dim:{src}" if src.startswith(BOUNDED_DIM_PREFIXES) else f"leaf:{src}"
    if name in TRANSPARENT_NODES and len(kids) == 1:
        return _grain_citation(kids[0])
    return "+".join(sorted({_grain_citation(k) for k in kids}))


def unpartitioned_windows(df: DataFrame) -> tuple[list[str], list[str]]:
    """Census of every logical ``Window`` node with an EMPTY partition
    spec — the plan shape behind Spark's ``WindowExec: No Partition
    Defined`` warning and the single-task funnel at cluster scale.
    Returns ``(findings, notes)``:

    - a window whose child classifies BOUNDED under the same recursive
      grain rules as the broadcast audit (an aggregated/limited/literal
      frame) is a trusted pass — ``notes`` cites the bounding construct
      so the trusted set is reviewable, mirroring
      :func:`aggregate_grain_broadcasts`;
    - a window over a DATA-SCALE child is a finding: one task sorts the
      whole input at 100 TB. Repartition by a real key, or use the
      distributed global-scan operators (``operators/curation.py``).

    Windows WITH a partition spec are out of scope here — they hash-
    distribute by their keys; skew is a different audit.
    """
    plan = df._jdf.queryExecution().analyzed()
    findings: list[str] = []
    notes: list[str] = []
    for node in _walk(plan):
        if _cls(node) != "Window":
            continue
        try:
            if node.partitionSpec().size() > 0:
                continue
        except Exception:
            pass  # unreadable spec: treat as unpartitioned (the worst)
        srcs: list[str] = []
        child = _children(node)[0]
        if _node_bounded(child, srcs):
            notes.append(
                "unpartitioned Window bounded by " + _grain_citation(child)
            )
        else:
            findings.append(
                "unpartitioned Window over data-scale input: "
                + ", ".join(s.rsplit("/", 1)[-1] for s in sorted(set(srcs)))
            )
    return findings, notes


#: physical node names of Python-crossing stages — each occurrence in a
#: final plan is one more full execution of a Python pipeline over its
#: input (Arrow/pickle transfer + worker compute); recomputing one of
#: these over a data-scale scan is the VERDICT r10 recompute class
PYTHON_STAGE_NODES = (
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "FlatMapCoGroupsInPandas",
    "MapInArrow",
    "ArrowEvalPython",
    "BatchEvalPython",
)

_SCAN_LOCATION_RE = None  # compiled lazily (module imports stay cheap)


def scan_multiplicity(final_plan: str) -> tuple[dict[str, int], int]:
    """Count how many times the FINAL executed plan re-reads each file
    source and re-runs Python stages — the VERDICT r10 recompute class
    that every other audit is blind to: a frame consumed by N
    differently-keyed consumers forks above any canonically shareable
    exchange, so the SAME scan + Python chunker executes N times. At
    100 TB that is re-reading (and re-crossing into Python) the whole
    corpus N times; the fix is materializing the shared derivative once
    (eager ``localCheckpoint`` / scratch stage), after which the final
    plan reads pinned RDDs and both counts drop.

    Takes the final adaptive plan STRING (``executedPlan().toString()``
    after an action, before any ``== Initial Plan ==`` section): the
    recompute class is only honest post-AQE, where ReusedExchange /
    stage reuse has already been applied — the analyzed logical tree
    prints every reference and would flag legitimate reuse.

    Returns ``(per-source scan counts, python stage count)``; bounded
    dimension tables (nation/region — constant-size at every SF) are
    excluded, a re-scan of those is broadcast-cheap forever."""
    global _SCAN_LOCATION_RE
    import re

    if _SCAN_LOCATION_RE is None:
        _SCAN_LOCATION_RE = re.compile(
            r"Scan \w+ .*?Location: \w+\(\d+ paths?\)\[([^\],]+)"
        )
    counts: dict[str, int] = {}
    for m in _SCAN_LOCATION_RE.finditer(final_plan):
        base = m.group(1).rstrip("/").rsplit("/", 1)[-1]
        if base.startswith(BOUNDED_DIM_PREFIXES):
            continue
        counts[base] = counts.get(base, 0) + 1
    py = sum(final_plan.count(n) for n in PYTHON_STAGE_NODES)
    return counts, py


def scan_census_findings(
    final_plan: str, max_repeats: int = 2
) -> list[str]:
    """Findings for :func:`scan_multiplicity`: any data-scale source
    scanned more than ``max_repeats`` times, or more than
    ``max_repeats`` Python-crossing stages, in one final plan. The
    threshold tolerates the legitimate two-consumer shapes (a self-join
    reading its table twice is plan-idiomatic; sharing it via an
    explicit exchange is often slower than two pushed-down scans) while
    catching the 3x+ recompute class. Queries with a written argument
    go in the fleet test's allowlist, mirroring the broadcast audit."""
    counts, py = scan_multiplicity(final_plan)
    findings = [
        f"source {src} scanned {n}x in the final plan"
        for src, n in sorted(counts.items())
        if n > max_repeats
    ]
    if py > max_repeats:
        findings.append(
            f"{py} Python-crossing stages in the final plan"
        )
    return findings


def aggregate_grain_broadcasts(df: DataFrame) -> list[str]:
    """The documented false-negative census (module docstring): broadcast
    hints that classify bounded ONLY because a keyed Aggregate/Deduplicate
    vouched for its own grain over a data-scale subtree. Each note names
    the data-scale leaves under the trusted node. Empty for hints that are
    bounded by literals/dims/limits alone — and hints that classify
    DATA-SCALE overall are excluded too (they are the main gate's red
    findings, not trusted passes; censusing them here would double-report
    and muddle the reviewable trusted set)."""
    notes: list[str] = []
    for hint in broadcast_hints(df):
        # ONE walk per hint: collect candidate notes into a buffer and
        # keep them only when the hint's overall verdict is bounded — a
        # data-scale hint is the main gate's red finding, not a trusted
        # pass (and a second hint_is_bounded() walk would double the
        # fleet census cost for nothing)
        srcs: list[str] = []
        buf: list[str] = []
        if _node_bounded(hint, srcs, agg_notes=buf):
            notes.extend(buf)
    return notes
