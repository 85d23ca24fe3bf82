"""Source fingerprints for the driver-stamp rotation (VERDICT r07 #1).

The driver stamps a 50-query window per round; a query REWRITTEN after
its last green stamp used to keep its place at the back of the queue, so
the shipped plan could go unverified for rounds (r7 shipped three such
rewrites). The fix is dirty-tracking: hash what each query's result can
depend on, record the hash the last driver stamp actually verified
(``STAMP_SOURCES.json``, rebuilt from git by ``tools/stamp_sources.py``),
and let ``__spark_entry__._ordered_names()`` jump any stamped-but-changed
query to the front of the window (right after latest-red).

Two fingerprints per query, with different jobs:

- the BLOCK hash — the query's ``@register(...)`` block in
  ``workload.py`` (decorator through function end, so the ORACLE string
  is included: an oracle-only fix re-verifies too), extracted with
  ``ast`` so block boundaries are exact. This is what the rotation
  queue-jumps on: a block mismatch means the query itself was rewritten.
- the DEEP hash — block hash plus the full source of every package
  module the block imports LOCALLY (``from .operators.x import ...``
  inside the function, the repo convention for operator dependencies).
  ADVISORY ONLY (``tools/stamp_sources.py dirty --deep``): module-level
  hashing is too coarse to drive the queue — a docstring edit in
  ``streaming/wrappers.py`` would dirty a dozen streaming queries and
  starve the never-stamped backlog of its 50-query window — but it is
  the right lens for a human deciding what to FORCE_RESTAMP
  (``__spark_entry__.py``) after an operator rewrite.

Neither covers the handful of modules imported at workload.py top level
(cube/registry/asof/topk) — a change there would dirty every query;
those modules are covered by their own pytest surface.
"""

from __future__ import annotations

import ast
import hashlib
import re

#: local-import convention inside query bodies: ``from .operators.x import y``
_LOCAL_IMPORT = re.compile(r"^\s*from \.([A-Za-z0-9_.]+) import ", re.M)


def _sha(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8")).hexdigest()


def register_blocks(workload_src: str) -> dict[str, str]:
    """Map query name -> exact source block (decorators through function
    end) for every ``@register("name", ...)``-decorated function.

    ADVICE r12: when the decorator's ORACLE argument is not a plain
    string literal — a helper call like ``_pca_topk_oracle(...)`` or an
    f-string interpolating a module constant like ``MAX_BAND_BUCKET`` —
    the oracle's effective text lives OUTSIDE the block, so a
    helper/constant edit used to ship with a stale green stamp unless
    someone remembered FORCE_RESTAMP. Here every module-level
    function/constant referenced from the decorator args is APPENDED to
    the block (sorted by name, NUL-separated), so editing
    ``_pca_topk_oracle`` dirties ``embedding_pca_topk`` and
    ``embedding_pca_project`` automatically.

    r13 extension: PRIVATE module-level helpers (``_``-prefixed, e.g.
    ``_corpus_dedup_pipeline_impl``, ``_scratch_dir``, ``_round2``)
    referenced from the function BODY are folded in too, transitively —
    a shared pipeline body factored out of three variant blocks must
    dirty all three when edited. PUBLIC module-level names (Catalog,
    register, WORKLOAD) stay excluded on the coarseness rationale the
    module docstring gives for deep hashes: they are covered by their
    own pytest surface, and folding them in would dirty all 400+
    queries on any docstring touch."""
    tree = ast.parse(workload_src)
    lines = workload_src.splitlines()

    # module-level definitions a decorator arg may reference: functions
    # (oracle generators) and simple constant assignments (f-string
    # interpolands); source segments keyed by name
    toplevel: dict[str, str] = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            toplevel[node.name] = "\n".join(
                lines[node.lineno - 1 : node.end_lineno]
            )
        elif isinstance(node, ast.Assign):
            for tgt in node.targets:
                if isinstance(tgt, ast.Name):
                    toplevel[tgt.id] = "\n".join(
                        lines[node.lineno - 1 : node.end_lineno]
                    )
        elif isinstance(node, ast.AnnAssign) and isinstance(
            node.target, ast.Name
        ):
            toplevel[node.target.id] = "\n".join(
                lines[node.lineno - 1 : node.end_lineno]
            )

    out: dict[str, str] = {}
    for node in tree.body:
        if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        for dec in node.decorator_list:
            if (
                isinstance(dec, ast.Call)
                and isinstance(dec.func, ast.Name)
                and dec.func.id == "register"
                and dec.args
                and isinstance(dec.args[0], ast.Constant)
                and isinstance(dec.args[0].value, str)
            ):
                start = min(d.lineno for d in node.decorator_list)
                block = "\n".join(lines[start - 1 : node.end_lineno])
                # decorator args: fold ANY referenced module-level name
                # (oracle helpers, constants); body: fold PRIVATE
                # module-level helpers only, transitively
                refs = {
                    n.id
                    for arg in list(dec.args[1:])
                    + [kw.value for kw in dec.keywords]
                    for n in ast.walk(arg)
                    if isinstance(n, ast.Name) and n.id in toplevel
                }
                refs.update(
                    n.id
                    for stmt in node.body
                    for n in ast.walk(stmt)
                    if isinstance(n, ast.Name)
                    and n.id.startswith("_")
                    and n.id in toplevel
                )
                # transitive closure: a folded helper's own private refs
                work = list(refs)
                while work:
                    for n in ast.walk(ast.parse(toplevel[work.pop()])):
                        if (
                            isinstance(n, ast.Name)
                            and n.id.startswith("_")
                            and n.id in toplevel
                            and n.id not in refs
                        ):
                            refs.add(n.id)
                            work.append(n.id)
                for name in sorted(refs):
                    block += "\x00" + name + "\x00" + toplevel[name]
                out[dec.args[0].value] = block
                break
    return out


def block_local_modules(block: str) -> list[str]:
    """Package-relative module paths locally imported inside a block,
    as repo paths (``adb_south_caucasus_etl_spark/operators/x.py``)."""
    mods = []
    for dotted in _LOCAL_IMPORT.findall(block):
        mods.append(
            "adb_south_caucasus_etl_spark/" + dotted.replace(".", "/") + ".py"
        )
    return sorted(set(mods))


def query_block_hashes(workload_src: str) -> dict[str, str]:
    """BLOCK hash per registered query — the rotation's dirty signal."""
    return {
        name: _sha(block)
        for name, block in register_blocks(workload_src).items()
    }


def query_fingerprints(workload_src: str, read_module) -> dict[str, str]:
    """DEEP hash per registered query: sha256 over the register block
    plus the sources of its locally-imported package modules (advisory —
    see module docstring).

    ``read_module(repo_path) -> str | None`` abstracts WHERE module
    sources come from (working tree for the live check, ``git show`` for
    historical rebuilds); a module that can't be read contributes a
    sentinel so the fingerprint still changes if it appears/disappears.
    """
    mod_cache: dict[str, str] = {}
    out: dict[str, str] = {}
    for name, block in register_blocks(workload_src).items():
        h = hashlib.sha256(block.encode("utf-8"))
        for mod in block_local_modules(block):
            if mod not in mod_cache:
                src = read_module(mod)
                mod_cache[mod] = _sha(src) if src is not None else "<missing>"
            h.update(b"\x00")
            h.update(mod.encode())
            h.update(mod_cache[mod].encode())
        out[name] = h.hexdigest()
    return out
