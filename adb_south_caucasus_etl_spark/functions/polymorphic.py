"""Polymorphic Python UDTF — output schema decided at ANALYSIS time
(SURVEY §2.P P6; SPARK-44503).

``ChunkWords`` (functions/chunking.py) declares a fixed ``returnType``.
The other half of the Spark 4 UDTF surface is the ``analyze`` static
method: Catalyst calls it at plan time with the *constant* arguments, and
the UDTF returns its own output schema — one table function whose shape
follows its call site. The canonical use is schema-on-call field
extraction: ``extract_fields(props, 'k,v')`` plans two typed columns,
``extract_fields(props, 'k')`` plans one, with no code change and no
MapType escape hatch (a map output would also violate the driver's
scalar-columns-only contract).

Scale posture: analysis runs ONCE on the driver; per-row ``eval`` work is
one ``json.loads`` per payload (the irreducible Python part), transport is
Arrow (``useArrow=True`` → ``ArrowEvalPythonUDTF``; the fleet audit
rejects ``BatchEvalPython``). For a fixed hot field set, prefer the pure-
JVM ``get_json_object``/``from_json`` path (scalar_map_json_funcs) — the
polymorphic UDTF earns its Python crossing when the field list is only
known at call time (per-tenant extraction configs, exploratory curation).
"""

from __future__ import annotations

import json

from pyspark.sql.functions import udtf
from pyspark.sql.types import DoubleType, StringType, StructType
from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

_TYPES = {"string": StringType(), "double": DoubleType()}


@udtf(useArrow=True)
class ExtractJsonFields:
    """``extract_json_fields(payload, 'name:type,name:type,...')`` — one
    output column per spec entry (types: string|double; default string),
    values pulled from the JSON payload; missing keys and unparseable
    payloads yield NULLs (tolerant-ingest posture). The spec argument must
    be a foldable constant — ``analyze`` raises otherwise, at plan time,
    not per row."""

    @staticmethod
    def analyze(payload: AnalyzeArgument, spec: AnalyzeArgument) -> AnalyzeResult:
        if spec.value is None:
            raise ValueError(
                "extract_json_fields: the field spec must be a constant "
                "string (got a non-foldable expression)"
            )
        schema = StructType()
        for ent in str(spec.value).split(","):
            name, _, ty = ent.strip().partition(":")
            ty = ty.strip() or "string"
            if not name or ty not in _TYPES:
                raise ValueError(
                    f"extract_json_fields: bad spec entry {ent!r} "
                    "(want name[:string|double])"
                )
            schema = schema.add(name.strip(), _TYPES[ty])
        return AnalyzeResult(schema=schema)

    def __init__(self):
        # the spec is foldable (analyze enforces it — one constant per
        # call site), so parse it once per UDTF instance instead of once
        # per row: at sf0.1 the per-row split/partition was a third of
        # the eval cost
        self._names = None

    def eval(self, payload, spec):
        if self._names is None:
            self._names = []
            for ent in str(spec).split(","):
                name, _, ty = ent.strip().partition(":")
                self._names.append((name.strip(), ty.strip() or "string"))
        names = self._names
        try:
            obj = json.loads(payload) if payload is not None else {}
            if not isinstance(obj, dict):
                obj = {}
        except (ValueError, TypeError):
            obj = {}
        row = []
        for name, ty in names:
            v = obj.get(name)
            if v is None:
                row.append(None)
            elif ty == "double":
                try:
                    row.append(float(v))
                except (TypeError, ValueError):
                    row.append(None)
            else:
                row.append(str(v))
        yield tuple(row)
