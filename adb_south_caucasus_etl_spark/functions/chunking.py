"""Document chunking for LLM context windows — the Python UDTF surface
(SURVEY §2.K: UDF/UDAF/UDTF; reference exposes none, this is [NS] tier).

A chunker is the canonical 1-to-N training-pipeline expansion: split each
document into overlapping word windows sized to a model's context length.
Spark 4 Python UDTFs are the native way to express a row expander whose
output cardinality the planner can't know (vs ``explode``, which needs the
array fully built per row first): the UDTF streams chunks out per input
row, joins laterally, and parallelizes like any projection.

Scale posture: ``eval`` still runs per input row in Python (the UDTF
contract — each row's work is O(its own tokens), no cross-row state), but
``useArrow=True`` moves the TRANSPORT to Arrow batches
(``ArrowEvalPythonUDTF`` in the plan, asserted by the fleet-wide audit in
tests/test_plan_audit.py) — rows cross the JVM/Python boundary in columnar
batches instead of pickled one at a time. The workload keeps every hot
text metric JVM-side (functions/text.py); chunking sits on the Python side
deliberately because its output is ragged (variable rows per input), which
is exactly what the UDTF contract exists for. For a petabyte corpus, the
same logic drops into ``mapInPandas`` with one pandas ``str.split`` +
offset arithmetic per Arrow batch — the UDTF here proves the surface and
the semantics; both formulations share the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, chunk string, n_tokens int", useArrow=True)
class ChunkWords:
    """Overlapping word windows: start offsets 0, stride, 2*stride, ...
    while the offset lands inside the document; the final window may be
    shorter than ``size``. Empty/whitespace-only text yields no rows
    (mirror any filter in the oracle)."""

    def eval(self, text: str, size: int, stride: int):
        toks = (text or "").split()
        for idx, s in enumerate(range(0, len(toks), stride)):
            window = toks[s : s + size]
            yield idx, " ".join(window), len(window)


def chunk_documents(
    spark: SparkSession,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 32,
    stride: int = 24,
) -> DataFrame:
    """(doc_id, chunk_idx, chunk, n_tokens) via a lateral UDTF join."""
    spark.udtf.register("chunk_words", ChunkWords)
    docs.createOrReplaceTempView("__chunk_input")
    return spark.sql(
        f"""
        SELECT d.{id_col} AS doc_id, c.chunk_idx, c.chunk, c.n_tokens
        FROM __chunk_input d,
             LATERAL chunk_words(d.{text_col}, {int(size)}, {int(stride)}) c
        """
    )
