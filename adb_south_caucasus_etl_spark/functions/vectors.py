"""Vectorized (Arrow/pandas) UDF surface over embedding columns (SURVEY §2.K L6).

The reference exposes no UDFs (pure pandas client); this module is the [NS]
escape hatch for math that the built-in array functions can't express
efficiently. Everything here is Arrow-batched:

- ``l2_norm``: SCALAR pandas_udf — each batch arrives as a pandas Series of
  numpy arrays; numpy does the per-vector reduction in C. ~10-100x faster
  than a row-at-a-time Python UDF and keeps the exchange columnar.
- ``centroid_norms``: grouped-map ``applyInPandas`` — one pandas frame per
  group; demonstrates the custom-UDAF path (SURVEY §2.D A6) where the
  per-group computation (stack vectors -> mean -> norm) is a dense numpy op.

At 100 TB: scalar pandas_udfs pipeline with the scan (no shuffle);
``applyInPandas`` shuffles on the grouping key — fine when groups are
bounded (10 labels here), needs salting/two-phase (partial per-partition
mean, then weighted merge) if a single group's vectors exceed executor
memory. That two-phase variant is `label_centroids` in operators/similarity,
which stays JVM-side entirely.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


# explicit DataType for the same import-before-session reason as
# geometric_mean below
@pandas_udf(DoubleType())
def l2_norm(vecs: pd.Series) -> pd.Series:
    """Euclidean norm per vector, float64 accumulation (matches the SQL
    oracle: sqrt(sum(x*x)) with every x cast to DOUBLE first)."""
    return vecs.map(
        lambda v: float(np.sqrt(np.dot(a := np.asarray(v, dtype=np.float64), a)))
    )


def centroid_norms(
    emb: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-label centroid (mean vector) norm and group size via
    ``applyInPandas`` — the grouped-map pandas UDF surface."""

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(
            [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
        )
        centroid = mat.mean(axis=0)
        return pd.DataFrame(
            {
                label_col: [pdf[label_col].iloc[0]],
                "n_vecs": [len(pdf)],
                "centroid_norm": [float(np.sqrt(np.dot(centroid, centroid)))],
            }
        )

    return (
        emb.select(label_col, vec_col)
        .groupBy(label_col)
        .applyInPandas(
            per_group, schema=f"{label_col} int, n_vecs long, centroid_norm double"
        )
        .withColumn("centroid_norm", F.round("centroid_norm", 4))
    )


# explicit DataType (not a DDL string): a GROUPED_AGG pandas_udf resolves a
# string return type eagerly via the active SparkContext, which would make
# this module unimportable before a session exists
@pandas_udf(DoubleType())
def geometric_mean(v: pd.Series) -> float:
    """GROUPED_AGG pandas UDF (the true vectorized-UDAF surface, §2.K):
    whole-group Series in, one scalar out — Spark runs it as a real
    two-phase-capable aggregate expression inside ``groupBy().agg()``,
    unlike ``applyInPandas`` which replaces the whole group computation.
    Accumulates in log space (numpy, C loop) so products of thousands of
    prices don't overflow. SQL mirror: ``exp(avg(ln(x)))``."""
    return float(np.exp(np.log(v.to_numpy(dtype=np.float64)).mean()))


@pandas_udf(DoubleType())
def chars_per_token_iter(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """SCALAR_ITER pandas UDF — the third vectorized-UDF evaluation mode
    (§2.K): the worker receives an ITERATOR of Arrow batches, so expensive
    one-time setup (tokenizer/model load — here a compiled regex standing
    in for it) is paid once per TASK, not once per batch, and state never
    crosses the Arrow boundary. The per-batch body is still fully
    vectorized. SQL mirror: n_chars / token_count."""
    import re

    word = re.compile(r"\S+")  # the "expensive init" done once per task
    for texts in batches:
        # null text → NaN on both operands → NULL out, matching the SQL
        # mirror (length(NULL) is NULL); .str.len() already propagates NaN,
        # the token counter must not crash on None
        n_chars = texts.str.len().astype("float64")
        n_tok = texts.map(
            lambda t: float(len(word.findall(t)))
            if isinstance(t, str)
            else np.nan
        )
        yield n_chars / n_tok.clip(lower=1.0)
