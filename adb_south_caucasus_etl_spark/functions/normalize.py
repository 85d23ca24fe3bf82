"""Column-name normalization — the reference's only schema transform.

Reference parity: ``df.columns.map(lambda x: x.replace(' ', '_').lower())``
(reference oec.py:24 and oec.py:64). Applied to every result the engine
returns, so ``"Trade Value"``-style measure names come out ``trade_value``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def normalize_colname(name: str) -> str:
    """``replace(' ', '_').lower()`` — exact reference semantics
    (reference oec.py:24,64)."""
    return name.replace(" ", "_").lower()


def normalize_columns(df: DataFrame) -> DataFrame:
    """Rename every column via :func:`normalize_colname`. Pure metadata
    operation — no job, no shuffle."""
    normalized = [normalize_colname(c) for c in df.columns]
    if normalized == list(df.columns):
        return df
    return df.toDF(*normalized)
