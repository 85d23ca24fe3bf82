"""Multimodal column plumbing (SURVEY §2.H L5/L6).

Images/audio/video ride through the engine as opaque ``binary`` payload
columns beside a typed metadata struct. The Spark-side machinery here —
schema, Arrow batch shape, ``mapInPandas`` iterator contract, partition
sizing — is real and tested; the actual codec step is stubbed because the
test container ships no image/audio libraries (clearly marked below).

Design for 100 TB of blobs: payloads stay columnar in parquet (or are
referenced by URI and fetched inside the batch iterator); feature extraction
is ``mapInPandas`` so each task processes Arrow batches without per-row
Python overhead, and the output schema is declared up front so downstream
plans stay fully typed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: output schema of extract_byte_features
BYTE_FEATURE_SCHEMA = (
    "doc_id bigint, byte_len int, first_byte int, last_byte int, "
    "ascii_ratio double"
)


def with_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Attach an opaque binary payload + metadata struct. In production the
    payload is the raw media; here it is the utf-8 encoding of the text
    column (deterministic, lets the oracle verify the plumbing)."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(F.encode(F.col(text_col), "utf-8")).alias("n_bytes"),
        ).alias("meta"),
    )


def extract_byte_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Batch feature extraction over binary payloads via ``mapInPandas``:
    each Arrow batch arrives as a pandas DataFrame, features are computed
    vectorized, and the declared schema keeps the plan typed."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            lens = payloads.str.len().astype("int32")
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "byte_len": lens,
                    "first_byte": payloads.map(
                        lambda b: b[0] if len(b) else -1
                    ).astype("int32"),
                    "last_byte": payloads.map(
                        lambda b: b[-1] if len(b) else -1
                    ).astype("int32"),
                    "ascii_ratio": payloads.map(
                        lambda b: (sum(1 for x in b if x < 128) / len(b))
                        if len(b)
                        else 0.0
                    ).round(4),
                }
            )

    return df.mapInPandas(op, schema=BYTE_FEATURE_SCHEMA)


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """STUB — image decoding (resize / frame-sample / pixel stats) requires
    an imaging library not present in this container. The call signature,
    batch shape, and output schema are the contract; the body raises.

    Production body: mapInPandas over Arrow batches, PIL/av decode per
    payload, emit ``width int, height int, channels int, thumb binary``.
    """
    raise NotImplementedError(
        "image decode requires an imaging library (PIL/libav) not shipped "
        "in this environment; plumbing lives in extract_byte_features"
    )
