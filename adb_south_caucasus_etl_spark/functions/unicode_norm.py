"""Unicode normalization for multilingual corpus cleaning (SURVEY §2.S).

Real-world scraped text mixes composed ('á', U+00E1) and decomposed
('a' + U+0301) forms of the same grapheme; a dedup/shingle/tokenize
pipeline that doesn't NFC-normalize first silently treats them as
different documents. Spark ships no normalization builtin, so this is a
pandas-UDF boundary (stdlib ``unicodedata`` is the reference
implementation of UAX #15): Arrow-batched transport, one
``unicodedata.normalize`` call per row — the irreducible per-string
work, same posture as the image codec.

``strip_accents`` is NFD → drop combining marks (category Mn) → NFC: the
standard accent-folding used for fuzzy entity matching (DuckDB's
``strip_accents`` agrees on Latin diacritics, which is what lets the
oracle cross-check it).

Scale: normalization is embarrassingly parallel and linear; run it ONCE
at ingest and persist — every downstream operator (shingles, minhash,
tokenize) then sees canonical bytes. The registered query synthesizes
decomposed characters in-engine (chr(769) combining acute) so the oracle
exercises real normalization work on the ASCII test corpus.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("string")
def nfc_normalize(s: pd.Series) -> pd.Series:
    import unicodedata

    return s.map(
        lambda x: unicodedata.normalize("NFC", x) if x is not None else None
    )


@pandas_udf("string")
def strip_accents(s: pd.Series) -> pd.Series:
    import unicodedata

    def _strip(x):
        if x is None:
            return None
        nfd = unicodedata.normalize("NFD", x)
        return unicodedata.normalize(
            "NFC",
            "".join(c for c in nfd if unicodedata.category(c) != "Mn"),
        )

    return s.map(_strip)
