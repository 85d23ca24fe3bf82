"""HTTP "jsonrecords" source — the reference's only ingest path.

The reference GETs an endpoint and materializes ``r.json()['data']`` (an
array of flat record objects) into a DataFrame, then normalizes column names
(reference oec.py:20-24 for /members, oec.py:57-64 for /data). Here:

- :func:`records_to_df` owns the payload→DataFrame step (driver-side for the
  small control-plane payloads the reference deals in; the array is
  parallelized so anything downstream is distributed).
- :func:`read_http_jsonrecords` owns the GET + auth-token plumbing with the
  reference's exact fallback order: explicit arg > environment variable
  (reference oec.py:59-60). Gated behind an import-try since the test
  container has no network.

For *bulk* JSON (data plane, not control plane), use
``spark.read.json(path, schema=...)`` on staged files instead — executors
read in parallel and the scan participates in pushdown.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..functions.normalize import normalize_columns

try:  # pragma: no cover - exercised only where requests exists
    import requests  # noqa: F401

    _HAS_REQUESTS = True
except Exception:  # pragma: no cover
    _HAS_REQUESTS = False


def records_to_df(
    spark: SparkSession,
    payload: dict | list,
    schema=None,
    data_key: str = "data",
) -> DataFrame:
    """Materialize a jsonrecords payload (``{'data': [{...}, ...]}`` or a
    bare record list) into a DataFrame with normalized column names —
    the client-side half of reference oec.py:22-24,63-64."""
    records = payload.get(data_key, []) if isinstance(payload, dict) else payload
    if schema is None and not records:
        raise ValueError("empty payload needs an explicit schema")
    df = spark.createDataFrame(records, schema=schema)
    return normalize_columns(df)


def resolve_token(
    token: str | None = None, env_var: str = "OEC_TOKEN"
) -> str | None:
    """Reference auth fallback order: explicit arg > env var
    (reference oec.py:59-60)."""
    if token:
        return token
    return os.environ.get(env_var)


def read_http_jsonrecords(
    spark: SparkSession,
    url: str,
    params: dict | None = None,
    *,
    auth: bool = False,
    token: str | None = None,
    token_env: str = "OEC_TOKEN",
    schema=None,
    timeout: float = 60.0,
) -> DataFrame:
    """GET ``url`` with query params and parse the jsonrecords body —
    the full reference request path (oec.py:43-63). Requires ``requests``."""
    if not _HAS_REQUESTS:  # pragma: no cover
        raise NotImplementedError(
            "requests is unavailable in this environment; "
            "use records_to_df on a pre-fetched payload"
        )
    payload = dict(params or {})  # never mutate caller input (oec.py:48)
    if auth:
        tok = resolve_token(token, token_env)
        if tok:
            payload["token"] = tok
    r = requests.get(url, params=payload, timeout=timeout)
    r.raise_for_status()
    return records_to_df(spark, r.json(), schema=schema)
