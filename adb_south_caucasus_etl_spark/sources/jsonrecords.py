"""HTTP "jsonrecords" source — the reference's only ingest path.

The reference GETs an endpoint and materializes ``r.json()['data']`` (an
array of flat record objects) into a DataFrame, then normalizes column names
(reference oec.py:20-24 for /members, oec.py:57-64 for /data). Here:

- :func:`records_to_df` owns the payload→DataFrame step (driver-side for the
  small control-plane payloads the reference deals in; the array is
  parallelized so anything downstream is distributed).
- :func:`read_http_jsonrecords` owns the GET + auth-token plumbing with the
  reference's exact fallback order: explicit arg > environment variable
  (reference oec.py:59-60). Uses ``requests`` when installed, else falls
  back to stdlib ``urllib`` — the HTTP path works everywhere Python does
  (exercised against an in-process HTTP server in
  tests/test_client_sources.py).

For *bulk* JSON (data plane, not control plane), use
``spark.read.json(path, schema=...)`` on staged files instead — executors
read in parallel and the scan participates in pushdown.
"""

from __future__ import annotations

import json
import os
import urllib.parse
import urllib.request

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
    the full reference request path (oec.py:43-63). Uses ``requests`` when
    available, stdlib ``urllib`` otherwise (same URL encoding, same
    error-on-HTTP-failure contract)."""
    payload = dict(params or {})  # never mutate caller input (oec.py:48)
    if auth:
        tok = resolve_token(token, token_env)
        if tok:
            payload["token"] = tok
    if _HAS_REQUESTS:
        r = requests.get(url, params=payload, timeout=timeout)
        r.raise_for_status()
        body = r.json()
    else:
        full = url
        if payload:
            sep = "&" if urllib.parse.urlparse(url).query else "?"
            full = f"{url}{sep}{urllib.parse.urlencode(payload)}"
        # raises urllib.error.HTTPError on non-2xx — the raise_for_status
        # equivalent
        with urllib.request.urlopen(full, timeout=timeout) as resp:
            body = json.loads(resp.read().decode("utf-8"))
    return records_to_df(spark, body, schema=schema)
