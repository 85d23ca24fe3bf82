"""PySpark-native analytics engine with the query/data-processing surface of
Datawheel/adb-south-caucasus-etl (reference: /root/reference, a thin OLAP-proxy
HTTP client), rebuilt Spark-first.

The reference delegates all query execution to a remote OLAP server
(reference oec.py:20,43,57,62); this package owns those semantics natively:

- ``plans.cube``      — CubeQuery IR + compiler (reference oec.py:27-66 semantics)
- ``sources.registry``— table catalog over the driver parquet star schema,
                        plus the HTTP jsonrecords source (reference oec.py:20-22)
- ``functions``       — column normalization (reference oec.py:24,64), text,
                        vector helpers
- ``operators``       — joins (as-of, range, top-k), dedup (exact/MinHash/
                        SimHash), similarity search, window/session ops,
                        multimodal column plumbing
- ``streaming``       — Structured Streaming wrappers for the batch window ops
"""

__version__ = "0.1.0"
