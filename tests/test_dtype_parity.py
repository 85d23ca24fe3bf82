"""Fleet-wide Spark-vs-DuckDB result-dtype parity gate.

The driver's value-hash layer stringifies cells, so a column that is
integer-typed on one engine and float-typed on the other hash-mismatches
even when every value is numerically equal ("5" vs "5.0") — r05's one red
row, ``curation_sequence_pack``, was exactly this: DuckDB's window ``SUM``
over BIGINT returns HUGEINT, which ``.df()`` converts to float64, while
Spark's window sum stays int64.

Empirics from the r06 fleet sweep (full execution at sf0.001) pin the
benign classes: driver-green queries DO ship int32-vs-int64 (Spark rank/
size/month are INT, DuckDB is BIGINT-everything) and date-vs-datetime64
(Spark DATE → object of datetime.date, DuckDB DATE → datetime64) — both
survive the driver hash. The killing class is KIND mismatch between
numeric families (int vs float), and that is what this test rejects,
fleet-wide, so the whole class is gated instead of whack-a-moled.

Cost control: dtypes are a property of the SCHEMA, not the data, so both
engines are probed with LIMIT 0 — pandas keeps the conversion dtypes for
empty frames (verified for DuckDB HUGEINT→float64, DECIMAL→float64, and
Spark's Arrow path). A full-execution spot check lives in
tools/check_oracle.py, which applies the same kind rule on real values.
"""

import duckdb
import pytest

from adb_south_caucasus_etl_spark.sources.registry import TABLES
from adb_south_caucasus_etl_spark.workload import WORKLOAD

SF = "/root/testdata/sf0.001"

# (spark_kind, duck_kind) pairs allowed beyond exact equality; see module
# docstring for the evidence that these survive the driver hash.
_INT_KINDS = {"i", "u"}


def kinds_compatible(s_kind: str, d_kind: str) -> bool:
    if s_kind == d_kind:
        return True
    if s_kind in _INT_KINDS and d_kind in _INT_KINDS:
        return True
    # Spark DATE → pandas object (datetime.date); DuckDB DATE → datetime64
    if s_kind == "O" and d_kind == "M":
        return True
    return False


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    yield con
    con.close()


ORACLED = sorted(n for n in WORKLOAD if WORKLOAD[n].oracle is not None)


@pytest.mark.parametrize("name", ORACLED)
def test_dtype_kind_parity(spark, duck, fleet, name):
    # shared fleet build (conftest._FleetCache): same fn() frame as the
    # other sweeps, limit(0) keeps this check execution-free
    sdf = fleet.df(name).limit(0).toPandas()
    ddf = duck.sql(
        f"SELECT * FROM ({WORKLOAD[name].oracle}) __t LIMIT 0"
    ).df()
    bad = {}
    for c in sdf.columns:
        if c not in ddf.columns:
            continue  # column-name parity is the oracle checker's job
        sk, dk = sdf[c].dtype.kind, ddf[c].dtype.kind
        if not kinds_compatible(sk, dk):
            bad[c] = (str(sdf[c].dtype), str(ddf[c].dtype))
    assert not bad, (
        f"{name}: numeric-kind mismatch spark-vs-duckdb {bad} — the "
        "driver hash stringifies cells, so int-vs-float columns red-stamp "
        "even when values are equal; cast the narrower side (usually "
        "CAST(...AS BIGINT) around a DuckDB window/HUGEINT sum)"
    )
