"""Fleet-wide negative-zero rendering guard (VERDICT r09 item 5).

The driver hashes STRINGIFIED cell values, so a float cell that renders
``-0.0`` on one engine and ``0.0`` on the other red-stamps even though
the values compare numerically equal (IEEE ``-0.0 == 0.0``). Found live
in r9: ``finance_price_volume_mix``'s rounded residual column (DuckDB
``ROUND`` of a tiny negative gives ``-0.0``; Spark's gave ``0.0``).

This guard runs EVERY registered query on Spark and EVERY oracle on
DuckDB at sf0.001 and fails if any float cell is a negative zero on
either engine. The class is banned outright — not merely
"both-engines-agree" — because the engines' rounding kernels disagree
on the sign of zero, so a ``-0.0`` that happens to match today becomes
a driver red the moment data or either engine's rounding path shifts.
The fix pattern is ``ROUND(...) + 0.0`` on BOTH sides (IEEE:
``-0.0 + 0.0 = +0.0``).

Scope note: sf0.001 exercises every query's output shape but not every
data-dependent zero; the strict stringify compare in
``tools/check_oracle.py`` (run at sf0.01/sf0.1 pre-round) is the
backstop for zeros that only materialize at larger SFs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from adb_south_caucasus_etl_spark.workload import WORKLOAD

SF = "/root/testdata/sf0.001"

#: rendering of an IEEE negative zero anywhere in a stringified cell —
#: matches "-0.0" / "-0.000" but not "-0.001" (no digit may follow)
_NEGZERO_RE = r"-0\.0+(?![0-9])"


def _negzero_cells(pdf: pd.DataFrame) -> list[str]:
    """Return ``column`` labels containing a negative-zero float cell
    (float dtypes via signbit; object/string cells via the rendered
    pattern, catching pre-stringified numbers)."""
    bad = []
    for c in pdf.columns:
        s = pdf[c]
        if s.dtype.kind == "f":
            vals = s.to_numpy()
            if bool(((vals == 0) & np.signbit(vals)).any()):
                bad.append(str(c))
        elif s.dtype.kind == "O" and len(s):
            if bool(s.astype(str).str.contains(_NEGZERO_RE, regex=True).any()):
                bad.append(str(c))
    return bad


@pytest.fixture(scope="module")
def duck_con():
    import duckdb

    from adb_south_caucasus_etl_spark.sources.registry import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(WORKLOAD))
def test_no_negative_zero_rendering(name, spark, duck_con, fleet):
    spec = WORKLOAD[name]
    # shared fleet build+execution (conftest._FleetCache): this sweep's
    # toPandas is THE one execution the plan-audit and scan-census
    # sweeps read their final plans from
    spark_bad = _negzero_cells(fleet.pdf(name))
    assert not spark_bad, (
        f"{name}: Spark renders -0.0 in column(s) {spark_bad} — "
        "normalize with `ROUND(...) + 0.0` on BOTH engines"
    )
    if spec.oracle is not None:
        duck_bad = _negzero_cells(duck_con.sql(spec.oracle).df())
        assert not duck_bad, (
            f"{name}: DuckDB oracle renders -0.0 in column(s) "
            f"{duck_bad} — normalize with `ROUND(...) + 0.0` on BOTH "
            "engines"
        )
