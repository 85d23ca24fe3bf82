from adb_south_caucasus_etl_spark.functions.normalize import (
    normalize_colname,
    normalize_columns,
)


def test_normalize_reference_example():
    # reference oec.py:24,64 semantics
    assert normalize_colname("Trade Value") == "trade_value"
    assert normalize_colname("Country ID") == "country_id"


def test_normalize_idempotent():
    for name in ["Trade Value", "already_ok", "Mixed Case Col"]:
        once = normalize_colname(name)
        assert normalize_colname(once) == once
        assert " " not in once
        assert once == once.lower()


def test_normalize_columns_df(spark):
    df = spark.createDataFrame([(1, 2.0)], ["Some ID", "Trade Value"])
    out = normalize_columns(df)
    assert out.columns == ["some_id", "trade_value"]
    # no-op path returns same plan
    assert normalize_columns(out).columns == ["some_id", "trade_value"]
