import pytest

from adb_south_caucasus_etl_spark.plans.client import CubeClient
from adb_south_caucasus_etl_spark.sources.jsonrecords import (
    records_to_df,
    resolve_token,
)


def test_client_get_data_matches_reference_call_shape(spark, sf_dir):
    # the reference's example call (oec.py:30-36), bound to the fixture cube
    client = CubeClient(spark, sf_dir)
    df = client.get_data(
        cube="lineitem",
        drilldown=["Year", "Region"],
        measure=["Revenue"],
        cut={"Year": "1995"},
    )
    rows = df.collect()
    assert df.columns == ["year", "region", "revenue"]
    assert all(r["year"] == 1995 for r in rows)


def test_client_cut_not_mutated(spark, sf_dir):
    cut = {"Order Status": "F"}
    CubeClient(spark, sf_dir).get_data("lineitem", ["Year"], ["Quantity"], cut)
    assert cut == {"Order Status": "F"}


def test_client_get_members(spark, sf_dir):
    df = CubeClient(spark, sf_dir).get_members("lineitem", "Region")
    rows = df.collect()
    assert df.columns == ["region_id", "region"]
    assert len(rows) == 5
    assert [r["region_id"] for r in rows] == sorted(r["region_id"] for r in rows)


def test_records_to_df_normalizes_names(spark):
    payload = {
        "data": [
            {"Country ID": 1, "Country": "Armenia", "Trade Value": 10.5},
            {"Country ID": 2, "Country": "Georgia", "Trade Value": 20.0},
        ]
    }
    df = records_to_df(spark, payload)
    assert set(df.columns) == {"country_id", "country", "trade_value"}
    assert df.count() == 2


def test_records_to_df_bare_list_and_empty(spark):
    df = records_to_df(spark, [{"A B": 1}])
    assert df.columns == ["a_b"]
    with pytest.raises(ValueError, match="explicit schema"):
        records_to_df(spark, {"data": []})
    empty = records_to_df(spark, {"data": []}, schema="x INT, y STRING")
    assert empty.count() == 0


def test_resolve_token_fallback_order(monkeypatch):
    # reference oec.py:59-60: explicit arg wins over env var
    monkeypatch.setenv("OEC_TOKEN", "from-env")
    assert resolve_token("explicit") == "explicit"
    assert resolve_token(None) == "from-env"
    monkeypatch.delenv("OEC_TOKEN")
    assert resolve_token(None) is None


def test_client_sql_facade(spark, sf_dir):
    from adb_south_caucasus_etl_spark.plans.client import CubeClient

    client = CubeClient(spark, sf_dir)
    got = {
        (r.r_name, r.n)
        for r in client.sql(
            "SELECT r_name, count(*) AS n FROM nation "
            "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name"
        ).collect()
    }
    assert len(got) == 5 and all(n == 5 for _, n in got)


def test_http_jsonrecords_roundtrip_localhost(spark):
    """Full HTTP path (S1) against an in-process server: query-param
    encoding, auth-token attachment, jsonrecords parsing, name
    normalization — works via requests or the stdlib urllib fallback."""
    import http.server
    import json
    import threading
    import urllib.parse

    from adb_south_caucasus_etl_spark.sources.jsonrecords import (
        read_http_jsonrecords,
    )

    seen = {}

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            q = urllib.parse.urlparse(self.path)
            seen.update(urllib.parse.parse_qsl(q.query))
            body = json.dumps(
                {"data": [
                    {"ID": 1, "Trade Value": 10.5},
                    {"ID": 2, "Trade Value": 20.0},
                ]}
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/data"
        df = read_http_jsonrecords(
            spark, url,
            params={"cube": "trade", "drilldowns": "Year"},
            auth=True, token="tok-123",
        )
        rows = sorted(df.collect(), key=lambda r: r.id)
        assert df.columns == ["id", "trade_value"]
        assert [(r.id, r.trade_value) for r in rows] == [(1, 10.5), (2, 20.0)]
        assert seen == {"cube": "trade", "drilldowns": "Year",
                        "token": "tok-123"}
    finally:
        srv.shutdown()


class TestPythonDataSource:
    def test_modulo_partitions_cover_all_records(self, spark, tmp_path):
        import json

        from adb_south_caucasus_etl_spark.sources.pyds import (
            JsonRecordsDataSource,
        )

        payload = {
            "data": [
                {"doc_id": i, "lang": "en" if i % 2 else "fr", "n_chars": 10 * i}
                for i in range(17)  # deliberately not divisible by 3
            ]
        }
        p = tmp_path / "payload.json"
        p.write_text(json.dumps(payload))
        try:
            spark.dataSource.register(JsonRecordsDataSource)
        except Exception:
            pass
        df = (
            spark.read.format("jsonrecords")
            .schema("doc_id bigint, lang string, n_chars bigint")
            .option("url", f"file://{p}")
            .option("numPartitions", "3")
            .load()
        )
        assert df.rdd.getNumPartitions() == 3
        rows = sorted(df.collect(), key=lambda r: r["doc_id"])
        assert [r["doc_id"] for r in rows] == list(range(17))
        assert rows[3]["lang"] == "en" and rows[3]["n_chars"] == 30

    def test_bare_list_payload_and_missing_fields(self, spark, tmp_path):
        import json

        from adb_south_caucasus_etl_spark.sources.pyds import (
            JsonRecordsDataSource,
        )

        p = tmp_path / "bare.json"
        p.write_text(json.dumps([{"doc_id": 1}, {"doc_id": 2, "lang": "en"}]))
        try:
            spark.dataSource.register(JsonRecordsDataSource)
        except Exception:
            pass
        df = (
            spark.read.format("jsonrecords")
            .schema("doc_id bigint, lang string")
            .option("url", f"file://{p}")
            .option("numPartitions", "2")
            .load()
        )
        rows = sorted(df.collect(), key=lambda r: r["doc_id"])
        assert rows[0]["lang"] is None  # absent field → null
        assert rows[1]["lang"] == "en"

    def test_control_plane_record_cap_trips_fail_loud(self, spark, tmp_path):
        """The jsonrecords path re-fetches the whole payload per task, so
        it must REFUSE data-scale payloads instead of silently crawling:
        over maxRecords the read raises; the same payload passes once the
        caller explicitly raises the cap (declaring boundedness)."""
        import json

        import pytest

        from adb_south_caucasus_etl_spark.sources.pyds import (
            JsonRecordsDataSource,
        )

        p = tmp_path / "big.json"
        p.write_text(json.dumps({"data": [{"doc_id": i} for i in range(50)]}))
        try:
            spark.dataSource.register(JsonRecordsDataSource)
        except Exception:
            pass

        def read(max_records):
            return (
                spark.read.format("jsonrecords")
                .schema("doc_id bigint")
                .option("url", f"file://{p}")
                .option("maxRecords", str(max_records))
                .load()
            )

        with pytest.raises(Exception, match="control-plane cap"):
            read(10).collect()
        assert read(50).count() == 50


def test_partitioned_events_fixture_staging(spark, sf_dir):
    """The shared hive-layout fixture: staged once (complete, _SUCCESS-
    marked, hive event_date= directories), reused on the second call
    (same path, no re-write), and keyed on the source signature so a
    different source maps to a different directory."""
    import os

    from adb_south_caucasus_etl_spark.sources.fixtures import (
        partitioned_events_dir,
    )

    p1 = partitioned_events_dir(spark, sf_dir)
    assert os.path.exists(os.path.join(p1, "_SUCCESS"))
    parts = [d for d in os.listdir(p1) if d.startswith("event_date=")]
    assert len(parts) >= 25, f"expected ~30 day partitions, got {len(parts)}"
    mtime = os.path.getmtime(p1)
    p2 = partitioned_events_dir(spark, sf_dir)
    assert p2 == p1
    assert os.path.getmtime(p1) == mtime, "second call must not re-stage"
    # a different scale factor (different source signature) gets its own
    # dir — guard the inequality so the test stays correct if the session
    # sf_dir fixture ever points at sf0.01 itself, and skip it entirely
    # on machines without that testdata path (staging a nonexistent
    # source would error, not test anything — ADVICE r08)
    other_sf = "/root/testdata/sf0.01"
    if sf_dir.rstrip("/") != other_sf and os.path.exists(other_sf):
        assert partitioned_events_dir(spark, other_sf) != p1
    # no stage-* debris for THIS fixture name (scoped: once _SUCCESS
    # exists no new stager runs for it, so our-prefix debris can only be
    # ours — a global listdir check would flake on unrelated concurrent
    # processes staging other fixtures in the shared root)
    root, base = os.path.dirname(p1), os.path.basename(p1)
    assert not [
        d for d in os.listdir(root) if d.startswith(base + ".stage-")
    ]


def test_partitioned_orders_fixture_string_layout(spark, sf_dir):
    """The second hive layout (VERDICT r08 item 7): orders partitioned by
    o_month=YYYY-MM. The partition value must NOT parse as a date, so
    hive partition-type inference yields a STRING column — the other
    type class than events' DATE — and the directory count matches the
    fact's 7-year monthly span."""
    import os

    from pyspark.sql import types as T

    from adb_south_caucasus_etl_spark.sources.fixtures import (
        partitioned_orders_dir,
    )

    p = partitioned_orders_dir(spark, sf_dir)
    assert os.path.exists(os.path.join(p, "_SUCCESS"))
    parts = [d for d in os.listdir(p) if d.startswith("o_month=")]
    assert len(parts) >= 60, f"expected ~81 month partitions, got {len(parts)}"
    df = spark.read.parquet(p)
    assert isinstance(df.schema["o_month"].dataType, T.StringType), (
        df.schema["o_month"].dataType
    )
    assert partitioned_orders_dir(spark, sf_dir) == p


def test_fixture_stale_generations_are_pruned(spark, sf_dir):
    """ADVICE r08: a staging-version or source-signature change abandons
    the previous generation's directory — a successful stage must
    best-effort delete same-prefix siblings with a different suffix, so
    repeated testdata regeneration can't accumulate unbounded copies in
    the temp root. Simulated with a planted fake old generation."""
    import os

    from adb_south_caucasus_etl_spark.sources.fixtures import (
        _fixture_root,
        _prune_stale_generations,
        partitioned_orders_dir,
    )

    import shutil
    import time

    from adb_south_caucasus_etl_spark.sources import fixtures as fx

    p = partitioned_orders_dir(spark, sf_dir)
    root = _fixture_root(sf_dir)
    fake_old = os.path.join(root, "orders_by_month_v0_deadbeef")
    os.makedirs(fake_old, exist_ok=True)
    marker = os.path.join(fake_old, fx._TOMBSTONE)
    try:
        # deletion is TWO-PHASED (ADVICE r09): the pass that first
        # OBSERVES a stale sibling only tombstones it — a reader that
        # resolved the old path before regeneration keeps its files
        _prune_stale_generations(root, "orders_by_month", p)
        assert os.path.exists(fake_old), (
            "first observation must tombstone, not delete — an "
            "in-flight reader would lose files mid-scan"
        )
        assert os.path.exists(marker), "tombstone not dropped"
        # still inside the grace window: survives a second pass too
        _prune_stale_generations(root, "orders_by_month", p)
        assert os.path.exists(fake_old)
        # age the tombstone past the grace window: now it goes
        old = time.time() - 2 * fx._PRUNE_GRACE_SECONDS
        os.utime(marker, (old, old))
        _prune_stale_generations(root, "orders_by_month", p)
        assert not os.path.exists(fake_old), "stale generation not pruned"
        assert os.path.exists(os.path.join(p, "_SUCCESS")), (
            "pruning must never touch the live generation"
        )
        # other fixtures' generations are out of scope, and a concurrent
        # stager's in-progress .stage-* tree (even for a DIFFERENT
        # signature) must never be deleted — or tombstoned — under it
        other = os.path.join(root, "events_by_date_v0_cafebabe")
        inflight = os.path.join(root, "orders_by_month_v0_beef.stage-abc123")
        os.makedirs(other, exist_ok=True)
        os.makedirs(inflight, exist_ok=True)
        try:
            _prune_stale_generations(root, "orders_by_month", p)
            assert os.path.exists(other), "pruned a different fixture prefix"
            assert not os.path.exists(
                os.path.join(other, fx._TOMBSTONE)
            ), "tombstoned a different fixture prefix"
            assert os.path.exists(inflight), "pruned an in-progress stage dir"
            assert not os.path.exists(
                os.path.join(inflight, fx._TOMBSTONE)
            ), "tombstoned an in-progress stage dir"
        finally:
            os.rmdir(other)
            os.rmdir(inflight)
        # signature REVERT (ADVICE r10): a generation that becomes the
        # keep target again must have any leftover tombstone removed —
        # otherwise a LATER supersession inherits the aged marker and
        # the very next prune pass rmtrees it with no grace window
        keep_marker = os.path.join(p, fx._TOMBSTONE)
        with open(keep_marker, "w", encoding="utf-8") as fh:
            fh.write("leftover\n")
        old = time.time() - 2 * fx._PRUNE_GRACE_SECONDS
        os.utime(keep_marker, (old, old))
        _prune_stale_generations(root, "orders_by_month", p)
        assert os.path.exists(p), "pruned the live generation"
        assert not os.path.exists(keep_marker), (
            "stale tombstone on the keep generation must be cleared so "
            "a future supersession starts a fresh grace window"
        )
    finally:
        if os.path.exists(fake_old):
            shutil.rmtree(fake_old, ignore_errors=True)
