"""Round-5 batch-16: streaming Python data source, checkpoint-restart
exactly-once, two-pass exact median, readability counts.

Oracle stamps final values; these tests pin the offset protocol of the
stream reader (every record exactly once, replay-identical slices), the
multi-micro-batch drain, rerun idempotency of the restart query, and
brute-force agreement of the median/count math.
"""

import json
import re

import pytest
from pyspark.sql import functions as F

from adb_south_caucasus_etl_spark.sources.pyds import (
    JsonRecordsDataSource,
    JsonRecordsSimpleStreamReader,
)
from adb_south_caucasus_etl_spark.workload import WORKLOAD

SF = "/root/testdata/sf0.001"


class _Schema:
    def __init__(self, names):
        self.fields = [type("F", (), {"name": n})() for n in names]


def _reader(tmp_path, n=25, batch=7):
    payload = tmp_path / "p.json"
    payload.write_text(
        json.dumps({"data": [{"doc_id": i, "lang": f"l{i % 3}"} for i in range(n)]})
    )
    return JsonRecordsSimpleStreamReader(
        _Schema(["doc_id", "lang"]),
        {"url": f"file://{payload}", "batchSize": str(batch)},
    )


class TestStreamReaderProtocol:
    def test_offset_chain_covers_every_record_once(self, tmp_path):
        r = _reader(tmp_path, n=25, batch=7)
        off = r.initialOffset()
        seen = []
        sizes = []
        while True:
            rows, nxt = r.read(off)
            rows = list(rows)
            if not rows:
                assert nxt == off  # drained: offset stops advancing
                break
            sizes.append(len(rows))
            seen.extend(rows)
            off = nxt
        assert [t[0] for t in seen] == list(range(25))
        assert sizes == [7, 7, 7, 4]  # multiple micro-batches, exact tail

    def test_replay_range_identical(self, tmp_path):
        r = _reader(tmp_path, n=25, batch=7)
        a = list(r.readBetweenOffsets({"index": 7}, {"index": 14}))
        rows, _ = r.read({"index": 7})
        assert a == list(rows)

    def test_bad_batch_size_rejected(self, tmp_path):
        with pytest.raises(ValueError, match="batchSize"):
            _reader(tmp_path, batch=0)


class TestStreamingDrain:
    def test_multi_batch_drain_matches_batch_counts(self, spark, tmp_path):
        payload = tmp_path / "p.json"
        recs = [{"doc_id": i, "lang": f"l{i % 3}"} for i in range(25)]
        payload.write_text(json.dumps({"data": recs}))
        try:
            spark.dataSource.register(JsonRecordsDataSource)
        except Exception:
            pass
        stream = (
            spark.readStream.format("jsonrecords")
            .schema("doc_id bigint, lang string")
            .option("url", f"file://{payload}")
            .option("batchSize", "7")
            .load()
        )
        agg = stream.groupBy("lang").count()
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("t16_drain")
            .start()
        )
        import time

        deadline = time.time() + 120
        try:
            while time.time() < deadline:
                got = spark.sql(
                    "SELECT COALESCE(SUM(count), 0) FROM t16_drain"
                ).collect()[0][0]
                if got >= 25:
                    break
                time.sleep(0.2)
        finally:
            q.stop()
            q.awaitTermination()
        rows = {
            r["lang"]: r["count"]
            for r in spark.sql("SELECT * FROM t16_drain").collect()
        }
        assert rows == {"l0": 9, "l1": 8, "l2": 8}


class TestRestartExactlyOnce:
    def test_rerun_idempotent(self, spark):
        a = sorted(
            tuple(r)
            for r in WORKLOAD["streaming_restart_exactly_once"].fn(spark, SF).collect()
        )
        b = sorted(
            tuple(r)
            for r in WORKLOAD["streaming_restart_exactly_once"].fn(spark, SF).collect()
        )
        assert a == b and len(a) == 5


class TestExactMedian:
    def test_matches_brute_force_sort(self, spark):
        row = WORKLOAD["agg_exact_median_twopass"].fn(spark, SF).collect()[0]
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        cents = sorted(
            r["c"]
            for r in li.select(
                F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("c")
            ).collect()
        )
        n = len(cents)
        k = (n + 1) // 2
        assert (row["n"], row["k"], row["median_cents"]) == (n, k, cents[k - 1])


class TestReadabilityCounts:
    def test_matches_python_regex(self, spark):
        rows = WORKLOAD["text_readability_counts"].fn(spark, SF).collect()
        docs = {
            r["doc_id"]: r["text"]
            for r in spark.read.parquet(f"{SF}/documents.parquet")
            .filter((F.col("doc_id") % 20 == 0) & F.col("text").isNotNull())
            .collect()
        }
        assert len(rows) == len(docs) > 0
        for r in rows:
            t = docs[r["doc_id"]]
            assert r["n_sentences"] == max(len(re.findall(r"[.!?]+", t)), 1)
            assert r["n_words"] == len(re.findall(r"\S+", t.strip()))
            assert r["n_syllables"] == len(re.findall(r"[aeiouy]+", t.lower()))
