"""Round-5 batch-19: split leakage, autocomplete index, backpressure."""

from pyspark.sql import functions as F

from adb_south_caucasus_etl_spark.workload import WORKLOAD

SF = "/root/testdata/sf0.001"


class TestSplitLeakage:
    def test_leak_flag_consistent_with_splits(self, spark):
        rows = WORKLOAD["curation_split_leakage_audit"].fn(spark, SF).collect()
        assert len(rows) > 0
        for r in rows:
            assert r["leaks"] == (r["split_a"] != r["split_b"])
            assert r["jaccard"] >= 0.5

    def test_pairs_match_registered_neardup_query(self, spark):
        leak = WORKLOAD["curation_split_leakage_audit"].fn(spark, SF)
        base = WORKLOAD["neardup_jaccard_pairs"].fn(spark, SF)
        a = {(r["id_a"], r["id_b"]) for r in leak.collect()}
        b = {(r["id_a"], r["id_b"]) for r in base.collect()}
        assert a == b  # the audit covers EXACTLY the near-dup pair set


class TestPrefixCompletions:
    def test_completion_starts_with_prefix_and_is_argmax(self, spark):
        rows = WORKLOAD["search_prefix_completions"].fn(spark, SF).collect()
        assert len(rows) > 0
        words = (
            spark.read.parquet(f"{SF}/part.parquet")
            .select(F.explode(F.split(F.lower("p_name"), " ")).alias("w"))
            .filter(F.col("w") != "")
            .groupBy("w")
            .count()
        )
        freq = {r["w"]: r["count"] for r in words.collect()}
        for r in rows:
            assert r["completion"].startswith(r["prefix"])
            assert freq[r["completion"]] == r["n_uses"]
            # no word with the same prefix may beat it under (cnt, word)
            for w, c in freq.items():
                if w.startswith(r["prefix"]):
                    assert (c, [r["completion"]]) >= (c, [w]) or (
                        (-c, w) >= (-r["n_uses"], r["completion"])
                    )


class TestBackpressure:
    def test_throttled_drain_uses_multiple_batches(self, spark, tmp_path):
        ev = spark.read.parquet(f"{SF}/events.parquet")
        src = str(tmp_path / "src")
        ev.repartition(8).write.parquet(src)
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "2")
            .parquet(src)
        )
        batches = []

        def count_batches(df, bid):
            batches.append((bid, df.count()))

        q = (
            stream.writeStream.foreachBatch(count_batches)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        assert len(batches) >= 4  # 8 files / 2 per trigger
        assert sum(n for _, n in batches) == ev.count()
