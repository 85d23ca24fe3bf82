"""Round-5 batch-14 operators: exact ML evaluation metrics, leakage-safe
encodings, hashed features, and the binaryFile ingest surface.

The binaryFile manifest is rows-only at the driver (the oracle's DuckDB
views cannot see the filesystem), so its byte-level gate lives HERE:
every size and md5 is recomputed with plain Python file IO.
"""

import glob
import hashlib
import os

from pyspark.sql import functions as F

from adb_south_caucasus_etl_spark.workload import WORKLOAD

SF = "/root/testdata/sf0.001"


class TestBinaryFileManifest:
    def test_sizes_and_md5_byte_exact(self, spark):
        rows = {
            r["fname"]: r
            for r in WORKLOAD["source_binaryfile_manifest"].fn(spark, SF).collect()
        }
        files = sorted(glob.glob(f"{SF}/*.parquet"))
        assert len(files) == len(rows) > 0
        for path in files:
            fname = os.path.basename(path)
            blob = open(path, "rb").read()
            r = rows[fname]
            assert r["size_bytes"] == len(blob)
            assert r["content_md5"] == hashlib.md5(blob).hexdigest()
            assert r["is_parquet"] == (blob[:4] == b"PAR1")
            assert r["is_parquet"]


class TestAucExact:
    def test_matches_pair_counting(self, spark):
        row = WORKLOAD["ml_auc_exact"].fn(spark, SF).collect()[0]
        emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
            (F.col("label") < 5).alias("y"),
            F.element_at("embedding", 1).cast("double").alias("s"),
        )
        data = [(r["y"], r["s"]) for r in emb.collect()]
        pos = [s for y, s in data if y]
        neg = [s for y, s in data if not y]
        assert row["n_pos"] == len(pos) and row["n_neg"] == len(neg)
        # U counts pos>neg pairs (+0.5 per tie); u_x2 doubles it exactly
        u_x2 = sum(
            2 * (p > n) + (p == n) for p in pos for n in neg
        )
        assert row["u_x2"] == u_x2
        assert row["auc_micro"] == (u_x2 * 1_000_000) // (2 * len(pos) * len(neg))


class TestTargetEncodeOOF:
    def test_encoding_excludes_own_fold(self, spark):
        out = WORKLOAD["ml_target_encode_oof"].fn(spark, SF)
        from adb_south_caucasus_etl_spark.operators.curation import md5_bucket

        cust = spark.read.parquet(f"{SF}/customer.parquet").select(
            F.col("c_nationkey").cast("int").alias("nationkey"),
            md5_bucket("c_custkey", 5).alias("fold"),
            (F.round(F.col("c_acctbal") * 100).cast("bigint")).alias("cents"),
        )
        raw = {}
        for r in cust.collect():
            raw.setdefault(r["nationkey"], []).append((r["fold"], r["cents"]))
        for r in out.collect():
            others = [
                c for f, c in raw[r["nationkey"]] if f != r["fold"]
            ]
            if not others:
                assert r["enc_milli"] is None
            else:
                off = (sum(c + 1_000_000 for c in others) * 1000) // len(others)
                assert r["enc_milli"] == off - 1_000_000_000

    def test_every_category_fold_cell_present(self, spark):
        out = WORKLOAD["ml_target_encode_oof"].fn(spark, SF)
        n_cells = out.count()
        distinct = out.select("nationkey", "fold").distinct().count()
        assert n_cells == distinct


class TestFeatureHashing:
    def test_bucket_counts_conserve_tokens(self, spark):
        out = WORKLOAD["text_feature_hashing"].fn(spark, SF)
        total = out.agg(F.sum("n")).collect()[0][0]
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        toks = (
            docs.filter((F.col("doc_id") % 20 == 0) & F.col("text").isNotNull())
            .select(F.explode(F.split(F.trim("text"), r"\s+")).alias("t"))
            .filter(F.col("t") != "")
        )
        assert total == toks.count()
        assert out.filter((F.col("bucket") < 0) | (F.col("bucket") >= 1024)).count() == 0


class TestKnnConfusion:
    def test_matrix_covers_every_test_vector_once(self, spark):
        out = WORKLOAD["ml_knn_confusion"].fn(spark, SF)
        from adb_south_caucasus_etl_spark.operators.curation import md5_bucket

        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        n_test = emb.filter(md5_bucket("vec_id", 5) == 0).count()
        assert out.agg(F.sum("n")).collect()[0][0] == n_test
        # better than chance on 10 classes: diagonal > 10% of mass
        diag = out.filter(F.col("true_label") == F.col("pred_label")).agg(
            F.sum("n")
        ).collect()[0][0] or 0
        assert diag * 10 > n_test
