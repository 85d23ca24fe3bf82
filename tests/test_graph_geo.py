"""Round-5 batch-12 operators: graph kernels (integer PageRank, degree-
ordered triangles), grid-blocked spatial join, edit-distance blocking,
and the exact-integer audit/allocation queries.

The registered queries' VALUE correctness is stamped by the DuckDB oracle;
these tests pin what an oracle can't: exact equivalence of the distributed
formulation to a brute-force in-memory reference on adversarial random
inputs, blocking soundness (no candidate pair lost), and the operators'
declared invariants (allocation sums, one-sided sketch error).
"""

import random
from collections import Counter, defaultdict

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from adb_south_caucasus_etl_spark.operators.fuzzy import editdist_self_join
from adb_south_caucasus_etl_spark.operators.geo import grid_distance_join
from adb_south_caucasus_etl_spark.operators.graph import (
    pagerank_integer,
    triangle_count,
)
from adb_south_caucasus_etl_spark.workload import WORKLOAD

SF = "/root/testdata/sf0.001"


def _ref_pagerank(edges, iters, mass0):
    es = sorted(set(edges))
    nodes = sorted({u for e in es for u in e})
    out = Counter(s for s, _ in es)
    base = 15 * mass0 // 100
    mass = {n: mass0 for n in nodes}
    for _ in range(iters):
        inm = defaultdict(int)
        for s, d in es:
            inm[d] += mass[s] // out[s]
        mass = {n: base + (85 * inm.get(n, 0)) // 100 for n in nodes}
    return mass


class TestPagerankInteger:
    def test_matches_reference_on_random_digraph(self, spark):
        rng = random.Random(42)
        edges = [
            (rng.randrange(30), rng.randrange(30)) for _ in range(200)
        ]
        edges = [(s, d) for s, d in edges if s != d]
        df = spark.createDataFrame(
            [Row(src=s, dst=d) for s, d in edges]
        )
        got = {
            r["node"]: r["mass"]
            for r in pagerank_integer(df, iterations=3, mass0=10**12).collect()
        }
        assert got == _ref_pagerank(edges, 3, 10**12)

    def test_dangling_nodes_keep_base_mass(self, spark):
        # sink node 9 has no out-edges: it must still exist with
        # base + damped incoming; its mass evaporates (never redistributed)
        df = spark.createDataFrame([Row(src=1, dst=9), Row(src=2, dst=9)])
        got = {
            r["node"]: r["mass"]
            for r in pagerank_integer(df, iterations=2, mass0=100_000).collect()
        }
        assert set(got) == {1, 2, 9}
        assert got == _ref_pagerank([(1, 9), (2, 9)], 2, 100_000)


def _ref_triangles(edges):
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj = defaultdict(set)
    for a, b in es:
        adj[a].add(b)
        adj[b].add(a)
    tri = 0
    for a, b in es:
        tri += len(adj[a] & adj[b])
    return len(adj), len(es), tri // 3


class TestTriangleCount:
    @pytest.mark.parametrize("seed", [1, 7])
    def test_matches_brute_force_on_random_graph(self, spark, seed):
        rng = random.Random(seed)
        edges = [
            (rng.randrange(25), rng.randrange(25)) for _ in range(150)
        ]
        df = spark.createDataFrame([Row(a=a, b=b) for a, b in edges])
        row = triangle_count(df).collect()[0]
        n, m, t = _ref_triangles(edges)
        assert (row["n_nodes"], row["n_edges"], row["n_triangles"]) == (n, m, t)
        # degree-ordered wedge count never exceeds the naive sum deg^2
        assert row["n_wedges"] >= row["n_triangles"]

    def test_skew_hub_generates_no_wedges_at_itself(self, spark):
        # star graph: hub 0 connected to 1..40, no triangles; the oriented
        # plan points every edge INTO the hub, so wedges = 0 (the naive
        # per-node enumeration would build 40*39/2 at the hub)
        df = spark.createDataFrame([Row(a=0, b=i) for i in range(1, 41)])
        row = triangle_count(df).collect()[0]
        assert row["n_triangles"] == 0
        assert row["n_wedges"] == 0


class TestGridDistanceJoin:
    def test_matches_brute_force(self, spark):
        rng = random.Random(3)
        left = [(i, rng.randrange(10**6), rng.randrange(10**6)) for i in range(80)]
        right = [(i, rng.randrange(10**6), rng.randrange(10**6)) for i in range(60)]
        ldf = spark.createDataFrame([Row(id=i, x=x, y=y) for i, x, y in left])
        rdf = spark.createDataFrame([Row(id=i, x=x, y=y) for i, x, y in right])
        r = 120_000
        got = {
            (row["left_id"], row["right_id"], row["dist2"])
            for row in grid_distance_join(ldf, rdf, radius_micro=r).collect()
        }
        want = {
            (li, ri, (lx - rx) ** 2 + (ly - ry) ** 2)
            for li, lx, ly in left
            for ri, rx, ry in right
            if (lx - rx) ** 2 + (ly - ry) ** 2 <= r * r
        }
        assert got == want
        assert len(want) > 0  # the test actually exercised matches

    def test_oversized_cell_still_sound(self, spark):
        ldf = spark.createDataFrame([Row(id=1, x=0, y=0)])
        rdf = spark.createDataFrame([Row(id=2, x=150, y=0)])
        got = grid_distance_join(
            ldf, rdf, radius_micro=200, cell_micro=1000
        ).collect()
        assert [(r["left_id"], r["right_id"], r["dist2"]) for r in got] == [
            (1, 2, 22500)
        ]

    def test_undersized_cell_rejected(self, spark):
        df = spark.createDataFrame([Row(id=1, x=0, y=0)])
        with pytest.raises(ValueError, match="would miss"):
            grid_distance_join(df, df, radius_micro=100, cell_micro=50)


def _lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


class TestEditdistSelfJoin:
    # adversarial vocabulary: both-bigrams-destroyed short substitution
    # (abc/axc), cross-length short pairs, 3/4 indel, identical-prefix
    # runs (supplier-name shape), and unrelated long words
    VOCAB = [
        "abc", "axc", "ab", "abcd", "a", "ax",
        "rose", "rosy", "nose", "rses",
        "supplier#001", "supplier#002", "supplier#102",
        "chocolate", "chocolates", "lavender",
    ]

    def test_matches_brute_force(self, spark):
        df = spark.createDataFrame([Row(w=w) for w in self.VOCAB])
        got = {
            (r["w1"], r["w2"], r["dist"])
            for r in editdist_self_join(df, "w", max_dist=1).collect()
        }
        want = {
            (a, b, _lev(a, b))
            for i, a in enumerate(self.VOCAB)
            for b in self.VOCAB[i + 1:]
            if _lev(a, b) <= 1
        }
        want = {(min(a, b), max(a, b), d) for a, b, d in want}
        assert got == want
        # the adversarial short pair must be present (proves the SHORT
        # block rescued what bigram blocking loses)
        assert ("abc", "axc", 1) in got

    def test_unproven_budget_rejected(self, spark):
        df = spark.createDataFrame([Row(w="a")])
        with pytest.raises(ValueError, match="max_dist=1"):
            editdist_self_join(df, "w", max_dist=2)


class TestRegisteredInvariants:
    def test_allocation_sums_exactly_to_order_cents(self, spark):
        out = WORKLOAD["alloc_largest_remainder"].fn(spark, SF)
        per_order = out.groupBy("l_orderkey").agg(
            F.sum("alloc_cents").alias("s")
        )
        cat_orders = spark.read.parquet(f"{SF}/orders.parquet")
        truth = cat_orders.filter(F.col("o_orderkey") % 10 == 0).select(
            F.col("o_orderkey").alias("l_orderkey"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        )
        j = per_order.join(truth, "l_orderkey")
        assert j.count() > 0
        assert j.filter(F.col("s") != F.col("cents")).count() == 0

    def test_cms_estimate_is_one_sided(self, spark):
        rows = WORKLOAD["sketch_cms_heavy_hitters"].fn(spark, SF).collect()
        assert len(rows) == 10
        assert all(r["est_n"] >= r["true_n"] for r in rows)

    def test_benford_expected_mass_accounts_for_total(self, spark):
        rows = WORKLOAD["dq_benford_audit"].fn(spark, SF).collect()
        n = sum(r["obs"] for r in rows)
        total_exp = sum(r["exp_milli"] for r in rows)
        # 9 floor divisions + 1e12-rounded constants: within 9 milli-units
        assert 0 <= n * 1000 - total_exp <= 9
        assert sum(r["dev_milli"] for r in rows) == n * 1000 - total_exp


class TestPassJoinEquivalence:
    def test_equals_bigram_blocking_on_adversarial_vocab(self, spark):
        import random

        from pyspark.sql import Row

        from adb_south_caucasus_etl_spark.operators.fuzzy import (
            editdist_self_join,
            editdist_self_join_passjoin,
        )

        vocab = list(TestEditdistSelfJoin.VOCAB) + ["x", "b"]
        df = spark.createDataFrame([Row(w=w) for w in vocab])
        a = {tuple(r) for r in editdist_self_join(df, "w").collect()}
        b = {tuple(r) for r in editdist_self_join_passjoin(df, "w").collect()}
        assert a == b
        # dense fuzz over a 2-letter alphabet maximizes 1-edit pairs and
        # boundary lengths (1..5)
        rng = random.Random(11)
        words = list(
            {
                "".join(rng.choice("ab") for _ in range(rng.randint(1, 5)))
                for _ in range(80)
            }
        )
        df2 = spark.createDataFrame([Row(w=w) for w in words])
        a2 = {tuple(r) for r in editdist_self_join(df2, "w").collect()}
        b2 = {tuple(r) for r in editdist_self_join_passjoin(df2, "w").collect()}
        assert a2 == b2 and len(a2) > 0
