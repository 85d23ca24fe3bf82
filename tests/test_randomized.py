"""Seeded-random brute-force comparisons for the intricate custom
operators: the Spark implementation must agree with an obviously-correct
Python reference on arbitrary inputs, not just the curated fixtures.
Deterministic seeds — no flaky CI."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from adb_south_caucasus_etl_spark.operators.asof import asof_join
from adb_south_caucasus_etl_spark.operators.dedup import (
    connected_components,
    connected_components_star,
)


def _brute_asof(left, right, direction):
    out = {}
    for k, lts, lid in left:
        best = None
        for rk, rts, pay in right:
            if rk != k:
                continue
            ok = rts <= lts if direction == "backward" else rts >= lts
            if not ok:
                continue
            if best is None:
                best = (rts, pay)
            elif direction == "backward" and rts > best[0]:
                best = (rts, pay)
            elif direction == "forward" and rts < best[0]:
                best = (rts, pay)
        out[lid] = best[1] if best else None
    return out


def test_asof_matches_bruteforce_random(spark):
    rng = random.Random(1234)
    for direction in ("backward", "forward"):
        for trial in range(3):
            left = [
                (rng.randint(0, 3), rng.randint(0, 1000) * 1_000_000, i)
                for i in range(40)
            ]
            # unique (key, ts) on the right so the match is well-defined
            seen = set()
            right = []
            for j in range(30):
                k, ts = rng.randint(0, 3), rng.randint(0, 1000) * 1_000_000
                if (k, ts) in seen:
                    continue
                seen.add((k, ts))
                right.append((k, ts, f"p{j}"))
            ldf = spark.createDataFrame(
                left, "k long, ts long, lid long"
            ).withColumn("ts", F.timestamp_micros("ts"))
            rdf = spark.createDataFrame(
                right, "k long, ts long, payload string"
            ).withColumn("ts", F.timestamp_micros("ts"))
            got = {
                r["lid"]: r["payload"]
                for r in asof_join(
                    ldf, rdf, on="k", left_ts="ts", direction=direction
                ).collect()
            }
            want = _brute_asof(left, right, direction)
            assert got == want, (direction, trial)


def _brute_components(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node id in component
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    out = {}
    for root, members in comp.items():
        label = min(members)
        for m in members:
            out[m] = label
    return out


def test_connected_components_match_bruteforce_random(spark):
    rng = random.Random(99)
    for trial in range(3):
        nodes = list(range(30))
        edges = [
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(25)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        want = _brute_components(edges, {n for e in edges for n in e})
        edf = spark.createDataFrame(edges, "id_a long, id_b long")
        for fn in (connected_components, connected_components_star):
            got = {
                r["node"]: r["label"] for r in fn(edf, "id_a", "id_b").collect()
            }
            assert got == want, (fn.__name__, trial)


def _brute_jaccard_pairs(docs, n, threshold):
    def shingles(text):
        toks = text.split()
        if len(toks) < n:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    sets = {i: shingles(t) for i, t in docs}
    out = {}
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            j = inter / (len(sets[a]) + len(sets[b]) - inter)
            if round(j, 4) >= threshold:
                out[(a, b)] = round(j, 4)
    return out


def test_jaccard_pairs_match_bruteforce_random(spark):
    from adb_south_caucasus_etl_spark.operators.dedup import jaccard_pairs

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]  # small vocab → real overlaps
    for trial in range(3):
        docs = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 15))))
            for i in range(25)
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in jaccard_pairs(
                df, "doc_id", "text", n=3, threshold=0.2
            ).collect()
        }
        want = _brute_jaccard_pairs(docs, 3, 0.2)
        assert got == want, (trial, set(got) ^ set(want))


def _brute_span_dedup(docs: list[tuple[int, str]], span: int):
    """Obviously-correct reimplementation: global first-occurrence by
    (doc_id, span_idx) over tumbling spans, reassemble survivors."""
    seen: set[str] = set()
    out = {}
    for doc_id, text in sorted(docs):
        toks = text.split()
        spans = [
            " ".join(toks[i : i + span]) for i in range(0, len(toks), span)
        ]
        kept = []
        for s in spans:
            if s in seen:
                continue
            seen.add(s)
            kept.append(s)
        if kept:
            out[doc_id] = (" ".join(kept), len(spans) - len(kept))
    return out


def test_span_dedup_matches_bruteforce_random(spark):
    from adb_south_caucasus_etl_spark.operators.dedup import span_corpus_dedup

    rng = random.Random(77)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab → many span collisions
    for trial in range(3):
        docs = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30))))
            for i in range(25)
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["clean_text"], r["n_spans_removed"])
            for r in span_corpus_dedup(df, "doc_id", "text", 4).collect()
        }
        assert got == _brute_span_dedup(docs, 4), f"trial {trial}"


def test_weighted_sample_matches_bruteforce_random(spark):
    """A-ES keys recomputed in pure Python (hashlib md5 + math.log) must
    select the identical k rows per group."""
    import hashlib
    import math

    from adb_south_caucasus_etl_spark.operators.curation import (
        weighted_sample_per_group,
    )

    rng = random.Random(99)
    rows = [
        (i, f"g{rng.randint(0, 2)}", rng.randint(1, 500))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "id long, grp string, wt int")
    got = {
        (r["grp"], r["id"])
        for r in weighted_sample_per_group(df, ["grp"], "wt", "id", 4).collect()
    }

    def key(i, w):
        u32 = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        return math.log((u32 + 1) / 4294967296.0) / w

    want = set()
    for g in {r[1] for r in rows}:
        members = sorted(
            (r for r in rows if r[1] == g),
            key=lambda r: (-key(r[0], r[2]), r[0]),
        )
        want |= {(g, r[0]) for r in members[:4]}
    assert got == want
