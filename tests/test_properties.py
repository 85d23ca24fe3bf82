"""Hypothesis property tests for the pure-Python kernels: invariants must
hold on arbitrary inputs, not curated fixtures. These run without a Spark
session (fast per-example), complementing tests/test_randomized.py's
seeded Spark-vs-brute-force comparisons.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from adb_south_caucasus_etl_spark.functions.chunking import ChunkWords
from adb_south_caucasus_etl_spark.functions.normalize import normalize_colname


class TestNormalizeColname:
    @given(st.text(max_size=50))
    def test_idempotent(self, name):
        once = normalize_colname(name)
        assert normalize_colname(once) == once

    @given(st.text(max_size=50))
    def test_reference_model(self, name):
        # exact reference semantics (oec.py:24,64): ONLY space→underscore
        # and lowercasing — no trimming, collapsing, or de-punctuation
        assert normalize_colname(name) == name.replace(" ", "_").lower()

    @given(st.text(max_size=50))
    def test_no_spaces_out(self, name):
        assert " " not in normalize_colname(name)


# ChunkWords is wrapped by @udtf; the undecorated class is reachable via
# .func — property-test the pure generator itself.
_CHUNKER = ChunkWords.func()

words = st.lists(
    st.text(
        alphabet=st.characters(whitelist_categories=["Ll", "Lu", "Nd"]),
        min_size=1,
        max_size=8,
    ),
    min_size=0,
    max_size=60,
)


class TestChunkWordsInvariants:
    @given(words, st.integers(2, 16), st.integers(1, 16))
    @settings(max_examples=200)
    def test_chunk_invariants(self, toks, size, stride):
        stride = min(stride, size)  # stride > size would skip tokens
        text = " ".join(toks)
        chunks = list(_CHUNKER.eval(text, size, stride))
        if not toks:
            assert chunks == []
            return
        # indices are contiguous from 0; starts advance by stride
        assert [c[0] for c in chunks] == list(range(len(chunks)))
        # n_tokens is the real token count of each chunk and ≤ size
        for idx, chunk, n in chunks:
            got = chunk.split() if chunk else []
            assert len(got) == n <= size
            assert got == toks[idx * stride : idx * stride + size]
        # coverage: every token position lands in at least one chunk
        covered = set()
        for idx, _chunk, n in chunks:
            covered.update(range(idx * stride, idx * stride + n))
        assert covered == set(range(len(toks)))

    @given(words, st.integers(2, 16))
    @settings(max_examples=100)
    def test_non_overlapping_stride_reconstructs_document(self, toks, size):
        text = " ".join(toks)
        chunks = list(_CHUNKER.eval(text, size, size))
        assert " ".join(c[1] for c in chunks).split() == toks
