"""Text-analysis column expressions (SURVEY §2.H L4) — all JVM built-ins.

Every function here returns a Column built from ``pyspark.sql.functions``
only (no Python UDFs), so they run inside whole-stage codegen and scale to
100 TB document tables. Each has an ANSI-SQL equivalent used by the DuckDB
oracles, documented inline.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny per-language stopword sets for the n-gram/stopword lang-id heuristic.
#: Deliberately small + deterministic; real deployments swap in fastText etc.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "it", "that"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es"),
    "de": ("der", "die", "und", "das", "ist", "von", "ein", "zu"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "est"),
}

#: BPE-ish token pattern: alpha runs, digit runs, or single punctuation.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(col: str | Column) -> Column:
    """Whitespace tokens. SQL: ``string_split_regex(trim(text), '\\s+')``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col: str | Column) -> Column:
    """Whitespace token count. SQL: ``len(string_split_regex(trim(x),'\\s+'))``."""
    return F.size(tokens(col))


def bpe_token_count(col: str | Column) -> Column:
    """Count of BPE-ish regex tokens (alpha runs / digit runs / punct).
    ``regexp_count`` — never materializes the match array.
    SQL: ``len(regexp_extract_all(x, pattern))``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_TOKEN_PATTERN))


def distinct_token_ratio(col: str | Column) -> Column:
    """|distinct tokens| / |tokens| — repetition signal for quality scoring.
    SQL: ``len(list_distinct(ts)) / len(ts)``."""
    t = tokens(col)
    return F.size(F.array_distinct(t)) / F.size(t)


def non_alpha_ratio(col: str | Column) -> Column:
    """Share of characters outside [a-z0-9 ] after lowercasing — punctuation/
    noise signal. SQL: ``1 - len(regexp_replace(lower(x),'[^a-z0-9 ]','','g'))/len(x)``."""
    c = F.col(col) if isinstance(col, str) else col
    bad = F.regexp_count(F.lower(c), F.lit("[^a-z0-9 ]"))
    return bad / F.length(c)


def quality_score(col: str | Column) -> Column:
    """Deterministic [0,1] quality heuristic: length saturation (40%),
    vocabulary diversity (40%), character cleanliness (20%). The exact
    formula is mirrored in SQL by the oracle queries."""
    return (
        0.4 * F.least(F.lit(1.0), token_count(col) / F.lit(100.0))
        + 0.4 * distinct_token_ratio(col)
        + 0.2 * (1 - non_alpha_ratio(col))
    )


def lang_scores(col: str | Column) -> dict[str, Column]:
    """Per-language stopword-hit counts over the token multiset."""
    t = tokens(col)
    out = {}
    for lang, words in LANG_STOPWORDS.items():
        out[lang] = F.size(
            F.filter(t, lambda x: x.isin(*words))  # noqa: B023
        )
    return out


def lang_id_from_tokens(tokens_col: Column) -> Column:
    """``lang_id`` over a pre-tokenized array column — use this when the
    token array is already materialized (see ``text_profile`` docstring on
    why re-embedding the tokenizer per metric is slow)."""
    scores = {
        lang: F.size(
            F.filter(tokens_col, lambda x: x.isin(*words))  # noqa: B023
        )
        for lang, words in LANG_STOPWORDS.items()
    }
    return _argmax_lang(scores)


def _argmax_lang(scores: dict[str, Column]) -> Column:
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in sorted(LANG_STOPWORDS):  # later langs win only on strict >
        cond = scores[lang] > best_score
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(cond, scores[lang]).otherwise(best_score)
    return best_lang


def lang_id(col: str | Column) -> Column:
    """Argmax language by stopword hits; deterministic tie-break by language
    code order; 'und' (undetermined) when no stopword hits at all.
    Embeds one tokenizer per language — prefer ``lang_id_from_tokens`` over
    a materialized token column in hot paths."""
    return _argmax_lang(lang_scores(col))


def text_profile(df, text_col: str = "text", out_prefix: str = ""):
    """Append token/quality profile columns in a STAGED projection chain:
    ``n_tok``, ``n_distinct_tok``, ``bpe_tok``, ``quality``.

    Staging matters: the Column-functions above each embed their own
    ``split(trim(text))`` subtree, so selecting several of them in ONE
    projection evaluates the tokenizer once per metric (no common
    subexpression elimination across a hand-built expression tree —
    measured ~4× slower at bench scale). Materializing the token array as
    a named column in a first select and deriving every metric from it in
    follow-up selects keeps exactly one ``split`` in the physical plan:
    Catalyst's CollapseProject declines to inline an expensive alias that
    is referenced more than once.
    """
    p = out_prefix
    ts, ntok, ndis = f"__{p}ts", f"{p}n_tok", f"{p}n_distinct_tok"
    bad, ln = f"__{p}bad", f"__{p}len"
    c = F.col(text_col)
    staged = df.withColumns(
        {
            ts: tokens(c),
            f"{p}bpe_tok": F.regexp_count(c, F.lit(BPE_TOKEN_PATTERN)),
            bad: F.regexp_count(F.lower(c), F.lit("[^a-z0-9 ]")),
            ln: F.length(c),
        }
    ).withColumns(
        {
            ntok: F.size(F.col(ts)),
            ndis: F.size(F.array_distinct(F.col(ts))),
        }
    )
    quality = (
        0.4 * F.least(F.lit(1.0), F.col(ntok) / F.lit(100.0))
        + 0.4 * (F.col(ndis) / F.col(ntok))
        + 0.2 * (1 - F.col(bad) / F.col(ln))
    )
    return staged.withColumn(f"{p}quality", quality).drop(ts, bad, ln)


def fingerprint(col: str | Column) -> Column:
    """Canonical document fingerprint: md5 of the lowercased,
    whitespace-collapsed text. SQL: ``md5(regexp_replace(lower(trim(x)),
    '\\s+', ' ', 'g'))``."""
    c = F.col(col) if isinstance(col, str) else col
    canonical = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return F.md5(canonical)


def word_shingles(col: str | Column, n: int = 3) -> Column:
    """Distinct n-word shingles (the unit for Jaccard/MinHash dedup) as an
    array column. Built from sequence+transform — JVM-side, no UDF.

    This is the readable per-row form; dedup operators use the exploded,
    lambda-free pipeline in ``operators.dedup.exploded_shingles`` instead
    (same set semantics per document) — higher-order-function lambdas here
    defeat codegen subexpression elimination and exchange-reuse
    canonicalization, which costs ~3× at scale (see SCALE.md).

    Shingles are assembled by ``n-1`` chained ``zip_with`` folds over
    shifted slices instead of a per-index ``slice`` inside a transform:
    the per-shingle slice allocated a fresh array per element and was
    the whole cost of a shingle census (measured r15 at sf0.1: 2.5 s ->
    0.3 s for the n=2 projection over documents; per-index ``get`` was
    WORSE than slice at 5.3 s). Output is identical, incl. the
    short-document fold: a shift past the array end zip-pads with NULL
    and ``concat_ws`` skips it, exactly as the short slice did."""
    t = tokens(col)
    m = F.greatest(F.size(t) - (n - 1), F.lit(1))
    acc = F.slice(t, 1, m)
    for j in range(1, n):
        acc = F.zip_with(
            acc,
            F.slice(t, 1 + j, m),
            lambda x, y: F.concat_ws(" ", x, y),
        )
    return F.array_distinct(acc)


#: PII-ish patterns kept deliberately simple so the SAME regex compiles
#: identically under Java (Spark) and RE2-style (DuckDB/duckdb_re2)
#: engines: no lookarounds, no backrefs, no \b-adjacent quantifier tricks.
PII_PATTERNS: dict[str, str] = {
    "email": r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}",
    "phone": r"\d{3}-\d{3}-\d{4}",
}


def pii_counts(col: str | Column) -> dict[str, Column]:
    """Per-kind PII match counts (``regexp_count`` — JVM codegen, no UDF).
    SQL mirror: ``len(regexp_extract_all(text, pattern))``."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        kind: F.regexp_count(c, F.lit(pat)).alias(f"n_{kind}")
        for kind, pat in PII_PATTERNS.items()
    }


def pii_redact(col: str | Column, token: str = "[PII]") -> Column:
    """Replace every PII match with ``token`` (``regexp_replace`` replaces
    globally in Spark; the SQL mirror needs the ``'g'`` flag). Chained in
    deterministic sorted-kind order so both engines redact identically
    even when patterns could overlap."""
    c = F.col(col) if isinstance(col, str) else col
    for kind in sorted(PII_PATTERNS):
        c = F.regexp_replace(c, PII_PATTERNS[kind], token)
    return c
