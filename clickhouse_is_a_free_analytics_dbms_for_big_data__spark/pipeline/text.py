"""Text analysis for training-data pipelines — pure Column expressions
(JVM-side, codegen-eligible; no Python UDFs).

Each builder returns a Column usable on the ``documents`` table at any
scale: per-row work is O(tokens), no shuffle, fully pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions._util import col_of, let_

__all__ = [
    "tokens", "token_count", "bpe_ish_token_count", "char_count",
    "mean_token_len", "stopword_ratio", "punct_ratio", "digit_ratio",
    "quality_score", "language_scores", "language_id",
    "fingerprint_md5", "rolling_fingerprint", "shingles",
    "tokens_sql", "shingles_sql",
]

# Tiny per-language stopword lists (top function words) for the n-gram
# language heuristic.  Public knowledge; extend per corpus.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "den", "mit", "von"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "du", "est", "pour"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "es", "por"],
}


def tokens(text) -> Column:
    """Whitespace tokenization (lowered)."""
    return F.filter(
        F.split(F.lower(col_of(text)), "\\s+"), lambda t: F.length(t) > 0
    )


def tokens_sql(text_sql: str) -> str:
    """SQL-fragment twin of :func:`tokens` for construction-hot paths:
    a dedup query built from nested Column lambdas costs hundreds of
    py4j round-trips (~0.5 s of driver time per build, measured r4);
    one ``F.expr`` string is a single round-trip for the same plan."""
    return (
        f"filter(split(lower({text_sql}), '\\\\s+'), t -> length(t) > 0)"
    )


def shingles_sql(text_sql: str, k: int = 5) -> str:
    """SQL-fragment twin of :func:`shingles` (token array let-bound via
    the single-element transform trick, exactly like let_)."""
    return (
        f"get(transform(array({tokens_sql(text_sql)}), "
        f"tk -> transform(sequence(1, greatest(size(tk) - {k} + 1, 1)), "
        f"i -> array_join(slice(tk, i, {k}), ' '))), 0)"
    )


def token_count(text) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text) -> Column:
    """BPE-style subword count estimate: word-piece regex segments
    (runs of letters, digits, or single punctuation) with long words
    contributing ceil(len/4) pieces — the standard ~4-chars-per-token
    rule of thumb, computed exactly from the segment lengths."""
    segs = F.regexp_extract_all(
        F.lower(col_of(text)), F.lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), 0
    )
    return F.aggregate(
        segs,
        F.lit(0),
        lambda acc, s: acc + F.ceil(F.length(s) / 4.0).cast("int"),
    )


def char_count(text) -> Column:
    return F.char_length(col_of(text))


def mean_token_len(text) -> Column:
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t))
    return total.cast("double") / F.greatest(F.size(toks), F.lit(1))


def stopword_ratio(text, lang: str = "en") -> Column:
    toks = tokens(text)
    sw = STOPWORDS[lang]
    n_sw = F.size(F.filter(toks, lambda t: t.isin(*sw)))
    return n_sw.cast("double") / F.greatest(F.size(toks), F.lit(1))


def punct_ratio(text) -> Column:
    t = col_of(text)
    n_punct = F.length(t) - F.length(F.regexp_replace(t, "[^\\w\\s]", ""))
    return n_punct.cast("double") / F.greatest(F.length(t), F.lit(1))


def digit_ratio(text) -> Column:
    t = col_of(text)
    n_digit = F.length(t) - F.length(F.regexp_replace(t, "[0-9]", ""))
    return n_digit.cast("double") / F.greatest(F.length(t), F.lit(1))


def _sw_count(tk: Column, lang: str) -> Column:
    """Stopword hits in an already-tokenized array."""
    sw = STOPWORDS[lang]
    return F.size(F.filter(tk, lambda t: t.isin(*sw)))


def quality_score(text, lang: str = "en") -> Column:
    """Heuristic document quality in [0,1]: rewards reasonable length,
    function-word presence, and penalizes punctuation/digit noise —
    the classic pretraining-filter recipe (C4-style rules).

    The token array is let-bound: tokenization (split + filter, an
    interpreted higher-order chain) runs ONCE per row instead of once
    per derived ratio (r11; values identical)."""

    def score(tk: Column) -> Column:
        n = F.greatest(F.size(tk), F.lit(1))
        len_score = F.least(F.size(tk).cast("double") / 50.0, F.lit(1.0))
        sw_ratio = _sw_count(tk, lang).cast("double") / n
        sw_score = F.least(sw_ratio * 5.0, F.lit(1.0))
        noise = F.least(
            punct_ratio(text) * 4.0 + digit_ratio(text) * 2.0, F.lit(1.0)
        )
        return F.round(
            len_score * 0.4 + sw_score * 0.4 + (F.lit(1.0) - noise) * 0.2, 6
        )

    return let_(tokens(text), score)


def language_scores(text) -> dict[str, Column]:
    """Per-language stopword-hit ratios."""
    return {lang: stopword_ratio(text, lang) for lang in STOPWORDS}


def language_id(text, threshold: float = 0.02) -> Column:
    """argmax language by stopword ratio, 'unknown' below threshold.

    Tokenizes ONCE (let-bound) and scores all languages from the same
    array — the per-language ratio form re-ran the interpreted
    split+filter chain once per language (r11; values identical)."""

    def best_of(tk: Column) -> Column:
        n = F.greatest(F.size(tk), F.lit(1))
        pairs = [
            F.struct(
                (_sw_count(tk, lang).cast("double") / n).alias("s"),
                F.lit(lang).alias("l"),
            )
            for lang in STOPWORDS
        ]
        best = F.array_max(F.array(*pairs))
        return F.when(
            best.getField("s") >= threshold, best.getField("l")
        ).otherwise(F.lit("unknown"))

    return let_(tokens(text), best_of)


def fingerprint_md5(text) -> Column:
    """Content fingerprint: md5 of the normalized text (lowercased,
    whitespace collapsed) — exact-dup key robust to spacing."""
    norm = F.trim(F.regexp_replace(F.lower(col_of(text)), "\\s+", " "))
    return F.md5(norm.cast("binary"))


def rolling_fingerprint(text, window: int = 8) -> Column:
    """Winnowing-style fingerprint: min hash over rolling token windows
    — robust to local edits (document fingerprinting).  The token array
    is hashed once (let-bound), and each window's hash is the xxhash64
    CHAIN over its ``window`` token hashes — materializing a joined
    window string per position was ~3x the cost of hashing it (r12,
    guide §1.2; same device as the minhash shingle hash).  Raw values
    changed with the r12 hash form; every documented property
    (whitespace/affix invariance, local-edit robustness, dup collapse)
    is value-independent and still asserted by the oracle and
    tests/test_pipeline.py.  Tokens cannot contain whitespace, so
    window-string equality ⟺ token-tuple equality ⟺ chain equality
    absent 64-bit collisions."""
    hashed = let_(tokens(text), lambda tk: F.transform(tk, lambda t: F.xxhash64(t)))
    return let_(
        hashed,
        lambda th: F.array_min(
            F.transform(
                F.sequence(
                    F.lit(1), F.greatest(F.size(th) - window + 1, F.lit(1))
                ),
                lambda i: F.xxhash64(
                    *[F.element_at(th, i + j) for j in range(window)]
                ),
            )
        ),
    )


def shingles(text, k: int = 5) -> Column:
    """k-token shingles as strings (dedup unit); token array let-bound
    (built once, not once per shingle)."""
    return let_(
        tokens(text),
        lambda tk: F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(tk) - k + 1, F.lit(1))),
            lambda i: F.array_join(F.slice(tk, i, k), " "),
        ),
    )
