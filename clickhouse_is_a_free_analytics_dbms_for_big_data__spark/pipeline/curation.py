"""Corpus-curation operators for LLM training-data pipelines:
deterministic holdout splits, benchmark-contamination detection,
PII scrubbing, intra-document repetition scoring, and sequence
packing.

Everything here is pure JVM Column expressions (no Python UDFs) so
the plans stay inside whole-stage codegen; every op is a single scan
or a single shuffle, and each has a DuckDB-expressible twin so the
driver's oracle can value-check it (queries/pipeline_q.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from . import text as TXT


# --------------------------------------------------------------- split

def hash_bucket(key: Column, buckets: int = 100) -> Column:
    """Deterministic, engine-portable bucket in [0, buckets): the
    first 4 hex digits of md5(key) as an integer, mod buckets.

    md5 over the utf-8 key text is identical in every engine (unlike
    xxhash64/cityHash64 whose seeds differ), so a row lands in the
    same split everywhere — the property a train/val/test split must
    have to be reproducible across the fleet and the eval stack.
    16 bits of hash → bucket skew < 2^-9 for buckets=100.
    """
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 4), 16, 10)
        .cast("int")
        % buckets
    )


def train_val_test(
    key: Column, train_pct: int = 90, val_pct: int = 5
) -> Column:
    """'train' / 'val' / 'test' assignment from :func:`hash_bucket`."""
    b = hash_bucket(key)
    return (
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )


# ------------------------------------------------- contamination check

def ngrams(text, n: int = 8) -> Column:
    """Token n-grams (space-joined) of the whitespace tokenization."""
    return _ngrams_of_tokens(TXT.tokens(text), n)


def _ngrams_of_tokens(tk: Column, n: int) -> Column:
    # let-bind the token array through the single-element-array trick
    # so it is computed once, not once per n-gram
    return F.get(
        F.transform(
            F.array(tk),
            lambda t: F.transform(
                # min 1 (not 0): sequence(1,0) would be DESCENDING in
                # Spark; matches the shingles_sql convention — a doc
                # shorter than n yields one truncated gram
                F.sequence(
                    F.lit(1), F.greatest(F.size(t) - (n - 1), F.lit(1))
                ),
                lambda i: F.array_join(F.slice(t, i, n), " "),
            ),
        ),
        0,
    )


def contamination_hits(
    corpus: DataFrame,
    evalset: DataFrame,
    id_col: str,
    eval_id_col: str,
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """(corpus id, eval id, n shared token n-grams) for every corpus
    document sharing at least one n-gram with an eval document — the
    standard train/test contamination sweep (eval benchmarks leaking
    into pre-training data).

    Shape at 100 TB: explode both sides to (ngram, id), one equi-join
    on the n-gram, one partial-aggregated groupBy — no cross product.
    The eval side is tiny (benchmarks are thousands of docs), so AQE
    broadcasts it; in production the join key would be a 64-bit hash
    of the n-gram to cut shuffle width (exact strings kept here so
    the oracle can reproduce the join byte-for-byte).
    """
    c = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.array_distinct(_ngrams_of_tokens(TXT.tokens(F.col(text_col)), n))
        ).alias("g"),
    )
    e = evalset.select(
        F.col(eval_id_col).alias("eval_id"),
        F.explode(
            F.array_distinct(_ngrams_of_tokens(TXT.tokens(F.col(text_col)), n))
        ).alias("g"),
    )
    return (
        c.join(e, "g")
        .groupBy("doc_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
    )


# --------------------------------------------------------- PII scrub

# Deliberately simple character classes: Java regex and RE2/DuckDB
# agree on them byte-for-byte (no lookaround, no \b).
EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
PHONE_RE = "\\+[0-9]{7,15}"


def pii_counts(text: Column) -> tuple[Column, Column]:
    """(#emails, #phone-like) occurrences in the text."""
    return (
        F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), 0)),
        F.size(F.regexp_extract_all(text, F.lit(PHONE_RE), 0)),
    )


def scrub_pii(text: Column) -> Column:
    """Mask emails then phone numbers with fixed placeholder tokens
    (single pass each; order matters — emails can contain digits)."""
    return F.regexp_replace(
        F.regexp_replace(text, EMAIL_RE, "<EMAIL>"),
        PHONE_RE,
        "<PHONE>",
    )


# ------------------------------------------------- repetition scoring

def repetition_ratio(text, n: int = 2) -> Column:
    """Fraction of duplicate token n-grams in the document (Gopher-
    style repetition signal: 1 - distinct/total, 0 for short docs).
    High values flag boilerplate/spam for the quality filter."""
    grams = _ngrams_of_tokens(TXT.tokens(text), n)
    return F.get(
        F.transform(
            F.array(grams),
            lambda g: F.when(F.size(g) <= 0, F.lit(0.0)).otherwise(
                1.0 - F.size(F.array_distinct(g)) / F.size(g)
            ),
        ),
        0,
    )


# --------------------------------------------------- sequence packing

def pack_sequences(
    df: DataFrame,
    part_col: str,
    order_col: str,
    tokens_col: Column,
    context: int = 2048,
) -> DataFrame:
    """Greedy sequential packing of documents into fixed-size training
    contexts: documents are laid out in (part_col, order_col) order
    and bin k holds token positions [k*context, (k+1)*context) — the
    streaming concat-and-chunk layout used to build LLM pre-training
    batches.  Emits (part, bin, docs, bin_tokens).

    The running sum is windowed PER PARTITION COLUMN (language here,
    date-shard in production), so the cumulative-sum window
    parallelizes across partitions instead of serializing the corpus
    through one global window — the difference between a single-task
    stage and a thousand-way one at 100 TB.
    """
    w = (
        Window.partitionBy("part")
        .orderBy("_ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = tokens_col.cast("long")
    return (
        df.select(
            F.col(part_col).alias("part"),
            F.col(order_col).alias("_ord"),
            toks.alias("_tk"),
        )
        .withColumn("_cum", F.sum("_tk").over(w))
        .withColumn(
            "bin", F.floor((F.col("_cum") - F.col("_tk")) / context)
        )
        .groupBy("part", "bin")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("_tk").alias("bin_tokens"),
        )
    )
