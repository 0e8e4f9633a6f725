"""Deduplication for training-data pipelines.

Every variant is banded/bucketed so candidate generation is an
equi-join — the only O(n^2) work happens *inside* buckets, which is the
property that keeps these runnable at 100 TB (the same reason the
reference shards GROUP BY by key hash).

- exact:        hash-groupBy on a content fingerprint, keep min id
- MinHash+LSH:  shingle -> n minhashes -> b bands -> bucket equi-join
- SimHash:      64-bit sign-vector hash, banded by 16-bit chunks,
                verified by hamming distance
- n-gram Jaccard: exact verify step (array_intersect/union)
- embedding:    random-hyperplane LSH buckets + cosine verify
"""

from __future__ import annotations

import random
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import shingles, shingles_sql, tokens, tokens_sql

__all__ = [
    "exact_dedup", "minhash_signature", "minhash_dedup_pairs",
    "jaccard", "ngram_jaccard_pairs", "simhash", "simhash_dedup_pairs",
    "embedding_neardup_pairs", "dedup_keep_representative",
    "release_dedup_caches",
]


from ..functions._util import let_ as _let

# Cached intermediates (banded-size annotations, verify-token frames)
# from the MOST RECENT dedup call per kind.  A long-lived session
# running dedup repeatedly must not accumulate cached blocks until LRU
# eviction: each new call evicts the previous call's caches, and
# release_dedup_caches() lets callers drop them explicitly once the
# result is materialized.  An unpersisted frame that a still-held
# result DataFrame later re-executes simply recomputes — the cache is
# a per-call optimization, never a correctness dependency.
_LIVE_CACHES: list[DataFrame] = []


def _cache_tracked(df: DataFrame) -> DataFrame:
    return _LIVE_CACHES.append(df.cache()) or df


def release_dedup_caches() -> None:
    """Unpersist every cached intermediate from prior dedup calls."""
    while _LIVE_CACHES:
        _LIVE_CACHES.pop().unpersist()


def _spread(df: DataFrame, key: str) -> DataFrame:
    """Hash-repartition to full parallelism before a compute-heavy
    per-row expression — but ONLY when the input arrives with fewer
    partitions than cores (a small local file lands in one scan
    partition, serializing the work).  A 100 TB input already has
    thousands of scan partitions, so this is a no-op there and the raw
    text never takes a gratuitous full shuffle."""
    n = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n, key)


def _banded_candidates(
    banded: DataFrame,
    keys: Sequence[str],
    carry: Sequence[str] = (),
    max_bucket: int = 256,
) -> DataFrame:
    """Candidate pairs from same-bucket membership, skew-bounded.

    Buckets with <= ``max_bucket`` members take the all-pairs self-join
    (O(n^2) inside the bucket).  Oversized buckets — the mass-duplicated
    boilerplate case that is the norm in web corpora — would blow up
    quadratically (10M copies = one bucket = 5*10^13 pairs), so they
    switch to a linear *star*: every member pairs with the bucket's
    min-id representative.  For exact/near-identical clusters (what a
    giant bucket is) the star loses nothing after transitive closure via
    dedup_keep_representative; no candidates are silently dropped —
    the cap only linearizes, it never truncates membership.

    ``carry`` columns ride along as <name>_a / <name>_b for the verify
    step.  Returns distinct (id_a < id_b [, carries]).

    Shuffle budget: ONE hash shuffle on the bucket keys.  A window pass
    annotates every member with (bucket size, min-id representative)
    and the annotated frame is CACHED — narrow longs plus carries —
    so the expensive upstream expressions (minhash signatures, simhash
    votes) are computed exactly once, on the cold fill.  Small buckets
    expand all-pairs via a self-join of the cached frame: both sides
    are already clustered on the bucket keys (no further exchange at
    scale) and AQE broadcast-converts one side at small scale.  Big
    buckets never self-join: their star pairs project straight off the
    windowed rep — linear, skew-safe for arbitrarily large buckets.
    [r4 re-measurement at sf0.1: the former all-window shape
    (collect_list + array expansion downstream of the window) cost
    ~2.5x more wall-clock — window operators block AQE's broadcast
    conversion and added two extra query stages per run.]
    """
    # Built from SQL-fragment strings (guide §7.3): the Column form of
    # this helper cost ~350 py4j round trips per build — re-paid by
    # every bench run that clears the plan memo (r12; plan verified
    # identical, expression-id-normalized).
    keys = list(keys)
    part = ", ".join(f"`{k}`" for k in keys)
    rep_fields = ", ".join(f"`{c}`" for c in ("id", *carry))
    sized = _cache_tracked(
        banded.selectExpr(
            "*",
            f"count(1) OVER (PARTITION BY {part}) AS __n",
            f"min(struct({rep_fields})) OVER (PARTITION BY {part}) AS __rep",
        )
    )

    # small: all-pairs self-join within the bucket (O(n^2) bounded by
    # max_bucket); both sides read the cached annotated frame
    small = sized.filter(F.col("__n") <= max_bucket)
    l, r = small.alias("l"), small.alias("r")
    on = " AND ".join(
        ["l.`id` < r.`id`", *[f"l.`{k}` = r.`{k}`" for k in keys]]
    )
    sel_small = ["l.`id` AS id_a", "r.`id` AS id_b"]
    for c in carry:
        sel_small += [f"l.`{c}` AS {c}_a", f"r.`{c}` AS {c}_b"]
    pairs_small = l.join(r, F.expr(on)).selectExpr(*sel_small)

    # star path: every member pairs with the windowed representative —
    # no join, no member array, skew-safe for arbitrarily large buckets
    sel_big = ["__rep.`id` AS id_a", "`id` AS id_b"]
    for c in carry:
        sel_big += [f"__rep.`{c}` AS {c}_a", f"`{c}` AS {c}_b"]
    pairs_big = sized.filter(
        f"__n > {max_bucket} AND `id` != __rep.`id`"
    ).selectExpr(*sel_big)
    return pairs_small.unionByName(pairs_big).dropDuplicates(["id_a", "id_b"])


# --- exact ------------------------------------------------------------------


def exact_dedup(df: DataFrame, key: Column, id_col: str) -> DataFrame:
    """Keep one row (min id) per content key.

    One window over the fingerprint = ONE full-row shuffle; the previous
    groupBy+join-back shape shuffled the full rows twice (4× slower
    measured at sf0.1).  Skewed fingerprints (mass-duplicated docs)
    hash-partition identically either way.
    """
    w_key = "__dedup_key"
    w = Window.partitionBy(w_key).orderBy(id_col)
    return (
        df.withColumn(w_key, key)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", w_key)
    )


# --- MinHash + LSH ----------------------------------------------------------


def minhash_signature(text, n_hashes: int = 32, k_shingle: int = 5) -> Column:
    """n-permutation MinHash signature of the k-shingle set.

    Shingle strings are hashed ONCE (xxhash64); the n permutations are
    xxhash64 remixes of (base hash, seed) — long-only work, no string
    re-hashing, and overflow-free (safe under ANSI sessions).  ``_let``
    pins the hashed-shingle array so it is not re-evaluated per
    permutation.
    """
    sh = shingles(text, k_shingle)
    base_hashes = _let(sh, lambda s_arr: F.transform(s_arr, lambda s: F.xxhash64(s)))
    seeds = F.sequence(F.lit(0), F.lit(n_hashes - 1))
    return _let(
        base_hashes,
        lambda hs: F.transform(
            seeds,
            lambda i: F.array_min(
                F.transform(hs, lambda h: F.xxhash64(h, i))
            ),
        ),
    )


def _lsh_bands(sig: Column, bands: int, rows: int) -> Column:
    """Array of (band_index, band_hash) structs."""
    idx = F.sequence(F.lit(0), F.lit(bands - 1))
    return F.transform(
        idx,
        lambda b: F.struct(
            b.alias("band"),
            F.xxhash64(F.slice(sig, b * rows + 1, rows)).alias("bucket"),
        ),
    )


def _minhash_bands_sql(
    text_sql: str, n_hashes: int, bands: int, rows: int, k_shingle: int
) -> str:
    """One SQL fragment for shingles → signature → banded buckets.

    Same plan as minhash_signature + _lsh_bands, but built as a single
    ``F.expr`` parse instead of hundreds of py4j Column calls — the
    Column build cost ~0.5 s of driver time per query construction
    (measured r4), which dominated the warm runtime at bench scale.
    The signature array is let-bound so the per-band slice does not
    re-evaluate it.
    """
    sig = (
        f"get(transform(array(transform({shingles_sql(text_sql, k_shingle)}, "
        f"s -> xxhash64(s))), "
        f"hs -> transform(sequence(0, {n_hashes - 1}), "
        f"i -> array_min(transform(hs, h -> xxhash64(h, i))))), 0)"
    )
    return (
        f"get(transform(array({sig}), "
        f"sg -> transform(sequence(0, {bands - 1}), "
        f"b -> struct(b as band, "
        f"xxhash64(slice(sg, b * {rows} + 1, {rows})) as bucket))), 0)"
    )


def jaccard(tokens_a: Column, tokens_b: Column) -> Column:
    a = F.array_distinct(tokens_a)
    b = F.array_distinct(tokens_b)
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return inter.cast("double") / F.greatest(union, F.lit(1))


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 32,
    bands: int = 8,
    k_shingle: int = 5,
    threshold: float = 0.7,
    max_bucket: int = 256,
    verify: str = "tokens",
    verify_hash64: bool = False,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b) via MinHash LSH banding with
    exact-Jaccard verification.

    Plan shape: narrow (id, band, bucket) projection -> explode bands
    -> within-bucket self-join on longs only -> distinct candidate id
    pairs -> join token arrays back for the Jaccard verify.  Token
    arrays never ride through the banding shuffle and the O(bands)
    fan-out; no global cross join at any point.  Buckets larger than
    ``max_bucket`` (mass-duplicated docs) take the linear star path in
    _banded_candidates instead of the quadratic self-join.

    ``verify`` picks the exact-Jaccard granularity: "tokens" (unigram
    sets — looser, order-insensitive) or "shingles" (the same k-shingle
    sets the signatures are built from — consistent with the LSH and
    relationally replicable, so results are oracle-checkable).

    ``verify_hash64`` intersects xxhash64(element) longs instead of the
    raw strings — 8 bytes/element through the verify-join exchange
    instead of ~50-char shingles (the trick that paid off for the
    contamination sweep).  Jaccard is unchanged absent 64-bit hash
    collisions (probability ~|set|^2 / 2^64 per pair — negligible).
    """
    if verify not in ("tokens", "shingles"):
        raise ValueError(f"verify must be 'tokens' or 'shingles', got {verify!r}")
    release_dedup_caches()  # evict the previous call's cached blocks
    rows = n_hashes // bands
    text_sql = f"`{text_col}`"
    # Spread the hash-heavy projection across all cores: a small input
    # file arrives as one partition, which would serialize the compute.
    spread = _spread(df.select(id_col, text_col), id_col)
    if verify_hash64 and verify == "shingles":
        # ONE shingle pass: the xxhash64'd shingle sets feed BOTH the
        # signature/banding and the verify join from one cached frame
        # of LONG arrays.  (The string-array form of this cache was
        # measured and REJECTED at r9 — ~600 MB of shingle strings
        # cost more than recomputing; hashing first shrinks the cache
        # ~6x and flips the trade: 4.16 -> 3.62 s at 50k docs, r10
        # interleaved, pair set bit-identical.)  array_distinct is
        # min-invariant, so signatures match the two-pass form.
        #
        # r12: the shingle hash is xxhash64 over the FIVE TOKEN HASHES
        # (multi-arg chain), not over the joined shingle string —
        # building ~n_tokens 50-char strings per row (slice +
        # array_join, interpreted) was 3x the cost of hashing them
        # (guide §1.2 per-row allocation; 1.21 -> 0.42 s at 50k docs).
        # Hash VALUES change, so LSH bucket recall was re-verified:
        # pair set + jaccards bit-identical to the string form at
        # sf0.01 / sf0.1 / 50k-doc sf1, and the exact-Jaccard verify
        # keeps precision 1.0 regardless.  Distinct shingles map to
        # distinct hash tuples absent 64-bit collisions, so the verify
        # Jaccard over set cardinalities is unchanged (same argument
        # as verify_hash64 itself).
        th = f"transform({tokens_sql(text_sql)}, __t -> xxhash64(__t))"
        arg_ij = ", ".join(
            f"element_at(__th, __i + {j})" for j in range(k_shingle)
        )
        hs = _cache_tracked(
            spread.select(
                F.col(id_col).alias("id"),
                F.expr(
                    f"array_distinct(get(transform(array({th}), "
                    f"__th -> transform("
                    f"sequence(1, greatest(size(__th) - {k_shingle - 1}, 1)), "
                    f"__i -> xxhash64({arg_ij}))), 0))"
                ).alias("hs"),
            )
        )
        sig = (
            f"get(transform(array(hs), h -> "
            f"transform(sequence(0, {n_hashes - 1}), "
            f"i -> array_min(transform(h, x -> xxhash64(x, i))))), 0)"
        )
        bands_expr = (
            f"get(transform(array({sig}), "
            f"sg -> transform(sequence(0, {bands - 1}), "
            f"b -> struct(b as band, "
            f"xxhash64(slice(sg, b * {rows} + 1, {rows})) as bucket))), 0)"
        )
        banded = hs.select(
            "id", F.explode(F.expr(bands_expr)).alias("bb")
        ).select("id", "bb.band", "bb.bucket")
        cand = _banded_candidates(
            banded, ("band", "bucket"), max_bucket=max_bucket
        )
        toks = hs.select(
            F.col("id").alias("tid"), F.col("hs").alias("toks")
        )
        return (
            cand.join(toks.withColumnRenamed("tid", "id_a").withColumnRenamed("toks", "toks_a"), "id_a")
            .join(toks.withColumnRenamed("tid", "id_b").withColumnRenamed("toks", "toks_b"), "id_b")
            .withColumn("jaccard", F.round(jaccard(F.col("toks_a"), F.col("toks_b")), 6))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
        )
    # The narrow (id, band, bucket) frame is annotated + cached inside
    # _banded_candidates, so the n_hashes×shingles signature is
    # evaluated exactly once (cold fill) — no cache here.  The banding
    # expression is built as ONE F.expr parse (same plan as
    # minhash_signature + _lsh_bands) — see _minhash_bands_sql.
    banded = spread.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.expr(_minhash_bands_sql(text_sql, n_hashes, bands, rows, k_shingle))
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    cand = _banded_candidates(banded, ("band", "bucket"), max_bucket=max_bucket)
    # same reasoning: tokens are re-read for both sides of the verify join
    verify_sql = (
        tokens_sql(text_sql)
        if verify == "tokens"
        else shingles_sql(text_sql, k_shingle)
    )
    if verify_hash64:
        verify_sql = f"transform({verify_sql}, __s -> xxhash64(__s))"
    toks = _cache_tracked(
        spread.select(F.col(id_col).alias("tid"), F.expr(verify_sql).alias("toks"))
    )
    return (
        cand.join(toks.withColumnRenamed("tid", "id_a").withColumnRenamed("toks", "toks_a"), "id_a")
        .join(toks.withColumnRenamed("tid", "id_b").withColumnRenamed("toks", "toks_b"), "id_b")
        .withColumn("jaccard", F.round(jaccard(F.col("toks_a"), F.col("toks_b")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --- n-gram Jaccard (exact, for bounded candidate sets) ---------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    block_on: Column | None = None,
) -> DataFrame:
    """Exact pairwise token-Jaccard inside blocking groups.  Without
    ``block_on`` this is a cross join — only for bounded inputs; at
    scale pass a blocking key (e.g. minhash band or length bucket)."""
    t = df.select(
        F.col(id_col).alias("id"),
        tokens(F.col(text_col)).alias("toks"),
        (block_on if block_on is not None else F.lit(0)).alias("blk"),
    )
    l, r = t.alias("l"), t.alias("r")
    return (
        l.join(
            r,
            (F.col("l.blk") == F.col("r.blk")) & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.round(jaccard(F.col("l.toks"), F.col("r.toks")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# --- SimHash ----------------------------------------------------------------


def _simhash_bits(text) -> Column:
    """array<long> of 63 sign bits (bit i = majority vote of token-hash
    bit i).  Token hashes are let-bound: hashed once, voted 63 times."""
    tok_hashes = _let(tokens(text), lambda tk: F.transform(tk, lambda t: F.xxhash64(t)))
    bit_idx = F.sequence(F.lit(0), F.lit(62))
    return _let(
        tok_hashes,
        lambda hs: F.transform(
            bit_idx,
            lambda i: F.when(
                F.aggregate(
                    hs,
                    F.lit(0),
                    lambda acc, h: acc
                    + F.when(
                        h.bitwiseAND(F.pow(F.lit(2.0), i).cast("long")) != 0,
                        F.lit(1),
                    ).otherwise(F.lit(-1)),
                )
                > 0,
                F.lit(1).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        ),
    )


def _pack_bits(bits: Column, offset: int = 0, width: int = 63) -> Column:
    """Fold bits[offset:offset+width] into a long (bit 0 = LSB)."""
    sliced = F.slice(bits, offset + 1, width)
    return F.aggregate(
        F.zip_with(
            sliced,
            F.sequence(F.lit(0), F.lit(width - 1)),
            lambda b, i: b * F.pow(F.lit(2.0), i).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def simhash(text) -> Column:
    """63-bit SimHash of the token multiset (sign of per-bit vote sums).
    63 bits (not 64) keeps the packed value positive in a signed long."""
    return _pack_bits(_simhash_bits(text))


def _pack_sql(bits_sql: str, offset: int, width: int) -> str:
    """SQL twin of _pack_bits over a bound bits-array variable."""
    return (
        f"aggregate(zip_with(slice({bits_sql}, {offset + 1}, {width}), "
        f"sequence(0, {width - 1}), "
        f"(b, i) -> b * cast(pow(2.0, i) as bigint)), "
        f"cast(0 as bigint), (acc, v) -> acc + v)"
    )


def _simhash_parts_sql(text_sql: str, n_chunks: int, width: int) -> str:
    """One SQL fragment for token-hash votes → packed hash + chunk
    buckets (same plan as _simhash_bits/_pack_bits, single F.expr parse
    — the Column build was construction-bound, see _minhash_bands_sql)."""
    bits = (
        f"get(transform(array(transform({tokens_sql(text_sql)}, "
        f"t -> xxhash64(t))), "
        f"hs -> transform(sequence(0, 62), "
        f"i -> if(aggregate(hs, 0, (acc, h) -> acc + "
        f"if((h & cast(pow(2.0, i) as bigint)) != 0, 1, -1)) > 0, "
        f"cast(1 as bigint), cast(0 as bigint)))), 0)"
    )
    chunk_structs = ", ".join(
        f"struct({i} as chunk, "
        f"{_pack_sql('bs', i * width, min(width, 63 - i * width))} as bucket)"
        for i in range(n_chunks)
    )
    return (
        f"get(transform(array({bits}), "
        f"bs -> struct({_pack_sql('bs', 0, 63)} as sh, "
        f"array({chunk_structs}) as bands)), 0)"
    )


def _hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 6,
    n_chunks: int = 8,
    max_bucket: int = 256,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the hash into ``n_chunks``
    bit-chunks; by pigeonhole any pair with hamming < n_chunks shares
    at least one exact chunk (8 chunks of 8 bits covers hamming<=7
    deterministically, more probabilistically); verify with the full
    hamming distance.  Chunk buckets above ``max_bucket`` take the
    linear star path (see _banded_candidates) instead of the quadratic
    self-join."""
    release_dedup_caches()  # evict the previous call's cached blocks
    width = 63 // n_chunks + (1 if 63 % n_chunks else 0)
    # ONE expression computes the bits (let-bound), the packed hash and
    # every chunk bucket; explode fans out without re-evaluating it (a
    # generator's child is evaluated once per input row).  Built as a
    # single F.expr parse — see _minhash_bands_sql for why.
    spread = _spread(df.select(id_col, text_col), id_col)
    parts = F.expr(_simhash_parts_sql(f"`{text_col}`", n_chunks, width))
    # annotation + cache happen inside _banded_candidates, so the
    # 63-bit vote expression is evaluated once (cold fill)
    banded = (
        spread.select(F.col(id_col).alias("id"), parts.alias("p"))
        .select("id", F.col("p.sh").alias("sh"), F.explode("p.bands").alias("bb"))
        .select("id", "sh", "bb.chunk", "bb.bucket")
    )
    return (
        _banded_candidates(
            banded, ("chunk", "bucket"), carry=("sh",), max_bucket=max_bucket
        )
        .select(
            "id_a",
            "id_b",
            _hamming64(F.col("sh_a"), F.col("sh_b")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


# --- embedding near-dup ------------------------------------------------------


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def _rhp_bucket(vec: Column, planes: Sequence[Sequence[float]]) -> Column:
    """Random-hyperplane LSH bucket id: sign bits of dot(v, h_j)."""
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(x)) for x in plane]),
                lambda a, b: a.cast("double") * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot > 0, F.lit(2 ** j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def _rhp_bucket_sql(vec_sql: str, planes: Sequence[Sequence[float]]) -> str:
    """SQL twin of _rhp_bucket — the Column loop costs n_planes × dim
    py4j literal calls per build (see _minhash_bands_sql)."""
    planes_lit = "array(" + ", ".join(
        "array(" + ", ".join(f"cast({float(x)!r} as double)" for x in p) + ")"
        for p in planes
    ) + ")"
    return (
        f"aggregate(transform(sequence(0, {len(planes) - 1}), "
        f"j -> if(aggregate(zip_with({vec_sql}, "
        f"element_at({planes_lit}, j + 1), "
        f"(a, b) -> cast(a as double) * b), "
        f"cast(0.0 as double), (acc, x) -> acc + x) > 0, "
        f"cast(pow(2.0, j) as bigint), cast(0 as bigint))), "
        f"cast(0 as bigint), (acc, x) -> acc + x)"
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
    max_bucket: int = 256,
    n_bands: int = 1,
) -> DataFrame:
    """Cosine near-duplicate pairs via random-hyperplane LSH buckets.

    High-cosine pairs land in the same sign-bucket with probability
    p = (1 - theta/pi)^n_planes; candidates come from the same
    skew-bounded bucket machinery as minhash/simhash
    (_banded_candidates: all-pairs self-join only inside buckets <=
    ``max_bucket``, linear star path above — a mass-duplicated
    embedding cluster can no longer go quadratic).  The vector rides
    through the banding shuffle as a carry column; exact cosine
    verifies each candidate, so precision is 1.0 and ``n_bands`` only
    tunes recall.

    ``n_bands`` > 1 ORs over independent plane sets (seed+i): a pair is
    a candidate if ANY set buckets it together, lifting recall to
    1 - (1 - p)^n_bands at the cost of one posexplode fan-out (still
    ONE banding shuffle — band id joins the bucket key, and
    cross-band duplicate candidates collapse in _banded_candidates'
    final dropDuplicates).

    Sizing at corpus scale: raise ``n_planes`` so the bucket space
    (2^n_planes) keeps expected bucket size under ``max_bucket``
    (e.g. 20 planes = 1M buckets for a 100M-doc corpus), then raise
    ``n_bands`` until 1-(1-p)^b clears the recall target at the
    threshold's theta — shuffle volume grows linearly in n_bands,
    never quadratically.
    """
    from .similarity import cosine

    release_dedup_caches()  # evict the previous call's cached blocks
    spread = _spread(df.select(id_col, vec_col), id_col)
    if n_bands <= 1:
        banded = spread.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
            F.expr(
                _rhp_bucket_sql(f"`{vec_col}`", _hyperplanes(dim, n_planes, seed))
            ).alias("bucket"),
        )
        keys: tuple[str, ...] = ("bucket",)
    else:
        arr = "array(" + ", ".join(
            _rhp_bucket_sql(f"`{vec_col}`", _hyperplanes(dim, n_planes, seed + i))
            for i in range(n_bands)
        ) + ")"
        banded = spread.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
            F.posexplode(F.expr(arr)).alias("band", "bucket"),
        )
        keys = ("band", "bucket")
    cand = _banded_candidates(banded, keys, carry=("v",), max_bucket=max_bucket)
    return (
        cand.select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("v_a"), F.col("v_b")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


# --- representative selection -------------------------------------------------


def dedup_keep_representative(
    df: DataFrame, pairs: DataFrame, id_col: str
) -> DataFrame:
    """Drop the higher-id side of each duplicate pair (star-graph
    approximation of connected components — exact for pairwise dups,
    conservative for chains; iterate for full transitive closure)."""
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")
