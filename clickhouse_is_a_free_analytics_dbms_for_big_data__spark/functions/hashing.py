"""Hash functions.

Reference: dbms/src/Functions/FunctionsHashing.cpp: halfMD5, MD5,
SHA1/224/256, sipHash64/128, cityHash64, farmHash64, metroHash64,
intHash32/64, URLHash.

Cryptographic hashes (MD5/SHA*) are bit-exact matches.  The fast
non-crypto family (sipHash64/cityHash64/...) is mapped to Spark's
xxhash64 as a stand-in: same role (fast 64-bit avalanche hash for
sampling/sharding/grouping), different bit values — goldens must test
distribution properties, not values (SURVEY.md §7).  intHash32/64 are
implemented exactly (public Murmur-style finalizers the reference uses).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ._util import col_of

__all__ = [
    "MD5", "halfMD5", "SHA1", "SHA224", "SHA256", "sipHash64",
    "cityHash64", "farmHash64", "metroHash64", "intHash32", "intHash64",
    "URLHash", "hashMod",
]


def MD5(s) -> Column:
    return F.md5(col_of(s).cast("binary"))


def halfMD5(s) -> Column:
    """First 8 bytes of MD5 as a big-endian UInt64 (reference halfMD5).
    Returned as signed long (wraparound documented)."""
    return F.conv(F.substring(F.md5(col_of(s).cast("binary")), 1, 16), 16, 10).cast(
        "decimal(20,0)"
    )


def SHA1(s) -> Column:
    return F.sha1(col_of(s).cast("binary"))


def SHA224(s) -> Column:
    return F.sha2(col_of(s).cast("binary"), 224)


def SHA256(s) -> Column:
    return F.sha2(col_of(s).cast("binary"), 256)


def sipHash64(*cols) -> Column:
    """Stand-in: xxhash64 (64-bit fast hash; values differ from reference)."""
    return F.xxhash64(*[col_of(c) for c in cols])


cityHash64 = sipHash64


def _exact_str_hash64(scalar_fn_name: str, doc_ref: str):
    """Bit-exact single-string-arg hash as an Arrow-batched pandas UDF
    over the scalar port in exact_hash.py.  Result is the signed-BIGINT
    bit pattern of the reference's UInt64 (wraparound documented —
    same convention as intHash64).  Multi-arg / integer-arg combines
    run on the dialect path (dialect/hash_sql.py), which keeps
    integers JVM-side."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    def _make():
        import pandas as pd

        from . import exact_hash as xh

        fn = getattr(xh, scalar_fn_name)

        def _sign(v: int) -> int:
            return v - (1 << 64) if v >= (1 << 63) else v

        @pandas_udf(LongType())
        def _hash(s: pd.Series) -> pd.Series:
            return s.map(
                lambda v: None if v is None else _sign(
                    fn(v if isinstance(v, bytes) else str(v).encode())
                ),
                na_action="ignore",
            )

        return _hash

    def wrapper(s) -> Column:
        return _make()(col_of(s))

    wrapper.__doc__ = f"Bit-exact port ({doc_ref}); see functions/exact_hash.py."
    return wrapper


farmHash64 = _exact_str_hash64(
    "farm_hash_64", "farmhash::Hash64, contrib/libfarmhash/farmhash.cc"
)
metroHash64 = _exact_str_hash64(
    "metro_hash_64_1", "metrohash64_1, contrib/libmetrohash/src/metrohash64.cpp"
)


def intHash64(x) -> Column:
    """Exact port of the reference's intHash64 finalizer
    (Functions/FunctionsHashing.h, public splitmix-style avalanche):
    x ^= x>>33; x*=0xff51afd7ed558ccd; x^=x>>33; x*=0xc4ceb9fe1a85ec53; x^=x>>33.
    Signed-long wraparound is identical to C++ unsigned mul mod 2^64.
    """
    x_ = col_of(x).cast("long")
    x_ = x_.bitwiseXOR(F.shiftrightunsigned(x_, 33))
    x_ = x_ * F.lit(-49064778989728563)  # 0xff51afd7ed558ccd as signed
    x_ = x_.bitwiseXOR(F.shiftrightunsigned(x_, 33))
    x_ = x_ * F.lit(-4265267296055464877)  # 0xc4ceb9fe1a85ec53 as signed
    return x_.bitwiseXOR(F.shiftrightunsigned(x_, 33))


def intHash32(x) -> Column:
    """64->32 bit integer hash (reference intHash32): multiply-shift."""
    return F.pmod(intHash64(x), F.lit(4294967296))


def URLHash(url) -> Column:
    """Hash of URL normalized by dropping a trailing slash/#fragment."""
    u = F.regexp_replace(col_of(url), "#.*$", "")
    u = F.regexp_replace(u, "/$", "")
    return F.xxhash64(u)


def hashMod(x, mod: int) -> Column:
    """Deterministic bucket id in [0, mod) — the engine's sharding/
    sampling primitive (used by SAMPLE, LSH banding, IVF routing)."""
    return F.pmod(F.xxhash64(col_of(x)), F.lit(mod))
