"""Bit-exact ports of the reference's fast non-crypto hash family.

Reference: dbms/src/Functions/FunctionsHashing.h (SipHash64Impl,
ImplCityHash64, IntHash32Impl:152, IntHash64Impl:163, URLHashImpl:628,
URLHierarchyHashImpl:643, FunctionNeighbourhoodHash64:378) and the
public third-party algorithms they call:

- CityHash64 v1.0 (contrib/libcityhash/src/city.cc:201, Google,
  MIT license) — re-derived here in Python from the published
  algorithm.
- SipHash-2-4 with a zero key (dbms/src/Common/SipHash.h, the
  Aumasson/Bernstein reference design).
- intHash64 = MurmurHash finalizer over ``x ^ 0x4CF2D2BAAE6DA887``
  (dbms/src/Common/HashTable/Hash.h:13).
- intHash32 = Thomas Wang's 64→32 mix with salt 0x75D9543DE018BF45
  (dbms/src/Common/HashTable/Hash.h:144).
- Hash128to64 = the murmur-inspired 128→64 fold
  (contrib/libcityhash/include/city.h:79).

Scalar Python implementations here are the single source of truth;
`hash_sql.py` wires them into Spark as (a) pure-SQL expression
templates for integer inputs (JVM-side, codegen'd) and (b)
Arrow-batched pandas UDFs for string inputs.
"""

from __future__ import annotations

import struct

M64 = (1 << 64) - 1

K0 = 0xC3A5C85C97CB3127
K1 = 0xB492B66FBE98F273
K2 = 0x9AE16A3B2F90404F
K3 = 0xC949D7C7509E6557
K_MUL = 0x9DDFEA08EB382D69


def _rot(v: int, s: int) -> int:
    if s == 0:
        return v
    return ((v >> s) | (v << (64 - s))) & M64


def _shift_mix(v: int) -> int:
    return v ^ (v >> 47)


def hash128to64(low: int, high: int) -> int:
    """Hash128to64(uint128(low, high)) — city.h:79."""
    a = ((low ^ high) * K_MUL) & M64
    a ^= a >> 47
    b = ((high ^ a) * K_MUL) & M64
    b ^= b >> 47
    b = (b * K_MUL) & M64
    return b


def _hash_len_16(u: int, v: int) -> int:
    return hash128to64(u, v)


def _fetch64(s: bytes, i: int = 0) -> int:
    return struct.unpack_from("<Q", s, i)[0]


def _fetch32(s: bytes, i: int = 0) -> int:
    return struct.unpack_from("<I", s, i)[0]


def _hash_len_0_to_16(s: bytes) -> int:
    n = len(s)
    if n > 8:
        a = _fetch64(s)
        b = _fetch64(s, n - 8)
        # RotateByAtLeast1: n is 9..16 here, shift is never 0 or >= 64
        return _hash_len_16(a, _rot((b + n) & M64, n)) ^ b
    if n >= 4:
        a = _fetch32(s)
        return _hash_len_16((n + (a << 3)) & M64, _fetch32(s, n - 4))
    if n > 0:
        a, b, c = s[0], s[n >> 1], s[n - 1]
        y = (a + (b << 8)) & 0xFFFFFFFF
        z = (n + (c << 2)) & 0xFFFFFFFF
        return (_shift_mix((y * K2 ^ z * K3) & M64) * K2) & M64
    return K2


def _hash_len_17_to_32(s: bytes) -> int:
    n = len(s)
    a = (_fetch64(s) * K1) & M64
    b = _fetch64(s, 8)
    c = (_fetch64(s, n - 8) * K2) & M64
    d = (_fetch64(s, n - 16) * K0) & M64
    return _hash_len_16(
        (_rot((a - b) & M64, 43) + _rot(c, 30) + d) & M64,
        (a + _rot((b ^ K3) & M64, 20) - c + n) & M64,
    )


def _weak_hash_len_32_with_seeds(w: int, x: int, y: int, z: int, a: int, b: int):
    a = (a + w) & M64
    b = _rot((b + a + z) & M64, 21)
    c = a
    a = (a + x + y) & M64
    b = (b + _rot(a, 44)) & M64
    return (a + z) & M64, (b + c) & M64


def _weak32(s: bytes, i: int, a: int, b: int):
    return _weak_hash_len_32_with_seeds(
        _fetch64(s, i), _fetch64(s, i + 8), _fetch64(s, i + 16), _fetch64(s, i + 24), a, b
    )


def _hash_len_33_to_64(s: bytes) -> int:
    n = len(s)
    z = _fetch64(s, 24)
    a = (_fetch64(s) + (n + _fetch64(s, n - 16)) * K0) & M64
    b = _rot((a + z) & M64, 52)
    c = _rot(a, 37)
    a = (a + _fetch64(s, 8)) & M64
    c = (c + _rot(a, 7)) & M64
    a = (a + _fetch64(s, 16)) & M64
    vf = (a + z) & M64
    vs = (b + _rot(a, 31) + c) & M64
    a = (_fetch64(s, 16) + _fetch64(s, n - 32)) & M64
    z = _fetch64(s, n - 8)
    b = _rot((a + z) & M64, 52)
    c = _rot(a, 37)
    a = (a + _fetch64(s, n - 24)) & M64
    c = (c + _rot(a, 7)) & M64
    a = (a + _fetch64(s, n - 16)) & M64
    wf = (a + z) & M64
    ws = (b + _rot(a, 31) + c) & M64
    r = _shift_mix(((vf + ws) * K2 + (wf + vs) * K0) & M64)
    return (_shift_mix((r * K0 + vs) & M64) * K2) & M64


def city_hash_64(s: bytes) -> int:
    """CityHash64 v1.0 over raw bytes (city.cc:201)."""
    n = len(s)
    if n <= 32:
        if n <= 16:
            return _hash_len_0_to_16(s)
        return _hash_len_17_to_32(s)
    if n <= 64:
        return _hash_len_33_to_64(s)

    x = _fetch64(s)
    y = _fetch64(s, n - 16) ^ K1
    z = _fetch64(s, n - 56) ^ K0
    v = _weak32(s, n - 64, n, y)
    w = _weak32(s, n - 32, (n * K1) & M64, K0)
    z = (z + _shift_mix(v[1]) * K1) & M64
    x = (_rot((z + x) & M64, 39) * K1) & M64
    y = (_rot(y, 33) * K1) & M64

    m = (n - 1) & ~63
    i = 0
    while True:
        x = (_rot((x + y + v[0] + _fetch64(s, i + 16)) & M64, 37) * K1) & M64
        y = (_rot((y + v[1] + _fetch64(s, i + 48)) & M64, 42) * K1) & M64
        x ^= w[1]
        y ^= v[0]
        z = _rot((z ^ w[0]) & M64, 33)
        v = _weak32(s, i, (v[1] * K1) & M64, (x + w[0]) & M64)
        w = _weak32(s, i + 32, (z + w[1]) & M64, y)
        z, x = x, z
        i += 64
        m -= 64
        if m == 0:
            break
    return _hash_len_16(
        (_hash_len_16(v[0], w[0]) + _shift_mix(y) * K1 + z) & M64,
        (_hash_len_16(v[1], w[1]) + x) & M64,
    )


# ---------------------------------------------------------------- SipHash


def sip_hash_64(data: bytes) -> int:
    """SipHash-2-4, zero key, finalization per dbms/src/Common/SipHash.h
    (last word = remaining bytes with total length in byte 7)."""
    v0 = 0x736F6D6570736575
    v1 = 0x646F72616E646F6D
    v2 = 0x6C7967656E657261
    v3 = 0x7465646279746573

    def rounds(v0, v1, v2, v3, n):
        for _ in range(n):
            v0 = (v0 + v1) & M64
            v1 = _rot(v1, 64 - 13)  # ROTL 13
            v1 ^= v0
            v0 = _rot(v0, 32)
            v2 = (v2 + v3) & M64
            v3 = _rot(v3, 64 - 16)
            v3 ^= v2
            v0 = (v0 + v3) & M64
            v3 = _rot(v3, 64 - 21)
            v3 ^= v0
            v2 = (v2 + v1) & M64
            v1 = _rot(v1, 64 - 17)
            v1 ^= v2
            v2 = _rot(v2, 32)
        return v0, v1, v2, v3

    n = len(data)
    full = n & ~7
    for i in range(0, full, 8):
        m = _fetch64(data, i)
        v3 ^= m
        v0, v1, v2, v3 = rounds(v0, v1, v2, v3, 2)
        v0 ^= m
    tail = bytearray(8)
    tail[: n - full] = data[full:]
    tail[7] = n & 0xFF
    m = struct.unpack("<Q", bytes(tail))[0]
    v3 ^= m
    v0, v1, v2, v3 = rounds(v0, v1, v2, v3, 2)
    v0 ^= m
    v2 ^= 0xFF
    v0, v1, v2, v3 = rounds(v0, v1, v2, v3, 4)
    return v0 ^ v1 ^ v2 ^ v3


# ---------------------------------------------------------------- int hashes

INT_HASH64_SALT = 0x4CF2D2BAAE6DA887
INT_HASH32_SALT = 0x75D9543DE018BF45


def murmur_fin(x: int) -> int:
    """The raw MurmurHash3 finalizer (Hash.h:13 body, no salt)."""
    x &= M64
    x ^= x >> 33
    x = (x * 0xFF51AFD7ED558CCD) & M64
    x ^= x >> 33
    x = (x * 0xC4CEB9FE1A85EC53) & M64
    x ^= x >> 33
    return x


def int_hash_64(x: int) -> int:
    """FunctionsHashing.h IntHash64Impl: murmur_fin(x ^ salt)."""
    return murmur_fin((x & M64) ^ INT_HASH64_SALT)


def int_hash_32(x: int) -> int:
    """Hash.h:144 intHash32<0x75D9543DE018BF45> (low 32 bits kept)."""
    key = (x & M64) ^ INT_HASH32_SALT
    key = ((~key & M64) + ((key << 18) & M64)) & M64
    key ^= _rot(key, 31)  # (key >> 31) | (key << 33)
    key = (key * 21) & M64
    key ^= _rot(key, 11)
    key = (key + (key << 6)) & M64
    key ^= _rot(key, 22)
    return key & 0xFFFFFFFF


# ---------------------------------------------------------------- URL hash


def _url_find_level_length(level: int, s: bytes) -> int:
    """URLHierarchyHashImpl::findLevelLength (FunctionsHashing.h:643).
    NOTE the reference uses exclusive bounds ('a' < c < 'z') for the
    protocol scan — faithfully kept."""
    end = len(s)
    pos = 0
    while pos < end and (0x61 < s[pos] < 0x7A or 0x30 < s[pos] < 0x39):
        pos += 1
    ok = not (pos == 0 or pos == end)
    if ok:
        p = pos
        ok = s[p] == 0x3A and p + 2 < end and s[p + 1] == 0x2F and s[p + 2] == 0x2F and p + 3 < end
        if ok:
            pos = p + 3
    if not ok:
        return end if level == 0 else 0
    while pos < end and s[pos] not in (0x2F, 0x3F, 0x23):
        pos += 1
    if pos != end:
        pos += 1
    if level == 0:
        return pos
    current = 0
    while current != level and pos < end:
        while pos < end and s[pos] in (0x2F, 0x3F, 0x23):
            pos += 1
        if pos == end:
            break
        while pos < end and s[pos] not in (0x2F, 0x3F, 0x23):
            pos += 1
        if pos != end:
            pos += 1
        current += 1
    return pos if current == level else 0


def url_hash(s: bytes, level: int | None = None) -> int:
    """URLHashImpl::apply — CityHash64 with a trailing /?# dropped;
    level form hashes the URLHierarchy prefix (FunctionsHashing.h:628)."""
    if level is not None:
        s = s[: _url_find_level_length(level, s)]
    if s and s[-1:] in (b"/", b"?", b"#"):
        s = s[:-1]
    return city_hash_64(s)
