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


def _sip_finalized_state(data: bytes) -> tuple[int, int, int, int]:
    """SipHash-2-4, zero key, per dbms/src/Common/SipHash.h: the
    finalized (v0, v1, v2, v3) state (last word = remaining bytes with
    total length in byte 7).  get64 xors all four; get128 pairs them."""
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
    return v0, v1, v2, v3


def sip_hash_64(data: bytes) -> int:
    """SipHash.h get64: xor of the finalized state."""
    v0, v1, v2, v3 = _sip_finalized_state(data)
    return v0 ^ v1 ^ v2 ^ v3


def sip_hash_128(data: bytes) -> bytes:
    """SipHash.h get128: 16 bytes — little-endian (v0^v1) then
    (v2^v3); the reference's sipHash128 FixedString(16) value
    (FunctionsHashing.h FunctionStringHashFixedString)."""
    v0, v1, v2, v3 = _sip_finalized_state(data)
    return struct.pack("<QQ", v0 ^ v1, v2 ^ v3)


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


# ---------------------------------------------------------------- FarmHash
# farmHash64 = farmhash::Hash64 (contrib/libfarmhash/farmhash.cc, Google,
# MIT) as built by the reference with -msse4.2 (cmake/test_cpu.cmake):
# the farmhashte dispatch — farmhashxo for len < 512, the SIMD
# Hash64Long for len >= 512.  Re-derived in Python from the published
# algorithm; SSE lanes emulated on 16-byte values.  FarmHash's
# k0/k1/k2 equal CityHash's K0/K1/K2 above.


def _fh_len16(u: int, v: int, mul: int) -> int:
    """farmhashna::HashLen16(u, v, mul)."""
    a = ((u ^ v) * mul) & M64
    a ^= a >> 47
    b = ((v ^ a) * mul) & M64
    b ^= b >> 47
    return (b * mul) & M64


def _fh_len_0_to_16(s: bytes) -> int:
    n = len(s)
    if n >= 8:
        mul = (K2 + n * 2) & M64
        a = (_fetch64(s) + K2) & M64
        b = _fetch64(s, n - 8)
        c = (_rot(b, 37) * mul + a) & M64
        d = ((_rot(a, 25) + b) * mul) & M64
        return _fh_len16(c, d, mul)
    if n >= 4:
        mul = (K2 + n * 2) & M64
        a = _fetch32(s)
        return _fh_len16((n + (a << 3)) & M64, _fetch32(s, n - 4), mul)
    if n > 0:
        a, b, c = s[0], s[n >> 1], s[n - 1]
        y = (a + (b << 8)) & 0xFFFFFFFF
        z = (n + (c << 2)) & 0xFFFFFFFF
        return (_shift_mix((y * K2 ^ z * K0) & M64) * K2) & M64
    return K2


def _fh_len_17_to_32(s: bytes) -> int:
    n = len(s)
    mul = (K2 + n * 2) & M64
    a = (_fetch64(s) * K1) & M64
    b = _fetch64(s, 8)
    c = (_fetch64(s, n - 8) * mul) & M64
    d = (_fetch64(s, n - 16) * K2) & M64
    return _fh_len16(
        (_rot((a + b) & M64, 43) + _rot(c, 30) + d) & M64,
        (a + _rot((b + K2) & M64, 18) + c) & M64,
        mul,
    )


def _fh_na_hash64(s: bytes) -> int:
    """farmhashna::Hash64 (used by xo for 97..256 bytes)."""
    n = len(s)
    if n <= 16:
        return _fh_len_0_to_16(s)
    if n <= 32:
        return _fh_len_17_to_32(s)
    if n <= 64:
        # farmhashna::HashLen33to64 (not reachable through the xo
        # dispatch, kept for completeness)
        mul = (K2 + n * 2) & M64
        a = (_fetch64(s) * K2) & M64
        b = _fetch64(s, 8)
        c = (_fetch64(s, n - 8) * mul) & M64
        d = (_fetch64(s, n - 16) * K2) & M64
        y = (_rot((a + b) & M64, 43) + _rot(c, 30) + d) & M64
        z = _fh_len16(y, (a + _rot((b + K2) & M64, 18) + c) & M64, mul)
        e = (_fetch64(s, 16) * mul) & M64
        f = _fetch64(s, 24)
        g = ((y + _fetch64(s, n - 32)) * mul) & M64
        h = ((z + _fetch64(s, n - 24)) * mul) & M64
        return _fh_len16(
            (_rot((e + f) & M64, 43) + _rot(g, 30) + h) & M64,
            (e + _rot((f + a) & M64, 18) + g) & M64,
            mul,
        )
    seed = 81
    x = seed
    y = (seed * K1 + 113) & M64
    z = (_shift_mix((y * K2 + 113) & M64) * K2) & M64
    v = (0, 0)
    w = (0, 0)
    x = (x * K2 + _fetch64(s)) & M64
    end = ((n - 1) // 64) * 64
    last64 = end + ((n - 1) & 63) - 63
    i = 0
    while i != end:
        x = (_rot((x + y + v[0] + _fetch64(s, i + 8)) & M64, 37) * K1) & M64
        y = (_rot((y + v[1] + _fetch64(s, i + 48)) & M64, 42) * K1) & M64
        x ^= w[1]
        y = (y + v[0] + _fetch64(s, i + 40)) & M64
        z = (_rot((z + w[0]) & M64, 33) * K1) & M64
        v = _weak32(s, i, (v[1] * K1) & M64, (x + w[0]) & M64)
        w = _weak32(s, i + 32, (z + w[1]) & M64, (y + _fetch64(s, i + 16)) & M64)
        z, x = x, z
        i += 64
    mul = (K1 + ((z & 0xFF) << 1)) & M64
    i = last64
    w = ((w[0] + ((n - 1) & 63)) & M64, w[1])
    v = ((v[0] + w[0]) & M64, v[1])
    w = ((w[0] + v[0]) & M64, w[1])
    x = (_rot((x + y + v[0] + _fetch64(s, i + 8)) & M64, 37) * mul) & M64
    y = (_rot((y + v[1] + _fetch64(s, i + 48)) & M64, 42) * mul) & M64
    x ^= (w[1] * 9) & M64
    y = (y + v[0] * 9 + _fetch64(s, i + 40)) & M64
    z = (_rot((z + w[0]) & M64, 33) * mul) & M64
    v = _weak32(s, i, (v[1] * mul) & M64, (x + w[0]) & M64)
    w = _weak32(s, i + 32, (z + w[1]) & M64, (y + _fetch64(s, i + 16)) & M64)
    z, x = x, z
    return _fh_len16(
        (_fh_len16(v[0], w[0], mul) + _shift_mix(y) * K0 + z) & M64,
        (_fh_len16(v[1], w[1], mul) + x) & M64,
        mul,
    )


def _fh_uo_h(x: int, y: int, mul: int, r: int) -> int:
    a = ((x ^ y) * mul) & M64
    a ^= a >> 47
    b = ((y ^ a) * mul) & M64
    return (_rot(b, r) * mul) & M64


def _fh_uo_hash64_with_seeds(s: bytes, seed0: int, seed1: int) -> int:
    """farmhashuo::Hash64WithSeeds (xo's path for 257..511 bytes)."""
    n = len(s)
    if n <= 64:
        # farmhashna::Hash64WithSeeds = HashLen16(Hash64(s) - seed0, seed1)
        return hash128to64((_fh_na_hash64(s) - seed0) & M64, seed1)
    x = seed0
    y = (seed1 * K2 + 113) & M64
    z = (_shift_mix((y * K2) & M64) * K2) & M64
    v = [seed0, seed1]
    w = [0, 0]
    u = (x - z) & M64
    x = (x * K2) & M64
    mul = (K2 + (u & 0x82)) & M64
    end = ((n - 1) // 64) * 64
    last64 = end + ((n - 1) & 63) - 63
    i = 0
    while i != end:
        a0 = _fetch64(s, i)
        a1 = _fetch64(s, i + 8)
        a2 = _fetch64(s, i + 16)
        a3 = _fetch64(s, i + 24)
        a4 = _fetch64(s, i + 32)
        a5 = _fetch64(s, i + 40)
        a6 = _fetch64(s, i + 48)
        a7 = _fetch64(s, i + 56)
        x = (x + a0 + a1) & M64
        y = (y + a2) & M64
        z = (z + a3) & M64
        v[0] = (v[0] + a4) & M64
        v[1] = (v[1] + a5 + a1) & M64
        w[0] = (w[0] + a6) & M64
        w[1] = (w[1] + a7) & M64

        x = _rot(x, 26)
        x = (x * 9) & M64
        y = _rot(y, 29)
        z = (z * mul) & M64
        v[0] = _rot(v[0], 33)
        v[1] = _rot(v[1], 30)
        w[0] ^= x
        w[0] = (w[0] * 9) & M64
        z = _rot(z, 32)
        z = (z + w[1]) & M64
        w[1] = (w[1] + z) & M64
        z = (z * 9) & M64
        u, y = y, u

        z = (z + a0 + a6) & M64
        v[0] = (v[0] + a2) & M64
        v[1] = (v[1] + a3) & M64
        w[0] = (w[0] + a4) & M64
        w[1] = (w[1] + a5 + a6) & M64
        x = (x + a1) & M64
        y = (y + a7) & M64

        y = (y + v[0]) & M64
        v[0] = (v[0] + x - y) & M64
        v[1] = (v[1] + w[0]) & M64
        w[0] = (w[0] + v[1]) & M64
        w[1] = (w[1] + x - y) & M64
        x = (x + w[1]) & M64
        w[1] = _rot(w[1], 34)
        u, z = z, u
        i += 64
    i = last64
    u = (u * 9) & M64
    v[1] = _rot(v[1], 28)
    v[0] = _rot(v[0], 20)
    w[0] = (w[0] + ((n - 1) & 63)) & M64
    u = (u + y) & M64
    y = (y + u) & M64
    x = (_rot((y - x + v[0] + _fetch64(s, i + 8)) & M64, 37) * mul) & M64
    y = (_rot((y ^ v[1] ^ _fetch64(s, i + 48)) & M64, 42) * mul) & M64
    x ^= (w[1] * 9) & M64
    y = (y + v[0] + _fetch64(s, i + 40)) & M64
    z = (_rot((z + w[0]) & M64, 33) * mul) & M64
    vv = _weak32(s, i, (v[1] * mul) & M64, (x + w[0]) & M64)
    ww = _weak32(s, i + 32, (z + w[1]) & M64, (y + _fetch64(s, i + 16)) & M64)
    return _fh_uo_h(
        (_fh_len16((vv[0] + x) & M64, (ww[0] ^ y) & M64, mul) + z - u) & M64,
        _fh_uo_h((vv[1] + y) & M64, (ww[1] + z) & M64, K2, 30) ^ x,
        K2,
        31,
    )


def _fh_xo_h32(s: bytes, i: int, mul: int, seed0: int = 0, seed1: int = 0) -> int:
    """farmhashxo::H32 over s[i:i+32] (always called with len 32)."""
    a = (_fetch64(s, i) * K1) & M64
    b = _fetch64(s, i + 8)
    c = (_fetch64(s, i + 24) * mul) & M64
    d = (_fetch64(s, i + 16) * K2) & M64
    u = (_rot((a + b) & M64, 43) + _rot(c, 30) + d + seed0) & M64
    v = (a + _rot((b + K2) & M64, 18) + c + seed1) & M64
    a = _shift_mix(((u ^ v) * mul) & M64)
    b = _shift_mix(((v ^ a) * mul) & M64)
    return b


def _fh_xo_hash64(s: bytes) -> int:
    """farmhashxo::Hash64 — the < 512-byte farmhash::Hash64 path."""
    n = len(s)
    if n <= 16:
        return _fh_len_0_to_16(s)
    if n <= 32:
        return _fh_len_17_to_32(s)
    if n <= 64:
        mul0 = (K2 - 30) & M64
        mul1 = (K2 - 30 + 2 * n) & M64
        h0 = _fh_xo_h32(s, 0, mul0)
        h1 = _fh_xo_h32(s, n - 32, mul1)
        return ((((h1 * mul1) & M64) + h0) * mul1) & M64
    if n <= 96:
        mul0 = (K2 - 114) & M64
        mul1 = (K2 - 114 + 2 * n) & M64
        h0 = _fh_xo_h32(s, 0, mul0)
        h1 = _fh_xo_h32(s, 32, mul1)
        h2 = _fh_xo_h32(s, n - 32, mul1, h0, h1)
        return ((h2 * 9 + (h0 >> 17) + (h1 >> 21)) * mul1) & M64
    if n <= 256:
        return _fh_na_hash64(s)
    return _fh_uo_hash64_with_seeds(s, 81, 0)


# --- farmhashte::Hash64Long SIMD lane emulation (len >= 512) ---

_TE_KSHUF = bytes([1, 3, 7, 0, 13, 14, 2, 12, 9, 6, 15, 8, 5, 10, 11, 4])
_TE_KMULT = bytes(
    [0x51, 0x2D, 0x9E, 0xCC, 0xED, 0x33, 0x3E, 0x34,
     0x03, 0xFA, 0x54, 0x45, 0x39, 0x33, 0xD6, 0xBD]
)


def _v_add(x: bytes, y: bytes) -> bytes:
    """_mm_add_epi64."""
    lo = (int.from_bytes(x[:8], "little") + int.from_bytes(y[:8], "little")) & M64
    hi = (int.from_bytes(x[8:], "little") + int.from_bytes(y[8:], "little")) & M64
    return lo.to_bytes(8, "little") + hi.to_bytes(8, "little")


def _v_xor(x: bytes, y: bytes) -> bytes:
    return bytes(a ^ b for a, b in zip(x, y))


def _v_mul(m: bytes, x: bytes) -> bytes:
    """_mm_mullo_epi32 — four 32-bit lanes, low halves kept."""
    out = bytearray(16)
    for i in range(0, 16, 4):
        a = int.from_bytes(m[i : i + 4], "little")
        b = int.from_bytes(x[i : i + 4], "little")
        out[i : i + 4] = ((a * b) & 0xFFFFFFFF).to_bytes(4, "little")
    return bytes(out)


def _v_shuf(idx: bytes, src: bytes) -> bytes:
    """Shuf(idx, src) = _mm_shuffle_epi8(src, idx)."""
    return bytes(0 if (j & 0x80) else src[j & 0x0F] for j in idx)


def _v_from_u64(x: int) -> bytes:
    """_mm_cvtsi64_si128."""
    return (x & M64).to_bytes(8, "little") + b"\x00" * 8


def _v_set1_32(x: int) -> bytes:
    return ((x & 0xFFFFFFFF).to_bytes(4, "little")) * 4


def _fh_te_hash64_long(s: bytes, n: int, seed0: int, seed1: int) -> int:
    kshuf, kmult = _TE_KSHUF, _TE_KMULT
    seed2 = ((seed0 + 113) * (seed1 + 9)) & M64
    seed3 = ((_rot(seed0, 23) + 27) * (_rot(seed1, 30) + 111)) & M64
    d0 = _v_from_u64(seed0)
    d1 = _v_from_u64(seed1)
    d2 = _v_shuf(kshuf, d0)
    d3 = _v_shuf(kshuf, d1)
    d4 = _v_xor(d0, d1)
    d5 = _v_xor(d1, d2)
    d6 = _v_xor(d2, d4)
    d7 = _v_set1_32(seed2 >> 32)
    d8 = _v_mul(kmult, d2)
    d9 = _v_set1_32(seed3 >> 32)
    d10 = _v_set1_32(seed3)
    d11 = _v_add(d2, _v_set1_32(seed2))
    end = n & ~255
    i = 0
    while True:
        z = s[i : i + 16]
        d0 = _v_add(d0, z)
        d1 = _v_shuf(kshuf, d1)
        d2 = _v_xor(d2, d0)
        d4 = _v_xor(_v_xor(d4, z), d1)
        d0, d6 = d6, d0
        z = s[i + 16 : i + 32]
        d5 = _v_add(d5, z)
        d6 = _v_shuf(kshuf, d6)
        d8 = _v_shuf(kshuf, d8)
        d7 = _v_xor(d7, d5)
        d0 = _v_xor(_v_xor(d0, z), d6)
        d5, d11 = d11, d5
        z = s[i + 32 : i + 48]
        d1 = _v_add(d1, z)
        d2 = _v_shuf(kshuf, d2)
        d4 = _v_shuf(kshuf, d4)
        d5 = _v_xor(_v_xor(d5, z), d2)
        d10, d4 = d4, d10
        z = s[i + 48 : i + 64]
        d6 = _v_add(d6, z)
        d7 = _v_shuf(kshuf, d7)
        d0 = _v_shuf(kshuf, d0)
        d8 = _v_xor(d8, d6)
        d1 = _v_add(_v_xor(d1, z), d7)
        z = s[i + 64 : i + 80]
        d2 = _v_add(d2, z)
        d5 = _v_shuf(kshuf, d5)
        d4 = _v_add(d4, d2)
        d6 = _v_xor(_v_xor(d6, z), d11)
        d8, d2 = d2, d8
        z = s[i + 80 : i + 96]
        d7 = _v_xor(d7, z)
        d8 = _v_shuf(kshuf, d8)
        d1 = _v_shuf(kshuf, d1)
        d0 = _v_add(d0, d7)
        d2 = _v_add(_v_add(d2, z), d8)
        d1, d7 = d7, d1
        z = s[i + 96 : i + 112]
        d4 = _v_shuf(kshuf, d4)
        d6 = _v_shuf(kshuf, d6)
        d8 = _v_mul(kmult, d8)
        d5 = _v_xor(d5, d11)
        d7 = _v_add(_v_xor(d7, z), d4)
        d6, d0 = d0, d6
        z = s[i + 112 : i + 128]
        d8 = _v_add(d8, z)
        d0 = _v_shuf(kshuf, d0)
        d2 = _v_shuf(kshuf, d2)
        d1 = _v_xor(d1, d8)
        d10 = _v_xor(_v_xor(d10, z), d0)
        d11, d5 = d5, d11
        z = s[i + 128 : i + 144]
        d4 = _v_add(d4, z)
        d5 = _v_shuf(kshuf, d5)
        d7 = _v_shuf(kshuf, d7)
        d6 = _v_add(d6, d4)
        d8 = _v_xor(_v_xor(d8, z), d5)
        d4, d10 = d10, d4
        z = s[i + 144 : i + 160]
        d0 = _v_add(d0, z)
        d1 = _v_shuf(kshuf, d1)
        d2 = _v_add(d2, d0)
        d4 = _v_xor(_v_xor(d4, z), d1)
        z = s[i + 160 : i + 176]
        d5 = _v_add(d5, z)
        d6 = _v_shuf(kshuf, d6)
        d8 = _v_shuf(kshuf, d8)
        d7 = _v_xor(d7, d5)
        d0 = _v_xor(_v_xor(d0, z), d6)
        d2, d8 = d8, d2
        z = s[i + 176 : i + 192]
        d1 = _v_add(d1, z)
        d2 = _v_shuf(kshuf, d2)
        d4 = _v_shuf(kshuf, d4)
        d5 = _v_mul(kmult, d5)
        d5 = _v_xor(_v_xor(d5, z), d2)
        d7, d1 = d1, d7
        z = s[i + 192 : i + 208]
        d6 = _v_add(d6, z)
        d7 = _v_shuf(kshuf, d7)
        d0 = _v_shuf(kshuf, d0)
        d8 = _v_add(d8, d6)
        d1 = _v_xor(_v_xor(d1, z), d7)
        d0, d6 = d6, d0
        z = s[i + 208 : i + 224]
        d2 = _v_add(d2, z)
        d5 = _v_shuf(kshuf, d5)
        d4 = _v_xor(d4, d2)
        d6 = _v_xor(_v_xor(d6, z), d9)
        d5, d11 = d11, d5
        z = s[i + 224 : i + 240]
        d7 = _v_add(d7, z)
        d8 = _v_shuf(kshuf, d8)
        d1 = _v_shuf(kshuf, d1)
        d0 = _v_xor(d0, d7)
        d2 = _v_xor(_v_xor(d2, z), d8)
        d10, d4 = d4, d10
        z = s[i + 240 : i + 256]
        d3 = _v_add(d3, z)
        d4 = _v_shuf(kshuf, d4)
        d6 = _v_shuf(kshuf, d6)
        d7 = _v_mul(kmult, d7)
        d5 = _v_add(d5, d3)
        d7 = _v_xor(_v_xor(d7, z), d4)
        d3, d9 = d9, d3
        i += 256
        if i == end:
            break
    d6 = _v_add(_v_mul(kmult, d6), _v_from_u64(n))
    if n % 256 != 0:
        # _mm_shuffle_epi32(d8, 0b00111001) — lanes [1, 2, 3, 0]
        shuf32 = d8[4:8] + d8[8:12] + d8[12:16] + d8[0:4]
        d7 = _v_add(shuf32, d7)
        d8 = _v_add(_v_mul(kmult, d8), _v_from_u64(_fh_xo_hash64(s[end:])))

    def _mix(d: bytes) -> bytes:
        return _v_mul(kmult, _v_shuf(kshuf, _v_mul(kmult, d)))

    d0 = _mix(d0)
    d3 = _mix(d3)
    d9 = _mix(d9)
    d1 = _mix(d1)
    d0 = _v_add(d11, d0)
    d3 = _v_xor(d7, d3)
    d9 = _v_add(d8, d9)
    d1 = _v_add(d10, d1)
    d4 = _v_add(d3, d4)
    d5 = _v_add(d9, d5)
    d6 = _v_xor(d1, d6)
    d2 = _v_add(d0, d2)
    t = d0 + d3 + d9 + d1 + d4 + d5 + d6 + d2
    return _fh_xo_hash64(t)


def farm_hash_64(s: bytes) -> int:
    """farmhash::Hash64 as the reference's SSE4.2 build resolves it
    (farmhashte): xo below 512 bytes, Hash64Long above."""
    n = len(s)
    if n >= 512:
        return _fh_te_hash64_long(s, n, K2, K1)
    return _fh_xo_hash64(s)


# ---------------------------------------------------------------- MetroHash
# metroHash64 = metrohash64_1 with seed 0
# (contrib/libmetrohash/src/metrohash64.cpp, J. Andrew Rogers, MIT) —
# re-derived in Python from the published algorithm.

_MH_K0 = 0xC83A91E1
_MH_K1 = 0x8648DBDB
_MH_K2 = 0x7BDEC03B
_MH_K3 = 0x2F5870A5


def metro_hash_64_1(s: bytes, seed: int = 0) -> int:
    k0, k1, k2, k3 = _MH_K0, _MH_K1, _MH_K2, _MH_K3
    n = len(s)
    h = (((seed + k2) * k0) + n) & M64
    i = 0
    if n >= 32:
        v = [h, h, h, h]
        while i + 32 <= n:
            v[0] = (_rot((v[0] + _fetch64(s, i) * k0) & M64, 29) + v[2]) & M64
            v[1] = (_rot((v[1] + _fetch64(s, i + 8) * k1) & M64, 29) + v[3]) & M64
            v[2] = (_rot((v[2] + _fetch64(s, i + 16) * k2) & M64, 29) + v[0]) & M64
            v[3] = (_rot((v[3] + _fetch64(s, i + 24) * k3) & M64, 29) + v[1]) & M64
            i += 32
        v[2] ^= (_rot((((v[0] + v[3]) * k0) + v[1]) & M64, 33) * k1) & M64
        v[3] ^= (_rot((((v[1] + v[2]) * k1) + v[0]) & M64, 33) * k0) & M64
        v[0] ^= (_rot((((v[0] + v[2]) * k0) + v[3]) & M64, 33) * k1) & M64
        v[1] ^= (_rot((((v[1] + v[3]) * k1) + v[2]) & M64, 33) * k0) & M64
        h = (h + (v[0] ^ v[1])) & M64
    if n - i >= 16:
        v0 = (_rot((h + _fetch64(s, i) * k0) & M64, 33) * k1) & M64
        v1 = (_rot((h + _fetch64(s, i + 8) * k1) & M64, 33) * k2) & M64
        i += 16
        v0 ^= (_rot((v0 * k0) & M64, 35) + v1) & M64
        v1 ^= (_rot((v1 * k3) & M64, 35) + v0) & M64
        h = (h + v1) & M64
    if n - i >= 8:
        h = (h + _fetch64(s, i) * k3) & M64
        i += 8
        h ^= (_rot(h, 33) * k1) & M64
    if n - i >= 4:
        h = (h + _fetch32(s, i) * k3) & M64
        i += 4
        h ^= (_rot(h, 15) * k1) & M64
    if n - i >= 2:
        h = (h + struct.unpack_from("<H", s, i)[0] * k3) & M64
        i += 2
        h ^= (_rot(h, 13) * k1) & M64
    if n - i >= 1:
        h = (h + s[i] * k3) & M64
        h ^= (_rot(h, 25) * k1) & M64
    h ^= _rot(h, 33)
    h = (h * k0) & M64
    h ^= _rot(h, 33)
    return h


# ------------------------------------------------------------- CRC32-C
# _mm_crc32_u64 emulation (SSE4.2 Castagnoli, bytewise table): the
# hash the reference's aggregation hash tables use for fixed keys
# (UInt128HashCRC32 in Interpreters/Aggregator.h:68).

_CRC32C_POLY = 0x82F63B78
_CRC32C_TBL: list[int] = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ _CRC32C_POLY if _c & 1 else _c >> 1
    _CRC32C_TBL.append(_c)
del _i, _c


def crc32c_u64(crc: int, word: int) -> int:
    """_mm_crc32_u64: CRC32-C update over the 8 little-endian bytes of
    ``word``; 32-bit running state, result zero-extended."""
    c = crc & 0xFFFFFFFF
    w = word & M64
    for _ in range(8):
        c = _CRC32C_TBL[(c ^ (w & 0xFF)) & 0xFF] ^ (c >> 8)
        w >>= 8
    return c


def keys128_slot_order(key_rows: list[tuple[int, ...]], widths: list[int]) -> list[int]:
    """Iteration order of the reference's keys128 aggregation hash
    table (Aggregator.h AggregatedDataWithKeys128 =
    HashMap<UInt128, ..., UInt128HashCRC32>, HashTableGrower<8>):
    keys packed little-endian into 16 bytes in GROUP BY order, bucket
    = crc32c(-1, lo64, hi64) masked, linear probing, resize (+2
    degrees) past 50% fill, iteration ascending buckets.  Returns for
    each input row its position in the iteration order."""
    def pack(vals: tuple[int, ...]) -> tuple[int, int]:
        b = bytearray(16)
        off = 0
        for v, w in zip(vals, widths):
            b[off : off + w] = (v & ((1 << (8 * w)) - 1)).to_bytes(
                8, "little"
            )[:w]
            off += w
        lo = int.from_bytes(b[:8], "little")
        hi = int.from_bytes(b[8:], "little")
        return lo, hi

    degree = 8
    slots: dict[int, int] = {}  # bucket -> input row index

    def insert_all(order: list[int]) -> None:
        nonlocal slots
        slots = {}
        mask = (1 << degree) - 1
        for ri in order:
            lo, hi = packed[ri]
            h = crc32c_u64(crc32c_u64(0xFFFFFFFFFFFFFFFF, lo), hi)
            b = h & mask
            while b in slots:
                b = (b + 1) & mask
            slots[b] = ri

    packed = [pack(v) for v in key_rows]
    inserted: list[int] = []
    for ri in range(len(key_rows)):
        inserted.append(ri)
        if len(inserted) > (1 << (degree - 1)):
            degree += 2
            insert_all(inserted)
        else:
            mask = (1 << degree) - 1
            lo, hi = packed[ri]
            h = crc32c_u64(crc32c_u64(0xFFFFFFFFFFFFFFFF, lo), hi)
            b = h & mask
            while b in slots:
                b = (b + 1) & mask
            slots[b] = ri
    out = [0] * len(key_rows)
    for pos, b in enumerate(sorted(slots)):
        out[slots[b]] = pos
    return out


def key64_slot_order(ranked_bits: list[tuple[int, int]]) -> list[int]:
    """Iteration order of the reference's key32/key64 aggregation hash
    table (Aggregator.h AggregatedDataWithUInt64Key = HashMap<UInt64,
    ..., HashCRC32<UInt64>>, HashTableGrower<8>): bucket =
    crc32c(-1ULL, key bits) masked, linear probing, inserts in
    FIRST-OCCURRENCE order (collisions probe past earlier keys), the
    zero-key special cell iterates first, then ascending buckets.
    ``ranked_bits`` is [(first_occurrence_rank, key_bits_u64)];
    returns each input row's iteration position (golden 00212)."""
    order = sorted(range(len(ranked_bits)), key=lambda i: ranked_bits[i][0])
    degree = 8
    slots: dict[int, int] = {}
    zero_ri: int | None = None

    def insert(ri: int) -> None:
        nonlocal zero_ri
        bits = ranked_bits[ri][1] & M64
        if bits == 0:
            zero_ri = ri
            return
        h = crc32c_u64(M64, bits)
        mask = (1 << degree) - 1
        b = h & mask
        while b in slots:
            b = (b + 1) & mask
        slots[b] = ri

    inserted: list[int] = []
    for ri in order:
        inserted.append(ri)
        if len(inserted) > (1 << (degree - 1)):
            # grower resize (+2 degrees); reinsertion approximates the
            # in-place rehash — exact below 128 keys (never resizes)
            degree += 2
            slots.clear()
            saved_zero = zero_ri
            for rj in inserted:
                insert(rj)
            zero_ri = saved_zero if zero_ri is None else zero_ri
        else:
            insert(ri)
    out = [0] * len(ranked_bits)
    pos = 0
    if zero_ri is not None:
        out[zero_ri] = pos
        pos += 1
    for b in sorted(slots):
        out[slots[b]] = pos
        pos += 1
    return out
