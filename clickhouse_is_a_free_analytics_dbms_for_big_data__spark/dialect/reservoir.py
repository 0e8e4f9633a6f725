"""Bit-exact ReservoirSampler emulation for quantile()/quantiles()/
median() (dbms/src/AggregateFunctions/ReservoirSampler.h).

The reference's plain quantile family samples: the first 8192 values
fill the reservoir, each later value v_i (1-based counter i) draws
``rnd = taus88() % i`` and replaces ``samples[rnd]`` when
``rnd < 8192``; the result interpolates linearly between the sorted
samples (quantileInterpolated).  boost::taus88 (contrib boost
random/taus88.hpp: xor-combine of three linear_feedback_shift engines
(31,13,12)/(29,2,4)/(28,3,17)) is seeded with the constant 123456 per
aggregation state (ReservoirSampler.h:57), so the random stream is
IDENTICAL for every group — computed once here and cached, which
makes the per-group replay a vectorized numpy last-write-wins instead
of a Python loop.

Exactness holds for single-stream insertion order (how the goldens
run: one block pipeline per query).  Multi-partition merges would go
through ReservoirSampler::merge's shuffle path, which is
order-dependent in the reference too — not emulated.
"""

import numpy as np
import pandas as pd

SAMPLE_COUNT = 8192
_M32 = 0xFFFFFFFF

# (k, q, s) per linear_feedback_shift_engine<uint32_t, 32, k, q, s>
_LFS = ((31, 13, 12), (29, 2, 4), (28, 3, 17))


def _taus88_stream(n: int) -> np.ndarray:
    """First n outputs of boost::taus88 seeded with 123456."""
    out = np.empty(n, dtype=np.uint64)
    # seed: value = s & wordmask; if value < (1 << (w-k)): value += it
    vs = []
    for k, _q, _s in _LFS:
        v = 123456 & _M32
        if v < (1 << (32 - k)):
            v += 1 << (32 - k)
        vs.append(v)
    v1, v2, v3 = vs
    for i in range(n):
        r = 0
        nxt = []
        for (k, q, s), v in zip(_LFS, (v1, v2, v3)):
            b = (((v << q) ^ v) & _M32) >> (k - s)
            mask = (_M32 << (32 - k)) & _M32
            v = (((v & mask) << s) ^ b) & _M32
            r ^= v
            nxt.append(v)
        v1, v2, v3 = nxt
        out[i] = r
    return out


_stream_cache = np.empty(0, dtype=np.uint64)


def _stream(n: int) -> np.ndarray:
    global _stream_cache
    if len(_stream_cache) < n:
        _stream_cache = _taus88_stream(max(n, 2 * len(_stream_cache), 65536))
    return _stream_cache[:n]


def reservoir_samples(values: np.ndarray) -> np.ndarray:
    """Replay the reference's insertion into a fresh sampler."""
    n = len(values)
    if n <= SAMPLE_COUNT:
        return values
    samples = values[:SAMPLE_COUNT].copy()
    # value #i (1-based total_values = SAMPLE_COUNT+1 .. n) draws one
    # taus88 output: rnd = uint32(rng()) % uint32(total_values)
    rng = _stream(n - SAMPLE_COUNT)
    totals = np.arange(SAMPLE_COUNT + 1, n + 1, dtype=np.uint64)
    rnd = rng % totals
    sel = rnd < SAMPLE_COUNT
    # numpy fancy assignment keeps the LAST write per slot — the same
    # result as the reference's sequential overwrites
    samples[rnd[sel].astype(np.int64)] = values[SAMPLE_COUNT:][sel]
    return samples


def quantile_interpolated(samples: np.ndarray, level: float) -> float:
    """ReservoirSampler::quantileInterpolated."""
    if len(samples) == 0:
        return float("nan")
    s = np.sort(samples)
    index = max(0.0, min(len(s) - 1.0, level * (len(s) - 1)))
    left = int(index)
    right = left + 1
    if right == len(s):
        return float(s[left])
    return float(s[left]) * (right - index) + float(s[right]) * (index - left)


def _int_hash64(x: np.ndarray) -> np.ndarray:
    """Common/HashTable/Hash.h intHash64 (MurmurHash finalizer),
    vectorized over uint64."""
    x = x.astype(np.uint64).copy()
    with np.errstate(over="ignore"):
        x ^= x >> np.uint64(33)
        x *= np.uint64(0xFF51AFD7ED558CCD)
        x ^= x >> np.uint64(33)
        x *= np.uint64(0xC4CEB9FE1A85EC53)
        x ^= x >> np.uint64(33)
    return x


def deterministic_samples(
    values: np.ndarray, dets: np.ndarray
) -> np.ndarray:
    """ReservoirSamplerDeterministic: keep value i iff the low
    ``skip_degree`` bits of uint32(intHash64(det_i)) are zero, where
    skip_degree is bumped whenever the reservoir would exceed 8191
    elements (insertImpl/thinOut).  Because thinOut re-applies the
    same filter retroactively, the final sample set is exactly
    {i : tz(hash_i) >= k} for the smallest k whose population is
    <= 8191 — order-independent, hence safe under any partitioning."""
    h = (_int_hash64(dets) & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    if len(h) <= SAMPLE_COUNT - 1:
        return values
    # trailing zero bits of the 32-bit hash (h == 0 -> 32)
    tz = np.full(len(h), 32, dtype=np.int32)
    nz = h != 0
    hz = h[nz].astype(np.uint32)
    tz[nz] = np.log2(hz & (~hz + np.uint32(1))).astype(np.int32)
    for k in range(0, 33):
        if int((tz >= k).sum()) <= SAMPLE_COUNT - 1:
            return values[tz >= k]
    return values[tz >= 32]


def register(spark) -> None:
    """Register ch_rsv_quantiles(values array<double>, levels
    array<double>) -> array<double> as an Arrow-batched UDF (rows are
    aggregation GROUPS, not source rows — batch sizes stay tiny)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, DoubleType

    @F.pandas_udf(ArrayType(DoubleType()))
    def ch_rsv_quantiles(values: pd.Series, levels: pd.Series) -> pd.Series:
        out = []
        for vals, lvls in zip(values, levels):
            arr = np.asarray(
                [] if vals is None else vals, dtype=np.float64
            )
            smp = reservoir_samples(arr)
            out.append([quantile_interpolated(smp, float(p)) for p in lvls])
        return pd.Series(out)

    spark.udf.register("ch_rsv_quantiles", ch_rsv_quantiles)

    @F.pandas_udf(ArrayType(DoubleType()))
    def ch_rsv_det_quantiles(
        values: pd.Series, dets: pd.Series, levels: pd.Series
    ) -> pd.Series:
        out = []
        for vals, ds, lvls in zip(values, dets, levels):
            arr = np.asarray(
                [] if vals is None else vals, dtype=np.float64
            )
            det = np.asarray(
                [] if ds is None else ds, dtype=np.int64
            ).astype(np.uint64)
            smp = deterministic_samples(arr, det)
            out.append([quantile_interpolated(smp, float(p)) for p in lvls])
        return pd.Series(out)

    spark.udf.register("ch_rsv_det_quantiles", ch_rsv_det_quantiles)
