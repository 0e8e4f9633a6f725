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
    elements (insertImpl/thinOut).  thinOut re-applies the filter
    retroactively, so the bulk of the final set is
    {i : tz(hash_i) >= k_final} — with ONE order-dependent wrinkle:
    insertImpl appends the bump-TRIGGERING element unconditionally
    (samples.emplace_back after the while loop), so the element that
    forced the last bump survives even when its hash is not good at
    the final skip degree (golden 00273).  The bump points are found
    per segment with cumsums, so only ~k_final vectorized passes run,
    no per-row Python loop."""
    h = (_int_hash64(dets) & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    n = len(h)
    if n <= SAMPLE_COUNT - 1:
        return values
    # trailing zero bits of the 32-bit hash (h == 0 -> 32)
    tz = np.full(n, 32, dtype=np.int64)
    nz = h != 0
    hz = h[nz].astype(np.uint32)
    tz[nz] = np.log2(hz & (~hz + np.uint32(1))).astype(np.int64)

    k = 0
    straggler = -1  # index appended while not good at the current k
    s = 0  # next unprocessed element
    base = 0  # |{i < s : tz_i >= k}|
    while True:
        seg = tz[s:]
        good = seg >= k
        csum = np.cumsum(good)
        p = 1 if straggler >= 0 else 0
        # size before inserting relative element r = base + csum[r]-1 + p
        cond = good & (base + csum - 1 + p >= SAMPLE_COUNT - 1)
        if not cond.any():
            mask = tz >= k
            keep = values[mask]
            if straggler >= 0 and tz[straggler] < k:
                keep = np.append(keep, values[straggler])
            return keep
        j = s + int(np.argmax(cond))
        # ++skip_degree / thinOut until size + 1 < sample_count
        # (the straggler is dropped by the first thinOut)
        while True:
            k += 1
            size_after = int((tz[:j] >= k).sum())
            if size_after + 1 < SAMPLE_COUNT:
                break
        straggler = j if tz[j] < k else -1
        base = size_after + (1 if tz[j] >= k else 0)
        s = j + 1


# ------------------------------------------------- QuantileTiming Large
# AggregateFunctionQuantileTiming.h: tiny (<= 31 values) and medium
# states hold exact elements; once a 5673rd value arrives
# (mediumIsWorthToConvertToLarge: medium size >= sizeof(Large)/2/2 =
# 5672) the state becomes a histogram — exact counts per value below
# 1024, 16-wide buckets up to 30000 whose representative value carries
# an intHash32<0>(i) % 16 - 8 de-evening offset, values >= 30000 only
# counted.  get(level): walk to accumulated >= ceil(count * level).

_TIMING_SMALL = 1024
_TIMING_BIG = 30000
_TIMING_PREC = 16
_TIMING_MEDIUM_MAX = 5672  # sizeof(QuantileTimingLarge)/sizeof(UInt16)/2


def _int_hash32_salt0(key: int) -> int:
    """Hash.h:144 intHash32<0> — the rotate-based Thomas Wang 64->32."""
    m64 = (1 << 64) - 1
    rot = lambda v, s: ((v >> s) | (v << (64 - s))) & m64
    key = ((~key & m64) + ((key << 18) & m64)) & m64
    key ^= rot(key, 31)
    key = (key * 21) & m64
    key ^= rot(key, 11)
    key = (key + (key << 6)) & m64
    key ^= rot(key, 22)
    return key & 0xFFFFFFFF


_TIMING_BIG_KEYS: np.ndarray | None = None


def _timing_big_keys() -> np.ndarray:
    """Representative value per count_big bucket (indexInBigToValue)."""
    global _TIMING_BIG_KEYS
    if _TIMING_BIG_KEYS is None:
        big_size = (_TIMING_BIG - _TIMING_SMALL) // _TIMING_PREC
        _TIMING_BIG_KEYS = np.array(
            [
                i * _TIMING_PREC + _TIMING_SMALL
                + (_int_hash32_salt0(i) % _TIMING_PREC - _TIMING_PREC // 2)
                for i in range(big_size)
            ],
            dtype=np.int64,
        )
    return _TIMING_BIG_KEYS


def timing_quantiles(vals: np.ndarray, levels: list[float]) -> list[float]:
    """QuantileTiming get()/getMany() over one group's values."""
    n = len(vals)
    if n == 0:
        return [float("nan") for _ in levels]
    v = np.minimum(vals.astype(np.int64), _TIMING_BIG)
    v = np.maximum(v, 0)
    if n <= _TIMING_MEDIUM_MAX:
        s = np.sort(v)
        out = []
        for lv in levels:
            idx = int(n * lv) if lv != 1 else n - 1
            out.append(float(s[min(idx, n - 1)]))
        return out
    # Large histogram
    small = np.bincount(v[v < _TIMING_SMALL], minlength=_TIMING_SMALL)
    inbig = v[(v >= _TIMING_SMALL) & (v < _TIMING_BIG)]
    big_size = (_TIMING_BIG - _TIMING_SMALL) // _TIMING_PREC
    big = np.bincount((inbig - _TIMING_SMALL) // _TIMING_PREC, minlength=big_size)
    keys = np.concatenate(
        [np.arange(_TIMING_SMALL, dtype=np.int64), _timing_big_keys()]
    )
    counts = np.concatenate([small, big])
    csum = np.cumsum(counts)
    out = []
    for lv in levels:
        pos = int(np.ceil(n * lv))
        hit = np.searchsorted(csum, max(pos, 1), side="left")
        if hit >= len(csum) or csum[-1] < pos:
            out.append(float(_TIMING_BIG))
        else:
            out.append(float(keys[hit]))
    return out


# ---------------------------------------------------------- uniqHLL12
# HyperLogLogWithSmallSetOptimization<Key, 16, 12> (Common/
# HyperLogLogWithSmallSetOptimization.h + HyperLogLogCounter.h):
# up to 16 distinct keys counted exactly; beyond that an HLL with 4096
# buckets over a 32-bit hash — IntHash32<UInt64> (salt 0) of the key
# for single-argument uniqHLL12, TrivialHash (low-32 truncation of the
# already-hashed variadic key) for the multi-argument form
# (AggregateFunctionUniq.h HLL12Data vs HLL12DataForVariadic).

_HLL12_PRECISION = 12
_HLL12_BUCKETS = 1 << _HLL12_PRECISION
_HLL12_MAX_RANK = 32 - _HLL12_PRECISION + 1  # 21


def _int_hash32_salt0_vec(key: np.ndarray) -> np.ndarray:
    """Hash.h:144 intHash32<0>, vectorized over uint64."""
    m = np.uint64
    key = key.astype(np.uint64).copy()
    rot = lambda v, s: (v >> m(s)) | (v << m(64 - s))
    with np.errstate(over="ignore"):
        key = (~key) + (key << m(18))
        key ^= rot(key, 31)
        key *= m(21)
        key ^= rot(key, 11)
        key += key << m(6)
        key ^= rot(key, 22)
    return (key & m(0xFFFFFFFF)).astype(np.uint32)


def hll12_count(keys: np.ndarray, trivial_hash: bool) -> int:
    """uniqHLL12 over one group's inserted keys (uint64)."""
    uniq_keys = np.unique(keys)
    if len(uniq_keys) <= 16:
        return len(uniq_keys)
    if trivial_hash:
        h = (uniq_keys & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    else:
        h = _int_hash32_salt0_vec(uniq_keys)
    bucket = (h & np.uint32(_HLL12_BUCKETS - 1)).astype(np.int64)
    tail = (h >> np.uint32(_HLL12_PRECISION)).astype(np.uint32)
    # rank = trailing zeros + 1, capped at max_rank; tail == 0 -> max
    rank = np.full(len(tail), _HLL12_MAX_RANK, dtype=np.int64)
    nz = tail != 0
    tnz = tail[nz]
    rank[nz] = np.minimum(
        np.log2(tnz & (~tnz + np.uint32(1))).astype(np.int64) + 1,
        _HLL12_MAX_RANK,
    )
    ranks = np.zeros(_HLL12_BUCKETS, dtype=np.int64)
    np.maximum.at(ranks, bucket, rank)
    rank_count = np.bincount(ranks, minlength=_HLL12_MAX_RANK + 1)
    zeros = int(rank_count[0])
    # stable denominator (isBigRankStore + StableIfBig): long-double
    # Horner over the rank histogram
    val = np.longdouble(rank_count[_HLL12_MAX_RANK])
    for i in range(_HLL12_MAX_RANK - 1, -1, -1):
        val /= np.longdouble(2)
        val += np.longdouble(rank_count[i])
    denominator = float(val)
    alpha_m = 0.7213 / (1 + 1.079 / _HLL12_BUCKETS)
    raw = alpha_m * _HLL12_BUCKETS * _HLL12_BUCKETS / denominator
    # FullFeatured with the trivial bias estimator
    pow2_32 = 4294967296.0
    import math

    if raw > pow2_32 / 30.0:
        fixed = -pow2_32 * math.log(1.0 - raw / pow2_32)
    elif raw <= 2.5 * _HLL12_BUCKETS:
        if zeros != 0:
            fixed = _HLL12_BUCKETS * (
                math.log(_HLL12_BUCKETS) - math.log(zeros)
            )
        else:
            fixed = raw
    else:
        fixed = raw
    return int(np.uint32(int(fixed + 0.5)))


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

    @F.pandas_udf(ArrayType(DoubleType()))
    def ch_timing_quantiles(values: pd.Series, levels: pd.Series) -> pd.Series:
        out = []
        for vals, lvls in zip(values, levels):
            arr = np.asarray([] if vals is None else vals, dtype=np.int64)
            out.append(timing_quantiles(arr, [float(p) for p in lvls]))
        return pd.Series(out)

    spark.udf.register("ch_timing_quantiles", ch_timing_quantiles)


_UC_BUCKETS = 1 << 17  # uniqCombined HLL precision 17


def _uc_bias(raw: float) -> float:
    """HyperLogLogBiasEstimator::getBias — linear interpolation over
    the reference's measured (raw_estimate, bias) table."""
    from .uniq_combined_bias import BIASES, RAW_ESTIMATES

    import bisect

    i = bisect.bisect_left(RAW_ESTIMATES, raw)
    if i == len(RAW_ESTIMATES):
        return BIASES[-1]
    if RAW_ESTIMATES[i] == raw:
        return BIASES[i]
    if i == 0:
        return BIASES[0]
    e1, e2 = RAW_ESTIMATES[i - 1], RAW_ESTIMATES[i]
    b1, b2 = BIASES[i - 1], BIASES[i]
    return b1 + (b2 - b1) * (raw - e1) / (e2 - e1)


def uniq_combined_count(keys: np.ndarray, kind: str) -> int:
    """uniqCombined over one group's values (AggregateFunctionUniq.h
    BaseUniqCombinedData: CombinedCardinalityEstimator<…, 16, 14, 17>).

    ``kind``:
      'num'  — keys are value bit patterns; estimator key =
               UInt32(intHash64(key)) (AggregateFunctionUniqCombinedTraits)
      'str'  — keys are CityHash64(value); estimator key = the full
               UInt64 (BaseUniqCombinedData<String>)
      'var'  — keys are UniqVariadicHash u64; estimator key is its
               LOW 32 bits (Key=UInt32 insert truncation)

    Tiers: a 16-element small set, an exact HashSet to 2^14 distinct
    hashed keys, then HyperLogLogCounter<17> (TrivialHash over the
    key, StableIfBig long-double denominator, FullFeatured mode with
    the HLL++ bias tables and the 177700 LinearCounting threshold).
    The medium→large handoff fires on the first insert AFTER the set
    holds 2^14 keys; with only the distinct multiset available we go
    large whenever 2^14 is reached and any insert follows (exact when
    the 2^14-th distinct key is the group's final row, which the
    corpus does not exercise)."""
    import math

    keys = keys.astype(np.uint64)
    # optional estimation-mode suffix (HyperLogLogCounter.h
    # fixRawEstimate): 'full' (default), 'raw', 'lc', 'bias' — the
    # uniqCombinedRaw/LinearCounting/BiasCorrected dev variants share
    # the tiers and differ only in the final fix
    mode = "full"
    if ":" in kind:
        kind, mode = kind.split(":", 1)
    if kind == "num":
        h = (_int_hash64(np.unique(keys)) & np.uint64(0xFFFFFFFF)).astype(
            np.uint64
        )
        width = 32
    elif kind == "var":
        h = np.unique(keys) & np.uint64(0xFFFFFFFF)
        width = 32
    else:
        h = np.unique(keys)
        width = 64
    uniq = np.unique(h)
    n = len(uniq)
    if n <= 16:
        return n
    if n < (1 << 14) or (n == (1 << 14) and len(keys) == n):
        return n
    max_rank = width - 17 + 1
    bucket = (uniq & np.uint64(_UC_BUCKETS - 1)).astype(np.int64)
    tail = uniq >> np.uint64(17)
    rank = np.full(len(tail), max_rank, dtype=np.int64)
    nz = tail != 0
    tnz = tail[nz]
    # trailing zeros + 1, capped
    lsb = (tnz & (~tnz + np.uint64(1))).astype(np.float64)
    rank[nz] = np.minimum(np.round(np.log2(lsb)).astype(np.int64) + 1, max_rank)
    ranks = np.zeros(_UC_BUCKETS, dtype=np.int64)
    np.maximum.at(ranks, bucket, rank)
    rank_count = np.bincount(ranks, minlength=max_rank + 1)
    zeros = int(rank_count[0])
    val = np.longdouble(rank_count[max_rank])
    for i in range(max_rank - 1, -1, -1):
        val /= np.longdouble(2)
        val += np.longdouble(rank_count[i])
    denominator = float(val)
    alpha_m = 0.7213 / (1 + 1.079 / _UC_BUCKETS)
    raw = alpha_m * _UC_BUCKETS * _UC_BUCKETS / denominator
    pow2_32 = 4294967296.0
    if mode == "raw":
        # HyperLogLogMode::Raw — no corrections
        fixed = raw
    elif mode == "lc":
        # HyperLogLogMode::LinearCounting — Whang et al. correction
        # whenever any bucket is empty, else the raw estimate
        fixed = (
            _UC_BUCKETS * (math.log(_UC_BUCKETS) - math.log(zeros))
            if zeros != 0
            else raw
        )
    elif mode == "bias":
        # HyperLogLogMode::BiasCorrected — HLL++ bias subtraction only
        fixed = raw - _uc_bias(raw) if raw <= 5.0 * _UC_BUCKETS else raw
    elif width == 32 and raw > pow2_32 / 30.0:
        fixed = -pow2_32 * math.log(1.0 - raw / pow2_32)
    else:
        # FullFeatured: applyCorrection with the non-trivial bias
        # estimator
        fixed = raw - _uc_bias(raw) if raw <= 5.0 * _UC_BUCKETS else raw
        if zeros != 0:
            linear = _UC_BUCKETS * (
                math.log(_UC_BUCKETS) - math.log(zeros)
            )
        else:
            linear = fixed
        from .uniq_combined_bias import THRESHOLD

        if linear < THRESHOLD:
            fixed = linear
    return int(np.uint32(int(fixed + 0.5)))
