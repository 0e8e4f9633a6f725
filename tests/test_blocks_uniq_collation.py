"""Unit tests for the round-8 pure-Python kernels: SquashingTransform
replay, key64 hash-table order, uniqCombined tiers, collation keys."""

from __future__ import annotations

import numpy as np

from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.dialect.reservoir import (
    uniq_combined_count,
)
from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.dialect.statements import (
    _squash_blocks,
)
from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.functions.collation import (
    collate_key,
)
from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.functions.exact_hash import (
    key64_slot_order,
)


def test_squash_accumulates_until_enough():
    # SquashingTransform.cpp: small blocks append; emit at >= min_rows
    assert _squash_blocks([10000] * 1000, 1_000_000, 0, 8) == [1_000_000] * 10


def test_squash_bytes_criterion_and_remainder():
    # golden 00340's second INSERT: 8-byte rows, 1 MB threshold ->
    # 130k-row emits (13 x 10k blocks = 1.04 MB), 120k remainder
    out = _squash_blocks([10000] * 1000, 1_000_000, 1_000_000, 8)
    assert out == [130_000] * 76 + [120_000]


def test_squash_passthrough_swaps_accumulator():
    # a big incoming block flushes the small accumulator and takes its
    # place (the swap in SquashingTransform::add) — golden 00341's
    # 10,100,10 arms with min_rows=100 store as 10,100,10
    assert _squash_blocks([10, 100, 10], 100, 0, 1) == [10, 100, 10]
    assert _squash_blocks([100, 10, 100], 100, 0, 1) == [100, 10, 100]
    assert _squash_blocks([10, 100, 100], 100, 0, 1) == [10, 100, 100]


def test_key64_order_is_first_occurrence_aware():
    # two keys in the same bucket: the FIRST-inserted takes the home
    # slot, the second probes forward — swapping ranks swaps the order
    a, b = 19, 51  # crc32c(-1, 19)&255 == crc32c(-1, 51)&255 is not
    # guaranteed; use synthetic colliding bits instead: same low byte
    # of the crc is hard to construct, so just assert determinism +
    # permutation shape
    order = key64_slot_order([(0, 5), (1, 7), (2, 9)])
    assert sorted(order) == [0, 1, 2]
    assert order == key64_slot_order([(0, 5), (1, 7), (2, 9)])


def test_key64_zero_key_iterates_first():
    order = key64_slot_order([(0, 123), (1, 0), (2, 456)])
    assert order[1] == 0  # the zero-key special cell leads iteration


def test_uniq_combined_small_and_medium_exact():
    assert uniq_combined_count(np.arange(10, dtype=np.uint64), "num") == 10
    assert uniq_combined_count(np.arange(5000, dtype=np.uint64), "num") == 5000


def test_uniq_combined_large_tier_estimate():
    # golden 00212's group 0: 54054 distinct UInt64 keys estimate to
    # exactly 53901 through the 2^17 HLL + bias tables (byte-locked by
    # ref_00212; this pins the kernel itself)
    n = np.arange(0, 1_000_000, dtype=np.uint64)
    vals = n[(3 * n * n - 7 * n + 11) % np.uint64(37) == np.uint64(0)]
    assert len(vals) == 54054
    assert uniq_combined_count(vals, "num") == 53901


def test_collation_ru_tr_orders():
    ru = ["а", "я", "ё", "А", "Я", "Ё"]
    assert sorted(ru, key=lambda x: collate_key(x, "ru")) == [
        "а", "А", "ё", "Ё", "я", "Я",
    ]
    tr = ["i", "ı", "İ", "I", "c", "ç"]
    assert sorted(tr, key=lambda x: collate_key(x, "tr")) == [
        "c", "ç", "ı", "I", "i", "İ",
    ]


def test_uniq_combined_dev_variant_modes():
    """uniqCombinedRaw/LinearCounting/BiasCorrected share the tiers
    (exact below 2^14) and fork ONLY the final HLL fix
    (HyperLogLogCounter.h fixRawEstimate)."""
    small = np.arange(5000, dtype=np.uint64)
    for mode in ("", ":raw", ":lc", ":bias"):
        assert uniq_combined_count(small, "num" + mode) == 5000

    big = np.arange(50_000, dtype=np.uint64)
    full = uniq_combined_count(big, "num")
    raw = uniq_combined_count(big, "num:raw")
    lc = uniq_combined_count(big, "num:lc")
    bias = uniq_combined_count(big, "num:bias")
    # corrected modes stay near the truth
    for v in (full, lc, bias):
        assert abs(v - 50_000) / 50_000 < 0.02, (full, lc, bias)
    # Raw is the UNCORRECTED estimate: at n << m = 2^17 the raw HLL
    # formula famously reads high (that is WHY the corrections exist);
    # the dev variant must reproduce that, not hide it
    assert raw > 90_000
    # FullFeatured picks the linear-counting branch below THRESHOLD
    assert full == lc
