"""Unit tests for the long-tail functions added after the main dialect
sweep: arrayEnumerateUniq, arrayReduce, reinterpret*."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.functions.arrays import (
    arrayEnumerateUniq,
    arrayReduce,
)
from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.functions.reinterpret import (
    reinterpretAsDate,
    reinterpretAsDateTime,
    reinterpretAsString,
    reinterpretAsUInt32,
    reinterpretAsUInt64,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_enumerate_uniq(spark):
    got = _one(spark, arrayEnumerateUniq(F.array(*[F.lit(x) for x in [10, 20, 10, 30, 10, 20]])))
    assert got == [1, 1, 2, 1, 3, 2]


def test_enumerate_uniq_empty(spark):
    got = _one(spark, arrayEnumerateUniq(F.array().cast("array<int>")))
    assert got == []


@pytest.mark.parametrize(
    "agg,expected",
    [
        ("sum", 10.0),
        ("min", 1),
        ("max", 4),
        ("avg", 2.5),
        ("count", 4),
        ("uniqExact", 4),
        ("any", 1),
        ("anyLast", 4),
        ("groupUniqArray", [1, 2, 3, 4]),
    ],
)
def test_array_reduce(spark, agg, expected):
    arr = F.array(*[F.lit(x) for x in [1, 2, 3, 4]])
    got = _one(spark, arrayReduce(agg, arr))
    if isinstance(expected, list):
        assert sorted(got) == expected
    else:
        assert got == expected


def test_array_reduce_median(spark):
    arr = F.array(*[F.lit(x) for x in [5, 1, 9]])
    assert _one(spark, arrayReduce("median", arr)) == 5


def test_array_reduce_unknown(spark):
    with pytest.raises(ValueError):
        arrayReduce("bogus", F.array())


def test_reinterpret_string(spark):
    # 0x3039 = 12345 → bytes 0x39 '9', 0x30 '0' little-endian
    assert _one(spark, reinterpretAsString(F.lit(12345))) == "90"
    assert _one(spark, reinterpretAsString(F.lit(65))) == "A"


def test_reinterpret_string_roundtrip(spark):
    for n in (1, 65, 12345, 4294967295):
        got = _one(spark, reinterpretAsUInt64(reinterpretAsString(F.lit(n))))
        assert got == n, n


def test_reinterpret_uint32_truncates(spark):
    # only the first 4 bytes participate
    assert _one(spark, reinterpretAsUInt32(F.lit("AAAAAA"))) == 0x41414141


def test_reinterpret_dates(spark):
    assert str(_one(spark, reinterpretAsDate(F.lit(1)))) == "1970-01-02"
    assert str(_one(spark, reinterpretAsDateTime(F.lit(86400)))).startswith("1970-01-02")


def test_reinterpret_string_no_nul(spark):
    # all 8 bytes nonzero (ADVICE regression: array_position yields 0,
    # not NULL, when no NUL byte exists)
    assert _one(spark, reinterpretAsString(F.lit(0x4141414141414141))) == "AAAAAAAA"
