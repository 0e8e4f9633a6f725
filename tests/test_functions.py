"""Behavior tests for the scalar-function dialect (SURVEY.md §2.8).

Style mirrors the reference's golden functional tests
(dbms/tests/queries/0_stateless): tiny literal inputs, exact expected
outputs — but as assertions, not byte-diffs.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

import clickhouse_is_a_free_analytics_dbms_for_big_data__spark.functions as ch


@pytest.fixture(scope="module")
def one(spark):
    return spark.range(1)


def val(df, col):
    return df.select(col.alias("v")).first()["v"]


# -- arithmetic -------------------------------------------------------------


def test_int_div(one):
    assert val(one, ch.intDiv(F.lit(7), 2)) == 3
    assert val(one, ch.intDiv(F.lit(-7), 2)) == -3  # trunc toward zero
    assert val(one, ch.intDivOrZero(F.lit(7), 0)) == 0


def test_modulo_negate_abs(one):
    assert val(one, ch.modulo(F.lit(7), 3)) == 1
    assert val(one, ch.negate(F.lit(5))) == -5
    assert val(one, ch.abs_(F.lit(-5))) == 5


def test_bit_ops(one):
    assert val(one, ch.bitAnd(F.lit(6), 3)) == 2
    assert val(one, ch.bitOr(F.lit(6), 3)) == 7
    assert val(one, ch.bitXor(F.lit(6), 3)) == 5
    assert val(one, ch.bitShiftLeft(F.lit(1), 4)) == 16


def test_xor_logical(one):
    assert val(one, ch.xor(F.lit(1), F.lit(0))) is True
    assert val(one, ch.xor(F.lit(1), F.lit(1))) is False


# -- strings ----------------------------------------------------------------


def test_string_basics(one):
    assert val(one, ch.length(F.lit("héllo"))) == 6  # bytes
    assert val(one, ch.lengthUTF8(F.lit("héllo"))) == 5  # chars
    assert val(one, ch.empty(F.lit(""))) is True
    assert val(one, ch.notEmpty(F.lit("x"))) is True
    assert val(one, ch.reverse(F.lit("abc"))) == "cba"
    assert val(one, ch.concat(F.lit("a"), "b", F.lit("c"))) == "abc"
    assert val(one, ch.substring(F.lit("hello"), 2, 3)) == "ell"
    assert val(one, ch.appendTrailingCharIfAbsent(F.lit("dir"), "/")) == "dir/"
    assert val(one, ch.appendTrailingCharIfAbsent(F.lit("dir/"), "/")) == "dir/"


def test_string_search(one):
    assert val(one, ch.position(F.lit("hello"), "ll")) == 3
    assert val(one, ch.position(F.lit("hello"), "zz")) == 0
    assert val(one, ch.positionCaseInsensitive(F.lit("HeLLo"), "ll")) == 3
    assert val(one, ch.match(F.lit("abc123"), r"\d+")) is True
    assert val(one, ch.like(F.lit("hello"), "he%")) is True
    assert val(one, ch.extract(F.lit("v=42;"), r"v=(\d+)")) == "42"


def test_replace(one):
    assert val(one, ch.replaceOne(F.lit("aaa"), "a", "b")) == "baa"
    assert val(one, ch.replaceAll(F.lit("aaa"), "a", "b")) == "bbb"
    assert val(one, ch.replaceRegexpOne(F.lit("a1a2"), r"\d", "x")) == "axa2"
    assert val(one, ch.replaceRegexpAll(F.lit("a1a2"), r"\d", "x")) == "axax"
    assert val(one, ch.replaceOne(F.lit("abc"), "zz", "x")) == "abc"


def test_split(one):
    assert val(one, ch.splitByChar(",", F.lit("a,b,,c"))) == ["a", "b", "", "c"]
    assert val(one, ch.alphaTokens(F.lit("ab12cd ef"))) == ["ab", "cd", "ef"]
    assert val(one, ch.arrayStringConcat(F.array(F.lit("a"), F.lit("b")), "-")) == "a-b"


# -- datetime ---------------------------------------------------------------


def test_datetime_parts(one):
    ts = F.lit("2024-03-15 13:45:30").cast("timestamp")
    assert val(one, ch.toYear(ts)) == 2024
    assert val(one, ch.toMonth(ts)) == 3
    assert val(one, ch.toDayOfMonth(ts)) == 15
    assert val(one, ch.toDayOfWeek(ts)) == 5  # Friday, Monday=1
    assert val(one, ch.toHour(ts)) == 13
    assert val(one, ch.toMinute(ts)) == 45
    assert val(one, ch.toSecond(ts)) == 30


def test_datetime_truncation(one):
    ts = F.lit("2024-03-15 13:45:30").cast("timestamp")
    assert str(val(one, ch.toMonday(ts))) == "2024-03-11"
    assert str(val(one, ch.toStartOfMonth(ts))) == "2024-03-01"
    assert str(val(one, ch.toStartOfQuarter(ts))) == "2024-01-01"
    assert str(val(one, ch.toStartOfFiveMinute(ts))) == "2024-03-15 13:45:00"
    assert str(val(one, ch.timeSlot(ts))) == "2024-03-15 13:30:00"
    assert val(one, ch.toRelativeDayNum(F.lit("1970-01-10").cast("date"))) == 9


# -- conversion -------------------------------------------------------------


def test_conversions(one):
    assert val(one, ch.toInt32(F.lit("42"))) == 42
    assert val(one, ch.toInt32OrZero(F.lit("oops"))) == 0
    assert val(one, ch.toFloat64OrZero(F.lit("1.5"))) == 1.5
    assert val(one, ch.toString(F.lit(42))) == "42"
    assert str(val(one, ch.toDate(F.lit("2024-03-15 13:00:00")))) == "2024-03-15"
    assert val(one, ch.toUnixTimestamp(F.lit("1970-01-01 00:01:00"))) == 60


# -- rounding ---------------------------------------------------------------


def test_rounding(one):
    assert val(one, ch.round_(F.lit(2.5))) == 2.0  # banker's
    assert val(one, ch.round_(F.lit(3.5))) == 4.0
    assert val(one, ch.roundToExp2(F.lit(100))) == 64
    assert val(one, ch.roundToExp2(F.lit(0))) == 0
    assert val(one, ch.roundDuration(F.lit(95))) == 60
    assert val(one, ch.roundAge(F.lit(30))) == 25


# -- conditional / null -----------------------------------------------------


def test_conditional(one):
    assert val(one, ch.if_(F.lit(True), "a", "b")) == "a"
    assert (
        val(one, ch.multiIf(F.lit(False), "a", F.lit(True), "b", "c")) == "b"
    )
    assert val(one, ch.caseWithExpr(F.lit(2), 1, "one", 2, "two", "other")) == "two"
    assert val(one, ch.ifNull(F.lit(None).cast("int"), 7)) == 7
    assert val(one, ch.nullIf(F.lit(5), 5)) is None


# -- arrays -----------------------------------------------------------------


def test_array_element(one):
    arr = F.array(F.lit(10), F.lit(20), F.lit(30))
    assert val(one, ch.arrayElement(arr, 1)) == 10
    assert val(one, ch.arrayElement(arr, -1)) == 30
    assert val(one, ch.arrayElement(arr, 99)) == 0  # type default, not NULL
    assert val(one, ch.arrayElementOrNull(arr, 99)) is None


def test_array_basics(one):
    arr = F.array(F.lit(1), F.lit(2), F.lit(2), F.lit(3))
    assert val(one, ch.has(arr, 2)) is True
    assert val(one, ch.indexOf(arr, 2)) == 2
    assert val(one, ch.indexOf(arr, 9)) == 0
    assert val(one, ch.countEqual(arr, 2)) == 2
    assert val(one, ch.arrayUniq(arr)) == 3
    assert val(one, ch.arrayEnumerate(arr)) == [1, 2, 3, 4]
    assert val(one, ch.range_(3)) == [0, 1, 2]
    assert val(one, ch.range_(0)) == []
    assert val(one, ch.arraySlice(arr, 2, 2)) == [2, 2]
    assert val(one, ch.arrayResize(arr, 6, 0)) == [1, 2, 2, 3, 0, 0]


def test_higher_order(one):
    arr = F.array(F.lit(3), F.lit(1), F.lit(2))
    assert val(one, ch.arrayMap(lambda x: x * 2, arr)) == [6, 2, 4]
    assert val(one, ch.arrayFilter(lambda x: x > 1, arr)) == [3, 2]
    assert val(one, ch.arrayCount(lambda x: x > 1, arr)) == 2
    assert val(one, ch.arrayExists(lambda x: x == 2, arr)) is True
    assert val(one, ch.arrayAll(lambda x: x > 0, arr)) is True
    assert val(one, ch.arraySum(arr)) == 6.0
    assert val(one, ch.arraySort(arr)) == [1, 2, 3]
    assert val(one, ch.arrayReverseSort(arr)) == [3, 2, 1]
    assert val(one, ch.arrayFirst(lambda x: x > 1, arr)) == 3
    assert val(one, ch.arrayFirstIndex(lambda x: x == 2, arr)) == 3
    assert val(one, ch.arrayFirstIndex(lambda x: x == 9, arr)) == 0
    assert val(one, ch.arrayCumSum(arr)) == [3.0, 4.0, 6.0]


# -- math -------------------------------------------------------------------


def test_math(one):
    assert abs(val(one, ch.erf(F.lit(1.0))) - math.erf(1.0)) < 1e-6
    assert abs(val(one, ch.erfc(F.lit(0.5))) - math.erfc(0.5)) < 1e-6
    assert abs(val(one, ch.lgamma(F.lit(5.0))) - math.lgamma(5.0)) < 1e-8
    assert abs(val(one, ch.tgamma(F.lit(5.0))) - 24.0) < 1e-6
    assert abs(val(one, ch.exp10(F.lit(2.0))) - 100.0) < 1e-9
    assert abs(val(one, ch.cbrt(F.lit(27.0))) - 3.0) < 1e-9


# -- hashing ----------------------------------------------------------------


def test_hashing(one):
    assert val(one, ch.MD5(F.lit("abc"))) == "900150983cd24fb0d6963f7d28e17f72"
    assert (
        val(one, ch.SHA256(F.lit("abc")))
        == "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"
    )
    # intHash64 is an exact avalanche: distinct inputs -> distinct outputs
    df = val(one, F.array(*[ch.intHash64(F.lit(i)) for i in range(5)]))
    assert len(set(df)) == 5
    assert 0 <= val(one, ch.hashMod(F.lit("key"), 32)) < 32


# -- url --------------------------------------------------------------------


def test_url(one):
    u = F.lit("https://www.example.com/a/b?x=1&y=2#frag")
    assert val(one, ch.protocol(u)) == "https"
    assert val(one, ch.domain(u)) == "www.example.com"
    assert val(one, ch.domainWithoutWWW(u)) == "example.com"
    assert val(one, ch.topLevelDomain(u)) == "com"
    assert val(one, ch.path(u)) == "/a/b"
    assert val(one, ch.queryString(u)) == "x=1&y=2"
    assert val(one, ch.fragment(u)) == "frag"
    assert val(one, ch.extractURLParameter(u, "y")) == "2"
    assert val(one, ch.extractURLParameterNames(u)) == ["x", "y"]
    assert val(one, ch.cutWWW(u)) == "https://example.com/a/b?x=1&y=2#frag"
    assert val(one, ch.cutFragment(u)) == "https://www.example.com/a/b?x=1&y=2"
    assert (
        val(one, ch.cutQueryStringAndFragment(u))
        == "https://www.example.com/a/b"
    )
    assert val(one, ch.cutURLParameter(u, "x")) == (
        "https://www.example.com/a/b?y=2#frag"
    )


def test_url_hierarchy(one):
    u = F.lit("https://site.io/a/b/c")
    assert val(one, ch.URLHierarchy(u)) == [
        "https://site.io",
        "https://site.io/a",
        "https://site.io/a/b",
        "https://site.io/a/b/c",
    ]
    assert val(one, ch.URLPathHierarchy(u)) == ["/a", "/a/b", "/a/b/c"]


def test_first_significant_subdomain(one):
    assert (
        val(one, ch.firstSignificantSubdomain(F.lit("http://news.yandex.com.tr/x")))
        == "yandex"
    )
    assert (
        val(one, ch.firstSignificantSubdomain(F.lit("http://www.example.com/")))
        == "example"
    )


# -- ip / encoding ----------------------------------------------------------


def test_ip(one):
    assert val(one, ch.IPv4NumToString(F.lit(3232235777))) == "192.168.1.1"
    assert val(one, ch.IPv4StringToNum(F.lit("192.168.1.1"))) == 3232235777
    assert val(one, ch.IPv4NumToStringClassC(F.lit(3232235777))) == "192.168.1.xxx"
    assert val(one, ch.hex_(F.lit(255))) == "FF"
    assert val(one, ch.bitmaskToArray(F.lit(50))) == [2, 16, 32]
    assert val(one, ch.bitTest(F.lit(5), 2)) == 1
    assert val(one, ch.bitTestAny(F.lit(5), 1, 2)) is True
    assert val(one, ch.bitTestAll(F.lit(5), 0, 2)) is True


def test_uuid(one):
    s = "01234567-89ab-cdef-0123-456789abcdef"
    assert val(one, ch.UUIDNumToString(ch.UUIDStringToNum(F.lit(s)))) == s


# -- json (visitParam) -------------------------------------------------------


def test_visit_param(one):
    p = F.lit('{"k": 69, "s": "hi", "b": true}')
    assert val(one, ch.visitParamHas(p, "k")) is True
    assert val(one, ch.visitParamHas(p, "zz")) is False
    assert val(one, ch.visitParamExtractUInt(p, "k")) == 69
    assert val(one, ch.visitParamExtractFloat(p, "k")) == 69.0
    assert val(one, ch.visitParamExtractString(p, "s")) == "hi"
    assert val(one, ch.visitParamExtractBool(p, "b")) is True


# -- misc -------------------------------------------------------------------


def test_transform(one):
    t = ch.transform(F.lit(2), [1, 2, 3], ["one", "two", "three"], "other")
    assert val(one, t) == "two"
    t2 = ch.transform(F.lit(9), [1, 2], ["one", "two"], "other")
    assert val(one, t2) == "other"


def test_misc(one):
    assert val(one, ch.formatReadableSize(F.lit(1536))) == "1.50 KiB"
    assert val(one, ch.isFinite(F.lit(1.0))) is True
    assert val(one, ch.isNaN(F.lit(float("nan")))) is True
    assert val(one, ch.isInfinite(F.lit(float("inf")))) is True
    assert val(one, ch.tupleElement(ch.tuple_(F.lit(1), F.lit("a")), 2)) == "a"
    d = val(
        one,
        ch.greatCircleDistance(
            F.lit(37.6173), F.lit(55.7558), F.lit(30.3141), F.lit(59.9386)
        ),
    )
    assert 625_000 < d < 660_000  # Moscow -> St Petersburg ~635 km


# -- aggregates -------------------------------------------------------------


def test_aggregates(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "a"), (1, 20.0, "b"), (2, 30.0, "c"), (2, 5.0, "d")],
        "k int, v double, s string",
    )
    agg = ch.aggregates if hasattr(ch, "aggregates") else None
    from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.functions import (
        aggregates as A,
    )

    row = (
        df.groupBy("k")
        .agg(
            A.count_().alias("n"),
            A.countIf(F.col("v") > 15).alias("n_big"),
            A.sumIf("v", F.col("v") > 15).alias("s_big"),
            A.argMax("s", "v").alias("best"),
            A.uniqExact("s").alias("u"),
            A.quantileExact("v", 0.5).alias("med"),
        )
        .orderBy("k")
        .collect()
    )
    assert row[0]["n"] == 2 and row[0]["n_big"] == 1 and row[0]["s_big"] == 20.0
    assert row[0]["best"] == "b" and row[1]["best"] == "c"
    assert row[1]["med"] == 17.5


def test_uniq_up_to(spark):
    df = spark.createDataFrame([(i % 7,) for i in range(100)], "x int")
    r = df.agg(ch.uniqUpTo(5)(F.col("x")).alias("u")).first()["u"]
    assert r == 6  # more than 5 distinct -> N+1
    df2 = spark.createDataFrame([(i % 3,) for i in range(10)], "x int")
    r2 = df2.agg(ch.uniqUpTo(5)(F.col("x")).alias("u")).first()["u"]
    assert r2 == 3


def test_sum_array_combinator(spark):
    df = spark.createDataFrame([([1.0, 2.0],), ([3.0],)], "a array<double>")
    r = df.agg(
        ch.sum_array(F.col("a")).alias("s"),
        ch.count_array(F.col("a")).alias("c"),
    ).first()
    assert r["s"] == 6.0 and r["c"] == 3


def test_sum_map(spark):
    df = spark.createDataFrame(
        [(["a", "b"], [1.0, 2.0]), (["b", "c"], [3.0, 4.0])],
        "k array<string>, v array<double>",
    )
    r = df.agg(ch.sumMap(F.col("k"), F.col("v")).alias("m")).first()["m"]
    assert r == {"a": 1.0, "b": 5.0, "c": 4.0}
