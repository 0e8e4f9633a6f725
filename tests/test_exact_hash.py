"""Bit-exact hash family — scalar ports and SQL dispatch.

Expected values come from the reference's own goldens
(dbms/tests/queries/0_stateless/00259_hashing_tuples.reference,
00324_hashing_enums.reference) and from published algorithm test
vectors (CityHash64('') = k2, SipHash-2-4 zero-key).
"""

from __future__ import annotations

import pytest

from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.functions.exact_hash import (
    city_hash_64,
    farm_hash_64,
    hash128to64,
    int_hash_32,
    int_hash_64,
    metro_hash_64_1,
    sip_hash_64,
    url_hash,
)

# (len, farmHash64, metroHash64) over a deterministic xorshift64 byte
# stream — expected values computed from the reference's own contrib
# sources (contrib/libfarmhash/farmhash.cc built with -msse4.2 -DNDEBUG
# per cmake/test_cpu.cmake, contrib/libmetrohash metrohash64_1 seed 0).
# Lengths cover every farmhash branch: 0to16, 17to32, xo 33to64,
# xo 65to96, na 97..256, uo 257..511, and the SIMD Hash64Long >= 512
# (including the 256-multiple no-tail case at 1024 and odd tails).
_FARM_METRO_STREAM_VECTORS = [
    (0, 11160318154034397263, 13381918016739805347),
    (1, 10112143678616955356, 4694320458165711969),
    (4, 3397429175955044134, 1482799639576830845),
    (8, 5117498146218464948, 4649456924808010388),
    (9, 3920453342362411375, 12472055467239043876),
    (16, 4697085419470709287, 1083131044263562730),
    (17, 12596826003790152640, 7390053354832933805),
    (31, 15173340456977836099, 13019705930914478918),
    (32, 9136862464742487300, 14179945195250419356),
    (33, 10902500978884172992, 4227081646538973464),
    (63, 3269273293002498211, 11054982489031490746),
    (64, 901450418990377457, 6191002378977488466),
    (65, 13439363089744776157, 17103261543937520940),
    (96, 12848646642495947278, 17384472816060826038),
    (97, 5407880264682226874, 12184210281226763448),
    (256, 4315258737008105359, 6258332023019452323),
    (257, 14486276244535857955, 11101269252243517766),
    (511, 15502613490948361193, 8349397679568213152),
    (512, 17461838591250260650, 4808996049715418125),
    (513, 2402287556976006930, 1721509196809624405),
    (768, 1123507944259733967, 9699345811888672493),
    (1024, 9410760009087830878, 1984166708594656172),
    (1025, 12832725553418337608, 8356428487070237003),
    (2000, 11292586313271460988, 206504487864206489),
]

_FARM_METRO_TEXT_VECTORS = [
    (b"", 11160318154034397263, 13381918016739805347),
    (b"a", 12917804110809363939, 6759146875928959315),
    (b"abc", 2640714258260161385, 983152225323542437),
    (b"clickhouse", 4034697792955270592, 6783394735685323332),
    (b"Hello, world!", 3493709964939663943, 676721872007707627),
    (
        b"The quick brown fox jumps over the lazy dog",
        520327665418357475,
        1903055355638576177,
    ),
]


def _xorshift_stream():
    """The byte stream the vectors above were generated against."""
    m64 = (1 << 64) - 1
    state = 0x123456789ABCDEF0
    while True:
        state = (state ^ (state << 13)) & m64
        state ^= state >> 7
        state = (state ^ (state << 17)) & m64
        yield state & 0xFF


# the full length sequence the generator consumed, in order — the
# stream is continuous, so byte positions depend on every prior length
_GEN_LENS = [
    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 11, 15, 16, 17, 24, 31, 32, 33, 48,
    63, 64, 65, 80, 96, 97, 127, 128, 200, 255, 256, 257, 300, 400,
    511, 512, 513, 600, 767, 768, 1000, 1024, 1025, 2000, 4096,
]


class TestFarmMetro:
    def test_farm_empty_is_k2(self):
        assert farm_hash_64(b"") == 0x9AE16A3B2F90404F

    def test_stream_vectors(self):
        expected = {ln: (f, m) for ln, f, m in _FARM_METRO_STREAM_VECTORS}
        gen = _xorshift_stream()
        for ln in _GEN_LENS:
            buf = bytes(next(gen) for _ in range(ln))
            if ln in expected:
                f, m = expected[ln]
                assert farm_hash_64(buf) == f, f"farmHash64 len={ln}"
                assert metro_hash_64_1(buf) == m, f"metroHash64 len={ln}"

    def test_text_vectors(self):
        for text, f, m in _FARM_METRO_TEXT_VECTORS:
            assert farm_hash_64(text) == f
            assert metro_hash_64_1(text) == m


class TestScalar:
    def test_city_empty_is_k2(self):
        assert city_hash_64(b"") == 0x9AE16A3B2F90404F

    def test_city_multiarg_combine_00259(self):
        # cityHash64(1, 2, '') — golden 00259_hashing_tuples
        h = hash128to64(hash128to64(int_hash_64(1), int_hash_64(2)), city_hash_64(b""))
        assert h == 3151614220437955012

    def test_city_pair_00324(self):
        # cityHash64(1, 1) — golden 00324_hashing_enums
        assert hash128to64(int_hash_64(1), int_hash_64(1)) == 2963573356302499406

    def test_city_length_classes_distinct(self):
        # every branch (0-16, 17-32, 33-64, >64 loop) produces output
        vals = {city_hash_64(b"x" * n) for n in (0, 1, 4, 9, 16, 17, 32, 33, 64, 65, 129, 200)}
        assert len(vals) == 12

    def test_int_hash_32_is_32bit(self):
        for x in (0, 1, 2**63, 2**64 - 1):
            assert 0 <= int_hash_32(x) < 2**32

    def test_sip_streams_any_length(self):
        vals = {sip_hash_64(b"y" * n) for n in range(0, 20)}
        assert len(vals) == 20

    def test_url_hash_trims_one_trailing(self):
        u = b"http://ya.ru"
        assert url_hash(u) == url_hash(u + b"/") == url_hash(u + b"?") == url_hash(u + b"#")
        # only ONE char dropped (URLHashImpl checks the last byte once)
        assert url_hash(u + b"//") != url_hash(u)

    def test_url_hash_level(self):
        # level 0 = protocol+domain prefix; empty / no-protocol URLs
        # hash the whole string at level 0 and '' at deeper levels
        assert url_hash(b"", 0) == url_hash(b"")
        assert url_hash(b"", 5) == url_hash(b"")
        assert url_hash(b"http://ya.ru/a", 0) == url_hash(b"http://ya.ru/")
        assert url_hash(b"http://ya.ru/a", 1) == url_hash(b"http://ya.ru/a")


@pytest.mark.usefixtures("spark")
class TestSqlDispatch:
    @pytest.fixture(autouse=True)
    def _eng(self, spark):
        from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.dialect import ChEngine

        self.eng = ChEngine(spark)

    def one(self, sql):
        return self.eng.sql(sql).collect()[0]

    def test_tuple_flatten_matches_flat(self):
        r = self.one(
            "SELECT cityHash64(1, 2, '') AS x1, cityHash64((1, 2), '') AS x2, "
            "cityHash64(1, (2, '')) AS x3, cityHash64((1, 2, '')) AS x4"
        )
        assert len({int(v) for v in r}) == 1
        assert int(r[0]) == 3151614220437955012

    def test_materialize_const_parity(self):
        a = self.one("SELECT cityHash64(materialize(1), 2, materialize('')) AS h")
        assert int(a[0]) == 3151614220437955012

    def test_star_enum_by_value(self):
        r = self.one(
            "SELECT cityHash64(*) AS h FROM "
            "(SELECT 1 AS x, CAST(x AS Enum8('Hello' = 0, 'World' = 1)) AS y)"
        )
        assert int(r[0]) == 2963573356302499406

    def test_string_udf_matches_scalar(self):
        r = self.one("SELECT cityHash64('abc') AS c, sipHash64('abc') AS s")
        assert int(r[0]) == city_hash_64(b"abc")
        assert int(r[1]) == sip_hash_64(b"abc")

    def test_array_fold(self):
        r = self.one("SELECT cityHash64([1, 2, 3]) AS h")
        want = int_hash_64(3)
        for e in (1, 2, 3):
            want = hash128to64(want, int_hash_64(e))
        assert int(r[0]) == want

    def test_int_hash_fns(self):
        r = self.one("SELECT intHash64(1) AS a, intHash32(1) AS b")
        assert int(r[0]) == int_hash_64(1)
        assert int(r[1]) == int_hash_32(1)

    def test_float_bits_hash(self):
        import struct

        r = self.one("SELECT cityHash64(CAST(1.5 AS Float64)) AS h")
        bits = struct.unpack("<Q", struct.pack("<d", 1.5))[0]
        assert int(r[0]) == int_hash_64(bits)

    def test_urlhash_sql(self):
        r = self.one("SELECT URLHash('http://ya.ru/') AS a, URLHash('http://ya.ru') AS b")
        assert int(r[0]) == int(r[1]) == url_hash(b"http://ya.ru")

    def test_farm_metro_string_udf(self):
        r = self.one("SELECT farmHash64('abc') AS f, metroHash64('abc') AS m")
        assert int(r[0]) == farm_hash_64(b"abc")
        assert int(r[1]) == metro_hash_64_1(b"abc")

    def test_farm_metro_int_combine_same_as_city(self):
        # integer elements hash identically for all three impls
        # (IntHash64 + the shared Hash128to64 combine)
        r = self.one(
            "SELECT cityHash64(1, 2) AS c, farmHash64(1, 2) AS f, metroHash64(1, 2) AS m"
        )
        assert int(r[0]) == int(r[1]) == int(r[2])

    def test_farm_metro_mixed_combine(self):
        r = self.one("SELECT farmHash64(1, 'abc') AS f, metroHash64(1, 'abc') AS m")
        assert int(r[0]) == hash128to64(int_hash_64(1), farm_hash_64(b"abc"))
        assert int(r[1]) == hash128to64(int_hash_64(1), metro_hash_64_1(b"abc"))

    def test_farm_metro_array_fold(self):
        r = self.one("SELECT farmHash64(['a', 'b']) AS f, metroHash64(['a', 'b']) AS m")
        want_f = hash128to64(hash128to64(int_hash_64(2), farm_hash_64(b"a")), farm_hash_64(b"b"))
        want_m = hash128to64(
            hash128to64(int_hash_64(2), metro_hash_64_1(b"a")), metro_hash_64_1(b"b")
        )
        assert int(r[0]) == want_f
        assert int(r[1]) == want_m
