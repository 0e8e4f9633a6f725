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
    hash128to64,
    int_hash_32,
    int_hash_64,
    sip_hash_64,
    url_hash,
)


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
