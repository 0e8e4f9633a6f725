"""convertCharset codec layer (Functions/FunctionsCharset.cpp parity).

Vectors from the reference golden 00436_convert_charset (adopted
byte-identical in tests/queries) — these unit tests pin the pure-Python
layer without a SparkSession.
"""

from clickhouse_is_a_free_analytics_dbms_for_big_data__spark.functions.charset import (
    bocu1_encode,
    convert_charset_bytes,
    scsu_encode,
)

_RU = (
    "абвгдеёжзийклмнопрстуфхцчшщъыьэюя"
    "АБВГДЕЁЖЗИЙКЛМНОПРСТУФХЦЧШЩЪЫЬЭЮЯ"
)


def test_cp1251_roundtrip_icu_vector():
    b = convert_charset_bytes(_RU.encode(), "utf-8", "cp1251")
    assert b.hex().upper().startswith("E0E1E2E3E4E5B8")
    assert convert_charset_bytes(b, "cp1251", "utf-8").decode() == _RU


def test_bocu1_icu_vector():
    assert bocu1_encode(_RU).hex().upper().startswith("D3E48182838485A1")
    # ASCII stays relative to prev=0x40; space is transparent
    assert bocu1_encode("ab cd") == bytes([0xB1, 0xB2, 0x20, 0xB3, 0xB4])


def test_scsu_icu_vector():
    out = scsu_encode(_RU)
    assert out[0] == 0x12  # SC2: default Cyrillic window 0x0400
    assert out[1:7].hex().upper() == "B0B1B2B3B4B5"
    # pure ASCII is the identity
    assert scsu_encode("Hello, world") == b"Hello, world"


def test_c1_fallback_both_ways():
    # ICU maps cp1251's undefined 0x98 to U+0098 and back
    c1 = chr(0x98)
    assert convert_charset_bytes(b"\x98", "cp1251", "utf-8") == c1.encode()
    assert convert_charset_bytes(c1.encode(), "utf-8", "cp1251") == b"\x98"


def test_utf7_matches_reference():
    got = convert_charset_bytes("аб".encode(), "utf-8", "utf-7")
    assert got == b"+BDAEMQ-"
