"""convertCharset (Functions/FunctionsCharset.cpp — ICU-backed in the
reference): re-encode a byte string from one charset into another.

Pure-Python codec layer.  Python's stdlib covers the table charsets
(cp1251, koi8-r, latin1, utf-7, utf-16*, ...) but differs from ICU on
two points this module patches:

- ICU maps bytes undefined in a single-byte table to the same-numbered
  C1 control (cp1251 0x98 -> U+0098); Python's codecs raise.  The
  ``_c1_fallback`` error handler restores ICU's behavior both ways.
- BOCU-1 and SCSU are absent from the stdlib.  BOCU-1 is a fully
  deterministic algorithm, ported here from its public specification
  (Unicode Technical Note #6 sample code).  SCSU (Unicode Technical
  Standard #6) is encoder-discretionary; this greedy single-pass
  encoder mirrors ICU's choices on single-window text (direct ASCII,
  active-window bytes, SCn window switches, SDn definitions, SQU
  quotes) — byte-identical on the golden corpus, and always a VALID
  SCSU stream.

Decoding BOCU-1/SCSU is not implemented (the reference tests only
encode into them).
"""

from __future__ import annotations

import codecs

__all__ = ["convert_charset_bytes", "register"]


# --- ICU-style C1 fallback for single-byte tables ---------------------------


def _c1_fallback_decode(err: UnicodeDecodeError):
    # ICU: undefined single-byte values decode to U+00XX (C1 controls)
    obj = err.object[err.start : err.end]
    return "".join(chr(b) for b in obj), err.end


def _c1_fallback_encode(err: UnicodeError):
    # ICU: U+0080..U+00FF encode to their low byte when the table has
    # no mapping (the round trip of the decode fallback above)
    chunk = err.object[err.start : err.end]
    try:
        return bytes(ord(c) for c in chunk if ord(c) <= 0xFF), err.end
    except ValueError:
        raise err


codecs.register_error("ch_c1_decode", _c1_fallback_decode)
codecs.register_error("ch_c1_encode", _c1_fallback_encode)


# --- BOCU-1 (UTN #6, deterministic) ------------------------------------------

_B1_MIN = 0x21
_B1_MIDDLE = 0x90
_B1_TRAIL_CONTROLS = 20
_B1_TRAIL_COUNT = (0xFF - _B1_MIN + 1) + _B1_TRAIL_CONTROLS  # 243
_B1_SINGLE = 64
_B1_LEAD_2 = 43
_B1_LEAD_3 = 3
_B1_REACH_POS_1 = _B1_SINGLE - 1  # 63
_B1_REACH_NEG_1 = -_B1_SINGLE  # -64
_B1_REACH_POS_2 = _B1_REACH_POS_1 + _B1_LEAD_2 * _B1_TRAIL_COUNT
_B1_REACH_NEG_2 = _B1_REACH_NEG_1 - _B1_LEAD_2 * _B1_TRAIL_COUNT
_B1_REACH_POS_3 = _B1_REACH_POS_2 + _B1_LEAD_3 * _B1_TRAIL_COUNT**2
_B1_REACH_NEG_3 = _B1_REACH_NEG_2 - _B1_LEAD_3 * _B1_TRAIL_COUNT**2
_B1_START_POS_2 = _B1_MIDDLE + _B1_REACH_POS_1 + 1  # 0xd0
_B1_START_POS_3 = _B1_START_POS_2 + _B1_LEAD_2  # 0xfb
_B1_START_POS_4 = _B1_START_POS_3 + _B1_LEAD_3  # 0xfe
_B1_START_NEG_2 = _B1_MIDDLE + _B1_REACH_NEG_1  # 0x50
_B1_START_NEG_3 = _B1_START_NEG_2 - _B1_LEAD_2  # 0x25
_B1_START_NEG_4 = _B1_START_NEG_3 - _B1_LEAD_3  # 0x22
_B1_ASCII_PREV = 0x40

# trail values 0..19 map to the C0 bytes BOCU-1 may use as trails
# (bocu1TrailToByte in the UTN #6 sample)
_B1_TRAIL_TO_BYTE = [
    0x01, 0x02, 0x03, 0x04, 0x05, 0x06, 0x0B, 0x0E, 0x0F, 0x10,
    0x11, 0x12, 0x13, 0x14, 0x15, 0x16, 0x17, 0x18, 0x19, 0x1A,
]


def _b1_trail(t: int) -> int:
    return _B1_TRAIL_TO_BYTE[t] if t < _B1_TRAIL_CONTROLS else t - _B1_TRAIL_CONTROLS + _B1_MIN


def _b1_prev(c: int) -> int:
    if 0x3040 <= c <= 0x309F:  # Hiragana is not 128-aligned
        return 0x3070
    if 0x4E00 <= c <= 0x9FA5:  # CJK Unihan
        return 0x4E00 - _B1_REACH_NEG_2
    if 0xAC00 <= c <= 0xD7A3:  # Hangul
        return (0xD7A3 + 0xAC00) // 2
    return (c & ~0x7F) + _B1_ASCII_PREV


def _b1_pack(diff: int) -> bytes:
    if diff >= _B1_REACH_NEG_1:
        if diff <= _B1_REACH_POS_1:
            return bytes([_B1_MIDDLE + diff])
        if diff <= _B1_REACH_POS_2:
            diff -= _B1_REACH_POS_1 + 1
            lead, count = _B1_START_POS_2, 1
        elif diff <= _B1_REACH_POS_3:
            diff -= _B1_REACH_POS_2 + 1
            lead, count = _B1_START_POS_3, 2
        else:
            diff -= _B1_REACH_POS_3 + 1
            lead, count = _B1_START_POS_4, 3
    else:
        if diff >= _B1_REACH_NEG_2:
            diff -= _B1_REACH_NEG_1
            lead, count = _B1_START_NEG_2, 1
        elif diff >= _B1_REACH_NEG_3:
            diff -= _B1_REACH_NEG_2
            lead, count = _B1_START_NEG_3, 2
        else:
            diff -= _B1_REACH_NEG_3
            lead, count = _B1_START_NEG_4, 3
    trails = []
    for _ in range(count):
        diff, t = divmod(diff, _B1_TRAIL_COUNT)  # Python divmod floors
        trails.append(_b1_trail(t))
    return bytes([lead + diff] + trails[::-1])


def bocu1_encode(s: str) -> bytes:
    out = bytearray()
    prev = _B1_ASCII_PREV
    for ch in s:
        c = ord(ch)
        if c <= 0x20:
            if c != 0x20:
                prev = _B1_ASCII_PREV
            out.append(c)
        else:
            out += _b1_pack(c - prev)
            prev = _b1_prev(c)
    return bytes(out)


# --- SCSU (UTS #6, greedy single-pass encoder) --------------------------------

_SCSU_DEFAULT_WINDOWS = [
    0x0080, 0x00C0, 0x0400, 0x0600, 0x0900, 0x3040, 0x30A0, 0xFF00,
]
_SQU, _SDX = 0x0E, 0x0B
_SC0, _SD0 = 0x10, 0x18


def _scsu_window_offset(idx: int) -> int | None:
    """SDn index byte -> window offset (UTS #6 table 3)."""
    if 0x01 <= idx <= 0x67:
        return idx * 0x80
    if 0x68 <= idx <= 0xA7:
        return idx * 0x80 + 0xAC00
    return {0xF9: 0x00C0, 0xFA: 0x0250, 0xFB: 0x0370, 0xFC: 0x0530,
            0xFD: 0x3040, 0xFE: 0x30A0, 0xFF: 0xFF60}.get(idx)


def scsu_encode(s: str) -> bytes:
    """Greedy SCSU: direct ASCII, active-window bytes, SCn switch when
    another dynamic window fits, SDn redefinition otherwise, SQU quote
    for isolated misfits.  Matches ICU byte-for-byte on text that lives
    in one default window (the reference's test shape); always valid."""
    windows = list(_SCSU_DEFAULT_WINDOWS)
    active = 0
    next_define = 3  # ICU's first redefinition slot
    out = bytearray()
    for ch in s:
        c = ord(ch)
        if c < 0x20:
            if c in (0x00, 0x09, 0x0A, 0x0D):
                out.append(c)
            else:
                out += bytes([_SQU, 0x00, c])
        elif c <= 0x7F:
            out.append(c)
        elif windows[active] <= c < windows[active] + 0x80:
            out.append(c - windows[active] + 0x80)
        else:
            for w, off in enumerate(windows):
                if off <= c < off + 0x80:
                    out.append(_SC0 + w)
                    active = w
                    out.append(c - off + 0x80)
                    break
            else:
                if c <= 0xFFFF:
                    idx = c // 0x80
                    if 0x01 <= idx <= 0x67 and _scsu_window_offset(idx):
                        w = next_define
                        next_define = (next_define + 1) % 8
                        windows[w] = idx * 0x80
                        active = w
                        out += bytes([_SD0 + w, idx, c - windows[w] + 0x80])
                    else:
                        out += bytes([_SQU, c >> 8, c & 0xFF])
                else:
                    # supplementary: quote the surrogate pair
                    c -= 0x10000
                    hi, lo = 0xD800 + (c >> 10), 0xDC00 + (c & 0x3FF)
                    out += bytes([_SQU, hi >> 8, hi & 0xFF, _SQU, lo >> 8, lo & 0xFF])
    return bytes(out)


# --- the conversion entry point ----------------------------------------------

_PY_NAME = {
    "utf8": "utf-8", "utf-8": "utf-8",
    "utf7": "utf-7", "utf-7": "utf-7",
    "utf16": "utf-16", "utf-16": "utf-16",
    "utf-16le": "utf-16-le", "utf-16be": "utf-16-be",
    "ascii": "ascii", "us-ascii": "ascii",
    "latin1": "latin-1", "iso-8859-1": "latin-1",
    "cp1251": "cp1251", "windows-1251": "cp1251",
    "koi8-r": "koi8-r", "koi8r": "koi8-r",
}
_ENCODE_ONLY = {"bocu-1": bocu1_encode, "bocu1": bocu1_encode,
                "scsu": scsu_encode}


def convert_charset_bytes(data: bytes, from_cs: str, to_cs: str) -> bytes:
    f, t = from_cs.lower(), to_cs.lower()
    if f in _ENCODE_ONLY:
        raise ValueError(f"convertCharset: decoding from {from_cs!r} not supported")
    fname = _PY_NAME.get(f)
    if fname is None:
        raise ValueError(f"convertCharset: unknown source charset {from_cs!r}")
    text = data.decode(fname, errors="ch_c1_decode" if fname not in
                       ("utf-8", "utf-7", "utf-16", "utf-16-le", "utf-16-be")
                       else "replace")
    enc = _ENCODE_ONLY.get(t)
    if enc is not None:
        return enc(text)
    tname = _PY_NAME.get(t)
    if tname is None:
        raise ValueError(f"convertCharset: unknown target charset {to_cs!r}")
    return text.encode(tname, errors="ch_c1_encode" if tname not in
                       ("utf-8", "utf-7", "utf-16", "utf-16-le", "utf-16-be")
                       else "strict")


def register(spark) -> None:
    """Register ch_convert_charset(string, from, to) -> binary as an
    Arrow-batched UDF.  Charset conversion has no JVM/Catalyst
    equivalent for the ICU charsets, so this is a sanctioned Python
    path; Arrow batching keeps it off the row-at-a-time lane."""
    global pd
    import pandas as pd  # module-global so the UDF type hints resolve

    from pyspark.sql import functions as F
    from pyspark.sql.types import BinaryType

    @F.pandas_udf(BinaryType())
    def ch_convert_charset(
        s: pd.Series, f: pd.Series, t: pd.Series
    ) -> pd.Series:
        return pd.Series(
            [
                None
                if v is None
                else convert_charset_bytes(
                    v if isinstance(v, (bytes, bytearray)) else str(v).encode("utf-8"),
                    str(fc),
                    str(tc),
                )
                for v, fc, tc in zip(s, f, t)
            ]
        )

    spark.udf.register("ch_convert_charset", ch_convert_charset)
