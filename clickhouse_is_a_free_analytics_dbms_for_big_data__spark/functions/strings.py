"""String functions: basic, search/replace, split.

Reference: dbms/src/Functions/FunctionsString.cpp (1617 LoC),
FunctionsStringSearch.cpp (1106 LoC), FunctionsStringArray.cpp.

Spark strings are UTF-8 character semantics — the reference's plain
variants are byte-oriented and the *UTF8 variants char-oriented, so
here `length` = octet_length (bytes) and `lengthUTF8` = char length,
matching the reference split.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ._util import col_of, lit_of

__all__ = [
    "empty", "notEmpty", "length", "lengthUTF8", "lower", "upper",
    "lowerUTF8", "upperUTF8", "reverse", "reverseUTF8", "concat",
    "substring", "substringUTF8", "appendTrailingCharIfAbsent",
    "position", "positionCaseInsensitive", "positionUTF8", "match",
    "like", "notLike", "extract", "replaceOne", "replaceAll",
    "replaceRegexpOne", "replaceRegexpAll",
    "splitByChar", "splitByString", "alphaTokens", "extractAll",
    "arrayStringConcat", "startsWith", "endsWith", "trimBoth",
    "convertCharset",
]


def empty(s) -> Column:
    return F.length(col_of(s)) == 0


def notEmpty(s) -> Column:
    return F.length(col_of(s)) > 0


def length(s) -> Column:
    """Byte length (reference length is bytes)."""
    return F.octet_length(col_of(s))


def lengthUTF8(s) -> Column:
    return F.char_length(col_of(s))


def lower(s) -> Column:
    """ASCII-only lowercase in the reference; Spark lower() covers it."""
    return F.lower(col_of(s))


def upper(s) -> Column:
    return F.upper(col_of(s))


lowerUTF8 = lower
upperUTF8 = upper


def reverse(s) -> Column:
    return F.reverse(col_of(s))


reverseUTF8 = reverse


def concat(*parts) -> Column:
    return F.concat(*[lit_of(p) if isinstance(p, str) else col_of(p) for p in parts])


def substring(s, offset, length_) -> Column:
    """1-based offset like the reference."""
    return F.substring(col_of(s), offset, length_)


substringUTF8 = substring


def appendTrailingCharIfAbsent(s, ch: str) -> Column:
    s_ = col_of(s)
    return F.when(s_.endswith(ch), s_).otherwise(F.concat(s_, F.lit(ch)))


def position(haystack, needle) -> Column:
    """1-based position of substring; 0 when absent (reference semantics)."""
    return F.instr(col_of(haystack), lit_of(needle))


positionUTF8 = position


def positionCaseInsensitive(haystack, needle) -> Column:
    return F.instr(F.lower(col_of(haystack)), F.lower(lit_of(needle)))


def match(s, pattern: str) -> Column:
    """re2-style regex match (unanchored), reference match()."""
    return col_of(s).rlike(pattern)


def like(s, pattern: str) -> Column:
    return col_of(s).like(pattern)


def notLike(s, pattern: str) -> Column:
    return ~col_of(s).like(pattern)


def extract(s, pattern: str) -> Column:
    """First regex match; first capture group if present, else whole match.
    Reference: FunctionsStringSearch.cpp extract (empty string if no match).
    """
    group = 1 if "(" in pattern.replace("\\(", "") else 0
    return F.regexp_extract(col_of(s), pattern, group)


def replaceOne(s, needle: str, repl: str) -> Column:
    """Replace only the first occurrence (reference replaceOne).

    Spliced via instr/substring — regexp_replace is global in Spark.
    """
    s_ = col_of(s)
    pos = F.instr(s_, F.lit(needle))
    spliced = F.concat(
        F.substring(s_, F.lit(1), pos - 1),
        F.lit(repl),
        F.substring(
            s_, pos + len(needle), F.length(s_)
        ),
    )
    return F.when(pos > 0, spliced).otherwise(s_)


def replaceAll(s, needle: str, repl: str) -> Column:
    return F.replace(col_of(s), F.lit(needle), F.lit(repl))


def replaceRegexpOne(s, pattern: str, repl: str) -> Column:
    """Replace only the first regex match: extract the matched text,
    then splice at its position.  Backreferences in ``repl`` are not
    supported (reference supports \\1; documented divergence)."""
    s_ = col_of(s)
    matched = F.regexp_extract(s_, f"((?s){pattern})", 1)
    pos = F.instr(s_, matched)
    spliced = F.concat(
        F.substring(s_, F.lit(1), pos - 1),
        F.lit(repl),
        F.substring(s_, pos + F.length(matched), F.length(s_)),
    )
    return F.when((matched != "") & (pos > 0), spliced).otherwise(s_)


def replaceRegexpAll(s, pattern: str, repl: str) -> Column:
    return F.regexp_replace(col_of(s), pattern, repl)


def splitByChar(sep: str, s) -> Column:
    import re

    return F.split(col_of(s), re.escape(sep), -1)


def splitByString(sep: str, s) -> Column:
    import re

    return F.split(col_of(s), re.escape(sep), -1)


def alphaTokens(s) -> Column:
    """Sequences of alphabetic characters (reference alphaTokens)."""
    return F.filter(
        F.split(col_of(s), "[^A-Za-z]+", -1), lambda x: F.length(x) > 0
    )


def extractAll(s, pattern: str) -> Column:
    return F.regexp_extract_all(col_of(s), F.lit(pattern), 1 if "(" in pattern.replace("\\(", "") else 0)


def arrayStringConcat(arr, sep: str = "") -> Column:
    return F.array_join(col_of(arr), sep)


def startsWith(s, prefix) -> Column:
    return col_of(s).startswith(prefix)


def endsWith(s, suffix) -> Column:
    return col_of(s).endswith(suffix)


def trimBoth(s) -> Column:
    return F.trim(col_of(s))


_CHARSETS = {"utf-8", "utf8", "us-ascii", "ascii", "iso-8859-1", "latin1",
             "utf-16", "utf-16be", "utf-16le"}


def convertCharset(x, from_charset: str, to_charset: str) -> Column:
    """convertCharset(s, from, to) (Functions/FunctionsCharset.cpp,
    ICU-backed in the reference): reinterpret the byte string from one
    charset and re-encode into another.  JVM charsets go through
    encode/decode (codegen, zero Python); ICU-only charsets (cp1251,
    koi8-r, utf-7, bocu-1, scsu) route to the Arrow-batched UDF from
    functions/charset.py — call charset.register(spark) first (the
    dialect engine does this on construction)."""
    f, t = from_charset.lower(), to_charset.lower()
    if f in _CHARSETS and t in _CHARSETS:
        norm = {"utf8": "UTF-8", "ascii": "US-ASCII", "latin1": "ISO-8859-1"}
        f_cs = norm.get(f, f.upper())
        t_cs = norm.get(t, t.upper())
        return F.encode(F.decode(col_of(x).cast("binary"), f_cs), t_cs)
    from .charset import _ENCODE_ONLY, _PY_NAME

    known = set(_PY_NAME) | set(_ENCODE_ONLY)
    if f not in known or (t not in known):
        raise ValueError(
            f"convertCharset: unsupported {from_charset!r} -> {to_charset!r}"
        )
    return F.call_udf("ch_convert_charset", col_of(x), F.lit(f), F.lit(t))
