"""Collated string comparison keys (Columns/ColumnString.h
getPermutationWithCollation → Poco/ICU Collator).

The reference delegates ORDER BY ... COLLATE 'loc' to ICU.  Emulated
here as a sortable KEY string per value: per-character primary weights
follow the ICU root order with the locale's tailorings (DUCET order;
Russian: Cyrillic а..я with ё a base letter after е; Turkish: ç after
c, ğ after g, ı before i, ö after o, ş after s, ü after u), then a
case-level (tertiary) sequence — lowercase before uppercase, ICU
default.  Characters outside the table order by code point after all
tailored letters.  The key string compares bytewise exactly like the
collator compares the original values (UTF-8 preserves code-point
order)."""

from __future__ import annotations

_RU = (
    "аАбБвВгГдДеЕёЁжЖзЗиИйЙкКлЛмМнНоОпПрРсСтТуУфФхХцЦчЧшШщЩ"
    "ъЪыЫьЬэЭюЮяЯ"
)
_TR = (
    "aAbBcCçÇdDeEfFgGğĞhHıIiİjJkKlLmMnNoOöÖpPqQrRsSşŞtTuUüÜ"
    "vVwWxXyYzZ"
)

_TABLES: dict[str, dict[str, tuple[int, int]]] = {}
for _loc, _alpha in (("ru", _RU), ("tr", _TR)):
    _TABLES[_loc] = {
        ch: (i // 2, i % 2) for i, ch in enumerate(_alpha)
    }


def collate_key(s: str, locale: str) -> str:
    """Sortable key: primary weights, then the case (tertiary) level."""
    table = _TABLES.get(locale, {})
    prim: list[str] = []
    ter: list[str] = []
    for ch in s:
        w = table.get(ch)
        if w is None:
            # untailored character: after every tailored letter, by
            # code point (root order approximation)
            prim.append(chr(0x1000 + ord(ch)))
            ter.append("\x00")
        else:
            prim.append(chr(0x100 + w[0]))
            ter.append(chr(1 + w[1]))
    return "".join(prim) + "\x01" + "".join(ter)
