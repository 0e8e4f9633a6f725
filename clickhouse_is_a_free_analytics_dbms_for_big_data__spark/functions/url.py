"""URL functions.

Reference: dbms/src/Functions/FunctionsURL.cpp (header 1022 LoC).
Built on parse_url (JVM-side) + regexp helpers; hierarchy functions
return arrays built with Catalyst expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ._util import col_of

__all__ = [
    "protocol", "domain", "domainWithoutWWW", "topLevelDomain",
    "firstSignificantSubdomain", "cutToFirstSignificantSubdomain",
    "path", "pathFull", "queryString", "fragment",
    "queryStringAndFragment", "extractURLParameter",
    "extractURLParameters", "extractURLParameterNames", "URLHierarchy",
    "URLPathHierarchy", "cutWWW", "cutQueryString", "cutFragment",
    "cutQueryStringAndFragment", "cutURLParameter", "decodeURLComponent",
]

# TLDs the reference treats as "non-significant" second levels
# (firstSignificantSubdomain: com|net|org|co are skipped).
_SKIP_2LD = ("com", "net", "org", "co")


def protocol(url) -> Column:
    return F.parse_url(col_of(url), F.lit("PROTOCOL"))


def domain(url) -> Column:
    return F.parse_url(col_of(url), F.lit("HOST"))


def domainWithoutWWW(url) -> Column:
    return F.regexp_replace(domain(url), "^www\\.", "")


def topLevelDomain(url) -> Column:
    return F.regexp_extract(domain(url), "\\.([^.]+)$", 1)


def firstSignificantSubdomain(url) -> Column:
    """'news.yandex.com.tr' -> 'yandex'; skips com/net/org/co second
    levels (reference FunctionsURL.h firstSignificantSubdomain)."""
    parts = F.split(domainWithoutWWW(url), "\\.")
    n = F.size(parts)
    second = F.element_at(parts, n - 1)
    skip = second.isin(*_SKIP_2LD)
    return F.when(n <= 1, F.element_at(parts, 1)).otherwise(
        F.when(skip & (n >= 3), F.element_at(parts, n - 2)).otherwise(second)
    )


def cutToFirstSignificantSubdomain(url) -> Column:
    """Domain truncated to start at the first significant subdomain."""
    d = domainWithoutWWW(url)
    fss = firstSignificantSubdomain(url)
    return F.regexp_extract(
        d, F.concat(F.lit("("), fss, F.lit("\\..*$|"), fss, F.lit("$)")), 1
    )


def path(url) -> Column:
    return F.parse_url(col_of(url), F.lit("PATH"))


def pathFull(url) -> Column:
    """Path + query + fragment."""
    u = col_of(url)
    return F.regexp_extract(u, "^[a-zA-Z]+://[^/]*(/.*)$", 1)


def queryString(url) -> Column:
    return F.parse_url(col_of(url), F.lit("QUERY"))


def fragment(url) -> Column:
    return F.parse_url(col_of(url), F.lit("REF"))


def queryStringAndFragment(url) -> Column:
    return F.regexp_extract(col_of(url), "[?#](.*)$", 1)


def extractURLParameter(url, name: str) -> Column:
    return F.parse_url(col_of(url), F.lit("QUERY"), F.lit(name))


def extractURLParameters(url) -> Column:
    """Array of 'k=v' strings."""
    q = queryString(url)
    return F.filter(F.split(q, "&"), lambda x: F.length(x) > 0)


def extractURLParameterNames(url) -> Column:
    return F.transform(
        extractURLParameters(url), lambda kv: F.split(kv, "=")[0]
    )


def URLHierarchy(url) -> Column:
    """Prefix hierarchy: proto://host/, proto://host/a/, ... (reference
    URLHierarchy).  Built by cumulatively joining path segments."""
    u = col_of(url)
    base = F.regexp_extract(u, "^([a-zA-Z]+://[^/?#]*)", 1)
    rest = F.regexp_extract(u, "^[a-zA-Z]+://[^/?#]*(.*)$", 1)
    segs = F.filter(F.split(rest, "/"), lambda x: F.length(x) > 0)
    idxs = F.sequence(F.lit(1), F.size(segs))
    prefixes = F.transform(
        idxs,
        lambda i: F.concat(
            base, F.lit("/"), F.array_join(F.slice(segs, 1, i), "/")
        ),
    )
    return F.when(base == "", F.array().cast("array<string>")).otherwise(
        F.concat(F.array(base), prefixes)
    )


def URLPathHierarchy(url) -> Column:
    """Like URLHierarchy but paths only: /a/, /a/b/ ..."""
    u = col_of(url)
    rest = F.regexp_extract(u, "^[a-zA-Z]+://[^/?#]*(.*)$", 1)
    segs = F.filter(F.split(rest, "/"), lambda x: F.length(x) > 0)
    idxs = F.sequence(F.lit(1), F.size(segs))
    return F.when(F.size(segs) == 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            idxs,
            lambda i: F.concat(F.lit("/"), F.array_join(F.slice(segs, 1, i), "/")),
        )
    )


def cutWWW(url) -> Column:
    return F.regexp_replace(col_of(url), "(://)www\\.", "$1")


def cutQueryString(url) -> Column:
    return F.regexp_replace(col_of(url), "\\?[^#]*", "")


def cutFragment(url) -> Column:
    return F.regexp_replace(col_of(url), "#.*$", "")


def cutQueryStringAndFragment(url) -> Column:
    return F.regexp_replace(col_of(url), "[?#].*$", "")


def cutURLParameter(url, name: str) -> Column:
    u = F.regexp_replace(col_of(url), f"([?&]){name}=[^&#]*&", "$1")
    return F.regexp_replace(u, f"[?&]{name}=[^&#]*", "")


def decodeURLComponent(url) -> Column:
    return F.url_decode(col_of(url))
