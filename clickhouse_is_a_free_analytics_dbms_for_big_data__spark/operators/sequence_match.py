"""sequenceMatch / sequenceCount — event-sequence pattern aggregates.

Reference: dbms/src/AggregateFunctions/AggregateFunctionSequenceMatch.h
(:145 sequenceMatch, :157 sequenceCount; pattern parser :289-359).
Pattern grammar supported here: ``(?N)`` = event satisfying condition N,
``.*`` = any events between, ``.`` = exactly one event.  The time
constraint ``(?t<=n)`` is not supported (raises).

Spark-first design: instead of a stateful NFA per group (the
reference's approach), each event is encoded as one character — the
digit of the first condition it satisfies, or 'x' — events are sorted
by timestamp *inside an aggregate expression* (sort_array over
collect_list), and the pattern becomes an ordinary regex over the
encoded string.  Everything stays JVM-side: one shuffle for the
groupBy, regex in codegen, no Python in the loop.

Caveat (documented divergence): conditions are assumed disjoint per
event (each event matches at most one (?N)); the reference's NFA
allows overlapping conditions.  Funnel queries — the function's actual
use — have disjoint conditions by construction.
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _encode_events(ts: Column, conds: Sequence[Column]) -> Column:
    """Aggregate expression: time-ordered condition-digit string."""
    # first-match-wins condition digit
    char = F.lit("x")
    for i in reversed(range(len(conds))):
        char = F.when(conds[i], F.lit(str(i + 1))).otherwise(char)
    pairs = F.collect_list(F.struct(ts.alias("t"), char.alias("c")))
    return F.array_join(
        F.transform(F.array_sort(pairs), lambda s: s.getField("c")), ""
    )


def _pattern_to_regex(pattern: str) -> str:
    if "(?t" in pattern:
        raise NotImplementedError(
            "time-constrained patterns (?t<=n) are not supported"
        )
    out = []
    i = 0
    while i < len(pattern):
        if pattern.startswith("(?", i):
            j = pattern.index(")", i)
            n = int(pattern[i + 2 : j])
            out.append(str(n))
            i = j + 1
        elif pattern.startswith(".*", i):
            out.append(".*?")
            i += 2
        elif pattern[i] == ".":
            out.append(".")
            i += 1
        else:
            raise ValueError(f"unsupported pattern token at {pattern[i:]}")
    return "".join(out)


def sequence_match(
    pattern: str, ts: Column, conds: Sequence[Column]
) -> Column:
    """Aggregate expression: 1 if the group's event sequence matches."""
    encoded = _encode_events(ts, conds)
    regex = _pattern_to_regex(pattern)
    return encoded.rlike(regex).cast("int")


def sequence_count(
    pattern: str, ts: Column, conds: Sequence[Column]
) -> Column:
    """Aggregate expression: number of non-overlapping matches."""
    encoded = _encode_events(ts, conds)
    regex = _pattern_to_regex(pattern)
    return F.size(F.regexp_extract_all(encoded, F.lit(f"({regex})"), 1))
