"""The reference's scalar-function dialect as Column-expression builders.

Every public name mirrors a function registered in the reference's
Functions/FunctionFactory.cpp (SURVEY.md §2.8), implemented as
compositions of pyspark.sql.functions — JVM-side, whole-stage-codegen
eligible.  No Python UDFs in this package except where explicitly
documented (erf/erfc fallback).

``FUNCTIONS`` maps reference-dialect names to the builders, for the SQL
front-end and for introspection parity with the reference's
system.functions table.
"""

from . import (
    aggregates,
    arithmetic,
    arrays,
    conditional,
    conversion,
    datetime_fns,
    hashing,
    higher_order,
    ip,
    json_fns,
    math_fns,
    misc,
    reinterpret,
    rounding,
    strings,
    url,
)

_MODULES = (
    aggregates,
    arithmetic,
    arrays,
    conditional,
    conversion,
    datetime_fns,
    hashing,
    higher_order,
    ip,
    json_fns,
    math_fns,
    misc,
    reinterpret,
    rounding,
    strings,
    url,
)

FUNCTIONS: dict[str, object] = {}
for _m in _MODULES:
    for _name in getattr(_m, "__all__", ()):
        FUNCTIONS[_name] = getattr(_m, _name)
        globals()[_name] = getattr(_m, _name)

__all__ = ["FUNCTIONS"] + sorted(
    n for m in _MODULES for n in getattr(m, "__all__", ())
)
