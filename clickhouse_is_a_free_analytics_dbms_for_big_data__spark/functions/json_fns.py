"""visitParam* fast-JSON functions.

Reference: dbms/src/Functions/FunctionsVisitParam.cpp — fast scan of a
semi-structured `Params` string field.  Spark's get_json_object family
is the JVM-side equivalent (and is strictly more correct — the
reference does not fully parse JSON).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ._util import col_of

__all__ = [
    "visitParamHas", "visitParamExtractUInt", "visitParamExtractInt",
    "visitParamExtractFloat", "visitParamExtractBool",
    "visitParamExtractRaw", "visitParamExtractString",
]


def _jpath(name: str) -> str:
    return f"$.{name}"


def visitParamHas(params, name: str) -> Column:
    return F.get_json_object(col_of(params), _jpath(name)).isNotNull()


def visitParamExtractUInt(params, name: str) -> Column:
    return F.coalesce(
        F.get_json_object(col_of(params), _jpath(name)).try_cast("bigint"),
        F.lit(0),
    )


visitParamExtractInt = visitParamExtractUInt


def visitParamExtractFloat(params, name: str) -> Column:
    return F.coalesce(
        F.get_json_object(col_of(params), _jpath(name)).try_cast("double"),
        F.lit(0.0),
    )


def visitParamExtractBool(params, name: str) -> Column:
    return F.get_json_object(col_of(params), _jpath(name)) == "true"


def visitParamExtractRaw(params, name: str) -> Column:
    return F.get_json_object(col_of(params), _jpath(name))


def visitParamExtractString(params, name: str) -> Column:
    return F.get_json_object(col_of(params), _jpath(name))
