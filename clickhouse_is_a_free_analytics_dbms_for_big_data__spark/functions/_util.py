"""Shared helpers for the function dialect."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def col_of(x) -> Column:
    """Accept a Column, a column name, or a Python literal."""
    if isinstance(x, Column):
        return x
    if isinstance(x, str):
        return F.col(x)
    return F.lit(x)


def lit_of(x) -> Column:
    """Like col_of but strings are literals (for value arguments)."""
    if isinstance(x, Column):
        return x
    return F.lit(x)
