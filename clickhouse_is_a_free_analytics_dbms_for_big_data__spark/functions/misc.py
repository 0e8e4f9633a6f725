"""Miscellaneous functions.

Reference: dbms/src/Functions/FunctionsMiscellaneous.cpp,
FunctionsTransform.h:53 (transform), FunctionsFormatting.cpp
(formatReadableSize, bar), FunctionsRandom.cpp (rand),
FunctionsGeo.cpp (greatCircleDistance, pointInEllipses).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ._util import col_of, lit_of

__all__ = [
    "transform", "bar", "formatReadableSize", "toTypeName", "isFinite",
    "isInfinite", "isNaN", "tuple_", "tupleElement", "materialize",
    "ignore", "identity_", "rand_", "rand64", "greatCircleDistance",
    "pointInEllipses", "sleep", "version", "hostName", "currentDatabase",
]


def transform(x, from_vals, to_vals, default=None) -> Column:
    """Value remap with default (reference transform — benchmark-hot).

    Compiled to element_at over a map literal — a broadcast-free
    constant-time lookup in codegen.
    """
    x_ = col_of(x)
    pairs = []
    for f_, t_ in zip(from_vals, to_vals):
        pairs.extend([F.lit(f_), F.lit(t_)])
    m = F.create_map(*pairs)
    looked = F.element_at(m, x_)
    if default is None:
        return F.coalesce(looked, x_)
    return F.coalesce(looked, lit_of(default))


def bar(x, min_v: float, max_v: float, width: int = 80) -> Column:
    """Unicode bar chart of x scaled to [min_v, max_v] (reference bar).
    Full blocks only (the reference draws eighth-blocks; display-only)."""
    x_ = col_of(x).cast("double")
    frac = (x_ - min_v) / (max_v - min_v)
    n = F.greatest(
        F.least(F.round(frac * width).cast("int"), F.lit(width)), F.lit(0)
    )
    return F.repeat(F.lit("█"), n)


def formatReadableSize(x) -> Column:
    """1.23 KiB / 4.56 MiB ... (reference formatReadableSize)."""
    x_ = col_of(x).cast("double")
    units = ["B", "KiB", "MiB", "GiB", "TiB", "PiB"]
    expr = F.concat(F.format_number(x_, 2), F.lit(" B"))
    for i, u in enumerate(units[1:], start=1):
        bound = float(1024 ** i)
        expr = F.when(
            x_ >= bound,
            F.concat(F.format_number(x_ / bound, 2), F.lit(" " + u)),
        ).otherwise(expr)
    return expr


def toTypeName(x) -> Column:
    # Resolved at plan time by the caller (needs a DataFrame context);
    # placeholder returns Spark's simpleString via a literal when known.
    raise NotImplementedError(
        "toTypeName needs schema context: use df.schema[col].dataType.simpleString()"
    )


def isFinite(x) -> Column:
    x_ = col_of(x).cast("double")
    return ~(F.isnan(x_) | (F.abs(x_) == float("inf")))


def isInfinite(x) -> Column:
    return F.abs(col_of(x).cast("double")) == float("inf")


def isNaN(x) -> Column:
    return F.isnan(col_of(x).cast("double"))


def tuple_(*cols) -> Column:
    """Tuple(...) — struct with CH-style positional field names _1.._N."""
    return F.struct(
        *[col_of(c).alias(f"_{i + 1}") for i, c in enumerate(cols)]
    )


def tupleElement(t, idx: int) -> Column:
    """1-based tuple element access (reference tupleElement); expects a
    struct built by tuple_()."""
    return col_of(t).getField(f"_{idx}")


def materialize(x) -> Column:
    return col_of(x)


def ignore(*_cols) -> Column:
    return F.lit(0)


def identity_(x) -> Column:
    return col_of(x)


def rand_(seed: int | None = None) -> Column:
    """UInt32-range uniform random (reference rand); seedable for tests."""
    r = F.rand(seed) if seed is not None else F.rand()
    return (r * 4294967296).cast("long")


def rand64(seed: int | None = None) -> Column:
    r = F.rand(seed) if seed is not None else F.rand()
    return (r * 9.223372036854776e18).cast("long")


def greatCircleDistance(lon1, lat1, lon2, lat2) -> Column:
    """Haversine distance in meters (reference FunctionsGeo.cpp)."""
    rad = 0.017453292519943295
    la1, la2 = col_of(lat1) * rad, col_of(lat2) * rad
    dla = (col_of(lat2) - col_of(lat1)) * rad
    dlo = (col_of(lon2) - col_of(lon1)) * rad
    a = F.sin(dla / 2) ** 2 + F.cos(la1) * F.cos(la2) * F.sin(dlo / 2) ** 2
    # EARTH_RADIUS_IN_METERS from the reference (FunctionsGeo.h:21)
    return F.lit(2 * 6372797.560856) * F.asin(F.sqrt(a))


def pointInEllipses(x, y, *ellipses) -> Column:
    """pointInEllipses(x, y, x0, y0, a, b, ...): true if (x,y) is inside
    any ellipse (reference FunctionsGeo.cpp)."""
    x_, y_ = col_of(x), col_of(y)
    out = F.lit(False)
    for i in range(0, len(ellipses), 4):
        x0, y0, a, b = ellipses[i : i + 4]
        out = out | (
            ((x_ - x0) / a) ** 2 + ((y_ - y0) / b) ** 2 <= 1
        )
    return out


def sleep(_seconds) -> Column:
    raise NotImplementedError("sleep is a debugging no-op; not supported")


def version() -> Column:
    return F.lit("clickhouse-dbms-spark/0.1")


def hostName() -> Column:
    import socket

    return F.lit(socket.gethostname())


def currentDatabase() -> Column:
    return F.lit("default")
