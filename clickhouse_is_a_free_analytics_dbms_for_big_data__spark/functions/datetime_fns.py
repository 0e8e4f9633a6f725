"""Date/time functions.

Reference: dbms/src/Functions/FunctionsDateTime.cpp (header 913 LoC).

Traps encoded here (SURVEY.md §7): the reference's toDayOfWeek is
Monday=1..Sunday=7 while Spark's dayofweek is Sunday=1; toMonday
anchors weeks on Monday; DateTime is second precision.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ._util import col_of

__all__ = [
    "toYear", "toMonth", "toDayOfMonth", "toDayOfWeek", "toHour",
    "toMinute", "toSecond", "toMonday", "toStartOfDay", "toStartOfMonth",
    "toStartOfQuarter", "toStartOfYear", "toStartOfMinute",
    "toStartOfFiveMinute", "toStartOfHour", "toTime",
    "toRelativeYearNum", "toRelativeMonthNum", "toRelativeWeekNum",
    "toRelativeDayNum", "toRelativeHourNum", "toRelativeMinuteNum",
    "toRelativeSecondNum", "now", "today", "yesterday", "timeSlot",
    "timeSlots",
]


def toYear(d) -> Column:
    return F.year(col_of(d))


def toMonth(d) -> Column:
    return F.month(col_of(d))


def toDayOfMonth(d) -> Column:
    return F.dayofmonth(col_of(d))


def toDayOfWeek(d) -> Column:
    """Monday=1 .. Sunday=7 (reference); Spark dayofweek is Sunday=1."""
    return F.weekday(col_of(d)) + 1


def toHour(d) -> Column:
    return F.hour(col_of(d))


def toMinute(d) -> Column:
    return F.minute(col_of(d))


def toSecond(d) -> Column:
    return F.second(col_of(d))


def toMonday(d) -> Column:
    """Date of the Monday of this value's week."""
    d_ = col_of(d)
    return F.date_sub(F.to_date(d_), F.weekday(d_))


def toStartOfDay(d) -> Column:
    return F.date_trunc("day", col_of(d))


def toStartOfMonth(d) -> Column:
    return F.to_date(F.date_trunc("month", col_of(d)))


def toStartOfQuarter(d) -> Column:
    return F.to_date(F.date_trunc("quarter", col_of(d)))


def toStartOfYear(d) -> Column:
    return F.to_date(F.date_trunc("year", col_of(d)))


def toStartOfMinute(d) -> Column:
    return F.date_trunc("minute", col_of(d))


def toStartOfFiveMinute(d) -> Column:
    ts = col_of(d).cast("timestamp")
    secs = ts.cast("long")
    return F.timestamp_seconds(secs - (secs % 300))


def toStartOfHour(d) -> Column:
    return F.date_trunc("hour", col_of(d))


def toTime(d) -> Column:
    """Keep time-of-day, move date to a fixed day (reference uses
    1970-01-02 to stay positive)."""
    ts = col_of(d).cast("timestamp")
    secs = ts.cast("long")
    return F.timestamp_seconds((secs % 86400) + 86400)


def toRelativeYearNum(d) -> Column:
    return F.year(col_of(d))


def toRelativeMonthNum(d) -> Column:
    d_ = col_of(d)
    return F.year(d_) * 12 + F.month(d_)


def toRelativeWeekNum(d) -> Column:
    # weeks since epoch, Monday-anchored (1970-01-01 was a Thursday)
    days = F.datediff(F.to_date(col_of(d)), F.lit("1970-01-01").cast("date"))
    return ((days + 3) / 7).cast("long")


def toRelativeDayNum(d) -> Column:
    return F.datediff(F.to_date(col_of(d)), F.lit("1970-01-01").cast("date"))


def toRelativeHourNum(d) -> Column:
    return (col_of(d).cast("timestamp").cast("long") / 3600).cast("long")


def toRelativeMinuteNum(d) -> Column:
    return (col_of(d).cast("timestamp").cast("long") / 60).cast("long")


def toRelativeSecondNum(d) -> Column:
    return col_of(d).cast("timestamp").cast("long")


def now() -> Column:
    return F.current_timestamp()


def today() -> Column:
    return F.current_date()


def yesterday() -> Column:
    return F.date_sub(F.current_date(), 1)


def timeSlot(d) -> Column:
    """Round down to 30-minute slot."""
    secs = col_of(d).cast("timestamp").cast("long")
    return F.timestamp_seconds(secs - (secs % 1800))


def timeSlots(start, duration) -> Column:
    """Array of 30-min slot starts covering [start, start+duration]."""
    s = col_of(start).cast("timestamp").cast("long")
    dur = col_of(duration).cast("long")
    first = s - (s % 1800)
    last = (s + dur) - ((s + dur) % 1800)
    return F.transform(
        F.sequence(first, last, F.lit(1800)), lambda x: F.timestamp_seconds(x)
    )
