"""Pig datetime builtins (builtin/ToDate.java, GetYear.java ...,
AddDuration.java, YearsBetween.java ... — Joda-Time based).

Pig datetimes are timezone-aware Joda DateTimes; Spark TimestampType +
a fixed UTC session timezone (session.py) gives equivalent arithmetic.
Durations are ISO-8601 strings (P1Y2M3DT4H5M6S), parsed here into
Spark interval expressions.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

ToString = F.date_format
CurrentTime = F.current_timestamp
GetYear = F.year
GetMonth = F.month
GetDay = F.dayofmonth
GetHour = F.hour
GetMinute = F.minute
GetSecond = F.second
GetWeek = F.weekofyear


def GetWeekYear(col: Column) -> Column:
    """GetWeekYear.java:73-82 (Joda getWeekyear): ISO week-based year
    = the calendar year of that ISO week's Thursday (weekday() is
    Monday=0, so Thursday = date + (3 - weekday))."""
    d = F.to_date(col)
    return F.year(F.date_add(d, F.lit(3) - F.weekday(d)))


def ToDate(col: Column, fmt: str | None = None, tz: str | None = None) -> Column:
    """ToDate.java (+ ToDate3ARGS.java) — chararray/long → datetime;
    the optional third arg is the timezone the text is IN (the result
    is the instant of that wall-clock time in that zone — sessions run
    UTC, so to_utc_timestamp gives exactly the DateTimeZone shift)."""
    if isinstance(col, str):  # literal date text, not a column ref
        col = F.lit(col)
    ts = F.to_timestamp(col, fmt) if fmt else F.to_timestamp(col)
    if tz is not None:
        ts = F.to_utc_timestamp(ts, tz)
    return ts


def ToUnixTime(col: Column) -> Column:
    return F.unix_timestamp(col)


def ns_to_timestamp(col: Column) -> Column:
    """Nanosecond-epoch long → TimestampType (truncating to micros).

    Spark has no nanosecond timestamps; parquet TIMESTAMP(NANOS)
    columns are read as long via spark.sql.legacy.parquet.nanosAsLong
    (session.py) and converted at use sites."""
    return F.timestamp_micros((col / 1000).cast("long"))


def event_ts(df, col: str = "ts") -> Column:
    """The events timestamp as TimestampType, whatever physical type
    the parquet delivered: long nanos (legacy TIMESTAMP(NANOS) files
    read under nanosAsLong), native timestamp, or timestamp_ntz
    (current testdata is TIMESTAMP(MICROS, ntz)). The session timezone
    is pinned to UTC by sources.ensure_pig_session_semantics, so the
    ntz→timestamp cast is instant-stable and matches an oracle's naive
    read of the same file."""
    from pyspark.sql import types as T

    dt = df.schema[col].dataType
    if isinstance(dt, T.LongType):
        return ns_to_timestamp(F.col(col))
    if isinstance(dt, T.TimestampNTZType):
        return F.col(col).cast("timestamp")
    return F.col(col)


def event_ts_us(df, col: str = "ts") -> Column:
    """Micros-since-epoch BIGINT of the events timestamp (the unit
    DuckDB's epoch_us(ts) yields) — for gap/as-of arithmetic that
    wants plain integers instead of intervals."""
    from pyspark.sql import types as T

    dt = df.schema[col].dataType
    if isinstance(dt, T.LongType):
        return F.expr(f"CAST({col} DIV 1000 AS BIGINT)")
    return F.unix_micros(event_ts(df, col))


def ToMilliSeconds(col: Column) -> Column:
    return (F.unix_timestamp(col) * 1000 + F.date_part(F.lit("MILLISECOND"), col).cast("long") % 1000).cast("long")


def GetMilliSecond(col: Column) -> Column:
    return (F.date_part(F.lit("MILLISECOND"), col) % 1000).cast("int")


_DUR = re.compile(
    r"^P(?:(?P<y>\d+)Y)?(?:(?P<mo>\d+)M)?(?:(?P<w>\d+)W)?(?:(?P<d>\d+)D)?"
    r"(?:T(?:(?P<h>\d+)H)?(?:(?P<mi>\d+)M)?(?:(?P<s>\d+(?:\.\d+)?)S)?)?$"
)


def AddDuration(col: Column, duration: str) -> Column:
    """AddDuration.java — datetime + ISO-8601 duration."""
    return _apply_duration(col, duration, add=True)


def SubtractDuration(col: Column, duration: str) -> Column:
    return _apply_duration(col, duration, add=False)


def _apply_duration(col: Column, duration: str, add: bool) -> Column:
    m = _DUR.match(duration)
    if not m:
        raise ValueError(f"bad ISO-8601 duration: {duration!r}")
    g = {k: v or "0" for k, v in m.groupdict().items()}
    months = int(g["y"]) * 12 + int(g["mo"])
    days = int(g["w"]) * 7 + int(g["d"])
    secs = int(g["h"]) * 3600 + int(g["mi"]) * 60 + float(g["s"])
    out = col
    if months:
        iv = F.expr(f"INTERVAL '{months}' MONTH")
        out = out + iv if add else out - iv
    if days or secs:
        total = days * 86400 + secs
        iv = F.expr(f"INTERVAL '{total}' SECOND")
        out = out + iv if add else out - iv
    return out


# The *Between family truncates TOWARD ZERO, not floor: Joda's
# fieldsBetween (used by YearsBetween.java etc.) returns complete
# units of the signed duration, so -1.5 days between is -1, not -2.
# Column.cast('long') on a double truncates toward zero — exactly it.


def YearsBetween(end: Column, start: Column) -> Column:
    """YearsBetween.java — whole years between (Joda Years.yearsBetween)."""
    return (F.months_between(end, start) / 12).cast("long")


def MonthsBetween(end: Column, start: Column) -> Column:
    return F.months_between(end, start).cast("long")


def WeeksBetween(end: Column, start: Column) -> Column:
    return ((F.unix_timestamp(end) - F.unix_timestamp(start)) / (7 * 86400)).cast("long")


def DaysBetween(end: Column, start: Column) -> Column:
    return ((F.unix_timestamp(end) - F.unix_timestamp(start)) / 86400).cast("long")


def HoursBetween(end: Column, start: Column) -> Column:
    return ((F.unix_timestamp(end) - F.unix_timestamp(start)) / 3600).cast("long")


def MinutesBetween(end: Column, start: Column) -> Column:
    return ((F.unix_timestamp(end) - F.unix_timestamp(start)) / 60).cast("long")


def SecondsBetween(end: Column, start: Column) -> Column:
    return (F.unix_timestamp(end) - F.unix_timestamp(start)).cast("long")


def MilliSecondsBetween(end: Column, start: Column) -> Column:
    return (ToMilliSeconds(end) - ToMilliSeconds(start)).cast("long")
