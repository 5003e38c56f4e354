"""Scalar function library (SURVEY.md §2.6 C8-C17), all as native
column expressions — no Python UDFs in any of these.

Reference parity notes per function are in the docstrings; everything
stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# epoch magnitude cutoffs from the reference's heuristic
# (utils/dates.py:43-62): seconds ~1e9, millis ~1e12, micros ~1e15,
# nanos ~1e18 for contemporary timestamps.
_SEC_MAX = 100_000_000_000  # < 1e11 -> seconds
_MS_MAX = 100_000_000_000_000  # < 1e14 -> millis
_US_MAX = 100_000_000_000_000_000  # < 1e17 -> micros


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def to_utc(col: Column | str) -> Column:
    """C8 `toUTC`: coerce str/number to a UTC timestamp with the
    reference's epoch-magnitude heuristic (utils/dates.py:38-85).

    Numeric inputs are classified by magnitude into s/ms/us/ns;
    strings go through to_timestamp (ISO-8601 and date-like forms).
    """
    s = _c(col).cast("string")
    num = s.try_cast("double")
    n = num.cast("decimal(38,0)").cast("long")
    from_num = (
        F.when(n < _SEC_MAX, F.timestamp_seconds(num))
        .when(n < _MS_MAX, F.timestamp_millis(n))
        .when(n < _US_MAX, F.timestamp_micros(n))
        .otherwise(F.timestamp_micros((n / 1000).cast("long")))
    )
    # try_to_timestamp: NULL on unparseable strings (ANSI-safe),
    # matching DotDict-style silent-miss semantics
    return F.when(num.isNotNull(), from_num).otherwise(F.try_to_timestamp(s))


def utc_epoch(col: Column | str) -> Column:
    """C11: epoch seconds of a timestamp (alerta.py:86-88)."""
    return F.unix_timestamp(_c(col))


def date_parts(ts: Column) -> Column:
    """C9 `get_date_parts`: zero-padded year/month/day/hour partition
    strings (utils/dates.py:13-35) as a struct."""
    return F.struct(
        F.date_format(ts, "yyyy").alias("year"),
        F.date_format(ts, "MM").alias("month"),
        F.date_format(ts, "dd").alias("day"),
        F.date_format(ts, "HH").alias("hour"),
    )


def meteor_id() -> Column:
    """C12: random 24-hex-char id (alerta.py:31-35)."""
    return F.lower(F.substring(F.replace(F.expr("uuid()"), F.lit("-"), F.lit("")), 1, 24))


def short_uuid() -> Column:
    """C13: first 8 chars of a uuid (utils/helpers.py:35-36)."""
    return F.substring(F.expr("uuid()"), 1, 8)


_IPV4 = (
    r"^((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}"
    r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])$"
)
# full-form / compressed IPv6 (pragmatic; netaddr in the reference,
# utils/helpers.py:44-74)
_IPV6 = (
    r"^(([0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}|"
    r"([0-9A-Fa-f]{1,4}:){1,7}:|"
    r"([0-9A-Fa-f]{1,4}:){1,6}:[0-9A-Fa-f]{1,4}|"
    r"([0-9A-Fa-f]{1,4}:){1,5}(:[0-9A-Fa-f]{1,4}){1,2}|"
    r"([0-9A-Fa-f]{1,4}:){1,4}(:[0-9A-Fa-f]{1,4}){1,3}|"
    r"([0-9A-Fa-f]{1,4}:){1,3}(:[0-9A-Fa-f]{1,4}){1,4}|"
    r"([0-9A-Fa-f]{1,4}:){1,2}(:[0-9A-Fa-f]{1,4}){1,5}|"
    r"[0-9A-Fa-f]{1,4}:((:[0-9A-Fa-f]{1,4}){1,6})|"
    r":((:[0-9A-Fa-f]{1,4}){1,7}|:))$"
)


def is_ipv4(col: Column | str) -> Column:
    """C16 `isIPv4` as an rlike (no UDF)."""
    return _c(col).cast("string").rlike(_IPV4)


def is_ipv6(col: Column | str) -> Column:
    """C16 `isIPv6` as an rlike (no UDF)."""
    return _c(col).cast("string").rlike(_IPV6)


def is_ip(col: Column | str) -> Column:
    """C16 `is_ip`."""
    return is_ipv4(col) | is_ipv6(col)
