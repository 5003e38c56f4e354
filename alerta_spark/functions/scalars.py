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

    Documented divergences from the reference (use
    :func:`to_utc_conformant` when a migrated rule depends on them):

    * no fuzzy string parsing — the reference falls back to
      ``dateutil.parse(fuzzy=True)`` (utils/dates.py:73), which
      accepts strings like ``'seen on 2023-11-14 at 22:13'``; this
      fast path returns NULL for them;
    * naive timestamps are treated as UTC, not the host's local
      timezone (utils/dates.py:79-84) — cluster-deterministic on
      purpose: a 1000-executor job must not depend on executor TZ.
    """
    s = _c(col).cast("string")
    num = s.try_cast("double")
    # try_cast BOTH steps: ANSI mode (default-on in Spark 4) makes a
    # plain cast THROW on overflow — a ~1e40 numeric string kills the
    # decimal(38,0) cast and a >int64 value kills the long cast,
    # aborting the whole scan where the contract is NULL-on-miss.
    # An overflowed n makes every magnitude branch NULL, so the row
    # falls through to try_to_timestamp (then NULL) — silent miss.
    n = num.try_cast("decimal(38,0)").try_cast("long")
    from_num = (
        F.when(n < _SEC_MAX, F.timestamp_seconds(num))
        .when(n < _MS_MAX, F.timestamp_millis(n))
        .when(n < _US_MAX, F.timestamp_micros(n))
        .otherwise(F.timestamp_micros((n / 1000).cast("long")))
    )
    # try_to_timestamp: NULL on unparseable strings (ANSI-safe),
    # matching DotDict-style silent-miss semantics
    return F.when(num.isNotNull(), from_num).otherwise(F.try_to_timestamp(s))


def to_utc_conformant(col: Column | str) -> Column:
    """C8 exact-conformance mode: an Arrow-batched pandas UDF
    replicating reference toUTC (utils/dates.py:38-85) decision-for-
    decision — the string epoch-divisor quirk (``10 ** (len % 10)``),
    ``<= 0`` -> epoch zero, ``dateutil.parse(fuzzy=True)`` for
    arbitrary strings, and naive -> LOCAL timezone. Unparseable
    strings yield NULL instead of the reference's ValueError (a
    distributed scan can't abort on one bad row; filter
    ``IS NULL`` to find them).

    This is the slow path — use :func:`to_utc` (pure codegen) unless
    a migrated rule depends on fuzzy parsing or local-TZ semantics."""
    import pandas as pd

    def _f(s):
        from datetime import datetime, timezone

        from dateutil.parser import parse as du_parse
        from dateutil.tz import tzlocal

        local = tzlocal()
        epoch0 = datetime(1970, 1, 1, tzinfo=timezone.utc)

        def one(v):
            if v is None:
                return None
            obj = None
            v = str(v)
            if v.isdigit():
                iv = int(v)
                if iv <= 0:
                    obj = epoch0
                else:
                    # the reference's divisor quirk, verbatim — but
                    # guarded: fromtimestamp raises Overflow/ValueError
                    # for digit strings outside the representable year
                    # range (e.g. 20 digits with len%10==0 -> divisor
                    # 1), and the documented contract is NULL on a bad
                    # row, never an aborted scan
                    divisor = int("1" + "0" * (len(v) % 10))
                    try:
                        obj = datetime.fromtimestamp(iv / divisor, local)
                    except (OverflowError, ValueError, OSError):
                        return None
            else:
                try:
                    # OverflowError/OSError guards: 'inf' overflows
                    # int(fv), and an out-of-range epoch overflows
                    # fromtimestamp — one bad row must yield NULL, not
                    # abort the scan
                    fv = float(v)
                    if fv <= 0:
                        obj = epoch0
                    else:
                        import math

                        magnitude = int(math.log10(int(fv)))
                        if magnitude > 9:
                            fv = fv / 10 ** (magnitude - 9)
                        obj = datetime.fromtimestamp(fv, local)
                except (OverflowError, OSError):
                    return None
                except ValueError:
                    try:
                        obj = du_parse(v, fuzzy=True)
                    except (ValueError, OverflowError):
                        return None
            if obj.tzinfo is None:
                obj = obj.replace(tzinfo=local)
            # tz-naive UTC for Spark's TimestampType
            return obj.astimezone(timezone.utc).replace(tzinfo=None)

        return s.map(one)

    # `from __future__ import annotations` stringifies hints, which
    # breaks pandas_udf's hint parsing — set them explicitly
    _f.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return F.pandas_udf(_f, "timestamp")(_c(col).cast("string"))


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


def is_cidr(col: Column | str) -> Column:
    """C16: valid `addr/prefix` CIDR notation (v4 prefix 0-32, v6
    0-128) — the reference's is_ip accepts these via
    netaddr.IPNetwork (utils/helpers.py:44-61)."""
    s = _c(col).cast("string")
    addr = F.substring_index(s, "/", 1)
    plen = F.substring_index(s, "/", -1).try_cast("int")
    return (
        s.contains("/")
        & plen.isNotNull()
        & (
            (addr.rlike(_IPV4) & plen.between(0, 32))
            | (addr.rlike(_IPV6) & plen.between(0, 128))
        )
    )


def is_ip(col: Column | str) -> Column:
    """C16 `is_ip`: a single address OR a CIDR range, matching the
    reference's netaddr.IPNetwork acceptance (utils/helpers.py:44-61).
    """
    return is_ipv4(col) | is_ipv6(col) | is_cidr(col)


def ipv4_to_long(col: Column | str) -> Column:
    """Dotted-quad IPv4 -> uint32 as a long, pure codegen (no UDF):
    ((o1*256+o2)*256+o3)*256+o4. NULL for non-IPv4 input."""
    s = _c(col).cast("string")
    parts = F.split(s, r"\.")
    acc = F.element_at(parts, 1).try_cast("long")
    for i in (2, 3, 4):
        acc = acc * 256 + F.element_at(parts, i).try_cast("long")
    return F.when(s.rlike(_IPV4), acc)


def in_cidr(col: Column | str, cidr: str) -> Column:
    """CIDR membership for IPv4 (reference filters like `10.0.0.0/8`,
    utils/helpers.py:44-61 via netaddr). The cidr literal is parsed
    driver-side into a [lo, hi] long range, so the executor-side test
    is one BETWEEN over :func:`ipv4_to_long` — fully codegen, pushes
    down as a range predicate. IPv6 ranges need a 128-bit integer and
    are validation-only here (documented divergence)."""
    import ipaddress

    net = ipaddress.ip_network(cidr, strict=False)
    if net.version != 4:
        raise ValueError(f"in_cidr supports IPv4 ranges only, got: {cidr}")
    lo = int(net.network_address)
    hi = int(net.broadcast_address)
    return F.coalesce(
        ipv4_to_long(col).between(F.lit(lo), F.lit(hi)), F.lit(False)
    )


def in_any_cidr(col: Column | str, cidrs: list[str]) -> Column:
    """Membership in ANY of a CIDR list (allow/deny lists). N ranges
    compile to N range predicates OR-ed JVM-side — fine for rule-sized
    lists; a 10k-entry feed should be a broadcast range join instead."""
    out = F.lit(False)
    for c in cidrs:
        out = out | in_cidr(col, c)
    return out


# C17: the reference's CloudTrail filename regex verbatim (including
# its unescaped dots), case-insensitive. One pattern, two consumers:
# the Column predicate below and sources/ingest's driver-side file-
# listing pre-filter — they must never drift.
CLOUDTRAIL_FILENAME_RE = r"(?i)\d+_cloudtrail_.+.json.gz$"


def is_cloudtrail(col: Column | str) -> Column:
    """C17 `is_cloudtrail` (utils/helpers.py:10,39-41): the reference's
    filename regex verbatim (including its unescaped dots), case-
    insensitive. Apply to ``F.input_file_name()`` to gate a
    file-derived frame, or to any filename column."""
    return _c(col).cast("string").rlike(CLOUDTRAIL_FILENAME_RE)
