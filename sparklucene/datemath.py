"""Solr date math expressions.

The reference parses date math strings everywhere a date is accepted —
``fq=ts:[NOW/DAY-7DAYS TO NOW/DAY]``, range facet gaps, TTLs (public
knowledge: ``u8:solr/solrj/src/java/org/apache/solr/util/
DateMathParser.java`` ~400 LoC). This module pins that grammar:

    expr   := anchor op*
    anchor := 'NOW' | ISO-8601 instant ending in 'Z'
             (YYYY-MM-DDTHH:MM:SS[.fff]Z)
    op     := '/' UNIT                  # round DOWN to unit start
            | ('+' | '-') N UNIT        # calendar arithmetic

Units (singular/plural aliases as the reference accepts them): YEAR,
MONTH, DAY/DATE, HOUR, MINUTE, SECOND, MILLI/MILLISECOND. Operations
apply strictly left to right; unconsumed trailing input is an error —
both exactly the reference's behavior.

Calendar arithmetic pins Java ``Calendar.add`` semantics (what the
reference delegates to): adding months clamps the day-of-month to the
target month's length (Jan 31 + 1MONTH = Feb 28/29), and year adds
clamp Feb 29 → Feb 28 on non-leap targets.

Everything is timezone-naive UTC (Solr's default TZ for date math);
the engine session pins ``spark.sql.session.timeZone=UTC`` to match.
Parsing happens driver-side (operator-constant), producing plain
``datetime`` bounds that compile into pushed-down scan predicates —
date math never touches executors.
"""

from __future__ import annotations

import calendar
import re
from datetime import datetime, timedelta

_UNITS = {
    "YEAR": "year", "YEARS": "year",
    "MONTH": "month", "MONTHS": "month",
    "DAY": "day", "DAYS": "day", "DATE": "day",
    "HOUR": "hour", "HOURS": "hour",
    "MINUTE": "minute", "MINUTES": "minute",
    "SECOND": "second", "SECONDS": "second",
    "MILLI": "milli", "MILLIS": "milli",
    "MILLISECOND": "milli", "MILLISECONDS": "milli",
}

_ANCHOR_RE = re.compile(
    r"^(NOW|\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d{1,3})?Z)")
_OP_RE = re.compile(r"/([A-Z]+)|([+-])(\d+)([A-Z]+)")

_TD = {"day": timedelta(days=1), "hour": timedelta(hours=1),
       "minute": timedelta(minutes=1), "second": timedelta(seconds=1),
       "milli": timedelta(milliseconds=1)}


def _round_down(dt: datetime, unit: str) -> datetime:
    if unit == "year":
        return dt.replace(month=1, day=1, hour=0, minute=0, second=0,
                          microsecond=0)
    if unit == "month":
        return dt.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit == "day":
        return dt.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit == "hour":
        return dt.replace(minute=0, second=0, microsecond=0)
    if unit == "minute":
        return dt.replace(second=0, microsecond=0)
    if unit == "second":
        return dt.replace(microsecond=0)
    if unit == "milli":
        return dt.replace(microsecond=dt.microsecond // 1000 * 1000)
    raise ValueError(f"unknown unit: {unit}")


def _add_months(dt: datetime, n: int) -> datetime:
    y = dt.year + (dt.month - 1 + n) // 12
    m = (dt.month - 1 + n) % 12 + 1
    d = min(dt.day, calendar.monthrange(y, m)[1])
    return dt.replace(year=y, month=m, day=d)


def _add(dt: datetime, n: int, unit: str) -> datetime:
    if unit == "year":
        return _add_months(dt, 12 * n)
    if unit == "month":
        return _add_months(dt, n)
    return dt + n * _TD[unit]


def parse_date_math(expr: str, now: datetime | None = None) -> datetime:
    """Evaluate a Solr date math expression to a naive-UTC datetime.

    ``now`` anchors the ``NOW`` keyword and MUST be supplied when the
    expression uses it (the engine never reads the wall clock inside an
    operator — determinism is the caller's responsibility, mirroring
    Solr's fixed ``NOW=`` request parameter for distributed
    consistency).
    """
    m = _ANCHOR_RE.match(expr)
    if not m:
        raise ValueError(f"date math must start with NOW or an ISO "
                         f"instant ending in Z: {expr!r}")
    a = m.group(1)
    if a == "NOW":
        if now is None:
            raise ValueError("expression uses NOW but no anchor was "
                             "supplied (pass now=, like Solr's NOW= "
                             "request param)")
        dt = now
    else:
        body = a[:-1]
        fmt = "%Y-%m-%dT%H:%M:%S.%f" if "." in body else "%Y-%m-%dT%H:%M:%S"
        dt = datetime.strptime(body, fmt)
    pos = m.end()
    while pos < len(expr):
        op = _OP_RE.match(expr, pos)
        if not op:
            raise ValueError(f"unparsable date math at {expr[pos:]!r}")
        if op.group(1) is not None:
            unit = _UNITS.get(op.group(1))
            if unit is None:
                raise ValueError(f"unknown unit: {op.group(1)}")
            dt = _round_down(dt, unit)
        else:
            unit = _UNITS.get(op.group(4))
            if unit is None:
                raise ValueError(f"unknown unit: {op.group(4)}")
            n = int(op.group(3))
            dt = _add(dt, n if op.group(2) == "+" else -n, unit)
        pos = op.end()
    return dt
