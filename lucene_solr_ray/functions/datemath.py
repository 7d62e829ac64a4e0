"""Solr date-math expression parser.

Re-specification of ``DateMathParser``
(`solr/core/src/java/org/apache/solr/util/DateMathParser.java:141-239`):
an anchor instant (an ISO-8601 literal or ``NOW``) followed by a chain of
operations —

* ``/UNIT``   round DOWN to the unit (``NOW/DAY``)
* ``+N UNIT`` add    (``NOW+6MONTHS``)
* ``-N UNIT`` subtract

Units: ``YEAR(S) MONTH(S) DAY(S)/DATE HOUR(S) MINUTE(S) SECOND(S)
MILLI(S)/MILLISECOND(S)`` — calendar-aware for YEAR/MONTH (like the
reference's Calendar arithmetic), fixed durations otherwise.  ``NOW`` is
supplied by the caller (the reference's ``NOW`` request param) so results
are deterministic.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone

_UNIT_ALIASES = {
    "YEAR": "YEAR", "YEARS": "YEAR",
    "MONTH": "MONTH", "MONTHS": "MONTH",
    "DAY": "DAY", "DAYS": "DAY", "DATE": "DAY",
    "HOUR": "HOUR", "HOURS": "HOUR",
    "MINUTE": "MINUTE", "MINUTES": "MINUTE",
    "SECOND": "SECOND", "SECONDS": "SECOND",
    "MILLI": "MILLI", "MILLIS": "MILLI",
    "MILLISECOND": "MILLI", "MILLISECONDS": "MILLI",
}

_OP_RE = re.compile(r"(/|\+|-)([A-Z]+|\d+[A-Z]+)")
_TOK_RE = re.compile(r"(/[A-Z]+|[+-]\d+[A-Z]+)")


class DateMathParseError(ValueError):
    pass


def _round_down(dt: datetime, unit: str) -> datetime:
    if unit == "YEAR":
        return dt.replace(month=1, day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit == "MONTH":
        return dt.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit == "DAY":
        return dt.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit == "HOUR":
        return dt.replace(minute=0, second=0, microsecond=0)
    if unit == "MINUTE":
        return dt.replace(second=0, microsecond=0)
    if unit == "SECOND":
        return dt.replace(microsecond=0)
    if unit == "MILLI":
        return dt.replace(microsecond=(dt.microsecond // 1000) * 1000)
    raise DateMathParseError(f"unknown unit {unit}")


def _add(dt: datetime, n: int, unit: str) -> datetime:
    if unit == "YEAR":
        import calendar

        # clamp like Calendar.add: Feb 29 + 1YEAR -> Feb 28
        day = min(dt.day, calendar.monthrange(dt.year + n, dt.month)[1])
        return dt.replace(year=dt.year + n, day=day)
    if unit == "MONTH":
        m = dt.month - 1 + n
        year = dt.year + m // 12
        month = m % 12 + 1
        # clamp day like Calendar.add (Jan 31 + 1MONTH -> Feb 28/29)
        import calendar

        day = min(dt.day, calendar.monthrange(year, month)[1])
        return dt.replace(year=year, month=month, day=day)
    scale = {
        "DAY": timedelta(days=1),
        "HOUR": timedelta(hours=1),
        "MINUTE": timedelta(minutes=1),
        "SECOND": timedelta(seconds=1),
        "MILLI": timedelta(milliseconds=1),
    }[unit]
    return dt + n * scale


def parse_datemath(expr: str, now: datetime | None = None) -> datetime:
    """Evaluate a date-math expression to a timezone-naive UTC datetime."""
    expr = expr.strip()
    if now is not None and now.tzinfo is not None:
        now = now.astimezone(timezone.utc).replace(tzinfo=None)
    if expr.startswith("NOW"):
        if now is None:
            raise DateMathParseError("NOW requires an explicit anchor (pass now=)")
        anchor, rest = now, expr[3:]
    else:
        m = re.match(r"(\d{4}-\d{2}-\d{2}(?:T\d{2}:\d{2}:\d{2}(?:\.\d+)?)?)Z?", expr)
        if not m:
            raise DateMathParseError(f"cannot parse anchor of {expr!r}")
        lit = m.group(1)
        fmt = "%Y-%m-%dT%H:%M:%S.%f" if "." in lit else (
            "%Y-%m-%dT%H:%M:%S" if "T" in lit else "%Y-%m-%d"
        )
        anchor, rest = datetime.strptime(lit, fmt), expr[m.end():]
    dt = anchor
    pos = 0
    while pos < len(rest):
        m = _TOK_RE.match(rest, pos)
        if not m:
            raise DateMathParseError(f"cannot parse {rest[pos:]!r} in {expr!r}")
        tok = m.group(0)
        if tok.startswith("/"):
            unit = _UNIT_ALIASES.get(tok[1:])
            if unit is None:
                raise DateMathParseError(f"unknown unit in {tok!r}")
            dt = _round_down(dt, unit)
        else:
            sign = 1 if tok[0] == "+" else -1
            mm = re.match(r"[+-](\d+)([A-Z]+)", tok)
            unit = _UNIT_ALIASES.get(mm.group(2))
            if unit is None:
                raise DateMathParseError(f"unknown unit in {tok!r}")
            dt = _add(dt, sign * int(mm.group(1)), unit)
        pos = m.end()
    return dt


_INTERVAL_RE = re.compile(r"([\[(])\s*([^,]+?)\s*,\s*([^\])]+?)\s*([\])])")


def parse_interval(spec: str):
    """Solr interval-facet syntax ``[a,b]`` / ``(a,b)`` / ``[*,10)`` ->
    (lo, hi, include_lo, include_hi) with None for ``*``
    (`IntervalFacets.java` ``FacetInterval`` parsing)."""
    m = _INTERVAL_RE.fullmatch(spec.strip())
    if not m:
        raise ValueError(f"bad interval {spec!r}")
    lo_s, hi_s = m.group(2), m.group(3)

    def val(s):
        if s == "*":
            return None
        try:
            return int(s)
        except ValueError:
            return float(s)

    return val(lo_s), val(hi_s), m.group(1) == "[", m.group(4) == "]"
