"""DateMathParser — Solr's date expression language.

Reference: solr/core/src/java/org/apache/solr/util/DateMathParser.java
(:40-120 class doc + grammar, parseMath :230-280): an expression is an
optional absolute instant (else NOW), followed by any number of
``/UNIT`` (round down), ``+N UNIT`` and ``-N UNIT`` operations applied
left to right, e.g. ``2024-01-03T12:00:00Z/DAY+2DAYS``,
``NOW/HOUR-30MINUTES``.  Month arithmetic clamps the day-of-month like
java.util.Calendar.add (Jan 31 + 1 MONTH = Feb 29 in a leap year).

All arithmetic is driver-side (bucket boundaries are a handful of
values); the heavy per-row work stays in JVM codegen inside
operators/facets.range_facet.
"""

from __future__ import annotations

import calendar
import re
from datetime import datetime, timedelta

__all__ = ["parse_date_math", "parse_gap", "add_months"]

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

_SECONDS = {"DAY": 86400, "HOUR": 3600, "MINUTE": 60, "SECOND": 1}

_OP_RE = re.compile(r"([+\-/])(\d*)([A-Z]+)")

_ISO_RE = re.compile(
    r"^(\d{4})-(\d{2})-(\d{2})"
    r"(?:T(\d{2}):(\d{2}):(\d{2})(?:\.(\d{1,6}))?Z?)?"
)


def add_months(dt: datetime, n: int) -> datetime:
    """Calendar.add(MONTH, n) semantics: day-of-month clamps to the
    target month's length (DateMathParser relies on Calendar)."""
    m = dt.month - 1 + n
    year = dt.year + m // 12
    month = m % 12 + 1
    day = min(dt.day, calendar.monthrange(year, month)[1])
    return dt.replace(year=year, month=month, day=day)


def _round_down(dt: datetime, unit: str) -> datetime:
    if unit == "YEAR":
        return dt.replace(month=1, day=1, hour=0, minute=0, second=0,
                          microsecond=0)
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
        return dt.replace(microsecond=dt.microsecond // 1000 * 1000)
    raise ValueError(f"unknown unit {unit!r}")


def _apply(dt: datetime, op: str, n: int, unit: str) -> datetime:
    if op == "/":
        return _round_down(dt, unit)
    sign = 1 if op == "+" else -1
    if unit == "YEAR":
        return add_months(dt, sign * n * 12)
    if unit == "MONTH":
        return add_months(dt, sign * n)
    if unit == "MILLI":
        return dt + timedelta(milliseconds=sign * n)
    return dt + timedelta(seconds=sign * n * _SECONDS[unit])


def parse_date_math(expr: str, now: datetime | None = None) -> datetime:
    """Evaluate a date-math expression to a datetime (naive UTC)."""
    expr = expr.strip()
    if expr.startswith("NOW"):
        if now is None:
            raise ValueError(
                "expression uses NOW but no reference instant was given"
            )
        dt, rest = now, expr[3:]
    else:
        m = _ISO_RE.match(expr)
        if not m:
            raise ValueError(f"malformed date math base in {expr!r}")
        y, mo, d, h, mi, s, frac = m.groups()
        micro = int((frac or "0").ljust(6, "0"))
        dt = datetime(int(y), int(mo), int(d), int(h or 0), int(mi or 0),
                      int(s or 0), micro)
        rest = expr[m.end():]
    pos = 0
    while pos < len(rest):
        m = _OP_RE.match(rest, pos)
        if not m:
            raise ValueError(f"malformed date math op at {rest[pos:]!r}")
        op, num, unit_raw = m.groups()
        unit = _UNIT_ALIASES.get(unit_raw)
        if unit is None:
            raise ValueError(f"unknown date math unit {unit_raw!r}")
        if op == "/" and num:
            raise ValueError("rounding takes no count")
        if op != "/" and not num:
            raise ValueError(f"missing count in {m.group()!r}")
        dt = _apply(dt, op, int(num or 0), unit)
        pos = m.end()
    return dt


def parse_gap(gap: str) -> tuple[int, float]:
    """A facet.range gap ``+N UNIT`` -> (months, seconds); exactly one
    of the two is non-zero (RangeFacetRequest applies the gap through
    DateMathParser repeatedly; fixed-duration units collapse to
    seconds, calendar units to months)."""
    m = re.fullmatch(r"\+?(\d+)([A-Z]+)", gap.strip())
    if not m:
        raise ValueError(f"malformed gap {gap!r}")
    n, unit_raw = int(m.group(1)), m.group(2)
    unit = _UNIT_ALIASES.get(unit_raw)
    if unit is None:
        raise ValueError(f"unknown gap unit {unit_raw!r}")
    if n == 0:
        raise ValueError("zero gap")
    if unit == "YEAR":
        return n * 12, 0.0
    if unit == "MONTH":
        return n, 0.0
    if unit == "MILLI":
        return 0, n / 1000.0
    return 0, float(n * _SECONDS[unit])
