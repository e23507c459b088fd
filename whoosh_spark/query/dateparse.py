"""Date parsing for DATETIME query syntax — the practical subset of the
reference's English date grammar (/root/reference/src/whoosh/qparser/
dateparse.py:1-922): a date expression denotes a TIMESPAN (e.g. "2010" is
the whole year), and a fielded date term becomes a range over that span.

Supported forms (differential-tested against the reference DateParserPlugin
in tests/test_dateparse.py):

  2010                         whole year
  201005 / 2010-05 / may 2010  whole month
  20100523 / 2010-05-23 / 23 may 2010   whole day
  2010052310[30[15]] / 2010-05-23 10:30[:15]  hour / minute / second
  today / yesterday / tomorrow / now
  next tuesday / last fri      dayname relative to basedate (same weekday
                               jumps a full week, reference
                               util/times.py relative_days)
  -3 weeks / +1 year 2 months  plusminus offsets from basedate (reference
                               dateparse.py PlusMinus:497-526; month
                               arithmetic clamps to month end first, then
                               the sub-month parts apply)
  [<span> TO <span>]           range: floor(start) .. ceil(end)

Time-only forms (midnight/noon/3pm) are not implemented.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta

MONTHS = {
    name: i + 1
    for i, names in enumerate(
        [
            ("january", "jan"), ("february", "feb"), ("march", "mar"),
            ("april", "apr"), ("may",), ("june", "jun"), ("july", "jul"),
            ("august", "aug"), ("september", "sep", "sept"),
            ("october", "oct"), ("november", "nov"), ("december", "dec"),
        ]
    )
    for name in names
}

_DIGITS_RE = re.compile(r"^(\d{4})(\d{2})?(\d{2})?(\d{2})?(\d{2})?(\d{2})?$")
_DASHED_RE = re.compile(
    r"^(\d{4})-(\d{1,2})(?:-(\d{1,2})(?:[ t](\d{1,2})(?::(\d{1,2})(?::(\d{1,2}))?)?)?)?$"
)
_NAMED_RE = re.compile(r"^(?:(\d{1,2})\s+)?([a-z]+)(?:\s+(\d{4}))?$")


class DateParseError(ValueError):
    pass


# unit synonym sets from the reference English grammar (dateparse.py:649-655)
_UNITS = [
    ("years", r"years|year|yrs|yr|ys|y"),
    ("months", r"months|month|mons|mon|mos|mo"),
    ("weeks", r"weeks|week|wks|wk|ws|w"),
    ("days", r"days|day|dys|dy|ds|d"),
    ("hours", r"hours|hour|hrs|hr|hs|h"),
    ("minutes", r"minutes|minute|mins|min|ms|m"),
    ("seconds", r"seconds|second|secs|sec|s"),
]
_PLUSMINUS_RE = re.compile(
    "^(?P<dir>[+-]) *"
    + " *".join(f"(?:(?P<{name}>[0-9]+) *(?:{pat}))?" for name, pat in _UNITS)
    + "$",
    re.IGNORECASE,
)
_DAYNAME_PATTERNS = [
    "monday|mon|mo", "tuesday|tues|tue|tu", "wednesday|wed|we",
    "thursday|thur|thu|th", "friday|fri|fr", "saturday|sat|sa",
    "sunday|sun|su",
]
_DAYNAME_RE = re.compile(
    r"^(?P<dir>next|last) +(?P<day>" + "|".join(_DAYNAME_PATTERNS) + r")$",
    re.IGNORECASE,
)


def _relative_days(current_wday: int, wday: int, direction: int) -> int:
    """reference util/times.py:39-60: same weekday jumps a full week."""
    if current_wday == wday:
        return 7 * direction
    if direction == 1:
        return (wday + 7 - current_wday) % 7
    return (current_wday + 7 - wday) % 7 * -1


def _add_relative(dt: datetime, years: int, months: int, weeks: int, days: int,
                  hours: int, minutes: int, seconds: int) -> datetime:
    """relativedelta semantics (the reference vendors dateutil's): year and
    month arithmetic first, clamping the day to the target month's end, then
    the exact sub-month offsets."""
    from calendar import monthrange

    y = dt.year + years
    m = dt.month + months
    y += (m - 1) // 12
    m = (m - 1) % 12 + 1
    d = min(dt.day, monthrange(y, m)[1])
    return dt.replace(year=y, month=m, day=d) + timedelta(
        weeks=weeks, days=days, hours=hours, minutes=minutes, seconds=seconds
    )


def _month_end(year: int, month: int) -> datetime:
    if month == 12:
        return datetime(year + 1, 1, 1) - timedelta(microseconds=1)
    return datetime(year, month + 1, 1) - timedelta(microseconds=1)


def _span_from_parts(year, month=None, day=None, hour=None, minute=None, second=None):
    """(floor, ceil) covering the most specific given part."""
    if month is None:
        return datetime(year, 1, 1), datetime(year, 12, 31, 23, 59, 59, 999999)
    if day is None:
        return datetime(year, month, 1), _month_end(year, month)
    if hour is None:
        s = datetime(year, month, day)
        return s, s + timedelta(days=1) - timedelta(microseconds=1)
    if minute is None:
        s = datetime(year, month, day, hour)
        return s, s + timedelta(hours=1) - timedelta(microseconds=1)
    if second is None:
        s = datetime(year, month, day, hour, minute)
        return s, s + timedelta(minutes=1) - timedelta(microseconds=1)
    s = datetime(year, month, day, hour, minute, second)
    return s, s + timedelta(seconds=1) - timedelta(microseconds=1)


def parse_timespan(text: str, basedate: datetime | None = None) -> tuple[datetime, datetime]:
    """Parse a date expression to its (floor, ceil) timespan."""
    basedate = basedate or datetime.now()
    t = text.strip().lower().replace("'", "")
    if not t:
        raise DateParseError("empty date")

    if t == "now":
        return basedate, basedate
    if t in ("today", "yesterday", "tomorrow"):
        delta = {"today": 0, "yesterday": -1, "tomorrow": 1}[t]
        d = basedate + timedelta(days=delta)
        s = datetime(d.year, d.month, d.day)
        return s, s + timedelta(days=1) - timedelta(microseconds=1)

    m = _DAYNAME_RE.match(t)
    if m:
        direction = -1 if m.group("dir").lower() == "last" else 1
        day_text = m.group("day")
        daynum = next(
            i for i, pat in enumerate(_DAYNAME_PATTERNS)
            if re.fullmatch(pat, day_text, re.IGNORECASE)
        )
        d = basedate + timedelta(
            days=_relative_days(basedate.weekday(), daynum, direction)
        )
        s = datetime(d.year, d.month, d.day)
        return s, s + timedelta(days=1) - timedelta(microseconds=1)

    m = _PLUSMINUS_RE.match(t)
    if m and any(m.group(name) for name, _ in _UNITS):
        direction = -1 if m.group("dir") == "-" else 1
        vals = {name: int(m.group(name) or 0) * direction for name, _ in _UNITS}
        dt = _add_relative(basedate, **vals)
        return dt, dt

    m = _DIGITS_RE.match(t)
    if m:
        parts = [int(g) for g in m.groups() if g is not None]
        return _span_from_parts(*parts)

    m = _DASHED_RE.match(t)
    if m:
        parts = [int(g) for g in m.groups() if g is not None]
        return _span_from_parts(*parts)

    m = _NAMED_RE.match(t)
    if m and m.group(2) in MONTHS:
        day = int(m.group(1)) if m.group(1) else None
        month = MONTHS[m.group(2)]
        year = int(m.group(3)) if m.group(3) else basedate.year
        if day is None:
            return _span_from_parts(year, month)
        return _span_from_parts(year, month, day)

    raise DateParseError(f"cannot parse date expression {text!r}")


def date_term_range(text: str, basedate: datetime | None = None) -> tuple[datetime, datetime]:
    """A single date term matches its whole timespan (floor..ceil), like the
    reference's fielded date conversion."""
    return parse_timespan(text, basedate)


def date_range_bounds(start_text: str | None, end_text: str | None,
                      basedate: datetime | None = None) -> tuple[datetime | None, datetime | None]:
    """Range endpoints: start uses its span's floor, end uses its ceil."""
    s = parse_timespan(start_text, basedate)[0] if start_text else None
    e = parse_timespan(end_text, basedate)[1] if end_text else None
    return s, e
