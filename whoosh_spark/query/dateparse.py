"""Full-fidelity English date-expression parsing for DATETIME query syntax.

Re-expresses the reference's combinator date grammar
(/root/reference/src/whoosh/qparser/dateparse.py:1-922) and its partial-date
calculus (/root/reference/src/whoosh/util/times.py:94-467) as closure-style
parser functions over a mutable ``PartialDate``.  A date expression denotes
either an exact ``datetime`` or a timespan ``(floor, ceil)``; fielded date
terms become ranges over that span (reference DateParserPlugin.text_to_dt,
dateparse.py:778-791) and bracket ranges disambiguate both endpoints
together (range_to_dt, dateparse.py:793-820).

Grammar (reference English.setup, dateparse.py:644-722):

  * ``simple``: progressive ``yyyy[ mm[ dd[ HH[ MM[ SS[ ffffff]]]]]]`` with
    ``[- .:/]*`` separators (so ``20100523``, ``2010-05-23 10:30``).  Each
    numeric part is fixed-width; a trailing separator is consumed even when
    the next part fails (reference Sequence.parse consumes the separator
    before trying the element, dateparse.py:143-165).
  * named dates: 8 day/month/year orders (``23 may 2010``, ``may 23``,
    ``2010 may``...), month or year alone, ``next/last <dayname>``,
    ``today/tomorrow/yesterday/this year/this month/now``.
  * times: 24h ``HH:MM[:SS[.fffff]]``, 12h ``H[:MM[:SS]]am/pm``,
    ``noon``/``midnight``/``now``; a time and a date may appear in either
    order (reference Bag, dateparse.py:284-363).
  * ``+/-N unit...`` offsets with relativedelta clamp-then-offset semantics
    (PlusMinus, dateparse.py:497-525).
  * ``<date> to <date>`` ranges (Combo, dateparse.py:188-261).

Quirks kept deliberately (differential-fuzzed in tests/test_dateparse.py):
same-weekday "next friday" jumps a full week (times.py:39-60); a non-
lowercase "Last" direction word counts as *next* (Daynames.props_to_date
matches the raw text against the pattern "last" case-sensitively,
dateparse.py:539-541); a bare ``+``/``-`` parses as the basedate; sub-second
digits are literal microseconds (``.5`` = 5us); and out-of-range component
combinations fail the *sequence* that produced them, letting a shorter
alternative match instead ("31 feb 2010" parses as month=2/day=31 of the
base year).
"""

from __future__ import annotations

import calendar
import re
from datetime import datetime, timedelta

__all__ = [
    "DateParseError",
    "TimeError",
    "PartialDate",
    "Span",
    "parse_date",
    "parse_timespan",
    "date_term_range",
    "date_range_bounds",
]

_UNITS = ("year", "month", "day", "hour", "minute", "second", "microsecond")


class TimeError(ValueError):
    """An impossible component combination (reference times.py:35)."""


class DateParseError(ValueError):
    """The text is not a recognizable date expression."""


class PartialDate:
    """A date with any subset of its units unspecified (None) — counterpart
    of the reference's ``adatetime`` (times.py:94-259).  Construction
    validates ranges exactly like the reference ctor (times.py:111-128);
    later in-place mutation (used by span disambiguation) does not."""

    __slots__ = _UNITS

    def __init__(self, year=None, month=None, day=None, hour=None,
                 minute=None, second=None, microsecond=None):
        if month is not None and not 1 <= month <= 12:
            raise TimeError("month must be in 1..12")
        if day is not None and day < 1:
            raise TimeError("day must be greater than 1")
        if (year is not None and month is not None and day is not None
                and day > calendar.monthrange(year, month)[1]):
            raise TimeError("day is out of range for month")
        if hour is not None and not 0 <= hour <= 23:
            raise TimeError("hour must be in 0..23")
        if minute is not None and not 0 <= minute <= 59:
            raise TimeError("minute must be in 0..59")
        if second is not None and not 0 <= second <= 59:
            raise TimeError("second must be in 0..59")
        if microsecond is not None and not 0 <= microsecond <= 999999:
            raise TimeError("microsecond must be in 0..999999")
        self.year, self.month, self.day = year, month, day
        self.hour, self.minute, self.second = hour, minute, second
        self.microsecond = microsecond

    def copy(self) -> "PartialDate":
        out = PartialDate.__new__(PartialDate)
        for u in _UNITS:
            setattr(out, u, getattr(self, u))
        return out

    def __repr__(self):  # pragma: no cover - debugging aid
        return "PartialDate(%s)" % ", ".join(
            "%s=%r" % (u, getattr(self, u)) for u in _UNITS
            if getattr(self, u) is not None
        )


class Span:
    """A (possibly still ambiguous) pair of endpoints — counterpart of the
    reference ``timespan`` (times.py:264-290)."""

    __slots__ = ("start", "end")

    def __init__(self, start, end):
        if not isinstance(start, (datetime, PartialDate)):
            raise TimeError("%r is not a date object" % (start,))
        if not isinstance(end, (datetime, PartialDate)):
            raise TimeError("%r is not a date object" % (end,))
        self.start = start.copy() if isinstance(start, PartialDate) else start
        self.end = end.copy() if isinstance(end, PartialDate) else end

    def __repr__(self):  # pragma: no cover - debugging aid
        return "Span(%r, %r)" % (self.start, self.end)


def _is_void(at) -> bool:
    return isinstance(at, PartialDate) and all(
        getattr(at, u) is None for u in _UNITS)


def _is_ambiguous(at) -> bool:
    return isinstance(at, PartialDate) and any(
        getattr(at, u) is None for u in _UNITS)


def _has_no_date(at) -> bool:
    return (isinstance(at, PartialDate) and at.year is None
            and at.month is None and at.day is None)


def _fix(at):
    """A fully-specified PartialDate becomes a datetime (times.py:456-467)."""
    if isinstance(at, datetime) or _is_ambiguous(at):
        return at
    return datetime(at.year, at.month, at.day, at.hour, at.minute,
                    at.second, at.microsecond)


def _floor(at) -> datetime:
    if isinstance(at, datetime):
        return at
    if at.year is None:
        raise ValueError("date has no year")
    return datetime(at.year, at.month or 1, at.day or 1, at.hour or 0,
                    at.minute or 0, at.second or 0, at.microsecond or 0)


def _ceil(at) -> datetime:
    if isinstance(at, datetime):
        return at
    y = at.year
    if y is None:
        raise ValueError("date has no year")
    m = 12 if at.month is None else at.month
    d = calendar.monthrange(y, m)[1] if at.day is None else at.day
    return datetime(y, m, d,
                    23 if at.hour is None else at.hour,
                    59 if at.minute is None else at.minute,
                    59 if at.second is None else at.second,
                    999999 if at.microsecond is None else at.microsecond)


def _merge(acc, new):
    """Fill ``acc``'s unspecified units from ``new`` — reference ``fill_in``
    (times.py:398-412).  A datetime accumulator is returned unchanged; the
    merged result is re-validated through the PartialDate ctor, so an
    impossible combination raises TimeError here (load-bearing: sequences
    treat that as a parse failure)."""
    if isinstance(acc, datetime):
        return acc
    vals = {}
    for u in _UNITS:
        v = getattr(acc, u)
        if v is None:
            v = getattr(new, u)
        vals[u] = v
    return _fix(PartialDate(**vals))


def relative_days(current_wday: int, wday: int, direction: int) -> int:
    """Days to the next/last given weekday; same weekday jumps a full week
    (reference times.py:39-60)."""
    if current_wday == wday:
        return 7 * direction
    if direction == 1:
        return (wday + 7 - current_wday) % 7
    return (current_wday + 7 - wday) % 7 * -1


def _add_relative(dt: datetime, years=0, months=0, weeks=0, days=0,
                  hours=0, minutes=0, seconds=0) -> datetime:
    """dateutil-relativedelta semantics (the reference vendors it,
    support/relativedelta.py): apply year/month arithmetic first, clamping
    the day-of-month to the target month's end, then exact offsets."""
    y = dt.year + years
    m = dt.month + months
    y += (m - 1) // 12
    m = (m - 1) % 12 + 1
    d = min(dt.day, calendar.monthrange(y, m)[1])
    return dt.replace(year=y, month=m, day=d) + timedelta(
        weeks=weeks, days=days, hours=hours, minutes=minutes, seconds=seconds)


def _span_disambiguated(start, end, basedate: datetime):
    """Resolve a possibly-ambiguous endpoint pair into concrete
    (floor, ceil) datetimes — reference timespan.disambiguated
    (times.py:292-381), including its year-borrowing heuristics, the
    month/day copy between sides, the out-of-order year fixups, and the
    same-day end-time rollover."""
    start = start.copy() if isinstance(start, PartialDate) else start
    end = end.copy() if isinstance(end, PartialDate) else end
    start_year_amb = isinstance(start, PartialDate) and start.year is None
    end_year_amb = isinstance(end, PartialDate) and end.year is None

    if _has_no_date(start) and _has_no_date(end):
        # Pure times on both sides: date info comes from the basedate.
        start.year, start.month, start.day = (basedate.year, basedate.month,
                                              basedate.day)
        end.year, end.month, end.day = (basedate.year, basedate.month,
                                        basedate.day)
    else:
        if start_year_amb and end_year_amb:
            start.year = end.year = basedate.year
        elif start_year_amb:
            start.year = end.year
        elif end_year_amb:
            end.year = max(start.year, basedate.year)

    if start.year == end.year:
        # One side has month/day, the other doesn't: copy end->start unless
        # that would put the end time-of-day before the start's on the same
        # day; a start-only month/day leaves the end at the basedate.
        start_dm = not (start.month is None and start.day is None) \
            if isinstance(start, PartialDate) else True
        end_dm = not (end.month is None and end.day is None) \
            if isinstance(end, PartialDate) else True
        if end_dm and not start_dm:
            if isinstance(end, datetime):
                # The reference crashes here (times.py:349 calls end.ceil()
                # on a plain datetime); surface it as a parse error.
                raise DateParseError(
                    "time-only range start with exact-datetime end")
            if _floor(start).time() > _ceil(end).time():
                start.month, start.day = basedate.month, basedate.day
            else:
                start.month, start.day = end.month, end.day
        elif start_dm and not end_dm:
            end.month, end.day = basedate.month, basedate.day

    if _floor(start).date() > _ceil(end).date():
        if start_year_amb:
            start.year = end.year - 1
        elif end_year_amb:
            end.year = start.year + 1
        else:
            start, end = end, start

    lo = _floor(start)
    hi = _ceil(end)
    if lo.date() == hi.date() and lo.time() > hi.time():
        hi += timedelta(days=1)
    return lo, hi


def _disambiguated(value, basedate: datetime):
    """datetime -> itself; PartialDate -> datetime or (lo, hi); Span ->
    (lo, hi).  Reference adatetime.disambiguated (times.py:241-259) +
    timespan.disambiguated."""
    if isinstance(value, datetime):
        return value
    if isinstance(value, PartialDate):
        if not _is_ambiguous(value):
            return _fix(value)
        return _span_disambiguated(value, value, basedate)
    return _span_disambiguated(value.start, value.end, basedate)


# --------------------------------------------------------------------------
# Parser combinators.  Each parser is a closure ``(text, pos, base) ->
# (value, newpos)`` returning ``(None, None)`` on no-match; ``value`` is a
# PartialDate, datetime, or Span.  Control flow mirrors the reference
# element classes cited on each factory.

_SEP = r"(\s+|\s*,\s*)"


def _intify(groups: dict) -> dict:
    out = {}
    for key, val in groups.items():
        try:
            out[key] = int(val)
        except (TypeError, ValueError):
            out[key] = val
    return out


def _rx(pattern: str, to_date):
    """Reference Regex element (dateparse.py:411-475): match the pattern at
    ``pos``, int-ify named groups, build a date via ``to_date(props, base)``;
    a TimeError there is a no-match."""
    expr = re.compile(pattern, re.IGNORECASE)

    def parse(text, pos, base):
        m = expr.match(text, pos)
        if not m:
            return None, None
        try:
            d = to_date(_intify(m.groupdict()), base)
        except TimeError:
            return None, None
        if d is None:
            return None, None
        return d, m.end()

    return parse


def _seq(elements, sep=_SEP, progressive=False):
    """Reference Sequence (dateparse.py:111-185): elements in order, merged
    with ``_merge``.  Note the separator is consumed *before* the element is
    tried, so a progressive sequence that stops keeps the trailing separator
    consumed ("2010-" parses as the year 2010 at position 5)."""
    sep_expr = re.compile(sep, re.IGNORECASE) if sep else None

    def parse(text, pos, base):
        d = PartialDate()
        first = True
        foundall = False
        failed = False
        for e in elements:
            if sep_expr is not None and not first:
                m = sep_expr.match(text, pos)
                if not m:
                    break
                pos = m.end()
            try:
                at, newpos = e(text, pos, base)
            except TimeError:
                failed = True
                break
            if at is None:
                break
            pos = newpos
            try:
                d = _merge(d, at)
            except TimeError:
                failed = True
                break
            first = False
        else:
            foundall = True
        if not failed and (foundall or (not first and progressive)):
            return d, pos
        return None, None

    return parse


def _choice(elements):
    """Reference Choice (dateparse.py:264-281): first match wins; a
    TimeError from an alternative is a no-match."""

    def parse(text, pos, base):
        for e in elements:
            try:
                d, newpos = e(text, pos, base)
            except TimeError:
                d, newpos = None, None
            if d is not None:
                return d, newpos
        return None, None

    return parse


def _bag(elements, sep=_SEP):
    """Reference Bag with onceper=True (dateparse.py:284-363): elements in
    any order, each at most once — and a *repeat* match fails the whole bag
    rather than stopping before it."""
    sep_expr = re.compile(sep, re.IGNORECASE)

    def parse(text, pos, base):
        first = True
        d = PartialDate()
        seen = [False] * len(elements)
        while True:
            newpos = pos
            if not first:
                m = sep_expr.match(text, pos)
                if not m:
                    break
                newpos = m.end()
            for i, e in enumerate(elements):
                try:
                    at, xpos = e(text, newpos, base)
                except TimeError:
                    at, xpos = None, None
                if at is not None:
                    if seen[i]:
                        return None, None
                    d = _merge(d, at)
                    newpos = xpos
                    seen[i] = True
                    break
            else:
                break
            pos = newpos
            if all(seen):
                break
            first = False
        if not any(seen):
            return None, None
        return d, pos

    return parse


def _combo(elements, sep=_SEP, min_dates=2, max_dates=2):
    """Reference Combo (dateparse.py:188-261): a sequence whose non-void
    results become a Span.  A Span-valued sub-result makes the Span ctor
    raise TimeError, which escapes to the enclosing Choice — same as the
    reference's uncaught dates_to_timespan path."""
    sep_expr = re.compile(sep, re.IGNORECASE)

    def parse(text, pos, base):
        dates = []
        first = True
        for e in elements:
            if not first:
                m = sep_expr.match(text, pos)
                if not m:
                    return None, None
                pos = m.end()
            try:
                at, pos2 = e(text, pos, base)
            except TimeError:
                at, pos2 = None, None
            if at is None:
                return None, None
            pos = pos2
            first = False
            if _is_void(at):
                continue
            if len(dates) == max_dates:
                return None, None
            dates.append(at)
        if len(dates) < min_dates:
            return None, None
        return Span(dates[0], dates[1]), pos

    return parse


# --------------------------------------------------------------------------
# The English grammar (reference English.setup, dateparse.py:644-722).

def _pd_unit(**fixed):
    def fn(p, base):
        return PartialDate(**fixed)

    return fn


def _month_element():
    pats = ["january|jan", "february|febuary|feb", "march|mar", "april|apr",
            "may", "june|jun", "july|jul", "august|aug", "september|sept|sep",
            "october|oct", "november|nov", "december|dec"]
    exprs = [re.compile(p, re.IGNORECASE) for p in pats]
    pattern = "(?P<month>" + "|".join("(%s)" % p for p in pats) + ")"

    def fn(p, base):
        for i, expr in enumerate(exprs):
            if expr.match(str(p["month"])):
                return PartialDate(month=i + 1)
        return None

    return _rx(pattern, fn)


def _plusminus_element():
    unit_pats = [("years", "years|year|yrs|yr|ys|y"),
                 ("months", "months|month|mons|mon|mos|mo"),
                 ("weeks", "weeks|week|wks|wk|ws|w"),
                 ("days", "days|day|dys|dy|ds|d"),
                 ("hours", "hours|hour|hrs|hr|hs|h"),
                 ("mins", "minutes|minute|mins|min|ms|m"),
                 ("secs", "seconds|second|secs|sec|s")]
    pattern = ("(?P<dir>[+-]) *"
               + " *".join("((?P<%s>[0-9]+) *(%s))?" % (name, pat)
                           for name, pat in unit_pats)
               + "(?=(\\W|$))")

    def fn(p, base):
        sign = -1 if p["dir"] == "-" else 1
        return _add_relative(
            base,
            years=(p.get("years") or 0) * sign,
            months=(p.get("months") or 0) * sign,
            weeks=(p.get("weeks") or 0) * sign,
            days=(p.get("days") or 0) * sign,
            hours=(p.get("hours") or 0) * sign,
            minutes=(p.get("mins") or 0) * sign,
            seconds=(p.get("secs") or 0) * sign)

    return _rx(pattern, fn)


def _daynames_element():
    daynames = ("monday|mon|mo", "tuesday|tues|tue|tu", "wednesday|wed|we",
                "thursday|thur|thu|th", "friday|fri|fr", "saturday|sat|sa",
                "sunday|sun|su")
    day_exprs = [re.compile(p, re.IGNORECASE) for p in daynames]
    pattern = ("(?P<dir>next|last) +(?P<day>%s)(?=(\\W|$))"
               % "|".join(daynames))

    def fn(p, base):
        # Reference quirk (dateparse.py:539-541): the matched direction TEXT
        # is used as a case-sensitive regex against the literal "last", so
        # "Last friday" counts as *next* friday.
        direction = -1 if re.match(str(p["dir"]), "last") else 1
        for daynum, expr in enumerate(day_exprs):
            if expr.match(str(p["day"])):
                break
        d = base.date() + timedelta(
            days=relative_days(base.weekday(), daynum, direction))
        return PartialDate(year=d.year, month=d.month, day=d.day)

    return _rx(pattern, fn)


def _time12_element():
    def fn(p, base):
        isam = str(p["ampm"]).lower().startswith("a")
        hour = p["hour"]
        if hour == 12:
            hour = 0 if isam else 12
        elif not isam:
            hour += 12
        return PartialDate(hour=hour, minute=p["mins"], second=p["secs"],
                           microsecond=p["usecs"])

    return _rx(r"(?P<hour>[1-9]|10|11|12)(:(?P<mins>[0-5][0-9])"
               r"(:(?P<secs>[0-5][0-9])(\.(?P<usecs>[0-9]{1,5}))?)?)?"
               r"\s*(?P<ampm>am|pm)(?=(\W|$))", fn)


def _offset_day(n: int):
    def fn(p, base):
        d = base.date() + timedelta(days=n)
        return PartialDate(year=d.year, month=d.month, day=d.day)

    return fn


def _build_grammar():
    day = _rx(r"(?P<day>([123][0-9])|[1-9])(st|nd|rd|th)?(?=(\W|$))",
              lambda p, b: PartialDate(day=p["day"]))
    year = _rx(r"(?P<year>[0-9]{4})(?=(\W|$))",
               lambda p, b: PartialDate(year=p["year"]))
    time24 = _rx(r"(?P<hour>([0-1][0-9])|(2[0-3])):(?P<mins>[0-5][0-9])"
                 r"(:(?P<secs>[0-5][0-9])(\.(?P<usecs>[0-9]{1,5}))?)?"
                 r"(?=(\W|$))",
                 lambda p, b: PartialDate(hour=p["hour"], minute=p["mins"],
                                          second=p["secs"],
                                          microsecond=p["usecs"]))
    time12 = _time12_element()
    month = _month_element()
    dayname = _daynames_element()
    plusdate = _plusminus_element()

    midnight = _rx("midnight", _pd_unit(hour=0, minute=0, second=0,
                                        microsecond=0))
    noon = _rx("noon", _pd_unit(hour=12, minute=0, second=0, microsecond=0))
    now = _rx("now", lambda p, b: b)
    tomorrow = _rx("tomorrow", _offset_day(1))
    yesterday = _rx("yesterday", _offset_day(-1))
    thisyear = _rx("this year", lambda p, b: PartialDate(year=b.year))
    thismonth = _rx("this month",
                    lambda p, b: PartialDate(year=b.year, month=b.month))
    today = _rx("today",
                lambda p, b: PartialDate(year=b.year, month=b.month,
                                         day=b.day))

    time = _choice((time12, time24, midnight, noon, now))

    # A bare day number requires a month somewhere in the expression: only
    # these combinations are valid dates (reference "dmy" Choice,
    # dateparse.py:702-715).
    dmy = _choice((
        _seq((day, month, year)),
        _seq((month, day, year)),
        _seq((year, month, day)),
        _seq((year, day, month)),
        _seq((day, month)),
        _seq((month, day)),
        _seq((month, year)),
        month, year, dayname, tomorrow, yesterday, thisyear, thismonth,
        today, now,
    ))

    # Compact numeric form: yyyy[mm[dd[HH[MM[SS[ffffff]]]]]] with optional
    # [- .:/] separators, anchored to a following space or end of text
    # (reference DateParser.__init__, dateparse.py:596-609).
    simple_seq = _seq((
        _rx(r"(?P<year>[0-9]{4})", lambda p, b: PartialDate(year=p["year"])),
        _rx(r"(?P<month>[0-1][0-9])",
            lambda p, b: PartialDate(month=p["month"])),
        _rx(r"(?P<day>[0-3][0-9])", lambda p, b: PartialDate(day=p["day"])),
        _rx(r"(?P<hour>([0-1][0-9])|(2[0-3]))",
            lambda p, b: PartialDate(hour=p["hour"])),
        _rx(r"(?P<minute>[0-5][0-9])",
            lambda p, b: PartialDate(minute=p["minute"])),
        _rx(r"(?P<second>[0-5][0-9])",
            lambda p, b: PartialDate(second=p["second"])),
        _rx(r"(?P<microsecond>[0-9]{6})",
            lambda p, b: PartialDate(microsecond=p["microsecond"])),
    ), sep=r"[- .:/]*", progressive=True)
    simple = _seq((simple_seq, _rx(r"(?=(\s|$))", lambda p, b: PartialDate())),
                  sep=None)

    datetime_bag = _bag((time, dmy))
    bundle = _choice((plusdate, datetime_bag, simple))
    torange = _combo((bundle, _rx("to", lambda p, b: PartialDate()), bundle))
    return _choice((torange, bundle))


_GRAMMAR = _build_grammar()


# --------------------------------------------------------------------------
# Simple fixed-width fallback — reference DATETIME._parse_datestring
# (fields.py:847-874).  When the English grammar fails on a fielded date
# term or range, the reference's ErrorNode falls back to the field's own
# parse_query/parse_range, which strip spaces/dashes/dots and slice
# YYYY[MM[DD[hh[mm[ss[uuuuuu]]]]]] (microseconds only at exactly 20 chars;
# any other trailing characters are silently ignored).

def simple_datestring(text: str):
    qs = text.replace(" ", "").replace("-", "").replace(".", "")
    year = month = day = hour = minute = second = microsecond = None
    if len(qs) >= 4:
        year = int(qs[:4])
    if len(qs) >= 6:
        month = int(qs[4:6])
    if len(qs) >= 8:
        day = int(qs[6:8])
    if len(qs) >= 10:
        hour = int(qs[8:10])
    if len(qs) >= 12:
        minute = int(qs[10:12])
    if len(qs) >= 14:
        second = int(qs[12:14])
    if len(qs) == 20:
        microsecond = int(qs[14:])
    at = _fix(PartialDate(year, month, day, hour, minute, second,
                          microsecond))
    if _is_void(at):
        raise TimeError(f"{qs!r} is not a parseable date")
    return at


# --------------------------------------------------------------------------
# Public API (consumed by query/parser.py).

def _raw_parse(text: str, basedate: datetime):
    """Parse from position 0 without requiring the whole text to match and
    WITHOUT disambiguating — the reference's range-endpoint path
    (ParserBase.date_from via range_to_dt, dateparse.py:84-89,793-804).
    Returns a datetime, PartialDate, Span, or None."""
    d, _pos = _GRAMMAR(text, 0, basedate)
    return d


def parse_date(text: str, basedate: datetime | None = None):
    """Parse a complete date expression (the whole text must match —
    reference date_from with toend=True, dateparse.py:630-641) and
    disambiguate.  Returns a ``datetime`` for an exact instant, a
    ``(floor, ceil)`` tuple for a span, or None if unparseable."""
    basedate = basedate or datetime.now()
    try:
        d, pos = _GRAMMAR(text, 0, basedate)
    except TimeError:
        return None
    if d is None or pos != len(text):
        return None
    return _disambiguated(d, basedate)


def parse_timespan(text: str, basedate: datetime | None = None):
    """Parse a date expression to its (floor, ceil) timespan; an exact
    instant yields (dt, dt).  Raises DateParseError on failure."""
    basedate = basedate or datetime.now()
    try:
        d = parse_date(text, basedate)
    except ValueError as exc:
        raise DateParseError(f"cannot parse date expression {text!r}: {exc}")
    if d is None:
        raise DateParseError(f"cannot parse date expression {text!r}")
    if isinstance(d, datetime):
        return d, d
    return d


def date_term_range(text: str, basedate: datetime | None = None):
    """A single fielded date term matches its whole timespan — reference
    DateParserPlugin.text_to_dt + DateTimeNode.query (dateparse.py:778-791,
    860-873: an exact datetime becomes an equality term, a timespan becomes
    DateRange(start, end), both inclusive).

    When the English grammar cannot consume the whole text, the reference's
    ErrorNode falls back to DATETIME.parse_query → _parse_datestring
    (syntax.py:397-403, fields.py:875-891); if even that fails the result is
    a match-nothing NullQuery — signalled here by returning None.  Crash
    quirks inside the grammar's disambiguation (DateParseError from the
    mirrored reference AttributeErrors) propagate without fallback, exactly
    like the reference."""
    basedate = basedate or datetime.now()
    d = parse_date(text, basedate)
    if d is not None:
        if isinstance(d, datetime):
            return d, d
        return d
    try:
        at = simple_datestring(text)
    except (TimeError, ValueError):
        return None
    if isinstance(at, datetime):
        return at, at
    return _floor(at), _ceil(at)


def date_range_bounds(start_text: str | None, end_text: str | None,
                      basedate: datetime | None = None):
    """Bracket-range endpoints, mirroring range_to_dt (dateparse.py:793-820):
    endpoints parse WITHOUT the to-end requirement (trailing junk after a
    valid prefix is ignored); when both are present they disambiguate
    *together* (year borrowing etc.); a lone start uses its span's floor and
    a lone end its ceil."""
    basedate = basedate or datetime.now()
    start = end = None
    if start_text:
        start = _raw_parse(start_text, basedate)
    if end_text:
        end = _raw_parse(end_text, basedate)
    if (start_text and start is None) or (end_text and end is None):
        # Reference fallback: an errorized RangeNode re-parses BOTH raw
        # endpoints through DATETIME.parse_range → _parse_datestring
        # (fields.py:893-907); failures there propagate as errors.
        try:
            lo = hi = None
            if start_text:
                at = simple_datestring(start_text)
                if isinstance(at, datetime):
                    # reference crash-quirk: parse_range calls .floor() on
                    # the result (fields.py:905), which a fully-specified
                    # 20-char datestring (a plain datetime) doesn't have
                    raise TimeError("fully-specified range endpoint")
                lo = _floor(at)
            if end_text:
                at = simple_datestring(end_text)
                if isinstance(at, datetime):
                    raise TimeError("fully-specified range endpoint")
                hi = _ceil(at)
        except (TimeError, ValueError) as exc:
            raise DateParseError(f"cannot parse date range: {exc}")
        return lo, hi
    try:
        if start is not None and end is not None:
            if isinstance(start, Span) or isinstance(end, Span):
                raise DateParseError(
                    "range endpoint is itself a range")
            return _span_disambiguated(start, end, basedate)
        if start is not None:
            if isinstance(start, datetime):
                # Reference crash-quirk: range_to_dt calls .disambiguated()
                # on the lone endpoint (dateparse.py:810), which a plain
                # datetime result ("now", "+1 year") doesn't have.
                raise DateParseError(
                    "exact-datetime expression as lone range start")
            d = _disambiguated(start, basedate)
            return (d if isinstance(d, datetime) else d[0]), None
        if end is not None:
            if isinstance(end, datetime):
                raise DateParseError(
                    "exact-datetime expression as lone range end")
            d = _disambiguated(end, basedate)
            return None, (d if isinstance(d, datetime) else d[1])
    except DateParseError:
        raise
    except ValueError as exc:
        raise DateParseError(f"cannot parse date range: {exc}")
    return None, None
