"""Date normalization with PHP DateTime semantics.

Replicates AbstractParser::normalizeDate (/root/reference/src/Parsers/
AbstractParser.php:147-177) and TextBlockParsing::normalizeDateString
(/root/reference/src/Parsers/Traits/TextBlockParsing.php:125-150).

PHP quirks preserved:
- DateTime::createFromFormat accepts 1-2 digit m/d where the format says m/d,
  and *wraps* out-of-range values (Y/m/d '2025/13/45' → 2026-02-14).
- the ``new DateTime($s)`` fallback parses strtotime-style: textual months,
  slash dates are American (m/d/y), dash dates with 4-digit year first are ISO,
  'd-m-Y' dash dates are European.
- normalizeDateString's A-B-YYYY branch: first>12 ⇒ DD-MM-YYYY, else MM-DD-YYYY.
"""

from __future__ import annotations

import datetime as _dt
import re


def _wrap_ymd(year: int, month: int, day: int) -> str | None:
    """Build a date PHP-style: out-of-range month/day wrap forward/backward
    (mktime normalization)."""
    try:
        # normalize month into [1,12], carrying into year
        y = year + (month - 1) // 12
        m = (month - 1) % 12 + 1
        base = _dt.date(y, m, 1)
        d = base + _dt.timedelta(days=day - 1)
        return d.strftime("%Y-%m-%d")
    except (ValueError, OverflowError):
        return None


def _from_format(fmt_sep: str, order: str, s: str) -> str | None:
    """createFromFormat for the five formats the reference uses.

    order: 'ymd' | 'dmy' | 'mdy'; fmt_sep: '/' or '-'.
    Lenient about leading zeros; returns None on structural mismatch.
    """
    parts = s.strip().split(fmt_sep)
    if len(parts) != 3:
        return None
    if not all(p.isdigit() and p != "" for p in parts):
        return None
    if order == "ymd":
        if len(parts[0]) != 4:
            # PHP 'Y' greedily takes up to 4 digits but requires the year
            # field; two-digit years parse as that number (year 25 == 0025).
            if not (1 <= len(parts[0]) <= 4):
                return None
        y, m, d = int(parts[0]), int(parts[1]), int(parts[2])
    elif order == "dmy":
        if not (1 <= len(parts[2]) <= 4):
            return None
        d, m, y = int(parts[0]), int(parts[1]), int(parts[2])
    else:  # mdy
        m, d, y = int(parts[0]), int(parts[1]), int(parts[2])
    if len(parts[0 if order == "ymd" else 2]) > 4:
        return None
    if not (1 <= len(parts[1]) <= 2):
        return None
    return _wrap_ymd(y, m, d)


_MONTHS = {
    "jan": 1, "january": 1, "feb": 2, "february": 2, "mar": 3, "march": 3,
    "apr": 4, "april": 4, "may": 5, "jun": 6, "june": 6, "jul": 7, "july": 7,
    "aug": 8, "august": 8, "sep": 9, "sept": 9, "september": 9, "oct": 10,
    "october": 10, "nov": 11, "november": 11, "dec": 12, "december": 12,
}

_ISO_RE = re.compile(r"^(\d{4})-(\d{1,2})-(\d{1,2})$")
_SLASH_RE = re.compile(r"^(\d{1,2})/(\d{1,2})/(\d{4})$")
_DASH_EU_RE = re.compile(r"^(\d{1,2})-(\d{1,2})-(\d{4})$")
_YMD_SLASH_RE = re.compile(r"^(\d{4})/(\d{1,2})/(\d{1,2})$")
_TEXTUAL_RE = re.compile(
    r"^(?:(\d{1,2})\s+([A-Za-z]{3,9})\.?,?\s+(\d{4})|([A-Za-z]{3,9})\.?\s+(\d{1,2}),?\s+(\d{4}))$"
)


def php_strtotime_date(s: str) -> str | None:
    """A faithful-enough subset of ``new DateTime($s)`` for date-like strings.

    PHP rules: '/' dates are American m/d/Y; 'd-m-Y' dash dates are European;
    textual month forms ('14 Jan 2025', 'Jan 14, 2025') parse. Anything else
    (CJK dates etc.) throws in PHP → None here.
    """
    s = s.strip()
    m = _ISO_RE.match(s)
    if m:
        return _wrap_ymd(int(m.group(1)), int(m.group(2)), int(m.group(3)))
    m = _YMD_SLASH_RE.match(s)
    if m:
        return _wrap_ymd(int(m.group(1)), int(m.group(2)), int(m.group(3)))
    m = _SLASH_RE.match(s)
    if m:  # American
        return _wrap_ymd(int(m.group(3)), int(m.group(1)), int(m.group(2)))
    m = _DASH_EU_RE.match(s)
    if m:  # European
        return _wrap_ymd(int(m.group(3)), int(m.group(2)), int(m.group(1)))
    m = _TEXTUAL_RE.match(s)
    if m:
        if m.group(1) is not None:
            d, mon, y = int(m.group(1)), m.group(2).lower(), int(m.group(3))
        else:
            mon, d, y = m.group(4).lower(), int(m.group(5)), int(m.group(6))
        if mon in _MONTHS:
            return _wrap_ymd(y, _MONTHS[mon], d)
    return None


_STRICT_ISO_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")


def normalize_date(date) -> str | None:
    """AbstractParser::normalizeDate (AbstractParser.php:147-177)."""
    # PHP empty(): null, '', '0', 0, 0.0, false are all empty
    if date is None or date is False or date == "" or date == "0" or (
        isinstance(date, (int, float)) and date == 0
    ):
        return None
    s = str(date)
    if _STRICT_ISO_RE.match(s):
        return s
    # formats tried in order: Y/m/d, d-m-Y, d/m/Y, m-d-Y, m/d/Y
    for sep, order in (("/", "ymd"), ("-", "dmy"), ("/", "dmy"), ("-", "mdy"), ("/", "mdy")):
        r = _from_format(sep, order, s)
        if r is not None:
            return r
    return php_strtotime_date(s)


def normalize_date_string(date_str: str) -> str | None:
    """TextBlockParsing::normalizeDateString (TextBlockParsing.php:125-150)."""
    date_str = date_str.replace("/", "-")
    parts = date_str.split("-")
    if len(parts) != 3:
        return None

    def _i(p: str) -> int:
        m = re.match(r"^[ \t\n\r\v\f]*[+-]?\d+", p)
        return int(m.group(0)) if m else 0

    if len(parts[0]) == 4:
        return "%04d-%02d-%02d" % (_i(parts[0]), _i(parts[1]), _i(parts[2]))
    if len(parts[2]) == 4:
        day, month, year = _i(parts[0]), _i(parts[1]), _i(parts[2])
        if day > 12:
            # DD-MM-YYYY
            return "%04d-%02d-%02d" % (year, month, day)
        # assume MM-DD-YYYY (American): parts are (month, day) despite the
        # variable names in the reference — output matches its behavior
        return "%04d-%02d-%02d" % (year, day, month)
    return None
