"""Sphinx charset-table support (reference support/charset.py:1266-1372,
whose accepted syntax is the documented Sphinx ``charset_table`` format:
http://sphinxsearch.com/docs/current.html#conf-charset-table).

``parse_charset_table`` produces the mapping the CharsetTokenizer consumes:
character ordinal -> replacement string; ordinals absent from the map are
token-break characters (the reference models this with a
``defaultdict(lambda: None)``).

Accepted item forms (whitespace is stripped; ``#`` starts a comment line;
items are comma-separated):

  ``a`` / ``U+0041``                stray char: allowed, maps to itself
  ``a->b``                          char map
  ``a..z``                          stray range: each maps to itself
  ``A..Z->a..z``                    range map (lengths must agree)
  ``A..Z/2``                        checkerboard: odd->next even, even->self
"""

from __future__ import annotations

import re

_CHAR = r"((?:U\+[0-9A-Fa-f]{4,6})|.)"
_RANGE_MAP = re.compile(f"^{_CHAR}\\.\\.{_CHAR}->{_CHAR}\\.\\.{_CHAR}$")
_CHAR_MAP = re.compile(f"^{_CHAR}->{_CHAR}$")
_STRAY_CHAR = re.compile(f"^{_CHAR}$")
_STRAY_RANGE = re.compile(f"^{_CHAR}\\.\\.{_CHAR}$")
_CHECKER_RANGE = re.compile(f"^{_CHAR}\\.\\.{_CHAR}/2$")
_WS = re.compile(r"\s")


def charspec_to_int(spec: str) -> int:
    """'A' or 'U+0041' -> ordinal."""
    if spec.startswith("U+"):
        return int(spec[2:], 16)
    if len(spec) == 1:
        return ord(spec)
    raise ValueError(f"bad charspec: {spec!r}")


def parse_charset_table(tablestring: str) -> dict[int, str]:
    """Sphinx charset table text -> {ordinal: replacement}. Ordinals not in
    the result are token-break characters. Match precedence mirrors the
    reference parser: range-map, char-map, stray char, stray range,
    checkerboard."""
    out: dict[int, str] = {}
    for line in tablestring.split("\n"):
        if not line or line.startswith("#"):
            continue
        line = _WS.sub("", line)
        for item in line.split(","):
            if not item:
                continue
            m = _RANGE_MAP.match(item)
            if m:
                s1, e1 = charspec_to_int(m.group(1)), charspec_to_int(m.group(2))
                s2, e2 = charspec_to_int(m.group(3)), charspec_to_int(m.group(4))
                if (e1 - s1) != (e2 - s2):
                    raise ValueError(f"range lengths differ: {item!r}")
                for f, t in zip(range(s1, e1 + 1), range(s2, e2 + 1)):
                    out[f] = chr(t)
                continue
            m = _CHAR_MAP.match(item)
            if m:
                out[charspec_to_int(m.group(1))] = chr(charspec_to_int(m.group(2)))
                continue
            m = _STRAY_CHAR.match(item)
            if m:
                o = charspec_to_int(m.group(0))
                out[o] = chr(o)
                continue
            m = _STRAY_RANGE.match(item)
            if m:
                s, e = charspec_to_int(m.group(1)), charspec_to_int(m.group(2))
                for o in range(s, e + 1):
                    out[o] = chr(o)
                continue
            m = _CHECKER_RANGE.match(item)
            if m:
                s, e = charspec_to_int(m.group(1)), charspec_to_int(m.group(2))
                for o in range(s, e + 1, 2):
                    out[o] = chr(o + 1)
                    out[o + 1] = chr(o + 1)
                continue
            raise ValueError(f"bad charset item: {item!r}")
    return out


def charmap_key(charmap: dict[int, str]) -> tuple:
    """Hashable, serializable form for the frozen Analyzer dataclass."""
    return tuple(sorted(charmap.items()))
