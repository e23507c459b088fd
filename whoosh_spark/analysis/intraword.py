"""IntraWordFilter + CharsetFilter(accent folding) token-pair kernels.

Behavior-identical to the reference filters (differential-tested in
tests/test_filters.py):

- intraword_pairs: reference analysis/intraword.py:223-494 IntraWordFilter —
  split subwords on delimiters / case transitions / letter-number
  transitions, strip possessive 's, optionally merge consecutive alpha or
  digit runs into an extra token at the run's last position, renumbering
  positions as it expands.
- fold_accents: reference CharsetFilter(accent_map) (filters.py:115-152 with
  support/charset.py) — strip diacritics to ASCII base letters. Implemented
  with NFKD decomposition plus the non-decomposable special cases the
  Sphinx-derived accent table covers.
"""

from __future__ import annotations

import unicodedata
from functools import lru_cache

DEFAULT_DELIMS = "-_'\"()!@#$%^&*[]{}<>\\|;:,./?`~=+"


def _split_ranges(s: str, delims: str, splitwords: bool, splitnums: bool):
    """(start, end) of each subword (reference _split, intraword.py:335-383)."""
    # runs between possessive 's (letter + 's at end-of-part)
    dispos = []
    if "'" in s:
        prev = 0
        i = 0
        n = len(s)
        while i < n - 1:
            if (s[i] == "'" and s[i + 1] in "sS" and i > 0 and s[i - 1].isalpha()
                    and (i + 2 == n or s[i + 2] in delims)):
                dispos.append((prev, i))
                i += 2
                prev = i
            else:
                i += 1
        if prev < n:
            dispos.append((prev, n))
    else:
        dispos = [(0, len(s))]

    for sc, ec in dispos:
        # runs between delimiter chars
        i = sc
        while i < ec:
            if s[i] in delims:
                i += 1
                continue
            j = i
            while j < ec and s[j] not in delims:
                j += 1
            # split the run [i, j) on transitions. The reference finds
            # boundaries with NON-OVERLAPPING regex matches of 2-char
            # transition patterns (intraword.py:316-325), so after a split
            # between (k-1, k) the next candidate pair starts at (k, k+1)'s
            # successor — replicate by skipping one pair after each split.
            if splitwords or splitnums:
                prev = i
                k = i + 1
                while k < j:
                    a, b = s[k - 1], s[k]
                    boundary = (
                        (splitwords and a.islower() and b.isupper())
                        or (splitnums and a.isalpha() and b.isdigit())
                        or (splitnums and a.isdigit() and b.isalpha())
                    )
                    if boundary:
                        yield (prev, k)
                        prev = k
                        k += 2  # the 2-char match is consumed
                    else:
                        k += 1
                if prev < j:
                    yield (prev, j)
            else:
                yield (i, j)
            i = j


def _merge_runs(parts: list, mergewords: bool, mergenums: bool) -> None:
    """In-place merge of consecutive same-type runs (reference _merge,
    intraword.py:385-437, replicated including the insert positions)."""
    last = 0
    insertat = 0
    buf: list = []
    pos = 0

    def insert_item(at, newpos):
        newtext = "".join(item[0] for item in buf)
        parts.insert(at, (newtext, newpos))

    for item in list(parts):
        text, pos = item
        if text.isalpha():
            this = 1
        elif text.isdigit():
            this = 2
        else:
            this = None
        if buf and ((this == last == 1 and mergewords) or (this == last == 2 and mergenums)):
            buf.append(item)
        else:
            if len(buf) > 1:
                insert_item(insertat, pos - 1)
                insertat += 1
            buf = [item]
            last = this
        insertat += 1
    if len(buf) > 1:
        insert_item(len(parts), pos)


def intraword_pairs(pairs: list[tuple[str, int]], delims: str = DEFAULT_DELIMS,
                    splitwords: bool = True, splitnums: bool = True,
                    mergewords: bool = False, mergenums: bool = False) -> list[tuple[str, int]]:
    """Apply IntraWordFilter to a (text, pos) stream, renumbering positions
    exactly like the reference __call__ (intraword.py:439-494)."""
    out: list[tuple[str, int]] = []
    newpos = None
    for text, pos in pairs:
        if newpos is None:
            newpos = pos
        if ((text.isalpha() and (text.islower() or text.isupper())) or text.isdigit()):
            out.append((text, newpos))
            newpos += 1
            continue
        ranges = list(_split_ranges(text, delims, splitwords, splitnums))
        parts = [(text[sc:ec], i + newpos) for i, (sc, ec) in enumerate(ranges)]
        if len(parts) > 1 and (mergewords or mergenums):
            _merge_runs(parts, mergewords, mergenums)
        out.extend(parts)
        if parts:
            newpos = parts[-1][1] + 1
    return out


# ------------------------------------------------------------ accent folding

# non-decomposable letters, mapped exactly as the reference accent_map does
# (probed values: lowercase base letters; ß->s, þ->t; æ/œ/ŋ/Ð pass through)
_FOLD_SPECIAL = {
    "ø": "o", "Ø": "o", "đ": "d", "Đ": "d", "ð": "d",
    "ħ": "h", "Ħ": "h", "ı": "i", "ł": "l", "Ł": "l",
    "ß": "s", "þ": "t", "Þ": "t", "ŧ": "t", "Ŧ": "t",
}


@lru_cache(maxsize=65536)
def fold_accents(text: str) -> str:
    if text.isascii():
        return text
    out = []
    for ch in text:
        if ch in _FOLD_SPECIAL:
            out.append(_FOLD_SPECIAL[ch])
            continue
        decomp = unicodedata.normalize("NFKD", ch)
        if any(unicodedata.combining(c) for c in decomp):
            base = "".join(c for c in decomp if not unicodedata.combining(c))
            # the reference table maps to lowercase base letters
            out.append(base.lower() if base else ch)
        else:
            out.append(ch)
    return "".join(out)
