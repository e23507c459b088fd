"""Quasi-phonetic word encoders — capability parity with the reference's
standalone ``whoosh.lang.phonetic`` module (/root/reference/src/whoosh/lang/
phonetic.py:17-119): ``soundex_en`` / ``soundex_esp`` / ``soundex_ar``.

Reference quirks kept deliberately (diff-tested in tests/test_phonetic.py):
``soundex_en`` does NOT truncate to the classic 4 chars and does NOT drop
vowel '0' codes after the first letter (a run-dedupe only); ``soundex_ar``
emits a leading '0' and skips the word's first character entirely.

DoubleMetaphone (the encoder the reference's analysis chain actually uses)
lives in whoosh_spark/analysis/dmetaphone.py.
"""

from __future__ import annotations

import re

# soundex value per letter a..z (classic English table)
_EN_CODES = "01230120022455012623010202"


def soundex_en(word: str) -> str:
    """English soundex: first letter + run-deduped digit codes of the rest
    (no 4-char truncation, '0' vowel codes kept — reference parity)."""
    first = None
    out = []
    prev = None
    for ch in word.lower():
        o = ord(ch)
        if 97 <= o <= 122:
            if first is None:
                first = ch
            code = _EN_CODES[o - 97]
            if code != prev:
                out.append(code)
            prev = code
    if first is None:
        return ""
    return first + "".join(out)[1:]


_ESP_CODES = tuple(
    (re.compile(pat), repl)
    for pat, repl in (
        (r"\Aw?[uh]?([aeiou])", ""),
        (r"c[eiéí]|z|ll|sh|ch|sch|cc|y[aeiouáéíóú]|ps|bs|x|j|g[eiéí]", "s"),
        (r"[aeiouhwáéíóúü]+", ""),
        (r"y", ""),
        (r"ñ|gn", "n"),
        (r"[dpc]t", "t"),
        (r"c[aouáóú]|ck|q", "k"),
        (r"v", "b"),
        (r"d$", "t"),
    )
)


def soundex_esp(word: str) -> str:
    """Spanish quasi-phonetic coder: longest-prefix regex rewrite scan with
    run dedupe (rule order is significant and matches the reference)."""
    word = word.lower()
    out = []
    prev = None
    i = 0
    while i < len(word):
        code = None
        for rx, ecode in _ESP_CODES:
            m = rx.match(word, i)
            if m:
                i = m.end()
                code = ecode
                break
        if code is None:
            code = word[i]
            i += 1
        if code != prev:
            out.append(code)
        prev = code
    return "".join(out)


_AR_GROUPS = {
    "اأإآحخهعغشوي": "0",
    "فب": "1",
    "جزسصظقك": "2",
    "تثدذضط": "3",
    "ل": "4",
    "من": "5",
    "ر": "6",
}
_AR_CODES = {ch: code for chars, code in _AR_GROUPS.items() for ch in chars}


def soundex_ar(word: str) -> str:
    """Arabic soundex: strip a leading alef form, then run-deduped non-zero
    codes of word[1:], always prefixed with '0' (reference parity — the
    first character itself is never encoded)."""
    if word and word[0] in "اأإآ":
        word = word[1:]
    out = ["0"]
    prev = "0"
    if len(word) > 1:
        for ch in word[1:]:
            if ch in _AR_CODES:
                code = _AR_CODES[ch]
                if code != prev and code != "0":
                    out.append(code)
                prev = code
    return "".join(out)
