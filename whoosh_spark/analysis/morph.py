"""Porter stemming (StemFilter / StemmingAnalyzer support).

Behavior-identical to the reference stemmer (/root/reference/src/whoosh/
lang/porter.py, used by analysis/morph.py:35-149 StemFilter), which is the
well-known JS-port variant of the published Porter algorithm
(tartarus.org/~martin/PorterStemmer). That variant carries three quirks we
replicate deliberately (differential-tested in tests/test_stemming.py):

- step 1b's "at/bl/iz -> +e" and "double consonant -> drop" rules use
  start-anchored regexes, so they only fire when the WHOLE stem is
  "at"/"bl"/"iz" or a 2-char doubled consonant — almost never, unlike
  true Porter;
- the measure patterns treat 'y' as neither vowel nor consonant inside
  [aeiou]+ / [^aeiouy]+ runs, so e.g. "syzygy" has measure 0;
- the final "-ll" rule tests m>1 on the whole word, not the reduced stem.

Only ASCII-lowercase inputs behave meaningfully (the analyzer chain
lowercases first), matching the reference.
"""

from __future__ import annotations

import re
from functools import lru_cache

# measure/condition tests (see module docstring for the y-handling quirk)
_M_GT_0 = re.compile(r"[^aeiouy]*[aeiou]+[^aeiouy]")
_M_EQ_1 = re.compile(r"[^aeiouy]*[aeiou]+[^aeiouy]+[aeiou]*\Z")
_M_GT_1 = re.compile(r"[^aeiouy]*[aeiou]+[^aeiouy]+[aeiou]+[^aeiouy]")
_HAS_VOWEL = re.compile(r"[aeiouy]")
_ENDS_CVC = re.compile(r"[^aeiouy]+[aeiouy][^aeiouwxy]\Z")

# suffix -> replacement, tried longest-suffix-first within each step
_STEP2 = [
    ("ational", "ate"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("ization", "ize"), ("tional", "tion"),
    ("biliti", "ble"), ("entli", "ent"), ("ousli", "ous"),
    ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
    ("iviti", "ive"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("alli", "al"), ("ator", "ate"),
    ("logi", "log"), ("bli", "ble"), ("eli", "e"),
]
_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ness", ""), ("ful", ""),
]
_STEP4 = [
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
    "al", "er", "ic", "ou",
]


def _m_gt_0(s: str) -> bool:
    return _M_GT_0.match(s) is not None


def _m_gt_1(s: str) -> bool:
    return _M_GT_1.match(s) is not None


@lru_cache(maxsize=65536)
def porter_stem(word: str) -> str:
    """Stem one (lowercased) word; identical output to the reference stem()."""
    if len(word) < 3:
        return word
    w = word
    y_first = w[0] == "y"
    if y_first:
        # leading y is forced consonant for every test below
        w = "Y" + w[1:]

    # step 1a: plurals
    if w.endswith("s"):
        if w.endswith("sses") or w.endswith("ies"):
            w = w[:-2]
        elif not w.endswith("ss"):
            w = w[:-1]

    # step 1b: -eed / -ed / -ing
    if w.endswith("eed"):
        if _m_gt_0(w[:-3]):
            w = w[:-1]
    else:
        if w.endswith("ed"):
            stem = w[:-2]
        elif w.endswith("ing"):
            stem = w[:-3]
        else:
            stem = None
        if stem is not None and _HAS_VOWEL.search(stem):
            w = stem
            # quirk: these two fixups are start-anchored in the reference
            if w in ("at", "bl", "iz"):
                w += "e"
            elif (len(w) == 2 and w[0] == w[1]
                  and w[0] not in "aeiouylsz"):
                w = w[:-1]
            elif _ENDS_CVC.fullmatch(w):
                w += "e"

    # step 1c: terminal y -> i when the stem has a vowel
    if w.endswith("y") and _HAS_VOWEL.search(w[:-1]):
        w = w[:-1] + "i"

    # step 2: double-suffix reductions when m(stem) > 0
    for suf, rep in _STEP2:
        if w.endswith(suf) and len(w) > len(suf):
            stem = w[: -len(suf)]
            if _m_gt_0(stem):
                w = stem + rep
            break

    # step 3
    for suf, rep in _STEP3:
        if w.endswith(suf) and len(w) > len(suf):
            stem = w[: -len(suf)]
            if _m_gt_0(stem):
                w = stem + rep
            break

    # step 4: drop residual suffix when m(stem) > 1; -ion needs s/t before it
    matched4 = False
    for suf in _STEP4:
        if w.endswith(suf) and len(w) > len(suf):
            matched4 = True
            stem = w[: -len(suf)]
            if _m_gt_1(stem):
                w = stem
            break
    if not matched4 and w.endswith("ion") and len(w) > 4 and w[-4] in "st":
        stem = w[:-3]
        if _m_gt_1(stem):
            w = stem

    # step 5a: terminal e
    if w.endswith("e") and len(w) > 1:
        stem = w[:-1]
        if _m_gt_1(stem) or (
            _M_EQ_1.match(stem) and not _ENDS_CVC.fullmatch(stem)
        ):
            w = stem

    # step 5b: -ll with m(word) > 1 (quirk: tested on the word, not the stem)
    if w.endswith("ll") and _m_gt_1(w):
        w = w[:-1]

    if y_first:
        w = "y" + w[1:]
    return w
