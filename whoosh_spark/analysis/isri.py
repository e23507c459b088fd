"""ISRI Arabic stemmer (Taghva/Elkhoury/Coombs 2005, NLTK-derived) —
parity with the reference's ``whoosh.lang.isri`` module
(/root/reference/src/whoosh/lang/isri.py). Affix lists, pattern groups and
the 60-stopword list are the published algorithm's data; the engine here
is a function-style re-expression of the reference's stateful class.

Reference quirks kept (diff-tested in tests/test_isri.py):
- ``pre32``/``suf32`` interleave the 3-char and 2-char affix scans: the
  2-char candidates are tried after the FIRST non-matching 3-char
  candidate, so the effective priority is p3[0] > all p2 > p3[1..]
  (isri.py:196-219).
- ``pro_w64``'s first branch tests ``(stm[0] and stm[4]) == 'ا'`` — the
  ``and`` of two non-empty strings is the SECOND one, so only position 4
  is actually checked (isri.py:355-357).
"""

from __future__ import annotations

import re

_P3 = ["كال", "بال", "ولل", "وال"]
_P2 = ["ال", "لل"]
_P1 = list("لبفسويتنا")

_S3 = ["تمل", "همل", "تان", "تين", "كمل"]
_S2 = ["ون", "ات", "ان", "ين", "تن", "كم", "هن", "نا", "يا", "ها", "تم",
       "كن", "ني", "وا", "ما", "هم"]
_S1 = list("ةهيكتان")

_PR4 = {0: "م", 1: "ا", 2: "اوي", 3: "ة"}
_PR53 = {0: "ات", 1: "ايو", 2: "اتم", 3: "ميت", 4: "مت", 5: "او", 6: "ام"}

_RE_SHORT_VOWELS = re.compile("[ً-ْ]")
_RE_INITIAL_HAMZA = re.compile("^[آأإ]")

STOP_WORDS = frozenset((
    "يكون وليس وكان كذلك التي وبين عليها مساء الذي وكانت ولكن والتي تكون "
    "اليوم اللذين عليه كانت لذلك أمام هناك منها مازال لازال لايزال مايزال "
    "اصبح أصبح أمسى امسى أضحى اضحى مابرح مافتئ ماانفك لاسيما ولايزال "
    "الحالي اليها الذين فانه والذي وهذا لهذا فكان ستكون اليه يمكن بهذا الذى"
).split())


def _suf1(stm: str) -> str:
    for sf in _S1:
        if stm.endswith(sf):
            return stm[:-1]
    return stm


def _pre1(stm: str) -> str:
    for sp in _P1:
        if stm.startswith(sp):
            return stm[1:]
    return stm


def _pre32(stm: str) -> str:
    if len(stm) >= 6:
        for pre3 in _P3:
            if stm.startswith(pre3):
                return stm[3:]
            if len(stm) >= 5:  # tried after EVERY failing p3 candidate
                for pre2 in _P2:
                    if stm.startswith(pre2):
                        return stm[2:]
    return stm


def _suf32(stm: str) -> str:
    if len(stm) >= 6:
        for suf3 in _S3:
            if stm.endswith(suf3):
                return stm[:-3]
            if len(stm) >= 5:
                for suf2 in _S2:
                    if stm.endswith(suf2):
                        return stm[:-2]
    return stm


def _waw(stm: str) -> str:
    if len(stm) >= 4 and stm[:2] == "وو":
        return stm[1:]
    return stm


def _pro_w4(stm: str) -> str:
    if stm[0] in _PR4[0]:
        return stm[1:]
    if stm[1] in _PR4[1]:
        return stm[0] + stm[2:]
    if stm[2] in _PR4[2]:
        return stm[:2] + stm[3]
    if stm[3] in _PR4[3]:
        return stm[:-1]
    stm = _suf1(stm)
    if len(stm) == 4:
        stm = _pre1(stm)
    return stm


def _pro_w53(stm: str) -> str:
    if stm[2] in _PR53[0] and stm[0] == "ا":
        return stm[1] + stm[3:]
    if stm[3] in _PR53[1] and stm[0] == "م":
        return stm[1:3] + stm[4]
    if stm[0] in _PR53[2] and stm[4] == "ة":
        return stm[1:4]
    if stm[0] in _PR53[3] and stm[2] == "ت":
        return stm[1] + stm[3:]
    if stm[0] in _PR53[4] and stm[2] == "ا":
        return stm[1] + stm[3:]
    if stm[2] in _PR53[5] and stm[4] == "ة":
        return stm[:2] + stm[3]
    if stm[0] in _PR53[6] and stm[1] == "ن":
        return stm[2:]
    if stm[3] == "ا" and stm[0] == "ا":
        return stm[1:3] + stm[4]
    if stm[4] == "ن" and stm[3] == "ا":
        return stm[:3]
    if stm[3] == "ي" and stm[0] == "ت":
        return stm[1:3] + stm[4]
    if stm[3] == "و" and stm[1] == "ا":
        return stm[0] + stm[2] + stm[4]
    if stm[2] == "ا" and stm[1] == "و":
        return stm[0] + stm[3:]
    if stm[3] == "ئ" and stm[2] == "ا":
        return stm[:2] + stm[4]
    if stm[4] == "ة" and stm[1] == "ا":
        return stm[0] + stm[2:4]
    if stm[4] == "ي" and stm[2] == "ا":
        return stm[:2] + stm[3]
    stm = _suf1(stm)
    if len(stm) == 5:
        stm = _pre1(stm)
    return stm


def _pro_w54(stm: str) -> str:
    if stm[0] in _PR53[2]:
        return stm[1:]
    if stm[4] == "ة":
        return stm[:4]
    if stm[2] == "ا":
        return stm[:2] + stm[3:]
    return stm


def _end_w5(stm: str) -> str:
    if len(stm) == 4:
        return _pro_w4(stm)
    if len(stm) == 5:
        return _pro_w54(stm)
    return stm


def _pro_w6(stm: str) -> str:
    if stm.startswith("است") or stm.startswith("مست"):
        return stm[3:]
    if stm[0] == "م" and stm[3] == "ا" and stm[5] == "ة":
        return stm[1:3] + stm[4]
    if stm[0] == "ا" and stm[2] == "ت" and stm[4] == "ا":
        return stm[1] + stm[3] + stm[5]
    if stm[0] == "ا" and stm[3] == "و" and stm[2] == stm[4]:
        return stm[1] + stm[4:]
    if stm[0] == "ت" and stm[2] == "ا" and stm[4] == "ي":
        return stm[1] + stm[3] + stm[5]
    stm = _suf1(stm)
    if len(stm) == 6:
        stm = _pre1(stm)
    return stm


def _pro_w64(stm: str) -> str:
    # reference parity: `(stm[0] and stm[4]) == 'ا'` only checks stm[4]
    if stm[4] == "ا":
        return stm[1:4] + stm[5]
    if stm.startswith("مت"):
        return stm[2:]
    return stm


def _end_w6(stm: str) -> str:
    if len(stm) == 5:
        return _end_w5(_pro_w53(stm))
    if len(stm) == 6:
        return _pro_w64(stm)
    return stm


def stem(token: str) -> str:
    """ISRI root of an Arabic token (returns the normalized form when no
    pattern applies, per the published algorithm)."""
    stm = _RE_SHORT_VOWELS.sub("", token)
    if stm in STOP_WORDS:
        return stm
    stm = _pre32(stm)
    stm = _suf32(stm)
    stm = _waw(stm)
    stm = _RE_INITIAL_HAMZA.sub("ا", stm)
    n = len(stm)
    if n <= 3:
        return stm
    if n == 4:
        return _pro_w4(stm)
    if n == 5:
        return _end_w5(_pro_w53(stm))
    if n == 6:
        return _end_w6(_pro_w6(stm))
    if n == 7:
        stm = _suf1(stm)
        if len(stm) == 7:
            stm = _pre1(stm)
        if len(stm) == 6:
            return _end_w6(_pro_w6(stm))
    return stm
