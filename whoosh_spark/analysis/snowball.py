"""Snowball stemmers: Danish, Norwegian, Swedish, German.

Each is the published Snowball algorithm
(https://snowballstem.org/algorithms/) re-expressed as plain functions;
behavior (including region-computation quirks) matches the reference's
bundled NLTK-derived classes (/root/reference/src/whoosh/lang/snowball/
bases.py, danish.py, norwegian.py, swedish.py, german.py) exactly —
verified over large generated word lists in tests/test_snowball.py.

``stemmer_for(lang)`` maps ISO codes to stem functions (the reference's
whoosh.lang.stemmer_for_language subset).
"""

from __future__ import annotations

# ---------------------------------------------------------------- regions


def _r1_scandinavian(word: str, vowels: str) -> str:
    """R1 = after the first non-vowel following a vowel, adjusted so at
    least 3 letters precede it (reference bases.py:13-45, quirks and all:
    a break at i<2 yields word[3:] even when the word is shorter)."""
    for i in range(1, len(word)):
        if word[i] not in vowels and word[i - 1] in vowels:
            if i + 1 < 3:
                return word[3:]
            return word[i + 1:]
    return ""


def _r1r2_standard(word: str, vowels: str) -> tuple[str, str]:
    """Standard R1/R2 (reference bases.py:54-95)."""
    r1 = ""
    for i in range(1, len(word)):
        if word[i] not in vowels and word[i - 1] in vowels:
            r1 = word[i + 1:]
            break
    r2 = ""
    for i in range(1, len(r1)):
        if r1[i] not in vowels and r1[i - 1] in vowels:
            r2 = r1[i + 1:]
            break
    return r1, r2


# ----------------------------------------------------------------- danish

_DA_VOWELS = "aeiouy\xe6\xe5\xf8"
_DA_DOUBLES = ("bb", "cc", "dd", "ff", "gg", "hh", "jj", "kk", "ll", "mm",
               "nn", "pp", "qq", "rr", "ss", "tt", "vv", "ww", "xx", "zz")
_DA_S_ENDING = "abcdfghjklmnoprtvyz\xe5"
_DA_STEP1 = ("erendes", "erende", "hedens", "ethed", "erede", "heden",
             "heder", "endes", "ernes", "erens", "erets", "ered", "ende",
             "erne", "eren", "erer", "heds", "enes", "eres", "eret", "hed",
             "ene", "ere", "ens", "ers", "ets", "en", "er", "es", "et",
             "e", "s")
_DA_STEP2 = ("gd", "dt", "gt", "kt")
_DA_STEP3 = ("elig", "l\xf8st", "lig", "els", "ig")


def stem_da(word: str) -> str:
    word = word.lower()
    r1 = _r1_scandinavian(word, _DA_VOWELS)
    for suffix in _DA_STEP1:
        if r1.endswith(suffix):
            if suffix == "s":
                if word[-2] in _DA_S_ENDING:
                    word = word[:-1]
                    r1 = r1[:-1]
            else:
                word = word[:-len(suffix)]
                r1 = r1[:-len(suffix)]
            break
    for suffix in _DA_STEP2:
        if r1.endswith(suffix):
            word = word[:-1]
            r1 = r1[:-1]
            break
    if r1.endswith("igst"):
        word = word[:-2]
        r1 = r1[:-2]
    for suffix in _DA_STEP3:
        if r1.endswith(suffix):
            if suffix == "l\xf8st":
                word = word[:-1]
                r1 = r1[:-1]
            else:
                word = word[:-len(suffix)]
                r1 = r1[:-len(suffix)]
                if r1.endswith(_DA_STEP2):
                    word = word[:-1]
                    r1 = r1[:-1]
            break
    for dc in _DA_DOUBLES:
        if word.endswith(dc) and len(word) > 3:
            word = word[:-1]
            break
    return word


# -------------------------------------------------------------- norwegian

_NO_VOWELS = "aeiouy\xe6\xe5\xf8"
_NO_S_ENDING = "bcdfghjlmnoprtvyz"
_NO_STEP1 = ("hetenes", "hetene", "hetens", "heter", "heten", "endes",
             "ande", "ende", "edes", "enes", "erte", "ede", "ane", "ene",
             "ens", "ers", "ets", "het", "ast", "ert", "en", "ar", "er",
             "as", "es", "et", "a", "e", "s")
_NO_STEP2 = ("dt", "vt")
_NO_STEP3 = ("hetslov", "eleg", "elig", "elov", "slov", "leg", "eig",
             "lig", "els", "lov", "ig")


def stem_no(word: str) -> str:
    word = word.lower()
    r1 = _r1_scandinavian(word, _NO_VOWELS)
    for suffix in _NO_STEP1:
        if r1.endswith(suffix):
            if suffix in ("erte", "ert"):
                word = word[:-len(suffix)] + "er"
                r1 = r1[:-len(suffix)] + "er"
            elif suffix == "s":
                if (word[-2] in _NO_S_ENDING
                        or (word[-2] == "k" and word[-3] not in _NO_VOWELS)):
                    word = word[:-1]
                    r1 = r1[:-1]
            else:
                word = word[:-len(suffix)]
                r1 = r1[:-len(suffix)]
            break
    for suffix in _NO_STEP2:
        if r1.endswith(suffix):
            word = word[:-1]
            r1 = r1[:-1]
            break
    for suffix in _NO_STEP3:
        if r1.endswith(suffix):
            word = word[:-len(suffix)]
            break
    return word


# ---------------------------------------------------------------- swedish

_SV_VOWELS = "aeiouy\xe4\xe5\xf6"
_SV_S_ENDING = "bcdfghjklmnoprtvy"
_SV_STEP1 = ("heterna", "hetens", "heter", "heten", "anden", "arnas",
             "ernas", "ornas", "andes", "andet", "arens", "arna", "erna",
             "orna", "ande", "arne", "aste", "aren", "ades", "erns", "ade",
             "are", "ern", "ens", "het", "ast", "ad", "en", "ar", "er",
             "or", "as", "es", "at", "a", "e", "s")
_SV_STEP2 = ("dd", "gd", "nn", "dt", "gt", "kt", "tt")
_SV_STEP3 = ("fullt", "l\xf6st", "els", "lig", "ig")


def stem_sv(word: str) -> str:
    word = word.lower()
    r1 = _r1_scandinavian(word, _SV_VOWELS)
    for suffix in _SV_STEP1:
        if r1.endswith(suffix):
            if suffix == "s":
                if word[-2] in _SV_S_ENDING:
                    word = word[:-1]
                    r1 = r1[:-1]
            else:
                word = word[:-len(suffix)]
                r1 = r1[:-len(suffix)]
            break
    for suffix in _SV_STEP2:
        if r1.endswith(suffix):
            word = word[:-1]
            r1 = r1[:-1]
            break
    for suffix in _SV_STEP3:
        if r1.endswith(suffix):
            if suffix in ("els", "lig", "ig"):
                word = word[:-len(suffix)]
            elif suffix in ("fullt", "l\xf6st"):
                word = word[:-1]
            break
    return word


# ----------------------------------------------------------------- german

_DE_VOWELS = "aeiouy\xe4\xf6\xfc"
_DE_S_ENDING = "bdfghklmnrt"
_DE_ST_ENDING = "bdfghklmnt"
_DE_STEP1 = ("ern", "em", "er", "en", "es", "e", "s")
_DE_STEP2 = ("est", "en", "er", "st")
_DE_STEP3 = ("isch", "lich", "heit", "keit", "end", "ung", "ig", "ik")


def stem_de(word: str) -> str:
    word = word.lower().replace("\xdf", "ss")
    # protect intervocalic u/y as uppercase (treated as consonants)
    for i in range(1, len(word) - 1):
        if word[i - 1] in _DE_VOWELS and word[i + 1] in _DE_VOWELS:
            if word[i] == "u":
                word = word[:i] + "U" + word[i + 1:]
            elif word[i] == "y":
                word = word[:i] + "Y" + word[i + 1:]
    r1, r2 = _r1r2_standard(word, _DE_VOWELS)
    # R1 adjusted to leave at least 3 letters before it
    for i in range(1, len(word)):
        if word[i] not in _DE_VOWELS and word[i - 1] in _DE_VOWELS:
            if i + 1 < 3:
                r1 = word[3:]
            break
    for suffix in _DE_STEP1:
        if r1.endswith(suffix):
            if (suffix in ("en", "es", "e")
                    and word[-len(suffix) - 4:-len(suffix)] == "niss"):
                word = word[:-len(suffix) - 1]
                r1 = r1[:-len(suffix) - 1]
                r2 = r2[:-len(suffix) - 1]
            elif suffix == "s":
                if word[-2] in _DE_S_ENDING:
                    word = word[:-1]
                    r1 = r1[:-1]
                    r2 = r2[:-1]
            else:
                word = word[:-len(suffix)]
                r1 = r1[:-len(suffix)]
                r2 = r2[:-len(suffix)]
            break
    for suffix in _DE_STEP2:
        if r1.endswith(suffix):
            if suffix == "st":
                if word[-3] in _DE_ST_ENDING and len(word) - 3 >= 3:
                    word = word[:-2]
                    r1 = r1[:-2]
                    r2 = r2[:-2]
            else:
                word = word[:-len(suffix)]
                r1 = r1[:-len(suffix)]
                r2 = r2[:-len(suffix)]
            break
    for suffix in _DE_STEP3:
        if r2.endswith(suffix):
            n = len(suffix)
            if suffix in ("end", "ung"):
                if "ig" in r2[-n - 2:-n] and "e" not in r2[-n - 3:-n - 2]:
                    word = word[:-n - 2]
                else:
                    word = word[:-n]
            elif suffix in ("ig", "ik", "isch") and "e" not in r2[-n - 1:-n]:
                word = word[:-n]
            elif suffix in ("lich", "heit"):
                if "er" in r1[-n - 2:-n] or "en" in r1[-n - 2:-n]:
                    word = word[:-n - 2]
                else:
                    word = word[:-n]
            elif suffix == "keit":
                if "lich" in r2[-n - 4:-n]:
                    word = word[:-n - 4]
                elif "ig" in r2[-n - 2:-n]:
                    word = word[:-n - 2]
                else:
                    word = word[:-n]
            break
    return (word.replace("\xe4", "a").replace("\xf6", "o")
            .replace("\xfc", "u").replace("U", "u").replace("Y", "y"))


STEMMERS = {"da": stem_da, "no": stem_no, "sv": stem_sv, "de": stem_de}


def stemmer_for(lang: str):
    """Stem function for an ISO language code (subset of the reference's
    whoosh.lang.stemmer_for_language); raises KeyError for languages
    without a bundled stemmer."""
    return STEMMERS[lang]
