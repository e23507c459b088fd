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

from functools import lru_cache as _lru_cache

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


@_lru_cache(maxsize=65536)
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


@_lru_cache(maxsize=65536)
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


@_lru_cache(maxsize=65536)
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


@_lru_cache(maxsize=65536)
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


def _rv_standard(word: str, vowels: str) -> str:
    """Standard RV (reference bases.py:97-133) — QUIRK KEPT: the
    'first two letters are vowels' test is literally ``word[:2] in
    vowels``, i.e. a SUBSTRING check against the vowel string, so e.g.
    'ea' (not contiguous in 'aeiou...') falls through to the word[3:]
    branch."""
    rv = ""
    if len(word) >= 2:
        if word[1] not in vowels:
            for i in range(2, len(word)):
                if word[i] in vowels:
                    rv = word[i + 1:]
                    break
        elif word[:2] in vowels:
            for i in range(2, len(word)):
                if word[i] not in vowels:
                    rv = word[i + 1:]
                    break
        else:
            rv = word[3:]
    return rv


# ---------------------------------------------------------------- spanish

_ES_VOWELS = "aeiou\xe1\xe9\xed\xf3\xfa\xfc"
_ES_STEP0 = ("selas", "selos", "sela", "selo", "las", "les", "los",
             "nos", "me", "se", "la", "le", "lo")
_ES_STEP1 = ("amientos", "imientos", "amiento", "imiento", "aciones",
             "uciones", "adoras", "adores", "ancias", "log\xedas",
             "encias", "amente", "idades", "anzas", "ismos", "ables",
             "ibles", "istas", "adora", "aci\xf3n", "antes", "ancia",
             "log\xeda", "uci\xf3n", "encia", "mente", "anza", "icos",
             "icas", "ismo", "able", "ible", "ista", "osos", "osas",
             "ador", "ante", "idad", "ivas", "ivos", "ico", "ica",
             "oso", "osa", "iva", "ivo")
_ES_STEP2A = ("yeron", "yendo", "yamos", "yais", "yan", "yen", "yas",
              "yes", "ya", "ye", "yo", "y\xf3")
_ES_STEP2B = ("ar\xedamos", "er\xedamos", "ir\xedamos", "i\xe9ramos",
              "i\xe9semos", "ar\xedais", "aremos", "er\xedais", "eremos",
              "ir\xedais", "iremos", "ierais", "ieseis", "asteis",
              "isteis", "\xe1bamos", "\xe1ramos", "\xe1semos", "ar\xedan",
              "ar\xedas", "ar\xe9is", "er\xedan", "er\xedas", "er\xe9is",
              "ir\xedan", "ir\xedas", "ir\xe9is", "ieran", "iesen",
              "ieron", "iendo", "ieras", "ieses", "abais", "arais",
              "aseis", "\xe9amos", "ar\xe1n", "ar\xe1s", "ar\xeda",
              "er\xe1n", "er\xe1s", "er\xeda", "ir\xe1n", "ir\xe1s",
              "ir\xeda", "iera", "iese", "aste", "iste", "aban", "aran",
              "asen", "aron", "ando", "abas", "adas", "idas", "aras",
              "ases", "\xedais", "ados", "idos", "amos", "imos", "emos",
              "ar\xe1", "ar\xe9", "er\xe1", "er\xe9", "ir\xe1", "ir\xe9",
              "aba", "ada", "ida", "ara", "ase", "\xedan", "ado", "ido",
              "\xedas", "\xe1is", "\xe9is", "\xeda", "ad", "ed", "id",
              "an", "i\xf3", "ar", "er", "ir", "as", "\xeds", "en", "es")
_ES_STEP3 = ("os", "a", "e", "o", "\xe1", "\xe9", "\xed", "\xf3")


def _es_deaccent(s: str) -> str:
    return s.replace("\xe1", "a").replace("\xe9", "e").replace("\xed", "i")


@_lru_cache(maxsize=65536)
def stem_es(word: str) -> str:
    word = word.lower()
    step1_success = False
    r1, r2 = _r1r2_standard(word, _ES_VOWELS)
    rv = _rv_standard(word, _ES_VOWELS)

    # STEP 0: attached pronoun
    for suffix in _ES_STEP0:
        if word.endswith(suffix):
            if rv.endswith(suffix):
                n = len(suffix)
                if rv[:-n].endswith(("i\xe9ndo", "\xe1ndo", "\xe1r", "\xe9r", "\xedr")):
                    word = _es_deaccent(word[:-n])
                    r1 = _es_deaccent(r1[:-n])
                    r2 = _es_deaccent(r2[:-n])
                    rv = _es_deaccent(rv[:-n])
                elif rv[:-n].endswith(("ando", "iendo", "ar", "er", "ir")):
                    word, r1, r2, rv = word[:-n], r1[:-n], r2[:-n], rv[:-n]
                elif rv[:-n].endswith("yendo") and word[:-n].endswith("uyendo"):
                    word, r1, r2, rv = word[:-n], r1[:-n], r2[:-n], rv[:-n]
            break

    # STEP 1: standard suffixes
    for suffix in _ES_STEP1:
        if word.endswith(suffix):
            n = len(suffix)
            if suffix == "amente" and r1.endswith(suffix):
                step1_success = True
                word, r2, rv = word[:-6], r2[:-6], rv[:-6]
                if r2.endswith("iv"):
                    word, r2, rv = word[:-2], r2[:-2], rv[:-2]
                    if r2.endswith("at"):
                        word, rv = word[:-2], rv[:-2]
                elif r2.endswith(("os", "ic", "ad")):
                    word, rv = word[:-2], rv[:-2]
            elif r2.endswith(suffix):
                step1_success = True
                if suffix in ("adora", "ador", "aci\xf3n", "adoras",
                              "adores", "aciones", "ante", "antes",
                              "ancia", "ancias"):
                    word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                    if r2.endswith("ic"):
                        word, rv = word[:-2], rv[:-2]
                elif suffix in ("log\xeda", "log\xedas"):
                    # the port uses str.replace (ALL occurrences) — kept
                    word = word.replace(suffix, "log")
                    rv = rv.replace(suffix, "log")
                elif suffix in ("uci\xf3n", "uciones"):
                    word = word.replace(suffix, "u")
                    rv = rv.replace(suffix, "u")
                elif suffix in ("encia", "encias"):
                    word = word.replace(suffix, "ente")
                    rv = rv.replace(suffix, "ente")
                elif suffix == "mente":
                    word, r2, rv = word[:-5], r2[:-5], rv[:-5]
                    if r2.endswith(("ante", "able", "ible")):
                        word, rv = word[:-4], rv[:-4]
                elif suffix in ("idad", "idades"):
                    word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                    for pre in ("abil", "ic", "iv"):
                        if r2.endswith(pre):
                            word, rv = word[:-len(pre)], rv[:-len(pre)]
                elif suffix in ("ivo", "iva", "ivos", "ivas"):
                    word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                    if r2.endswith("at"):
                        word, rv = word[:-2], rv[:-2]
                else:
                    word, rv = word[:-n], rv[:-n]
            break

    # STEPS 2a/2b: verb suffixes. QUIRK KEPT from the port: 2b runs even
    # when 2a already stripped (the published algorithm gates 2b on 2a
    # failing; the port only gates both on step 1 failing)
    if not step1_success:
        for suffix in _ES_STEP2A:
            if rv.endswith(suffix) and word[-len(suffix) - 1:-len(suffix)] == "u":
                word, rv = word[:-len(suffix)], rv[:-len(suffix)]
                break
        for suffix in _ES_STEP2B:
            if rv.endswith(suffix):
                n = len(suffix)
                if suffix in ("en", "es", "\xe9is", "emos"):
                    word, rv = word[:-n], rv[:-n]
                    if word.endswith("gu"):
                        word = word[:-1]
                    if rv.endswith("gu"):
                        rv = rv[:-1]
                else:
                    word, rv = word[:-n], rv[:-n]
                break

    # STEP 3: residual suffix
    for suffix in _ES_STEP3:
        if rv.endswith(suffix):
            if suffix in ("e", "\xe9"):
                word, rv = word[:-len(suffix)], rv[:-len(suffix)]
                if (len(word) >= 2 and word[-2:] == "gu"
                        and len(rv) > 0 and rv[-1] == "u"):
                    word = word[:-1]
            else:
                word = word[:-len(suffix)]
            break

    return (word.replace("\xe1", "a").replace("\xe9", "e")
            .replace("\xed", "i").replace("\xf3", "o").replace("\xfa", "u"))


# ------------------------------------------------------------------ dutch

_NL_VOWELS = "aeiouy\xe8"
_NL_STEP1 = ("heden", "ene", "en", "se", "s")
_NL_STEP3B = ("baar", "lijk", "bar", "end", "ing", "ig")


@_lru_cache(maxsize=65536)
def stem_nl(word: str) -> str:
    word = word.lower()
    step2_success = False
    word = (word.replace("\xe4", "a").replace("\xe1", "a")
            .replace("\xeb", "e").replace("\xe9", "e")
            .replace("\xed", "i").replace("\xef", "i")
            .replace("\xf6", "o").replace("\xf3", "o")
            .replace("\xfc", "u").replace("\xfa", "u"))
    # initial y, y after vowel, intervocalic i -> uppercase (consonants)
    if word.startswith("y"):
        word = "Y" + word[1:]
    for i in range(1, len(word)):
        if word[i - 1] in _NL_VOWELS and word[i] == "y":
            word = word[:i] + "Y" + word[i + 1:]
    for i in range(1, len(word) - 1):
        if (word[i - 1] in _NL_VOWELS and word[i] == "i"
                and word[i + 1] in _NL_VOWELS):
            word = word[:i] + "I" + word[i + 1:]
    r1, r2 = _r1r2_standard(word, _NL_VOWELS)
    for i in range(1, len(word)):
        if word[i] not in _NL_VOWELS and word[i - 1] in _NL_VOWELS:
            if i + 1 < 3:
                r1 = word[3:]
            break

    def undouble(w, a, b):
        if w.endswith(("kk", "dd", "tt")):
            return w[:-1], a[:-1], b[:-1]
        return w, a, b

    # STEP 1
    for suffix in _NL_STEP1:
        if r1.endswith(suffix):
            n = len(suffix)
            if suffix == "heden":
                word = word[:-5] + "heid"
                r1 = r1[:-5] + "heid"
                if r2.endswith("heden"):
                    r2 = r2[:-5] + "heid"
            elif (suffix in ("ene", "en") and not word.endswith("heden")
                    and word[-n - 1] not in _NL_VOWELS
                    and word[-n - 3:-n] != "gem"):
                word, r1, r2 = word[:-n], r1[:-n], r2[:-n]
                word, r1, r2 = undouble(word, r1, r2)
            elif (suffix in ("se", "s") and word[-n - 1] not in _NL_VOWELS
                    and word[-n - 1] != "j"):
                word, r1, r2 = word[:-n], r1[:-n], r2[:-n]
            break

    # STEP 2
    if r1.endswith("e") and word[-2] not in _NL_VOWELS:
        step2_success = True
        word, r1, r2 = word[:-1], r1[:-1], r2[:-1]
        word, r1, r2 = undouble(word, r1, r2)

    # STEP 3a
    if r2.endswith("heid") and word[-5] != "c":
        word, r1, r2 = word[:-4], r1[:-4], r2[:-4]
        if (r1.endswith("en") and word[-3] not in _NL_VOWELS
                and word[-5:-2] != "gem"):
            word, r1, r2 = word[:-2], r1[:-2], r2[:-2]
            word, r1, r2 = undouble(word, r1, r2)

    # STEP 3b
    for suffix in _NL_STEP3B:
        if r2.endswith(suffix):
            if suffix in ("end", "ing"):
                word, r2 = word[:-3], r2[:-3]
                if r2.endswith("ig") and word[-3] != "e":
                    word = word[:-2]
                elif word.endswith(("kk", "dd", "tt")):
                    word = word[:-1]
            elif suffix == "ig" and word[-3] != "e":
                word = word[:-2]
            elif suffix == "lijk":
                word, r1 = word[:-4], r1[:-4]
                if r1.endswith("e") and word[-2] not in _NL_VOWELS:
                    word = word[:-1]
                    if word.endswith(("kk", "dd", "tt")):
                        word = word[:-1]
            elif suffix == "baar":
                word = word[:-4]
            elif suffix == "bar" and step2_success:
                word = word[:-3]
            break

    # STEP 4: undouble vowel
    if len(word) >= 4 and word[-1] not in _NL_VOWELS and word[-1] != "I":
        if word[-3:-1] in ("aa", "ee", "oo", "uu") and word[-4] not in _NL_VOWELS:
            word = word[:-3] + word[-3] + word[-1]

    return word.replace("I", "i").replace("Y", "y")


# ---------------------------------------------------------------- italian

_IT_VOWELS = "aeiou\xe0\xe8\xec\xf2\xf9"
_IT_STEP0 = ("gliela", "gliele", "glieli", "glielo", "gliene", "sene",
             "mela", "mele", "meli", "melo", "mene", "tela", "tele",
             "teli", "telo", "tene", "cela", "cele", "celi", "celo",
             "cene", "vela", "vele", "veli", "velo", "vene", "gli",
             "ci", "la", "le", "li", "lo", "mi", "ne", "si", "ti", "vi")
_IT_STEP1 = ("atrice", "atrici", "azione", "azioni", "uzione", "uzioni",
             "usione", "usioni", "amento", "amenti", "imento", "imenti",
             "amente", "abile", "abili", "ibile", "ibili", "mente",
             "atore", "atori", "logia", "logie", "anza", "anze", "iche",
             "ichi", "ismo", "ismi", "ista", "iste", "isti", "ist\xe0",
             "ist\xe8", "ist\xec", "ante", "anti", "enza", "enze", "ico",
             "ici", "ica", "ice", "oso", "osi", "osa", "ose", "it\xe0",
             "ivo", "ivi", "iva", "ive")
_IT_STEP2 = ("erebbero", "irebbero", "assero", "assimo", "eranno",
             "erebbe", "eremmo", "ereste", "eresti", "essero", "iranno",
             "irebbe", "iremmo", "ireste", "iresti", "iscano", "iscono",
             "issero", "arono", "avamo", "avano", "avate", "eremo",
             "erete", "erono", "evamo", "evano", "evate", "iremo",
             "irete", "irono", "ivamo", "ivano", "ivate", "ammo",
             "ando", "asse", "assi", "emmo", "enda", "ende", "endi",
             "endo", "erai", "erei", "Yamo", "iamo", "immo", "irai",
             "irei", "isca", "isce", "isci", "isco", "ano", "are",
             "ata", "ate", "ati", "ato", "ava", "avi", "avo", "er\xe0",
             "ere", "er\xf2", "ete", "eva", "evi", "evo", "ir\xe0",
             "ire", "ir\xf2", "ita", "ite", "iti", "ito", "iva", "ivi",
             "ivo", "ono", "uta", "ute", "uti", "uto", "ar", "ir")


@_lru_cache(maxsize=65536)
def stem_it(word: str) -> str:
    word = word.lower()
    step1_success = False
    # acute accents -> grave
    word = (word.replace("\xe1", "\xe0").replace("\xe9", "\xe8")
            .replace("\xed", "\xec").replace("\xf3", "\xf2")
            .replace("\xfa", "\xf9"))
    for i in range(1, len(word)):
        if word[i - 1] == "q" and word[i] == "u":
            word = word[:i] + "U" + word[i + 1:]
    for i in range(1, len(word) - 1):
        if word[i - 1] in _IT_VOWELS and word[i + 1] in _IT_VOWELS:
            if word[i] == "u":
                word = word[:i] + "U" + word[i + 1:]
            elif word[i] == "i":
                word = word[:i] + "I" + word[i + 1:]
    r1, r2 = _r1r2_standard(word, _IT_VOWELS)
    rv = _rv_standard(word, _IT_VOWELS)

    # STEP 0: attached pronoun
    for suffix in _IT_STEP0:
        if rv.endswith(suffix):
            n = len(suffix)
            if rv[-n - 4:-n] in ("ando", "endo"):
                word, r1, r2, rv = word[:-n], r1[:-n], r2[:-n], rv[:-n]
            elif rv[-n - 2:-n] in ("ar", "er", "ir"):
                word = word[:-n] + "e"
                r1 = r1[:-n] + "e"
                r2 = r2[:-n] + "e"
                rv = rv[:-n] + "e"
            break

    # STEP 1: standard suffixes
    for suffix in _IT_STEP1:
        if word.endswith(suffix):
            n = len(suffix)
            if suffix == "amente" and r1.endswith(suffix):
                step1_success = True
                word, r2, rv = word[:-6], r2[:-6], rv[:-6]
                if r2.endswith("iv"):
                    word, r2, rv = word[:-2], r2[:-2], rv[:-2]
                    if r2.endswith("at"):
                        word, rv = word[:-2], rv[:-2]
                elif r2.endswith(("os", "ic")):
                    word, rv = word[:-2], rv[:-2]
                elif r2.endswith("abil"):
                    word, rv = word[:-4], rv[:-4]
            elif (suffix in ("amento", "amenti", "imento", "imenti")
                    and rv.endswith(suffix)):
                step1_success = True
                word, rv = word[:-6], rv[:-6]
            elif r2.endswith(suffix):
                step1_success = True
                if suffix in ("azione", "azioni", "atore", "atori"):
                    word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                    if r2.endswith("ic"):
                        word, rv = word[:-2], rv[:-2]
                elif suffix in ("logia", "logie"):
                    # PORT BUG kept: rv is reset from WORD, not rv
                    word = word[:-2]
                    rv = word[:-2]
                elif suffix in ("uzione", "uzioni", "usione", "usioni"):
                    word, rv = word[:-5], rv[:-5]
                elif suffix in ("enza", "enze"):
                    word = word[:-2] + "te"
                    rv = rv[:-2] + "te"
                elif suffix == "it\xe0":
                    word, r2, rv = word[:-3], r2[:-3], rv[:-3]
                    if r2.endswith(("ic", "iv")):
                        word, rv = word[:-2], rv[:-2]
                    elif r2.endswith("abil"):
                        word, rv = word[:-4], rv[:-4]
                elif suffix in ("ivo", "ivi", "iva", "ive"):
                    word, r2, rv = word[:-3], r2[:-3], rv[:-3]
                    if r2.endswith("at"):
                        word, r2, rv = word[:-2], r2[:-2], rv[:-2]
                        if r2.endswith("ic"):
                            word, rv = word[:-2], rv[:-2]
                else:
                    word, rv = word[:-n], rv[:-n]
            break

    # STEP 2: verb suffixes
    if not step1_success:
        for suffix in _IT_STEP2:
            if rv.endswith(suffix):
                word, rv = word[:-len(suffix)], rv[:-len(suffix)]
                break

    # STEP 3a: final vowel
    if rv.endswith(("a", "e", "i", "o", "\xe0", "\xe8", "\xec", "\xf2")):
        word, rv = word[:-1], rv[:-1]
        if rv.endswith("i"):
            word, rv = word[:-1], rv[:-1]

    # STEP 3b
    if rv.endswith(("ch", "gh")):
        word = word[:-1]

    return word.replace("I", "i").replace("U", "u")


# ------------------------------------------------------------- portuguese

_PT_VOWELS = "aeiou\xe1\xe9\xed\xf3\xfa\xe2\xea\xf4"
_PT_STEP1 = ("amentos", "imentos", "uciones", "amento", "imento",
             "adoras", "adores", "a\xe7o~es", "log\xedas", "\xeancias",
             "amente", "idades", "ismos", "istas", "adora", "a\xe7a~o",
             "antes", "\xe2ncia", "log\xeda", "uci\xf3n", "\xeancia",
             "mente", "idade", "ezas", "icos", "icas", "ismo",
             "\xe1vel", "\xedvel", "ista", "osos", "osas", "ador",
             "ante", "ivas", "ivos", "iras", "eza", "ico", "ica",
             "oso", "osa", "iva", "ivo", "ira")
_PT_STEP2 = ("ar\xedamos", "er\xedamos", "ir\xedamos", "\xe1ssemos",
             "\xeassemos", "\xedssemos", "ar\xedeis", "er\xedeis",
             "ir\xedeis", "\xe1sseis", "\xe9sseis", "\xedsseis",
             "\xe1ramos", "\xe9ramos", "\xedramos", "\xe1vamos",
             "aremos", "eremos", "iremos", "ariam", "eriam", "iriam",
             "assem", "essem", "issem", "ara~o", "era~o", "ira~o",
             "arias", "erias", "irias", "ardes", "erdes", "irdes",
             "asses", "esses", "isses", "astes", "estes", "istes",
             "\xe1reis", "areis", "\xe9reis", "ereis", "\xedreis",
             "ireis", "\xe1veis", "\xedamos", "armos", "ermos", "irmos",
             "aria", "eria", "iria", "asse", "esse", "isse", "aste",
             "este", "iste", "arei", "erei", "irei", "aram", "eram",
             "iram", "avam", "arem", "erem", "irem", "ando", "endo",
             "indo", "adas", "idas", "ar\xe1s", "aras", "er\xe1s",
             "eras", "ir\xe1s", "avas", "ares", "eres", "ires",
             "\xedeis", "ados", "idos", "\xe1mos", "amos", "emos",
             "imos", "iras", "ada", "ida", "ar\xe1", "ara", "er\xe1",
             "era", "ir\xe1", "ava", "iam", "ado", "ido", "ias", "ais",
             "eis", "ira", "ia", "ei", "am", "em", "ar", "er", "ir",
             "as", "es", "is", "eu", "iu", "ou")
_PT_STEP4 = ("os", "a", "i", "o", "\xe1", "\xed", "\xf3")


@_lru_cache(maxsize=65536)
def stem_pt(word: str) -> str:
    word = word.lower()
    step1_success = False
    step2_success = False
    word = word.replace("\xe3", "a~").replace("\xf5", "o~")
    r1, r2 = _r1r2_standard(word, _PT_VOWELS)
    rv = _rv_standard(word, _PT_VOWELS)

    # STEP 1: standard suffixes
    for suffix in _PT_STEP1:
        if word.endswith(suffix):
            n = len(suffix)
            if suffix == "amente" and r1.endswith(suffix):
                step1_success = True
                word, r2, rv = word[:-6], r2[:-6], rv[:-6]
                if r2.endswith("iv"):
                    word, r2, rv = word[:-2], r2[:-2], rv[:-2]
                    if r2.endswith("at"):
                        word, rv = word[:-2], rv[:-2]
                elif r2.endswith(("os", "ic", "ad")):
                    word, rv = word[:-2], rv[:-2]
            elif (suffix in ("ira", "iras") and rv.endswith(suffix)
                    and word[-n - 1:-n] == "e"):
                step1_success = True
                word = word[:-n] + "ir"
                rv = rv[:-n] + "ir"
            elif r2.endswith(suffix):
                step1_success = True
                if suffix in ("log\xeda", "log\xedas"):
                    word, rv = word[:-2], rv[:-2]
                elif suffix in ("uci\xf3n", "uciones"):
                    word = word[:-n] + "u"
                    rv = rv[:-n] + "u"
                elif suffix in ("\xeancia", "\xeancias"):
                    word = word[:-n] + "ente"
                    rv = rv[:-n] + "ente"
                elif suffix == "mente":
                    word, r2, rv = word[:-5], r2[:-5], rv[:-5]
                    if r2.endswith(("ante", "avel", "\xedvel")):
                        word, rv = word[:-4], rv[:-4]
                elif suffix in ("idade", "idades"):
                    word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                    if r2.endswith(("ic", "iv")):
                        word, rv = word[:-2], rv[:-2]
                    elif r2.endswith("abil"):
                        word, rv = word[:-4], rv[:-4]
                elif suffix in ("iva", "ivo", "ivas", "ivos"):
                    word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                    if r2.endswith("at"):
                        word, rv = word[:-2], rv[:-2]
                else:
                    word, rv = word[:-n], rv[:-n]
            break

    # STEP 2: verb suffixes
    if not step1_success:
        for suffix in _PT_STEP2:
            if rv.endswith(suffix):
                step2_success = True
                word, rv = word[:-len(suffix)], rv[:-len(suffix)]
                break

    # STEP 3
    if (step1_success or step2_success) and rv.endswith("i") and word[-2] == "c":
        word, rv = word[:-1], rv[:-1]

    # STEP 4: residual suffix
    if not step1_success and not step2_success:
        for suffix in _PT_STEP4:
            if rv.endswith(suffix):
                word, rv = word[:-len(suffix)], rv[:-len(suffix)]
                break

    # STEP 5
    if rv.endswith(("e", "\xe9", "\xea")):
        word, rv = word[:-1], rv[:-1]
        if ((word.endswith("gu") and rv.endswith("u"))
                or (word.endswith("ci") and rv.endswith("i"))):
            word = word[:-1]
    elif word.endswith("\xe7"):
        word = word[:-1] + "c"

    return word.replace("a~", "\xe3").replace("o~", "\xf5")


# --------------------------------------------------------------- romanian

_RO_VOWELS = "aeiouă\xe2\xee"
_RO_STEP0 = ("iilor", "ului", "elor", "iile", "ilor", "atei", "aţie",
             "aţia", "aua", "ele", "iua", "iei", "ile", "ul", "ea", "ii")
_RO_STEP1 = ("abilitate", "abilitati", "abilităţi", "ibilitate",
             "abilităi", "ivitate", "ivitati", "ivităţi",
             "icitate", "icitati", "icităţi", "icatori",
             "ivităi", "icităi", "icator", "aţiune",
             "atoare", "ătoare", "iţiune", "itoare", "iciva",
             "icive", "icivi", "icivă", "icala", "icale", "icali",
             "icală", "ativa", "ative", "ativi", "ativă",
             "atori", "ători", "itiva", "itive", "itivi",
             "itivă", "itori", "iciv", "ical", "ativ", "ator",
             "ător", "itiv", "itor")
_RO_STEP2 = ("abila", "abile", "abili", "abilă", "ibila", "ibile",
             "ibili", "ibilă", "atori", "itate", "itati",
             "ităţi", "abil", "ibil", "oasa", "oasă",
             "oase", "anta", "ante", "anti", "antă", "ator",
             "ităi", "iune", "iuni", "isme", "ista", "iste", "isti",
             "istă", "işti", "ata", "ată", "ati", "ate",
             "uta", "ută", "uti", "ute", "ita", "ită", "iti",
             "ite", "ica", "ice", "ici", "ică", "osi", "oşi",
             "ant", "iva", "ive", "ivi", "ivă", "ism", "ist", "at",
             "ut", "it", "ic", "os", "iv")
_RO_STEP3 = ("seserăţi", "aserăţi", "iserăţi",
             "\xe2serăţi", "userăţi", "seserăm",
             "aserăm", "iserăm", "\xe2serăm", "userăm",
             "serăţi", "seseşi", "seseră",
             "ească", "arăţi", "urăţi",
             "irăţi", "\xe2răţi", "aseşi",
             "aseră", "iseşi", "iseră", "\xe2seşi",
             "\xe2seră", "useşi", "useră", "serăm",
             "sesem", "indu", "\xe2ndu", "ează", "eşti",
             "eşte", "ăşti", "ăşte",
             "eaţi", "iaţi", "arăm", "urăm",
             "irăm", "\xe2răm", "asem", "isem", "\xe2sem",
             "usem", "seşi", "seră", "sese", "are", "ere",
             "ire", "\xe2re", "ind", "\xe2nd", "eze", "ezi", "esc",
             "ăsc", "eam", "eai", "eau", "iam", "iai", "iau",
             "aşi", "ară", "uşi", "ură", "işi",
             "iră", "\xe2şi", "\xe2ră", "ase", "ise",
             "\xe2se", "use", "aţi", "eţi", "iţi",
             "\xe2ţi", "sei", "ez", "am", "ai", "au", "ea", "ia",
             "ui", "\xe2i", "ăm", "em", "im", "\xe2m", "se")
_RO_STEP3_DROP = ("seserăţi", "seserăm", "serăţi",
                  "seseşi", "seseră", "serăm", "sesem",
                  "seşi", "seră", "sese", "aţi",
                  "eţi", "iţi", "\xe2ţi", "sei",
                  "ăm", "em", "im", "\xe2m", "se")


@_lru_cache(maxsize=65536)
def stem_ro(word: str) -> str:
    """NOTE on fidelity: the port tests region membership with SUBSTRING
    checks (``suffix in r1``), not endswith — kept, as are the step-3
    rv.index() first-occurrence consonant test and the step-1 repeat loop
    that clears step1_success when a later match falls outside R1."""
    word = word.lower()
    step1_success = False
    step2_success = False
    for i in range(1, len(word) - 1):
        if word[i - 1] in _RO_VOWELS and word[i + 1] in _RO_VOWELS:
            if word[i] == "u":
                word = word[:i] + "U" + word[i + 1:]
            elif word[i] == "i":
                word = word[:i] + "I" + word[i + 1:]
    r1, r2 = _r1r2_standard(word, _RO_VOWELS)
    rv = _rv_standard(word, _RO_VOWELS)

    # STEP 0: plurals and simplifications
    for suffix in _RO_STEP0:
        if word.endswith(suffix):
            if suffix in r1:
                n = len(suffix)
                if suffix in ("ul", "ului"):
                    word = word[:-n]
                    rv = rv[:-n] if suffix in rv else ""
                elif (suffix == "aua" or suffix == "atei"
                        or (suffix == "ile" and word[-5:-3] != "ab")):
                    word = word[:-2]
                elif suffix in ("ea", "ele", "elor"):
                    word = word[:-n] + "e"
                    rv = (rv[:-n] + "e") if suffix in rv else ""
                elif suffix in ("ii", "iua", "iei", "iile", "iilor", "ilor"):
                    word = word[:-n] + "i"
                    rv = (rv[:-n] + "i") if suffix in rv else ""
                elif suffix in ("aţie", "aţia"):
                    word = word[:-1]
            break

    # STEP 1: combining suffixes, repeated until no replacement
    while True:
        replacement_done = False
        for suffix in _RO_STEP1:
            if word.endswith(suffix):
                if suffix in r1:
                    step1_success = True
                    replacement_done = True
                    n = len(suffix)
                    if suffix in ("abilitate", "abilitati", "abilităi",
                                  "abilităţi"):
                        word = word[:-n] + "abil"
                    elif suffix == "ibilitate":
                        word = word[:-5]
                    elif suffix in ("ivitate", "ivitati", "ivităi",
                                    "ivităţi"):
                        word = word[:-n] + "iv"
                    elif suffix in ("icitate", "icitati", "icităi",
                                    "icităţi", "icator", "icatori",
                                    "iciv", "iciva", "icive", "icivi",
                                    "icivă", "ical", "icala", "icale",
                                    "icali", "icală"):
                        word = word[:-n] + "ic"
                    elif suffix in ("ativ", "ativa", "ative", "ativi",
                                    "ativă", "aţiune", "atoare",
                                    "ator", "atori", "ătoare",
                                    "ător", "ători"):
                        word = word[:-n] + "at"
                        if suffix in r2:
                            r2 = r2[:-n] + "at"
                    elif suffix in ("itiv", "itiva", "itive", "itivi",
                                    "itivă", "iţiune", "itoare",
                                    "itor", "itori"):
                        word = word[:-n] + "it"
                        if suffix in r2:
                            r2 = r2[:-n] + "it"
                else:
                    step1_success = False
                break
        if not replacement_done:
            break

    # STEP 2: standard suffixes
    for suffix in _RO_STEP2:
        if word.endswith(suffix):
            if suffix in r2:
                step2_success = True
                if suffix in ("iune", "iuni"):
                    if word[-5] == "ţ":
                        word = word[:-5] + "t"
                elif suffix in ("ism", "isme", "ist", "ista", "iste",
                                "isti", "istă", "işti"):
                    word = word[:-len(suffix)] + "ist"
                else:
                    word = word[:-len(suffix)]
            break

    # STEP 3: verb suffixes
    if not step1_success and not step2_success:
        for suffix in _RO_STEP3:
            if word.endswith(suffix):
                if suffix in rv:
                    if suffix in _RO_STEP3_DROP:
                        word = word[:-len(suffix)]
                        rv = rv[:-len(suffix)]
                    else:
                        if (not rv.startswith(suffix)
                                and rv[rv.index(suffix) - 1]
                                not in "aeioă\xe2\xee"):
                            word = word[:-len(suffix)]
                    break

    # STEP 4: final vowel
    for suffix in ("ie", "a", "e", "i", "ă"):
        if word.endswith(suffix):
            if suffix in rv:
                word = word[:-len(suffix)]
            break

    return word.replace("I", "i").replace("U", "u")


# ---------------------------------------------------------------- finnish

_FI_VOWELS = "aeiouy\xe4\xf6"
_FI_RESTRICTED = "aeiou\xe4\xf6"
_FI_LONG = ("aa", "ee", "ii", "oo", "uu", "\xe4\xe4", "\xf6\xf6")
_FI_CONS = "bcdfghjklmnpqrstvwxz"
_FI_DOUBLES = ("bb", "cc", "dd", "ff", "gg", "hh", "jj", "kk", "ll",
               "mm", "nn", "pp", "qq", "rr", "ss", "tt", "vv", "ww",
               "xx", "zz")
_FI_STEP1 = ("kaan", "k\xe4\xe4n", "sti", "kin", "han", "h\xe4n",
             "ko", "k\xf6", "pa", "p\xe4")
_FI_STEP2 = ("nsa", "ns\xe4", "mme", "nne", "si", "ni", "an", "\xe4n", "en")
_FI_STEP3 = ("siin", "tten", "seen", "han", "hen", "hin", "hon",
             "h\xe4n", "h\xf6n", "den", "tta", "tt\xe4", "ssa",
             "ss\xe4", "sta", "st\xe4", "lla", "ll\xe4", "lta",
             "lt\xe4", "lle", "ksi", "ine", "ta", "t\xe4", "na",
             "n\xe4", "a", "\xe4", "n")
_FI_STEP4 = ("impi", "impa", "imp\xe4", "immi", "imma", "imm\xe4",
             "mpi", "mpa", "mp\xe4", "mmi", "mma", "mm\xe4",
             "eja", "ej\xe4")


@_lru_cache(maxsize=65536)
def stem_fi(word: str) -> str:
    word = word.lower()
    step3_success = False
    r1, r2 = _r1r2_standard(word, _FI_VOWELS)

    # STEP 1: particles
    for suffix in _FI_STEP1:
        if r1.endswith(suffix):
            if suffix == "sti":
                if suffix in r2:
                    word, r1, r2 = word[:-3], r1[:-3], r2[:-3]
            elif word[-len(suffix) - 1] in "ntaeiouy\xe4\xf6":
                n = len(suffix)
                word, r1, r2 = word[:-n], r1[:-n], r2[:-n]
            break

    # STEP 2: possessives
    for suffix in _FI_STEP2:
        if r1.endswith(suffix):
            if suffix == "si":
                if word[-3] != "k":
                    word, r1, r2 = word[:-2], r1[:-2], r2[:-2]
            elif suffix == "ni":
                word, r1, r2 = word[:-2], r1[:-2], r2[:-2]
                if word.endswith("kse"):
                    word = word[:-3] + "ksi"
                if r1.endswith("kse"):
                    r1 = r1[:-3] + "ksi"
                if r2.endswith("kse"):
                    r2 = r2[:-3] + "ksi"
            elif suffix == "an":
                if (word[-4:-2] in ("ta", "na")
                        or word[-5:-2] in ("ssa", "sta", "lla", "lta")):
                    word, r1, r2 = word[:-2], r1[:-2], r2[:-2]
            elif suffix == "\xe4n":
                if (word[-4:-2] in ("t\xe4", "n\xe4")
                        or word[-5:-2] in ("ss\xe4", "st\xe4", "ll\xe4", "lt\xe4")):
                    word, r1, r2 = word[:-2], r1[:-2], r2[:-2]
            elif suffix == "en":
                if word[-5:-2] in ("lle", "ine"):
                    word, r1, r2 = word[:-2], r1[:-2], r2[:-2]
            else:
                word, r1, r2 = word[:-3], r1[:-3], r2[:-3]
            break

    # STEP 3: cases
    for suffix in _FI_STEP3:
        if r1.endswith(suffix):
            n = len(suffix)
            if suffix in ("han", "hen", "hin", "hon", "h\xe4n", "h\xf6n"):
                if ((suffix == "han" and word[-4] == "a")
                        or (suffix == "hen" and word[-4] == "e")
                        or (suffix == "hin" and word[-4] == "i")
                        or (suffix == "hon" and word[-4] == "o")
                        or (suffix == "h\xe4n" and word[-4] == "\xe4")
                        or (suffix == "h\xf6n" and word[-4] == "\xf6")):
                    word, r1, r2 = word[:-3], r1[:-3], r2[:-3]
                    step3_success = True
            elif suffix in ("siin", "den", "tten"):
                if (word[-n - 1] == "i"
                        and word[-n - 2] in _FI_RESTRICTED):
                    word, r1, r2 = word[:-n], r1[:-n], r2[:-n]
                    step3_success = True
                else:
                    continue
            elif suffix == "seen":
                if word[-6:-4] in _FI_LONG:
                    word, r1, r2 = word[:-4], r1[:-4], r2[:-4]
                    step3_success = True
                else:
                    continue
            elif suffix in ("a", "\xe4"):
                if word[-2] in _FI_VOWELS and word[-3] in _FI_CONS:
                    word, r1, r2 = word[:-1], r1[:-1], r2[:-1]
                    step3_success = True
            elif suffix in ("tta", "tt\xe4"):
                if word[-4] == "e":
                    word, r1, r2 = word[:-3], r1[:-3], r2[:-3]
                    step3_success = True
            elif suffix == "n":
                word, r1, r2 = word[:-1], r1[:-1], r2[:-1]
                step3_success = True
                if word[-2:] == "ie" or word[-2:] in _FI_LONG:
                    word, r1, r2 = word[:-1], r1[:-1], r2[:-1]
            else:
                word, r1, r2 = word[:-n], r1[:-n], r2[:-n]
                step3_success = True
            break

    # STEP 4: other endings
    for suffix in _FI_STEP4:
        if r2.endswith(suffix):
            if suffix in ("mpi", "mpa", "mp\xe4", "mmi", "mma", "mm\xe4"):
                if word[-5:-3] != "po":
                    word, r1, r2 = word[:-3], r1[:-3], r2[:-3]
            else:
                n = len(suffix)
                word, r1, r2 = word[:-n], r1[:-n], r2[:-n]
            break

    # STEP 5: plurals
    if step3_success and len(r1) >= 1 and r1[-1] in "ij":
        word, r1 = word[:-1], r1[:-1]
    elif (not step3_success and len(r1) >= 2
            and r1[-1] == "t" and r1[-2] in _FI_VOWELS):
        word, r1, r2 = word[:-1], r1[:-1], r2[:-1]
        if r2.endswith("imma"):
            word, r1 = word[:-4], r1[:-4]
        elif r2.endswith("mma") and r2[-5:-3] != "po":
            word, r1 = word[:-3], r1[:-3]

    # STEP 6: tidying
    if r1[-2:] in _FI_LONG:
        word, r1 = word[:-1], r1[:-1]
    if len(r1) >= 2 and r1[-2] in _FI_CONS and r1[-1] in "a\xe4ei":
        word, r1 = word[:-1], r1[:-1]
    if r1.endswith(("oj", "uj")):
        word, r1 = word[:-1], r1[:-1]
    if r1.endswith("jo"):
        word, r1 = word[:-1], r1[:-1]
    # final double consonant followed by zero or more vowels
    for i in range(1, len(word)):
        if word[-i] in _FI_VOWELS:
            continue
        if i == 1:
            if word[-i - 1:] in _FI_DOUBLES:
                word = word[:-1]
        elif word[-i - 1:-i + 1] in _FI_DOUBLES:
            word = word[:-i] + word[-i + 1:]
        break

    return word


# ----------------------------------------------------------------- french

_FR_VOWELS = "aeiouy\xe2\xe0\xeb\xe9\xea\xe8\xef\xee\xf4\xfb\xf9"
_FR_STEP1 = ("issements", "issement", "atrices", "atrice", "ateurs",
             "ations", "logies", "usions", "utions", "ements", "amment",
             "emment", "ances", "iqUes", "ismes", "ables", "istes",
             "ateur", "ation", "logie", "usion", "ution", "ences",
             "ement", "euses", "ments", "ance", "iqUe", "isme", "able",
             "iste", "ence", "it\xe9s", "ives", "eaux", "euse", "ment",
             "eux", "it\xe9", "ive", "ifs", "aux", "if")
_FR_STEP2A = ("issaIent", "issantes", "iraIent", "issante", "issants",
              "issions", "irions", "issais", "issait", "issant",
              "issent", "issiez", "issons", "irais", "irait", "irent",
              "iriez", "irons", "iront", "isses", "issez", "\xeemes",
              "\xeetes", "irai", "iras", "irez", "isse", "ies", "ira",
              "\xeet", "ie", "ir", "is", "it", "i")
_FR_STEP2B = ("eraIent", "assions", "erions", "assent", "assiez",
              "\xe8rent", "erais", "erait", "eriez", "erons", "eront",
              "aIent", "antes", "asses", "ions", "erai", "eras", "erez",
              "\xe2mes", "\xe2tes", "ante", "ants", "asse", "\xe9es",
              "era", "iez", "ais", "ait", "ant", "\xe9e", "\xe9s", "er",
              "ez", "\xe2t", "ai", "as", "\xe9", "a")
_FR_STEP4 = ("i\xe8re", "I\xe8re", "ion", "ier", "Ier", "e", "\xeb")


def _rv_french(word: str) -> str:
    """French RV (reference french.py:321-348): par/col/tap prefixes and
    initial double vowels give word[3:]; else after the first non-initial
    vowel."""
    if len(word) < 2:
        return ""
    if (word.startswith(("par", "col", "tap"))
            or (word[0] in _FR_VOWELS and word[1] in _FR_VOWELS)):
        return word[3:]
    for i in range(1, len(word)):
        if word[i] in _FR_VOWELS:
            return word[i + 1:]
    return ""


@_lru_cache(maxsize=65536)
def stem_fr(word: str) -> str:
    word = word.lower()
    step1_success = False
    rv_ending_found = False
    step2a_success = False
    step2b_success = False
    for i in range(1, len(word)):
        if word[i - 1] == "q" and word[i] == "u":
            word = word[:i] + "U" + word[i + 1:]
    for i in range(1, len(word) - 1):
        if word[i - 1] in _FR_VOWELS and word[i + 1] in _FR_VOWELS:
            if word[i] == "u":
                word = word[:i] + "U" + word[i + 1:]
            elif word[i] == "i":
                word = word[:i] + "I" + word[i + 1:]
        if word[i - 1] in _FR_VOWELS or word[i + 1] in _FR_VOWELS:
            if word[i] == "y":
                word = word[:i] + "Y" + word[i + 1:]
    r1, r2 = _r1r2_standard(word, _FR_VOWELS)
    rv = _rv_french(word)

    # STEP 1: standard suffixes (region tests are SUBSTRING membership)
    for suffix in _FR_STEP1:
        if word.endswith(suffix):
            n = len(suffix)
            if suffix == "eaux":
                word = word[:-1]
                step1_success = True
            elif suffix in ("euse", "euses"):
                if suffix in r2:
                    word = word[:-n]
                    step1_success = True
                elif suffix in r1:
                    word = word[:-n] + "eux"
                    step1_success = True
            elif suffix in ("ement", "ements") and suffix in rv:
                word = word[:-n]
                step1_success = True
                if word[-2:] == "iv" and "iv" in r2:
                    word = word[:-2]
                    if word[-2:] == "at" and "at" in r2:
                        word = word[:-2]
                elif word[-3:] == "eus":
                    if "eus" in r2:
                        word = word[:-3]
                    elif "eus" in r1:
                        word = word[:-1] + "x"
                elif word[-3:] in ("abl", "iqU"):
                    if "abl" in r2 or "iqU" in r2:
                        word = word[:-3]
                elif word[-3:] in ("i\xe8r", "I\xe8r"):
                    if "i\xe8r" in rv or "I\xe8r" in rv:
                        word = word[:-3] + "i"
            elif suffix == "amment" and suffix in rv:
                word = word[:-6] + "ant"
                rv = rv[:-6] + "ant"
                rv_ending_found = True
            elif suffix == "emment" and suffix in rv:
                word = word[:-6] + "ent"
                rv_ending_found = True
            elif (suffix in ("ment", "ments") and suffix in rv
                    and not rv.startswith(suffix)
                    and rv[rv.rindex(suffix) - 1] in _FR_VOWELS):
                word = word[:-n]
                rv = rv[:-n]
                rv_ending_found = True
            elif suffix == "aux" and suffix in r1:
                word = word[:-2] + "l"
                step1_success = True
            elif (suffix in ("issement", "issements") and suffix in r1
                    and word[-n - 1] not in _FR_VOWELS):
                word = word[:-n]
                step1_success = True
            elif suffix in ("ance", "iqUe", "isme", "able", "iste",
                            "eux", "ances", "iqUes", "ismes", "ables",
                            "istes") and suffix in r2:
                word = word[:-n]
                step1_success = True
            elif suffix in ("atrice", "ateur", "ation", "atrices",
                            "ateurs", "ations") and suffix in r2:
                word = word[:-n]
                step1_success = True
                if word[-2:] == "ic":
                    if "ic" in r2:
                        word = word[:-2]
                    else:
                        word = word[:-2] + "iqU"
            elif suffix in ("logie", "logies") and suffix in r2:
                word = word[:-n] + "log"
                step1_success = True
            elif suffix in ("usion", "ution", "usions", "utions") and suffix in r2:
                word = word[:-n] + "u"
                step1_success = True
            elif suffix in ("ence", "ences") and suffix in r2:
                word = word[:-n] + "ent"
                step1_success = True
            elif suffix in ("it\xe9", "it\xe9s") and suffix in r2:
                word = word[:-n]
                step1_success = True
                if word[-4:] == "abil":
                    if "abil" in r2:
                        word = word[:-4]
                    else:
                        word = word[:-2] + "l"
                elif word[-2:] == "ic":
                    if "ic" in r2:
                        word = word[:-2]
                    else:
                        word = word[:-2] + "iqU"
                elif word[-2:] == "iv":
                    if "iv" in r2:
                        word = word[:-2]
            elif suffix in ("if", "ive", "ifs", "ives") and suffix in r2:
                word = word[:-n]
                step1_success = True
                if word[-2:] == "at" and "at" in r2:
                    word = word[:-2]
                    if word[-2:] == "ic":
                        if "ic" in r2:
                            word = word[:-2]
                        else:
                            word = word[:-2] + "iqU"
            break

    # STEP 2a: verb suffixes beginning 'i'
    if not step1_success or rv_ending_found:
        for suffix in _FR_STEP2A:
            if word.endswith(suffix):
                if (suffix in rv and len(rv) > len(suffix)
                        and rv[rv.rindex(suffix) - 1] not in _FR_VOWELS):
                    word = word[:-len(suffix)]
                    step2a_success = True
                break

        # STEP 2b: other verb suffixes (inside the same gate, like the port)
        if not step2a_success:
            for suffix in _FR_STEP2B:
                if rv.endswith(suffix):
                    if suffix == "ions" and "ions" in r2:
                        word = word[:-4]
                        step2b_success = True
                    elif suffix in ("eraIent", "erions", "\xe8rent",
                                    "erais", "erait", "eriez", "erons",
                                    "eront", "erai", "eras", "erez",
                                    "\xe9es", "era", "iez", "\xe9e",
                                    "\xe9s", "er", "ez", "\xe9"):
                        word = word[:-len(suffix)]
                        step2b_success = True
                    elif suffix in ("assions", "assent", "assiez",
                                    "aIent", "antes", "asses", "\xe2mes",
                                    "\xe2tes", "ante", "ants", "asse",
                                    "ais", "ait", "ant", "\xe2t", "ai",
                                    "as", "a"):
                        word = word[:-len(suffix)]
                        rv = rv[:-len(suffix)]
                        step2b_success = True
                        if rv.endswith("e"):
                            word = word[:-1]
                    break

    # STEP 3 / STEP 4
    if step1_success or step2a_success or step2b_success:
        if word[-1] == "Y":
            word = word[:-1] + "i"
        elif word[-1] == "\xe7":
            word = word[:-1] + "c"
    else:
        if len(word) >= 2 and word[-1] == "s" and word[-2] not in "aiou\xe8s":
            word = word[:-1]
        for suffix in _FR_STEP4:
            if word.endswith(suffix):
                if suffix in rv:
                    if suffix == "ion" and suffix in r2 and rv[-4] in "st":
                        word = word[:-3]
                    elif suffix in ("ier", "i\xe8re", "Ier", "I\xe8re"):
                        word = word[:-len(suffix)] + "i"
                    elif suffix == "e":
                        word = word[:-1]
                    elif suffix == "\xeb" and word[-3:-1] == "gu":
                        word = word[:-1]
                    break

    # STEP 5: undouble
    if word.endswith(("enn", "onn", "ett", "ell", "eill")):
        word = word[:-1]

    # STEP 6: un-accent the last vowel (followed by consonants only)
    for i in range(1, len(word)):
        if word[-i] not in _FR_VOWELS:
            continue  # the port's dead `i += 1` — scan continues either way
        if i != 1 and word[-i] in ("\xe9", "\xe8"):
            word = word[:-i] + "e" + word[len(word) - i + 1:]
        break

    return word.replace("I", "i").replace("U", "u").replace("Y", "y")


# --------------------------------------------------------------- hungarian

_HU_VOWELS = "aeiou\xf6\xfc\xe1\xe9\xed\xf3\xf5\xfa\xfb"
_HU_DIGRAPHS = ("cs", "dz", "dzs", "gy", "ly", "ny", "ty", "zs")
_HU_DOUBLES = ("bb", "cc", "ccs", "dd", "ff", "gg", "ggy", "jj", "kk",
               "ll", "lly", "mm", "nn", "nny", "pp", "rr", "ss", "ssz",
               "tt", "tty", "vv", "zz", "zzs")
_HU_STEP2 = ("k\xe9ppen", "onk\xe9nt", "enk\xe9nt", "ank\xe9nt",
             "k\xe9pp", "k\xe9nt", "ban", "ben", "nak", "nek", "val",
             "vel", "t\xf3l", "t\xf5l", "r\xf3l", "r\xf5l", "b\xf3l",
             "b\xf5l", "hoz", "hez", "h\xf6z", "n\xe1l", "n\xe9l",
             "\xe9rt", "kor", "ba", "be", "ra", "re", "ig", "at", "et",
             "ot", "\xf6t", "ul", "\xfcl", "v\xe1", "v\xe9", "en", "on",
             "an", "\xf6n", "n", "t")
_HU_STEP3 = ("\xe1nk\xe9nt", "\xe1n", "\xe9n")
_HU_STEP4 = ("astul", "est\xfcl", "\xe1stul", "\xe9st\xfcl", "stul", "st\xfcl")
_HU_STEP6 = ("ok\xe9", "\xf6k\xe9", "ak\xe9", "ek\xe9", "\xe1k\xe9",
             "\xe1\xe9i", "\xe9k\xe9", "\xe9\xe9i", "k\xe9", "\xe9i",
             "\xe9\xe9", "\xe9")
_HU_STEP7 = ("\xe1juk", "\xe9j\xfck", "\xfcnk", "unk", "juk", "j\xfck",
             "\xe1nk", "\xe9nk", "nk", "uk", "\xfck", "em", "om", "am",
             "od", "ed", "ad", "\xf6d", "ja", "je", "\xe1m", "\xe1d",
             "\xe9m", "\xe9d", "m", "d", "a", "e", "o", "\xe1", "\xe9")
_HU_STEP8 = ("jaitok", "jeitek", "jaink", "jeink", "aitok", "eitek",
             "\xe1itok", "\xe9itek", "jaim", "jeim", "jaid", "jeid",
             "eink", "aink", "itek", "jeik", "jaik", "\xe1ink",
             "\xe9ink", "aim", "eim", "aid", "eid", "jai", "jei",
             "ink", "aik", "eik", "\xe1im", "\xe1id", "\xe1ik",
             "\xe9im", "\xe9id", "\xe9ik", "im", "id", "ai", "ei",
             "ik", "\xe1i", "\xe9i", "i")
_HU_STEP9 = ("\xe1k", "\xe9k", "\xf6k", "ok", "ek", "ak", "k")


def _r1_hungarian(word: str) -> str:
    """Hungarian R1 (reference hungarian.py:227-268) — QUIRK KEPT: when the
    word starts with a vowel and contains a digraph, R1 is taken after the
    first occurrence of the digraph's LAST LETTER anywhere in the word
    (word.index over a single char), not after the digraph itself."""
    if word[0] in _HU_VOWELS:
        for digraph in _HU_DIGRAPHS:
            if digraph in word[1:]:
                return word[word.index(digraph[-1]) + 1:]
        for i in range(1, len(word)):
            if word[i] not in _HU_VOWELS:
                return word[i + 1:]
    else:
        for i in range(1, len(word)):
            if word[i] in _HU_VOWELS:
                return word[i + 1:]
    return ""


@_lru_cache(maxsize=65536)
def stem_hu(word: str) -> str:
    word = word.lower()
    r1 = _r1_hungarian(word)

    # STEP 1: instrumental case (undouble before the al/el suffix;
    # replacement slices are fixed at [-4]/[-3] regardless of digraph size)
    if r1.endswith(("al", "el")):
        for dc in _HU_DOUBLES:
            if word[-2 - len(dc):-2] == dc:
                word = word[:-4] + word[-3]
                if r1[-2 - len(dc):-2] == dc:
                    r1 = r1[:-4] + r1[-3]
                break

    # STEP 2: frequent cases
    for suffix in _HU_STEP2:
        if word.endswith(suffix):
            if r1.endswith(suffix):
                word = word[:-len(suffix)]
                r1 = r1[:-len(suffix)]
                if r1.endswith("\xe1"):
                    word = word[:-1] + "a"
                    r1 = r1[:-1] + "a"
                elif r1.endswith("\xe9"):
                    word = word[:-1] + "e"
                    r1 = r1[:-1] + "e"
            break

    # STEP 3: special cases
    for suffix in _HU_STEP3:
        if r1.endswith(suffix):
            if suffix == "\xe9n":
                word = word[:-2] + "e"
                r1 = r1[:-2] + "e"
            else:
                word = word[:-len(suffix)] + "a"
                r1 = r1[:-len(suffix)] + "a"
            break

    # STEP 4: other cases
    for suffix in _HU_STEP4:
        if r1.endswith(suffix):
            if suffix == "\xe1stul":
                word = word[:-5] + "a"
                r1 = r1[:-5] + "a"
            elif suffix == "\xe9st\xfcl":
                word = word[:-5] + "e"
                r1 = r1[:-5] + "e"
            else:
                word = word[:-len(suffix)]
                r1 = r1[:-len(suffix)]
            break

    # STEP 5: factive case (undouble before final accent)
    for suffix in ("\xe1", "\xe9"):
        if r1.endswith(suffix):
            for dc in _HU_DOUBLES:
                if word[-1 - len(dc):-1] == dc:
                    word = word[:-3] + word[-2]
                    if r1[-1 - len(dc):-1] == dc:
                        r1 = r1[:-3] + r1[-2]
                    break

    # STEP 6: owned
    for suffix in _HU_STEP6:
        if r1.endswith(suffix):
            if suffix in ("\xe1k\xe9", "\xe1\xe9i"):
                word = word[:-3] + "a"
                r1 = r1[:-3] + "a"
            elif suffix in ("\xe9k\xe9", "\xe9\xe9i", "\xe9\xe9"):
                word = word[:-len(suffix)] + "e"
                r1 = r1[:-len(suffix)] + "e"
            else:
                word = word[:-len(suffix)]
                r1 = r1[:-len(suffix)]
            break

    # STEP 7: singular owner suffixes
    for suffix in _HU_STEP7:
        if word.endswith(suffix):
            if r1.endswith(suffix):
                if suffix in ("\xe1nk", "\xe1juk", "\xe1m", "\xe1d", "\xe1"):
                    word = word[:-len(suffix)] + "a"
                    r1 = r1[:-len(suffix)] + "a"
                elif suffix in ("\xe9nk", "\xe9j\xfck", "\xe9m", "\xe9d", "\xe9"):
                    word = word[:-len(suffix)] + "e"
                    r1 = r1[:-len(suffix)] + "e"
                else:
                    word = word[:-len(suffix)]
                    r1 = r1[:-len(suffix)]
            break

    # STEP 8: plural owner suffixes
    for suffix in _HU_STEP8:
        if word.endswith(suffix):
            if r1.endswith(suffix):
                if suffix in ("\xe1im", "\xe1id", "\xe1i", "\xe1ink",
                              "\xe1itok", "\xe1ik"):
                    word = word[:-len(suffix)] + "a"
                    r1 = r1[:-len(suffix)] + "a"
                elif suffix in ("\xe9im", "\xe9id", "\xe9i", "\xe9ink",
                                "\xe9itek", "\xe9ik"):
                    word = word[:-len(suffix)] + "e"
                    r1 = r1[:-len(suffix)] + "e"
                else:
                    word = word[:-len(suffix)]
                    r1 = r1[:-len(suffix)]
            break

    # STEP 9: plural suffixes
    for suffix in _HU_STEP9:
        if word.endswith(suffix):
            if r1.endswith(suffix):
                if suffix == "\xe1k":
                    word = word[:-2] + "a"
                elif suffix == "\xe9k":
                    word = word[:-2] + "e"
                else:
                    word = word[:-len(suffix)]
            break

    return word


# ---------------------------------------------------------------- russian

_RU_PERF_GERUND = ("ivshis'", "yvshis'", "vshis'", "ivshi", "yvshi",
                   "vshi", "iv", "yv", "v")
_RU_REFLEXIVE = ("si^a", "s'")
_RU_SUPERLATIVE = ("ei`she", "ei`sh")
_RU_DERIVATIONAL = ("ost'", "ost")


def _ru_expand(stems, endings):
    return tuple(s + e for s in stems for e in endings)


# the adjectival table is the cross product the reference spells out
# longhand (russian.py:30-100): participle stems x adjective endings, plus
# the bare adjective endings — kept in the reference's traversal ORDER by
# sorting longest-first like its literal listing
_RU_ADJ_ENDINGS = ("i^ui^u", "i^ai^a", "imi", "ymi", "ego", "ogo", "emu",
                   "omu", "ikh", "ykh", "ui^u", "ai^a", "oi^u", "ei^u",
                   "ee", "ie", "ye", "oe", "ei`", "ii`", "yi`", "oi`",
                   "em", "im", "ym", "om")
_RU_PART_STEMS = ("ui^ushch", "i^ushch", "shch", "ivsh", "yvsh", "vsh",
                  "em", "nn")
_RU_ADJECTIVAL = tuple(sorted(
    _ru_expand(_RU_PART_STEMS, _RU_ADJ_ENDINGS) + _RU_ADJ_ENDINGS,
    key=len, reverse=True,
))
# the subset whose removal needs a preceding a / i^a (the reference's giant
# literal list = every suffix built on the glide-less participle stems)
_RU_ADJ_NEEDS_A = frozenset(
    _ru_expand(("i^ushch", "shch", "vsh", "em", "nn"), _RU_ADJ_ENDINGS)
)
_RU_VERB = ("esh'", "ei`te", "ui`te", "ui^ut", "ish'", "ete", "i`te",
            "i^ut", "nno", "ila", "yla", "ena", "ite", "ili", "yli",
            "ilo", "ylo", "eno", "i^at", "uet", "eny", "it'", "yt'",
            "ui^u", "la", "na", "li", "em", "lo", "no", "et", "ny",
            "t'", "ei`", "ui`", "il", "yl", "im", "ym", "en", "it",
            "yt", "i^u", "i`", "l", "n")
_RU_VERB_NEEDS_A = frozenset(("la", "na", "ete", "i`te", "li", "i`", "l",
                              "em", "n", "lo", "no", "et", "i^ut", "ny",
                              "t'", "esh'", "nno"))
_RU_NOUN = ("ii^ami", "ii^akh", "i^ami", "ii^am", "i^akh", "ami",
            "iei`", "i^am", "iem", "akh", "ii^u", "'i^u", "ii^a",
            "'i^a", "ev", "ov", "ie", "'e", "ei", "ii", "ei`", "oi`",
            "ii`", "em", "am", "om", "i^u", "i^a", "a", "e", "i",
            "i`", "o", "u", "y", "'")

_RU_TO_ROMAN = [
    ("А", "a"), ("а", "a"), ("Б", "b"), ("б", "b"),
    ("В", "v"), ("в", "v"), ("Г", "g"), ("г", "g"),
    ("Д", "d"), ("д", "d"), ("Е", "e"), ("е", "e"),
    ("Ё", "e"), ("ё", "e"), ("Ж", "zh"), ("ж", "zh"),
    ("З", "z"), ("з", "z"), ("И", "i"), ("и", "i"),
    ("Й", "i`"), ("й", "i`"), ("К", "k"), ("к", "k"),
    ("Л", "l"), ("л", "l"), ("М", "m"), ("м", "m"),
    ("Н", "n"), ("н", "n"), ("О", "o"), ("о", "o"),
    ("П", "p"), ("п", "p"), ("Р", "r"), ("р", "r"),
    ("С", "s"), ("с", "s"), ("Т", "t"), ("т", "t"),
    ("У", "u"), ("у", "u"), ("Ф", "f"), ("ф", "f"),
    ("Х", "kh"), ("х", "kh"), ("Ц", "t^s"), ("ц", "t^s"),
    ("Ч", "ch"), ("ч", "ch"), ("Ш", "sh"), ("ш", "sh"),
    ("Щ", "shch"), ("щ", "shch"), ("Ъ", "''"), ("ъ", "''"),
    ("Ы", "y"), ("ы", "y"), ("Ь", "'"), ("ь", "'"),
    ("Э", "e`"), ("э", "e`"), ("Ю", "i^u"), ("ю", "i^u"),
    ("Я", "i^a"), ("я", "i^a"),
]
# the reference's roman->cyrillic replace ORDER matters (multi-char tokens
# first); kept verbatim (russian.py:393-421)
_RU_TO_CYRILLIC = [
    ("i^u", "ю"), ("i^a", "я"), ("shch", "щ"),
    ("kh", "х"), ("t^s", "ц"), ("ch", "ч"),
    ("e`", "э"), ("i`", "й"), ("sh", "ш"), ("k", "к"),
    ("e", "е"), ("zh", "ж"), ("a", "а"), ("b", "б"),
    ("v", "в"), ("g", "г"), ("d", "д"), ("e", "е"),
    ("z", "з"), ("i", "и"), ("l", "л"), ("m", "м"),
    ("n", "н"), ("o", "о"), ("p", "п"), ("r", "р"),
    ("s", "с"), ("t", "т"), ("u", "у"), ("f", "ф"),
    ("''", "ъ"), ("y", "ы"), ("'", "ь"),
]


def _ru_regions(word: str) -> tuple[str, str]:
    """RV and R2 (reference russian.py:306-336): glides i^a/i^u/e` collapse
    to single uppercase markers while scanning, then re-expand."""
    vowels = ("A", "U", "E", "a", "e", "i", "o", "u", "y")
    w = word.replace("i^a", "A").replace("i^u", "U").replace("e`", "E")
    r1 = r2 = rv = ""
    for i in range(1, len(w)):
        if w[i] not in vowels and w[i - 1] in vowels:
            r1 = w[i + 1:]
            break
    for i in range(1, len(r1)):
        if r1[i] not in vowels and r1[i - 1] in vowels:
            r2 = r1[i + 1:]
            break
    for i in range(len(w)):
        if w[i] in vowels:
            rv = w[i + 1:]
            break
    r2 = r2.replace("A", "i^a").replace("U", "i^u").replace("E", "e`")
    rv = rv.replace("A", "i^a").replace("U", "i^u").replace("E", "e`")
    return rv, r2


@_lru_cache(maxsize=65536)
def stem_ru(word: str) -> str:
    cyrillic = any(ord(ch) > 255 for ch in word)
    if cyrillic:
        for a, b in _RU_TO_ROMAN:
            word = word.replace(a, b)
    step1_success = False
    adjectival_removed = False
    verb_removed = False
    undouble_success = False
    superlative_removed = False
    rv, r2 = _ru_regions(word)

    # STEP 1
    for suffix in _RU_PERF_GERUND:
        if rv.endswith(suffix):
            n = len(suffix)
            if suffix in ("v", "vshi", "vshis'"):
                if rv[-n - 3:-n] == "i^a" or rv[-n - 1:-n] == "a":
                    word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                    step1_success = True
                    break
            else:
                word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                step1_success = True
                break

    if not step1_success:
        for suffix in _RU_REFLEXIVE:
            if rv.endswith(suffix):
                n = len(suffix)
                word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                break
        for suffix in _RU_ADJECTIVAL:
            if rv.endswith(suffix):
                n = len(suffix)
                if suffix in _RU_ADJ_NEEDS_A:
                    if rv[-n - 3:-n] == "i^a" or rv[-n - 1:-n] == "a":
                        word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                        adjectival_removed = True
                        break
                else:
                    word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                    adjectival_removed = True
                    break
        if not adjectival_removed:
            for suffix in _RU_VERB:
                if rv.endswith(suffix):
                    n = len(suffix)
                    if suffix in _RU_VERB_NEEDS_A:
                        if rv[-n - 3:-n] == "i^a" or rv[-n - 1:-n] == "a":
                            word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                            verb_removed = True
                            break
                    else:
                        word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                        verb_removed = True
                        break
        if not adjectival_removed and not verb_removed:
            for suffix in _RU_NOUN:
                if rv.endswith(suffix):
                    n = len(suffix)
                    word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                    break

    # STEP 2
    if rv.endswith("i"):
        word, r2 = word[:-1], r2[:-1]

    # STEP 3
    for suffix in _RU_DERIVATIONAL:
        if r2.endswith(suffix):
            word = word[:-len(suffix)]
            break

    # STEP 4
    if word.endswith("nn"):
        word = word[:-1]
        undouble_success = True
    if not undouble_success:
        for suffix in _RU_SUPERLATIVE:
            if word.endswith(suffix):
                word = word[:-len(suffix)]
                superlative_removed = True
                break
        if word.endswith("nn"):
            word = word[:-1]
    if not undouble_success and not superlative_removed:
        if word.endswith("'"):
            word = word[:-1]

    if cyrillic:
        for a, b in _RU_TO_CYRILLIC:
            word = word.replace(a, b)
    return word


# ---------------------------------------------------------------- english

_EN_VOWELS = "aeiouy"
_EN_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_EN_LI_ENDING = "cdeghkmnrt"
_EN_STEP0 = ("'s'", "'s", "'")
_EN_STEP1A = ("sses", "ied", "ies", "us", "ss", "s")
_EN_STEP1B = ("eedly", "ingly", "edly", "eed", "ing", "ed")
_EN_STEP2 = ("ization", "ational", "fulness", "ousness", "iveness",
             "tional", "biliti", "lessli", "entli", "ation", "alism",
             "aliti", "ousli", "iviti", "fulli", "enci", "anci", "abli",
             "izer", "ator", "alli", "bli", "ogi", "li")
_EN_STEP3 = ("ational", "tional", "alize", "icate", "iciti", "ative",
             "ical", "ness", "ful")
_EN_STEP4 = ("ement", "ance", "ence", "able", "ible", "ment", "ant",
             "ent", "ism", "ate", "iti", "ous", "ive", "ize", "ion",
             "al", "er", "ic")
_EN_SPECIAL = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl", "sky": "sky",
    "news": "news", "howe": "howe", "atlas": "atlas", "cosmos": "cosmos",
    "bias": "bias", "andes": "andes", "inning": "inning",
    "innings": "inning", "outing": "outing", "outings": "outing",
    "canning": "canning", "cannings": "canning", "herring": "herring",
    "herrings": "herring", "earring": "earring", "earrings": "earring",
    "proceed": "proceed", "proceeds": "proceed", "proceeded": "proceed",
    "proceeding": "proceed", "exceed": "exceed", "exceeds": "exceed",
    "exceeded": "exceed", "exceeding": "exceed", "succeed": "succeed",
    "succeeds": "succeed", "succeeded": "succeed",
    "succeeding": "succeed",
}


def _en_replace(word, r1, r2, n, repl, r2_default=""):
    """Strip an n-char suffix and append ``repl`` to word/r1/r2, with the
    reference port's short-region fallbacks (english.py:283-381: r1 falls
    to "" while r2 falls to ``r2_default`` — "" or "e" depending on the
    branch)."""
    word = word[:-n] + repl
    r1 = (r1[:-n] + repl) if len(r1) >= n else ""
    r2 = (r2[:-n] + repl) if len(r2) >= n else r2_default
    return word, r1, r2


@_lru_cache(maxsize=65536)
def stem_en(word: str) -> str:
    """English Snowball ("porter2") stemmer — behavior-identical to the
    reference EnglishStemmer (lang/snowball/english.py:6-465), incl. the
    gener/commun/arsen R1 exception, the y/Y consonant marking, and the
    port's asymmetric r2 fallbacks ("" vs "e") in steps 1b/2."""
    word = word.lower()
    if word in _EN_SPECIAL:
        return _EN_SPECIAL[word]
    word = (word.replace("\u2019", "'").replace("\u2018", "'")
                .replace("\u201b", "'"))
    if word.startswith("'"):
        word = word[1:]
    if word.startswith("y"):
        word = "Y" + word[1:]
    for i in range(1, len(word)):
        if word[i - 1] in _EN_VOWELS and word[i] == "y":
            word = word[:i] + "Y" + word[i + 1:]

    if word.startswith(("gener", "commun", "arsen")):
        r1 = word[5:] if word.startswith(("gener", "arsen")) else word[6:]
        r2 = ""
        for i in range(1, len(r1)):
            if r1[i] not in _EN_VOWELS and r1[i - 1] in _EN_VOWELS:
                r2 = r1[i + 1:]
                break
    else:
        r1, r2 = _r1r2_standard(word, _EN_VOWELS)

    # STEP 0
    for suffix in _EN_STEP0:
        if word.endswith(suffix):
            word = word[:-len(suffix)]
            r1 = r1[:-len(suffix)]
            r2 = r2[:-len(suffix)]
            break

    # STEP 1a
    for suffix in _EN_STEP1A:
        if word.endswith(suffix):
            if suffix == "sses":
                word, r1, r2 = word[:-2], r1[:-2], r2[:-2]
            elif suffix in ("ied", "ies"):
                cut = 2 if len(word[:-len(suffix)]) > 1 else 1
                word, r1, r2 = word[:-cut], r1[:-cut], r2[:-cut]
            elif suffix == "s":
                if any(ch in _EN_VOWELS for ch in word[:-2]):
                    word, r1, r2 = word[:-1], r1[:-1], r2[:-1]
            break

    # STEP 1b
    for suffix in _EN_STEP1B:
        if word.endswith(suffix):
            if suffix in ("eed", "eedly"):
                if r1.endswith(suffix):
                    word = word[:-len(suffix)] + "ee"
                    r1 = (r1[:-len(suffix)] + "ee") if len(r1) >= len(suffix) else ""
                    r2 = (r2[:-len(suffix)] + "ee") if len(r2) >= len(suffix) else ""
            else:
                if any(ch in _EN_VOWELS for ch in word[:-len(suffix)]):
                    word = word[:-len(suffix)]
                    r1 = r1[:-len(suffix)]
                    r2 = r2[:-len(suffix)]
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                        r1 += "e"
                        if len(word) > 5 or len(r1) >= 3:
                            r2 += "e"
                    elif word.endswith(_EN_DOUBLES):
                        word, r1, r2 = word[:-1], r1[:-1], r2[:-1]
                    elif ((r1 == "" and len(word) >= 3
                           and word[-1] not in _EN_VOWELS
                           and word[-1] not in "wxY"
                           and word[-2] in _EN_VOWELS
                           and word[-3] not in _EN_VOWELS)
                          or (r1 == "" and len(word) == 2
                              and word[0] in _EN_VOWELS
                              and word[1] not in _EN_VOWELS)):
                        word += "e"
                        if len(r1) > 0:
                            r1 += "e"
                        if len(r2) > 0:
                            r2 += "e"
            break

    # STEP 1c
    if len(word) > 2 and word[-1] in "yY" and word[-2] not in _EN_VOWELS:
        word = word[:-1] + "i"
        r1 = (r1[:-1] + "i") if len(r1) >= 1 else ""
        r2 = (r2[:-1] + "i") if len(r2) >= 1 else ""

    # STEP 2
    for suffix in _EN_STEP2:
        if word.endswith(suffix):
            if r1.endswith(suffix):
                n = len(suffix)
                if suffix == "tional":
                    word, r1, r2 = word[:-2], r1[:-2], r2[:-2]
                elif suffix in ("enci", "anci", "abli"):
                    word, r1, r2 = _en_replace(word, r1, r2, 1, "e")
                elif suffix == "entli":
                    word, r1, r2 = word[:-2], r1[:-2], r2[:-2]
                elif suffix in ("izer", "ization"):
                    word, r1, r2 = _en_replace(word, r1, r2, n, "ize")
                elif suffix in ("ational", "ation", "ator"):
                    word, r1, r2 = _en_replace(word, r1, r2, n, "ate",
                                               r2_default="e")
                elif suffix in ("alism", "aliti", "alli"):
                    word, r1, r2 = _en_replace(word, r1, r2, n, "al")
                elif suffix == "fulness":
                    word, r1, r2 = word[:-4], r1[:-4], r2[:-4]
                elif suffix in ("ousli", "ousness"):
                    word, r1, r2 = _en_replace(word, r1, r2, n, "ous")
                elif suffix in ("iveness", "iviti"):
                    word, r1, r2 = _en_replace(word, r1, r2, n, "ive",
                                               r2_default="e")
                elif suffix in ("biliti", "bli"):
                    word, r1, r2 = _en_replace(word, r1, r2, n, "ble")
                elif suffix == "ogi" and word[-4] == "l":
                    word, r1, r2 = word[:-1], r1[:-1], r2[:-1]
                elif suffix in ("fulli", "lessli"):
                    word, r1, r2 = word[:-2], r1[:-2], r2[:-2]
                elif suffix == "li" and word[-3] in _EN_LI_ENDING:
                    word, r1, r2 = word[:-2], r1[:-2], r2[:-2]
            break

    # STEP 3
    for suffix in _EN_STEP3:
        if word.endswith(suffix):
            if r1.endswith(suffix):
                n = len(suffix)
                if suffix == "tional":
                    word, r1, r2 = word[:-2], r1[:-2], r2[:-2]
                elif suffix == "ational":
                    word, r1, r2 = _en_replace(word, r1, r2, n, "ate")
                elif suffix == "alize":
                    word, r1, r2 = word[:-3], r1[:-3], r2[:-3]
                elif suffix in ("icate", "iciti", "ical"):
                    word, r1, r2 = _en_replace(word, r1, r2, n, "ic")
                elif suffix in ("ful", "ness"):
                    word, r1, r2 = word[:-n], r1[:-n], r2[:-n]
                elif suffix == "ative" and r2.endswith(suffix):
                    word, r1, r2 = word[:-5], r1[:-5], r2[:-5]
            break

    # STEP 4
    for suffix in _EN_STEP4:
        if word.endswith(suffix):
            if r2.endswith(suffix):
                if suffix == "ion":
                    if word[-4] in "st":
                        word, r1, r2 = word[:-3], r1[:-3], r2[:-3]
                else:
                    n = len(suffix)
                    word, r1, r2 = word[:-n], r1[:-n], r2[:-n]
            break

    # STEP 5
    if r2.endswith("l") and word[-2] == "l":
        word = word[:-1]
    elif r2.endswith("e"):
        word = word[:-1]
    elif r1.endswith("e"):
        if len(word) >= 4 and (word[-2] in _EN_VOWELS
                               or word[-2] in "wxY"
                               or word[-3] not in _EN_VOWELS
                               or word[-4] in _EN_VOWELS):
            word = word[:-1]

    return word.replace("Y", "y")


STEMMERS = {"da": stem_da, "no": stem_no, "sv": stem_sv, "de": stem_de,
            "es": stem_es, "nl": stem_nl, "it": stem_it, "pt": stem_pt,
            "ro": stem_ro, "fi": stem_fi, "fr": stem_fr, "hu": stem_hu,
            "ru": stem_ru, "en": stem_en}


def stemmer_for(lang: str):
    """Stem function for an ISO language code (the reference's
    whoosh.lang.stemmer_for_language — every language the reference
    bundles is covered); raises KeyError for unknown codes.

    Every stem_xx is LRU-memoized at definition (64k entries, like
    porter_stem in morph.py): build kernels call it once per token
    OCCURRENCE and the heavier stemmers (Russian does a transliteration
    round-trip) dominate non-English build cost without a memo. The
    reference LRU-caches its StemFilter for the same reason
    (src/whoosh/analysis/morph.py:35-56). Decorating the module attribute
    (rather than wrapping here) keeps the function picklable by reference,
    so each executor Python worker gets its own process-local memo."""
    return STEMMERS[lang]


def pystemmer_for(lang_name: str):
    """The reference PyStemmerFilter's backend (analysis/morph.py:152-216):
    the C PyStemmer library when installed, else our bundled pure-Python
    stemmer for the same language (capability-gated — this container has
    no PyStemmer, and the bundled algorithms are the same published
    Snowball definitions)."""
    try:
        import Stemmer  # the PyStemmer C extension

        return Stemmer.Stemmer(lang_name).stemWord
    except ImportError:
        by_name = {"danish": "da", "norwegian": "no", "swedish": "sv",
                   "german": "de", "spanish": "es", "dutch": "nl",
                   "italian": "it", "portuguese": "pt", "romanian": "ro",
                   "finnish": "fi", "french": "fr", "hungarian": "hu",
                   "russian": "ru", "english": "en"}
        code = by_name.get(lang_name, lang_name)
        if code in STEMMERS:
            return STEMMERS[code]
        raise
