"""Lovins stemmer (J.B. Lovins 1968) — parity with the reference's
``whoosh.lang.lovins`` module (/root/reference/src/whoosh/lang/lovins.py).

The 294 ``ending:condition`` pairs and 35 recoding rules are the published
Lovins algorithm's data (same tables as the reference and NLTK's Lovins
implementations); the evaluation engine here is an independent
re-expression (flat longest-first table + single condition dispatch vs the
reference's 27 module-level predicate functions and per-length dicts).

Reference quirks kept (diff-tested in tests/test_lovins.py):
- condition S reads ``base[-2]`` (one char) and compares it to ``"rd"`` —
  always False — so S degenerates to "ends with t, not tt"; replicated.
- conditions K and X index ``base[-3]`` which CRASHES the reference
  (IndexError) on 2-char bases, e.g. ``stem("near")``; we implement the
  documented "u*e" check safely (False when the base is too short) and a
  test asserts the reference bug.
"""

from __future__ import annotations

# "ending:condition" — longest-first (the engine scans lengths 11..1)
_ENDING_DATA = (
    "alistically:B", "arizability:A", "izationally:B", "antialness:A",
    "arisations:A", "arizations:A", "entialness:A", "allically:C",
    "antaneous:A", "antiality:A", "arisation:A", "arization:A",
    "ationally:B", "ativeness:A", "eableness:E", "entations:A",
    "entiality:A", "entialize:A", "entiation:A", "ionalness:A",
    "istically:A", "itousness:A", "izability:A", "izational:A",
    "ableness:A", "arizable:A", "entation:A", "entially:A",
    "eousness:A", "ibleness:A", "icalness:A", "ionalism:A",
    "ionality:A", "ionalize:A", "iousness:A", "izations:A",
    "lessness:A", "ability:A", "aically:A", "alistic:B",
    "alities:A", "ariness:E", "aristic:A", "arizing:A",
    "ateness:A", "atingly:A", "ational:B", "atively:A",
    "ativism:A", "elihood:E", "encible:A", "entally:A",
    "entials:A", "entiate:A", "entness:A", "fulness:A",
    "ibility:A", "icalism:A", "icalist:A", "icality:A",
    "icalize:A", "ication:G", "icianry:A", "ination:A",
    "ingness:A", "ionally:A", "isation:A", "ishness:A",
    "istical:A", "iteness:A", "iveness:A", "ivistic:A",
    "ivities:A", "ization:F", "izement:A", "oidally:A",
    "ousness:A", "aceous:A", "acious:B", "action:G",
    "alness:A", "ancial:A", "ancies:A", "ancing:B",
    "ariser:A", "arized:A", "arizer:A", "atable:A",
    "ations:B", "atives:A", "eature:Z", "efully:A",
    "encies:A", "encing:A", "ential:A", "enting:C",
    "entist:A", "eously:A", "ialist:A", "iality:A",
    "ialize:A", "ically:A", "icance:A", "icians:A",
    "icists:A", "ifully:A", "ionals:A", "ionate:D",
    "ioning:A", "ionist:A", "iously:A", "istics:A",
    "izable:E", "lessly:A", "nesses:A", "oidism:A",
    "acies:A", "acity:A", "aging:B", "aical:A",
    "alism:B", "alist:A", "ality:A", "alize:A",
    "allic:b", "anced:B", "ances:B", "antic:C",
    "arial:A", "aries:A", "arily:A", "arity:B",
    "arize:A", "aroid:A", "ately:A", "ating:I",
    "ation:B", "ative:A", "ators:A", "atory:A",
    "ature:E", "early:Y", "ehood:A", "eless:A",
    "elily:A", "ement:A", "enced:A", "ences:A",
    "eness:E", "ening:E", "ental:A", "ented:C",
    "ently:A", "fully:A", "ially:A", "icant:A",
    "ician:A", "icide:A", "icism:A", "icist:A",
    "icity:A", "idine:I", "iedly:A", "ihood:A",
    "inate:A", "iness:A", "ingly:B", "inism:J",
    "inity:c", "ional:A", "ioned:A", "ished:A",
    "istic:A", "ities:A", "itous:A", "ively:A",
    "ivity:A", "izers:F", "izing:F", "oidal:A",
    "oides:A", "otide:A", "ously:A", "able:A",
    "ably:A", "ages:B", "ally:B", "ance:B",
    "ancy:B", "ants:B", "aric:A", "arly:K",
    "ated:I", "ates:A", "atic:B", "ator:A",
    "ealy:Y", "edly:E", "eful:A", "eity:A",
    "ence:A", "ency:A", "ened:E", "enly:E",
    "eous:A", "hood:A", "ials:A", "ians:A",
    "ible:A", "ibly:A", "ical:A", "ides:L",
    "iers:A", "iful:A", "ines:M", "ings:N",
    "ions:B", "ious:A", "isms:B", "ists:A",
    "itic:H", "ized:F", "izer:F", "less:A",
    "lily:A", "ness:A", "ogen:A", "ward:A",
    "wise:A", "ying:B", "yish:A", "acy:A",
    "age:B", "aic:A", "als:b", "ant:B",
    "ars:O", "ary:F", "ata:A", "ate:A",
    "eal:Y", "ear:Y", "ely:E", "ene:E",
    "ent:C", "ery:E", "ese:A", "ful:A",
    "ial:A", "ian:A", "ics:A", "ide:L",
    "ied:A", "ier:A", "ies:P", "ily:A",
    "ine:M", "ing:N", "ion:Q", "ish:C",
    "ism:B", "ist:A", "ite:a", "ity:A",
    "ium:A", "ive:A", "ize:F", "oid:A",
    "one:R", "ous:A", "'s:A", "ae:A",
    "al:b", "ar:X", "as:B", "ed:E",
    "en:F", "es:E", "ia:A", "ic:A",
    "is:A", "ly:B", "on:S", "or:T",
    "s':A", "um:U", "us:V", "yl:R",
    "a:A", "e:A", "i:A", "o:A",
    "s:W", "y:B",
)

_DOUBLES = frozenset(("dd", "gg", "ll", "mm", "nn", "pp", "rr", "ss", "tt"))

# recoding rules: (target, replacement[, forbidden-preceding-chars])
_RECODE = (
    ("iev", "ief"), ("uct", "uc"), ("umpt", "um"), ("rpt", "rb"),
    ("urs", "ur"), ("istr", "ister"), ("metr", "meter"), ("olv", "olut"),
    ("ul", "l", "aoi"), ("bex", "bic"), ("dex", "dic"), ("pex", "pic"),
    ("tex", "tic"), ("ax", "ac"), ("ex", "ec"), ("ix", "ic"),
    ("lux", "luc"), ("uad", "uas"), ("vad", "vas"), ("cid", "cis"),
    ("lid", "lis"), ("erid", "eris"), ("pand", "pans"), ("end", "ens", "s"),
    ("ond", "ons"), ("lud", "lus"), ("rud", "rus"), ("her", "hes", "pt"),
    ("mit", "mis"), ("ent", "ens", "m"), ("ert", "ers"), ("et", "es", "n"),
    ("yt", "ys"), ("yz", "ys"),
)


def _cond(code: str, base: str) -> bool:
    """Dispatch one Lovins context condition against the candidate base."""
    n = len(base)
    c = base[-1]
    if code == "A":
        return True
    if code == "B":
        return n > 2
    if code == "C":
        return n > 3
    if code == "D":
        return n > 4
    if code == "E":
        return c != "e"
    if code == "F":
        return n > 2 and c != "e"
    if code == "G":
        return n > 2 and c == "f"
    if code == "H":
        return c == "t" or (c == "l" and base[-2] == "l")
    if code == "I":
        return c not in "oe"
    if code == "J":
        return c not in "ae"
    if code == "K":  # safe u*e check (reference IndexErrors on short bases)
        return n > 2 and (c in "li" or (c == "e" and n >= 3 and base[-3] == "u"))
    if code == "L":
        return c not in "ux" and (c != "s" or base[-2] == "o")
    if code == "M":
        return c not in "acem"
    if code == "N":
        return n > 3 or (n == 3 and c != "s")
    if code == "O":
        return c in "li"
    if code == "P":
        return c != "c"
    if code == "Q":
        return n > 2 and c not in "ln"
    if code == "R":
        return c in "nr"
    if code == "S":  # reference parity: the dr arm is dead code (see module doc)
        return c == "t" and base[-2] != "t"
    if code == "T":
        return c == "s" or (c == "t" and base[-2] != "o")
    if code == "U":
        return c in "lmnr"
    if code == "V":
        return c == "c"
    if code == "W":
        return c not in "su"
    if code == "X":  # safe u*e check (reference IndexErrors on short bases)
        return c in "li" or (c == "e" and len(base) >= 3 and base[-3] == "u")
    if code == "Y":
        return base[-2:] == "in"
    if code == "Z":
        return c != "f"
    if code == "a":
        return (c in "dflt" or base[-2:] in ("ph", "th", "er", "or", "es"))
    if code == "b":
        return n > 2 and not (base.endswith("met") or base.endswith("ryst"))
    if code == "c":
        return c == "l"
    raise ValueError(code)


_BY_LEN: dict[int, dict[str, str]] = {}
for _entry in _ENDING_DATA:
    _e, _c = _entry.split(":")
    _BY_LEN.setdefault(len(_e), {})[_e] = _c


def remove_ending(word: str) -> str:
    n = len(word)
    for el in range(11, 0, -1):
        if n - el > 1:
            cond = _BY_LEN.get(el, {}).get(word[n - el:])
            if cond and _cond(cond, word[: n - el]):
                return word[: n - el]
    return word


_RECODE_BY_LAST: dict[str, list] = {}
for _r in _RECODE:
    _RECODE_BY_LAST.setdefault(_r[0][-1], []).append(_r)


def fix_ending(word: str) -> str:
    if word[-2:] in _DOUBLES:
        word = word[:-1]
    for rule in _RECODE_BY_LAST.get(word[-1], ()):
        target, repl = rule[:2]
        if word.endswith(target):
            if len(rule) > 2 and word[-(len(target) + 1)] in rule[2]:
                return word
            return word[: -len(target)] + repl
    return word


def stem(word: str) -> str:
    """Lovins stem of ``word`` (lowercase ASCII expected, like the
    reference)."""
    return fix_ending(remove_ending(word))
