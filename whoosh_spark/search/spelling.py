"""Spelling suggestions + "did you mean" query correction.

Reference behavior (/root/reference/src/whoosh/spelling.py:41-118,
verified empirically): candidates are lexicon terms within ``maxdist``
(optionally sharing a ``prefix``); ranked by term frequency descending,
then term ascending — the actual edit distance does NOT affect rank within
the radius (the reference scores every candidate with the constant maxdist
plus 0.5/frequency), and the query word itself is a valid suggestion.

The reference intersects a Levenshtein DFA with the term dictionary
(automata/lev.py); over a distinct-terms DataFrame the built-in
``levenshtein`` + prefix pushdown is the idiomatic equivalent.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from whoosh_spark.index.catalog import Index


def suggest(ix: Index, field: str, text: str, limit: int = 5,
            maxdist: int = 2, prefix: int = 0) -> list[str]:
    # spelling=True morphic fields keep original word forms in a separate
    # spell_<name> lexicon (reference fields.py spelling_fieldname).
    # ReaderCorrector (reference spelling.py:103-115) draws CANDIDATES from
    # the spell lexicon but ranks by the word's frequency in the MAIN field
    # (absent -> 1), so stems still outrank never-indexed surface forms.
    sugfield = ix.schema[field].spelling_fieldname(field) if field in ix.schema else field
    if sugfield != field:
        cand = (
            ix.termstats().filter(F.col("field") == sugfield)
            .select("term").distinct()
        )
        freqs = (
            ix.termstats().filter(F.col("field") == field)
            .groupBy("term").agg(F.sum("total_tf").alias("_f"))
        )
        lex = cand.join(freqs, on="term", how="left").select(
            "term", F.coalesce(F.col("_f"), F.lit(1)).alias("freq")
        )
    else:
        lex = (
            ix.termstats()
            .filter(F.col("field") == field)
            .groupBy("term")
            .agg(F.sum("total_tf").alias("freq"))
        )
    cond = F.levenshtein(F.col("term"), F.lit(text)) <= maxdist
    if prefix:
        cond = cond & F.col("term").startswith(text[:prefix])
    # the reference's bounded heap keeps the LARGEST (score, term) tuples,
    # so among equal frequencies the alphabetically last terms survive the
    # cut — but the final list displays term-ascending (spelling.py:65-74)
    rows = (
        lex.filter(cond)
        .orderBy(F.desc("freq"), F.desc("term"))
        .limit(limit)
        .collect()
    )
    rows.sort(key=lambda r: (-r["freq"], r["term"]))
    return [r["term"] for r in rows]


def correct_query_string(ix: Index, qstring: str, default_field: str,
                         maxdist: int = 2, prefix: int = 0) -> str:
    """Re-render the query string with misspelled terms replaced by their
    best suggestion, preserving syntax (reference Searcher.correct_query +
    Correction.string, spelling.py:178-320): corrects bare, fielded and
    boosted words and words inside quoted phrases."""
    import re as _re

    from whoosh_spark.query.parser import _TOKEN_RE

    def term_of(field: str, word: str) -> str | None:
        ana = ix.schema[field].analyzer if field in ix.schema else None
        terms = ana.query_terms(word) if ana else [word]
        return terms[0] if terms else None

    def fix(field: str, word: str) -> str | None:
        t = term_of(field, word)
        if t is None:
            return None
        present = (
            ix.termstats()
            .filter((F.col("field") == field) & (F.col("term") == t))
            .limit(1)
            .count()
        )
        if present:
            return None
        # the reference correction takes the head of the default 5-item
        # suggestion list (the limit affects the tie cut, see suggest())
        sugs = suggest(ix, field, t, limit=5, maxdist=maxdist, prefix=prefix)
        return sugs[0] if sugs else None

    edits: list[tuple[int, int, str]] = []
    field = default_field
    field_sticky = False
    for m in _TOKEN_RE.finditer(qstring):
        kind = m.lastgroup
        if kind == "field":
            field = m.group(0)[:-1]
            field_sticky = True
            continue
        if kind == "word":
            w = m.group("word")
            if w in ("AND", "OR", "NOT", "ANDNOT", "ANDMAYBE", "REQUIRE"):
                continue
            start, end = m.span("word")
            core = w
            # keep boost suffix / +- prefixes in place
            bm = _re.match(r"^(.*?)(\^\d+(?:\.\d+)?)$", core)
            if bm and bm.group(1):
                core = bm.group(1)
                end = start + len(core)
            while core and core[0] in "+-":
                core = core[1:]
                start += 1
            if core and "*" not in core and "?" not in core:
                rep = fix(field, core)
                if rep is not None:
                    edits.append((start, end, rep))
        elif kind == "phrase":
            ptext = m.group("phtext")
            pstart = m.span("phtext")[0]
            ana = ix.schema[field].analyzer if field in ix.schema else None
            pat = _re.compile(ana.pattern if ana else r"\\w+")
            for wm in pat.finditer(ptext):
                rep = fix(field, wm.group(0))
                if rep is not None:
                    edits.append((pstart + wm.start(), pstart + wm.end(), rep))
        if kind != "field" and field_sticky:
            field = default_field
            field_sticky = False

    out = qstring
    for start, end, rep in sorted(edits, reverse=True):
        out = out[:start] + rep + out[end:]
    return out


def correct_query_terms(ix: Index, field: str, words: list[str],
                        maxdist: int = 2, prefix: int = 0) -> dict[str, str]:
    """For each word not present in the lexicon, its best suggestion
    (reference Searcher.correct_query semantics at the term level)."""
    present = {
        r["term"]
        for r in ix.termstats()
        .filter((F.col("field") == field) & F.col("term").isin(words))
        .select("term")
        .collect()
    }
    out = {}
    for w in words:
        if w in present:
            continue
        sugs = suggest(ix, field, w, limit=5, maxdist=maxdist, prefix=prefix)
        if sugs:
            out[w] = sugs[0]
    return out


class Correction:
    """Corrected version of a user query (reference spelling.py:178-230):
    ``query``/``string`` carry the corrected forms, ``original_query``/
    ``original_string`` the inputs."""

    def __init__(self, original_query, query, original_string, string):
        self.original_query = original_query
        self.query = query
        self.original_string = original_string
        self.string = string

    def __repr__(self):
        return f"{self.__class__.__name__}({self.query!r}, {self.string!r})"


def correct_query(ix: Index, q, qstring: str | None,
                  default_field: str | None = None,
                  maxdist: int = 2, prefix: int = 0) -> Correction:
    """Reference Searcher.correct_query (searching.py:820-905): correct
    every query term missing from its field's lexicon, rewriting both the
    query TREE (Query.replace) and, when given, the original string.
    ``default_field`` (for unfielded words in the string) defaults to the
    query's dominant term field — the reference reads each token's field
    off the parsed query, which for unfielded words IS the parser's
    default field."""
    from collections import Counter, defaultdict

    by_field: dict[str, set] = defaultdict(set)
    for fld, text in q.all_terms():
        if fld in ix.schema:
            by_field[fld].add(text)
    if default_field is None:
        counts = Counter(fld for fld, _ in q.all_terms() if fld in ix.schema)
        default_field = counts.most_common(1)[0][0] if counts else "content"
    corrected = q
    for fld in sorted(by_field):
        fixes = correct_query_terms(ix, fld, sorted(by_field[fld]),
                                    maxdist=maxdist, prefix=prefix)
        for old, new in sorted(fixes.items()):
            corrected = corrected.replace(fld, old, new)
    string = (correct_query_string(ix, qstring, default_field,
                                   maxdist=maxdist, prefix=prefix)
              if qstring is not None else None)
    return Correction(q, corrected, qstring, string)
