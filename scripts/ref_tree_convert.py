"""Convert a reference-Whoosh query tree into whoosh_spark query nodes.

Used by the parser fuzz campaign: the REFERENCE PARSER is the oracle (its
parse trees are correct), but its composed MATCHERS are demonstrably buggy
on dense posting lists (see tests/test_fuzz_differential.py docstring), so
instead of comparing search results from the reference engine we convert
its parse tree to our nodes and run both trees through OUR engine — any
difference is a parser-parity bug, never a reference-matcher artifact.
"""

from __future__ import annotations

import whoosh_spark.query as Q
from whoosh_spark.query import nodes as QN


def convert(wq):
    """Reference whoosh.query.* -> whoosh_spark.query nodes."""
    import whoosh.query as W

    t = type(wq).__name__
    if isinstance(wq, W.qcore._NullQuery):
        return Q.NullQuery
    if t == "Term":
        return Q.Term(wq.fieldname, wq.text, boost=wq.boost)
    if t == "Phrase":
        return Q.Phrase(wq.fieldname, list(wq.words), slop=wq.slop,
                        boost=wq.boost)
    if t == "And":
        return Q.And([convert(s) for s in wq.subqueries], boost=wq.boost)
    if t == "Or":
        return Q.Or([convert(s) for s in wq.subqueries], boost=wq.boost,
                    minmatch=wq.minmatch)
    if t == "DisjunctionMax":
        return Q.DisjunctionMax([convert(s) for s in wq.subqueries],
                                boost=wq.boost, tiebreak=wq.tiebreak)
    if t == "Not":
        return Q.Not(convert(wq.query), boost=wq.boost)
    if t == "AndNot":
        return Q.AndNot(convert(wq.a), convert(wq.b))
    if t == "AndMaybe":
        return Q.AndMaybe(convert(wq.a), convert(wq.b))
    if t == "Require":
        return Q.Require(convert(wq.a), convert(wq.b))
    if t == "Otherwise":
        return Q.Otherwise(convert(wq.a), convert(wq.b))
    if t == "Prefix":
        q = Q.Prefix(wq.fieldname, wq.text, boost=wq.boost)
        q.constantscore = wq.constantscore
        return q
    if t == "Wildcard":
        q = Q.Wildcard(wq.fieldname, wq.text, boost=wq.boost)
        q.constantscore = wq.constantscore
        return q
    if t == "Regex":
        q = Q.Regex(wq.fieldname, wq.text, boost=wq.boost)
        q.constantscore = wq.constantscore
        return q
    if t == "FuzzyTerm":
        q = Q.FuzzyTerm(wq.fieldname, wq.text, maxdist=wq.maxdist,
                        prefixlength=wq.prefixlength, boost=wq.boost)
        q.constantscore = wq.constantscore
        return q
    if t == "TermRange":
        q = Q.TermRange(wq.fieldname, wq.start, wq.end,
                        startexcl=wq.startexcl, endexcl=wq.endexcl,
                        boost=wq.boost)
        q.constantscore = wq.constantscore
        return q
    if t == "Every":
        return Q.Every(wq.fieldname, boost=wq.boost)
    if t == "ConstantScoreQuery":
        return Q.ConstantScore(convert(wq.child), wq.score)
    raise TypeError(f"no conversion for reference node {t}: {wq!r}")


def canon(q) -> str:
    """Canonical repr of a whoosh_spark tree with EVERY attribute shown
    (our node reprs hide default boosts / excl flags)."""
    if isinstance(q, QN._NullQuery):
        return "Null"
    b = getattr(q, "boost", 1.0)
    t = type(q).__name__
    if isinstance(q, Q.Term):
        return f"Term({q.field},{q.text},{b})"
    if isinstance(q, Q.Phrase) and type(q) is Q.Phrase:
        return f"Phrase({q.field},{q.words},{q.slop},{b})"
    if isinstance(q, QN.CompoundQuery):
        extra = ""
        if isinstance(q, Q.Or):
            extra = f",mm={q.minmatch},sc={q.scale}"
        if isinstance(q, Q.DisjunctionMax):
            extra = f",tb={q.tiebreak}"
        return (f"{t}([{','.join(canon(s) for s in q.subqueries)}],{b}"
                f"{extra})")
    if isinstance(q, Q.Not):
        return f"Not({canon(q.query)},{b})"
    if isinstance(q, QN.BinaryQuery):
        return f"{t}({canon(q.a)},{canon(q.b)},{b})"
    if isinstance(q, Q.TermRange):
        return (f"TermRange({q.field},{q.start},{q.end},{q.startexcl},"
                f"{q.endexcl},{b},cs={q.constantscore})")
    if isinstance(q, QN.MultiTerm):
        text = getattr(q, "text", getattr(q, "pattern", ""))
        extra = ""
        if isinstance(q, Q.FuzzyTerm):
            extra = f",{q.maxdist},{q.prefixlength}"
        return f"{t}({q.field},{text},{b},cs={q.constantscore}{extra})"
    if isinstance(q, Q.Every):
        return f"Every({q.field},{b})"
    if isinstance(q, Q.ConstantScore):
        return f"CS({canon(q.child)},{q.score},{b})"
    return repr(q)
