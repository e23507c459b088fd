"""Query-string parser: the practical subset of the reference plugin parser
(/root/reference/src/whoosh/qparser/default.py:348-376 pipeline; plugins.py
Whitespace/Fields/Phrase/Group/Operators/Boost/Range/Wildcard/Every).

Supported syntax:
  word                      analyzed with the field's analyzer
  field:word                fielded term
  "a b"~2                   phrase (optional slop)
  field:(a b OR c)          fielded group
  a AND b, a OR b, NOT a    boolean operators (uppercase, like the reference)
  a ANDNOT b, a ANDMAYBE b, a REQUIRE b
  word^2.5, "a b"^3, (...)^2  boosts
  wild*card, w?ld           wildcard; trailing-* only -> Prefix
  field:[a TO b], {a TO b}  term ranges (exclusive braces)
  *, field:*                Every
  implicit adjacency        default group = And (reference AndGroup default)

Words that analyze to nothing (stop words) are dropped; words that analyze
to several tokens become the default group of Terms (multitoken_query
"default", reference qparser/default.py:167-241).
"""

from __future__ import annotations

import re

from whoosh_spark.query import nodes as Q
from whoosh_spark.schema import IndexSchema

_TOKEN_RE = re.compile(
    r"""
    (?P<lparen>\() |
    (?P<rparen>\)(?:\^(?P<gboost>\d+(?:\.\d+)?))?) |
    (?P<phrase>"(?P<phtext>[^"]*)"(?:~(?P<slop>\d+))?(?:\^(?P<phboost>\d+(?:\.\d+)?))?) |
    (?P<range>(?P<lb>[\[{])\s*(?P<rstart>[^\s\]}]*)\s+TO\s+(?P<rend>[^\s\]}]*)\s*(?P<rb>[\]}])(?:\^(?P<rboost>\d+(?:\.\d+)?))?) |
    (?P<field>[\w*]+): |
    (?P<word>[^\s()]+) |
    (?P<ws>\s+)
    """,
    re.VERBOSE,
)

_OPERATORS = {"AND", "OR", "NOT", "ANDNOT", "ANDMAYBE", "REQUIRE"}


class _Tok:
    __slots__ = ("kind", "value", "extra")

    def __init__(self, kind, value, extra=None):
        self.kind = kind
        self.value = value
        self.extra = extra or {}

    def __repr__(self):
        return f"_Tok({self.kind},{self.value!r})"


def _lex(text: str) -> list[_Tok]:
    toks = []
    for m in _TOKEN_RE.finditer(text):
        kind = m.lastgroup
        if kind == "ws":
            continue
        if kind == "lparen":
            toks.append(_Tok("(", "("))
        elif kind == "rparen":
            toks.append(_Tok(")", ")", {"boost": float(m.group("gboost")) if m.group("gboost") else None}))
        elif kind == "phrase":
            toks.append(
                _Tok("phrase", m.group("phtext"),
                     {"slop": int(m.group("slop") or 1),
                      "boost": float(m.group("phboost")) if m.group("phboost") else 1.0})
            )
        elif kind == "range":
            toks.append(
                _Tok("range", (m.group("rstart"), m.group("rend")),
                     {"startexcl": m.group("lb") == "{", "endexcl": m.group("rb") == "}",
                      "boost": float(m.group("rboost")) if m.group("rboost") else 1.0})
            )
        elif kind == "field":
            toks.append(_Tok("field", m.group("field")[:-1] if False else m.group(0)[:-1]))
        elif kind == "word":
            w = m.group("word")
            if w in _OPERATORS:
                toks.append(_Tok("op", w))
            else:
                boost = 1.0
                bm = re.match(r"^(.*)\^(\d+(?:\.\d+)?)$", w)
                if bm and bm.group(1):
                    w, boost = bm.group(1), float(bm.group(2))
                toks.append(_Tok("word", w, {"boost": boost}))
    return toks


class QueryParser:
    def __init__(self, default_field: str, schema: IndexSchema):
        self.default_field = default_field
        self.schema = schema

    # --------------------------------------------------------------- parse

    def parse(self, text: str) -> Q.Query:
        toks = _lex(text)
        self._toks = toks
        self._pos = 0
        q = self._parse_group(self.default_field)
        return q.normalize()

    def _peek(self):
        return self._toks[self._pos] if self._pos < len(self._toks) else None

    def _next(self):
        t = self._peek()
        if t is not None:
            self._pos += 1
        return t

    def _parse_group(self, field: str, stop_at_rparen: bool = False) -> Q.Query:
        """Parse a sequence of units with infix operators; adjacency = And."""
        items: list = []  # mix of Query and operator strings
        while True:
            t = self._peek()
            if t is None:
                break
            if t.kind == ")":
                if stop_at_rparen:
                    break
                self._next()
                continue
            if t.kind == "op":
                self._next()
                if t.value == "NOT":
                    sub = self._parse_unit(field)
                    if sub is not None:
                        items.append(Q.Not(sub))
                else:
                    items.append(t.value)
                continue
            sub = self._parse_unit(field)
            if sub is not None:
                items.append(sub)
        return self._structure(items)

    def _structure(self, items: list) -> Q.Query:
        """Resolve infix operators (binary ops bind tighter than OR; OR
        tighter than implicit AND adjacency — empirically matching the
        reference's OperatorsPlugin output on the supported subset)."""
        # drop leading/trailing dangling operators
        while items and isinstance(items[0], str):
            items.pop(0)
        while items and isinstance(items[-1], str):
            items.pop()
        if not items:
            return Q.NullQuery

        # binary word operators first
        for opname, cls in (("ANDNOT", Q.AndNot), ("ANDMAYBE", Q.AndMaybe), ("REQUIRE", Q.Require)):
            i = 1
            while i < len(items) - 1:
                if items[i] == opname:
                    merged = cls(items[i - 1], items[i + 1])
                    items[i - 1 : i + 2] = [merged]
                else:
                    i += 1
        # AND
        i = 1
        while i < len(items) - 1:
            if items[i] == "AND":
                merged = Q.And([items[i - 1], items[i + 1]])
                items[i - 1 : i + 2] = [merged]
            else:
                i += 1
        # OR
        i = 1
        while i < len(items) - 1:
            if items[i] == "OR":
                merged = Q.Or([items[i - 1], items[i + 1]])
                items[i - 1 : i + 2] = [merged]
            else:
                i += 1
        items = [x for x in items if not isinstance(x, str)]
        if len(items) == 1:
            return items[0]
        return Q.And(items)

    def _parse_unit(self, field: str):
        t = self._next()
        if t is None:
            return None
        if t.kind == "field":
            fieldname = t.value
            nxt = self._peek()
            if nxt is not None and nxt.kind == "(":
                self._next()
                q = self._parse_group(fieldname, stop_at_rparen=True)
                closing = self._next()  # consume ')'
                if closing is not None and closing.kind == ")" and closing.extra.get("boost"):
                    q = q.with_boost(q.boost * closing.extra["boost"])
                return q
            return self._parse_unit(fieldname)
        if t.kind == "(":
            q = self._parse_group(field, stop_at_rparen=True)
            closing = self._next()
            if closing is not None and closing.kind == ")" and closing.extra.get("boost"):
                q = q.with_boost(q.boost * closing.extra["boost"])
            return q
        if t.kind == ")":
            return None
        if t.kind == "phrase":
            return self._make_phrase(field, t.value, t.extra["slop"], t.extra["boost"])
        if t.kind == "range":
            start, end = t.value
            return Q.TermRange(
                field,
                self._range_text(field, start) if start else None,
                self._range_text(field, end) if end else None,
                startexcl=t.extra["startexcl"],
                endexcl=t.extra["endexcl"],
                boost=t.extra["boost"],
            )
        if t.kind == "op":  # operator in unit position: treat as plain word
            return self._make_word(field, t.value.lower(), 1.0)
        if t.kind == "word":
            return self._make_word(field, t.value, t.extra["boost"])
        return None

    # --------------------------------------------------------- word -> query

    def _analyzer(self, field: str):
        if field in self.schema:
            return self.schema[field].analyzer
        from whoosh_spark.analysis import standard_analyzer

        return standard_analyzer()

    def _range_text(self, field: str, text: str) -> str:
        ana = self._analyzer(field)
        terms = ana.query_terms(text) if ana else [text]
        return terms[0] if terms else text

    def _make_word(self, field: str, text: str, boost: float):
        if text == "*":
            return Q.Every(None if field == self.default_field else field, boost=boost)
        if "*" in text or "?" in text:
            return Q.Wildcard(field, text if not self._lowercases(field) else text.lower(), boost=boost).normalize()
        ana = self._analyzer(field)
        terms = ana.query_terms(text) if ana else [text]
        if not terms:
            return None
        if len(terms) == 1:
            return Q.Term(field, terms[0], boost=boost)
        # multitoken_query "default": group with the parser's default group
        return Q.And([Q.Term(field, t) for t in terms], boost=boost)

    def _lowercases(self, field: str) -> bool:
        ana = self._analyzer(field)
        return bool(ana and ana.lowercase)

    def _make_phrase(self, field: str, text: str, slop: int, boost: float):
        ana = self._analyzer(field)
        words = ana.query_terms(text) if ana else text.split()
        if not words:
            return None
        return Q.Phrase(field, words, slop=slop, boost=boost).normalize()
