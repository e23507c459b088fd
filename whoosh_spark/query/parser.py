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

_BASE_BRANCHES = r"""
    (?P<lparen>\() |
    (?P<rparen>\)(?:\^(?P<gboost>\d+(?:\.\d+)?))?) |
    (?P<rgx>r"(?P<rgxpat>[^"]*)"(?:\^(?P<rgxboost>\d+(?:\.\d+)?))?) |
    {phrase_branch}
    (?P<range>(?P<lb>[\[{{])(?P<rstart>('[^']*?'\s+)|([^\]}}]+?(?=[Tt][Oo])))?[Tt][Oo](?P<rend>(\s+'[^']*?')|([^\]}}]+?))?(?P<rb>[\]}}])(?:\^(?P<rboost>\d+(?:\.\d+)?))?) |
    {gtlt_branch}
    (?P<squote>(?:^|(?<=\W))'(?P<sqtext>.*?)'(?=\s|\]|[)}}]|$)) |
    {func_branch}
    (?P<field>[\w*]+):(?=\S) |
    {word_branch}
    (?P<ws>\s+)
"""

#: a double quote breaks a word ONLY when it would start a phrase match
#: (i.e. a closing quote exists later) — the reference scanner lets ANY
#: tagger match terminate a word, and its PhraseTagger pairs quotes
#: left-to-right non-greedily (plugins.py:677), so an unpaired quote stays
#: word material ('bravo"x' is one word; 'a" b" c' breaks at the first ")
_WORD_BRANCH = r"""(?P<word>(?:[^\s()"]|"(?![^"]*"))+) |"""
#: sequence mode: a double quote always terminates a word (the reference's
#: interstitial-text model makes any tagger match break a word)
_WORD_BRANCH_SEQ = r'(?P<word>[^\s()"]+) |'

#: reference PhrasePlugin expr (plugins.py:677) vs SequencePlugin marker
#: (plugins.py:765: the same double-quote char tags BOTH ends; slop attaches
#: to whichever quote it follows — the END quote's slop wins)
_PHRASE_BRANCH = r"""(?P<phrase>"(?P<phtext>[^"]*)"(?:~(?P<slop>\d+))?(?:\^(?P<phboost>\d+(?:\.\d+)?))?) |"""
_QUOTE_BRANCH = r"""(?P<quote>"(?:~(?P<qslop>[1-9][0-9]*))?) |"""
#: reference FunctionPlugin expr (plugins.py:567-575): #name[args]
_FUNC_BRANCH = r"""(?P<func>\#(?P<fname>[A-Za-z_][A-Za-z0-9._]*)(?:\[(?P<fargs>.*?)\])?) |"""
#: with GtLtPlugin enabled, an operator followed by a single-quoted value
#: lexes as one word with the quotes stripped (in the reference the GtLt
#: tagger and the SingleQuote tagger match back-to-back, plugins.py:1090,
#: 115-121)
_GTLT_BRANCH = r"""(?P<gtq>(?P<gtqop><=|>=|=<|=>|<|>)'(?P<gtqtext>.*?)'(?=\s|\]|[)}}]|$)) |"""

_LEX_CACHE: dict = {}


def _token_re(functions: bool, sequence: bool, gtlt: bool = False):
    key = (functions, sequence, gtlt)
    rx = _LEX_CACHE.get(key)
    if rx is None:
        pattern = _BASE_BRANCHES.format(
            phrase_branch=_QUOTE_BRANCH if sequence else _PHRASE_BRANCH,
            func_branch=_FUNC_BRANCH if functions else "",
            word_branch=_WORD_BRANCH_SEQ if sequence else _WORD_BRANCH,
            gtlt_branch=_GTLT_BRANCH if gtlt else "",
        )
        rx = _LEX_CACHE[key] = re.compile(pattern, re.VERBOSE)
    return rx


_TOKEN_RE = _token_re(False, False)

_OPERATORS = {"AND", "OR", "NOT", "ANDNOT", "ANDMAYBE", "REQUIRE"}


def _op_context_ok(text: str, w: str, start: int, end: int) -> bool:
    """The reference's OperatorsPlugin patterns demand whitespace context
    (plugins.py:1044-1050): infix ops ``(?<=\\s)OP(?=\\s)``; NOT allows
    start-of-string or a paren before (``(^|(?<=(\\s|[()])))NOT(?=\\s)``);
    REQUIRE allows start-of-string. A bare operator word at the string
    edge (``alfa ANDNOT``) is therefore a plain WORD — it flows through
    the analyzer like any term (so ``and``/``or``/``not`` stopword away
    while ``andnot``/``andmaybe`` become searchable terms)."""
    prev = text[start - 1] if start > 0 else ""
    nxt = text[end] if end < len(text) else ""
    if not nxt.isspace():
        return False
    if w == "NOT":
        return start == 0 or prev.isspace() or prev in "()"
    if w == "REQUIRE":
        return start == 0 or prev.isspace()
    return bool(prev) and prev.isspace()


class _Tok:
    __slots__ = ("kind", "value", "extra")

    def __init__(self, kind, value, extra=None):
        self.kind = kind
        self.value = value
        self.extra = extra or {}

    def __repr__(self):
        return f"_Tok({self.kind},{self.value!r})"


class _Pend:
    """A group under construction during infix-operator folding (mirror of
    the reference's AndGroup/OrGroup/BinaryGroup syntax nodes): kids may
    still contain unprocessed operator marker strings, resolved by the
    recursive sub-fold."""

    __slots__ = ("opname", "kids")

    def __init__(self, opname: str, kids: list):
        self.opname = opname
        self.kids = kids

    def __repr__(self):
        return f"_Pend({self.opname},{self.kids!r})"


class _EmptyType:
    """Placeholder for a unit that analyzed to NOTHING (stopword, 1-char
    token, bare punctuation, all-stopword phrase). The reference keeps such
    WordNodes through operator folding — they can be captured as operands —
    and only drops them at query-build time (WordNode.query -> None;
    BinaryGroup.query degenerates to the surviving side, syntax.py:343-366).
    This sentinel reproduces that: it occupies an operand slot during
    _structure_items folding and evaporates in _finish_pend."""

    def __repr__(self):
        return "_EMPTY"


_EMPTY = _EmptyType()


def _parse_fn_args(argstring: str) -> tuple[list, dict]:
    """FunctionPlugin arg syntax (reference plugins.py:621-643): args split
    on commas; name=value makes a kwarg; values stay STRINGS with optional
    single quotes stripped."""
    args: list = []
    kwargs: dict = {}
    for part in argstring.split(","):
        if "=" in part:
            name, value = part.split("=", 1)
            name = name.strip()
        else:
            name, value = None, part
        value = value.strip()
        if value.startswith("'") and value.endswith("'"):
            value = value[1:-1]
        if name:
            kwargs[name] = value
        else:
            args.append(value)
    return args, kwargs


def _emit_match(m, text: str, toks: list) -> None:
    """Translate one token-regex match into a _Tok (shared by the finditer
    lexer and the free-date stepping lexer)."""
    kind = m.lastgroup
    if kind == "ws":
        return
    if kind == "gtq":
        toks.append(_Tok("word", m.group("gtqop") + m.group("gtqtext"),
                         {"boost": 1.0}))
        return
    if kind == "func":
        argstring = m.group("fargs")
        args, kwargs = _parse_fn_args(argstring) if argstring else ((), {})
        toks.append(_Tok("func", m.group("fname"),
                         {"args": tuple(args), "kwargs": dict(kwargs)}))
        return
    if kind == "quote":
        toks.append(_Tok("quote", '"',
                         {"slop": int(m.group("qslop")) if m.group("qslop") else None}))
        return
    if kind == "rgx":
        toks.append(_Tok("rgx", m.group("rgxpat"),
                         {"boost": float(m.group("rgxboost")) if m.group("rgxboost") else 1.0}))
    elif kind == "lparen":
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
        # RangeTagger.create (reference plugins.py:845-871): strip the
        # space around TO, then strip single quotes; missing endpoint
        # stays None (open range)
        rstart, rend = m.group("rstart"), m.group("rend")
        if rstart:
            rstart = rstart.rstrip()
            if rstart.startswith("'") and rstart.endswith("'"):
                rstart = rstart[1:-1]
        if rend:
            rend = rend.lstrip()
            if rend.startswith("'") and rend.endswith("'"):
                rend = rend[1:-1]
        toks.append(
            _Tok("range", (rstart, rend),
                 {"startexcl": m.group("lb") == "{", "endexcl": m.group("rb") == "}",
                  "boost": float(m.group("rboost")) if m.group("rboost") else 1.0})
        )
    elif kind == "squote":
        # SingleQuotePlugin (reference plugins.py:115-121): quoted value
        # as one word token, with the reference's boundary guards
        # ((^|(?<=\W)) before, (?=\s|\]|[)}]|$) after) so 'abc'def lexes
        # as a plain word, not quote+word
        toks.append(_Tok("word", m.group("sqtext"), {"boost": 1.0}))
    elif kind == "field":
        toks.append(_Tok("field", m.group("field")[:-1] if False else m.group(0)[:-1]))
    elif kind == "word":
        w = m.group("word")
        if w in _OPERATORS and _op_context_ok(text, w, m.start("word"),
                                              m.end("word")):
            toks.append(_Tok("op", w))
        else:
            boost = 1.0
            bm = re.match(r"^(.*)\^(\d+(?:\.\d+)?)$", w)
            if bm and bm.group(1):
                w, boost = bm.group(1), float(bm.group(2))
            toks.append(_Tok("word", w, {"boost": boost}))


def _lex(text: str, functions: bool = False, sequence: bool = False,
         gtlt: bool = False) -> list[_Tok]:
    toks = []
    for m in _token_re(functions, sequence, gtlt).finditer(text):
        _emit_match(m, text, toks)
    return toks




class _Inline(list):
    """CopyFieldPlugin group=None: the original and copied leaves join the
    ENCLOSING group side by side (reference plugins.py:1283-1285)."""


class QueryParser:
    def __init__(self, default_field: str | None, schema: IndexSchema,
                 gtlt: bool = False, plusminus: bool = False,
                 fuzzy: bool = False, regex: bool = False,
                 operators: bool = True, group: str = "and",
                 multifield: list[str] | None = None,
                 fieldboosts: dict | None = None,
                 multifield_group: str = "or",
                 fieldaliases: dict | None = None,
                 copyfields: dict | None = None,
                 copyfield_group: str | None = "or",
                 copyfield_mirror: bool = False,
                 pseudofields: dict | None = None,
                 functions: dict | None = None,
                 sequence: bool = False,
                 free_dates: bool = False,
                 free_date_expr: str = r"([A-Za-z][A-Za-z_0-9]*):([^^]+)"):
        """Optional syntaxes mirror the reference's opt-in plugins:
        gtlt (field:>x, qparser/plugins.py:1064), plusminus (+a -b, :1001),
        fuzzy (word~2/p, :449), regex (r"pat", :202).

        ``operators=False`` treats AND/OR/NOT as plain words (SimpleParser);
        ``group`` is the implicit-adjacency group ("and"|"or");
        ``multifield`` fans unfielded clauses across several fields with
        optional per-field boosts, related by ``multifield_group``
        ("or"|"dismax") — the MultifieldPlugin (plugins.py:1141-1199).

        Further opt-in plugins:
        - ``fieldaliases``: {real: [alias, ...]} — FieldAliasPlugin
          (plugins.py:1189-1224); alias field names rewrite to the real one.
        - ``copyfields``: {from: to} — CopyFieldPlugin (plugins.py:1227-1290);
          a leaf in field `from` (explicit or default) becomes a group with
          its copy in field `to`, related by ``copyfield_group``
          ("or"|"andmaybe"|"require"|None=inline into the enclosing group);
          ``copyfield_mirror`` adds the reversed mappings.
        - ``pseudofields``: {name: fn} — PseudoFieldPlugin
          (plugins.py:1293-1352); `name:unit` parses the unit unfielded and
          returns fn(query) (fn may return None to drop it). Our fn operates
          on the built Query (the reference's operates on syntax nodes).
        - ``functions``: {name: fn} — FunctionPlugin (plugins.py:560-668);
          `#name[a,b,k=v](subqueries)` calls fn(list_of_subqueries, *args,
          **kwargs); args/kwarg values are strings; a trailing ^boost on the
          consumed group becomes kwargs['boost'].
        - ``sequence``: SequencePlugin (plugins.py:748-823); double quotes
          group arbitrary sub-queries into query.spans.Sequence (replaces
          plain-phrase parsing, as in the reference where PhrasePlugin must
          be removed); slop from the closing quote's ~N.
        - ``free_dates``: DateParserPlugin(free=True) — a DateTagger at
          priority -1 (before fields, dateparse.py:762-766, 897-922):
          ``datefield:undelimited date text`` parses greedily (no to-end)
          at any scan position; the matched prefix becomes a date range and
          lexing resumes right after it. ``free_date_expr`` mirrors the
          plugin's free_expr (note the reference's ``[^^]+`` runs to the
          next caret or end of string before the grammar trims it).
        """
        self.default_field = default_field
        self.schema = schema
        self.gtlt = gtlt
        self.plusminus = plusminus
        self.fuzzy = fuzzy
        self.regex = regex
        self.operators = operators
        self.group = group
        self.multifield = multifield
        self.fieldboosts = fieldboosts or {}
        self.multifield_group = multifield_group
        self._aliases = {}
        for real, aliases in (fieldaliases or {}).items():
            for alias in aliases:
                self._aliases[alias] = real
        self.copyfields = dict(copyfields) if copyfields else None
        if self.copyfields and copyfield_mirror:
            self.copyfields.update({v: k for k, v in list(self.copyfields.items())})
        self.copyfield_group = copyfield_group
        self.pseudofields = pseudofields or {}
        self.functions = functions
        self.sequence = sequence
        self.free_dates = free_dates
        self.free_date_expr = free_date_expr
        self.basedate = None  # for dateparse 'today'/'now' (tests inject)

    # --------------------------------------------------------------- parse

    def _lex_free(self, text: str) -> list[_Tok]:
        """Stepping lexer with the DateTagger tried first at every scan
        position (reference dateparse.py:897-922 at tagger priority -1):
        when ``fieldname:`` names a DATETIME field and the English grammar
        matches a prefix of the following text, the consumed stretch becomes
        a single date-span token and lexing resumes right after it."""
        from datetime import datetime as _dt

        from whoosh_spark.query.dateparse import _GRAMMAR, _disambiguated

        free_re = re.compile(self.free_date_expr)
        rx = _token_re(self.functions is not None, self.sequence, self.gtlt)
        basedate = self.basedate or _dt.utcnow()
        toks: list = []
        pos, n = 0, len(text)
        while pos < n:
            fm = free_re.match(text, pos)
            if fm:
                fname = self._aliases.get(fm.group(1), fm.group(1))
                if (fname in self.schema
                        and self.schema[fname].kind == "datetime"):
                    d, newpos = _GRAMMAR(fm.group(2), 0, basedate)
                    if d is not None:
                        # DateParser.parse disambiguates the raw result
                        # (dateparse.py:621-628); crash-quirks propagate
                        d = _disambiguated(d, basedate)
                        lo, hi = (d, d) if isinstance(d, _dt) else d
                        pos = fm.start(2) + newpos
                        # a trailing ^N (the free_expr stops at carets)
                        # boosts the date node via the reference's
                        # BoostPlugin filter (plugins.py:406-447)
                        boost = 1.0
                        bsm = re.compile(
                            r"\^(\d+(?:\.\d+)?)($|(?=[ \t\r\n)]))"
                        ).match(text, pos)
                        if bsm:
                            boost = float(bsm.group(1))
                            pos = bsm.end()
                        toks.append(_Tok("dtspan", (fname, lo, hi),
                                         {"boost": boost}))
                        continue
            m = rx.match(text, pos)
            if m is None or m.end() == pos:
                pos += 1
                continue
            _emit_match(m, text, toks)
            pos = m.end()
        return toks

    def parse(self, text: str) -> Q.Query:
        if self.free_dates and self.schema is not None:
            toks = self._lex_free(text)
        else:
            toks = _lex(text, functions=self.functions is not None,
                        sequence=self.sequence, gtlt=self.gtlt)
        self._toks = toks
        self._pos = 0
        q = self._parse_group(None)  # None = unfielded (default/multifield)
        # the reference ALWAYS wraps the top level in the parser's group
        # class before normalize (default.py:361-366) — the wrap is what
        # lets CompoundQuery.normalize FLATTEN a merged boosted paren
        # group and distribute its boost onto the promoted children
        # ("(bravo echo)^3 AND x" -> bravo^3, echo^3, x^3 flat)
        q = Q.And([q]) if self.group == "and" else Q.Or([q])
        return q.normalize()

    def _peek(self):
        return self._toks[self._pos] if self._pos < len(self._toks) else None

    def _next(self):
        t = self._peek()
        if t is not None:
            self._pos += 1
        return t

    def _parse_group(self, field: str, stop_at_rparen: bool = False,
                     as_list: bool = False, raw: bool = False):
        """Parse a sequence of units with infix operators; adjacency = And.
        ``as_list`` returns the operator-resolved item list WITHOUT the
        implicit adjacency wrap (FunctionPlugin group consumption: adjacent
        units stay separate sub-queries, reference plugins.py:596-599).
        ``raw`` returns the UNRESOLVED item list (queries + operator
        markers) so an unclosed paren group can splice into its parent
        level before folding (reference: the bracket filter drops an
        unmatched open bracket, leaving its contents flat)."""
        if self.plusminus and not stop_at_rparen:
            return self._parse_plusminus(field)
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
            if t.kind == "op" and self.operators:
                self._next()
                if t.value == "NOT":
                    # the reference's paren pass strips stray ')' BEFORE
                    # operators bind, so "NOT ) x" is Not(x); inside a
                    # group the ')' closes the group and the dangling NOT
                    # is dropped ("(a NOT) b" -> And([a, b]))
                    while (not stop_at_rparen and self._peek() is not None
                           and self._peek().kind == ")"):
                        self._next()
                    nxt = self._peek()
                    if nxt is None or nxt.kind == ")":
                        continue  # dangling NOT: no operand
                    sub = self._parse_unit(field)
                    if isinstance(sub, _Inline):
                        # NOT before an unclosed paren: the bracket drops
                        # first, so NOT binds the IMMEDIATE next node —
                        # if that is an operator marker or an empty word,
                        # the NOT evaporates with it (reference NotGroup
                        # around a node that builds to None)
                        rest = list(sub)
                        head = rest.pop(0) if rest else None
                        if head is _EMPTY or isinstance(head, str):
                            items.append(_EMPTY)
                        elif head is not None:
                            items.append(Q.Not(head))
                        items.extend(rest)
                    elif sub is _EMPTY:
                        items.append(_EMPTY)  # Not(empty word) builds to nothing
                    elif sub is not None:
                        items.append(Q.Not(sub))
                else:
                    items.append(t.value)
                continue
            if t.kind == "quote":
                # SequencePlugin do_quotes (plugins.py:786-823): buffer
                # units until the closing quote -> Sequence(slop from the
                # END marker); an unbalanced quote dumps the buffer inline
                self._next()
                seq_items: list = []
                end_slop = None
                closed = False
                while True:
                    t2 = self._peek()
                    if t2 is None or t2.kind == ")":
                        break
                    if t2.kind == "quote":
                        self._next()
                        end_slop = t2.extra.get("slop")
                        closed = True
                        break
                    sub = self._parse_unit(field)
                    if isinstance(sub, _Inline):
                        seq_items.extend(
                            x for x in sub
                            if not isinstance(x, str) and x is not _EMPTY)
                    elif sub is not None and sub is not _EMPTY:
                        seq_items.append(sub)
                if closed and seq_items:
                    from whoosh_spark.query.spans import Sequence as SequenceQ

                    items.append(SequenceQ(seq_items, slop=end_slop or 1))
                else:
                    items.extend(seq_items)
                continue
            sub = self._parse_unit(field)
            if isinstance(sub, _Inline):
                items.extend(sub)
            elif sub is not None:
                items.append(sub)
        if raw:
            return items
        if as_list:
            return self._structure_items(items)
        return self._structure(items)

    def _parse_plusminus(self, field: str) -> Q.Query:
        """PlusMinus grouping (reference qparser/plugins.py:1001-1062 +
        BooleanQuery composition compound.py:655-657):
        +x required, -x prohibited, plain optional ->
        AndNot(AndMaybe(And(required), Or(optional)), Or(prohibited))."""
        required, optional, prohibited = [], [], []
        while True:
            t = self._peek()
            if t is None:
                break
            bucket = optional
            if t.kind == "word" and t.value.startswith("+"):
                t.value = t.value[1:]
                bucket = required
            elif t.kind == "word" and t.value.startswith("-"):
                t.value = t.value[1:]
                bucket = prohibited
            sub = self._parse_unit(field)
            if isinstance(sub, _Inline):
                bucket.extend(x for x in sub
                              if not isinstance(x, str) and x is not _EMPTY)
            elif sub is not None and sub is not _EMPTY:
                bucket.append(sub)
        if required:
            core = Q.AndMaybe(Q.And(required), Q.Or(optional)) if optional else Q.And(required)
        else:
            core = Q.Or(optional) if optional else Q.NullQuery
        if prohibited:
            core = Q.AndNot(core, Q.Or(prohibited))
        return core

    # reference ops-list order (plugins.py:935-951): And, Or, AndNot,
    # AndMaybe, Require; NOT is a prefix operator bound at parse time.
    # bool = "merging" (AndGroup/OrGroup append into an existing group of
    # the same class on the left; binary groups never merge).
    _FOLD_ORDER = (("AND", True), ("OR", True), ("ANDNOT", False),
                   ("ANDMAYBE", False), ("REQUIRE", False))
    _BINARY_CLS = {"ANDNOT": Q.AndNot, "ANDMAYBE": Q.AndMaybe,
                   "REQUIRE": Q.Require}

    def _structure_items(self, items: list) -> list:
        """Faithful mirror of the reference OperatorsPlugin.do_operators
        (plugins.py:961-996) + InfixOperator.replace_self (syntax.py:
        608-636). Each operator TYPE folds in ops-list order, left-to-
        right. An operator token at a group edge is simply deleted; an
        operator token captured as the operand of an earlier-folding type
        vanishes during the recursive sub-fold — so adjacent operators
        degenerate to implicit adjacency ("delta AND OR alfa" ==
        And([delta, alfa])), matching the reference exactly. Merging
        groups (And/Or) append into a left operand that is already a
        group of the same class — including a parenthesized group of the
        parser's group class, which is how "(alfa bravo)^2 AND charlie"
        leaks the group boost onto charlie in the reference."""
        items = self._fold(list(items))
        out = []
        for x in items:
            if isinstance(x, str):
                continue
            x = self._finish_pend(x)
            if x is not _EMPTY:
                out.append(x)
        return out

    @staticmethod
    def _mark_paren_group(q):
        """A parenthesized group of the parser's group class is a live
        syntax GROUP in the reference, so a later merging fold can append
        into it (see _structure_items). Single-item parens collapse to
        the item (reference normalize) and are not mergeable — the one
        divergence: the reference's "(x)^2 AND y" leaks the boost onto y
        through a single-item boosted group; we keep "(x)^2" == x^2."""
        if isinstance(q, (Q.And, Q.Or)):
            q._paren_group = True
        return q

    def _mergeable(self, left, opname: str) -> bool:
        if isinstance(left, _Pend):
            return left.opname == opname
        if not getattr(left, "_paren_group", False):
            return False
        if opname == "AND":
            return type(left) is Q.And
        return (type(left) is Q.Or and not left.minmatch
                and left.scale is None)

    def _fold(self, items: list) -> list:
        for opname, merging in self._FOLD_ORDER:
            i = 0
            while i < len(items):
                x = items[i]
                if isinstance(x, str) and x == opname:
                    if 0 < i < len(items) - 1:
                        left, right = items[i - 1], items[i + 1]
                        if merging and self._mergeable(left, opname):
                            if isinstance(left, _Pend):
                                left.kids.append(right)
                            else:
                                left.subqueries.append(right)
                                left._merged_dirty = True
                            del items[i:i + 2]
                        else:
                            items[i - 1:i + 2] = [_Pend(opname,
                                                        [left, right])]
                    else:
                        del items[i]  # dangling at a group edge
                else:
                    i += 1
        # recursive sub-fold (reference: do_operators descends into every
        # GroupNode) — resolves operator tokens captured as operands
        for x in items:
            if isinstance(x, _Pend):
                x.kids = self._fold(x.kids)
            elif getattr(x, "_merged_dirty", False):
                x.subqueries[:] = [
                    k for k in (self._finish_pend(k)
                                for k in self._fold(x.subqueries)
                                if not isinstance(k, str))
                    if k is not _EMPTY
                ]
                x._merged_dirty = False
        return items

    def _finish_pend(self, x):
        if not isinstance(x, _Pend):
            return x
        # _EMPTY kids evaporate at build time (reference GroupNode.query
        # filters None sub-queries; BinaryGroup.query degenerates to the
        # surviving side, syntax.py:343-366)
        kids = [k for k in (self._finish_pend(k) for k in x.kids
                            if not isinstance(k, str))
                if k is not _EMPTY]
        cls = self._BINARY_CLS.get(x.opname)
        if cls is not None:
            if len(kids) == 2:
                return cls(kids[0], kids[1])
            # BinaryGroup.query (reference syntax.py:352-364): one empty
            # side degenerates to the survivor; BOTH empty -> NullQuery,
            # a REAL query that then nulls an enclosing AndMaybe/AndNot
            # a-side at normalize
            return kids[0] if kids else Q.NullQuery
        if not kids:
            return Q.NullQuery  # AndGroup([]) builds And([]) -> Null
        if len(kids) == 1:
            return kids[0]
        return Q.And(kids) if x.opname == "AND" else Q.Or(kids)

    def _structure(self, items: list) -> Q.Query:
        """Resolve infix operators (binary ops bind tighter than OR; OR
        tighter than implicit AND adjacency — empirically matching the
        reference's OperatorsPlugin output on the supported subset)."""
        items = self._structure_items(items)
        if not items:
            return Q.NullQuery
        if len(items) == 1:
            return items[0]
        return Q.Or(items) if self.group == "or" else Q.And(items)

    def _fan(self, field, make):
        """Build a leaf for a concrete field, or fan an unfielded leaf across
        the multifield list (each with its field boost), grouped by
        multifield_group."""
        if field is not None or self.multifield is None:
            f = field if field is not None else self.default_field
            if self.copyfields and f in self.copyfields:
                # CopyFieldPlugin: the copy re-analyzes with the TARGET
                # field's analyzer (reference copies the pre-analysis node)
                q1 = make(f, 1.0)
                q2 = make(self.copyfields[f], 1.0)
                if q1 is None or q2 is None:
                    return q1 if q1 is not None else q2
                g = self.copyfield_group
                if g is None:
                    return _Inline([q1, q2])
                if g == "andmaybe":
                    return Q.AndMaybe(q1, q2)
                if g == "require":
                    return Q.Require(q1, q2)
                return Q.Or([q1, q2])
            return make(f, 1.0)
        subs = []
        for f in self.multifield:
            q = make(f, float(self.fieldboosts.get(f, 1.0)))
            if q is not None:
                subs.append(q)
        if not subs:
            return None
        if len(subs) == 1:
            return subs[0]
        if self.multifield_group == "dismax":
            return Q.DisjunctionMax(subs)
        return Q.Or(subs)

    def _parse_unit(self, field: str):
        t = self._next()
        if t is None:
            return None
        if t.kind == "dtspan":
            # free-mode DateTagger result -> DateTimeNode.query semantics
            # (dateparse.py:860-873): exact instant == inclusive lo=hi range
            fname, lo, hi = t.value
            return Q.DateRange(fname, lo, hi,
                               boost=t.extra.get("boost", 1.0))
        if t.kind == "func":
            # FunctionPlugin: consume the immediately-following group (if
            # any) as the sub-query list; its ^boost becomes kwargs['boost']
            fn = (self.functions or {}).get(t.value)
            if fn is None:
                return self._fan(field, lambda f, fb: self._make_word(f, "#" + t.value, fb))
            qs: list = []
            gboost = None
            nxt = self._peek()
            if nxt is not None and nxt.kind == "(":
                self._next()
                qs = self._parse_group(field, stop_at_rparen=True, as_list=True)
                closing = self._next()
                if closing is not None and closing.kind == ")":
                    gboost = closing.extra.get("boost")
            kwargs = dict(t.extra["kwargs"])
            if "boost" not in kwargs and gboost is not None:
                kwargs["boost"] = gboost
            return fn(qs, *t.extra["args"], **kwargs)
        if t.kind == "field":
            fieldname = self._aliases.get(t.value, t.value)
            if fieldname in self.pseudofields:
                # PseudoFieldPlugin: the node parses UNFIELDED, then the
                # user fn transforms it (may return None to drop)
                sub = self._parse_unit(None)
                if isinstance(sub, _Inline) or sub is None or sub is _EMPTY:
                    return sub
                return self.pseudofields[fieldname](sub)
            nxt = self._peek()
            if nxt is not None and nxt.kind == "(":
                self._next()
                start_pos = self._pos
                items = self._parse_group(fieldname, stop_at_rparen=True,
                                          raw=True)
                closing = self._next()  # consume ')'
                if closing is None:
                    # unmatched open paren after a fieldname: the bracket
                    # drops BEFORE fieldnames apply in the reference
                    # (brackets filter 50 < fieldnames 100), so the field
                    # binds only the first unit ("title:(alfa delta" ->
                    # title:alfa AND text:delta). Re-parse from after the
                    # paren with that scoping.
                    self._pos = start_pos
                    first = self._parse_unit(fieldname)
                    rest = self._parse_group(field, stop_at_rparen=True,
                                             raw=True)
                    self._next()  # EOF
                    out = _Inline([] if first is None else [first])
                    out.extend(rest)
                    return out
                q = self._structure(items)
                if closing.kind == ")" and closing.extra.get("boost"):
                    q = q.with_boost(q.boost * closing.extra["boost"])
                return self._mark_paren_group(q)
            return self._parse_unit(fieldname)
        if t.kind == "(":
            start_pos = self._pos
            items = self._parse_group(field, stop_at_rparen=True, raw=True)
            closing = self._next()
            if closing is None:
                # unmatched open paren: the reference bracket filter drops
                # it, so the contents (incl. operator markers) fold at the
                # PARENT level ("alfa ( OR bravo" == Or([alfa, bravo]))
                del start_pos
                return _Inline(items)
            q = self._structure(items)
            if closing.kind == ")" and closing.extra.get("boost"):
                q = q.with_boost(q.boost * closing.extra["boost"])
            return self._mark_paren_group(q)
        if t.kind == ")":
            return None
        if t.kind == "phrase":
            q = self._fan(field, lambda f, fb: self._make_phrase(
                f, t.value, t.extra["slop"], t.extra["boost"] * fb))
            return Q.NullQuery if q is None else q
        if t.kind == "range":
            start, end = t.value
            return self._fan(field, lambda f, fb: self._make_range(
                f, start, end, t.extra["startexcl"], t.extra["endexcl"],
                t.extra["boost"] * fb))
        if t.kind == "rgx":
            if self.regex:
                return self._fan(field, lambda f, fb: Q.Regex(
                    f, t.value, boost=t.extra["boost"] * fb))
            # without the plugin, r"..." is the word 'r' adjacent to a phrase
            rest = self._fan(field, lambda f, fb: self._make_phrase(f, t.value, 1, t.extra["boost"] * fb))
            w = self._fan(field, lambda f, fb: self._make_word(f, "r", fb))
            parts = [p for p in (w, rest) if p is not None]
            return Q.And(parts) if len(parts) > 1 else (parts[0] if parts else _EMPTY)
        if t.kind == "op":  # operator in unit position: treat as plain word
            q = self._fan(field, lambda f, fb: self._make_word(f, t.value, fb))
            return _EMPTY if q is None else q
        if t.kind == "word":
            q = self._fan(field, lambda f, fb: self._make_word(f, t.value, t.extra["boost"] * fb))
            return _EMPTY if q is None else q
        return None

    # --------------------------------------------------------- word -> query

    def _analyzer(self, field: str):
        if field in self.schema:
            f = self.schema[field]
            return f.query_analyzer or f.analyzer
        from whoosh_spark.analysis import standard_analyzer

        return standard_analyzer()

    def _make_range(self, field: str, start: str, end: str,
                    startexcl: bool, endexcl: bool, boost: float):
        kind = self._field_kind(field)
        if kind == "datetime":
            from whoosh_spark.query.dateparse import date_range_bounds

            lo, hi = date_range_bounds(start or None, end or None, self.basedate)
            # the reference SILENTLY DROPS exclusivity flags for datetime
            # ranges: DateRangeNode.query (dateparse.py:889-894) and the
            # DATETIME.parse_range fallback (fields.py:907) both build
            # inclusive ranges, so date:{2010 TO 2011} == date:[2010 TO 2011]
            return Q.DateRange(field, lo, hi, boost=boost)
        if kind == "numeric":
            return Q.NumericRange(
                field,
                self._column_value(kind, start) if start else None,
                self._column_value(kind, end) if end else None,
                startexcl=startexcl, endexcl=endexcl, boost=boost,
            )
        return Q.TermRange(
            field,
            self._range_text(field, start) if start else None,
            self._range_text(field, end) if end else None,
            startexcl=startexcl, endexcl=endexcl, boost=boost,
        )

    def _range_text(self, field: str, text: str) -> str:
        # reference RangeNode.query (syntax.py:486-491): endpoints go through
        # get_single_text(tokenize=False, removestops=False) — the whole
        # string as one token, stop words kept
        ana = self._analyzer(field)
        return ana.single_text(text) if ana else text

    def _field_kind(self, field: str) -> str:
        return self.schema[field].kind if field in self.schema else "text"

    def _column_value(self, kind: str, text: str):
        if kind == "numeric":
            try:
                return int(text)
            except ValueError:
                return float(text)
        if kind == "boolean":
            # reference fields.py:923-924 accepted strings
            low = text.lower()
            if low in ("t", "true", "yes", "1"):
                return True
            if low in ("f", "false", "no", "0"):
                return False
            raise ValueError(f"not a boolean: {text!r}")
        return text

    def _make_column_query(self, field: str, kind: str, text: str, boost: float):
        """Non-indexed schema kinds: NUMERIC equality, BOOLEAN, DATETIME
        (a date term matches its whole timespan)."""
        from whoosh_spark.query.dateparse import date_term_range

        if kind == "datetime":
            span = date_term_range(text, self.basedate)
            if span is None:
                # reference: grammar AND _parse_datestring fallback both
                # failed -> error_query -> NullQuery (matches nothing)
                return Q.NullQuery
            lo, hi = span
            return Q.DateRange(field, lo, hi, boost=boost)
        return Q.ColumnTerm(field, self._column_value(kind, text), boost=boost)

    def _make_word(self, field: str, text: str, boost: float):
        kind = self._field_kind(field)
        if kind in ("numeric", "boolean", "datetime") and text != "*":
            if self.gtlt:
                m = re.match(r"^(>=|<=|=>|=<|>|<)(.+)$", text)
                if m:
                    op, operand = m.group(1), m.group(2)
                    op = {"=>": ">=", "=<": "<="}.get(op, op)
                    # the reference's SingleQuotePlugin strips the
                    # quotes before the GtLt filter sees the operand
                    if (len(operand) >= 2 and operand.startswith("'")
                            and operand.endswith("'")):
                        operand = operand[1:-1]
                    cls = Q.DateRange if kind == "datetime" else Q.NumericRange
                    if kind == "datetime":
                        # reference GtLtPlugin.make_range (plugins.py:1128-
                        # 1137) builds a one-sided RangeNode, so the endpoint
                        # goes through range_to_dt: a lone start always uses
                        # its span's FLOOR (even for ">") and a lone end its
                        # CEIL (even for "<").
                        from whoosh_spark.query.dateparse import (
                            date_range_bounds,
                        )

                        lo, _ = date_range_bounds(operand, None,
                                                  self.basedate)
                        _, hi = date_range_bounds(None, operand,
                                                  self.basedate)
                    else:
                        lo = hi = self._column_value(kind, operand)
                    # datetime gtlt ranges are INCLUSIVE regardless of the
                    # operator: DateRangeNode drops the excl flags
                    # (dateparse.py:889-894)
                    dtk = kind == "datetime"
                    if op == ">":
                        return cls(field, lo, None,
                                   startexcl=not dtk, boost=boost)
                    if op == ">=":
                        return cls(field, lo, None, boost=boost)
                    if op == "<":
                        return cls(field, None, hi,
                                   endexcl=not dtk, boost=boost)
                    return cls(field, None, hi, boost=boost)
            return self._make_column_query(field, kind, text, boost)
        if self.gtlt:
            m = re.match(r"^(>=|<=|=>|=<|>|<)(.+)$", text)
            if m:
                op, operand = m.group(1), m.group(2)
                op = {"=>": ">=", "=<": "<="}.get(op, op)
                # the reference's SingleQuotePlugin strips the
                # quotes before the GtLt filter sees the operand
                if (len(operand) >= 2 and operand.startswith("'")
                        and operand.endswith("'")):
                    operand = operand[1:-1]
                operand = self._range_text(field, operand)
                if op == ">":
                    return Q.TermRange(field, operand, None, startexcl=True, boost=boost)
                if op == ">=":
                    return Q.TermRange(field, operand, None, boost=boost)
                if op == "<":
                    return Q.TermRange(field, None, operand, endexcl=True, boost=boost)
                return Q.TermRange(field, None, operand, boost=boost)
        if self.fuzzy:
            m = re.match(r"^(.+?)~(\d*)(?:/(\d+))?$", text)
            if m:
                base, dist, pref = m.group(1), m.group(2), m.group(3)
                terms = self._analyzer(field).query_terms(base) if self._analyzer(field) else [base]
                if terms:
                    return Q.FuzzyTerm(
                        field, terms[0],
                        maxdist=int(dist) if dist else 1,
                        prefixlength=int(pref) if pref else 0,
                        boost=boost,
                    )
        if text == "*":
            return Q.Every(None if field in (self.default_field, None) else field, boost=boost)
        if "*" in text or "?" in text:
            return Q.Wildcard(field, text if not self._lowercases(field) else text.lower(), boost=boost).normalize()
        ana = self._analyzer(field)
        terms = ana.query_terms(text) if ana else [text]
        if not terms:
            return None
        if len(terms) == 1:
            return Q.Term(field, terms[0], boost=boost)
        # multitoken_query (reference fields.py:304-312 + default.py
        # multitoken handling): the FIELD decides how several analyzed
        # tokens combine; "default" keeps the historical And grouping
        mtq = self.schema[field].multitoken_query if field in self.schema else "default"
        if mtq == "or":
            return Q.Or([Q.Term(field, t) for t in terms], boost=boost)
        if mtq == "phrase":
            return Q.Phrase(field, terms, boost=boost).normalize()
        if mtq == "first":
            return Q.Term(field, terms[0], boost=boost)
        return Q.And([Q.Term(field, t) for t in terms], boost=boost)

    def _lowercases(self, field: str) -> bool:
        ana = self._analyzer(field)
        return bool(ana and ana.lowercase)

    def _make_phrase(self, field: str, text: str, slop: int, boost: float):
        kind = self._field_kind(field)
        if kind in ("numeric", "boolean", "datetime"):
            # quoted value on a column field, e.g. date:"may 2011"
            return self._make_column_query(field, kind, text, boost)
        ana = self._analyzer(field)
        words = ana.query_terms(text) if ana else text.split()
        if not words:
            return None
        return Q.Phrase(field, words, slop=slop, boost=boost).normalize()


# ------------------------------------------------------------- preset parsers

def MultifieldParser(fieldnames: list[str], schema: IndexSchema,
                     fieldboosts: dict | None = None, **kw) -> QueryParser:
    """Unfielded clauses search ALL the given fields as an OR
    (reference qparser/default.py:384-404)."""
    return QueryParser(None, schema, multifield=list(fieldnames),
                       fieldboosts=fieldboosts, **kw)


def SimpleParser(fieldname: str, schema: IndexSchema, **kw) -> QueryParser:
    """Human-friendly parser: only +required / -prohibited / "phrase"
    syntax, implicit OR (reference qparser/default.py:407-419)."""
    return QueryParser(fieldname, schema, plusminus=True, operators=False,
                       group="or", **kw)


def DisMaxParser(fieldboosts: dict, schema: IndexSchema, **kw) -> QueryParser:
    """SimpleParser syntax; each term becomes a DisjunctionMax across the
    boosted fields (reference qparser/default.py:422-443)."""
    return QueryParser(None, schema, plusminus=True, operators=False,
                       group="or", multifield=list(fieldboosts),
                       fieldboosts=dict(fieldboosts),
                       multifield_group="dismax", **kw)
