"""Query algebra: the logical operators of the engine.

Node classes carry the same *semantics* as the reference query objects
(/root/reference/src/whoosh/query/ — qcore.py, terms.py, compound.py,
wrappers.py, positional.py, ranges.py) with ``normalize()`` rewrites
replicating the reference's logical optimizer (compound.py:119-188 and the
per-class normalize methods). Physical planning onto DataFrames lives in
whoosh_spark/search/engine.py.

Score semantics (verified empirically against the reference):
  And/Or           sum of matching children's scores
  DisjunctionMax   max of matching children's scores
  Not              complement docs, constant score 1.0 (InverseMatcher weight)
  And w/ Not child positive join minus Not docs, +1.0 per Not child
  AndNot(a, b)     a's docs minus b's, a's scores
  Require(a, b)    docs in both, a's scores only
  AndMaybe(a, b)   a's docs; score a + b where b matches
  Every            all docs, score 1.0
  Phrase           docs passing the SpanNear2 position chain; score = sum of
                   the words' term scores
"""

from __future__ import annotations

import re
from fnmatch import translate as glob_translate

import pandas as pd  # needed at module scope: pandas_udf resolves the
# (stringified, PEP-563) type hints of spark_exact_predicate's kernel
# against this module's globals


class Query:
    boost: float = 1.0

    def normalize(self) -> "Query":
        return self

    def children(self) -> list["Query"]:
        return []

    def estimate_size(self, stats) -> int:
        """stats: object with .df(field, term) and .doc_count()."""
        raise NotImplementedError

    def leaf_terms(self) -> list[tuple[str, str]]:
        """All (field, term) pairs whose postings this query may read."""
        out = []
        for c in self.children():
            out.extend(c.leaf_terms())
        return out

    def with_boost(self, boost: float) -> "Query":
        import copy

        q = copy.copy(self)
        q.boost = boost
        return q

    # ---- tree introspection / rewriting (reference qcore.py:291-455) ----

    def is_leaf(self) -> bool:
        return not self.children()

    def leaves(self):
        """Leaf queries, depth-first (reference qcore.py:400-410)."""
        cs = self.children()
        if not cs:
            yield self
        for c in cs:
            yield from c.leaves()

    def apply(self, fn) -> "Query":
        """Copy of this query with ``fn`` applied to each direct child
        (reference qcore.py:271-289). Leaves copy unchanged."""
        import copy

        return copy.copy(self)

    def replace(self, fieldname: str, oldtext: str, newtext: str) -> "Query":
        """Copy with every occurrence of (fieldname, oldtext) replaced by
        newtext (reference qcore.py:291-306)."""
        import copy

        if self.is_leaf():
            return copy.copy(self)
        return self.apply(lambda q: q.replace(fieldname, oldtext, newtext))

    def iter_all_terms(self, phrases: bool = True):
        """(field, text) pairs of every concrete term in the tree
        (reference qcore.py:412-430)."""
        for leaf in self.leaves():
            if not phrases and isinstance(leaf, Phrase):
                continue
            yield from leaf.leaf_terms()

    def all_terms(self, phrases: bool = True) -> set:
        return set(self.iter_all_terms(phrases=phrases))

    def existing_terms(self, ix, phrases: bool = True) -> set:
        """The subset of all_terms() that actually occur in the index
        (reference qcore.py:338-368) — one bounded stats lookup per field."""
        from collections import defaultdict

        by_field = defaultdict(set)
        for f, t in self.all_terms(phrases=phrases):
            by_field[f].add(t)
        out = set()
        for f, ts in by_field.items():
            out.update((f, t) for t in ix.term_stats(f, sorted(ts)))
        return out

    def __or__(self, other):
        return Or([self, other])

    def __and__(self, other):
        return And([self, other])

    def __sub__(self, other):
        return And([self, Not(other)])


class _NullQuery(Query):
    def normalize(self):
        return self

    def estimate_size(self, stats):
        return 0

    def __repr__(self):
        return "NullQuery"


NullQuery = _NullQuery()


class Term(Query):
    """Leaf: documents containing ``text`` in ``field``
    (reference query/terms.py:40-142)."""

    def __init__(self, field: str, text: str, boost: float = 1.0):
        self.field = field
        self.text = text
        self.boost = boost

    def __repr__(self):
        b = f", boost={self.boost}" if self.boost != 1.0 else ""
        return f"Term({self.field!r}, {self.text!r}{b})"

    def __eq__(self, other):
        return (
            isinstance(other, Term)
            and (self.field, self.text, self.boost) == (other.field, other.text, other.boost)
        )

    def __hash__(self):
        return hash((Term, self.field, self.text, self.boost))

    def estimate_size(self, stats):
        return stats.df(self.field, self.text)

    def leaf_terms(self):
        return [(self.field, self.text)]

    def replace(self, fieldname, oldtext, newtext):
        if self.field == fieldname and self.text == oldtext:
            return Term(self.field, newtext, boost=self.boost)
        return Term(self.field, self.text, boost=self.boost)


class CompoundQuery(Query):
    JOINT = " ? "

    def __init__(self, subqueries: list[Query], boost: float = 1.0):
        self.subqueries = list(subqueries)
        self.boost = boost

    def children(self):
        return self.subqueries

    def __repr__(self):
        return f"{type(self).__name__}({self.subqueries!r})"

    def __eq__(self, other):
        return (
            type(self) is type(other)
            and self.subqueries == other.subqueries
            and self.boost == other.boost
        )

    def __hash__(self):
        return hash((type(self).__name__, tuple(map(hash, self.subqueries)), self.boost))

    def _rebuild(self, subs):
        return type(self)(subs, boost=self.boost)

    def apply(self, fn):
        import copy

        q = copy.copy(self)
        q.subqueries = [fn(s) for s in self.subqueries]
        return q

    #: And/Require-like compounds intersect overlapping ranges; Or-like union
    intersect_merge = True

    def normalize(self):
        # full reference algorithm (compound.py:119-188): normalize children,
        # flatten same-class nesting distributing boosts, unfielded Every
        # absorbs, merge overlapping ranges, Every(field) removes same-field
        # siblings, dedupe, drop Null, collapse singletons
        subs = []
        for q in self.subqueries:
            q = q.normalize()
            if type(q) is type(self):
                subs.extend(ss.with_boost(ss.boost * q.boost) for ss in q.subqueries)
            else:
                subs.append(q)

        if all(q is NullQuery for q in subs):
            return NullQuery
        if any(isinstance(q, Every) and q.field is None for q in subs):
            return Every()

        everyfields = set()
        i = 0
        while i < len(subs):
            q = subs[i]
            qf = getattr(q, "field", None)
            if isinstance(qf, str) and qf in everyfields:
                subs.pop(i)
                continue
            if isinstance(q, TermRange):
                j = i + 1
                while j < len(subs):
                    if q.overlaps(subs[j]):
                        qq = subs.pop(j)
                        q = q.merge(qq, intersect=self.intersect_merge)
                    else:
                        j += 1
                q = subs[i] = q.normalize()
            if isinstance(q, Every):
                everyfields.add(q.field)
            i += 1

        seen = []
        for q in subs:
            qf = getattr(q, "field", None)
            if not isinstance(q, Every) and isinstance(qf, str) and qf in everyfields:
                continue
            if q is NullQuery or q in seen:
                continue
            seen.append(q)
        subs = seen
        if not subs:
            return NullQuery
        if len(subs) == 1:
            s = subs[0]
            if not (self.boost == 1.0 and s.boost == 1.0):
                s = s.with_boost(s.boost * self.boost)
            return s
        return self._rebuild(subs)


class And(CompoundQuery):
    JOINT = " AND "

    def estimate_size(self, stats):
        return min(q.estimate_size(stats) for q in self.subqueries)


class Or(CompoundQuery):
    JOINT = " OR "
    intersect_merge = False

    def __init__(self, subqueries, boost: float = 1.0, minmatch: int = 0, scale=None):
        super().__init__(subqueries, boost)
        self.minmatch = minmatch
        self.scale = scale

    def _rebuild(self, subs):
        return Or(subs, boost=self.boost, minmatch=self.minmatch, scale=self.scale)

    def estimate_size(self, stats):
        return min(sum(q.estimate_size(stats) for q in self.subqueries), stats.doc_count())


class DisjunctionMax(CompoundQuery):
    JOINT = " dismax "

    def __init__(self, subqueries, boost: float = 1.0, tiebreak: float = 0.0):
        super().__init__(subqueries, boost)
        self.tiebreak = tiebreak

    def _rebuild(self, subs):
        return DisjunctionMax(subs, boost=self.boost, tiebreak=self.tiebreak)

    def estimate_size(self, stats):
        return min(sum(q.estimate_size(stats) for q in self.subqueries), stats.doc_count())


class Not(Query):
    def __init__(self, query: Query, boost: float = 1.0):
        self.query = query
        self.boost = boost

    def __repr__(self):
        return f"Not({self.query!r})"

    def __eq__(self, other):
        return isinstance(other, Not) and self.query == other.query

    def __hash__(self):
        return hash((Not, hash(self.query)))

    def children(self):
        return [self.query]

    def apply(self, fn):
        import copy

        q = copy.copy(self)
        q.query = fn(self.query)
        return q

    def normalize(self):
        q = self.query.normalize()
        if q is NullQuery:
            return NullQuery
        n = Not(q, boost=self.boost)
        return n

    def estimate_size(self, stats):
        return stats.doc_count()


class BinaryQuery(Query):
    def __init__(self, a: Query, b: Query, boost: float = 1.0):
        self.a = a
        self.b = b
        self.boost = boost

    def children(self):
        return [self.a, self.b]

    def apply(self, fn):
        import copy

        q = copy.copy(self)
        q.a, q.b = fn(self.a), fn(self.b)
        return q

    def __repr__(self):
        return f"{type(self).__name__}({self.a!r}, {self.b!r})"

    def __eq__(self, other):
        return type(self) is type(other) and self.a == other.a and self.b == other.b

    def __hash__(self):
        return hash((type(self).__name__, hash(self.a), hash(self.b)))

    def normalize(self):
        a = self.a.normalize()
        b = self.b.normalize()
        if a is NullQuery:
            return NullQuery
        if b is NullQuery:
            return a
        return type(self)(a, b, boost=self.boost)

    def estimate_size(self, stats):
        return self.a.estimate_size(stats)


class AndNot(BinaryQuery):
    """a minus b (reference compound.py:546-573)."""


class Require(BinaryQuery):
    """a's docs that also match b; scores from a (compound.py:590-624)."""

    def normalize(self):
        # reference Require.normalize (compound.py:611-616): EITHER side
        # Null nulls the whole query (unlike AndNot/AndMaybe, where a
        # Null b-side degrades to a)
        a = self.a.normalize()
        b = self.b.normalize()
        if a is NullQuery or b is NullQuery:
            return NullQuery
        return Require(a, b, boost=self.boost)


class AndMaybe(BinaryQuery):
    """a's docs; add b's score where b matches (compound.py:627-652)."""


def BooleanQuery(required, should, prohibited) -> "Query":
    """Lucene-style boolean composition (reference compound.py:655-657):
    ``AndNot(AndMaybe(And(required), Or(should)), Or(prohibited))``,
    normalized. Faithfully keeps the reference quirk that an empty
    ``required`` list normalizes the whole query to NullQuery (And([]) ->
    NullQuery propagates through AndMaybe) — should-only boolean queries
    need an explicit Or."""
    return AndNot(AndMaybe(And(list(required)), Or(list(should))),
                  Or(list(prohibited))).normalize()


class Otherwise(BinaryQuery):
    """b only if a matches nothing (compound.py:576-587)."""

    def normalize(self):
        a = self.a.normalize()
        b = self.b.normalize()
        if a is NullQuery:
            return b
        if b is NullQuery:
            return a
        return Otherwise(a, b, boost=self.boost)


class Phrase(Query):
    """Words within ``slop``, in order (reference positional.py:121-249;
    physical semantics = SpanNear2(ordered=True, mindist=1))."""

    def __init__(self, field: str, words: list[str], slop: int = 1, boost: float = 1.0):
        self.field = field
        self.words = list(words)
        self.slop = slop
        self.boost = boost

    def __repr__(self):
        return f"Phrase({self.field!r}, {self.words!r}, slop={self.slop})"

    def __eq__(self, other):
        return (
            isinstance(other, Phrase)
            and (self.field, self.words, self.slop, self.boost)
            == (other.field, other.words, other.slop, other.boost)
        )

    def __hash__(self):
        return hash((Phrase, self.field, tuple(self.words), self.slop, self.boost))

    def normalize(self):
        words = [w for w in self.words if w is not None]
        if not words:
            return NullQuery
        if len(words) == 1:
            return Term(self.field, words[0], boost=self.boost)
        return Phrase(self.field, words, slop=self.slop, boost=self.boost)

    def estimate_size(self, stats):
        return min(stats.df(self.field, w) for w in self.words)

    def leaf_terms(self):
        return [(self.field, w) for w in self.words]

    def replace(self, fieldname, oldtext, newtext):
        import copy

        q = copy.copy(self)
        if self.field == fieldname:
            q.words = [newtext if w == oldtext else w for w in self.words]
        return q


class Ordered(Phrase):
    """Sub-terms must occur in document order, at any distance (reference
    query/positional.py:37-75; verified: matches in-order occurrences only).
    Implemented as the SpanNear2 chain with an unbounded slop."""

    def __init__(self, field: str, words: list, boost: float = 1.0):
        super().__init__(field, words, slop=1 << 30, boost=boost)

    def __repr__(self):
        return f"Ordered({self.field!r}, {self.words!r})"

    def normalize(self):
        words = [w for w in self.words if w is not None]
        if not words:
            return NullQuery
        if len(words) == 1:
            return Term(self.field, words[0], boost=self.boost)
        return Ordered(self.field, words, boost=self.boost)


class MultiTerm(Query):
    """Base for queries that expand to a set of matching terms against the
    lexicon (reference terms.py:148-229 simplify-to-Or semantics).

    ``constantscore=True`` (the reference default for Prefix/Wildcard/Regex/
    TermRange, terms.py:240-243 / ranges.py:143) makes a multi-term expansion
    score every match exactly 1.0 (boost is NOT applied — verified against
    the reference); a single-term expansion still scores normally."""

    constantscore = False

    def __init__(self, field: str, boost: float = 1.0):
        self.field = field
        self.boost = boost

    def term_predicate(self, term: str) -> bool:
        raise NotImplementedError

    def spark_term_filter(self):
        """Optional: a pyspark Column predicate over F.col('term') used to
        push the expansion into the lexicon scan (may be a *partial* filter,
        e.g. just a literal-prefix pushdown). None -> no pushdown."""
        return None

    def spark_exact_predicate(self):
        """Full-fidelity Column predicate over F.col('term') — semantically
        identical to ``term_predicate``. The default wraps ``term_predicate``
        in an Arrow-batched pandas UDF so expansion stays distributed even
        for patterns with no native Spark equivalent (Python-regex Wildcard/
        Regex). Subclasses with exact native expressions override."""
        from pyspark.sql import functions as F
        from pyspark.sql.pandas.functions import pandas_udf

        pred = self.term_predicate

        @pandas_udf("boolean")
        def _pred(s: pd.Series) -> pd.Series:
            return s.map(pred)

        return _pred(F.col("term"))

    def estimate_size(self, stats):
        return stats.doc_count()

    def leaf_terms(self):
        return []  # resolved against the lexicon at plan time

    def __eq__(self, other):
        return type(self) is type(other) and self.__dict__ == other.__dict__

    def __hash__(self):
        return hash((type(self).__name__, tuple(sorted(self.__dict__.items(), key=lambda kv: kv[0]))))


class Prefix(MultiTerm):
    constantscore = True
    def __init__(self, field: str, text: str, boost: float = 1.0):
        super().__init__(field, boost)
        self.text = text

    def __repr__(self):
        return f"Prefix({self.field!r}, {self.text!r})"

    def term_predicate(self, term):
        return term.startswith(self.text)

    def spark_term_filter(self):
        from pyspark.sql import functions as F

        return F.col("term").startswith(self.text)

    def spark_exact_predicate(self):
        return self.spark_term_filter()  # startswith is the full predicate


class Wildcard(MultiTerm):
    constantscore = True
    def __init__(self, field: str, pattern: str, boost: float = 1.0):
        super().__init__(field, boost)
        self.pattern = pattern
        self._re = re.compile(glob_translate(pattern))

    def __repr__(self):
        return f"Wildcard({self.field!r}, {self.pattern!r})"

    def term_predicate(self, term):
        return bool(self._re.match(term))

    def spark_term_filter(self):
        from pyspark.sql import functions as F

        # literal prefix pushdown (reference terms.py:264-272)
        prefix = re.split(r"[*?\[]", self.pattern, maxsplit=1)[0]
        if prefix:
            return F.col("term").startswith(prefix)
        return None

    def normalize(self):
        # degenerate patterns (reference terms.py:332-348)
        text = self.pattern
        if text == "*":
            return Every(self.field, boost=self.boost)
        if "*" not in text and "?" not in text and "[" not in text:
            return Term(self.field, text, boost=self.boost)
        if text.endswith("*") and "*" not in text[:-1] and "?" not in text[:-1] and "[" not in text[:-1]:
            return Prefix(self.field, text[:-1], boost=self.boost)
        return self

    def __eq__(self, other):
        return (
            type(self) is type(other)
            and (self.field, self.pattern, self.boost) == (other.field, other.pattern, other.boost)
        )

    def __hash__(self):
        return hash((Wildcard, self.field, self.pattern, self.boost))


class Regex(MultiTerm):
    constantscore = True
    def __init__(self, field: str, pattern: str, boost: float = 1.0):
        super().__init__(field, boost)
        self.pattern = pattern
        self._re = re.compile(pattern)

    def __repr__(self):
        return f"Regex({self.field!r}, {self.pattern!r})"

    def term_predicate(self, term):
        return bool(self._re.search(term))

    def __eq__(self, other):
        return (
            type(self) is type(other)
            and (self.field, self.pattern, self.boost) == (other.field, other.pattern, other.boost)
        )

    def __hash__(self):
        return hash((Regex, self.field, self.pattern, self.boost))


class FuzzyTerm(MultiTerm):
    """Terms within Damerau-ish edit distance (we use plain Levenshtein via
    Spark's built-in, reference terms.py:420-485 uses a Levenshtein DFA —
    unnecessary over a distinct-terms DataFrame)."""

    def __init__(self, field: str, text: str, maxdist: int = 1, prefixlength: int = 1, boost: float = 1.0):
        super().__init__(field, boost)
        self.text = text
        self.maxdist = maxdist
        self.prefixlength = prefixlength

    def __repr__(self):
        return f"FuzzyTerm({self.field!r}, {self.text!r}, maxdist={self.maxdist})"

    def term_predicate(self, term):
        if not term.startswith(self.text[: self.prefixlength]):
            return False
        return _levenshtein(term, self.text) <= self.maxdist

    def spark_term_filter(self):
        from pyspark.sql import functions as F

        cond = F.levenshtein(F.col("term"), F.lit(self.text)) <= self.maxdist
        if self.prefixlength:
            cond = cond & F.col("term").startswith(self.text[: self.prefixlength])
        return cond

    def spark_exact_predicate(self):
        # Spark's levenshtein == plain Levenshtein == term_predicate's DP
        return self.spark_term_filter()

    def __eq__(self, other):
        return type(self) is type(other) and (
            self.field, self.text, self.maxdist, self.prefixlength, self.boost,
        ) == (other.field, other.text, other.maxdist, other.prefixlength, other.boost)

    def __hash__(self):
        return hash((FuzzyTerm, self.field, self.text, self.maxdist, self.prefixlength, self.boost))


class Variations(MultiTerm):
    """Morphological variants of a word that exist in the lexicon
    (reference query/terms.py:488-510 Variations): candidates come from
    the LiteMorph_en rules/exception tables (analysis/morph_en.py, a
    faithful re-expression of lang/morph_en.py incl. its irregular-form
    exception families), and those present in the index match, each scored
    as its own Term (constantscore=False). The candidate set is a small
    driver-side literal, so the lexicon filter pushes down as a native
    IN-list — no UDF, no collect."""

    def __init__(self, field: str, text: str, boost: float = 1.0):
        super().__init__(field, boost)
        self.text = text

    def __repr__(self):
        return f"Variations({self.field!r}, {self.text!r})"

    def _candidates(self) -> frozenset:
        from whoosh_spark.analysis.morph_en import variations

        return frozenset(variations(self.text))

    def term_predicate(self, term):
        return term in self._candidates()

    def spark_exact_predicate(self):
        from pyspark.sql import functions as F

        return F.col("term").isin(*sorted(self._candidates()))

    def __eq__(self, other):
        return type(self) is type(other) and (
            self.field, self.text, self.boost) == (other.field, other.text, other.boost)

    def __hash__(self):
        return hash((Variations, self.field, self.text, self.boost))


class TermRange(MultiTerm):
    constantscore = True
    def __init__(self, field: str, start: str | None, end: str | None,
                 startexcl: bool = False, endexcl: bool = False, boost: float = 1.0):
        super().__init__(field, boost)
        self.start = start
        self.end = end
        self.startexcl = startexcl
        self.endexcl = endexcl

    def __repr__(self):
        return f"TermRange({self.field!r}, {self.start!r}, {self.end!r})"

    def term_predicate(self, term):
        if self.start is not None:
            if self.startexcl and term <= self.start:
                return False
            if not self.startexcl and term < self.start:
                return False
        if self.end is not None:
            if self.endexcl and term >= self.end:
                return False
            if not self.endexcl and term > self.end:
                return False
        return True

    def spark_term_filter(self):
        from pyspark.sql import functions as F

        cond = F.lit(True)
        if self.start is not None:
            cond = cond & (F.col("term") > self.start if self.startexcl else F.col("term") >= self.start)
        if self.end is not None:
            cond = cond & (F.col("term") < self.end if self.endexcl else F.col("term") <= self.end)
        return cond

    def spark_exact_predicate(self):
        return self.spark_term_filter()  # the bounds are the full predicate

    def normalize(self):
        # degenerate forms (reference ranges.py:164-175)
        if self.start is None and self.end is None:
            return Every(self.field, boost=self.boost)
        if (
            self.start is not None
            and self.start == self.end
            and not self.startexcl
            and not self.endexcl
        ):
            return Term(self.field, self.start, boost=self.boost)
        return self

    # comparable (rank, value, excl) keys shared between starts and ends so
    # cross-comparisons work (reference ranges.py:60-82 Lowest/Highest)
    def _cmp_start(self):
        if self.start is None:
            return (0, "", 0)
        return (1, self.start, 1 if self.startexcl else 0)

    def _cmp_end(self):
        if self.end is None:
            return (2, "", 0)
        return (1, self.end, -1 if self.endexcl else 0)

    def overlaps(self, other) -> bool:
        """reference ranges.py:84-98"""
        if not isinstance(other, TermRange) or self.field != other.field:
            return False
        s1, s2 = self._cmp_start(), other._cmp_start()
        e1, e2 = self._cmp_end(), other._cmp_end()
        return (
            (s2 <= s1 <= e2) or (s2 <= e1 <= e2) or (s1 <= s2 <= e1) or (s1 <= e2 <= e1)
        )

    def merge(self, other: "TermRange", intersect: bool = True) -> "TermRange":
        """reference ranges.py:100-131 (note: a range fully containing the
        other yields the CONTAINING range even in intersect mode — replicated)"""
        assert self.field == other.field
        s1, s2 = self._cmp_start(), other._cmp_start()
        e1, e2 = self._cmp_end(), other._cmp_end()
        if s1 >= s2 and e1 <= e2:
            start, end = s2, e2
        elif s2 >= s1 and e2 <= e1:
            start, end = s1, e1
        elif intersect:
            start, end = max(s1, s2), min(e1, e2)
        else:
            start, end = min(s1, s2), max(e1, e2)
        startval = None if start[0] == 0 else start[1]
        endval = None if end[0] == 2 else end[1]
        return TermRange(
            self.field, startval, endval,
            startexcl=start[2] == 1, endexcl=end[2] == -1,
            boost=max(self.boost, other.boost),
        )

    def __eq__(self, other):
        return type(self) is type(other) and (
            self.field, self.start, self.end, self.startexcl, self.endexcl, self.boost,
        ) == (other.field, other.start, other.end, other.startexcl, other.endexcl, other.boost)

    def __hash__(self):
        return hash((TermRange, self.field, self.start, self.end, self.startexcl, self.endexcl, self.boost))


class ColumnRange(Query):
    """Range over a NON-indexed document column (NUMERIC/DATETIME schema
    kinds): compiles to a native predicate on the docs table — Spark pushes
    it into the Parquet scan, no postings involved (reference NumericRange /
    DateRange semantics, ranges.py:188-375: constant score 1.0)."""

    def __init__(self, field: str, start, end, startexcl: bool = False,
                 endexcl: bool = False, boost: float = 1.0):
        self.field = field
        self.start = start
        self.end = end
        self.startexcl = startexcl
        self.endexcl = endexcl
        self.boost = boost

    def __repr__(self):
        return (f"{type(self).__name__}({self.field!r}, {self.start!r}, "
                f"{self.end!r})")

    def __eq__(self, other):
        return type(self) is type(other) and (
            self.field, self.start, self.end, self.startexcl, self.endexcl, self.boost,
        ) == (other.field, other.start, other.end, other.startexcl, other.endexcl, other.boost)

    def __hash__(self):
        return hash((type(self).__name__, self.field, str(self.start), str(self.end),
                     self.startexcl, self.endexcl, self.boost))

    def estimate_size(self, stats):
        return stats.doc_count()

    def spark_predicate(self):
        from pyspark.sql import functions as F

        cond = F.lit(True)
        c = F.col(self.field)
        if self.start is not None:
            cond = cond & (c > F.lit(self.start) if self.startexcl else c >= F.lit(self.start))
        if self.end is not None:
            cond = cond & (c < F.lit(self.end) if self.endexcl else c <= F.lit(self.end))
        return cond


class NumericRange(ColumnRange):
    pass


class DateRange(ColumnRange):
    pass


class ColumnTerm(Query):
    """Equality on a NON-indexed document column (NUMERIC equality, BOOLEAN
    true/false — reference fields.py:783-976). Constant score 1.0."""

    def __init__(self, field: str, value, boost: float = 1.0):
        self.field = field
        self.value = value
        self.boost = boost

    def __repr__(self):
        return f"ColumnTerm({self.field!r}, {self.value!r})"

    def __eq__(self, other):
        return type(self) is type(other) and (
            self.field, self.value, self.boost) == (other.field, other.value, other.boost)

    def __hash__(self):
        return hash((ColumnTerm, self.field, str(self.value), self.boost))

    def estimate_size(self, stats):
        return stats.doc_count()

    def spark_predicate(self):
        from pyspark.sql import functions as F

        return F.col(self.field) == F.lit(self.value)


class Every(Query):
    """All documents (or all docs with any term in ``field``) — reference
    qcore.py:650-738. Score 1.0 * boost."""

    def __init__(self, field: str | None = None, boost: float = 1.0):
        self.field = field
        self.boost = boost

    def __repr__(self):
        return f"Every({self.field!r})"

    def __eq__(self, other):
        return isinstance(other, Every) and (self.field, self.boost) == (other.field, other.boost)

    def __hash__(self):
        return hash((Every, self.field, self.boost))

    def estimate_size(self, stats):
        return stats.doc_count()


class ConstantScore(Query):
    """Fixed score for every match of the child (reference wrappers.py:152-183)."""

    def __init__(self, child: Query, score: float = 1.0, boost: float = 1.0):
        self.child = child
        self.score = score
        self.boost = boost

    def __repr__(self):
        return f"ConstantScore({self.child!r}, {self.score})"

    def __eq__(self, other):
        return (
            isinstance(other, ConstantScore)
            and (self.child, self.score, self.boost) == (other.child, other.score, other.boost)
        )

    def __hash__(self):
        return hash((ConstantScore, hash(self.child), self.score, self.boost))

    def children(self):
        return [self.child]

    def apply(self, fn):
        import copy

        q = copy.copy(self)
        q.child = fn(self.child)
        return q

    def normalize(self):
        c = self.child.normalize()
        if c is NullQuery:
            return NullQuery
        return ConstantScore(c, self.score, boost=self.boost)

    def estimate_size(self, stats):
        return self.child.estimate_size(stats)


class WeightingQuery(Query):
    """Scores the wrapped subtree with a SPECIFIC weighting model instead
    of the searcher's (reference query/wrappers.py:186-198, which swaps the
    context weighting for the child's matcher). The engine compiles the
    child in a sub-plan whose searcher carries the override."""

    def __init__(self, child: Query, weighting, boost: float = 1.0):
        self.child = child
        self.weighting = weighting
        self.boost = boost

    def __repr__(self):
        return f"WeightingQuery({self.child!r}, {type(self.weighting).__name__})"

    def __eq__(self, other):
        return (isinstance(other, WeightingQuery)
                and (self.child, self.weighting, self.boost)
                == (other.child, other.weighting, other.boost))

    def __hash__(self):
        return hash((WeightingQuery, hash(self.child), id(self.weighting), self.boost))

    def children(self):
        return [self.child]

    def apply(self, fn):
        import copy

        q = copy.copy(self)
        q.child = fn(self.child)
        return q

    def normalize(self):
        c = self.child.normalize()
        if c is NullQuery:
            return NullQuery
        return WeightingQuery(c, self.weighting, boost=self.boost)

    def estimate_size(self, stats):
        return self.child.estimate_size(stats)


class _MultiTermDocs(Query):
    """Internal plan node: the distributed constant-score doc set of a
    multiterm expansion that matched >1 lexicon term. Matches every doc
    containing ANY matching term, score exactly 1.0 and boost ignored —
    the reference MultiTerm.matcher constant-score ListMatcher semantics
    (terms.py:195-211), without ever materializing the term list on the
    driver: the planner semi-joins the posting scan against the filtered
    lexicon predicate instead (engine.py _compile_multiterm_docs)."""

    def __init__(self, source: MultiTerm, est: int):
        self.source = source
        self.field = source.field
        self.boost = 1.0  # constant-score expansion ignores boost (verified)
        self._est = int(est)

    def __repr__(self):
        return f"_MultiTermDocs({self.source!r}, est={self._est})"

    def estimate_size(self, stats):
        # the expanded Or's estimate: min(sum of term dfs, doc_count)
        return min(self._est, stats.doc_count())

    def leaf_terms(self):
        return []


def _levenshtein(a: str, b: str) -> int:
    if a == b:
        return 0
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]
