"""Span query nodes — the public span API (reference query/spans.py:299-880).

Each node matches documents where a position-span condition holds and (like
the reference SpanWrappingMatcher) scores the doc exactly as its wrapped
query would:

  SpanFirst(q, limit)      spans of q ending at position <= limit; score = q
  SpanNear(a, b, slop, ordered, mindist)
                           pairwise span combination (reference
                           SpanNearMatcher._get_spans, spans.py:465-491);
                           score = a + b (IntersectionMatcher)
  SpanNear2([qs], ...)     n-ary left-fold chain of the same combination
                           (spans.py:599-644); score = sum of children
  SpanOr([qs])             union of children; spans deduped + merged
                           (Span.merge); score = sum of matching children
  SpanNot(a, b)            a's spans that don't overlap any b span; doc drops
                           if none survive; score = a + b-if-same-doc
                           (AndMaybeMatcher)
  SpanContains(a, b)       a's spans containing some b span; score = a + b
  SpanBefore(a, b)         a's spans ending before b's earliest start;
                           score = a + b
  SpanCondition(a, b)      a's spans, in docs also matching b; score = a + b

Physical evaluation lives in whoosh_spark/search/spaneval.py.
"""

from __future__ import annotations

from whoosh_spark.query.nodes import And, AndMaybe, Or, Query


class SpanQuery(Query):
    """Base marker: children's Terms need positional postings."""

    def children(self) -> list[Query]:
        raise NotImplementedError

    def __eq__(self, other):
        return type(self) is type(other) and self.__dict__ == other.__dict__

    def __hash__(self):
        return hash((type(self).__name__, tuple((k, hash(v) if isinstance(v, Query) else v)
                                                for k, v in sorted(self.__dict__.items()))))


class SpanFirst(SpanQuery):
    def __init__(self, q: Query, limit: int = 0):
        self.q = q
        self.limit = limit

    def __repr__(self):
        return f"SpanFirst({self.q!r}, limit={self.limit})"

    def children(self):
        return [self.q]

    def estimate_size(self, stats):
        return self.q.estimate_size(stats)


class SpanNear(SpanQuery):
    def __init__(self, a: Query, b: Query, slop: int = 1, ordered: bool = True, mindist: int = 1):
        self.a = a
        self.b = b
        self.slop = slop
        self.ordered = ordered
        self.mindist = mindist

    def __repr__(self):
        return (f"SpanNear({self.a!r}, {self.b!r}, slop={self.slop}, "
                f"ordered={self.ordered}, mindist={self.mindist})")

    def children(self):
        return [self.a, self.b]

    def estimate_size(self, stats):
        return And([self.a, self.b]).estimate_size(stats)

    @classmethod
    def phrase(cls, fieldname: str, words: list[str], slop: int = 1, ordered: bool = True):
        """Binary tree of SpanNear over terms (reference spans.py:425-443)."""
        from whoosh_spark.query.nodes import Term

        items: list[Query] = [Term(fieldname, w) for w in words]
        while len(items) > 1:
            items = [
                cls(items[i], items[i + 1], slop=slop, ordered=ordered)
                if i + 1 < len(items) else items[i]
                for i in range(0, len(items), 2)
            ]
        return items[0]


class SpanNear2(SpanQuery):
    def __init__(self, qs: list[Query], slop: int = 1, ordered: bool = True, mindist: int = 1):
        self.qs = list(qs)
        self.slop = slop
        self.ordered = ordered
        self.mindist = mindist

    def __repr__(self):
        return f"SpanNear2({self.qs!r}, slop={self.slop})"

    def __hash__(self):
        return hash((SpanNear2, tuple(map(hash, self.qs)), self.slop, self.ordered, self.mindist))

    def __eq__(self, other):
        return (type(self) is type(other) and self.qs == other.qs
                and (self.slop, self.ordered, self.mindist)
                == (other.slop, other.ordered, other.mindist))

    def children(self):
        return list(self.qs)

    def estimate_size(self, stats):
        return min(q.estimate_size(stats) for q in self.qs)


class Sequence(SpanNear2):
    """Sub-queries matching in adjacent positions, in order (reference
    query/positional.py:37-118). Physically identical to
    SpanNear2(qs, slop, ordered=True, mindist=1) — verified against the
    reference in tests/test_spans.py."""

    def __init__(self, qs: list[Query], slop: int = 1):
        super().__init__(qs, slop=slop, ordered=True, mindist=1)

    def __repr__(self):
        return f"Sequence({self.qs!r}, slop={self.slop})"


class SpanOr(SpanQuery):
    def __init__(self, subqs: list[Query]):
        self.subqs = list(subqs)

    def __repr__(self):
        return f"SpanOr({self.subqs!r})"

    def __hash__(self):
        return hash((SpanOr, tuple(map(hash, self.subqs))))

    def __eq__(self, other):
        return type(self) is type(other) and self.subqs == other.subqs

    def children(self):
        return list(self.subqs)

    def estimate_size(self, stats):
        return Or(self.subqs).estimate_size(stats)


class _SpanBi(SpanQuery):
    def __init__(self, a: Query, b: Query):
        self.a = a
        self.b = b

    def __repr__(self):
        return f"{type(self).__name__}({self.a!r}, {self.b!r})"

    def children(self):
        return [self.a, self.b]

    def estimate_size(self, stats):
        return And([self.a, self.b]).estimate_size(stats)


class SpanNot(_SpanBi):
    def estimate_size(self, stats):
        return AndMaybe(self.a, self.b).estimate_size(stats)


class SpanContains(_SpanBi):
    pass


class SpanBefore(_SpanBi):
    pass


class SpanCondition(_SpanBi):
    pass
