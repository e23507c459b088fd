"""Differential span-query tests: mirror of reference tests/test_spans.py
(the fixture corpus is the same permutations corpus). For every span query
we compare BOTH the per-doc span lists (vs the reference matcher protocol)
and the scored search results."""

from itertools import permutations

import pytest
from pyspark.sql import Row, functions as F

import whoosh_spark.query as Q
from whoosh_spark.index import Index, build_index
from whoosh_spark.schema import IndexSchema, TEXT
from whoosh_spark.analysis import simple_analyzer
from whoosh_spark.search import Searcher
from whoosh_spark.search.engine import _PlanContext
from whoosh_spark.search.spaneval import span_frame

DOMAIN = ("alfa", "bravo", "bravo", "charlie", "delta", "echo")
DOCS = [" ".join(ls) for ls in permutations(DOMAIN, 4)]


@pytest.fixture(scope="module")
def pair(spark, whoosh_ref, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("spanix"))
    schema = IndexSchema.of(text=TEXT(analyzer=simple_analyzer()))
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(DOCS)])
    build_index(spark, df, schema, d, sha_col=None)

    from whoosh import analysis, fields
    from whoosh.filedb.filestore import RamStorage

    wschema = fields.Schema(text=fields.TEXT(analyzer=analysis.SimpleAnalyzer()))
    wix = RamStorage().create_index(wschema)
    w = wix.writer()
    for t in DOCS:
        w.add_document(text=t)
    w.commit()
    return Searcher(Index(spark, d)), wix


def ref_spans(wix, wq) -> dict:
    """{docnum: sorted [(start, end)]} via the reference matcher protocol."""
    out = {}
    with wix.searcher() as s:
        m = wq.matcher(s)
        while m.is_active():
            out[m.id()] = sorted((sp.start, sp.end) for sp in m.spans())
            m.next()
    return out


def our_spans(searcher, q) -> dict:
    plan = _PlanContext(searcher)
    qn = plan.prepare(q)
    df = span_frame(plan, qn)
    rows = df.collect()
    return {
        r["doc_id"]: sorted((s["start"], s["end"]) for s in r["spans"]) for r in rows
    }


def ref_search(wix, wq, limit=None):
    with wix.searcher() as s:
        res = s.search(wq, limit=limit)
        return [(hit.docnum, round(hit.score, 6)) for hit in res]


def our_search(searcher, q, limit=None):
    return [
        (r["doc_id"], round(r["score"], 6))
        for r in searcher.search(q, limit=limit).collect()
    ]


def _cases(whoosh_ref):
    from whoosh.query import And as WAnd, Or as WOr, Term as WTerm
    from whoosh.query import spans as wspans

    T, WT = Q.Term, WTerm
    near = lambda a, b, **kw: Q.SpanNear(a, b, **kw)
    wnear = lambda a, b, **kw: wspans.SpanNear(a, b, **kw)

    return [
        # SpanFirst at limit 0 and 1
        (Q.SpanFirst(T("text", "charlie")), wspans.SpanFirst(WT("text", "charlie"))),
        (Q.SpanFirst(T("text", "bravo"), limit=1), wspans.SpanFirst(WT("text", "bravo"), limit=1)),
        # SpanNear ordered / unordered / repeated term
        (near(T("text", "alfa"), T("text", "bravo"), ordered=True),
         wnear(WT("text", "alfa"), WT("text", "bravo"), ordered=True)),
        (near(T("text", "alfa"), T("text", "bravo"), ordered=False),
         wnear(WT("text", "alfa"), WT("text", "bravo"), ordered=False)),
        (near(T("text", "bravo"), T("text", "bravo"), ordered=True),
         wnear(WT("text", "bravo"), WT("text", "bravo"), ordered=True)),
        # nested SpanNear tree
        (near(near(T("text", "alfa"), T("text", "charlie")), T("text", "echo")),
         wnear(wnear(WT("text", "alfa"), WT("text", "charlie")), WT("text", "echo"))),
        # Or as a span child
        (near(Q.Or([T("text", "alfa"), T("text", "charlie")]), T("text", "echo"), ordered=True),
         wnear(WOr([WT("text", "alfa"), WT("text", "charlie")]), WT("text", "echo"), ordered=True)),
        # And as a span child (regular matcher spans)
        (Q.SpanCondition(Q.And([T("text", "alfa"), T("text", "bravo")]), T("text", "echo")),
         wspans.SpanCondition(WAnd([WT("text", "alfa"), WT("text", "bravo")]), WT("text", "echo"))),
        # SpanNear2 with slop
        (Q.SpanNear2([T("text", "bravo"), T("text", "echo")], slop=3),
         wspans.SpanNear2([WT("text", "bravo"), WT("text", "echo")], slop=3)),
        # SpanNot
        (Q.SpanNot(near(T("text", "alfa"), T("text", "charlie"), slop=2), T("text", "bravo")),
         wspans.SpanNot(wnear(WT("text", "alfa"), WT("text", "charlie"), slop=2), WT("text", "bravo"))),
        # SpanOr
        (Q.SpanOr([near(T("text", "alfa"), T("text", "charlie"), slop=2), T("text", "bravo")]),
         wspans.SpanOr([wnear(WT("text", "alfa"), WT("text", "charlie"), slop=2), WT("text", "bravo")])),
        # SpanOr over a repeated-position term (adjacent spans merge)
        (Q.SpanOr([T("text", "bravo")]), wspans.SpanOr([WT("text", "bravo")])),
        # SpanContains
        (Q.SpanContains(near(T("text", "alfa"), T("text", "charlie"), slop=3), T("text", "echo")),
         wspans.SpanContains(wnear(WT("text", "alfa"), WT("text", "charlie"), slop=3), WT("text", "echo"))),
        # SpanBefore
        (Q.SpanBefore(T("text", "alfa"), T("text", "charlie")),
         wspans.SpanBefore(WT("text", "alfa"), WT("text", "charlie"))),
        # SpanCondition
        (Q.SpanCondition(T("text", "alfa"), T("text", "charlie")),
         wspans.SpanCondition(WT("text", "alfa"), WT("text", "charlie"))),
    ]


def test_span_queries_match_reference_spans(pair, whoosh_ref):
    searcher, wix = pair
    for ours, theirs in _cases(whoosh_ref):
        got = our_spans(searcher, ours)
        want = ref_spans(wix, theirs)
        assert got == want, (ours, {k: v for k, v in got.items() if want.get(k) != v},
                             {k: v for k, v in want.items() if got.get(k) != v})


def test_span_queries_match_reference_scores(pair, whoosh_ref):
    searcher, wix = pair
    for ours, theirs in _cases(whoosh_ref):
        got = sorted(our_search(searcher, ours, limit=None))
        want = sorted(ref_search(wix, theirs, limit=None))
        assert got == want, (ours, got[:5], want[:5])


def test_spannear2_matches_reference_fixture(pair, spark, whoosh_ref, tmp_path):
    """The reference's own test_spannear2 corpus (tests/test_spans.py:221)."""
    from whoosh import analysis, fields
    from whoosh.filedb.filestore import RamStorage
    from whoosh.query import Term as WTerm
    from whoosh.query import spans as wspans

    docs = [
        "alfa echo",
        "alfa bravo echo",
        "alfa bravo charlie echo",
        "alfa bravo charlie delta echo",
        "alfa bravo charlie fox delta echo",
        "charlie delta echo fox golf hotel",
    ]
    d = str(tmp_path / "sn2")
    schema = IndexSchema.of(text=TEXT())
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(docs)])
    build_index(spark, df, schema, d, sha_col=None)
    s = Searcher(Index(spark, d))

    wschema = fields.Schema(text=fields.TEXT())
    wix = RamStorage().create_index(wschema)
    w = wix.writer()
    for t in docs:
        w.add_document(text=t)
    w.commit()

    q = Q.SpanNear2([Q.Term("text", "bravo"), Q.Term("text", "echo")], slop=3)
    wq = wspans.SpanNear2([WTerm("text", "bravo"), WTerm("text", "echo")], slop=3)
    assert sorted(r["doc_id"] for r in s.search(q, limit=None).collect()) == [1, 2, 3]
    assert our_search(s, q) == ref_search(wix, wq)


def test_sequence_matches_reference(pair, whoosh_ref):
    """Sequence == SpanNear2(ordered, mindist=1) — verified vs the reference
    Sequence query (query/positional.py:37-118)."""
    from whoosh.query import Term as WTerm
    from whoosh.query.positional import Sequence as WSequence

    searcher, wix = pair
    for words, slop in [(("bravo", "charlie"), 1), (("alfa", "bravo", "charlie"), 1),
                        (("alfa", "charlie"), 2)]:
        ours = Q.Sequence([Q.Term("text", w) for w in words], slop=slop)
        theirs = WSequence([WTerm("text", w) for w in words], slop=slop)
        got = sorted(r["doc_id"] for r in searcher.search(ours, limit=None).collect())
        with wix.searcher() as s:
            want = sorted(h.docnum for h in s.search(theirs, limit=None))
        assert got == want, (words, slop, got[:10], want[:10])
