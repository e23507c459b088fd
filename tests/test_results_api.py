"""Results / Hit / ResultsPage API differential vs the reference
(searching.py:934-1652): pagination attributes, len-vs-scored_length
semantics, list-surgery combinators, and Hit dict behavior must match on an
identical corpus."""

import pytest
from pyspark.sql import Row

from whoosh_spark.index import Index, build_index
from whoosh_spark.query import nodes as Q
from whoosh_spark.schema import ID, TEXT, IndexSchema
from whoosh_spark.search import Searcher

WORDS = ["alfa", "bravo", "charlie", "delta", "echo", "fox"]

DOCS = []
for i in range(40):
    # deterministic, term-frequency-varied corpus
    body = " ".join(WORDS[j % len(WORDS)] for j in range(i, i + (i % 5) + 1))
    DOCS.append((i, f"doc{i}", body + (" alfa" * (i % 3))))


@pytest.fixture(scope="module")
def ref_index(whoosh_ref):
    from whoosh import fields
    from whoosh.filedb.filestore import RamStorage

    schema = fields.Schema(
        doc_id=fields.NUMERIC(stored=True, bits=64),
        title=fields.ID(stored=True),
        body=fields.TEXT(stored=True),
    )
    ix = RamStorage().create_index(schema)
    w = ix.writer()
    for did, title, body in DOCS:
        w.add_document(doc_id=did, title=title, body=body)
    w.commit()
    return ix


@pytest.fixture(scope="module")
def our_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("resix"))
    schema = IndexSchema.of(title=ID(stored=True), body=TEXT(stored=True))
    df = spark.createDataFrame(
        [Row(doc_id=i, title=t, body=b) for i, t, b in DOCS])
    build_index(spark, df, schema, d, sha_col=None)
    return Index(spark, d)


def _ref_search(ref_index, qtext, limit):
    from whoosh.query import Term as RTerm

    with ref_index.searcher() as s:
        r = s.search(RTerm("body", qtext), limit=limit)
        return ([(h["doc_id"], round(h.score, 5)) for h in r],
                len(r), r.scored_length())


def test_results_len_vs_scored_length(our_index, ref_index):
    s = Searcher(our_index)
    r = s.search_results(Q.Term("body", "alfa"), limit=5)
    ref_items, ref_len, ref_scored = _ref_search(ref_index, "alfa", 5)
    assert r.scored_length() == ref_scored == 5
    assert len(r) == ref_len  # total matches beyond the page
    got = [(h.docnum, round(h.score, 5)) for h in r]
    assert got == ref_items
    # ranks and item accessors
    assert [h.rank for h in r] == [0, 1, 2, 3, 4]
    assert r.docnum(0) == got[0][0]
    assert round(r.score(0), 5) == got[0][1]
    assert list(r.items())[0] == (r.docnum(0), r.score(0))
    assert got[0][0] in r
    assert r and not r.is_empty()


def test_results_hit_dict_behavior(our_index, ref_index):
    s = Searcher(our_index)
    r = s.search_results(Q.Term("body", "bravo"), limit=3)
    with ref_index.searcher() as rs:
        from whoosh.query import Term as RTerm

        rr = rs.search(RTerm("body", "bravo"), limit=3)
        ref_fields = [dict(h.fields()) for h in rr]
    got_fields = [h.fields() for h in r]
    for g, want in zip(got_fields, ref_fields):
        assert g["title"] == want["title"]
        assert g["body"] == want["body"]
    h = r[0]
    assert h["title"] == ref_fields[0]["title"]
    assert h.get("nope") is None
    assert "title" in h and "nope" not in h
    assert set(h.keys()) >= {"title", "body"}
    with pytest.raises(KeyError):
        h["nope"]
    with pytest.raises(NotImplementedError):
        h["title"] = "x"
    # slicing mirrors the reference
    assert [x.docnum for x in r[1:3]] == [r.docnum(1), r.docnum(2)]
    with pytest.raises(IndexError):
        r[99]


@pytest.mark.parametrize("pagenum,pagelen", [(1, 5), (2, 5), (3, 5), (9, 5),
                                             (1, 100), (2, 7)])
def test_search_page_matches_reference(our_index, ref_index, pagenum, pagelen):
    from whoosh.query import Term as RTerm

    s = Searcher(our_index)
    page = s.search_page(Q.Term("body", "alfa"), pagenum, pagelen=pagelen)
    with ref_index.searcher() as rs:
        rpage = rs.search_page(RTerm("body", "alfa"), pagenum,
                               pagelen=pagelen)
        want = [(h["doc_id"], round(h.score, 5)) for h in rpage]
        attrs = (rpage.total, rpage.pagecount, rpage.pagenum, rpage.offset,
                 rpage.pagelen, rpage.is_last_page())
    got = [(h.docnum, round(h.score, 5)) for h in page]
    assert got == want
    assert (page.total, page.pagecount, page.pagenum, page.offset,
            page.pagelen, page.is_last_page()) == attrs
    if page.pagelen:
        assert page.docnum(0) == want[0][0]
        assert round(page.score(0), 5) == want[0][1]


def test_search_page_pagenum_validation(our_index):
    s = Searcher(our_index)
    with pytest.raises(ValueError):
        s.search_page(Q.Term("body", "alfa"), 0)


def test_results_combinators_match_reference(our_index, ref_index):
    """extend / filter / upgrade / upgrade_and_extend list surgery."""
    from whoosh.query import Term as RTerm

    s = Searcher(our_index)

    def ours(word, limit):
        return s.search_results(Q.Term("body", word), limit=limit)

    def theirs(searcher, word, limit):
        return searcher.search(RTerm("body", word), limit=limit)

    with ref_index.searcher() as rs:
        for op in ("extend", "filter", "upgrade", "upgrade_reverse",
                   "upgrade_and_extend"):
            a, b = ours("alfa", 8), ours("bravo", 8)
            ra, rb = theirs(rs, "alfa", 8), theirs(rs, "bravo", 8)
            if op == "extend":
                a.extend(b), ra.extend(rb)
            elif op == "filter":
                a.filter(b), ra.filter(rb)
            elif op == "upgrade":
                a.upgrade(b), ra.upgrade(rb)
            elif op == "upgrade_reverse":
                a.upgrade(b, reverse=True), ra.upgrade(rb, reverse=True)
            else:
                a.upgrade_and_extend(b), ra.upgrade_and_extend(rb)
            got = [d for _, d in a.top_n]
            want = [h["doc_id"] for h in ra]
            assert got == want, (op, got, want)


def test_hit_highlights_and_mlt(our_index):
    s = Searcher(our_index)
    r = s.search_results(Q.Term("body", "charlie"), limit=3)
    h = r[0]
    hl = h.highlights("body")
    assert "charlie" in hl.lower()
    assert 'class="match' in hl  # HtmlFormatter output
    sub = h.more_like_this("body", top=3)
    assert sub.count() >= 1


def test_matched_terms_differential(our_index, ref_index):
    from whoosh.query import Or as ROr, Term as RTerm

    q = Q.Or([Q.Term("body", "alfa"), Q.Term("body", "fox"),
              Q.Term("body", "zulu")])
    res = Searcher(our_index).search_results(q, limit=12, terms=True)
    assert res.has_matched_terms()

    with ref_index.searcher() as s:
        rres = s.search(ROr([RTerm("body", "alfa"), RTerm("body", "fox"),
                             RTerm("body", "zulu")]), limit=12, terms=True)
        want = {h["doc_id"]: {(f, t.decode()) for f, t in h.matched_terms()}
                for h in rres}
        want_union = {(f, t.decode()) for f, t in rres.matched_terms()}

    got = {h["doc_id"]: h.matched_terms() for h in res}
    assert got == want
    assert res.matched_terms() == want_union


def test_matched_terms_requires_flag(our_index):
    from whoosh_spark.search.results import NoTermsException

    res = Searcher(our_index).search_results(Q.Term("body", "alfa"), limit=3)
    assert not res.has_matched_terms()
    with pytest.raises(NoTermsException):
        res[0].matched_terms()
    with pytest.raises(NoTermsException):
        res.matched_terms()


def test_query_terms(our_index):
    q = Q.Or([Q.Term("body", "alfa"), Q.Term("body", "zulu")])
    res = Searcher(our_index).search_results(q, limit=5)
    assert res.query_terms() == {("body", "alfa")}
    assert res.query_terms(fieldname="title") == set()


def test_estimated_lengths_bound_the_truth(our_index):
    s = Searcher(our_index)
    q = Q.Or([Q.Term("body", "alfa"), Q.Term("body", "bravo")])
    res = s.search_results(q, limit=5)
    true_n = len(s.search(q, limit=None).collect())
    assert res.estimated_min_length() <= true_n <= res.estimated_length()
    # once the exact total is known, the estimate collapses to it
    assert len(res) == true_n
    assert res.estimated_length() == true_n


def test_search_results_groupedby_and_sortedby(spark, tmp_path, whoosh_ref):
    """search_results(groupedby=) / (sortedby=) vs reference
    search(groupedby=/sortedby=) on an identical corpus."""
    from whoosh import fields, sorting as wsorting
    from whoosh.filedb.filestore import RamStorage
    from whoosh.query import Term as RTerm

    rows = [(i, ["red", "green", "blue"][i % 3],
             "alfa " + ("bravo" if i % 2 else "charlie"))
            for i in range(12)]

    d = str(tmp_path / "gidx")
    schema = IndexSchema.of(cat=ID(stored=True), body=TEXT())
    df = spark.createDataFrame([Row(doc_id=i, cat=c, body=b)
                                for i, c, b in rows])
    build_index(spark, df, schema, d, sha_col=None)
    s = Searcher(Index(spark, d))

    wschema = fields.Schema(doc_id=fields.NUMERIC(stored=True, bits=64),
                            cat=fields.ID(stored=True),
                            body=fields.TEXT)
    wix = RamStorage().create_index(wschema)
    w = wix.writer()
    for i, c, b in rows:
        w.add_document(doc_id=i, cat=c, body=b)
    w.commit()

    q = Q.Term("body", "bravo")
    res = s.search_results(q, limit=None, groupedby="cat")
    assert res.facet_names() == ["cat"]
    with wix.searcher() as ws:
        wres = ws.search(RTerm("body", "bravo"), limit=None,
                         groupedby="cat")
        want_groups = {k: list(v) for k, v in wres.groups("cat").items()}
    assert res.groups("cat") == want_groups
    assert res.groups() == want_groups  # single facet -> name optional

    res2 = s.search_results(q, limit=None, sortedby="cat")
    with wix.searcher() as ws:
        wres2 = ws.search(RTerm("body", "bravo"), limit=None,
                          sortedby="cat")
        want_order = [h["doc_id"] for h in wres2]
    assert [res2.docnum(i) for i in range(len(want_order))] == want_order
    assert res2.score(0) is None  # unscored sort, reference parity

    plain = s.search_results(q, limit=5)
    with pytest.raises(KeyError):
        plain.groups()
