"""Differential highlighting tests vs reference Whoosh defaults
(ContextFragmenter(200, 20) + HtmlFormatter(tagname='b'), top=3)."""

import pytest
from pyspark.sql import Row

from whoosh_spark.index import Index, build_index
from whoosh_spark.schema import IndexSchema, TEXT
from whoosh_spark.search import Searcher
from whoosh_spark.search.highlight import add_highlights, highlight_text

DOCS = [
    "The template geometry is a wonderful thing when you render scenes with "
    "complex shading and the render pipeline handles all the texture work "
    "before the final render pass completes in the compositor stage today",
    "short render doc",
    "nothing to see here at all",
    "render " + "filler word " * 120 + "render again near the end",
]


@pytest.fixture(scope="module")
def wix(whoosh_ref):
    from whoosh import fields
    from whoosh.filedb.filestore import RamStorage

    ix = RamStorage().create_index(fields.Schema(content=fields.TEXT(stored=True)))
    w = ix.writer()
    for t in DOCS:
        w.add_document(content=t)
    w.commit()
    return ix


@pytest.mark.parametrize("docnum,terms", [(0, ["render"]), (1, ["render"]),
                                          (3, ["render"]), (0, ["render", "texture"])])
def test_highlights_match_whoosh(wix, whoosh_ref, docnum, terms):
    from whoosh.query import Or, Term

    q = Term("content", terms[0]) if len(terms) == 1 else Or([Term("content", t) for t in terms])
    with wix.searcher() as s:
        r = s.search(q, limit=10)
        hit = [h for h in r if h.docnum == docnum]
        assert hit, "fixture doc must match"
        want = hit[0].highlights("content")
    got = highlight_text(DOCS[docnum], terms)
    assert got == want


def test_no_match_empty():
    assert highlight_text(DOCS[2], ["render"]) == ""


def test_add_highlights_df(spark, tmp_path):
    d = str(tmp_path / "hl")
    df = spark.createDataFrame([Row(doc_id=i, content=t) for i, t in enumerate(DOCS)])
    build_index(spark, df, IndexSchema.of(content=TEXT(stored=True)), d, sha_col=None)
    ix = Index(spark, d)
    import whoosh_spark.query as Q

    s = Searcher(ix)
    top = s.search_with_stored(Q.Term("content", "render"), limit=5)
    out = add_highlights(top, "content", ["render"]).collect()
    assert all("<b class=" in r["highlights"] for r in out)


SENT_DOCS = [
    "This is a sentence about render pipelines. Another one about nothing. "
    "The render pass finishes here! Does the texture cache matter? Ellipsis "
    "runs... do not break sentences about render state. Tail sentence with "
    "render at the end",
    "render opens the doc. then a long sentence " + "pad word " * 40 +
    "with render buried deep inside so it exceeds maxchars. short render one.",
]


def _ref_highlights(wix, docnum, terms, fragmenter):
    from whoosh.query import Or, Term

    q = Term("content", terms[0]) if len(terms) == 1 else Or([Term("content", t) for t in terms])
    with wix.searcher() as s:
        r = s.search(q, limit=10)
        r.fragmenter = fragmenter
        hit = [h for h in r if h.docnum == docnum]
        assert hit, "fixture doc must match"
        return hit[0].highlights("content")


@pytest.fixture(scope="module")
def sent_wix(whoosh_ref):
    from whoosh import fields
    from whoosh.filedb.filestore import RamStorage

    ix = RamStorage().create_index(fields.Schema(content=fields.TEXT(stored=True)))
    w = ix.writer()
    for t in SENT_DOCS:
        w.add_document(content=t)
    w.commit()
    return ix


@pytest.mark.parametrize("docnum,terms", [(0, ["render"]), (1, ["render"]),
                                          (0, ["render", "texture"])])
def test_sentence_fragmenter_matches_whoosh(sent_wix, whoosh_ref, docnum, terms):
    from whoosh.highlight import SentenceFragmenter

    want = _ref_highlights(sent_wix, docnum, terms, SentenceFragmenter())
    got = highlight_text(SENT_DOCS[docnum], terms, fragmenter="sentence")
    assert got == want


@pytest.mark.parametrize("docnum,terms", [(0, ["render"]), (1, ["render"]),
                                          (3, ["render"]), (0, ["render", "texture"])])
def test_pinpoint_fragmenter_matches_whoosh(wix, whoosh_ref, docnum, terms):
    from whoosh.highlight import PinpointFragmenter

    want = _ref_highlights(wix, docnum, terms, PinpointFragmenter())
    got = highlight_text(DOCS[docnum], terms, fragmenter="pinpoint")
    assert got == want


@pytest.mark.parametrize("docnum,terms", [(0, ["render"]), (3, ["render"])])
def test_pinpoint_autotrim_matches_whoosh(wix, whoosh_ref, docnum, terms):
    from whoosh.highlight import PinpointFragmenter

    want = _ref_highlights(wix, docnum, terms, PinpointFragmenter(autotrim=True))
    got = highlight_text(DOCS[docnum], terms, fragmenter="pinpoint_autotrim")
    assert got == want


@pytest.mark.parametrize("fmt_name", ["uppercase", "null"])
@pytest.mark.parametrize("docnum,terms", [(0, ["render"]), (3, ["render"]),
                                          (0, ["render", "texture"])])
def test_plain_formatters_match_whoosh(wix, whoosh_ref, fmt_name, docnum, terms):
    from whoosh import highlight as wh
    from whoosh.query import Or, Term

    from whoosh_spark.search.highlight import NullFormatter, UppercaseFormatter

    ref_fmt = wh.UppercaseFormatter() if fmt_name == "uppercase" else wh.NullFormatter()
    our_fmt = UppercaseFormatter() if fmt_name == "uppercase" else NullFormatter()
    q = Term("content", terms[0]) if len(terms) == 1 else Or([Term("content", t) for t in terms])
    with wix.searcher() as s:
        r = s.search(q, limit=10)
        r.formatter = ref_fmt
        hit = [h for h in r if h.docnum == docnum]
        want = hit[0].highlights("content")
    got = highlight_text(DOCS[docnum], terms, formatter=our_fmt)
    assert got == want
