"""Differential key-terms / more-like-this tests vs reference Whoosh."""

import pytest
from pyspark.sql import Row

from whoosh_spark.index import Index, build_index
from whoosh_spark.schema import IndexSchema, ID, TEXT
from whoosh_spark.search import Searcher
from whoosh_spark.search.classify import expanded_terms, more_like

DOCS = [
    "render shading texture lighting render scene",
    "render polygon mesh texture mapping",
    "database index btree storage engine",
    "query planner optimizer database join",
    "lighting shadow render raytrace scene texture",
    "network socket protocol packet stream",
]


@pytest.fixture(scope="module")
def pair(spark, whoosh_ref, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cls"))
    df = spark.createDataFrame([Row(doc_id=i, content=t) for i, t in enumerate(DOCS)])
    build_index(spark, df, IndexSchema.of(content=TEXT(stored=True)), d, sha_col="content")

    from whoosh import fields
    from whoosh.filedb.filestore import RamStorage

    wix = RamStorage().create_index(fields.Schema(content=fields.TEXT(stored=True)))
    w = wix.writer()
    for t in DOCS:
        w.add_document(content=t)
    w.commit()
    return Index(spark, d), wix


def test_expanded_terms_matches_whoosh(pair, whoosh_ref):
    ix, wix = pair
    from whoosh.classify import Expander

    with wix.searcher() as s:
        exp = Expander(s.reader(), "content")
        exp.add_text(DOCS[0])
        exp.add_text(DOCS[4])
        want = exp.expanded_terms(5)
    got = expanded_terms(ix, "content", [DOCS[0], DOCS[4]], numterms=5)
    assert [t for t, _ in got] == [t for t, _ in want]
    for (t1, w1), (t2, w2) in zip(got, want):
        assert w1 == pytest.approx(w2, rel=1e-12), t1


def test_expanded_terms_other_models(pair, whoosh_ref):
    ix, wix = pair
    from whoosh.classify import Bo2Model as WBo2, KLModel as WKL, Expander

    for ours_name, wmodel in [("bo2", WBo2), ("kl", WKL)]:
        with wix.searcher() as s:
            exp = Expander(s.reader(), "content", model=wmodel)
            exp.add_text(DOCS[0])
            want = exp.expanded_terms(5)
        got = expanded_terms(ix, "content", [DOCS[0]], numterms=5, model=ours_name)
        assert [t for t, _ in got] == [t for t, _ in want], ours_name
        for (t1, w1), (t2, w2) in zip(got, want):
            assert w1 == pytest.approx(w2, rel=1e-12), (ours_name, t1)


def test_more_like_matches_whoosh(pair, whoosh_ref):
    ix, wix = pair
    with wix.searcher() as s:
        # reference more_like on text (no vectors -> stored text path)
        r = s.more_like(0, "content", text=DOCS[0], top=10, numterms=5)
        want = [h.docnum for h in r]
    srch = Searcher(ix)
    got_df = more_like(srch, "content", DOCS[0], limit=10, numterms=5)
    got = [r["doc_id"] for r in got_df.collect()]
    srch.clear_cache()
    # reference more_like filters out the source doc itself
    got = [d for d in got if d != 0]
    assert got == want
