"""NGRAM / NGRAMWORDS fields vs the reference."""

import pytest
from pyspark.sql import Row

import whoosh_spark.query as Q
from whoosh_spark.analysis.tokenize import Analyzer
from whoosh_spark.index import Index, build_index
from whoosh_spark.schema import IndexSchema, NGRAM, NGRAMWORDS
from whoosh_spark.search import Searcher

DOCS = ["render scene", "rendering pipeline", "scent of cedar", "unrelated words here"]


def test_ngram_token_stream_matches_whoosh(whoosh_ref):
    from whoosh.analysis import NgramAnalyzer, NgramWordAnalyzer

    for text in DOCS + ["Ab", "x", ""]:
        ours = Analyzer(use_stopfilter=False, ngram=(2, 3)).tokens(text)
        theirs = [(t.text, t.pos) for t in NgramAnalyzer(2, 3)(text, positions=True)]
        assert ours == theirs, text
        ours_w = Analyzer(use_stopfilter=False, ngram=(2, 3), ngram_words=True).tokens(text)
        theirs_w = [(t.text, t.pos) for t in NgramWordAnalyzer(2, 3)(text, positions=True)]
        assert ours_w == theirs_w, text


@pytest.mark.parametrize("kind", ["ngram", "ngramwords"])
def test_ngram_search_matches_whoosh(spark, whoosh_ref, tmp_path, kind):
    from whoosh import fields
    from whoosh.filedb.filestore import RamStorage
    from whoosh.query import Term

    d = str(tmp_path / "idx")
    if kind == "ngram":
        ours_field, wfield = NGRAM(2, 3), fields.NGRAM(minsize=2, maxsize=3)
    else:
        ours_field, wfield = NGRAMWORDS(2, 3), fields.NGRAMWORDS(minsize=2, maxsize=3)
    build_index(
        spark,
        spark.createDataFrame([Row(doc_id=i, gram=t) for i, t in enumerate(DOCS)]),
        IndexSchema.of(gram=ours_field), d, sha_col=None,
    )
    wix = RamStorage().create_index(fields.Schema(gram=wfield))
    w = wix.writer()
    for t in DOCS:
        w.add_document(gram=t)
    w.commit()

    s = Searcher(Index(spark, d))
    with wix.searcher() as ws:
        for gram in ["ren", "sce", "ed", "der"]:
            want = [(h.docnum, h.score) for h in ws.search(Term("gram", gram), limit=10)]
            got = [(r["doc_id"], r["score"]) for r in s.search(Q.Term("gram", gram), limit=10).collect()]
            assert [d_ for d_, _ in got] == [d_ for d_, _ in want], (kind, gram)
            for (d1, s1), (d2, s2) in zip(got, want):
                assert s1 == pytest.approx(s2, rel=1e-12), (kind, gram, d1)
    s.clear_cache()
