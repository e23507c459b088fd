"""FunctionWeighting and the final() hook, differential vs the reference
custom-scoring plug points (reference scoring.py:503-544, 69-85)."""

import pytest
from pyspark.sql import Row, functions as F

import whoosh_spark.query as Q
from whoosh_spark.index import Index, build_index
from whoosh_spark.schema import IndexSchema, TEXT
from whoosh_spark.search import Searcher
from whoosh_spark.search.scoring import FunctionWeighting

DOCS = [
    (0, "alfa bravo charlie alfa"),
    (1, "bravo bravo delta"),
    (2, "alfa alfa alfa echo"),
    (3, "charlie delta echo"),
]


@pytest.fixture(scope="module")
def pair(spark, whoosh_ref, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fwix"))
    schema = IndexSchema.of(text=TEXT())
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in DOCS])
    build_index(spark, df, schema, d, sha_col=None)

    from whoosh import fields
    from whoosh.filedb.filestore import RamStorage

    wschema = fields.Schema(text=fields.TEXT())
    wix = RamStorage().create_index(wschema)
    w = wix.writer()
    for _, t in DOCS:
        w.add_document(text=t)
    w.commit()
    return Index(spark, d), wix


def test_function_weighting_matches_reference(pair, whoosh_ref):
    from whoosh import scoring as wscoring

    ix, wix = pair

    def ref_fn(searcher, fieldname, text, matcher):
        return matcher.weight() * 2.0 + 1.0

    with wix.searcher(weighting=wscoring.FunctionWeighting(ref_fn)) as s:
        from whoosh.query import Or as WOr, Term as WTerm

        wq = WOr([WTerm("text", "alfa"), WTerm("text", "bravo")])
        want = [(h.docnum, round(h.score, 9)) for h in s.search(wq, limit=None)]

    fw = FunctionWeighting(fn=lambda w, fl, idf, avgfl: w * F.lit(2.0) + F.lit(1.0))
    srch = Searcher(ix, weighting=fw)
    q = Q.Or([Q.Term("text", "alfa"), Q.Term("text", "bravo")])
    got = [(r["doc_id"], round(r["score"], 9)) for r in srch.search(q, limit=None).collect()]
    assert got == want, (got, want)

    # the Python-scalar slow path computes the same thing
    fw_py = FunctionWeighting(python_fn=lambda w, fl, idf, avgfl: w * 2.0 + 1.0)
    srch2 = Searcher(ix, weighting=fw_py)
    got2 = [(r["doc_id"], round(r["score"], 9)) for r in srch2.search(q, limit=None).collect()]
    assert got2 == want


def test_final_hook_matches_reference(pair, whoosh_ref):
    from whoosh import scoring as wscoring

    ix, wix = pair

    class RefFinal(wscoring.BM25F):
        use_final = True

        def final(self, searcher, docnum, score):
            return score + docnum * 0.001

    with wix.searcher(weighting=RefFinal()) as s:
        from whoosh.query import Term as WTerm

        want = [(h.docnum, round(h.score, 9)) for h in s.search(WTerm("text", "alfa"), limit=None)]

    fw = FunctionWeighting(final=lambda doc_id, score: score + doc_id.cast("double") * F.lit(0.001))
    srch = Searcher(ix, weighting=fw)
    got = [
        (r["doc_id"], round(r["score"], 9))
        for r in srch.search(Q.Term("text", "alfa"), limit=None).collect()
    ]
    assert got == want, (got, want)


DOCS2 = [
    (0, "alfa bravo alfa", "alfa charlie"),
    (1, "bravo charlie", "alfa alfa bravo"),
    (2, "alfa alfa alfa", "bravo"),
    (3, "delta echo", "charlie charlie alfa"),
]


@pytest.fixture(scope="module")
def pair2(spark, whoosh_ref, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mwix"))
    schema = IndexSchema.of(name=TEXT(), value=TEXT())
    df = spark.createDataFrame([Row(doc_id=i, name=n, value=v) for i, n, v in DOCS2])
    build_index(spark, df, schema, d, sha_col=None)

    from whoosh import fields
    from whoosh.filedb.filestore import RamStorage

    wschema = fields.Schema(name=fields.TEXT(), value=fields.TEXT())
    wix = RamStorage().create_index(wschema)
    w = wix.writer()
    for _, n, v in DOCS2:
        w.add_document(name=n, value=v)
    w.commit()
    return Index(spark, d), wix


def _diff(pair, wweighting, oweighting, wq, oq, whoosh_ref):
    ix, wix = pair
    with wix.searcher(weighting=wweighting) as s:
        want = [(h.docnum, round(h.score, 9)) for h in s.search(wq, limit=None)]
    srch = Searcher(ix, weighting=oweighting)
    got = [(r["doc_id"], round(r["score"], 9)) for r in srch.search(oq, limit=None).collect()]
    srch.clear_cache()
    assert got == want, (got, want)


def test_multiweighting_matches_reference(pair2, whoosh_ref):
    """Per-field model dispatch (reference scoring.py:547-571): BM25 on
    'value', Frequency on 'name', TF_IDF override exercised too."""
    from whoosh import scoring as wscoring
    from whoosh.query import Or as WOr, Term as WTerm

    from whoosh_spark.search.scoring import BM25F, Frequency, MultiWeighting, TF_IDF

    wq = WOr([WTerm("name", "alfa"), WTerm("value", "alfa"), WTerm("value", "bravo")])
    oq = Q.Or([Q.Term("name", "alfa"), Q.Term("value", "alfa"), Q.Term("value", "bravo")])
    _diff(pair2, wscoring.MultiWeighting(wscoring.BM25F(), name=wscoring.Frequency()),
          MultiWeighting(BM25F(), name=Frequency()), wq, oq, whoosh_ref)
    _diff(pair2, wscoring.MultiWeighting(wscoring.BM25F(), name=wscoring.TF_IDF()),
          MultiWeighting(BM25F(), name=TF_IDF()), wq, oq, whoosh_ref)


def test_reverseweighting_matches_reference(pair2, whoosh_ref):
    from whoosh import scoring as wscoring
    from whoosh.query import Or as WOr, Term as WTerm

    from whoosh_spark.search.scoring import BM25F, ReverseWeighting

    wq = WOr([WTerm("value", "alfa"), WTerm("value", "charlie")])
    oq = Q.Or([Q.Term("value", "alfa"), Q.Term("value", "charlie")])
    _diff(pair2, wscoring.ReverseWeighting(wscoring.BM25F()),
          ReverseWeighting(BM25F()), wq, oq, whoosh_ref)


def test_weighting_query_subtree_override(pair2, whoosh_ref):
    """WeightingQuery scores only its subtree with the override model —
    the DOCUMENTED semantics of reference query/wrappers.py:186-198. The
    reference implementation itself is a no-op (its matcher() calls
    context.set(weighting=...) and DISCARDS the returned copy), asserted
    below; parity is therefore checked against the equivalent
    MultiWeighting formulation, which the reference does honor."""
    from whoosh import scoring as wscoring
    from whoosh.query import Or as WOr, Term as WTerm, WeightingQuery as WWQ

    from whoosh_spark.search.scoring import BM25F, Frequency, MultiWeighting, TF_IDF

    ix, wix = pair2
    # 1. the reference bug: wrapped == unwrapped under the outer model
    with wix.searcher(weighting=wscoring.BM25F()) as s:
        plain = [(h.docnum, h.score) for h in
                 s.search(WTerm("value", "bravo"), limit=None)]
        wrapped = [(h.docnum, h.score) for h in
                   s.search(WWQ(WTerm("value", "bravo"), wscoring.Frequency()), limit=None)]
    assert plain == wrapped  # if this fails, the reference fixed its bug

    # 2. our override vs the reference's equivalent per-field MultiWeighting
    wq = WOr([WTerm("name", "alfa"), WTerm("value", "bravo")])
    oq = Q.Or([Q.Term("name", "alfa"),
               Q.WeightingQuery(Q.Term("value", "bravo"), Frequency())])
    _diff(pair2, wscoring.MultiWeighting(wscoring.BM25F(), value=wscoring.Frequency()),
          BM25F(), wq, oq, whoosh_ref)

    # 3. override at the root == searcher-wide model
    oq2 = Q.WeightingQuery(Q.Or([Q.Term("value", "alfa"), Q.Term("value", "charlie")]), TF_IDF())
    wq2 = WOr([WTerm("value", "alfa"), WTerm("value", "charlie")])
    _diff(pair2, wscoring.TF_IDF(), BM25F(), wq2, oq2, whoosh_ref)
