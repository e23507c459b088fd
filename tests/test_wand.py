"""Block-max WAND: pruned top-k must equal the exact top-k (mirrors the
reference's usequality on/off differential, tests/test_quality.py)."""

import pytest
from pyspark.sql import Row

import whoosh_spark.query as Q
from whoosh_spark.corpus import synth_code_corpus
from whoosh_spark.index import Index, build_index
from whoosh_spark.schema import code_corpus_schema
from whoosh_spark.search import Searcher
from whoosh_spark.search.engine import _PlanContext
from whoosh_spark.search.wand import wand_block_counts, wand_topk


@pytest.fixture(scope="module")
def synth_ix(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("wand_idx"))
    corpus = synth_code_corpus(spark, 3000)
    build_index(spark, corpus, code_corpus_schema(), d, sha_col="content")
    return Index(spark, d)


QUERIES = [
    Q.Term("content", "def"),
    Q.Or([Q.Term("content", "def"), Q.Term("content", "merge")]),
    Q.Or([Q.Term("content", "data"), Q.Term("content", "cache"), Q.Term("content", "mutex")]),
    Q.Or([Q.Term("content", "alpha"), Q.Term("content", "lima"), Q.Term("content", "import")]),
    Q.Or([Q.Term("content", "def", boost=2.0), Q.Term("content", "golf")]),
]


@pytest.mark.parametrize("qi", range(len(QUERIES)))
def test_wand_equals_exact(synth_ix, qi):
    q = QUERIES[qi]
    s = Searcher(synth_ix, exact_scores=False, cache_postings=False)
    exact = [(r["doc_id"], r["score"]) for r in s.search(q, limit=10, use_wand=False).collect()]
    wand = [(r["doc_id"], r["score"]) for r in s.search(q, limit=10, use_wand=True).collect()]
    assert [d for d, _ in wand] == [d for d, _ in exact]
    for (d1, s1), (d2, s2) in zip(wand, exact):
        assert s1 == pytest.approx(s2, rel=1e-9)


def test_wand_actually_prunes(synth_ix):
    s = Searcher(synth_ix, exact_scores=False, cache_postings=False)
    plan = _PlanContext(s)
    q = plan.prepare(Q.Or([Q.Term("content", "def"), Q.Term("content", "mutex")]))
    terms = [("content", "def", 1.0), ("content", "mutex", 1.0)]
    stats = wand_block_counts(plan, terms, 10)
    assert stats["blocks_total"] > 0
    assert stats["blocks_kept"] <= stats["blocks_total"]
    # θ must have been seeded from the strongest term (df >= 10)
    assert stats["theta"] != float("-inf")


def test_wand_ineligible_shapes_fall_back(synth_ix):
    s = Searcher(synth_ix, exact_scores=False, cache_postings=False)
    q = Q.And([Q.Term("content", "def"), Q.Term("content", "merge")])
    a = [(r["doc_id"],) for r in s.search(q, limit=5, use_wand=True).collect()]
    b = [(r["doc_id"],) for r in s.search(q, limit=5, use_wand=False).collect()]
    assert a == b
