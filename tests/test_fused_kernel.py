"""The fused bucket kernel (search/batch.py batch_fused_topk /
phrase_fused_topk, routed for single queries by Searcher._fused_single)
must return results BIT-IDENTICAL to the generic exact plan for every
eligible shape — same docs, same scores, same tie-breaks.

The suite's differential tests run on corpora small enough that the
driver-local path answers first, so this file forces the distributed
routes: local_threshold=0 makes the fused path primary, and disabling
_fused_single exposes the generic join/aggregation plan underneath.
"""

import random

import pytest
from pyspark.sql import Row

import whoosh_spark.query as Q
from whoosh_spark.index import Index, build_index
from whoosh_spark.schema import IndexSchema, TEXT
from whoosh_spark.search import Searcher
from whoosh_spark.search import engine as E

VOCAB = "alfa bravo charlie delta echo foxtrot golf hotel".split()
N_DOCS = 200


@pytest.fixture(scope="module")
def ix(spark, tmp_path_factory):
    rng = random.Random(11)
    docs = [
        (i, " ".join(rng.choice(VOCAB) for _ in range(rng.randint(4, 40))))
        for i in range(N_DOCS)
    ]
    d = str(tmp_path_factory.mktemp("fusedix"))
    schema = IndexSchema.of(text=TEXT())
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in docs])
    build_index(spark, df, schema, d, sha_col=None)
    return Index(spark, d)


def T(t, boost=1.0):
    return Q.Term("text", t, boost=boost)


CASES = {
    "term": lambda: T("alfa"),
    "or2": lambda: Q.Or([T("alfa"), T("bravo")]),
    "or5": lambda: Q.Or([T(t) for t in VOCAB[:5]]),
    "or_dup": lambda: Q.Or([T("alfa"), T("alfa")]),
    "or_missing": lambda: Q.Or([T("alfa"), T("zzz")]),
    "or_minmatch": lambda: Q.Or([T(t) for t in VOCAB[:4]], minmatch=2),
    "and2": lambda: Q.And([T("alfa"), T("bravo")]),
    "and3": lambda: Q.And([T("charlie"), T("alfa"), T("bravo")]),
    "and4": lambda: Q.And([T(t) for t in VOCAB[:4]]),
    "and_missing": lambda: Q.And([T("alfa"), T("zzz")]),
    "dismax": lambda: Q.DisjunctionMax([T("alfa"), T("bravo"), T("echo")]),
    "andnot": lambda: Q.AndNot(T("alfa"), T("bravo")),
    "andnot_or_both": lambda: Q.AndNot(Q.Or([T("alfa"), T("charlie")]),
                                       Q.Or([T("bravo"), T("delta")])),
    "andnot_overlap": lambda: Q.AndNot(Q.Or([T("alfa"), T("bravo")]), T("bravo")),
    "require": lambda: Q.Require(T("alfa"), T("bravo")),
    "require_and_a": lambda: Q.Require(Q.And([T("alfa"), T("charlie")]), T("echo")),
    "phrase2": lambda: Q.Phrase("text", ["alfa", "bravo"]),
    "phrase3": lambda: Q.Phrase("text", ["alfa", "bravo", "charlie"]),
    "phrase1": lambda: Q.Phrase("text", ["alfa"]),
    "phrase_dup": lambda: Q.Phrase("text", ["alfa", "alfa"]),
    "phrase_missing": lambda: Q.Phrase("text", ["alfa", "zzz"]),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_fused_single_bit_identical(ix, name, monkeypatch):
    q = CASES[name]()
    s = Searcher(ix, exact_scores=True, cache_postings=False,
                 use_local=False, local_threshold=0)
    # fused path must actually be taken for these shapes (except when a
    # word/term is missing the kernel may still answer — just assert
    # eligibility for the positive shapes)
    if "missing" not in name:
        assert s._fused_single(q, 15) is not None, "shape not routed to kernel"
    got = [(r["doc_id"], r["score"]) for r in s.search(q, limit=15).collect()]
    monkeypatch.setattr(E.Searcher, "_fused_single", lambda self, q_, l_: None)
    want = [(r["doc_id"], r["score"]) for r in s.search(q, limit=15).collect()]
    assert got == want, (name, got[:5], want[:5])


def test_fused_relaxed_contract_not_routed(ix):
    """exact_scores=False searchers keep their aggregation plan (oracle
    comparisons hash that plan's output)."""
    s = Searcher(ix, exact_scores=False, cache_postings=False, use_local=False)
    assert s._fused_single(Q.Or([T("alfa"), T("bravo")]), 10) is None


def test_fused_declines_boosts_and_mixed_shapes(ix):
    s = Searcher(ix, exact_scores=True, cache_postings=False, use_local=False,
                 local_threshold=0)
    assert s._fused_single(Q.Or([T("alfa", 2.0), T("bravo")]), 10) is None
    assert s._fused_single(Q.Or([T("alfa"), Q.Phrase("text", ["a", "b"])]), 10) is None
    assert s._fused_single(Q.And([T("alfa"), T("alfa")]), 10) is None  # dup terms
    assert s._fused_single(Q.Phrase("text", ["alfa", "bravo"], slop=2), 10) is None


def test_fused_batch_matches_dataframe_plan(ix, monkeypatch):
    import whoosh_spark.search.batch as B

    rng = random.Random(3)
    s = Searcher(ix, exact_scores=True, cache_postings=False)
    batch = [(f"q{i}", "text", rng.sample(VOCAB, 2)) for i in range(25)]

    def rows(df):
        return sorted((r["query_id"], r["rank"], r["doc_id"], r["score"])
                      for r in df.collect())

    for conj in (False, True):
        fused = rows(B.batch_fused_topk(s, batch, k=8, conjunctive=conj))
        if conj:
            plan = rows(B.batch_conjunctive_search(s, batch, k=8))
        else:
            monkeypatch.setattr(B, "batch_fused_topk", lambda *a, **kw: None)
            plan = rows(B.batch_term_search(s, batch, k=8, use_wand=False))
            monkeypatch.undo()
        assert fused == plan, f"conjunctive={conj}"


def test_fused_declines_tombstoned_index(spark, ix, tmp_path):
    """Deleted docs force the fallback (the kernel reads raw blocks)."""
    import shutil

    from whoosh_spark.index.merge import delete_docs

    d = str(tmp_path / "delix")
    shutil.copytree(ix.index_dir, d)
    delete_docs(spark, d, [0, 1, 2])
    ix2 = Index(spark, d)
    s = Searcher(ix2, exact_scores=True, cache_postings=False,
                 use_local=False, local_threshold=0)
    q = Q.Or([T("alfa"), T("bravo")])
    assert s._fused_single(q, 10) is None  # kernel declined
    got = {r["doc_id"] for r in s.search(q, limit=None).collect()}
    assert not ({0, 1, 2} & got)
