"""Query-tree introspection/rewriting API differential vs the reference
(qcore.py:271-455): leaves, apply, replace, all_terms/iter_all_terms,
existing_terms."""

import pytest
from pyspark.sql import Row

import whoosh_spark.query as Q
from whoosh_spark.index import Index, build_index
from whoosh_spark.schema import TEXT, IndexSchema


def _ours():
    return Q.And([
        Q.Term("a", "alfa"),
        Q.Or([Q.Term("a", "bravo"), Q.Not(Q.Term("b", "charlie"))]),
        Q.Phrase("a", ["delta", "echo"]),
        Q.AndNot(Q.Term("a", "foxtrot"), Q.Term("b", "golf")),
    ])


def _ref(whoosh_ref):
    from whoosh import query as rq

    return rq.And([
        rq.Term("a", "alfa"),
        rq.Or([rq.Term("a", "bravo"), rq.Not(rq.Term("b", "charlie"))]),
        rq.Phrase("a", ["delta", "echo"]),
        rq.AndNot(rq.Term("a", "foxtrot"), rq.Term("b", "golf")),
    ])


def test_all_terms_and_leaves(whoosh_ref):
    ours, ref = _ours(), _ref(whoosh_ref)
    assert ours.all_terms() == set(ref.iter_all_terms(phrases=True))
    assert ours.all_terms(phrases=False) == set(
        ref.iter_all_terms(phrases=False))
    assert sum(1 for _ in ours.leaves()) == sum(1 for _ in ref.leaves())
    assert all(leaf.is_leaf() for leaf in ours.leaves())


def test_replace_matches_reference(whoosh_ref):
    # fresh reference tree per case: the reference's Phrase.replace
    # shallow-copies and then assigns q.words[i] in place
    # (positional.py:198-204), so the copy SHARES the words list and the
    # ORIGINAL query mutates — reusing one tree across cases would compare
    # against corrupted state. We implement the documented copy semantics.
    for fld, old, new in [("a", "bravo", "brace"), ("b", "charlie", "chase"),
                          ("a", "delta", "dealt"),   # inside the phrase
                          ("b", "bravo", "nope")]:   # wrong field: no-op
        got = _ours().replace(fld, old, new)
        want = _ref(whoosh_ref).replace(fld, old, new)
        assert got.all_terms() == set(want.iter_all_terms(phrases=True)), (
            fld, old, new)

    # replace returns a copy; OUR original is untouched (the reference's
    # phrase words leak: ref.replace mutates ref for phrase-word hits)
    ours = _ours()
    ours.replace("a", "alfa", "x")
    ours.replace("a", "delta", "x")
    assert ("a", "alfa") in ours.all_terms()
    assert ("a", "delta") in ours.all_terms()
    ref = _ref(whoosh_ref)
    ref.replace("a", "delta", "x")
    assert ("a", "x") in set(ref.iter_all_terms(phrases=True))  # the bug


def test_apply_rebuilds_every_arity():
    boost2 = lambda q: q.with_boost(2.0)
    for q in [_ours(), Q.Not(Q.Term("a", "x")),
              Q.ConstantScore(Q.Term("a", "x")),
              Q.AndMaybe(Q.Term("a", "x"), Q.Term("a", "y"))]:
        out = q.apply(boost2)
        assert type(out) is type(q)
        assert all(c.boost == 2.0 for c in out.children())
        assert all(c.boost == 1.0 for c in q.children())  # copy, not mutate


def test_existing_terms(spark, tmp_path):
    d = str(tmp_path / "exterms")
    schema = IndexSchema.of(body=TEXT())
    build_index(spark, spark.createDataFrame(
        [Row(doc_id=0, body="alfa bravo charlie")]), schema, d, sha_col=None)
    ix = Index(spark, d)
    q = Q.Or([Q.Term("body", "alfa"), Q.Term("body", "zulu"),
              Q.Phrase("body", ["bravo", "missing"])])
    assert q.existing_terms(ix) == {("body", "alfa"), ("body", "bravo")}
    assert q.existing_terms(ix, phrases=False) == {("body", "alfa")}
