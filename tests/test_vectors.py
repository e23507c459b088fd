"""Term vectors (vector=True fields): build round-trip, merge survival, and
the key-terms fast path (reference tests/test_vectors.py style +
codec/whoosh3.py:224-245 per-doc term maps)."""

import pytest
from pyspark.sql import Row, functions as F

from whoosh_spark.index import Index, build_index
from whoosh_spark.schema import IndexSchema, TEXT
from whoosh_spark.search import Searcher
from whoosh_spark.search.classify import key_terms

DOCS = [
    (0, "alfa bravo charlie delta echo alfa"),
    (1, "bravo bravo bravo charlie"),
    (2, "delta echo foxtrot golf delta"),
    (3, "alfa charlie charlie hotel india"),
]


@pytest.fixture(scope="module")
def vec_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("vecix"))
    schema = IndexSchema.of(text=TEXT(stored=True, vector=True))
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in DOCS])
    build_index(spark, df, schema, d, sha_col=None)
    return Index(spark, d)


def test_vector_roundtrip(vec_index):
    ix = vec_index
    assert ix.has_vectors("text")
    got = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in ix.vectors().filter(F.col("field") == "text").collect()
    }
    ana = ix.schema["text"].analyzer
    want = {}
    for did, text in DOCS:
        terms, _ = ana.analyze_doc(text)
        for t, tf, _ in terms:
            want[(did, t)] = tf
    assert got == want


def test_key_terms_vector_path_matches_text_path(vec_index):
    s = Searcher(vec_index)
    fast = key_terms(s, "text", [0, 1], numterms=4, use_vectors=True)
    slow = key_terms(s, "text", [0, 1], numterms=4, use_vectors=False)
    assert fast == slow
    assert fast  # non-empty


def test_vectors_survive_merge(spark, tmp_path):
    from whoosh_spark.index.merge import merge_segments

    d = str(tmp_path / "vecmerge")
    schema = IndexSchema.of(text=TEXT(stored=True, vector=True))
    half = len(DOCS) // 2
    df1 = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in DOCS[:half]])
    df2 = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in DOCS[half:]])
    build_index(spark, df1, schema, d, sha_col=None)
    from whoosh_spark.index.build import build_segment

    build_segment(spark, df2, schema, d)
    ix = Index(spark, d)
    names = [s.name for s in ix.manifest.segments]
    assert len(names) == 2
    merge_segments(spark, d, names)
    ix = Index(spark, d)
    assert len(ix.manifest.segments) == 1
    assert ix.has_vectors("text")
    got = {
        (r["doc_id"], r["term"]): r["tf"] for r in ix.vectors().collect()
    }
    ana = ix.schema["text"].analyzer
    want = {}
    for did, text in DOCS:
        terms, _ = ana.analyze_doc(text)
        for t, tf, _ in terms:
            want[(did, t)] = tf
    assert got == want
