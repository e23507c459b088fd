"""Schema evolution: add_field / remove_field / optimize-away.

Mirrors the reference's test_flexible.py (test_addfield,
test_removefield, test_optimize_away; semantics in index.py:228-248 and
writing.py:600-610): the schema lives in the manifest generation, so
adding a field makes it indexable for subsequent segments, removing a
field hides its already-indexed data immediately, and an optimize
physically expunges the dead postings/stored columns.
"""

import os

import pytest
from pyspark.sql import Row

import whoosh_spark.query as Q
from whoosh_spark.index import Index, build_index, build_segment
from whoosh_spark.index.merge import apply_merge_policy, merge_segments
from whoosh_spark.schema import ID, KEYWORD, TEXT, IndexSchema
from whoosh_spark.search import Searcher


def _base_index(spark, d):
    schema = IndexSchema.of(id=ID(stored=True), content=TEXT())
    rows = [Row(doc_id=i, id=t, content=c) for i, (t, c) in enumerate(
        [("a", "alfa"), ("b", "bravo"), ("c", "charlie")])]
    build_index(spark, spark.createDataFrame(rows), schema, d, sha_col=None)
    return Index(spark, d)


def test_addfield(spark, tmp_path):
    d = str(tmp_path / "addfield")
    ix = _base_index(spark, d)

    ix.add_field("added", KEYWORD(stored=True))
    assert "added" in ix.schema
    with pytest.raises(ValueError):
        ix.add_field("added", KEYWORD())

    rows2 = [Row(doc_id=3, id="d", content="delta", added="fourth"),
             Row(doc_id=4, id="e", content="echo", added="fifth")]
    build_segment(spark, spark.createDataFrame(rows2), ix.schema, d,
                  sha_col=None)
    ix.reload()
    s = Searcher(ix)

    # ("id", "d") in reader / the new field searches
    assert s.document_numbers(id="d") == [3]
    assert [r["doc_id"] for r in
            s.search(Q.Term("added", "fourth"), limit=5).collect()] == [3]
    # reference: s.document(id="d") == {"id": "d", "added": "fourth"}
    assert s.document(id="d") == {"doc_id": 3, "id": "d", "added": "fourth"}
    # older docs simply lack the new stored field
    assert s.document(id="b") == {"doc_id": 1, "id": "b"}


def test_removefield(spark, tmp_path):
    d = str(tmp_path / "removefield")
    schema = IndexSchema.of(id=ID(stored=True), content=TEXT(),
                            city=KEYWORD(stored=True))
    rows = [Row(doc_id=i, id=t, content=c, city=y) for i, (t, c, y) in
            enumerate([("b", "bravo", "baghdad"), ("c", "charlie", "cairo"),
                       ("d", "delta", "dakar")])]
    build_index(spark, spark.createDataFrame(rows), schema, d, sha_col=None)
    ix = Index(spark, d)
    s = Searcher(ix)
    assert s.document(id="c") == {"doc_id": 1, "id": "c", "city": "cairo"}

    ix.remove_field("content")
    ix.remove_field("city")
    with pytest.raises(ValueError):
        ix.remove_field("city")
    assert sorted(ix.schema.fields) == ["id"]
    assert ix.schema.stored_fields() == ["id"]

    s = Searcher(ix)
    # ("content", "charlie") not in reader: postings masked immediately
    assert s.search(Q.Term("content", "charlie"), limit=5).collect() == []
    assert s.doc_frequency("content", "charlie") == 0
    assert s.frequency("city", "cairo") == 0
    # stored values of removed fields drop out of documents
    assert s.document(id="c") == {"doc_id": 1, "id": "c"}
    # surviving field still searches
    assert s.document_numbers(id="d") == [2]


def test_optimize_away(spark, tmp_path):
    d = str(tmp_path / "optimizeaway")
    schema = IndexSchema.of(id=ID(stored=True), content=TEXT(),
                            city=KEYWORD(stored=True))
    rows = [Row(doc_id=i, id=t, content=c, city=y) for i, (t, c, y) in
            enumerate([("b", "bravo", "baghdad"), ("c", "charlie", "cairo"),
                       ("d", "delta", "dakar")])]
    build_index(spark, spark.createDataFrame(rows), schema, d, sha_col=None)
    ix = Index(spark, d)
    ix.remove_field("content")
    ix.remove_field("city")

    # single clean segment, but removed-field data to expunge -> rewrites
    assert apply_merge_policy(spark, d, "OPTIMIZE") != []
    ix.reload()
    assert not ix._ghost_fields

    # physically gone: raw segment tables carry no trace of the fields
    seg = ix.manifest.segments[0]
    raw_posting_fields = {
        r["field"] for r in spark.read.parquet(
            os.path.join(seg.path(d), "postings.parquet"))
        .select("field").distinct().collect()}
    assert raw_posting_fields == {"id"}
    raw_doc_cols = spark.read.parquet(
        os.path.join(seg.path(d), "docs.parquet")).columns
    assert "city" not in raw_doc_cols and "content" not in raw_doc_cols
    assert seg.field_lengths.get("content") is None

    s = Searcher(ix)
    assert s.search(Q.Term("content", "charlie"), limit=5).collect() == []
    assert s.document(id="c") == {"doc_id": 1, "id": "c"}


def test_addfield_then_merge_keeps_new_field(spark, tmp_path):
    d = str(tmp_path / "addmerge")
    ix = _base_index(spark, d)
    ix.add_field("added", KEYWORD(stored=True))
    rows2 = [Row(doc_id=3, id="d", content="delta", added="fourth")]
    build_segment(spark, spark.createDataFrame(rows2), ix.schema, d,
                  sha_col=None)
    ix.reload()
    merge_segments(spark, d, [s.name for s in ix.manifest.segments])
    ix.reload()
    s = Searcher(ix)
    assert len(ix.manifest.segments) == 1
    assert s.document(id="d") == {"doc_id": 3, "id": "d", "added": "fourth"}
    assert s.document(id="a") == {"doc_id": 0, "id": "a"}
    assert [r["doc_id"] for r in
            s.search(Q.Term("added", "fourth"), limit=5).collect()] == [3]
