"""Dynamic (glob) fields — reference fields.py:1376-1384,1446-1491:
``schema.add("*_text", TEXT, glob=True)`` makes any column matching the
pattern indexable with that type. Mirrors the reference's
test_indexing.py:test_globfield_length_merge, test_glob_optimize and
test_writing.py:test_add_field.
"""

import pytest
from pyspark.sql import Row

import whoosh_spark.query as Q
from whoosh_spark.index import Index, build_index, build_segment
from whoosh_spark.index.merge import merge_segments
from whoosh_spark.query.parser import QueryParser
from whoosh_spark.schema import (
    ID, KEYWORD, STORED, TEXT, IndexSchema, schema_from_dict, schema_to_dict,
)
from whoosh_spark.search import Searcher


def test_schema_glob_resolution_and_roundtrip():
    sch = IndexSchema.of(title=TEXT(stored=True))
    # a factory is accepted like the reference accepts a FieldType class
    sch.add("*_text", TEXT, glob=True)
    sch.add("f*", STORED(), glob=True)

    assert "content_text" in sch and sch["content_text"].indexed
    assert "f1" in sch and sch["f1"].stored and not sch["f1"].indexed
    assert "nope" not in sch
    with pytest.raises(KeyError):
        sch["nope"]
    with pytest.raises(ValueError):
        sch.add("*_text", TEXT, glob=True)

    rt = schema_from_dict(schema_to_dict(sch))
    assert "content_text" in rt and rt["content_text"].indexed
    assert sorted(rt.dyn_fields) == ["*_text", "f*"]
    assert sorted(rt.fields) == ["title"]

    bound = rt.bind_columns(["doc_id", "title", "content_text", "f2"])
    assert sorted(bound.fields) == ["content_text", "f2", "title"]
    # patterns survive binding; unmatched names still out
    assert "other" not in bound.fields


def test_globfield_search_and_merge(spark, tmp_path):
    # reference test_indexing.py:test_globfield_length_merge
    d = str(tmp_path / "globlen")
    schema = IndexSchema.of(title=TEXT(stored=True), path=ID(stored=True))
    schema.add("*_text", TEXT, glob=True)

    df1 = spark.createDataFrame([Row(
        doc_id=0, title="First document", path="/a",
        content_text="This is the first document we've added!")])
    build_index(spark, df1, schema, d, sha_col=None)
    ix = Index(spark, d)
    df2 = spark.createDataFrame([Row(
        doc_id=1, title="Second document", path="/b",
        content_text="The second document is even more interesting!")])
    build_segment(spark, df2, ix.schema, d, sha_col=None)
    ix.reload()

    # doc_field_length analog: the dynamic field records lengths
    assert ix.manifest.field_length("content_text") > 0

    s = Searcher(ix)
    qp = QueryParser("content", ix.schema)
    q = qp.parse("content_text:document")
    paths_of = lambda res: sorted(
        r["path"] for r in ix.docs().join(
            res.select("doc_id"), "doc_id", "left_semi").collect())
    assert paths_of(s.search(q, limit=10)) == ["/a", "/b"]

    # merge keeps dynamic-field postings and lengths (issue 343 analog)
    merge_segments(spark, d, [seg.name for seg in ix.manifest.segments])
    ix.reload()
    s = Searcher(ix)
    assert len(ix.manifest.segments) == 1
    assert paths_of(s.search(q, limit=10)) == ["/a", "/b"]
    assert ix.manifest.field_length("content_text") > 0


def test_add_field_glob_stored(spark, tmp_path):
    # reference test_writing.py:test_add_field
    d = str(tmp_path / "addglob")
    schema = IndexSchema.of(a=TEXT())
    build_index(spark, spark.createDataFrame(
        [Row(doc_id=0, a="alfa bravo charlie")]), schema, d, sha_col=None)
    ix = Index(spark, d)
    ix.add_field("b", ID(stored=True))
    ix.add_field("c*", ID(stored=True), glob=True)
    build_segment(spark, spark.createDataFrame(
        [Row(doc_id=1, a="delta echo foxtrot", b="india", cat="juliet")]),
        ix.schema, d, sha_col=None)
    ix.reload()
    s = Searcher(ix)
    assert s.document(b="india") == {"doc_id": 1, "b": "india",
                                     "cat": "juliet"}
    # the dynamic field is searchable too
    assert [r["doc_id"] for r in
            s.search(Q.Term("cat", "juliet"), limit=5).collect()] == [1]


def test_glob_stored_survives_optimize(spark, tmp_path):
    # reference test_indexing.py:test_glob_optimize (issue 472)
    d = str(tmp_path / "globopt")
    schema = IndexSchema(fields={}, dyn_fields={})
    schema.add("f*", STORED, glob=True)
    schema.add("key", ID(stored=True))
    build_index(spark, spark.createDataFrame(
        [Row(doc_id=0, key="k0", f1=1, f2=2)]), schema, d, sha_col=None)
    build_segment(spark, spark.createDataFrame(
        [Row(doc_id=1, key="k1", f1=3, f2=4)]),
        Index(spark, d).schema, d, sha_col=None)
    merge_segments(spark, d, [s.name for s in
                              Index(spark, d).manifest.segments])
    ix = Index(spark, d)
    rows = {r["doc_id"]: r.asDict() for r in ix.docs().collect()}
    assert rows[0]["f1"] == 1 and rows[0]["f2"] == 2
    assert rows[1]["f1"] == 3 and rows[1]["f2"] == 4
