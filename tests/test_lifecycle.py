"""Index lifecycle: create_in / open_dir / exists_in, generation
bookkeeping, and empty-index searches (reference index.py:85-157 and
251-291; a freshly created index searches empty rather than erroring).
"""

import pytest
from pyspark.sql import Row

import whoosh_spark.query as Q
from whoosh_spark.index import (
    Index, build_segment, create_in, exists_in, open_dir,
)
from whoosh_spark.schema import ID, TEXT, IndexSchema
from whoosh_spark.search import Searcher


def test_create_open_exists(spark, tmp_path):
    d = str(tmp_path / "fresh")
    assert not exists_in(d)
    with pytest.raises(FileNotFoundError):
        open_dir(spark, d)

    schema = IndexSchema.of(id=ID(stored=True), content=TEXT())
    ix = create_in(spark, d, schema)
    assert exists_in(d)
    assert ix.latest_generation() == 0 and ix.up_to_date()
    assert ix.is_empty() and ix.doc_count() == 0

    ix2 = open_dir(spark, d)
    assert "content" in ix2.schema and ix2.schema["content"].indexed


def test_empty_index_searches_empty(spark, tmp_path):
    d = str(tmp_path / "empty")
    schema = IndexSchema.of(id=ID(stored=True), content=TEXT())
    ix = create_in(spark, d, schema)
    s = Searcher(ix)

    assert s.search(Q.Term("content", "alfa"), limit=5).collect() == []
    assert s.search(Q.Or([Q.Term("content", "a"), Q.Prefix("content", "b")]),
                    limit=5).collect() == []
    assert s.search(Q.Every(), limit=5).collect() == []
    assert s.doc_frequency("content", "alfa") == 0
    assert s.frequency("content", "alfa") == 0
    assert s.lexicon("content") == []
    assert s.documents() == []
    assert s.document(id="a") is None


def test_refresh_sees_new_commits(spark, tmp_path):
    d = str(tmp_path / "refresh")
    schema = IndexSchema.of(id=ID(stored=True), content=TEXT())
    create_in(spark, d, schema)

    stale = open_dir(spark, d)  # handle opened before the commit
    writer_ix = open_dir(spark, d)
    build_segment(spark, spark.createDataFrame(
        [Row(doc_id=0, id="a", content="alfa bravo")]),
        writer_ix.schema, d, sha_col=None)

    assert not stale.up_to_date()
    assert stale.doc_count() == 0  # manifest snapshot semantics
    stale.refresh()
    assert stale.up_to_date() and stale.doc_count() == 1
    assert stale.last_modified() > 0
    got = Searcher(stale).search(Q.Term("content", "alfa"), limit=5).collect()
    assert [r["doc_id"] for r in got] == [0]


def test_index_optimize_method(spark, tmp_path):
    d = str(tmp_path / "opt")
    schema = IndexSchema.of(id=ID(stored=True), content=TEXT())
    create_in(spark, d, schema)
    for base in (0, 10):
        build_segment(spark, spark.createDataFrame(
            [Row(doc_id=base, id=f"d{base}", content="alfa")]),
            schema, d, sha_col=None)
    ix = open_dir(spark, d)
    assert len(ix.manifest.segments) == 2
    ix.optimize()
    assert len(ix.manifest.segments) == 1
    assert ix.doc_count() == 2
