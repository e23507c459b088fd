import os

import pytest
from pyspark.sql import Row, functions as F

from whoosh_spark.index import Index, build_index
from whoosh_spark.schema import IndexSchema, ID, TEXT

DOCS = [
    ("A", "Yellow brown", "Blue red green render purple?"),
    ("B", "Alpha beta", "Gamma delta epsilon omega."),
    ("C", "One two", "Three rendered four five."),
    ("D", "Quick went", "Every red town."),
    ("E", "Yellow uptown", "Interest rendering outer photo!"),
]


@pytest.fixture(scope="module")
def tiny_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx"))
    schema = IndexSchema.of(key=ID(stored=True), name=TEXT(), value=TEXT())
    df = spark.createDataFrame(
        [Row(doc_id=i, key=k, name=n, value=v) for i, (k, n, v) in enumerate(DOCS)]
    )
    build_index(spark, df, schema, d, sha_col="value")
    return Index(spark, d)


def test_manifest_and_stats(tiny_index):
    ix = tiny_index
    assert ix.doc_count_all() == 5
    # 'name' lengths: each title is 2 tokens, all kept
    assert ix.manifest.field_length("name") == 10
    assert ix.avg_field_length("name") == 2.0


def test_postings_roundtrip(tiny_index):
    ix = tiny_index
    p = ix.postings_for("name", ["yellow"]).orderBy("doc_id").collect()
    assert [(r["doc_id"], r["tf"]) for r in p] == [(0, 1), (4, 1)]
    p = ix.postings_for("value", ["red"]).orderBy("doc_id").collect()
    assert [r["doc_id"] for r in p] == [0, 3]


def test_positions_roundtrip(tiny_index):
    p = tiny_index.postings_for("value", ["red"], with_positions=True).orderBy("doc_id").collect()
    # doc A: "Blue red green render purple" -> red at kept-pos 1
    assert list(p[0]["positions"]) == [1]


def test_term_stats(tiny_index):
    st = tiny_index.term_stats("value", ["red", "render"])
    assert st["red"]["df"] == 2
    assert st["render"]["df"] == 1


def test_sha256_recorded(tiny_index, spark):
    docs = tiny_index.docs()
    assert "content_sha256" in docs.columns
    row = docs.filter(F.col("key") == "A").collect()[0]
    import hashlib

    assert row["content_sha256"] == hashlib.sha256(DOCS[0][2].encode()).hexdigest()


def test_multi_chunk_build_and_resume(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_chunks"))
    schema = IndexSchema.of(key=ID(stored=True), value=TEXT())
    df = spark.createDataFrame(
        [Row(doc_id=i, key=str(i), value=f"alfa bravo token{i % 3}") for i in range(20)]
    )
    m = build_index(spark, df, schema, d, num_chunks=3, sha_col="value")
    assert len(m.segments) == 3
    assert sorted(m.completed_chunks) == [0, 1, 2]
    ix = Index(spark, d)
    assert ix.doc_count_all() == 20
    p = ix.postings_for("value", ["alfa"]).collect()
    assert len(p) == 20
    # resume: a second call is a no-op (all chunks recorded)
    m2 = build_index(spark, df, schema, d, num_chunks=3, sha_col="value")
    assert m2.generation == m.generation
    # every chunk's lineage carries its identity AND build metrics
    # (north rule: per-partition lineage + metrics)
    for s in m.segments:
        assert s.lineage["chunk_id"] in (0, 1, 2)
        met = s.lineage["metrics"]
        assert met["build_sec"] > 0 and met["docs_per_sec"] > 0
        assert met["bytes"]["postings"] > 0 and met["bytes"]["docs"] > 0


def test_hot_term_bucketing(spark, tmp_path_factory):
    # hot term in every doc across a wide doc_id range -> multiple buckets
    d = str(tmp_path_factory.mktemp("idx_hot"))
    schema = IndexSchema.of(value=TEXT())
    df = spark.createDataFrame([Row(doc_id=i * 100, value="def unique%d" % i) for i in range(400)])
    build_index(spark, df, schema, d, sha_col=None)
    ix = Index(spark, d)
    blocks = ix.postings_blocks().filter(F.col("term") == "def")
    nbuckets = blocks.select("bucket").distinct().count()
    assert nbuckets > 1  # skew split across doc-id buckets
    decoded = ix.postings_for("value", ["def"])
    assert decoded.count() == 400
    # every block respects the 128-posting cap
    assert blocks.agg(F.max("count")).collect()[0][0] <= 128


def test_null_and_empty_text_docs(spark, tmp_path_factory):
    """Docs with NULL or empty field values build cleanly: the doc exists
    (stored + counted, like the reference's missing-field add_document)
    but contributes no postings. Regression: an Arrow batch containing
    ONLY such docs used to crash the kernel (empty pd.DataFrame types the
    positions column float64, unconvertible to list<int32>)."""
    from pyspark.sql import Row

    import whoosh_spark.query as Q
    from whoosh_spark.search import Searcher

    d = str(tmp_path_factory.mktemp("nulls"))
    rows = [Row(doc_id=0, text="alfa bravo"), Row(doc_id=1, text=""),
            Row(doc_id=2, text=None)]
    # 4 partitions over 3 rows forces at least one all-null/empty batch
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(4)
    build_index(spark, df, IndexSchema.of(text=TEXT()), d, sha_col=None)
    ix = Index(spark, d)
    assert ix.manifest.doc_count_all() == 3
    got = Searcher(ix).search(Q.Term("text", "alfa"), limit=5).collect()
    assert [r["doc_id"] for r in got] == [0]
    # the NULL doc has no lengths row; the empty-string doc has one with 0
    lens = {r["doc_id"]: r["length"] for r in ix.lengths().collect()}
    assert lens == {0: 2, 1: 0}


def test_crash_mid_build_resumes_missing_chunks_only(spark, tmp_path_factory, monkeypatch):
    """A build killed between chunk commits restarts from the manifest's
    completed_chunks record: already-committed chunks are NOT rebuilt and
    the finished index equals an uninterrupted build (north rule:
    checkpoint-resumable via per-partition lineage)."""
    import whoosh_spark.index.build as B
    import whoosh_spark.query as Q
    from whoosh_spark.index.segment import read_manifest
    from whoosh_spark.search import Searcher

    d = str(tmp_path_factory.mktemp("idx_crash"))
    schema = IndexSchema.of(key=ID(stored=True), value=TEXT())
    df = spark.createDataFrame(
        [Row(doc_id=i, key=str(i), value=f"alfa bravo token{i % 3}") for i in range(20)]
    )

    real = B.build_segment
    calls = []

    def failing(spark_, docs_, schema_, index_dir_, *a, **kw):
        chunk = (kw.get("lineage") or {}).get("chunk_id")
        calls.append(chunk)
        if chunk == 2:
            raise RuntimeError("simulated executor loss")
        return real(spark_, docs_, schema_, index_dir_, *a, **kw)

    monkeypatch.setattr(B, "build_segment", failing)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="simulated"):
        B.build_index(spark, df, schema, d, num_chunks=3, sha_col="value")
    assert sorted(read_manifest(d).completed_chunks) == [0, 1]

    # resume with the failure injection removed: only chunk 2 builds
    monkeypatch.setattr(B, "build_segment", real)
    calls_before = len(calls)
    m = B.build_index(spark, df, schema, d, num_chunks=3, sha_col="value")
    assert len(calls) == calls_before  # committed chunks were not re-entered
    assert sorted(m.completed_chunks) == [0, 1, 2]

    # the resumed index matches an uninterrupted build, query-for-query
    d2 = str(tmp_path_factory.mktemp("idx_clean"))
    B.build_index(spark, df, schema, d2, num_chunks=3, sha_col="value")
    got = [(r["doc_id"], r["score"]) for r in Searcher(Index(spark, d))
           .search(Q.Term("value", "token1"), limit=20).collect()]
    want = [(r["doc_id"], r["score"]) for r in Searcher(Index(spark, d2))
            .search(Q.Term("value", "token1"), limit=20).collect()]
    assert got == want and got
