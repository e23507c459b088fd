"""Structured Streaming incremental indexing (BufferedWriter analog)."""

import json
import os

import pytest

import whoosh_spark.query as Q
from whoosh_spark.index import Index, build_index
from whoosh_spark.index.segment import read_manifest
from whoosh_spark.schema import IndexSchema, ID, TEXT
from whoosh_spark.search import Searcher
from whoosh_spark.streaming import index_stream, serve_query_stream


def test_stream_indexing(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")

    # three json files -> three micro-batches (maxFilesPerTrigger=1)
    for b in range(3):
        with open(src / f"batch{b}.json", "w") as f:
            for i in range(5):
                doc_id = b * 100 + i
                f.write(json.dumps({"doc_id": doc_id, "key": str(doc_id),
                                    "content": f"alfa bravo word{b}"}) + "\n")

    stream = (
        spark.readStream.schema("doc_id long, key string, content string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    schema = IndexSchema.of(key=ID(stored=True), content=TEXT())
    q = index_stream(
        stream, schema, idx, sha_col="content",
        merge_every=0, checkpoint_dir=ckpt,
        trigger={"availableNow": True},
    )
    q.awaitTermination(300)

    m = read_manifest(idx)
    assert m.doc_count_all() == 15
    assert len(m.segments) == 3
    chunks = set(m.completed_chunks)
    assert {"stream-0", "stream-1", "stream-2"} <= chunks

    ix = Index(spark, idx)
    s = Searcher(ix)
    got = s.search(Q.Term("content", "alfa"), limit=20).collect()
    assert len(got) == 15
    w1 = s.search(Q.Term("content", "word1"), limit=20).collect()
    assert sorted(r["doc_id"] for r in w1) == [100, 101, 102, 103, 104]

    # restart with one more file: replayed batches are skipped via lineage,
    # the new file becomes one new segment
    with open(src / "batch3.json", "w") as f:
        for i in range(5):
            f.write(json.dumps({"doc_id": 300 + i, "key": str(300 + i),
                                "content": "alfa charlie word3"}) + "\n")
    q2 = index_stream(
        stream, schema, idx, sha_col="content",
        merge_every=0, checkpoint_dir=ckpt,
        trigger={"availableNow": True},
    )
    q2.awaitTermination(300)
    m2 = read_manifest(idx)
    assert m2.doc_count_all() == 20
    got = Searcher(Index(spark, idx)).search(Q.Term("content", "word3"), limit=20).collect()
    assert sorted(r["doc_id"] for r in got) == [300, 301, 302, 303, 304]


def test_stream_with_merge(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    idx = str(tmp_path / "idx")
    for b in range(6):
        with open(src / f"b{b}.json", "w") as f:
            for i in range(3):
                f.write(json.dumps({"doc_id": b * 10 + i, "key": str(b * 10 + i),
                                    "content": "alfa tiny"}) + "\n")
    stream = (
        spark.readStream.schema("doc_id long, key string, content string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    schema = IndexSchema.of(key=ID(stored=True), content=TEXT())
    q = index_stream(
        stream, schema, idx, sha_col="content",
        merge_policy="MERGE_SMALL", merge_every=6,
        checkpoint_dir=str(tmp_path / "ck"),
        trigger={"availableNow": True},
    )
    q.awaitTermination(300)
    m = read_manifest(idx)
    assert m.doc_count_all() == 18
    # the fibonacci heuristic needs >4 segments; at 6 it merges the first 5
    # (reference writing.py:85-95: merge point at i>3 while total < fib(i+5))
    assert len(m.segments) == 2
    got = Searcher(Index(spark, idx)).search(Q.Term("content", "alfa"), limit=20).collect()
    assert len(got) == 18


def test_serve_query_stream(spark, tmp_path):
    """Streaming query serving: each micro-batch of query strings is routed
    through batch_search; results land as parquet partitioned by batch_id
    and match direct per-query engine results."""
    from pyspark.sql import Row
    from whoosh_spark.query.parser import QueryParser

    idx = str(tmp_path / "idx")
    import random

    rng = random.Random(7)
    vocab = "alfa bravo charlie delta echo foxtrot".split()
    rows = [
        Row(doc_id=i, content=" ".join(rng.choice(vocab) for _ in range(12)))
        for i in range(80)
    ]
    schema = IndexSchema.of(content=TEXT())
    build_index(spark, spark.createDataFrame(rows), schema, idx, sha_col=None)

    qsrc = tmp_path / "qsrc"
    qsrc.mkdir()
    out = str(tmp_path / "results")
    ckpt = str(tmp_path / "qckpt")
    batches = [
        [("q1", "alfa"), ("q2", "alfa echo"), ("q3", '"bravo charlie"')],
        [("q4", "del*"), ("q5", "foxtrot bravo")],
    ]
    for b, qs in enumerate(batches):
        with open(qsrc / f"queries{b}.json", "w") as f:
            for qid, qtext in qs:
                f.write(json.dumps({"query_id": qid, "query": qtext}) + "\n")

    stream = (
        spark.readStream.schema("query_id string, query string")
        .option("maxFilesPerTrigger", 1)
        .json(str(qsrc))
    )
    parser = QueryParser("content", schema, group="or")
    q = serve_query_stream(
        idx, stream, out, k=10, parser=parser,
        searcher_opts={"exact_scores": True, "use_local": False},
        checkpoint_dir=ckpt, trigger={"availableNow": True},
    )
    q.awaitTermination(300)

    got = spark.read.parquet(out)
    assert "batch_id" in got.columns  # partition-discovery column
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], round(r["score"], 9)))
    s = Searcher(Index(spark, idx), exact_scores=True, use_local=False)
    for qs in batches:
        for qid, qtext in qs:
            want = [(i + 1, r["doc_id"], round(r["score"], 9))
                    for i, r in enumerate(
                        s.search(parser.parse(qtext), limit=10).collect())]
            assert sorted(by_q.get(qid, [])) == want, qid
    # two micro-batches -> two batch_id partitions
    n_batches = {r["batch_id"] for r in got.select("batch_id").distinct().collect()}
    assert len(n_batches) == 2

    # restart with a new query file AND new docs committed to the index:
    # refresh=True re-opens the manifest, so the new segment is searchable
    from whoosh_spark.index.build import build_segment, commit_segment

    more = [Row(doc_id=1000 + i, content="golf golf alfa") for i in range(5)]
    info = build_segment(spark, spark.createDataFrame(more), schema, idx,
                         sha_col=None, commit=False)
    commit_segment(idx, schema, info, chunk_id="extra")
    with open(qsrc / "queries2.json", "w") as f:
        f.write(json.dumps({"query_id": "q6", "query": "golf"}) + "\n")
    q2 = serve_query_stream(
        idx, stream, out, k=10, parser=parser,
        searcher_opts={"exact_scores": True, "use_local": False},
        checkpoint_dir=ckpt, trigger={"availableNow": True},
    )
    q2.awaitTermination(300)
    got2 = spark.read.parquet(out).where("query_id = 'q6'").collect()
    assert sorted(r["doc_id"] for r in got2) == [1000, 1001, 1002, 1003, 1004]
