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


def test_dedup_stream(spark, tmp_path):
    """Stateful streaming exact-dedup: first occurrence of each content wins
    within a batch (lowest doc_id) and across batches/restarts (state store)."""
    import time
    from whoosh_spark.streaming import dedup_stream_df

    src = tmp_path / "dsrc"
    src.mkdir()
    out = str(tmp_path / "dout")
    ckpt = str(tmp_path / "dckpt")

    t0 = time.time()
    batches = [
        [(0, "alfa bravo"), (1, "charlie delta"), (2, "alfa bravo"),
         (7, "echo foxtrot"), (3, "echo foxtrot")],
        [(10, "alfa bravo"), (11, "golf hotel"), (12, "charlie delta")],
    ]
    for b, rows in enumerate(batches):
        p = src / f"docs{b}.json"
        with open(p, "w") as f:
            for doc_id, text in rows:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
        os.utime(p, (t0 + b, t0 + b))  # force micro-batch order

    def run_once():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        q = (
            dedup_stream_df(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run_once()
    got = {(r["doc_id"], r["text"]) for r in spark.read.parquet(out).collect()}
    # batch 0: lowest doc_id per content (3 beats 7 for "echo foxtrot");
    # batch 1: only the genuinely new content survives
    assert got == {(0, "alfa bravo"), (1, "charlie delta"),
                   (3, "echo foxtrot"), (11, "golf hotel")}

    # restart: replays nothing, and previously-seen content stays dropped
    p = src / "docs2.json"
    with open(p, "w") as f:
        f.write(json.dumps({"doc_id": 20, "text": "alfa bravo"}) + "\n")
        f.write(json.dumps({"doc_id": 21, "text": "india juliet"}) + "\n")
    os.utime(p, (t0 + 2, t0 + 2))
    run_once()
    got2 = {(r["doc_id"], r["text"]) for r in spark.read.parquet(out).collect()}
    assert got2 == got | {(21, "india juliet")}


def test_ingest_stats_stream(spark, tmp_path):
    """Watermarked windowed ingest stats: per-(window, lang) counts/quality,
    late rows beyond the watermark dropped, open windows never emitted."""
    import time
    from pyspark.sql import functions as F
    from whoosh_spark.streaming import ingest_stats_stream
    from whoosh_spark.functions.textstats import quality_col, tokens_col

    src = tmp_path / "ssrc"
    src.mkdir()
    out = str(tmp_path / "sout")
    ckpt = str(tmp_path / "sckpt")

    base = "2024-01-01 10:{:02d}:00"
    mk = lambda minute, lang, text: {"ts": base.format(minute), "lang": lang,
                                     "text": text}
    batch0 = [
        mk(0, "en", "the quick brown fox jumps over the lazy dog again"),
        mk(4, "en", "a be ce de ef"),
        mk(9, "de", "der und die das nicht mit von ist auch zu"),
        mk(12, "en", "window b starts here with some more tokens now"),
    ]
    # 10:31 pushes the watermark to 10:26, past window A (10:00-10:10) and
    # B (10:10-10:20) ends — but A/B only flush in a LATER batch (the
    # watermark used by batch N is computed from batches < N)
    batch1 = [mk(31, "en", "sentinel advances the watermark for the flush")]
    # batch2 runs with watermark 10:26 -> A and B are EVICTED (emitted) at
    # its end; a row for an already-evicted window is true late data
    batch2 = [mk(32, "en", "second sentinel stays inside the open window")]
    # batch3: the 10:01 row's window was evicted in batch2 -> dropped by
    # the watermark; the sentinels' window (10:30-10:40) never closes and
    # is never emitted
    batch3 = [
        mk(1, "en", "late row must be dropped from its expired window"),
        mk(33, "en", "third sentinel stays inside the open window"),
    ]

    t0 = time.time()
    for b, rows in enumerate([batch0, batch1, batch2, batch3]):
        p = src / f"docs{b}.json"
        with open(p, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.utime(p, (t0 + b, t0 + b))

    stream = (
        spark.readStream.schema("ts timestamp, lang string, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        ingest_stats_stream(stream, window="10 minutes", watermark="5 minutes")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        (str(r["win_start"]), r["lang"]):
            (r["n_docs"], r["n_tokens"], r["n_chars"], r["mean_quality"])
        for r in spark.read.parquet(out).collect()
    }
    # expected = the same aggregation computed batch-side over exactly the
    # rows that belong in closed windows (late row and open windows excluded)
    want_rows = [r for r in batch0]
    wdf = spark.createDataFrame(want_rows).select(
        F.col("ts").cast("timestamp").alias("ts"), "lang", "text")
    want = {}
    for r in (
        wdf.select(F.window("ts", "10 minutes").alias("win"), "lang",
                   F.size(tokens_col(F.col("text"))).alias("nt"),
                   F.length("text").alias("nc"),
                   quality_col(F.col("text")).alias("q"))
        .groupBy("win", "lang")
        .agg(F.count("*").alias("n"), F.sum("nt").alias("nt"),
             F.sum("nc").alias("nc"), F.round(F.avg("q"), 6).alias("mq"))
        .collect()
    ):
        want[(str(r["win"]["start"]), r["lang"])] = (
            r["n"], r["nt"], r["nc"], r["mq"])
    assert got == want
    assert ("2024-01-01 10:00:00", "en") in got  # window A really emitted
    assert got[("2024-01-01 10:00:00", "en")][0] == 2  # late row excluded
    # the engine itself reported the drop (numRowsDroppedByWatermark)
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress if p["stateOperators"]
    )
    assert dropped == 1
