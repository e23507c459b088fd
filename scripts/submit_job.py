"""spark-submit entry point: build an index and run queries from a plain
cluster job (the north_rule deployment mode).

Package and submit (local demo of the cluster invocation):

    python scripts/make_pyfiles.py                      # -> dist/whoosh_spark.zip
    spark-submit --master 'local[8]' \\
        --py-files dist/whoosh_spark.zip \\
        scripts/submit_job.py \\
        --input /path/to/corpus.parquet \\
        --index /path/to/index_dir \\
        --chunks 4 --query 'def AND import'

On a real cluster only --master/--deploy-mode change; the job is identical.
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="corpus (repo,path,commit,lang,content): a parquet "
                         "path, or table:NAME for a catalog table (e.g. an "
                         "Iceberg table registered in the session catalog)")
    ap.add_argument("--index", required=True, help="index output directory")
    ap.add_argument("--chunks", type=int, default=1, help="segments/checkpoint chunks")
    ap.add_argument("--query", default=None, help="query string to run after building")
    ap.add_argument("--limit", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from whoosh_spark.index import Index, build_index
    from whoosh_spark.query.parser import QueryParser
    from whoosh_spark.schema import code_corpus_schema
    from whoosh_spark.search import Searcher

    from whoosh_spark.corpus import assign_doc_ids

    spark = SparkSession.builder.appName("whoosh_spark_build").getOrCreate()
    if args.input.startswith("table:"):
        docs = spark.read.table(args.input[len("table:"):])
    else:
        docs = spark.read.parquet(args.input)
    if "doc_id" not in docs.columns:
        # contiguous (repo, path)-ordered ids, no single-partition shuffle
        docs = assign_doc_ids(docs, ("repo", "path"))

    t0 = time.time()
    manifest = build_index(
        spark, docs, code_corpus_schema(), args.index,
        num_chunks=args.chunks, sha_col="content",
    )
    out = {
        "built_segments": len(manifest.segments),
        "docs": manifest.doc_count_all(),
        "build_sec": round(time.time() - t0, 2),
    }

    if args.query:
        ix = Index(spark, args.index)
        q = QueryParser("content", ix.schema).parse(args.query)
        t0 = time.time()
        rows = Searcher(ix, exact_scores=False).search(q, limit=args.limit).collect()
        out["query"] = args.query
        out["query_sec"] = round(time.time() - t0, 2)
        out["hits"] = [[int(r["doc_id"]), float(r["score"])] for r in rows]

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
