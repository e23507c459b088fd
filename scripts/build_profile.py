"""Per-phase timing of build_segment at a given SF (guide 1.1: find where
the time goes before changing anything). Not part of the frozen bench.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python scripts/build_profile.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from whoosh_spark.index.build import (
    extract_postings, lengths_table, _encode_partition, POSTINGS_SCHEMA,
    DEFAULT_BUCKET_WIDTH,
)
from whoosh_spark.schema import IndexSchema, ID, TEXT
from whoosh_spark.session import get_spark


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("build_profile", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    schema = IndexSchema.of(lang=ID(stored=True), source=ID(stored=True), text=TEXT())
    schema = schema.bind_columns(docs.columns, exclude=("doc_id",))
    nparts = max(1, spark.sparkContext.defaultParallelism)

    def timed(name, fn, warm=1, runs=2):
        for _ in range(warm):
            fn()
        best = None
        for _ in range(runs):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        print(f"{name}: {best:.2f}s")
        return best

    noop = lambda df: df.write.format("noop").mode("overwrite").save()

    spark.sparkContext.setJobDescription("docs passthrough (scan+sha)")
    stored = docs.select("doc_id", "lang", "source",
                         F.sha2(F.col("text").cast("string"), 256).alias("content_sha256"))
    timed("docs_scan_sha", lambda: noop(stored))

    spark.sparkContext.setJobDescription("tokenize (extract_postings)")
    postings = extract_postings(docs, schema)
    timed("tokenize_only", lambda: noop(postings.select("field", "term", "doc_id", "tf")))

    spark.sparkContext.setJobDescription("tokenize+shuffle+encode")
    with_bucket = postings.withColumn(
        "bucket", (F.col("doc_id") / F.lit(DEFAULT_BUCKET_WIDTH)).cast("long"))
    in_cols = ["field", "term", "bucket", "doc_id", "tf", "len_byte", "positions"]
    blocks = (
        with_bucket.select(*in_cols)
        .repartition(nparts, "field", "term", "bucket")
        .sortWithinPartitions("field", "term", "bucket", "doc_id")
        .mapInPandas(_encode_partition, POSTINGS_SCHEMA)
    )
    timed("tokenize_shuffle_encode", lambda: noop(blocks))

    spark.sparkContext.setJobDescription("lengths pass")
    lengths = lengths_table(docs, schema)
    timed("lengths_pass", lambda: noop(lengths))

    spark.stop()


if __name__ == "__main__":
    main()
