"""Index build: documents DataFrame -> immutable Parquet posting segment.

The Spark-first re-expression of the reference write path
(/root/reference/src/whoosh/writing.py:725-797 add_document,
externalsort.py:85-226 posting pool, codec/whoosh3.py:650-869 block writer):

    docs ──(Arrow analyzer UDF)──▶ per-doc (terms, length)
         ──explode──▶ postings (field, term, doc_id, tf, positions, len_byte)
         ──groupBy(field, term, doc-bucket) + applyInPandas──▶ posting blocks
         ──groupBy(field, term) agg──▶ term stats
         └─▶ lengths table, docs (stored-fields) table, stats

Skew design: posting blocks are grouped by ``(field, term, bucket)`` where
``bucket = doc_id // bucket_width`` — a hot term like ``def`` that appears
in 10^11 docs never concentrates on one reducer: its postings split across
doc-id ranges, each group bounded by ``bucket_width`` rows. Blocks stay
globally doc-id-ordered per term (bucket asc, block asc), so queries and
merges never need a global per-term sort. This replaces the reference's
single-process external merge sort with one bounded shuffle.

Per-posting ``len_byte`` (the quantized field length BM25 needs) is
denormalized into the block payload, so *query-time scoring requires no
join against the lengths table* — at 100 TB that removes the biggest
shuffle from the hot path.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from whoosh_spark.index import codec
from whoosh_spark.index.quantize import length_to_byte_np
from whoosh_spark.index.segment import (
    Manifest,
    SegmentInfo,
    index_exists,
    next_segment_name,
    read_manifest,
    write_manifest,
)
from whoosh_spark.schema import IndexSchema, schema_to_dict

BLOCK_SIZE = 128  # max postings per block (reference blocklimit, whoosh3.py:77)
DEFAULT_BUCKET_WIDTH = 8192  # docs per salt bucket = 64 full blocks

POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("field", T.StringType()),
        T.StructField("term", T.StringType()),
        T.StructField("bucket", T.LongType()),
        T.StructField("block_no", T.IntegerType()),
        T.StructField("count", T.IntegerType()),
        T.StructField("min_id", T.LongType()),
        T.StructField("max_id", T.LongType()),
        T.StructField("max_tf", T.DoubleType()),
        T.StructField("min_len_byte", T.IntegerType()),
        T.StructField("max_len_byte", T.IntegerType()),
        T.StructField("ids", T.BinaryType()),
        T.StructField("tfs", T.BinaryType()),
        T.StructField("len_bytes", T.BinaryType()),
        T.StructField("positions", T.BinaryType()),
    ]
)


def _make_blocks(pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas kernel: one (field, term, bucket) group -> block rows."""
    pdf = pdf.sort_values("doc_id", kind="mergesort")
    field = pdf["field"].iloc[0]
    term = pdf["term"].iloc[0]
    bucket = int(pdf["bucket"].iloc[0])
    ids = pdf["doc_id"].to_numpy(dtype=np.int64)
    tfs = pdf["tf"].to_numpy(dtype=np.int64)
    lbs = pdf["len_byte"].to_numpy(dtype=np.int64)
    has_pos = "positions" in pdf.columns
    pos_lists = list(pdf["positions"]) if has_pos else None
    n = len(pdf)
    rows = []
    for start in range(0, n, BLOCK_SIZE):
        end = min(start + BLOCK_SIZE, n)
        bids = ids[start:end]
        btfs = tfs[start:end]
        blbs = lbs[start:end]
        if has_pos:
            plists = [np.asarray(p if p is not None else [], dtype=np.int64) for p in pos_lists[start:end]]
            pos_bin = codec.encode_position_lists(plists)
        else:
            pos_bin = None
        rows.append(
            {
                "field": field,
                "term": term,
                "bucket": bucket,
                "block_no": start // BLOCK_SIZE,
                "count": end - start,
                "min_id": int(bids[0]),
                "max_id": int(bids[-1]),
                "max_tf": float(btfs.max()),
                "min_len_byte": int(blbs.min()),
                "max_len_byte": int(blbs.max()),
                "ids": codec.delta_encode(bids),
                "tfs": codec.varint_encode(btfs.astype(np.uint64)),
                "len_bytes": blbs.astype(np.uint8).tobytes(),
                "positions": pos_bin,
            }
        )
    return pd.DataFrame(rows, columns=[f.name for f in POSTINGS_SCHEMA.fields])


def extract_postings(docs: DataFrame, schema: IndexSchema, doc_id_col: str = "doc_id") -> DataFrame:
    """docs -> long postings DF (field, term, doc_id, tf, positions, length, len_byte).

    One analyzer UDF pass per indexed field; unions the per-field posting
    streams (the reference emits per-field postings per doc,
    writing.py:737-767).
    """
    parts = []
    for fieldname in schema.indexed_fields():
        ftype = schema[fieldname]
        ana = ftype.analyzer
        analyzed = docs.select(
            F.col(doc_id_col).alias("doc_id"),
            ana.tokens_udf()(F.col(fieldname).cast("string")).alias("_a"),
        )
        exploded = analyzed.select(
            F.lit(fieldname).alias("field"),
            F.col("doc_id"),
            F.col("_a.length").alias("length"),
            F.explode("_a.terms").alias("_t"),
        ).select(
            "field",
            F.col("_t.term").alias("term"),
            "doc_id",
            F.col("_t.tf").alias("tf"),
            F.col("_t.positions").alias("positions"),
            "length",
        )
        parts.append(exploded)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    # quantized per-doc field length, denormalized onto every posting
    lb_udf = F.pandas_udf(lambda s: pd.Series(length_to_byte_np(s.to_numpy(dtype=np.int64))).astype("int32"), "int")
    return out.withColumn("len_byte", lb_udf(F.col("length")))


def build_segment(
    spark: SparkSession,
    docs: DataFrame,
    schema: IndexSchema,
    index_dir: str,
    doc_id_col: str = "doc_id",
    bucket_width: int = DEFAULT_BUCKET_WIDTH,
    lineage: dict | None = None,
    segment_name: str | None = None,
    commit: bool = True,
    sha_col: str | None = "content",
) -> SegmentInfo:
    """Build one immutable segment from ``docs`` and (optionally) commit it
    into the index manifest."""
    manifest = read_manifest(index_dir) if index_exists(index_dir) else None
    name = segment_name or next_segment_name(manifest)
    seg_dir = os.path.join(index_dir, "segments", name)
    os.makedirs(seg_dir, exist_ok=True)

    # ---- docs (stored fields) + ingest-fidelity sha256 ----
    stored_cols = [doc_id_col] + [c for c in schema.stored_fields() if c in docs.columns]
    docs_out = docs.select(*dict.fromkeys(stored_cols))
    if sha_col and sha_col in docs.columns:
        docs_out = docs_out.join(
            docs.select(F.col(doc_id_col), F.sha2(F.col(sha_col).cast("string"), 256).alias("content_sha256")),
            on=doc_id_col,
        )
    docs_out = docs_out.withColumnRenamed(doc_id_col, "doc_id")
    docs_out.write.mode("overwrite").parquet(os.path.join(seg_dir, "docs.parquet"))

    # ---- postings (one analyzer pass) ----
    postings = extract_postings(docs, schema, doc_id_col)
    needs_positions = any(schema[f].phrase for f in schema.indexed_fields())
    if not needs_positions:
        postings = postings.drop("positions")
    postings = postings.persist()

    # lengths table (field length per doc; also the per-field totals)
    lengths = postings.groupBy("doc_id", "field").agg(
        F.first("length").alias("length"), F.first("len_byte").alias("len_byte")
    )
    lengths.write.mode("overwrite").parquet(os.path.join(seg_dir, "lengths.parquet"))

    # term stats (drives idf + WAND bounds; reference W3TermInfo whoosh3.py:1130-1249)
    termstats = postings.groupBy("field", "term").agg(
        F.count("*").alias("df"),
        F.sum("tf").alias("total_tf"),
        F.max("tf").alias("max_tf"),
        F.min("len_byte").alias("min_len_byte"),
        F.max("len_byte").alias("max_len_byte"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )
    termstats.repartitionByRange(max(1, spark.sparkContext.defaultParallelism // 2), "field", "term").sortWithinPartitions(
        "field", "term"
    ).write.mode("overwrite").parquet(os.path.join(seg_dir, "termstats.parquet"))

    # posting blocks: skew-proof (field, term, doc-bucket) grouping
    with_bucket = postings.withColumn("bucket", (F.col("doc_id") / F.lit(bucket_width)).cast("long"))
    group_cols = ["field", "term", "bucket"]
    in_cols = group_cols + ["doc_id", "tf", "len_byte"] + (["positions"] if needs_positions else [])
    blocks = with_bucket.select(*in_cols).groupBy(*group_cols).applyInPandas(_make_blocks, POSTINGS_SCHEMA)
    # range-partition + sort by term so Parquet row-group min/max stats prune
    # term lookups to a handful of files (the sorted-terms-file analog)
    blocks.repartitionByRange(max(1, spark.sparkContext.defaultParallelism), "field", "term", "bucket").sortWithinPartitions(
        "field", "term", "bucket", "block_no"
    ).write.mode("overwrite").parquet(os.path.join(seg_dir, "postings.parquet"))

    # ---- per-segment scalar stats ----
    field_lengths_rows = lengths.groupBy("field").agg(F.sum("length").alias("total")).collect()
    field_lengths = {r["field"]: int(r["total"]) for r in field_lengths_rows}
    id_stats = docs.agg(
        F.count("*").alias("n"), F.min(doc_id_col).alias("lo"), F.max(doc_id_col).alias("hi")
    ).collect()[0]
    postings.unpersist()

    info = SegmentInfo(
        name=name,
        doc_count=int(id_stats["n"]),
        field_lengths=field_lengths,
        min_doc_id=int(id_stats["lo"]) if id_stats["lo"] is not None else 0,
        max_doc_id=int(id_stats["hi"]) if id_stats["hi"] is not None else -1,
        lineage=lineage or {},
    )

    if commit:
        commit_segment(index_dir, schema, info)
    return info


def commit_segment(index_dir: str, schema: IndexSchema, info: SegmentInfo, chunk_id=None) -> Manifest:
    manifest = read_manifest(index_dir) if index_exists(index_dir) else None
    if manifest is None:
        manifest = Manifest(generation=0, schema=schema_to_dict(schema), segments=[])
    manifest.generation += 1
    manifest.segments = [s for s in manifest.segments if s.name != info.name] + [info]
    if chunk_id is not None and chunk_id not in manifest.completed_chunks:
        manifest.completed_chunks.append(chunk_id)
    write_manifest(index_dir, manifest)
    return manifest


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    schema: IndexSchema,
    index_dir: str,
    doc_id_col: str = "doc_id",
    num_chunks: int = 1,
    bucket_width: int = DEFAULT_BUCKET_WIDTH,
    resume: bool = True,
    sha_col: str | None = "content",
) -> Manifest:
    """Chunked, checkpoint-resumable build: each chunk of the input becomes
    one segment; the manifest records completed chunks so a restarted build
    skips them (per-partition lineage per north_rule)."""
    done = set()
    if resume and index_exists(index_dir):
        done = set(read_manifest(index_dir).completed_chunks)
    if num_chunks == 1:
        if 0 not in done:
            info = build_segment(
                spark, docs, schema, index_dir, doc_id_col, bucket_width,
                lineage={"chunk_id": 0}, commit=False, sha_col=sha_col,
            )
            commit_segment(index_dir, schema, info, chunk_id=0)
    else:
        chunked = docs.withColumn("_chunk", F.pmod(F.col(doc_id_col), F.lit(num_chunks)).cast("int"))
        for chunk in range(num_chunks):
            if chunk in done:
                continue
            cdf = chunked.filter(F.col("_chunk") == chunk).drop("_chunk")
            rows = cdf.count()
            info = build_segment(
                spark, cdf, schema, index_dir, doc_id_col, bucket_width,
                lineage={"chunk_id": chunk, "rows": rows}, commit=False, sha_col=sha_col,
            )
            commit_segment(index_dir, schema, info, chunk_id=chunk)
    return read_manifest(index_dir)
