"""Incremental indexing from a Structured Streaming source.

The reference's near-real-time path is BufferedWriter (writing.py:1102+:
buffer docs in RAM, periodically commit a segment, merge per policy). The
Spark-native analog: ``writeStream.foreachBatch`` — every micro-batch
becomes one immutable segment committed to the manifest (chunk id =
batch id, so restarts skip replayed batches via the same lineage records
the batch build uses), with the tiered MERGE_SMALL policy keeping the
segment count bounded as the stream runs.

    q = index_stream(stream_df, schema, index_dir)
    q.awaitTermination()          # or trigger(availableNow=True) drains once
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from whoosh_spark.index.build import build_segment, commit_segment
from whoosh_spark.index.merge import apply_merge_policy
from whoosh_spark.index.segment import index_exists, read_manifest
from whoosh_spark.schema import IndexSchema


def index_stream(
    stream_df: DataFrame,
    schema: IndexSchema,
    index_dir: str,
    doc_id_col: str = "doc_id",
    sha_col: str | None = "content",
    merge_policy: str = "MERGE_SMALL",
    merge_every: int = 4,
    checkpoint_dir: str | None = None,
    trigger: dict | None = None,
):
    """Start a streaming query that appends one segment per micro-batch.

    merge_every: run the merge policy after every N committed batches
    (0 disables). Returns the StreamingQuery."""
    spark = stream_df.sparkSession

    def handle_batch(batch_df: DataFrame, batch_id: int):
        chunk = f"stream-{batch_id}"
        if index_exists(index_dir) and chunk in read_manifest(index_dir).completed_chunks:
            return  # replayed batch after restart — lineage says done
        if batch_df.isEmpty():
            return
        info = build_segment(
            spark, batch_df, schema, index_dir,
            doc_id_col=doc_id_col, sha_col=sha_col,
            lineage={"stream_batch": batch_id}, commit=False,
        )
        commit_segment(index_dir, schema, info, chunk_id=chunk)
        if merge_every and merge_policy != "NO_MERGE":
            n_batches = sum(
                1 for c in read_manifest(index_dir).completed_chunks
                if str(c).startswith("stream-")
            )
            if n_batches % merge_every == 0:
                apply_merge_policy(spark, index_dir, merge_policy)

    writer = stream_df.writeStream.foreachBatch(handle_batch).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def serve_query_stream(
    index_dir: str,
    queries_stream: DataFrame,
    out_dir: str,
    k: int = 10,
    parser=None,
    searcher_opts: dict | None = None,
    refresh: bool = True,
    checkpoint_dir: str | None = None,
    trigger: dict | None = None,
):
    """Serve a STREAM of queries against the index: every micro-batch of
    (query_id, query) rows is routed through ``batch_search`` (one posting
    scan per query shape, not one job per query) and the top-k results are
    appended to ``out_dir`` as parquet with the micro-batch id. The
    streaming face of the batch serving family — point it at the same
    ``index_dir`` an ``index_stream`` writer is committing to and, with
    ``refresh=True`` (default), each micro-batch re-opens the index
    manifest so newly committed segments become searchable immediately
    (the reference's near-real-time searcher-refresh loop,
    writing.py:1102+ BufferedWriter.searcher()).

    ``queries_stream`` schema: (query_id string, query string); strings
    are parsed with ``parser`` (required). Query rows are collected
    driver-side per micro-batch — a query log micro-batch is small by
    construction (bounded by the trigger), the CORPUS never leaves the
    executors. Replayed micro-batches after a restart overwrite their own
    partition directory (idempotent by batch_id), so results are
    exactly-once per query batch."""
    from whoosh_spark.index import Index
    from whoosh_spark.search import Searcher
    from whoosh_spark.search.batch import batch_search

    spark = queries_stream.sparkSession
    opts = searcher_opts or {}
    state: dict = {}

    def handle_batch(batch_df: DataFrame, batch_id: int):
        rows = batch_df.select("query_id", "query").collect()
        if not rows:
            return
        if refresh or "searcher" not in state:
            state["searcher"] = Searcher(Index(spark, index_dir), **opts)
        out = batch_search(
            state["searcher"],
            [(r["query_id"], r["query"]) for r in rows],
            k=k, parser=parser,
        )
        # batch_id comes back as a partition column when out_dir is read
        # as one parquet dataset — don't also write it as a data column.
        out.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}"))

    writer = queries_stream.writeStream.foreachBatch(handle_batch).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def dedup_stream_df(
    docs_stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Stateful streaming exact-dedup: emit each document whose content has
    never been seen before in the stream; drop later exact duplicates
    forever. The streaming face of ``functions.dedup.exact_dedup`` — the
    operation a training-data ingest pipeline runs continuously instead of
    as a batch job.

    Implementation: group by md5(text) and keep one small record of state
    per distinct content hash via ``applyInPandasWithState`` (Arrow-batched;
    the state store is key-partitioned across executors, so at 100 TB the
    per-key footprint is one int per distinct document — exactly the shape
    RocksDB state stores handle). Within a micro-batch, the duplicate kept
    is the lowest ``id_col`` (deterministic); across micro-batches, the
    earlier batch wins.

    Returns the deduplicated streaming DataFrame (input columns plus
    ``content_md5``); attach your own sink, e.g.::

        out = dedup_stream_df(stream)
        q = (out.writeStream.format("parquet")
                .option("path", dst).option("checkpointLocation", ckpt)
                .trigger(availableNow=True).start())
    """
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    keyed = docs_stream.withColumn("content_md5", F.md5(F.col(text_col)))
    out_schema: StructType = keyed.schema
    state_schema = "n_seen long"

    def keep_first(key, pdf_iter, state):
        seen = state.get[0] if state.exists else 0
        first = None
        n_new = 0
        for pdf in pdf_iter:
            n_new += len(pdf)
            if seen == 0 and len(pdf):
                head = pdf.sort_values(id_col, kind="stable").iloc[:1]
                first = head if first is None else (
                    pd.concat([first, head]).sort_values(
                        id_col, kind="stable").iloc[:1])
        state.update((seen + n_new,))
        if seen == 0 and first is not None:
            yield first

    return keyed.groupBy("content_md5").applyInPandasWithState(
        keep_first, out_schema, state_schema, "append", "NoTimeout"
    )


def ingest_stats_stream(
    docs_stream: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    group_col: str | None = "lang",
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked, windowed corpus-quality monitoring for a streaming
    ingest: per event-time window (and optional ``group_col``, e.g. lang
    or source), the doc count, total tokens/chars, and mean quality score
    — the same deterministic heuristics as the batch ``token_count`` /
    ``quality_score`` operators, as pure column expressions (JVM-side,
    no Python in the hot path).

    Late data handling: ``withWatermark(ts_col, watermark)`` — rows later
    than the watermark are dropped, and a window's row is emitted exactly
    once, when the watermark passes its end (append mode), so the parquet
    sink never needs upserts. State is one small row per open window per
    group — bounded by the watermark horizon regardless of corpus size.

    Returns the aggregated streaming DataFrame with columns
    (win_start, win_end[, <group_col>], n_docs, n_tokens, n_chars,
    mean_quality); attach a sink with ``outputMode("append")``."""
    from pyspark.sql import functions as F

    from whoosh_spark.functions.textstats import quality_col, tokens_col

    per_row = docs_stream.select(
        F.col(ts_col),
        *([F.col(group_col)] if group_col else []),
        F.size(tokens_col(F.col(text_col))).alias("_n_tokens"),
        F.length(F.col(text_col)).alias("_n_chars"),
        quality_col(F.col(text_col)).alias("_quality"),
    )
    agg = (
        per_row.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window).alias("win"),
            *([F.col(group_col)] if group_col else []),
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_n_tokens").alias("n_tokens"),
            F.sum("_n_chars").alias("n_chars"),
            F.round(F.avg("_quality"), 6).alias("mean_quality"),
        )
    )
    return agg.select(
        F.col("win.start").alias("win_start"),
        F.col("win.end").alias("win_end"),
        *([F.col(group_col)] if group_col else []),
        "n_docs", "n_tokens", "n_chars", "mean_quality",
    )
