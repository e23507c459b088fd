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
