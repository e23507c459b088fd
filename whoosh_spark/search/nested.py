"""Hierarchical (parent/child) queries — the reference's NestedParent /
NestedChildren (query/nested.py:34-209, 211-415) as a DataFrame range join.

Document groups are contiguous doc_id runs where the first doc is the
parent (the reference's writer.group() layout). A child's parent is the
greatest parent doc_id <= the child's doc_id; parent ranges come from a
lead() window over the parent set, and children map in with a range join —
broadcastable when the parent set is small, a plain range join otherwise.

NestedParent:   child matches roll up to their parent;
                parent score = score_fn over its matching children
                (reference default: sum), honoring per_parent_limit
                (first N children in doc order).
NestedChildren: parents matching ``subq`` return their children
                (excluding parent docs), constant score = boost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from whoosh_spark.query import nodes as Q

_SCORE_FNS = {"sum": F.sum, "max": F.max, "min": F.min}


def _parent_ranges(searcher, parents_q: Q.Query) -> DataFrame:
    parents = searcher.matches(parents_q).select(F.col("doc_id").alias("parent_id"))
    w = Window.orderBy("parent_id")
    return parents.withColumn("next_parent", F.lead("parent_id").over(w))


def nested_parent(
    searcher,
    parents_q: Q.Query,
    child_q: Q.Query,
    per_parent_limit: int | None = None,
    score_fn: str = "sum",
    limit: int | None = 10,
) -> DataFrame:
    """Documents from ``parents_q`` whose group contains a ``child_q`` match;
    score = score_fn over matching children (reference nested.py:120-209)."""
    ranges = _parent_ranges(searcher, parents_q)
    children = searcher.matches(child_q)
    joined = children.join(
        F.broadcast(ranges),
        (children.doc_id >= ranges.parent_id)
        & (ranges.next_parent.isNull() | (children.doc_id < ranges.next_parent)),
    )
    if per_parent_limit is not None:
        w = Window.partitionBy("parent_id").orderBy(F.asc("doc_id"))
        joined = joined.withColumn("_rn", F.row_number().over(w)).filter(
            F.col("_rn") <= per_parent_limit
        )
    agg = joined.groupBy("parent_id").agg(_SCORE_FNS[score_fn]("score").alias("score"))
    out = agg.select(F.col("parent_id").alias("doc_id"), "score").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    if limit is not None:
        out = out.limit(limit)
    return out


def nested_children(
    searcher,
    parents_q: Q.Query,
    subq: Q.Query,
    boost: float = 1.0,
    limit: int | None = None,
) -> DataFrame:
    """Children of the parents matched by ``subq`` (reference
    nested.py:211-415): docs inside a matched parent's range, excluding
    parent docs themselves; constant score = boost."""
    ranges = _parent_ranges(searcher, parents_q)
    matched = searcher.matches(subq).select(F.col("doc_id").alias("parent_id"))
    mranges = ranges.join(matched, on="parent_id", how="left_semi")
    docs = searcher.index.docs().select("doc_id")
    all_parents = searcher.matches(parents_q).select(F.col("doc_id").alias("pid"))
    non_parents = docs.join(all_parents, docs.doc_id == all_parents.pid, "left_anti")
    kids = non_parents.join(
        F.broadcast(mranges),
        (non_parents.doc_id > mranges.parent_id)
        & (mranges.next_parent.isNull() | (non_parents.doc_id < mranges.next_parent)),
    ).select("doc_id").withColumn("score", F.lit(float(boost)))
    kids = kids.orderBy(F.asc("doc_id"))
    if limit is not None:
        kids = kids.limit(limit)
    return kids
