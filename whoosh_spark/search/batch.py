"""Batch query serving: evaluate MANY queries in one Spark job.

The per-query DataFrame planner (engine.py) pays Spark job-scheduling
latency per query — right for interactive use, wrong for throughput. The
scalable serving pattern joins a *query table* against the index once:

    queries (query_id, field, term[, weight]) --broadcast-->
      posting blocks (filter term IN query terms) -> decode -> score
      -> join queries -> groupBy (query_id, doc_id) -> window top-k

One shuffle for any number of queries; throughput scales with cores and
cluster size (this powers the N vs 4N scaling evidence in bench.py).

Supported batch shapes: bags of weighted terms per query, scored BM25F and
combined by sum — the Or/term workload that dominates search serving.
Conjunctive batches add a HAVING count = n_terms filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from whoosh_spark.index.catalog import Index, decode_blocks
from whoosh_spark.search.engine import Searcher, _PlanContext


def batch_term_search(
    searcher: Searcher,
    queries: list[tuple[str, str, list[str]]],
    k: int = 10,
    conjunctive: bool = False,
) -> DataFrame:
    """queries: [(query_id, field, [terms...])] -> top-k per query.

    Returns DataFrame(query_id, doc_id, score, rank)."""
    ix = searcher.index
    spark = ix.spark

    qrows = []
    for qid, field, terms in queries:
        for t in terms:
            qrows.append((qid, field, t))
    qdf = spark.createDataFrame(qrows, "query_id string, field string, term string")

    all_terms: dict[str, set] = {}
    for _, field, terms in queries:
        all_terms.setdefault(field, set()).update(terms)

    # one decoded+scored pass over the union of all query terms
    plan = _PlanContext(searcher)
    term_pairs = {(f, t) for f, ts in all_terms.items() for t in ts}
    plan.stats = {}
    for field, ts in all_terms.items():
        for t, row in ix.term_stats(field, list(ts)).items():
            plan.stats[(field, t)] = row
    parts = []
    for field, ts in all_terms.items():
        parts.append(ix.postings_for(field, list(ts)))
    decoded = parts[0]
    for p in parts[1:]:
        decoded = decoded.unionByName(p)
    scored = plan.attach_scores(decoded, sorted(term_pairs))

    joined = scored.join(F.broadcast(qdf), on=["field", "term"])
    agg = joined.groupBy("query_id", "doc_id").agg(
        F.sum("score").alias("score"), F.count("*").alias("_n")
    )
    if conjunctive:
        n_terms = qdf.groupBy("query_id").agg(F.count("*").alias("_need"))
        agg = agg.join(F.broadcast(n_terms), on="query_id").filter(
            F.col("_n") == F.col("_need")
        )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", F.col("score"), "rank")
    )
