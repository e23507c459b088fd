"""Sorting, faceting, collapsing — the reference collector surface
(/root/reference/src/whoosh/sorting.py facets, collectors.py:535-582
SortingCollector, 761-847 FacetCollector, 850-1003 CollapseCollector)
re-expressed as DataFrame operations over the match set.

Facet kinds map as:
  FieldFacet       orderBy / groupBy on a stored-field column
  QueryFacet       CASE WHEN over compiled subquery membership
  RangeFacet       floor((col - start) / gap) bucketing
  ScoreFacet       the score column
  TranslateFacet   any Column expression
  MultiFacet       struct(k1, k2)
Facet maps: Count -> count(*); OrderedList -> sort_array(collect_list);
Best -> max_by(doc_id, score).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from whoosh_spark.query import nodes as Q


def _matches_with_docs(searcher, q: Q.Query, filter_q=None, mask_q=None) -> DataFrame:
    m = searcher.matches(q, filter_q=filter_q, mask_q=mask_q)
    return m.join(searcher.index.docs(), on="doc_id", how="inner")


def search_sorted(
    searcher,
    q: Q.Query,
    sortedby: str | list[str],
    limit: int | None = None,
    reverse: bool = False,
) -> DataFrame:
    """Matches ordered by stored-field value(s) (SortingCollector).

    Ties break by doc_id — ascending normally, DESCENDING under
    ``reverse=True``: the reference sorts its (sortkey, docnum) pair list
    with ``items.sort(reverse=reverse)`` (collectors.py:577-581), so the
    reversal applies to the docnum tiebreak too. Docs MISSING a sort field
    order after every present value ascending (first under reverse): the
    reference categorizer keys missing docs with a greater-than-everything
    sentinel — so nulls_last asc / nulls_first desc, the opposite of
    Spark's defaults."""
    keys = [sortedby] if isinstance(sortedby, str) else list(sortedby)
    df = _matches_with_docs(searcher, q)
    order = [F.col(k).desc_nulls_first() if reverse else F.col(k).asc_nulls_last()
             for k in keys]
    order.append(F.col("doc_id").desc() if reverse else F.col("doc_id").asc())
    df = df.orderBy(*order)
    if limit is not None:
        df = df.limit(limit)
    return df


def facet_counts(searcher, q: Q.Query, key: str | Column, alias: str = "value") -> DataFrame:
    """FacetCollector with the Count map: (facet value, matching doc count)."""
    key_col = F.col(key) if isinstance(key, str) else key
    df = _matches_with_docs(searcher, q)
    return df.groupBy(key_col.alias(alias)).agg(F.count("*").alias("count"))


def facet_groups(searcher, q: Q.Query, key: str | Column, alias: str = "value") -> DataFrame:
    """FacetCollector with the OrderedList map: per key, matching doc_ids
    ordered by (score desc, doc_id asc)."""
    key_col = F.col(key) if isinstance(key, str) else key
    df = _matches_with_docs(searcher, q)
    # order inside collect_list via a sortable struct (-score, doc_id)
    entry = F.struct((-F.col("score")).alias("negscore"), F.col("doc_id"))
    out = df.groupBy(key_col.alias(alias)).agg(
        F.transform(F.sort_array(F.collect_list(entry)), lambda s: s["doc_id"]).alias("doc_ids")
    )
    return out


def facet_best(searcher, q: Q.Query, key: str | Column, alias: str = "value") -> DataFrame:
    """Best map: per key, the highest-scoring doc (ties -> lowest doc_id)."""
    key_col = F.col(key) if isinstance(key, str) else key
    df = _matches_with_docs(searcher, q)
    entry = F.struct((-F.col("score")).alias("negscore"), F.col("doc_id"))
    return df.groupBy(key_col.alias(alias)).agg(F.min(entry)["doc_id"].alias("best_doc_id"))


def range_facet_col(col: str | Column, start: float, end: float, gap: float) -> Column:
    """RangeFacet bucketing: bucket index for values in [start, end), null
    outside (reference sorting.py:453-529)."""
    c = F.col(col) if isinstance(col, str) else col
    bucket = F.floor((c - F.lit(start)) / F.lit(gap)).cast("long")
    return F.when((c >= start) & (c < end), bucket)


def query_facet_col(searcher, queries: dict[str, Q.Query], df: DataFrame, alias: str = "value"):
    """QueryFacet: label each match with the first sub-query it satisfies
    (reference sorting.py:402-451). Returns df + label column."""
    label = None
    for name, sub in queries.items():
        member = searcher.matches(sub).select("doc_id").withColumn(f"_in_{name}", F.lit(True))
        df = df.join(member, on="doc_id", how="left")
        cond = F.col(f"_in_{name}").isNotNull()
        label = F.when(cond, F.lit(name)) if label is None else label.when(cond, F.lit(name))
    return df.withColumn(alias, label).drop(*[c for c in df.columns if c.startswith("_in_")])


def matched_terms(searcher, q: Q.Query, limit: int | None = 10,
                  pairs: bool = False, **search_kw) -> DataFrame:
    """TermsCollector analog (reference collectors.py:1103-1165): for each
    hit, the sorted set of query leaf terms it contains. ``pairs=True``
    collects (field, term) structs instead of bare term strings — the
    shape of the reference's hit.matched_terms()."""
    from pyspark.sql import functions as F

    from whoosh_spark.search.engine import _PlanContext

    plan = _PlanContext(searcher)
    qn = plan.prepare(q)
    plan.ensure_persisted()  # the matched-terms scan re-reads the base
    top = searcher.search(q, limit=limit, **search_kw)
    leaves = sorted({(f, t) for f, t in qn.leaf_terms()})
    if not leaves or plan.base is None:
        return top.withColumn("matched_terms", F.array())
    base = plan.base
    cond = None
    for f, t in leaves:
        c = (F.col("field") == f) & (F.col("term") == t)
        cond = c if cond is None else (cond | c)
    collected = (F.collect_set(F.struct("field", "term")) if pairs
                 else F.collect_set("term"))
    tm = base.filter(cond).groupBy("doc_id").agg(
        F.sort_array(collected).alias("matched_terms")
    )
    return top.join(tm, on="doc_id", how="left").orderBy(F.desc("score"), F.asc("doc_id"))


def collapse(
    searcher,
    q: Q.Query,
    key: str | Column,
    limit: int | None = 10,
    collapse_limit: int = 1,
    order_by_score: bool = True,
) -> DataFrame:
    """CollapseCollector: keep at most ``collapse_limit`` docs per key
    (reference collectors.py:850-1003), then normal top-k ordering.
    Documents with a null collapse key are never collapsed."""
    key_col = F.col(key) if isinstance(key, str) else key
    df = _matches_with_docs(searcher, q).withColumn("_ckey", key_col)
    w = Window.partitionBy("_ckey").orderBy(F.desc("score"), F.asc("doc_id"))
    ranked = df.withColumn("_rn", F.row_number().over(w))
    kept = ranked.filter(F.col("_ckey").isNull() | (F.col("_rn") <= collapse_limit)).drop("_rn", "_ckey")
    if order_by_score:
        kept = kept.orderBy(F.desc("score"), F.asc("doc_id"))
    if limit is not None:
        kept = kept.limit(limit)
    return kept
