"""Term-browsing and document-lookup API — the reference IndexReader /
Searcher convenience surface (reading.py:244-568, searching.py:336-440)
re-expressed as pushdown-friendly DataFrame queries over the term-stats
table and the stored-docs table.

Scale notes: every function pushes its field/prefix predicate into the
Parquet scan (termstats is term-sorted per segment, so prefix filters prune
row groups); top-N term rankings run as a distributed orderBy().limit(n)
(Spark's TakeOrdered — no full sort materialization); only the requested N
rows reach the driver.  Collection statistics follow the reference quirk of
NOT excluding deleted-but-unexpunged docs until optimize.
"""

from __future__ import annotations

from math import log

from pyspark.sql import DataFrame, functions as F


def _field_stats(ix, fieldname: str, prefix: str = "") -> DataFrame:
    """Per-term combined (df, weight) for a field, optionally
    prefix-bounded (both predicates reach the parquet scan)."""
    df = ix.termstats().filter(F.col("field") == fieldname)
    if prefix:
        df = df.filter(F.col("term").startswith(prefix))
    return df.groupBy("term").agg(
        F.sum("df").alias("df"), F.sum("total_w").alias("weight"))


def lexicon(ix, fieldname: str) -> list[str]:
    """All terms of the field in sorted order (reference
    reading.py:254-261)."""
    rows = _field_stats(ix, fieldname).select("term").orderBy("term").collect()
    return [r["term"] for r in rows]


def expand_prefix(ix, fieldname: str, prefix: str) -> list[str]:
    """Terms of the field starting with ``prefix``, sorted (reference
    reading.py:244-252)."""
    rows = (_field_stats(ix, fieldname, prefix)
            .select("term").orderBy("term").collect())
    return [r["term"] for r in rows]


def frequency(ix, fieldname: str, text: str) -> float:
    """Total weight of the term in the collection; 0 if absent (reference
    reading.py:378-382 — the W3 TermInfo weight)."""
    rows = (ix.termstats()
            .filter((F.col("field") == fieldname) & (F.col("term") == text))
            .agg(F.sum("total_w").alias("w")).collect())
    w = rows[0]["w"]
    return float(w) if w is not None else 0


def doc_frequency(ix, fieldname: str, text: str) -> int:
    """Number of documents containing the term; 0 if absent (reference
    reading.py:385-388)."""
    rows = (ix.termstats()
            .filter((F.col("field") == fieldname) & (F.col("term") == text))
            .agg(F.sum("df").alias("df")).collect())
    df = rows[0]["df"]
    return int(df) if df is not None else 0


def most_frequent_terms(ix, fieldname: str, number: int = 5,
                        prefix: str = "") -> list[tuple[float, str]]:
    """Top-N (weight, term) by collection weight (reference
    reading.py:551-558).  The reference's heapq.nlargest on (weight, text)
    tuples breaks weight ties by text DESCENDING — mirrored here."""
    rows = (_field_stats(ix, fieldname, prefix)
            .orderBy(F.desc("weight"), F.desc("term"))
            .limit(number).collect())
    return [(float(r["weight"]), r["term"]) for r in rows]


def most_distinctive_terms(ix, fieldname: str, number: int = 5,
                           prefix: str = "") -> list[tuple[float, str]]:
    """Top-N (weight * log(N/df), term) — tf·idf distinctiveness
    (reference reading.py:560-568), same descending-text tie-break."""
    n_docs = float(ix.doc_count_all())
    rows = (_field_stats(ix, fieldname, prefix)
            .withColumn("score", F.col("weight") * F.log(F.lit(n_docs) / F.col("df")))
            .orderBy(F.desc("score"), F.desc("term"))
            .limit(number).collect())
    return [(float(r["score"]), r["term"]) for r in rows]


def _kw_query(searcher, kw: dict):
    """Keyword args -> And of per-field equality terms (reference
    Searcher._kw_to_text + document_numbers, searching.py:378-440: values
    are the already-analyzed TERM texts, not free text)."""
    from whoosh_spark.query import nodes as Q

    subs = []
    for fieldname, text in kw.items():
        kind = (searcher.schema[fieldname].kind
                if fieldname in searcher.schema else "text")
        if kind in ("numeric", "boolean"):
            subs.append(Q.ColumnTerm(fieldname, text))
        elif kind == "datetime":
            subs.append(Q.DateRange(fieldname, text, text))
        else:
            subs.append(Q.Term(fieldname, text))
    return Q.And(subs) if subs else Q.Every()


def document_numbers(searcher, **kw) -> list[int]:
    """Doc ids whose fields contain the given terms; all ids if no kwargs
    (reference searching.py:413-428)."""
    q = _kw_query(searcher, kw)
    rows = searcher.matches(q).select("doc_id").orderBy("doc_id").collect()
    return [r["doc_id"] for r in rows]


def documents(searcher, **kw) -> list[dict]:
    """Stored fields of every matching document (reference
    searching.py:360-376) — one doc-pruned join, not per-doc lookups."""
    q = _kw_query(searcher, kw)
    ids = searcher.matches(q).select("doc_id")
    rows = (searcher.index.docs().join(ids, on="doc_id", how="left_semi")
            .orderBy("doc_id").collect())
    # a doc simply lacks fields it never stored (reference stored-dict
    # semantics, e.g. test_flexible.py: document(id="b") == {"id": "b"})
    return [{k: v for k, v in r.asDict().items() if v is not None}
            for r in rows]


def document(searcher, **kw) -> dict | None:
    """First matching document's stored fields or None (reference
    searching.py:336-358)."""
    q = _kw_query(searcher, kw)
    ids = searcher.matches(q).select("doc_id").orderBy("doc_id").limit(1)
    rows = (searcher.index.docs().join(ids, on="doc_id", how="left_semi")
            .limit(1).collect())
    if not rows:
        return None
    return {k: v for k, v in rows[0].asDict().items() if v is not None}


def document_number(searcher, **kw) -> int | None:
    """First matching doc id or None (reference searching.py:393-411)."""
    q = _kw_query(searcher, kw)
    rows = searcher.matches(q).select("doc_id").orderBy("doc_id").limit(1).collect()
    return rows[0]["doc_id"] if rows else None
