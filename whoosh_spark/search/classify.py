"""Key-term extraction + more-like-this (reference classify.py Bo1/Bo2/KL
expansion models, searching.py key_terms/more_like).

The expansion runs driver-side over the (small) top-N documents' analyzed
text — exactly like the reference — with collection statistics
(doc_count_all, field_length, per-term frequency) pulled from the index's
term-stats table.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from whoosh_spark.index.catalog import Index
from whoosh_spark.query import nodes as Q


class Bo1Model:
    def __init__(self, doc_count: int, field_length: int):
        self.N = doc_count
        self.collection_total = field_length

    def normalizer(self, maxweight: float, top_total: float) -> float:
        if not maxweight:
            return maxweight
        f = maxweight / self.N
        return (maxweight * math.log((1.0 + f) / f) + math.log(1.0 + f)) / math.log(2.0)

    def score(self, weight_in_top: float, weight_in_collection: float, top_total: float) -> float:
        f = weight_in_collection / self.N
        return weight_in_top * math.log((1.0 + f) / f, 2) + math.log(1.0 + f, 2)


class Bo2Model:
    def __init__(self, doc_count: int, field_length: int):
        self.N = doc_count
        self.collection_total = field_length

    def normalizer(self, maxweight, top_total):
        if not self.collection_total:
            return maxweight
        f = maxweight * self.N / self.collection_total
        return maxweight * math.log((1.0 + f) / f, 2) + math.log(1.0 + f, 2)

    def score(self, weight_in_top, weight_in_collection, top_total):
        f = weight_in_top * top_total / self.collection_total
        return weight_in_top * math.log((1.0 + f) / f, 2) + math.log(1.0 + f, 2)


class KLModel:
    """Kullback-Leibler divergence expansion (reference classify.py:83-98)."""

    def __init__(self, doc_count: int, field_length: int):
        self.N = doc_count
        self.collection_total = field_length

    def normalizer(self, maxweight, top_total):
        if not self.collection_total:
            return maxweight
        return (maxweight * math.log(self.collection_total / top_total) / math.log(2.0)) * top_total

    def score(self, weight_in_top, weight_in_collection, top_total):
        wit_over_tt = weight_in_top / top_total
        wic_over_ct = weight_in_collection / self.collection_total
        if wit_over_tt < wic_over_ct:
            return 0
        return wit_over_tt * math.log(wit_over_tt / (weight_in_top / self.collection_total), 2)


MODELS = {"bo1": Bo1Model, "bo2": Bo2Model, "kl": KLModel}


def expanded_terms(ix: Index, field: str, texts: list[str], numterms: int = 5,
                   model: str = "bo1", normalize: bool = True) -> list[tuple[str, float]]:
    """The N most important terms across ``texts`` (reference
    Expander.expanded_terms, classify.py:102-205)."""
    ana = ix.schema[field].analyzer
    top_weight: dict[str, float] = {}
    top_total = 0.0
    for text in texts:
        terms, _ = ana.analyze_doc(text or "")
        for t, tf, _ in terms:
            top_weight[t] = top_weight.get(t, 0.0) + float(tf)
            top_total += float(tf)
    return expanded_terms_from_weights(ix, field, top_weight, top_total,
                                       numterms, model, normalize)


def expanded_terms_from_weights(ix: Index, field: str, top_weight: dict,
                                top_total: float, numterms: int = 5,
                                model: str = "bo1", normalize: bool = True) -> list[tuple[str, float]]:
    """Core expansion over an already-aggregated {term: weight} map (fed by
    either re-analyzed stored text or the term-vector fast path)."""
    if not top_weight:
        return []

    m = MODELS[model](ix.doc_count_all(), ix.manifest.field_length(field))
    stats = ix.term_stats(field, list(top_weight))
    tlist = []
    maxweight = 0.0
    for word, weight in top_weight.items():
        st = stats.get(word)
        if st is None:
            continue  # term not in index
        cf = float(st["total_tf"])  # collection frequency (reader.frequency)
        score = m.score(weight, cf, top_total)
        if score > maxweight:
            maxweight = score
        tlist.append((score, word))
    norm = m.normalizer(maxweight, top_total) if normalize else maxweight
    tlist = [(w / norm, t) for w, t in tlist]
    tlist.sort(key=lambda x: (0 - x[0], x[1]))
    return [(t, w) for w, t in tlist[:numterms]]


def more_like(searcher, field: str, text: str, limit: int = 10,
              numterms: int = 5, model: str = "bo1"):
    """Documents similar to ``text`` (reference Searcher.more_like,
    searching.py:543-585): expand to the top key terms, search their
    weighted disjunction."""
    kts = expanded_terms(searcher.index, field, [text], numterms=numterms, model=model)
    if not kts:
        return searcher.index.spark.createDataFrame([], "doc_id long, score double")
    q = Q.Or([Q.Term(field, word, boost=weight) for word, weight in kts])
    return searcher.search(q, limit=limit)


def key_terms(searcher, field: str, doc_ids: list[int], numterms: int = 5,
              model: str = "bo1", use_vectors: bool = True) -> list[tuple[str, float]]:
    """Key terms of the given documents.

    When the field was indexed with ``vector=True``, reads the stored
    per-doc term vectors (doc-pruned Parquet scan, no re-analysis — the
    reference's key-terms fast path, searching.py:508-541 via
    reader.vector_as); otherwise re-analyzes the stored field text."""
    ix = searcher.index
    ids = [int(d) for d in doc_ids]
    if not ids:
        return []
    if not ix.has_vectors(field) and field not in ix.docs().columns:
        # mirror the reference's explicit error (searching.py:519-522
        # KeyError "term vectors and stored fields both unavailable")
        raise ValueError(
            f"key_terms needs field {field!r} indexed with vector=True "
            "or stored=True (neither available)")
    if use_vectors and ix.has_vectors(field):
        rows = (
            ix.vectors()
            .filter((F.col("field") == field) & F.col("doc_id").isin(ids))
            .groupBy("term")
            .agg(F.sum("tf").alias("w"))
            .collect()
        )
        top_weight = {r["term"]: float(r["w"]) for r in rows}
        top_total = sum(top_weight.values())
        return expanded_terms_from_weights(ix, field, top_weight, top_total, numterms, model)
    docs = (
        ix.docs()
        .filter(F.col("doc_id").isin(ids))
        .select(field)
        .collect()
    )
    return expanded_terms(ix, field, [r[field] for r in docs], numterms, model)
