"""Seeded randomized differential for the sorting/faceting/collapse surface
(reference sorting.py FieldFacet/MultiFacet/RangeFacet + collectors.py
SortingCollector/FacetCollector/CollapseCollector).

The pinned tests in test_sorting.py cover one fixture corpus; this fuzzer
drives random corpora (heavy key ties, negative numerics, missing values)
through random sort/facet/collapse configurations and asserts parity with
the reference engine. Queries are restricted to shapes the reference's
matchers compute correctly (Term / Or of distinct terms / Every — see
tests/test_fuzz_differential.py for the broken shapes), so any mismatch is
a sorting-surface bug, not a reference-matcher artifact.
"""

import random

import pytest
from pyspark.sql import Row

import whoosh_spark.query as Q
from whoosh_spark.index import Index, build_index
from whoosh_spark.schema import IndexSchema, ID, NUMERIC, TEXT
from whoosh_spark.search import Searcher
from whoosh_spark.search.sorting import (
    collapse,
    facet_counts,
    facet_groups,
    range_facet_col,
    search_sorted,
)

VOCAB = "alfa bravo charlie delta echo foxtrot".split()
TAGS = ["one", "two", "three", "four"]
N_DOCS = 60


def _corpus(rng):
    docs = []
    for i in range(N_DOCS):
        docs.append(
            dict(
                id=f"d{i:03d}",
                # heavy ties; ~15% of docs MISSING num / tag (the reference
                # sorts missing values after every present value ascending,
                # before them under reverse; facets group them under None)
                num=rng.randint(-5, 5) if rng.random() > 0.15 else None,
                frac=rng.choice([0.25, 0.5, 0.75, 1.5, 2.5, 4.75]),
                tag=rng.choice(TAGS) if rng.random() > 0.15 else None,
                text=" ".join(rng.choice(VOCAB) for _ in range(rng.randint(4, 10))),
            )
        )
    return docs


@pytest.fixture(scope="module", params=[7, 8])
def fuzz_ix(request, spark, whoosh_ref, tmp_path_factory):
    rng = random.Random(request.param)
    docs = _corpus(rng)
    d = str(tmp_path_factory.mktemp(f"sortfuzz{request.param}"))
    schema = IndexSchema.of(
        id=ID(stored=True), num=NUMERIC(stored=True), frac=NUMERIC(stored=True),
        tag=ID(stored=True), text=TEXT(),
    )
    rows = [Row(doc_id=i, **doc) for i, doc in enumerate(docs)]
    build_index(spark, request.getfixturevalue("spark").createDataFrame(rows),
                schema, d, sha_col=None)

    from whoosh import fields
    from whoosh.filedb.filestore import RamStorage

    ws = fields.Schema(
        id=fields.ID(stored=True),
        num=fields.NUMERIC(int, stored=True),
        frac=fields.NUMERIC(float, stored=True),
        tag=fields.ID(stored=True),
        text=fields.TEXT(),
    )
    wix = RamStorage().create_index(ws)
    w = wix.writer()
    for doc in docs:
        w.add_document(**{k: v for k, v in doc.items() if v is not None})
    w.commit()
    return Index(spark, d), wix, random.Random(request.param * 1000 + 1)


def _rand_query(rng):
    """Query shapes whose reference matchers are trusted."""
    kind = rng.randrange(4)
    if kind == 0:
        return Q.Every("id"), ("every",)
    if kind == 1:
        return Q.Term("text", rng.choice(VOCAB)), ("term", "text")
    if kind == 2:
        a, b = rng.sample(VOCAB, 2)
        return Q.Or([Q.Term("text", a), Q.Term("text", b)]), ("or2",)
    return Q.Term("tag", rng.choice(TAGS)), ("term", "tag")


def _wquery(q):
    from whoosh.query import Every, Or, Term

    if isinstance(q, Q.Every):
        return Every(q.field)
    if isinstance(q, Q.Term):
        return Term(q.field, q.text)
    return Or([_wquery(s) for s in q.subqueries])


def test_sortedby_fuzz(fuzz_ix, whoosh_ref):
    """Random (query, sort keys, reverse, limit) vs reference sortedby."""
    ix, wix, rng = fuzz_ix
    s = Searcher(ix)
    with wix.searcher() as ws:
        for _ in range(18):
            q, _ = _rand_query(rng)
            nkeys = rng.choice([1, 1, 2])
            keys = rng.sample(["num", "frac", "tag", "id"], nkeys)
            reverse = rng.random() < 0.5
            limit = rng.choice([None, 3, 7])
            want = [
                h["id"]
                for h in ws.search(_wquery(q), sortedby=keys if nkeys > 1 else keys[0],
                                   reverse=reverse, limit=limit)
            ]
            got = [
                r["id"]
                for r in search_sorted(s, q, keys if nkeys > 1 else keys[0],
                                       limit=limit, reverse=reverse).collect()
            ]
            assert got == want, (q, keys, reverse, limit)


def test_facet_fuzz(fuzz_ix, whoosh_ref):
    """Random (query, facet) through Count and OrderedList maps."""
    from whoosh import sorting as wsorting

    ix, wix, rng = fuzz_ix
    s = Searcher(ix)
    with wix.searcher() as ws:
        for _ in range(12):
            q, _ = _rand_query(rng)
            key = rng.choice(["tag", "num", "id"])
            wr = ws.search(
                _wquery(q),
                groupedby={key: wsorting.FieldFacet(key, maptype=wsorting.Count)},
                limit=None,
            )
            want_counts = dict(wr.groups(key))
            got_counts = {
                r["value"]: r["count"] for r in facet_counts(s, q, key).collect()
            }
            # reference keys come back as the field's sortable type (bytes
            # terms for ID, ints for NUMERIC); normalize to python values
            want_counts = {
                (k.decode() if isinstance(k, bytes) else k): v
                for k, v in want_counts.items()
            }
            assert got_counts == want_counts, (q, key)

            wr2 = ws.search(_wquery(q), groupedby=key, limit=None)
            want_groups = {
                (k.decode() if isinstance(k, bytes) else k): list(v)
                for k, v in wr2.groups(key).items()
            }
            got_groups = {
                r["value"]: list(r["doc_ids"])
                for r in facet_groups(s, q, key).collect()
            }
            assert got_groups == want_groups, (q, key)


def test_range_facet_fuzz(fuzz_ix, whoosh_ref):
    """RangeFacet bucket counts vs the reference over random gaps."""
    from whoosh import sorting as wsorting
    from pyspark.sql import functions as F

    from whoosh_spark.search.sorting import _matches_with_docs

    ix, wix, rng = fuzz_ix
    s = Searcher(ix)
    with wix.searcher() as ws:
        for _ in range(8):
            q, _ = _rand_query(rng)
            start, end, gap = -5, 6, rng.choice([2, 3, 5])
            wr = ws.search(
                _wquery(q),
                groupedby={"b": wsorting.RangeFacet("num", start, end, gap,
                                                    maptype=wsorting.Count)},
                limit=None,
            )
            # reference labels buckets (rangestart, rangeend) and groups
            # docs MISSING the field under None; ours indexes buckets and
            # leaves missing docs in the null bucket
            want = {}
            for label, n in wr.groups("b").items():
                want[None if label is None else (label[0] - start) // gap] = n
            df = _matches_with_docs(s, q).withColumn(
                "bucket", range_facet_col("num", float(start), float(end), float(gap))
            )
            got = {
                r["bucket"]: r["n"]
                for r in df.groupBy("bucket").agg(F.count("*").alias("n")).collect()
            }
            assert got == want, (q, gap)


def test_collapse_fuzz(fuzz_ix, whoosh_ref):
    """Random (query, collapse key, collapse_limit): the KEPT DOC SET must
    match the reference (order compared separately where defined: both
    emit score desc, doc asc)."""
    ix, wix, rng = fuzz_ix
    s = Searcher(ix)
    with wix.searcher() as ws:
        for _ in range(10):
            q, _ = _rand_query(rng)
            climit = rng.choice([1, 2])
            want = [
                h["id"]
                for h in ws.search(_wquery(q), collapse="tag",
                                   collapse_limit=climit, limit=None)
            ]
            got = [
                r["id"]
                for r in collapse(s, q, "tag", limit=None,
                                  collapse_limit=climit).collect()
            ]
            assert sorted(got) == sorted(want), (q, climit)
