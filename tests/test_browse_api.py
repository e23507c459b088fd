"""Term-browsing / document-lookup API differential vs the reference
IndexReader and Searcher conveniences (reading.py:244-568,
searching.py:336-440): lexicon, expand_prefix, frequency, doc_frequency,
most_frequent_terms, most_distinctive_terms (including the nlargest
descending-text tie-break), and document(s)/document_number(s)."""

import pytest
from pyspark.sql import Row

from whoosh_spark.index import Index, build_index
from whoosh_spark.schema import ID, TEXT, IndexSchema
from whoosh_spark.search import Searcher

DOCS = [
    (0, "a", "alfa bravo charlie delta alfa"),
    (1, "b", "alfa bravo bravo charley"),
    (2, "c", "charlie delta echo alfa alfa alfa"),
    (3, "d", "delta echo fox golf"),
    (4, "e", "echo fox golf hotel alfa bravo"),
    (5, "f", "brav bravado bravo brick"),
    # weight ties for the nlargest text tie-break: "xx" and "xy" both once
    (6, "g", "xx xy"),
]


@pytest.fixture(scope="module")
def ref_searcher(whoosh_ref):
    from whoosh import fields
    from whoosh.filedb.filestore import RamStorage

    schema = fields.Schema(
        doc_id=fields.NUMERIC(stored=True, bits=64),
        title=fields.ID(stored=True),
        body=fields.TEXT(stored=True),
    )
    ix = RamStorage().create_index(schema)
    w = ix.writer()
    for did, title, body in DOCS:
        w.add_document(doc_id=did, title=title, body=body)
    w.commit()
    s = ix.searcher()
    yield s
    s.close()


@pytest.fixture(scope="module")
def our_searcher(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("browseix"))
    schema = IndexSchema.of(title=ID(stored=True), body=TEXT(stored=True))
    df = spark.createDataFrame(
        [Row(doc_id=i, title=t, body=b) for i, t, b in DOCS])
    build_index(spark, df, schema, d, sha_col=None)
    return Searcher(Index(spark, d))


def test_lexicon(our_searcher, ref_searcher):
    want = [t.decode() for t in ref_searcher.reader().lexicon("body")]
    assert our_searcher.lexicon("body") == want


@pytest.mark.parametrize("prefix", ["a", "brav", "bravo", "ch", "z", ""])
def test_expand_prefix(our_searcher, ref_searcher, prefix):
    want = [t.decode()
            for t in ref_searcher.reader().expand_prefix("body", prefix)]
    assert our_searcher.expand_prefix("body", prefix) == want, prefix


@pytest.mark.parametrize("term", ["alfa", "bravo", "xx", "missing"])
def test_frequency_and_df(our_searcher, ref_searcher, term):
    r = ref_searcher.reader()
    assert our_searcher.frequency("body", term) == r.frequency("body", term)
    assert our_searcher.doc_frequency("body", term) == \
        r.doc_frequency("body", term)


@pytest.mark.parametrize("number,prefix", [(5, ""), (3, "b"), (100, ""),
                                           (2, "x")])
def test_most_frequent_terms(our_searcher, ref_searcher, number, prefix):
    want = [(float(w), t.decode()) for w, t in
            ref_searcher.reader().most_frequent_terms("body", number, prefix)]
    got = our_searcher.most_frequent_terms("body", number, prefix)
    assert got == want, (number, prefix, got, want)


@pytest.mark.parametrize("number,prefix", [(5, ""), (3, "b"), (100, ""),
                                           (2, "x")])
def test_most_distinctive_terms(our_searcher, ref_searcher, number, prefix):
    want = [(round(float(w), 9), t.decode()) for w, t in
            ref_searcher.reader().most_distinctive_terms("body", number,
                                                         prefix)]
    got = [(round(w, 9), t) for w, t in
           our_searcher.most_distinctive_terms("body", number, prefix)]
    assert got == want, (number, prefix, got, want)


def test_doc_counts(our_searcher, ref_searcher):
    assert our_searcher.doc_count() == ref_searcher.doc_count()
    assert our_searcher.doc_count_all() == ref_searcher.doc_count_all()


def test_document_lookup(our_searcher, ref_searcher):
    want = ref_searcher.document(title="c")
    got = our_searcher.document(title="c")
    assert got["title"] == want["title"] and got["body"] == want["body"]
    assert our_searcher.document(title="zz") is None
    assert ref_searcher.document(title="zz") is None

    # multi-kwarg AND semantics
    want_ids = sorted(ref_searcher.document_numbers(body="alfa"))
    got_rows = our_searcher.documents(body="alfa")
    want_rows = sorted(ref_searcher.documents(body="alfa"),
                       key=lambda d: d["doc_id"])
    assert [r["doc_id"] for r in got_rows] == [r["doc_id"] for r in want_rows]
    assert len(want_ids) == len(got_rows)

    and_ids_ref = sorted(ref_searcher.document_numbers(body="alfa",
                                                       title="a"))
    and_ids_got = our_searcher.document_numbers(body="alfa", title="a")
    # our doc ids ARE the reference docnums on this single-writer corpus
    got_first = our_searcher.document_number(body="alfa", title="a")
    assert len(and_ids_got) == len(and_ids_ref) == 1
    assert got_first == and_ids_got[0]

    # no kwargs -> every document
    assert len(our_searcher.documents()) == len(DOCS)
    assert len(list(ref_searcher.documents())) == len(DOCS)
