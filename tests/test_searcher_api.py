"""Searcher convenience surface parity (reference searching.py:236-585):
suggest / correct_query / key_terms / key_terms_from_text / more_like /
refresh / docs_for_query / field stats, as METHODS on Searcher the way a
reference user calls them (the underlying engines are diff-tested in
test_classify / test_spelling; here we pin the method wiring and the
more_like source-doc mask)."""

import pytest
from pyspark.sql import Row

import whoosh_spark.query as Q
from whoosh_spark.index import Index, build_index
from whoosh_spark.schema import ID, TEXT, IndexSchema
from whoosh_spark.search import Searcher

DOCS = [
    (0, "a", "alfa bravo charlie delta"),
    (1, "b", "alfa bravo charlie echo"),
    (2, "c", "alfa bravo charlie foxtrot"),
    (3, "d", "golf hotel india juliet"),
    (4, "e", "alfa sierra tango uniform"),
]


@pytest.fixture(scope="module")
def searcher(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sapi") / "idx")
    schema = IndexSchema.of(id=ID(stored=True), body=TEXT(stored=True))
    df = spark.createDataFrame(
        [Row(doc_id=i, id=t, body=b) for i, t, b in DOCS])
    build_index(spark, df, schema, d, sha_col=None)
    return Searcher(Index(spark, d))


def test_reader_and_stats(searcher):
    assert searcher.reader() is searcher.index
    assert not searcher.is_empty()
    assert searcher.up_to_date()
    assert searcher.refresh() is searcher
    assert searcher.field_length("body") == sum(
        len(b.split()) for _, _, b in DOCS)
    assert searcher.avg_field_length("body") == pytest.approx(
        searcher.field_length("body") / len(DOCS))
    # non-scorable field -> the default (reference searching.py:255-258)
    assert searcher.avg_field_length("id", default=7) == 7


def test_docs_for_query(searcher):
    ids = sorted(r["doc_id"] for r in
                 searcher.docs_for_query(Q.Term("body", "alfa")).collect())
    assert ids == [0, 1, 2, 4]


def test_suggest_and_correct_query(searcher):
    assert searcher.suggest("body", "brovo") == ["bravo"]
    assert searcher.correct_query(
        "brovo AND charlee", default_field="body") == "bravo AND charlie"


def test_key_terms_methods(searcher):
    kts = searcher.key_terms([0, 1], "body", numterms=3)
    assert kts and all(isinstance(w, str) for w, _ in kts)
    from_text = searcher.key_terms_from_text(
        "body", "alfa bravo charlie delta", numterms=3)
    assert [w for w, _ in from_text]


def test_more_like_masks_source_doc(searcher):
    res = searcher.more_like(0, "body", top=10).collect()
    got = [r["doc_id"] for r in res]
    assert 0 not in got                      # reference mask={docnum}
    assert set(got) >= {1, 2}                # the near-duplicates surface
    # text= override follows the key_terms_from_text path
    res2 = searcher.more_like(3, "body",
                              text="golf hotel india juliet").collect()
    assert 3 not in [r["doc_id"] for r in res2]


def test_reader_per_doc_api(searcher):
    rdr = searcher.reader()
    assert rdr.stored_fields(0) == {"id": "a", "body": DOCS[0][2]}
    assert rdr.stored_fields(99) is None
    assert [d["id"] for d in rdr.all_stored_fields()] == list("abcde")
    assert rdr.doc_field_length(0, "body") == 4
    assert rdr.doc_field_length(0, "nope", default=-1) == -1
    terms = rdr.all_terms()
    assert ("body", "alfa") in terms and ("id", "a") in terms
    assert terms == sorted(terms)


def test_contains_and_schema_names(searcher):
    assert ("body", "alfa") in searcher
    assert ("body", "zulu") not in searcher
    sch = searcher.schema
    assert sch.names() == ["body", "id"]
    assert sch.stored_names() == ["body", "id"]
    assert sch.scorable_names() == ["body"]
    sch2 = type(sch)(dict(sch.fields), {"*_text": sch["body"]})
    assert sch2.names(check_names=["x_text", "nope", "id"]) == [
        "body", "id", "x_text"]
