"""Differential parser tests: parse the same query string with the
reference QueryParser and ours, run both engines, compare top-k."""

import pytest
from pyspark.sql import Row

from whoosh_spark.index import Index, build_index
from whoosh_spark.query.parser import QueryParser
from whoosh_spark.schema import IndexSchema, ID, TEXT
from whoosh_spark.search import Searcher

DOCS = [
    ("A", "Yellow brown", "Blue red green render purple?"),
    ("B", "Alpha beta", "Gamma delta epsilon omega."),
    ("C", "One two", "Three rendered four five."),
    ("D", "Quick went", "Every red town."),
    ("E", "Yellow uptown", "Interest rendering outer photo!"),
    ("F", "Yellow town", "Red red town render red."),
]


@pytest.fixture(scope="module")
def pair(spark, whoosh_ref, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("qp"))
    schema = IndexSchema.of(key=ID(stored=True), name=TEXT(), value=TEXT())
    df = spark.createDataFrame(
        [Row(doc_id=i, key=k, name=n, value=v) for i, (k, n, v) in enumerate(DOCS)]
    )
    build_index(spark, df, schema, d, sha_col=None)

    from whoosh import fields
    from whoosh.filedb.filestore import RamStorage

    wschema = fields.Schema(key=fields.ID(stored=True), name=fields.TEXT(), value=fields.TEXT())
    wix = RamStorage().create_index(wschema)
    w = wix.writer()
    for k, n, v in DOCS:
        w.add_document(key=k, name=n, value=v)
    w.commit()
    return Index(spark, d), wix


QUERY_STRINGS = [
    "red",
    "name:yellow",
    "red town",
    "red OR town",
    "red AND town",
    "red OR green town",
    "NOT red",
    "red NOT town",
    "red ANDNOT town",
    "red ANDMAYBE green",
    "red REQUIRE green",
    '"red green"',
    '"red town"',
    'value:"red red"',
    "red^2 town",
    "(red OR green) town",
    "name:(yellow OR brown)",
    "value:[blue TO green]",
    "value:{blue TO green}",
    "ren*",
    "re*er",
    "*",
    "name:*",
    "the red",  # stopword dropped
]


@pytest.mark.parametrize("qs", QUERY_STRINGS)
def test_parse_and_run_matches_reference(pair, whoosh_ref, qs):
    ix, wix = pair
    from whoosh.qparser import QueryParser as WQP

    wq = WQP("value", wix.schema).parse(qs)
    with wix.searcher() as s:
        want = [(h.docnum, h.score) for h in s.search(wq, limit=10)]

    oq = QueryParser("value", ix.schema).parse(qs)
    srch = Searcher(ix)
    got = [(r["doc_id"], r["score"]) for r in srch.search(oq, limit=10).collect()]
    srch.clear_cache()

    assert [d for d, _ in got] == [d for d, _ in want], f"{qs!r}: ours={oq!r} theirs={wq!r}\n{got} != {want}"
    for (d1, s1), (d2, s2) in zip(got, want):
        assert s1 == pytest.approx(s2, rel=1e-12), f"{qs!r} score mismatch at doc {d1}"


PLUGIN_CASES = [
    # (parser kwargs, whoosh plugin factory names, query string)
    (dict(gtlt=True), ["GtLtPlugin"], "value:>green"),
    (dict(gtlt=True), ["GtLtPlugin"], "value:>=green value:<red"),
    (dict(gtlt=True), ["GtLtPlugin"], "red value:<=town"),
    (dict(plusminus=True), ["PlusMinusPlugin"], "+red green -blue"),
    (dict(plusminus=True), ["PlusMinusPlugin"], "+red +town"),
    (dict(plusminus=True), ["PlusMinusPlugin"], "red green -town"),
    (dict(fuzzy=True), ["FuzzyTermPlugin"], "rendar~"),
    (dict(fuzzy=True), ["FuzzyTermPlugin"], "bender~2"),
    (dict(fuzzy=True), ["FuzzyTermPlugin"], "sender~2/2 red"),
    (dict(regex=True), ["RegexPlugin"], 'value:r"ren.*"'),
    (dict(regex=True), ["RegexPlugin"], 'r"t.wn" red'),
]


@pytest.mark.parametrize("kwargs,wplugins,qs", PLUGIN_CASES,
                         ids=[c[2] for c in PLUGIN_CASES])
def test_plugin_syntax_matches_reference(pair, whoosh_ref, kwargs, wplugins, qs):
    from whoosh import qparser as wqp

    ix, wix = pair
    wp = wqp.QueryParser("value", wix.schema)
    for name in wplugins:
        wp.add_plugin(getattr(wqp, name)())
    wq = wp.parse(qs)
    with wix.searcher() as s:
        want = [(h.docnum, h.score) for h in s.search(wq, limit=10)]

    oq = QueryParser("value", ix.schema, **kwargs).parse(qs)
    srch = Searcher(ix)
    got = [(r["doc_id"], r["score"]) for r in srch.search(oq, limit=10).collect()]
    srch.clear_cache()
    assert [d for d, _ in got] == [d for d, _ in want], f"{qs!r}: ours={oq!r} theirs={wq!r}\n{got}\n{want}"
    for (d1, s1), (d2, s2) in zip(got, want):
        assert s1 == pytest.approx(s2, rel=1e-12), f"{qs!r} at doc {d1}"
