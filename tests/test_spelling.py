"""Differential spelling-suggestion tests vs reference Whoosh."""

import pytest
from pyspark.sql import Row

from whoosh_spark.index import Index, build_index
from whoosh_spark.schema import IndexSchema, TEXT
from whoosh_spark.search.spelling import correct_query_terms, suggest

DOCS = [
    "render render render",
    "renders",
    "rendering",
    "renderer bender",
    "sender sender blender",
    "zender",
    "axbyc axbyc",
]


@pytest.fixture(scope="module")
def pair(spark, whoosh_ref, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("spell"))
    df = spark.createDataFrame([Row(doc_id=i, value=t) for i, t in enumerate(DOCS)])
    build_index(spark, df, IndexSchema.of(value=TEXT()), d, sha_col=None)

    from whoosh import fields
    from whoosh.filedb.filestore import RamStorage

    wix = RamStorage().create_index(fields.Schema(value=fields.TEXT))
    w = wix.writer()
    for t in DOCS:
        w.add_document(value=t)
    w.commit()
    return Index(spark, d), wix


CASES = [
    ("render", 6, 2, 0),
    ("rendar", 6, 2, 0),
    ("sender", 6, 2, 1),
    ("bender", 3, 1, 0),
    ("axbyc", 4, 2, 0),
    ("aybxc", 4, 2, 0),  # transposition-ish: discriminates plain vs damerau
]


@pytest.mark.parametrize("text,limit,maxdist,prefix", CASES)
def test_suggest_matches_whoosh(pair, whoosh_ref, text, limit, maxdist, prefix):
    ix, wix = pair
    with wix.searcher() as s:
        want = s.suggest("value", text, limit=limit, maxdist=maxdist, prefix=prefix)
    got = suggest(ix, "value", text, limit=limit, maxdist=maxdist, prefix=prefix)
    assert got == want, f"{text}: {got} != {want}"


def test_correct_query_terms(pair):
    ix, _ = pair
    fixes = correct_query_terms(ix, "value", ["rendar", "render", "zzzzzz"])
    assert fixes.get("rendar") == "render"
    assert "render" not in fixes
