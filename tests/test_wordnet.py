"""Differential test: wordnet thesaurus parsing/synonyms vs the reference
whoosh.lang.wordnet on a synthetic wn_s.pl snippet."""

import io

import pytest

WN_SNIPPET = """\
s(100001,1,'hail',n,1,0).
s(100001,2,'acclaim',n,1,1).
s(100001,3,'herald',n,1,0).
s(100002,1,'hail',v,1,3).
s(100002,2,'come',v,1,1).
s(100003,1,'multi word',n,1,0).
s(100003,2,'herald',n,2,0).
s(100004,1,'Mixed',n,1,0).
s(100004,2,'blended',n,1,0).
x(999,1,'notasline',n,1,0).
s(100005,1,'it''s',n,1,0).
"""


@pytest.fixture(scope="module")
def ref(whoosh_ref):
    from whoosh.lang import wordnet

    return wordnet


def test_parse_and_synonyms_match(ref):
    from whoosh_spark.analysis import wordnet as ours

    rw2n, rn2w = ref.parse_file(io.StringIO(WN_SNIPPET))
    ow2n, on2w = ours.parse_file(io.StringIO(WN_SNIPPET))
    assert dict(rw2n) == dict(ow2n)
    assert dict(rn2w) == dict(on2w)
    for w in list(rw2n) + ["hail", "come", "mixed"]:
        assert ours.synonyms(ow2n, on2w, w) == ref.synonyms(rw2n, rn2w, w), w


def test_thesaurus_roundtrip_and_expansion(spark, tmp_path):
    import whoosh_spark.query as Q
    from whoosh_spark.analysis.wordnet import Thesaurus

    t = Thesaurus.from_file(io.StringIO(WN_SNIPPET))
    assert t.synonyms("hail") == ["acclaim", "come", "herald"]
    p = str(tmp_path / "syns.parquet")
    t.to_parquet(spark, p)
    t2 = Thesaurus.from_parquet(spark, p)
    assert t2.synonyms("hail") == t.synonyms("hail")
    q = t.expand_query("text", "hail")
    assert isinstance(q, Q.Or) and len(q.subqueries) == 4
    assert t.expand_query("text", "zzz") == Q.Term("text", "zzz")
