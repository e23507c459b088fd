"""Differential test: our ISRI Arabic stemmer vs the reference
whoosh.lang.isri.ISRIStemmer (50k random Arabic strings + data parity)."""

import random

import pytest


@pytest.fixture(scope="module")
def ref(whoosh_ref):
    from whoosh.lang.isri import ISRIStemmer

    return ISRIStemmer()


def test_isri_data_parity(ref):
    import whoosh_spark.analysis.isri as ours

    assert ours._P3 == ref.p3 and ours._P2 == ref.p2 and ours._P1 == ref.p1
    assert ours._S3 == ref.s3 and ours._S2 == ref.s2 and ours._S1 == ref.s1
    for k in ref.pr4:
        assert list(ours._PR4[k]) == ref.pr4[k]
    for k in ref.pr53:
        assert list(ours._PR53[k]) == ref.pr53[k]
    assert set(ref.stop_words) == set(ours.STOP_WORDS)


def test_isri_matches_reference(ref):
    from whoosh_spark.analysis.isri import stem

    rng = random.Random(3)
    letters = "ابتثجحخدذرزسشصضطظعغفقكلمنهويءئؤةىآأإ" + "ًٌٍَُِّْ"
    for _ in range(50000):
        w = "".join(rng.choice(letters) for _ in range(rng.randint(1, 9)))
        assert stem(w) == ref.stem(w), w
    for w in ref.stop_words:
        assert stem(w) == ref.stem(w), w
