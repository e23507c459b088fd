"""Differential tests: soundex_en/esp/ar vs the reference
whoosh.lang.phonetic implementations (random word sweeps)."""

import random
import string

import pytest


@pytest.fixture(scope="module")
def ref(whoosh_ref):
    from whoosh.lang import phonetic

    return phonetic


def test_soundex_en_matches(ref):
    from whoosh_spark.analysis.phonetic import soundex_en

    rng = random.Random(7)
    words = ["robert", "rupert", "ashcraft", "ashcroft", "tymczak", "pfister",
             "honeyman", "example", "soundex", "aeiou"]
    words += ["".join(rng.choice(string.ascii_lowercase)
                      for _ in range(rng.randint(1, 12))) for _ in range(5000)]
    # mixed case + digits (skipped chars don't reset the run dedupe)
    words += ["Robert", "r2d2c3po", "A1a", "MiXeD42case"]
    for w in words:
        assert soundex_en(w) == ref.soundex_en(w), w


def test_soundex_esp_matches(ref):
    from whoosh_spark.analysis.phonetic import soundex_esp

    rng = random.Random(11)
    alphabet = "abcdefghijklmnopqrstuvwxyzñáéíóúü"
    words = ["huevo", "guerra", "cechez", "llamar", "psicologia", "vaca",
             "ciudad", "walter", "schema", "yate"]
    words += ["".join(rng.choice(alphabet)
                      for _ in range(rng.randint(1, 12))) for _ in range(5000)]
    for w in words:
        assert soundex_esp(w) == ref.soundex_esp(w), w


def test_soundex_ar_matches(ref):
    from whoosh_spark.analysis.phonetic import soundex_ar

    rng = random.Random(13)
    # words whose second character is mapped — see the crash quirk below
    mapped = "حخهعغشويفبجزسصظقكتثدذضطلمنر"
    alphabet = mapped + "اأإآ" + "ةء"
    words = ["محمد", "احمد", "الكتاب", "مدرسة"]
    words += ["".join([rng.choice(mapped)] * 2
                      + [rng.choice(alphabet)
                         for _ in range(rng.randint(0, 8))]) for _ in range(5000)]
    for w in words:
        assert soundex_ar(w) == ref.soundex_ar(w), w


def test_soundex_ar_reference_crash_quirk(ref):
    """The reference crashes (UnboundLocalError: `code` read before any
    mapped char assigns it, phonetic.py:108-115) when word[1] is an
    unmapped char like taa marbuta; unmapped chars elsewhere are no-ops
    because the stale `code` equals `prevcode`. We implement the documented
    skip semantics instead — behaviorally identical everywhere the
    reference doesn't crash."""
    from whoosh_spark.analysis.phonetic import soundex_ar

    w = "مة" + "رب"
    with pytest.raises(UnboundLocalError):
        ref.soundex_ar(w)
    assert soundex_ar(w) == "061"  # ة skipped, ر=6, ب=1
