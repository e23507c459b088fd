"""Differential tests: our snowball stem functions vs the reference's
bundled stemmer classes, over curated words + large random word lists."""

import random

import pytest

from whoosh_spark.analysis.snowball import (stem_da, stem_de, stem_es,
                                            stem_fi, stem_fr, stem_hu, stem_it, stem_nl, stem_no, stem_pt, stem_ro, stem_ru, stem_sv)

LANGS = [
    ("da", stem_da, "DanishStemmer", "abcdefghijklmnopqrstuvwxyzæåø",
     ["hedens", "erendes", "kagerne", "løst", "igst", "hoppende", "bakker"]),
    ("no", stem_no, "NorwegianStemmer", "abcdefghijklmnopqrstuvwxyzæåø",
     ["hetenes", "snakkerte", "husene", "vakkert", "hetslov", "billig"]),
    ("sv", stem_sv, "SwedishStemmer", "abcdefghijklmnopqrstuvwxyzäåö",
     ["heterna", "flickorna", "löst", "vackert", "klokast", "mobiltelefonerna"]),
    ("nl", stem_nl, "DutchStemmer", "abcdefghijklmnopqrstuvwxyzèäëïöü",
     ["lichamelijkheden", "mogelijkheid", "praatjes", "koeien",
      "belangrijkste", "draaiing", "gekkigheid", "luttele"]),
    ("it", stem_it, "ItalianStemmer", "abcdefghijklmnopqrstuvwxyzàèìòùáé",
     ["abbandonata", "pronunciarglielo", "rapidamente", "psicologia",
      "soluzione", "qualità", "mangiavano", "finiscono", "città"]),
    ("pt", stem_pt, "PortugueseStemmer", "abcdefghijklmnopqrstuvwxyzáéíóúâêôãõç",
     ["quilométricas", "corações", "felicidade", "rapidamente",
      "construções", "proposição", "comemoração", "bebiam"]),
    ("ro", stem_ro, "RomanianStemmer", "abcdefghijklmnopqrstuvwxyz\u0103\u00e2\u00ee\u015f\u0163",
     ["abilitate", "creativitate", "electricitate", "copiilor",
      "lucrează", "citeşte", "fuseseră", "naţiune", "studenţilor"]),
    ("fi", stem_fi, "FinnishStemmer", "abcdefghijklmnopqrstuvwxyz\u00e4\u00f6",
     ["kirjoissakaan", "edeltäjistään", "taloissa", "nopeasti",
      "suurimmat", "järjestelmään", "tyttöjen", "opettajani"]),
    ("fr", stem_fr, "FrenchStemmer", "abcdefghijklmnopqrstuvwxyzâàëéêèïîôûùç",
     ["continuations", "majestueusement", "nationalité", "abondamment",
      "évidemment", "chevaux", "généreuses", "conditionnelle",
      "questionnaient", "possibilités", "appelée"]),
    ("hu", stem_hu, "HungarianStemmer", "abcdefghijklmnopqrstuvwxyz\u00f6\u00fc\u00e1\u00e9\u00ed\u00f3\u00f5\u00fa\u00fb",
     ["babakocsival", "házakban", "gyerekeknek", "asszonnyal",
      "almákat", "széppé", "könyveim", "barátaink", "nagyobbak"]),
    ("ru", stem_ru, "RussianStemmer", "абвгдежзиклмнопрстуфы",
     ["авиация", "большинство", "красивейшее", "программирование",
      "читавшийся", "жизненный", "учившихся", "пользователями"]),
    ("es", stem_es, "SpanishStemmer", "abcdefghijklmnopqrstuvwxyzáéíóúü",
     ["liebres", "corren", "comiéndoselo", "lógicamente", "biología",
      "solución", "paciencia", "capacidades", "construyeron", "cantarían"]),
    ("de", stem_de, "GermanStemmer", "abcdefghijklmnopqrstuvwxyzäöüß",
     ["aufeinander", "möglichkeit", "freundlichkeiten", "stücke",
      "verständnisse", "häuser", "bezirksregierung", "tagung",
      "billigst", "größte", "feuer", "bauern"]),
]


@pytest.mark.parametrize("code,ours,refname,alphabet,samples",
                         LANGS, ids=[l[0] for l in LANGS])
def test_snowball_matches_reference(whoosh_ref, code, ours, refname, alphabet, samples):
    import whoosh.lang.snowball as snow

    ref = getattr(snow, refname)().stem
    for w in samples:
        assert ours(w) == ref(w), w
    # random words weighted toward real suffixes so every step fires
    suffixes = ["", "en", "er", "es", "s", "et", "ene", "heter", "heten",
                "erendes", "keit", "ung", "lich", "isch", "igst", "løst",
                "löst", "erte", "dt", "gt", "nn", "tt", "niss", "nisse",
                "selas", "ándoselo", "amente", "ación", "logía", "ución",
                "encia", "idades", "yeron", "aríamos", "ó",
                "heden", "heid", "baar", "lijk", "kken", "ieë",
                "glielo", "azione", "ità", "erebbero", "iscono", "chi",
                "ação", "ações", "ência", "eira", "ássemos", "ç",
                "ului", "aţie", "abilitate", "itoare", "eşte", "seserăţi",
                "kaan", "nsä", "siin", "seen", "impi", "aat", "ksi",
                "issements", "amment", "euse", "eaux", "ières", "èrent",
                "képpen", "ástul", "ájuk", "jaitok", "ák", "ssz", "tty",
                "ывшись", "ющего", "иями", "ость", "ейше", "нн", "ться"]
    rng = random.Random(1234 + hash(code) % 1000)
    for _ in range(20000):
        stemlen = rng.randint(1, 9)
        w = "".join(rng.choice(alphabet) for _ in range(stemlen)) + rng.choice(suffixes)
        assert ours(w) == ref(w), (code, w)


def test_lang_stem_analyzer_and_language_analyzer(whoosh_ref):
    """Analyzer(lang_stem=...) == reference chain with a language
    StemFilter; language_analyzer('de') == reference LanguageAnalyzer."""
    from whoosh.analysis import LanguageAnalyzer

    from whoosh_spark.analysis.tokenize import Analyzer, language_analyzer

    text = ("Die Möglichkeiten der Bezirksregierungen wurden "
            "freundlicherweise dargestellt und die häuser bleiben bestehen")
    ref = LanguageAnalyzer("de")
    want = [(t.text, t.pos) for t in ref(text, positions=True)]
    ours = language_analyzer("de")
    assert ours.tokens(text) == want

    # the reference docstring's own example
    es_text = "Por el mar corren las liebres"
    ref_es = LanguageAnalyzer("es")
    want_es = [(t.text, t.pos) for t in ref_es(es_text, positions=True)]
    assert [t for t, _ in want_es] == ["mar", "corr", "liebr"]
    assert language_analyzer("es").tokens(es_text) == want_es


def test_language_analyzer_romanian_no_stoplist(whoosh_ref):
    """Romanian has a stemmer but NO stop list in the reference — its
    LanguageAnalyzer silently skips the StopFilter (NoStopWords fallback);
    ours must produce the identical stream."""
    from whoosh.analysis import LanguageAnalyzer

    from whoosh_spark.analysis.tokenize import language_analyzer

    text = "Studenţii citesc şi lucrează în bibliotecă"
    want = [(t.text, t.pos) for t in LanguageAnalyzer("ro")(text, positions=True)]
    assert language_analyzer("ro").tokens(text) == want


def test_pystemmer_fallback():
    """PyStemmerFilter backend: the C library is absent here, so
    pystemmer_for falls back to the bundled algorithm for the language."""
    from whoosh_spark.analysis.snowball import pystemmer_for, stem_de

    fn = pystemmer_for("german")
    assert fn("freundlichkeiten") == stem_de("freundlichkeiten")
    import pytest as _pytest

    with _pytest.raises((ImportError, KeyError)):
        pystemmer_for("klingon")


def test_english_snowball_matches_reference(whoosh_ref):
    """stem_en == reference EnglishStemmer (lang/snowball/english.py) incl.
    special words, the gener/commun/arsen R1 exception, apostrophe forms
    and y/Y marking — 60k-word random diff."""
    import random
    import string

    from whoosh.lang.snowball.english import EnglishStemmer

    from whoosh_spark.analysis.snowball import stem_en

    ref = EnglishStemmer().stem
    rng = random.Random(5)
    suffixes = ["ing", "ed", "s", "es", "ies", "ization", "ational",
                "fulness", "ously", "iveness", "ly", "ment", "ness",
                "ical", "icate", "ative", "tional", "biliti", "ogi", "li",
                "eedly", "ingly", "'s", "'s'", "'", "sses", ""]
    words = ["generously", "communication", "arsenic", "dying", "skies",
             "running", "hopefully", "nationalization", "abilities",
             "cries", "agreed", "luxuriously", "hopping", "sky", "news"]
    for _ in range(60000):
        base = "".join(
            rng.choice(string.ascii_lowercase + ("y'" if rng.random() < 0.2 else ""))
            for _ in range(rng.randint(1, 9)))
        words.append(base + rng.choice(suffixes))
    for w in words:
        assert stem_en(w) == ref(w), w


def test_language_analyzer_all_stoplist_languages(whoosh_ref):
    """language_analyzer(lang) == reference LanguageAnalyzer(lang) for
    every bundled language WITH a stop list — catches the round-4 bug
    where fi/fr/hu/ru lists existed but weren't registered (stop filter
    silently skipped), and covers the new 'en' (English Snowball, NOT
    Porter)."""
    from whoosh.analysis import LanguageAnalyzer

    from whoosh_spark.analysis.tokenize import language_analyzer

    texts = {
        "en": "The quick foxes were running and generously communicated their abilities",
        "fr": "les renards rapides couraient et communiquaient généreusement leurs capacités",
        "ru": "быстрые лисы бежали и великодушно сообщали о своих возможностях",
        "fi": "nopeat ketut juoksivat ja ilmoittivat kyvyistään anteliaasti",
        "hu": "a gyors rókák futottak és nagylelkűen közölték képességeiket",
        "de": "die schnellen Füchse liefen und teilten ihre Fähigkeiten mit",
    }
    for lang, text in texts.items():
        want = [(t.text, t.pos) for t in LanguageAnalyzer(lang)(text, positions=True)]
        got = language_analyzer(lang).tokens(text)
        assert got == want, lang


def test_language_analyzer_aliases_and_arabic(whoosh_ref):
    """Reference two_letter_code aliases work, and "ar" routes to the ISRI
    stemmer with no stop list (lang/__init__.py:89-131)."""
    from whoosh.analysis import LanguageAnalyzer

    from whoosh_spark.analysis.tokenize import language_analyzer

    assert language_analyzer("english") == language_analyzer("en")
    assert language_analyzer("deutsch") == language_analyzer("de")
    assert language_analyzer("fra") == language_analyzer("fr")

    text = "الكتاب المدرسة يكتبون والكاتبون"
    want = [(t.text, t.pos) for t in LanguageAnalyzer("ar")(text, positions=True)]
    assert language_analyzer("ar").tokens(text) == want
