"""Differential tests for the analysis filters added in round 2:
IntraWordFilter, CharsetFilter(accent folding), SubstitutionFilter,
ReverseTextFilter, MultiFilter(index/query analyzers) — vs the reference."""

import random

import pytest

from whoosh_spark.analysis import Analyzer, fancy_analyzer
from whoosh_spark.analysis.intraword import DEFAULT_DELIMS, fold_accents, intraword_pairs

SAMPLES = [
    "PowerShot SD500 Wi-Fi",
    "Super-Duper-XL500-42-AutoCoder!",
    "O'Neil's",
    "camelCaseWord snake_case_word mixed_Case123Numbers",
    "A's+B's&C's",
    "__init__ self.x foo.bar(baz) x<=y",
    "ALLCAPS lowercase 12345 a1b2c3",
    "trailing- -leading '''",
    "word",
    "",
]


def ref_iwf_tokens(whoosh_ref, text, mergewords=False, mergenums=False,
                   lower=True, positions=True):
    from whoosh.analysis import IntraWordFilter, LowercaseFilter, RegexTokenizer

    chain = RegexTokenizer(r"\S+") | IntraWordFilter(
        mergewords=mergewords, mergenums=mergenums
    )
    if lower:
        chain = chain | LowercaseFilter()
    return [(t.text, t.pos) for t in chain(text, positions=positions)]


@pytest.mark.parametrize("text", SAMPLES)
@pytest.mark.parametrize("merge", [(False, False), (True, True), (True, False)])
def test_intraword_matches_reference(whoosh_ref, text, merge):
    mw, mn = merge
    ana = Analyzer(pattern=r"\S+", use_stopfilter=False,
                   intraword=(DEFAULT_DELIMS, True, True, mw, mn))
    got = ana.tokens(text)
    want = ref_iwf_tokens(whoosh_ref, text, mergewords=mw, mergenums=mn)
    assert got == want, (text, merge, got, want)


def test_intraword_random_code_tokens(whoosh_ref):
    rng = random.Random(11)
    pieces = ["foo", "Bar", "BAZ", "123", "42", "x", "Y"]
    seps = ["-", "_", ".", "", "'s", "/"]
    for _ in range(200):
        word = "".join(
            rng.choice(pieces) + rng.choice(seps) for _ in range(rng.randint(1, 5))
        )
        ana = Analyzer(pattern=r"\S+", use_stopfilter=False,
                       intraword=(DEFAULT_DELIMS, True, True, True, True))
        got = ana.tokens(word)
        want = ref_iwf_tokens(whoosh_ref, word, mergewords=True, mergenums=True)
        assert got == want, (word, got, want)


def test_fancy_analyzer_matches_reference(whoosh_ref):
    from whoosh.analysis import FancyAnalyzer

    ref = FancyAnalyzer()
    ours = fancy_analyzer()
    for text in SAMPLES:
        got = ours.tokens(text)
        want = [(t.text, t.pos) for t in ref(text, positions=True)]
        assert got == want, (text, got, want)


ACCENT_SAMPLES = [
    "café naïve über straße Ångström",
    "déjà-vu résumé françois łódź",
    "søren østerby ñoño",
    "plain ascii",
]


def test_accent_folding_matches_reference(whoosh_ref, ):
    from whoosh.analysis import CharsetFilter, LowercaseFilter, RegexTokenizer
    from whoosh.support.charset import accent_map

    chain = RegexTokenizer() | LowercaseFilter() | CharsetFilter(accent_map)
    ours = Analyzer(use_stopfilter=False, accent_fold=True)
    for text in ACCENT_SAMPLES:
        want = [t.text for t in chain(text)]
        got = [t for t, _ in ours.tokens(text)]
        assert got == want, (text, got, want)


def test_substitution_filter_matches_reference(whoosh_ref):
    from whoosh.analysis import RegexTokenizer, SubstitutionFilter

    chain = RegexTokenizer(r"\S+") | SubstitutionFilter("-", "")
    ours = Analyzer(pattern=r"\S+", lowercase=False, use_stopfilter=False,
                    substitutions=(("-", ""),))
    for text in ["hello there-world", "a-b-c d", "nothing"]:
        want = [t.text for t in chain(text)]
        got = [t for t, _ in ours.tokens(text)]
        assert got == want, (text, got, want)


def test_reverse_filter_matches_reference(whoosh_ref):
    from whoosh.analysis import LowercaseFilter, RegexTokenizer, ReverseTextFilter

    chain = RegexTokenizer() | LowercaseFilter() | ReverseTextFilter()
    ours = Analyzer(use_stopfilter=False, reverse=True)
    for text in ["Hello World", "abc DEF ghi"]:
        want = [t.text for t in chain(text)]
        got = [t for t, _ in ours.tokens(text)]
        assert got == want, (text, got, want)


def test_multifilter_index_vs_query_analyzers(spark, tmp_path):
    """MultiFilter semantics: merged subwords at index time, unmerged at
    query time (reference intraword.py docstring usage) via
    FieldType.query_analyzer."""
    from pyspark.sql import Row

    from whoosh_spark.index import Index, build_index
    from whoosh_spark.query.parser import QueryParser
    from whoosh_spark.schema import FieldType
    from whoosh_spark.search import Searcher

    iwf_index = fancy_analyzer(mergewords=True, mergenums=True)
    iwf_query = fancy_analyzer(mergewords=False, mergenums=False)
    ft = FieldType(analyzer=iwf_index, query_analyzer=iwf_query,
                   indexed=True, scorable=True, phrase=True, kind="text")
    from whoosh_spark.schema import IndexSchema

    schema = IndexSchema.of(text=ft)
    docs = [(0, "the WiFi router"), (1, "wifi is down"), (2, "ethernet only")]
    d = str(tmp_path / "mf")
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in docs])
    build_index(spark, df, schema, d, sha_col=None)
    # parse with the RELOADED schema, not the in-memory object: r2 ADVICE —
    # query_analyzer must survive schema_to_dict/schema_from_dict, else a
    # reopened index silently parses with the index analyzer
    ix = Index(spark, d)
    assert ix.schema["text"].query_analyzer is not None
    s = Searcher(ix)
    qp = QueryParser("text", ix.schema)
    # "WiFi" at query time -> [wi, fi] subwords; doc 0 indexed wi/fi/wifi
    hits = sorted(r["doc_id"] for r in s.search(qp.parse("WiFi"), limit=None).collect())
    assert hits == [0]
    # merged form matches both the camelcase doc (merged at index) and doc 1
    hits = sorted(r["doc_id"] for r in s.search(qp.parse("wifi"), limit=None).collect())
    assert hits == [0, 1]


def test_path_tokenizer_matches_reference(whoosh_ref):
    from whoosh.analysis import PathTokenizer

    from whoosh_spark.analysis.tokenize import path_analyzer

    pt = PathTokenizer()
    ours = path_analyzer()
    for p in ["/a/b/c", "/usr/local/lib/python", "rel/path", "/x", ""]:
        want = [(t.text, t.pos) for t in pt(p, positions=True)]
        assert ours.tokens(p) == want, p


def test_variations_query(spark, tmp_path):
    """Variations matches lexicon terms sharing the word's Porter stem,
    scored per term (our documented engine-native strategy; the reference
    generates rule-table suffix candidates instead)."""
    from pyspark.sql import Row

    import whoosh_spark.query as Q
    from whoosh_spark.index import Index, build_index
    from whoosh_spark.schema import IndexSchema, TEXT
    from whoosh_spark.search import Searcher

    docs = [
        (0, "rendering the scene"),
        (1, "renders quickly"),
        (2, "rendered yesterday"),
        (3, "nothing to see"),
        (4, "render farm"),
    ]
    d = str(tmp_path / "varix")
    schema = IndexSchema.of(text=TEXT())
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in docs])
    build_index(spark, df, schema, d, sha_col=None)
    s = Searcher(Index(spark, d))
    hits = sorted(r["doc_id"] for r in s.search(Q.Variations("text", "render"), limit=None).collect())
    assert hits == [0, 1, 2, 4]
    # scored expansion: each variant scores like its own Term, summed per doc
    scores = {r["doc_id"]: r["score"] for r in s.search(Q.Variations("text", "render"), limit=None).collect()}
    assert all(v > 0 for v in scores.values())


def test_compound_word_filter_matches_reference(whoosh_ref):
    from whoosh.analysis import CompoundWordFilter, RegexTokenizer

    ws = frozenset("green eggs ham script apple i do not like and".split())
    for keep in (True, False):
        ref = RegexTokenizer(r"\S+") | CompoundWordFilter(ws, keep_compound=keep)
        ours = Analyzer(pattern=r"\S+", lowercase=False, use_stopfilter=False,
                        compound_words=ws, compound_keep=keep)
        for text in ["i do not like greeneggs and ham", "applescript rocks",
                     "nothing splits here"]:
            want = [(t.text, t.pos) for t in ref(text, positions=True)]
            assert ours.tokens(text) == want, (keep, text)


def test_biword_shingle_filters_match_reference(whoosh_ref):
    from whoosh.analysis import BiWordFilter, LowercaseFilter, RegexTokenizer, ShingleFilter

    cases = [
        ((2, "-"), BiWordFilter()),
        ((3, " "), ShingleFilter(3, " ")),
        ((2, "_"), ShingleFilter(2, "_")),
    ]
    texts = ["the sign of four", "single",
             "better a witty fool than a foolish wit"]
    for (size, sep), wfilter in cases:
        ref = RegexTokenizer() | LowercaseFilter() | wfilter
        ours = Analyzer(use_stopfilter=False, shingle=(size, sep))
        for text in texts:
            want = [(t.text, t.pos) for t in ref(text, positions=True)]
            assert ours.tokens(text) == want, (size, sep, text)
        # the reference BiWordFilter raises UnboundLocalError on an empty
        # stream (intraword.py:167); we return an empty token list
        assert ours.tokens("") == []
