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


def test_morph_en_variations_match_reference(whoosh_ref):
    """The LiteMorph_en expander: identical families for exception words,
    identical rule expansions (incl. the reference's *-expansion no-op)."""
    import random as _random

    from whoosh.lang.morph_en import variations as ref_var

    from whoosh_spark.analysis.morph_en import variations

    for w in ["pull", "render", "tries", "happiness", "tokenizes", "act",
              "crisis", "joyous", "running", "classes", "a", "was", "xyzzy"]:
        assert set(variations(w)) == set(ref_var(w)), w
    rng = _random.Random(5)
    sufs = ["", "iness", "less", "ness", "ous", "ies", "sis", "es", "izes",
            "s", "ed", "ing", "er", "est", "ly", "ment", "ful", "y", "e"]
    for _ in range(3000):
        w = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz")
                    for _ in range(rng.randint(1, 8))) + rng.choice(sufs)
        assert set(variations(w)) == set(ref_var(w)), w


def test_variations_query(spark, whoosh_ref, tmp_path):
    """Variations top-k (doc, score) identical to the reference: morph_en
    candidates filtered to the lexicon, each scored as its own Term."""
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
        (5, "it was happiness"),
    ]
    d = str(tmp_path / "varix")
    schema = IndexSchema.of(text=TEXT())
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in docs])
    build_index(spark, df, schema, d, sha_col=None)

    from whoosh import fields
    from whoosh.filedb.filestore import RamStorage
    from whoosh.query import Variations as WVariations

    wix = RamStorage().create_index(fields.Schema(text=fields.TEXT()))
    w = wix.writer()
    for _, t in docs:
        w.add_document(text=t)
    w.commit()

    s = Searcher(Index(spark, d))
    for word in ["render", "rendering", "happy", "be"]:
        with wix.searcher() as ws:
            want = [(h.docnum, round(h.score, 9))
                    for h in ws.search(WVariations("text", word), limit=10)]
        got = [(r["doc_id"], round(r["score"], 9))
               for r in s.search(Q.Variations("text", word), limit=10).collect()]
        assert got == want, (word, got, want)
    s.clear_cache()


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


CHARSET_TABLE = """
# letters map to lowercase; digits stray; underscore maps to dash
U+0041..U+005A->U+0061..U+007A, a..z, 0..9
_->-
U+00C0..U+00C5->U+00E0..U+00E5
"""


def test_charset_table_parser_matches_reference(whoosh_ref):
    from whoosh.support.charset import charset_table_to_dict

    from whoosh_spark.analysis.charsets import parse_charset_table

    want = charset_table_to_dict(CHARSET_TABLE)
    got = parse_charset_table(CHARSET_TABLE)
    assert got == dict(want)
    # checkerboard form: the REFERENCE parser is broken here — its
    # `assert toord - fromord % 2 == 0` (support/charset.py:1369) lacks
    # parens, so every real /2 item raises AssertionError. We implement the
    # documented Sphinx semantics (A..Z/2 == A->B, B->B, C->D, D->D, ...).
    with pytest.raises(AssertionError):
        charset_table_to_dict("U+0100..U+0103/2")
    assert parse_charset_table("U+0100..U+0103/2") == {
        0x100: chr(0x101), 0x101: chr(0x101), 0x102: chr(0x103), 0x103: chr(0x103),
    }


@pytest.mark.parametrize("text", [
    "Hello World",
    "FOO_bar Baz123",
    "ends-with-break!",
    "NoBreakAtEnd",   # final-token quirk: raw slice, untranslated
    "ÀÉöx 42",
    "",
    "!!!",
])
def test_charset_tokenizer_matches_reference(whoosh_ref, text):
    from whoosh.analysis import CharsetTokenizer
    from whoosh.support.charset import charset_table_to_dict

    from whoosh_spark.analysis.charsets import charmap_key, parse_charset_table

    from collections import defaultdict

    # the reference tokenizer indexes charmap[ord] directly, so it needs the
    # defaultdict the parser builds INTERNALLY (charset_table_to_dict returns
    # a plain dict at the end, losing the None default — feeding its own
    # output back crashes with KeyError on any break char)
    refmap = defaultdict(lambda: None, charset_table_to_dict(CHARSET_TABLE))
    want = [(t.text, t.pos) for t in CharsetTokenizer(refmap)(text, positions=True)]
    ours = Analyzer(charmap=charmap_key(parse_charset_table(CHARSET_TABLE)),
                    lowercase=False, use_stopfilter=False)
    assert ours.tokens(text) == want, text


def test_strip_filter_matches_reference(whoosh_ref):
    from whoosh.analysis import RegexTokenizer, StripFilter

    chain = RegexTokenizer(r"[^,]+") | StripFilter()
    ours = Analyzer(pattern=r"[^,]+", strip=True, lowercase=False, use_stopfilter=False)
    for text in ["a, b ,  c d , e", "one,two", " lead", "trail ", ""]:
        want = [(t.text, t.pos) for t in chain(text, positions=True)]
        assert ours.tokens(text) == want, text


def test_tee_filter_matches_reference(whoosh_ref):
    from whoosh.analysis import (
        BiWordFilter,
        LowercaseFilter,
        PassFilter,
        RegexTokenizer,
        ReverseTextFilter,
        TeeFilter,
    )

    passthru = Analyzer(lowercase=False, use_stopfilter=False)
    # branch 1 lowercases, branch 2 reverses (reference docstring example)
    chain = RegexTokenizer(r"\S+") | TeeFilter(LowercaseFilter(), ReverseTextFilter())
    ours = Analyzer(
        pattern=r"\S+", lowercase=False, use_stopfilter=False,
        tee=(Analyzer(lowercase=True, use_stopfilter=False),
             Analyzer(lowercase=False, use_stopfilter=False, reverse=True)),
    )
    for text in ["ALFA BRAVO CHARLIE", "One", ""]:
        want = [(t.text, t.pos) for t in chain(text, positions=True)]
        assert ours.tokens(text) == want, text

    # pass-through + BiWord, lowercased AFTER the tee
    chain2 = RegexTokenizer(r"\S+") | TeeFilter(PassFilter(), BiWordFilter()) | LowercaseFilter()
    ours2 = Analyzer(
        pattern=r"\S+", lowercase=True, use_stopfilter=False,
        tee=(passthru, Analyzer(lowercase=False, use_stopfilter=False, shingle=(2, "-"))),
    )
    for text in ["ALFA BRAVO CHARLIE", "Alfa Bravo", "Solo"]:
        want = [(t.text, t.pos) for t in chain2(text, positions=True)]
        assert ours2.tokens(text) == want, text


def test_charset_tee_strip_schema_roundtrip():
    from whoosh_spark.analysis.charsets import charmap_key, parse_charset_table
    from whoosh_spark.schema import FieldType, IndexSchema, schema_from_dict, schema_to_dict

    ana = Analyzer(
        strip=True,
        charmap=charmap_key(parse_charset_table("a..z, 0..9")),
        tee=(Analyzer(lowercase=True, use_stopfilter=False),
             Analyzer(lowercase=False, use_stopfilter=False, reverse=True)),
    )
    ft = FieldType(analyzer=ana, indexed=True, stored=False, kind="text")
    schema = IndexSchema.of(body=ft)
    back = schema_from_dict(schema_to_dict(schema))
    assert back["body"].analyzer == ana


def test_delimited_boost_tokens_match_reference(whoosh_ref):
    from whoosh.analysis import DelimitedAttributeFilter, LowercaseFilter, RegexTokenizer

    chain = RegexTokenizer(r"\S+") | DelimitedAttributeFilter() | LowercaseFilter()
    ours = Analyzer(pattern=r"\S+", lowercase=True, use_stopfilter=False,
                    delimited_boost="^")
    for text in ["image render^2 file^0.5", "plain words", "a^3 b^4 c"]:
        want = [(t.text, t.pos, t.boost) for t in chain(text, positions=True)]
        got = ours.tokens_boosts(text)
        assert got == want, (text, got, want)
        # tokens() sees the same terms/positions, boosts stripped
        assert ours.tokens(text) == [(t, p) for t, p, _ in want]


def test_delimited_boost_scoring_matches_reference(spark, whoosh_ref, tmp_path):
    """Token boosts flow into posting weights: BM25 top-k (doc, score)
    identical to reference whoosh with DelimitedAttributeFilter, through
    build AND merge (weights survive re-encode)."""
    from pyspark.sql import Row

    import whoosh_spark.query as Q
    from whoosh_spark.index import Index, build_index
    from whoosh_spark.index.merge import apply_merge_policy
    from whoosh_spark.schema import FieldType, IndexSchema
    from whoosh_spark.search import Searcher

    docs = [
        (0, "alpha^3 beta gamma"),
        (1, "alpha beta^2 delta"),
        (2, "alpha alpha^0.5 beta"),
        (3, "gamma delta epsilon"),
        (4, "alpha^10 solo"),
    ]

    from whoosh import fields
    from whoosh.analysis import DelimitedAttributeFilter, LowercaseFilter, RegexTokenizer
    from whoosh.filedb.filestore import RamStorage

    ref_ana = RegexTokenizer(r"\S+") | DelimitedAttributeFilter() | LowercaseFilter()
    wix = RamStorage().create_index(fields.Schema(text=fields.TEXT(analyzer=ref_ana)))
    w = wix.writer()
    for _, t in docs:
        w.add_document(text=t)
    w.commit()

    ana = Analyzer(pattern=r"\S+", lowercase=True, use_stopfilter=False,
                   delimited_boost="^")
    ft = FieldType(analyzer=ana, indexed=True, scorable=True, kind="text")
    schema = IndexSchema.of(text=ft)
    d = str(tmp_path / "daf")
    # two segments so the merge below has real work
    from whoosh_spark.index.build import build_segment

    df1 = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in docs[:3]])
    df2 = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in docs[3:]])
    build_index(spark, df1, schema, d, sha_col=None)
    build_segment(spark, df2, schema, d, sha_col=None)

    def ours_topk(ixdir, q):
        s = Searcher(Index(spark, ixdir))
        out = [(r["doc_id"], r["score"]) for r in s.search(q, limit=10).collect()]
        s.clear_cache()
        return out

    for term in ["alpha", "beta", "gamma"]:
        with wix.searcher() as ws:
            from whoosh.query import Term as WTerm

            want = [(h.docnum, h.score) for h in ws.search(WTerm("text", term), limit=10)]
        got = ours_topk(d, Q.Term("text", term))
        assert [x[0] for x in got] == [x[0] for x in want], term
        for (d1, s1), (_, s2) in zip(got, want):
            assert s1 == pytest.approx(s2, rel=1e-12), (term, d1)

    apply_merge_policy(spark, d, policy="OPTIMIZE")
    got = ours_topk(d, Q.Term("text", "alpha"))
    with wix.searcher() as ws:
        from whoosh.query import Term as WTerm

        want = [(h.docnum, h.score) for h in ws.search(WTerm("text", "alpha"), limit=10)]
    assert [x[0] for x in got] == [x[0] for x in want]
    for (d1, s1), (_, s2) in zip(got, want):
        assert s1 == pytest.approx(s2, rel=1e-12), ("post-merge", d1)


def test_double_metaphone_function_matches_reference(whoosh_ref):
    import random

    from whoosh.lang.dmetaphone import double_metaphone as ref_dm

    from whoosh_spark.analysis.dmetaphone import double_metaphone

    curated = [
        "smith", "schmidt", "aghast", "high", "night", "jose", "san jacinto",
        "wasserman", "filipowicz", "caesar", "chianti", "michael", "orchestra",
        "mcclellan", "bacchus", "accident", "succeed", "edge", "ghislane",
        "hugh", "laugh", "mclaughlin", "cagney", "tagliaro", "thames", "sugar",
        "island", "school", "schenker", "resnais", "rogier", "dumb",
        "campbell", "cabrillo", "breaux", "zhao", "czerny", "focaccia", "",
    ]
    for w in curated:
        assert double_metaphone(w) == ref_dm(w), w
    rng = random.Random(99)
    letters = "abcdefghijklmnopqrstuvwxyz"
    for _ in range(5000):
        w = "".join(rng.choice(letters) for _ in range(rng.randint(1, 12)))
        assert double_metaphone(w) == ref_dm(w), w


@pytest.mark.parametrize("combine", [False, True])
def test_double_metaphone_filter_matches_reference(whoosh_ref, combine):
    from whoosh.analysis import DoubleMetaphoneFilter, LowercaseFilter, RegexTokenizer

    chain = (RegexTokenizer(r"\S+") | LowercaseFilter()
             | DoubleMetaphoneFilter(combine=combine))
    ours = Analyzer(pattern=r"\S+", lowercase=True, use_stopfilter=False,
                    dmetaphone=(1.0, 0.5, combine))
    for text in ["spruce view", "john smith", "jose wasserman", "aghast night"]:
        want = [(t.text, t.pos, t.boost) for t in chain(text, positions=True)]
        got = ours.tokens_boosts(text)
        assert got == want, (text, got, want)
        assert ours.tokens(text) == [(t, p) for t, p, _ in want]


def test_phonetic_field_search_matches_reference(spark, whoosh_ref, tmp_path):
    """The reference's canonical phonetic setup (test_parse_plugins
    test_copyfield tail): KEYWORD name + dmetaphone copy field with
    multitoken_query='or', CopyFieldPlugin fans words into both; top-k
    (doc, score) identical — exercising the dmetaphone BOOST weights
    (secondary codes at 0.5) through the posting weight channel."""
    from pyspark.sql import Row

    from whoosh import fields, qparser
    from whoosh.analysis import DoubleMetaphoneFilter, RegexAnalyzer
    from whoosh.filedb.filestore import RamStorage
    from whoosh import formats

    from whoosh_spark.index import Index, build_index
    from whoosh_spark.query.parser import QueryParser
    from whoosh_spark.schema import FieldType, IndexSchema, KEYWORD
    from whoosh_spark.search import Searcher

    names = ["spruce view", "spruse vue", "bruce hill", "john smith",
             "jon schmidt", "juan smythe"]

    ref_ana = RegexAnalyzer(r"\w+") | DoubleMetaphoneFilter()
    ft = fields.FieldType(formats.Frequency(), ref_ana, multitoken_query="or",
                          scorable=True)
    wix = RamStorage().create_index(
        fields.Schema(name=fields.KEYWORD(scorable=True), name_phone=ft)
    )
    w = wix.writer()
    for n in names:
        w.add_document(name=n, name_phone=n)
    w.commit()

    our_phone = FieldType(
        analyzer=Analyzer(pattern=r"\w+", lowercase=False, use_stopfilter=False,
                          dmetaphone=(1.0, 0.5, False)),
        indexed=True, scorable=True, multitoken_query="or", kind="text",
    )
    schema = IndexSchema.of(name=KEYWORD(scorable=True), name_phone=our_phone)
    d = str(tmp_path / "phon")
    df = spark.createDataFrame([Row(doc_id=i, name=n, name_phone=n)
                                for i, n in enumerate(names)])
    build_index(spark, df, schema, d, sha_col=None)

    wp = qparser.QueryParser("name", wix.schema)
    wp.add_plugin(qparser.CopyFieldPlugin({"name": "name_phone"}))
    op = QueryParser("name", Index(spark, d).schema,
                     copyfields={"name": "name_phone"})
    s = Searcher(Index(spark, d))
    for qs in ["spruce view", "john smith", "smythe"]:
        wq = wp.parse(qs)
        with wix.searcher() as ws:
            want = [(h.docnum, round(h.score, 9)) for h in ws.search(wq, limit=10)]
        got = [(r["doc_id"], round(r["score"], 9))
               for r in s.search(op.parse(qs), limit=10).collect()]
        assert got == want, (qs, got, want)
    s.clear_cache()


def test_keyword_tokenizers_match_reference(whoosh_ref):
    """Space/CommaSeparated tokenizer presets (reference tokenizers.py:
    293-317, fields.KEYWORD): same token streams incl. the comma mode's
    per-token strip and the lowercase=False default."""
    from whoosh.analysis import (CommaSeparatedTokenizer, KeywordAnalyzer,
                                 SpaceSeparatedTokenizer)

    from whoosh_spark.schema import KEYWORD

    texts = ["hi there  big-time, what ever",
             "hi there,big-time, what ever , x",
             "MiXeD Case,  padded  ,tags",
             "single"]
    space_ana = KEYWORD().analyzer
    comma_ana = KEYWORD(commas=True).analyzer
    lower_ana = KEYWORD(commas=True, lowercase=True).analyzer
    for text in texts:
        want = [(t.text, t.pos) for t in SpaceSeparatedTokenizer()(text, positions=True)]
        assert space_ana.tokens(text) == want, text
        want = [(t.text, t.pos) for t in CommaSeparatedTokenizer()(text, positions=True)]
        assert comma_ana.tokens(text) == want, text
        want = [(t.text, t.pos)
                for t in KeywordAnalyzer(lowercase=True, commas=True)(text, positions=True)]
        assert lower_ana.tokens(text) == want, text
