"""Differential tests: our Porter stemmer + stemming analyzer chain vs the
reference's lang/porter.py stem() and StemmingAnalyzer."""

import random
import string

import pytest

from whoosh_spark.analysis import stemming_analyzer
from whoosh_spark.analysis.morph import porter_stem

WORDS = [
    # classic Porter exercise set
    "caresses", "ponies", "ties", "caress", "cats", "feed", "agreed",
    "plastered", "bled", "motoring", "sing", "conflated", "troubled",
    "sized", "hopping", "tanned", "falling", "hissing", "fizzed",
    "failing", "filing", "happy", "sky", "relational", "conditional",
    "rational", "valenci", "hesitanci", "digitizer", "conformabli",
    "radicalli", "differentli", "vileli", "analogousli", "vietnamization",
    "predication", "operator", "feudalism", "decisiveness", "hopefulness",
    "callousness", "formaliti", "sensitiviti", "sensibiliti", "triplicate",
    "formative", "formalize", "electriciti", "electrical", "hopeful",
    "goodness", "revival", "allowance", "inference", "airliner",
    "gyroscopic", "adjustable", "defensible", "irritant", "replacement",
    "adjustment", "dependent", "adoption", "homologou", "communism",
    "activate", "angulariti", "homologous", "effective", "bowdlerize",
    "probate", "rate", "cease", "controll", "roll", "fundamentally",
    # quirk probes: at/bl/iz anchoring, double consonants, y-first words
    "ated", "bling", "izing", "atting", "ebbed", "dripped", "yelled",
    "yearly", "syzygy", "yttria", "ying", "ya", "agreement", "abilities",
    # code-corpus-ish vocabulary
    "scanning", "joined", "windows", "partitioning", "indexes",
    "queries", "caches", "serialized", "tokenizer", "optimization",
]


def _ref_stem(whoosh_ref):
    from whoosh.lang.porter import stem

    return stem


@pytest.mark.parametrize("w", WORDS)
def test_porter_matches_reference(whoosh_ref, w):
    assert porter_stem(w) == _ref_stem(whoosh_ref)(w), w


def test_porter_random_words_match_reference(whoosh_ref):
    stem = _ref_stem(whoosh_ref)
    rng = random.Random(7)
    alphabet = string.ascii_lowercase
    for _ in range(3000):
        w = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
        assert porter_stem(w) == stem(w), w


def test_porter_corpus_vocab_matches_reference(whoosh_ref):
    """Every distinct term of the sf0.001 documents table stems identically."""
    import duckdb

    stem = _ref_stem(whoosh_ref)
    vocab = [
        r[0]
        for r in duckdb.sql(
            "SELECT DISTINCT unnest(regexp_extract_all(lower(text), '\\w+(\\.?\\w+)*')) "
            "FROM read_parquet('/root/testdata/sf0.001/documents.parquet')"
        ).fetchall()
    ]
    assert len(vocab) > 20
    for w in vocab:
        assert porter_stem(w) == stem(w), w


def test_stemming_analyzer_chain_matches_reference(whoosh_ref):
    from whoosh.analysis import StemmingAnalyzer

    ana = StemmingAnalyzer()
    ours = stemming_analyzer()
    for text in [
        "The quick brown foxes were running and jumping happily",
        "conditional formatting of relational queries",
        "def tokenize(self): return stemmed_tokens  # filings",
        "a an the hopping dripped syzygy yearly",
        "",
    ]:
        theirs = [(t.text, t.pos) for t in ana(text, positions=True)]
        assert ours.tokens(text) == theirs, text


def test_stemmed_field_search_matches_reference(whoosh_ref, spark, tmp_path):
    """Scored search over a stemmed TEXT field: (doc_id, score) identical to
    reference Whoosh with its StemmingAnalyzer (the reference
    tests/test_results.py usage pattern)."""
    import shutil

    from whoosh import index as windex
    from whoosh.analysis import StemmingAnalyzer
    from whoosh.fields import Schema as WSchema, TEXT as WTEXT, NUMERIC as WNUMERIC
    from whoosh.qparser import QueryParser

    from whoosh_spark.index.build import build_index
    from whoosh_spark.query import nodes as Q
    from whoosh_spark.schema import IndexSchema, TEXT
    from whoosh_spark.analysis import stemming_analyzer
    from whoosh_spark.index.catalog import Index
    from whoosh_spark.search.engine import Searcher

    docs = [
        (0, "the runners were running quickly through the winding paths"),
        (1, "she runs a small running club for serious runners"),
        (2, "wind the clock before the winds start howling"),
        (3, "a quick brown fox jumped over lazy dogs repeatedly"),
        (4, "jumping and running and winding roads"),
        (5, "nothing relevant here at all"),
    ]

    # reference side
    wdir = tmp_path / "whoosh_ref_ix"
    wdir.mkdir()
    ws = WSchema(doc_id=WNUMERIC(stored=True, bits=64), text=WTEXT(analyzer=StemmingAnalyzer()))
    wix = windex.create_in(str(wdir), ws)
    w = wix.writer()
    for did, text in docs:
        w.add_document(doc_id=did, text=text)
    w.commit()

    def ref_search(qstr, limit=10):
        with wix.searcher() as s:
            q = QueryParser("text", ws).parse(qstr)
            return [(hit["doc_id"], round(hit.score, 6)) for hit in s.search(q, limit=limit)]

    # our side
    sdir = str(tmp_path / "spark_ix")
    df = spark.createDataFrame(docs, "doc_id long, text string")
    schema = IndexSchema.of(text=TEXT(analyzer=stemming_analyzer()))
    build_index(spark, df, schema, sdir, sha_col=None)
    ix = Index(spark, sdir)
    searcher = Searcher(ix)

    from whoosh_spark.query.parser import QueryParser as OurParser

    for qstr in ["running", "runs", "winding winds", "jumped OR quickly"]:
        want = ref_search(qstr)
        q = OurParser("text", schema).parse(qstr)
        got = [
            (r["doc_id"], round(r["score"], 6))
            for r in searcher.search(q, limit=10).collect()
        ]
        assert got == want, (qstr, got, want)

    shutil.rmtree(str(wdir), ignore_errors=True)
