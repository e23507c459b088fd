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
    "value:[blue TO]",
    "value:[TO green]",
    "value:['blue' TO 'red']",  # quoted range endpoints (RangeTagger strips)
    "'red town'",  # SingleQuotePlugin: quoted value as one (analyzed) token
    "'red'green",  # boundary guard: NOT a quote — lexes as plain words
    "value:[greenTO]",  # unspaced TO is not a range separator
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


PRESET_QUERIES = [
    "red",
    "red town",
    "yellow red",
    "red OR uptown",
    '"red town"',
    "name:yellow red",
]


@pytest.mark.parametrize("qs", PRESET_QUERIES)
def test_multifield_parser_matches_reference(pair, whoosh_ref, qs):
    from whoosh.qparser import MultifieldParser as WMFP

    from whoosh_spark.query.parser import MultifieldParser

    ix, wix = pair
    wq = WMFP(["name", "value"], wix.schema).parse(qs)
    with wix.searcher() as s:
        want = [(h.docnum, round(h.score, 9)) for h in s.search(wq, limit=10)]

    oq = MultifieldParser(["name", "value"], ix.schema).parse(qs)
    srch = Searcher(ix)
    got = [(r["doc_id"], round(r["score"], 9)) for r in srch.search(oq, limit=10).collect()]
    srch.clear_cache()
    assert got == want, f"{qs!r}: ours={oq!r} theirs={wq!r}\n{got}\n{want}"


SIMPLE_QUERIES = [
    "red town",
    "+red green",
    "red -town",
    '+yellow "red town"',
    "red AND town",  # operators are plain words in the simple parser
]


@pytest.mark.parametrize("qs", SIMPLE_QUERIES)
def test_simple_parser_matches_reference(pair, whoosh_ref, qs):
    from whoosh.qparser import SimpleParser as WSP

    from whoosh_spark.query.parser import SimpleParser

    ix, wix = pair
    wq = WSP("value", wix.schema).parse(qs)
    with wix.searcher() as s:
        want = [(h.docnum, round(h.score, 9)) for h in s.search(wq, limit=10)]

    oq = SimpleParser("value", ix.schema).parse(qs)
    srch = Searcher(ix)
    got = [(r["doc_id"], round(r["score"], 9)) for r in srch.search(oq, limit=10).collect()]
    srch.clear_cache()
    assert got == want, f"{qs!r}: ours={oq!r} theirs={wq!r}\n{got}\n{want}"


def _translate_ref_tree(wq):
    """Reference query tree -> our nodes (structure equivalence check)."""
    import whoosh.query as wquery

    import whoosh_spark.query as Q

    if isinstance(wq, wquery.Term):
        return Q.Term(wq.fieldname, wq.text, boost=wq.boost)
    if isinstance(wq, wquery.DisjunctionMax):
        return Q.DisjunctionMax([_translate_ref_tree(c) for c in wq.children()], boost=wq.boost)
    if isinstance(wq, wquery.Or):
        return Q.Or([_translate_ref_tree(c) for c in wq.children()], boost=wq.boost)
    if isinstance(wq, wquery.And):
        return Q.And([_translate_ref_tree(c) for c in wq.children()], boost=wq.boost)
    if isinstance(wq, wquery.AndNot):
        return Q.AndNot(_translate_ref_tree(wq.a), _translate_ref_tree(wq.b), boost=wq.boost)
    if isinstance(wq, wquery.AndMaybe):
        return Q.AndMaybe(_translate_ref_tree(wq.a), _translate_ref_tree(wq.b), boost=wq.boost)
    raise TypeError(type(wq))


@pytest.mark.parametrize("qs", ["red town", "+red uptown", "yellow -town"])
def test_dismax_parser_matches_reference(pair, whoosh_ref, qs):
    """The reference's own DisjunctionMaxMatcher smears scores across
    docnums when children exhaust unevenly (documented reference bug, see
    tests/test_fuzz_differential.py), so running its DisMaxParser output
    through its engine gives wrong scores. We therefore assert (1) our
    parser produces the SAME TREE as the reference DisMaxParser, and (2) our
    engine scores that tree per the correct max-of-children semantics built
    from the reference's own per-term scores."""
    from whoosh.qparser import DisMaxParser as WDMP
    from whoosh.query import Term as WTerm

    from whoosh_spark.query.parser import DisMaxParser

    ix, wix = pair
    boosts = {"name": 2.0, "value": 1.0}
    wq = WDMP(boosts, wix.schema).parse(qs)
    oq = DisMaxParser(boosts, ix.schema).parse(qs)
    assert oq == _translate_ref_tree(wq), f"{qs!r}: ours={oq!r} theirs={wq!r}"

    # correct-semantics oracle from reference per-term scores
    def term_scores(field, word, boost=1.0):
        with wix.searcher() as s:
            return {h.docnum: h.score * boost
                    for h in s.search(WTerm(field, word), limit=None)}

    def evaluate(q):
        import whoosh_spark.query as Q

        if isinstance(q, Q.Term):
            return term_scores(q.field, q.text, q.boost)
        if isinstance(q, Q.DisjunctionMax):
            out = {}
            for c in q.subqueries:
                for d, sc in evaluate(c).items():
                    out[d] = max(out.get(d, float("-inf")), sc)
            return out
        if isinstance(q, Q.Or):
            out = {}
            for c in q.subqueries:
                for d, sc in evaluate(c).items():
                    out[d] = out.get(d, 0.0) + sc
            return out
        if isinstance(q, Q.And):
            subs = [evaluate(c) for c in q.subqueries]
            docs = set(subs[0])
            for m in subs[1:]:
                docs &= set(m)
            return {d: sum(m[d] for m in subs) for d in docs}
        if isinstance(q, Q.AndNot):
            a, b = evaluate(q.a), evaluate(q.b)
            return {d: sc for d, sc in a.items() if d not in b}
        if isinstance(q, Q.AndMaybe):
            a, b = evaluate(q.a), evaluate(q.b)
            return {d: sc + b.get(d, 0.0) for d, sc in a.items()}
        raise TypeError(type(q))

    expected = evaluate(oq)
    want = sorted(
        ((d, round(sc, 9)) for d, sc in expected.items()),
        key=lambda t: (-t[1], t[0]),
    )[:10]
    srch = Searcher(ix)
    got = [(r["doc_id"], round(r["score"], 9)) for r in srch.search(oq, limit=10).collect()]
    srch.clear_cache()
    assert got == want, f"{qs!r}: ours={oq!r}\n{got}\n{want}"


def _run_pair(pair, wq, oq, limit=10):
    ix, wix = pair
    with wix.searcher() as s:
        want = [(h.docnum, h.score) for h in s.search(wq, limit=limit)]
    srch = Searcher(ix)
    got = [(r["doc_id"], r["score"]) for r in srch.search(oq, limit=limit).collect()]
    srch.clear_cache()
    assert [d for d, _ in got] == [d for d, _ in want], f"{got} != {want}"
    for (d1, s1), (_, s2) in zip(got, want):
        assert s1 == pytest.approx(s2, rel=1e-12), d1
    return got


def test_fieldalias_plugin_matches_reference(pair, whoosh_ref):
    from whoosh import qparser as wqp

    ix, wix = pair
    wp = wqp.QueryParser("value", wix.schema)
    wp.add_plugin(wqp.FieldAliasPlugin({"name": ("title", "caption")}))
    op = QueryParser("value", ix.schema,
                     fieldaliases={"name": ("title", "caption")})
    for qs in ["title:yellow", "red caption:uptown", "title:(yellow brown)"]:
        _run_pair(pair, wp.parse(qs), op.parse(qs))


@pytest.mark.parametrize("group", ["or", "andmaybe", "require", None])
def test_copyfield_plugin_matches_reference(pair, whoosh_ref, group):
    from whoosh import qparser as wqp
    from whoosh.qparser import syntax as wsyn

    wgroups = {"or": wsyn.OrGroup, "andmaybe": wsyn.AndMaybeGroup,
               "require": wsyn.RequireGroup, None: None}
    ix, wix = pair
    wp = wqp.QueryParser("value", wix.schema)
    wp.add_plugin(wqp.CopyFieldPlugin({"name": "value"}, wgroups[group]))
    op = QueryParser("value", ix.schema, copyfields={"name": "value"},
                     copyfield_group=group)
    for qs in ["red name:yellow", "name:uptown", "red (green OR name:town)"]:
        _run_pair(pair, wp.parse(qs), op.parse(qs))


def test_copyfield_mirror_and_default_field(pair, whoosh_ref):
    from whoosh import qparser as wqp

    ix, wix = pair
    # copy applies to the DEFAULT field too (fname = node.fieldname or
    # parser.fieldname), and mirror adds the reverse mapping
    wp = wqp.QueryParser("name", wix.schema)
    wp.add_plugin(wqp.CopyFieldPlugin({"name": "value"}, mirror=True))
    op = QueryParser("name", ix.schema, copyfields={"name": "value"},
                     copyfield_mirror=True)
    for qs in ["red", "value:town yellow"]:
        _run_pair(pair, wp.parse(qs), op.parse(qs))


def test_pseudofield_plugin_matches_reference(pair, whoosh_ref):
    from whoosh import qparser as wqp

    import whoosh_spark.query as Q

    ix, wix = pair

    def ref_rev(node):
        if node.has_text:
            n = wqp.WordNode(node.text[::-1])
            n.set_fieldname("value")
            return n

    wp = wqp.QueryParser("value", wix.schema)
    wp.add_plugin(wqp.PseudoFieldPlugin({"rev": ref_rev}))

    def our_rev(q):
        return Q.Term("value", q.text[::-1]) if isinstance(q, Q.Term) else q

    op = QueryParser("value", ix.schema, pseudofields={"rev": our_rev})
    for qs in ["rev:der", "yellow rev:nwot"]:
        _run_pair(pair, wp.parse(qs), op.parse(qs))


def test_function_plugin_matches_reference(pair, whoosh_ref):
    from whoosh import qparser as wqp
    from whoosh.query import FuzzyTerm as WFuzzy
    from whoosh.query.spans import SpanFirst as WSpanFirst

    import whoosh_spark.query as Q
    from whoosh_spark.query.spans import SpanFirst

    ix, wix = pair

    def w_first(qs):
        return WSpanFirst(qs[0])

    def w_fuzzy(qs, prefix=0, maxdist=2):
        return WFuzzy(qs[0].fieldname, qs[0].text, prefixlength=int(prefix),
                      maxdist=int(maxdist))

    wp = wqp.QueryParser("value", wix.schema)
    wp.add_plugin(wqp.FunctionPlugin({"first": w_first, "fuzzy": w_fuzzy}))

    def o_first(qs):
        return SpanFirst(qs[0])

    def o_fuzzy(qs, prefix=0, maxdist=2, boost=None):
        return Q.FuzzyTerm(qs[0].field, qs[0].text, prefixlength=int(prefix),
                           maxdist=int(maxdist))

    op = QueryParser("value", ix.schema,
                     functions={"first": o_first, "fuzzy": o_fuzzy})
    # structural parity for #first (the reference's own searcher cannot run
    # a bare SpanFirst: its estimate_size raises NotImplementedError; our
    # SpanFirst eval is diff-verified in tests/test_spans.py)
    wq = wp.parse("alfa #first(red) delta")
    oq = op.parse("alfa #first(red) delta")
    assert isinstance(wq[1], WSpanFirst) and isinstance(oq.subqueries[1], SpanFirst)
    assert wq[1].q.text == oq.subqueries[1].q.text == "red"
    # args/kwargs/boost plumbing + searchable result for #fuzzy
    for qs in ["#fuzzy[maxdist=2](bender) red", "#fuzzy[2](binder)",
               "yellow #fuzzy[maxdist=1](rod)"]:
        _run_pair(pair, wp.parse(qs), op.parse(qs))


def test_sequence_plugin_matches_reference(pair, whoosh_ref):
    from whoosh import qparser as wqp

    ix, wix = pair
    wp = wqp.QueryParser("value", wix.schema)
    wp.remove_plugin_class(wqp.plugins.PhrasePlugin)
    wp.add_plugin(wqp.FuzzyTermPlugin())
    wp.add_plugin(wqp.SequencePlugin())
    op = QueryParser("value", ix.schema, sequence=True, fuzzy=True)
    for qs in ['"red town"', 'yellow "red (green OR town)"',
               '"red rod~1 town"~2', 'green "red town']:
        _run_pair(pair, wp.parse(qs), op.parse(qs))


def test_dangling_not_and_stray_parens(whoosh_ref):
    """The reference's paren pass strips stray ')' BEFORE operators bind;
    dangling NOTs (no operand) are dropped. Tree-for-tree parity on the
    corner family (regression: 'NOT ) x' used to lose the NOT)."""
    from whoosh import fields as wfields
    from whoosh.qparser import QueryParser as WParser

    wp = WParser("text", wfields.Schema(text=wfields.TEXT()))
    p = QueryParser("text", IndexSchema.of(text=TEXT()))
    for q, want in [
        ("NOT ) bravo", "Not(Term('text', 'bravo'))"),
        ("NOT ) ) bravo", "Not(Term('text', 'bravo'))"),
        ("(alfa NOT) bravo", "And([Term('text', 'alfa'), Term('text', 'bravo')])"),
        ("alfa NOT", "Term('text', 'alfa')"),
        ("bravo NOT ( )", "Term('text', 'bravo')"),
        ("alfa NOT ) bravo", "And([Term('text', 'alfa'), Not(Term('text', 'bravo'))])"),
    ]:
        # reference tree agrees (sanity of the expectation itself)
        assert repr(wp.parse(q)).replace("u'", "'") == want, q
        assert repr(p.parse(q)) == want, q


def test_random_string_fuzz_matches_reference(spark, whoosh_ref, tmp_path):
    """Seeded random query-string fuzz: parse + search 80 strings built
    from terms/operators/parens/quotes/prefix/range pieces through BOTH
    engines on the same corpus; (docnum, score) lists must be identical.
    Strings where the REFERENCE itself raises are skipped (its parser
    crashes on e.g. 'NOT AND x' — no defined behavior to match)."""
    import random

    from whoosh import fields as wfields
    from whoosh.filedb.filestore import RamStorage
    from whoosh.qparser import QueryParser as WParser

    from whoosh_spark.index import Index, build_index
    from whoosh_spark.search import Searcher

    rng = random.Random(99)
    vocab = "alfa bravo charlie delta echo".split()
    docs = [" ".join(rng.choice(vocab) for _ in range(rng.randint(5, 15)))
            for _ in range(60)]
    wix = RamStorage().create_index(wfields.Schema(text=wfields.TEXT()))
    w = wix.writer()
    for t in docs:
        w.add_document(text=t)
    w.commit()
    d = str(tmp_path / "pfuzz")
    build_index(spark, spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(docs)]),
        IndexSchema.of(text=TEXT()), d, sha_col=None)
    s = Searcher(Index(spark, d))
    parser = QueryParser("text", IndexSchema.of(text=TEXT()))
    wparser = WParser("text", wix.schema)
    pieces = vocab + ['"alfa bravo"', "AND", "OR", "NOT", "(", ")", "alfa^2",
                      "br*", "text:charlie", "+delta", "-echo", "del?a",
                      "[alfa TO delta]", "'alfa'", "~2", ""]
    checked = 0
    for _ in range(80):
        q = " ".join(rng.choice(pieces) for _ in range(rng.randint(1, 5)))
        try:
            wq = wparser.parse(q)
            with wix.searcher() as ws:
                want = [(h.docnum, round(h.score, 6)) for h in ws.search(wq, limit=10)]
        except Exception:
            continue
        got = [(r["doc_id"], round(r["score"], 6))
               for r in s.search(parser.parse(q), limit=10).collect()]
        assert got == want, q
        checked += 1
    assert checked >= 60  # the skip path must stay the exception


def test_operator_edge_semantics_match_reference(whoosh_ref):
    """Tree-level parity on the operator edge cases the 35k-string fuzz
    campaign surfaced (scripts/parser_fuzz_campaign.py): operator words
    need the reference's whitespace context (plugins.py:922-928) else they
    are plain words; adjacent operators degenerate to implicit adjacency;
    a merging fold appends into a parenthesized group of the parser's
    group class, leaking its boost (syntax.py:608-636 + normalize
    flatten); words/phrases that analyze to nothing still OCCUPY operand
    slots (WordNode.query -> None vs Phrase([]) -> NullQuery,
    syntax.py:343-366); an unmatched open paren drops, splicing its
    contents flat; a double quote breaks a word only when a closing quote
    exists later (PhraseTagger pairs quotes left-to-right)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from ref_tree_convert import canon, convert

    from whoosh import fields as wfields
    from whoosh.qparser import QueryParser as WParser

    wp = WParser("text", wfields.Schema(text=wfields.TEXT()))
    p = QueryParser("text", IndexSchema.of(text=TEXT()))
    cases = [
        # operator whitespace context: danglers are words (stopword or term)
        "ANDMAYBE alfa^2 echo^0.5", " echo ANDMAYBE", "alfa ANDNOT",
        "ANDNOT alfa", "OR alfa", "alfa AND", "text:AND alfa",
        # adjacent operators degenerate to implicit And
        "delta ANDMAYBE OR alfa", "delta AND OR alfa", "alfa OR OR bravo",
        "delta AND OR ANDNOT alfa", "alfa OR bravo OR OR charlie OR delta",
        # fold order And > Or > binaries; left-to-right per type
        "alfa OR bravo AND charlie", "alfa OR bravo ANDNOT charlie",
        "alfa ANDMAYBE bravo AND charlie", "alfa ANDNOT bravo ANDNOT charlie",
        "alfa REQUIRE bravo ANDMAYBE charlie",
        # paren-group merge incl. the boost leak
        "(alfa bravo)^2 AND charlie", "(alfa bravo) AND charlie",
        " (bravo echo)^3  AND [alfa TO delta]", "charlie AND (alfa bravo)^2",
        # empty-word operands occupy slots; empty phrase is NullQuery
        "alfa ANDNOT the bravo", "alfa OR the bravo", "the ANDNOT alfa",
        "charlie ANDNOT ~2 +delta", '" " ANDMAYBE alfa ANDMAYBE bravo',
        "alfa AND : AND bravo", "delta : ANDNOT ^ ANDMAYBE *lfa",
        # dangling fieldname reverts to a word
        "text: alfa", "alfa ANDNOT text:", "text:",
        # unmatched open paren splices flat
        "alfa ( bravo OR charlie", "alfa ( OR bravo", "( alfa ( bravo )",
        "NOT ( alfa bravo", "NOT ( : ^ charlie~",
        # quote pairing breaks words left-to-right
        '" "alfa bravo" "alfa bravo"', 'a" b" c', 'bravo" alfa',
    ]
    checked = 0
    for qs in cases:
        try:
            want = canon(convert(wp.parse(qs)))
        except Exception:
            continue  # reference raises: no defined behavior
        assert canon(p.parse(qs)) == want, qs
        checked += 1
    assert checked >= 30
