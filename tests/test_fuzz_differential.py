"""Seeded random query-tree fuzzing against an INDEPENDENT pure-python
evaluator (a third implementation: exact BM25 with quantized lengths over
raw token lists).

Why not fuzz against the reference engine directly? On dense posting lists
its composed matchers are demonstrably broken — all verified against the
python oracle during development, with our engine matching the oracle in
every case:

- duplicate subquery branches desynchronize shared posting cursors:
  Or([golf, golf^2]) under And DROPS higher-scoring docs at limit=k, and
  Require(x, x) crashes outright (matching/binary.py:474 a_id != b_id);
- nested AndNot/AndMaybe exclusion streams skip valid docs even at
  limit=None (a doc containing all required terms vanishes);
- Phrase under DisjunctionMax loses its positional filter and scores
  non-adjacent docs with the raw intersection score;
- DisjunctionMax with 3+ children assigns a doc's max-score to the
  PRECEDING docnum as well.

The targeted differential suites (test_search_differential, test_parser,
test_phrase_filter, test_sorting, test_spelling, test_classify,
test_highlight) pin reference parity on the shapes the reference computes
correctly; this fuzzer pins semantic correctness on arbitrary compositions.
"""

import math
import random

import pytest
from pyspark.sql import Row

import whoosh_spark.query as Q
from whoosh_spark.index import Index, build_index
from whoosh_spark.index.quantize import quantize_length
from whoosh_spark.schema import IndexSchema, TEXT
from whoosh_spark.search import Searcher
from whoosh_spark.search.engine import _span_near_chain

VOCAB = "alfa bravo charlie delta echo foxtrot golf hotel".split()
N_DOCS = 120
N_TREES = 45
K = 15


def _docs():
    rng = random.Random(4242)
    return [" ".join(rng.choice(VOCAB) for _ in range(rng.randint(8, 25))) for _ in range(N_DOCS)]


# --------------------------------------------------- pure-python evaluator

class PyOracle:
    def __init__(self, docs: list[str], B=0.75, K1=1.2):
        self.toks = [d.split() for d in docs]
        self.N = len(docs)
        self.lens = [len(t) for t in self.toks]
        self.avgfl = sum(self.lens) / self.N
        self.B, self.K1 = B, K1

    def bm25(self, term: str, i: int) -> float | None:
        w = self.toks[i].count(term)
        if w == 0:
            return None
        fl = quantize_length(self.lens[i])
        idf = math.log(self.N / (sum(1 for t in self.toks if term in t) + 1)) + 1
        return idf * ((w * (self.K1 + 1)) / (w + self.K1 * ((1 - self.B) + self.B * fl / self.avgfl)))

    def eval(self, q) -> dict[int, float]:
        if isinstance(q, Q.Term):
            out = {}
            for i in range(self.N):
                s = self.bm25(q.text, i)
                if s is not None:
                    out[i] = s * q.boost
            return out
        if isinstance(q, Q.And):
            parts = [(c, self.eval(c)) for c in q.subqueries if not isinstance(c, Q.Not)]
            nots = [self.eval(c.query) for c in q.subqueries if isinstance(c, Q.Not)]
            if not parts:
                return {}
            docs = set(parts[0][1])
            for _, p in parts[1:]:
                docs &= set(p)
            for n in nots:
                docs -= set(n)
            out = {d: sum(p[d] for _, p in parts) + 1.0 * len(nots) for d in docs}
            return {d: s * q.boost for d, s in out.items()}
        if isinstance(q, Q.Or):
            out: dict[int, float] = {}
            nmatch: dict[int, int] = {}
            for c in q.subqueries:
                for d, s in self.eval(c).items():
                    out[d] = out.get(d, 0.0) + s
                    nmatch[d] = nmatch.get(d, 0) + 1
            if q.minmatch:
                out = {d: s for d, s in out.items() if nmatch[d] >= q.minmatch}
            return {d: s * q.boost for d, s in out.items()}
        if isinstance(q, Q.DisjunctionMax):
            out = {}
            for c in q.subqueries:
                for d, s in self.eval(c).items():
                    out[d] = max(out.get(d, float("-inf")), s)
            return {d: s * q.boost for d, s in out.items()}
        if isinstance(q, Q.Not):
            inner = self.eval(q.query)
            return {d: 1.0 for d in range(self.N) if d not in inner}
        if isinstance(q, Q.AndNot):
            a, b = self.eval(q.a), self.eval(q.b)
            return {d: s * q.boost for d, s in a.items() if d not in b}
        if isinstance(q, Q.Require):
            a, b = self.eval(q.a), self.eval(q.b)
            return {d: s * q.boost for d, s in a.items() if d in b}
        if isinstance(q, Q.AndMaybe):
            a, b = self.eval(q.a), self.eval(q.b)
            return {d: (s + b.get(d, 0.0)) * q.boost for d, s in a.items()}
        if isinstance(q, Q.Every):
            return {d: 1.0 * q.boost for d in range(self.N)}
        if isinstance(q, Q.ConstantScore):
            return {d: q.score * q.boost for d in self.eval(q.child)}
        if isinstance(q, Q.Otherwise):
            a = self.eval(q.a)
            return ({d: s * q.boost for d, s in a.items()} if a
                    else {d: s * q.boost for d, s in self.eval(q.b).items()})
        if isinstance(q, Q.Phrase):
            word_scores = [self.eval(Q.Term(q.field, w)) for w in q.words]
            docs = set(word_scores[0])
            for ws in word_scores[1:]:
                docs &= set(ws)
            out = {}
            for d in docs:
                pls = [[j for j, x in enumerate(self.toks[d]) if x == w] for w in q.words]
                if _span_near_chain(pls, q.slop, True, 1):
                    out[d] = sum(ws[d] for ws in word_scores) * q.boost
            return out
        raise TypeError(type(q))


# ------------------------------------------------------------- generator

def _gen(rng: random.Random, depth: int = 0):
    if depth >= 2 or rng.random() < 0.4:
        return Q.Term("text", rng.choice(VOCAB), boost=rng.choice([1.0, 1.0, 2.0]))
    kind = rng.choice(["and", "or", "andnot", "andmaybe", "require", "dismax",
                       "not_in_and", "phrase", "constscore", "otherwise",
                       "every_in_and", "or_minmatch"])
    if kind == "constscore":
        return Q.ConstantScore(_gen(rng, depth + 1),
                               score=rng.choice([0.5, 1.0, 3.0]))
    if kind == "otherwise":
        # sometimes an empty-matching first branch so the fallback fires
        a = (Q.Phrase("text", ["alfa", "alfa", "alfa", "alfa"])
             if rng.random() < 0.5 else _gen(rng, depth + 1))
        return Q.Otherwise(a, _gen(rng, depth + 1))
    if kind == "every_in_and":
        return Q.And([Q.Every("text"), _gen(rng, depth + 1)])
    if kind == "or_minmatch":
        subs = [_gen(rng, depth + 1) for _ in range(rng.randint(3, 4))]
        return Q.Or(subs, minmatch=rng.randint(2, len(subs)))
    if kind in ("and", "or", "dismax"):
        subs = [_gen(rng, depth + 1) for _ in range(rng.randint(2, 4))]
        cls = {"and": Q.And, "or": Q.Or, "dismax": Q.DisjunctionMax}[kind]
        return cls(subs)
    if kind in ("andnot", "andmaybe", "require"):
        cls = {"andnot": Q.AndNot, "andmaybe": Q.AndMaybe, "require": Q.Require}[kind]
        return cls(_gen(rng, depth + 1), _gen(rng, depth + 1))
    if kind == "not_in_and":
        return Q.And([_gen(rng, depth + 1), Q.Not(_gen(rng, depth + 1))])
    words = [rng.choice(VOCAB) for _ in range(rng.randint(2, 3))]
    return Q.Phrase("text", words, slop=rng.choice([1, 1, 2]))


@pytest.fixture(scope="module")
def fuzz_ix(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fuzz"))
    docs = _docs()
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(docs)])
    build_index(spark, df, IndexSchema.of(text=TEXT()), d, sha_col=None)
    return Index(spark, d), PyOracle(docs)


@pytest.mark.parametrize("seed", range(N_TREES))
def test_random_tree_matches_python_oracle(fuzz_ix, seed):
    ix, oracle = fuzz_ix
    rng = random.Random(1000 + seed)
    q = _gen(rng)
    want_scores = oracle.eval(q)
    want = sorted(
        ((d, round(s, 9)) for d, s in want_scores.items()),
        key=lambda x: (-x[1], x[0]),
    )[:K]
    srch = Searcher(ix)
    got = [
        (r["doc_id"], round(r["score"], 9))
        for r in srch.search(q, limit=K).collect()
    ]
    srch.clear_cache()
    assert got == want, f"tree {q!r}\n{got}\n{want}"


def test_or_minmatch_same_on_both_scoring_paths(fuzz_ix):
    """Or(minmatch=m) means "matched by >= m children" on BOTH the exact
    join-tree path and the aggregation path (the reference's own minmatch
    is a documented no-op, compound.py:299 — we implement the documented
    semantics uniformly, like WeightingQuery)."""
    ix, oracle = fuzz_ix
    q = Q.Or([Q.Term("text", "alfa"), Q.Term("text", "bravo"),
              Q.Term("text", "charlie")], minmatch=2)
    want_scores = oracle.eval(q)
    want = sorted(((d, round(s, 9)) for d, s in want_scores.items()),
                  key=lambda x: (-x[1], x[0]))[:K]
    for exact in (True, False):
        srch = Searcher(ix, exact_scores=exact, use_local=False)
        got = [(r["doc_id"], round(r["score"], 9))
               for r in srch.search(q, limit=K).collect()]
        srch.clear_cache()
        assert got == want, f"exact_scores={exact}"
