"""Adaptive driver-local top-k for SMALL candidate sets.

Spark's per-job overhead (~0.3-0.8s: scheduling, Python-worker hops, a
shuffle for top-k) dominates interactive single-query latency when the
query's posting lists are tiny. Like an AQE-style adaptive choice, the
Searcher routes a query driver-side when EVERY term's df (known job-free
from the prefetched stats / manifest) keeps the total postings under
``local_threshold``; otherwise the distributed DataFrame plan runs.

The local evaluator reads ONLY the query terms' posting blocks straight
from the segment Parquet files with pyarrow (row-group pruning on the
term-sorted files still applies — zero Spark jobs), decodes them with the
same numpy codec, and evaluates the query tree with the exact float-op
order of the DataFrame engine (score formula = scoring.score_py; And in
huffman order; Or left-fold in child order) so results are IDENTICAL —
asserted by tests/test_local_fastpath.py across random query trees.

At 100 TB this path simply never triggers for hot terms (df exceeds the
threshold) — the distributed plan remains the scale path.
"""

from __future__ import annotations

import os

import numpy as np

from whoosh_spark.index import codec
from whoosh_spark.index.quantize import BYTE_TO_LENGTH
from whoosh_spark.query import nodes as Q

LOCAL_THRESHOLD = 100_000  # max total postings for the driver-local path


def _collect_terms(q, plain: set, positional: set):
    if isinstance(q, Q.Term):
        plain.add((q.field, q.text))
    elif isinstance(q, Q.Phrase):
        for w in q.words:
            plain.add((q.field, w))
            positional.add((q.field, w))
    else:
        for c in q.children():
            _collect_terms(c, plain, positional)


_SUPPORTED = (Q.Term, Q.And, Q.Or, Q.DisjunctionMax, Q.Not, Q.AndNot,
              Q.Require, Q.AndMaybe, Q.Phrase, Q.ConstantScore, Q._NullQuery)


def _supported(q) -> bool:
    if isinstance(q, Q.Or) and (q.minmatch or q.scale is not None):
        return False
    if isinstance(q, Q.Phrase) and type(q) is not Q.Phrase:
        return _supported_children(q)  # Ordered subclass ok (same chain)
    if not isinstance(q, _SUPPORTED):
        return False
    return _supported_children(q)


def _supported_children(q) -> bool:
    return all(_supported(c) for c in q.children())


def _has_not(q) -> bool:
    if isinstance(q, Q.Not):
        return True
    return any(_has_not(c) for c in q.children())


def _first_parquet_file(path: str) -> str:
    """A Spark parquet 'file' is a directory of part files; pyarrow's
    read_schema needs one actual file."""
    if os.path.isdir(path):
        for name in sorted(os.listdir(path)):
            if name.endswith(".parquet"):
                return os.path.join(path, name)
    return path


class _LocalIndex:
    """Driver-side posting access for one query's term set."""

    def __init__(self, ix, plain, positional):
        import pyarrow.parquet as pq

        self.ix = ix
        self.postings: dict = {}   # (field, term) -> (ids, tfs, fls)
        self.positions: dict = {}  # (field, term) -> {doc_id: [pos]}
        by_field: dict = {}
        for f, t in plain | positional:
            by_field.setdefault(f, set()).add(t)
        deleted = self._deleted_ids()
        for field, terms in by_field.items():
            need_pos = {t for f, t in positional if f == field}
            cols = ["field", "term", "count", "ids", "tfs", "len_bytes",
                    "weights", "positions"]
            for seg in ix.manifest.segments:
                path = os.path.join(seg.path(ix.index_dir), "postings.parquet")
                # pre-weight-channel segments lack the weights column
                avail = set(pq.read_schema(_first_parquet_file(path)).names)
                tbl = pq.read_table(
                    path, columns=[c for c in cols if c in avail],
                    filters=[("field", "==", field), ("term", "in", list(terms))],
                )
                for row in tbl.to_pylist():
                    key = (field, row["term"])
                    n = int(row["count"])
                    ids = codec.delta_decode(row["ids"], n)
                    # tfs here are the scoring WEIGHTS: the token-boost sum
                    # when the block carries a weights payload, else tf
                    if row.get("weights") is not None:
                        tfs = np.frombuffer(row["weights"], dtype=np.float64)
                    else:
                        tfs = codec.varint_decode(row["tfs"], n)
                    lbs = np.frombuffer(row["len_bytes"], dtype=np.uint8)
                    if deleted is not None:
                        keep = ~np.isin(ids, deleted)
                        pos_lists = (codec.decode_position_lists(row["positions"], n)
                                     if row["term"] in need_pos else None)
                        ids, tfs, lbs = ids[keep], tfs[keep], lbs[keep]
                        if pos_lists is not None:
                            pos_lists = [p for p, k in zip(pos_lists, keep) if k]
                    else:
                        pos_lists = (codec.decode_position_lists(row["positions"], n)
                                     if row["term"] in need_pos else None)
                    fls = BYTE_TO_LENGTH[lbs].astype(np.float64)
                    cur = self.postings.get(key)
                    if cur is None:
                        self.postings[key] = [ids, tfs.astype(np.float64), fls]
                    else:
                        cur[0] = np.concatenate([cur[0], ids])
                        cur[1] = np.concatenate([cur[1], tfs.astype(np.float64)])
                        cur[2] = np.concatenate([cur[2], fls])
                    if pos_lists is not None:
                        d = self.positions.setdefault(key, {})
                        for did, pl in zip(ids, pos_lists):
                            d[int(did)] = list(map(int, pl))

    def _deleted_ids(self):
        paths = self.ix._delete_paths()
        if not paths:
            return None
        import pyarrow.parquet as pq

        ids = [pq.read_table(p, columns=["doc_id"])["doc_id"].to_numpy() for p in paths]
        return np.concatenate(ids) if ids else None


class LocalEvaluator:
    """Mirror of engine.py's _compile over python dicts {doc_id: score}."""

    def __init__(self, searcher, lix: _LocalIndex, stats: dict, stats_view):
        self.s = searcher
        self.lix = lix
        self.stats = stats
        self.stats_view = stats_view
        self._all_docs = None

    # ---- scored leaf ----

    def term_scores(self, field: str, term: str, boost: float = 1.0) -> dict:
        st = self.stats.get((field, term))
        if st is None:
            return {}
        entry = self.lix.postings.get((field, term))
        if entry is None:
            return {}
        ids, tfs, fls = entry
        w = self.s.weighting
        dc = self.s.index.doc_count_all()
        ftype = self.s.schema[field] if field in self.s.schema else None
        scorable = bool(ftype and ftype.scorable)
        fboost = float(ftype.field_boost) if ftype else 1.0
        idf = w.idf(dc, int(st["df"]))
        avgfl = self.s.index.avg_field_length(field) or 1.0
        B = w.field_B(field) if hasattr(w, "field_B") else 0.0
        out = {}
        if scorable and hasattr(w, "score_py"):
            for did, tf, fl in zip(ids, tfs, fls):
                sc = w.score_py(idf, tf * fboost, fl, avgfl, B)
                out[int(did)] = sc * boost if boost != 1.0 else sc
        else:
            for did, tf in zip(ids, tfs):
                sc = tf * fboost
                out[int(did)] = sc * boost if boost != 1.0 else sc
        return out

    # ---- tree evaluation (same orders as engine.py) ----

    def evaluate(self, q) -> dict:
        m, neg = self._eval(q)
        if neg:
            return self._complement(m)
        return m

    def _docs_universe(self) -> set:
        if self._all_docs is None:
            import pyarrow.parquet as pq

            ids = []
            for seg in self.s.index.manifest.segments:
                p = os.path.join(seg.path(self.s.index.index_dir), "docs.parquet")
                ids.append(pq.read_table(p, columns=["doc_id"])["doc_id"].to_numpy())
            universe = set(np.concatenate(ids).tolist()) if ids else set()
            deleted = self.lix._deleted_ids()
            if deleted is not None:
                universe -= set(deleted.tolist())
            self._all_docs = universe
        return self._all_docs

    def _complement(self, m: dict) -> dict:
        return {d: 1.0 for d in self._docs_universe() if d not in m}

    def _eval(self, q):
        if isinstance(q, Q._NullQuery):
            return {}, False
        if isinstance(q, Q.Term):
            return self.term_scores(q.field, q.text, q.boost), False
        if isinstance(q, Q.Not):
            m, neg = self._eval(q.query)
            if neg:
                m = self._complement(m)
            return m, True
        if isinstance(q, Q.ConstantScore):
            m, neg = self._eval(q.child)
            if neg:
                m = self._complement(m)
            out = {d: float(q.score) for d in m}
            return self._boost(out, q.boost), False
        if isinstance(q, Q.And):
            return self._eval_and(q), False
        if isinstance(q, Q.Or):
            return self._eval_or(q), False
        if isinstance(q, Q.DisjunctionMax):
            acc = None
            for c in q.subqueries:
                m = self.evaluate(c)
                if acc is None:
                    acc = dict(m)
                else:
                    for d, sc in m.items():
                        acc[d] = max(acc[d], sc) if d in acc else sc
            return self._boost(acc or {}, q.boost), False
        if isinstance(q, Q.AndNot):
            a = self.evaluate(q.a)
            b = self.evaluate(q.b)
            return self._boost({d: sc for d, sc in a.items() if d not in b}, q.boost), False
        if isinstance(q, Q.Require):
            a = self.evaluate(q.a)
            b = self.evaluate(q.b)
            return self._boost({d: sc for d, sc in a.items() if d in b}, q.boost), False
        if isinstance(q, Q.AndMaybe):
            a = self.evaluate(q.a)
            b = self.evaluate(q.b)
            return self._boost({d: sc + b[d] if d in b else sc for d, sc in a.items()}, q.boost), False
        if isinstance(q, Q.Phrase):
            return self._eval_phrase(q), False
        raise TypeError(type(q).__name__)

    @staticmethod
    def _boost(m: dict, boost: float) -> dict:
        if boost == 1.0:
            return m
        return {d: sc * boost for d, sc in m.items()}

    def _eval_and(self, q) -> dict:
        # huffman order by -estimate_size, matching engine._compile_and
        items = []
        seq = 0
        for c in q.subqueries:
            est = c.estimate_size(self.stats_view)
            items.append((float(0 - est), seq, self._eval(c)))
            seq += 1
        items.sort(key=lambda t: (t[0], t[1]))
        while len(items) > 1:
            wa, _, ca = items.pop(0)
            wb, _, cb = items.pop(0)
            merged = self._intersect(ca, cb)
            seq += 1
            entry = (wa + wb, seq, merged)
            lo = 0
            while lo < len(items) and items[lo][0] <= entry[0]:
                lo += 1
            items.insert(lo, entry)
        m, neg = items[0][2]
        if neg:
            m = self._complement(m)
        return self._boost(m, q.boost)

    def _intersect(self, a, b):
        (ma, na), (mb, nb) = a, b
        if na and nb:
            both = self._complement(ma).keys() & self._complement(mb).keys()
            return {d: 2.0 for d in both}, False
        if nb:
            return {d: sc + 1.0 for d, sc in ma.items() if d not in mb}, False
        if na:
            return {d: 1.0 + sc for d, sc in mb.items() if d not in ma}, False
        return {d: sa + mb[d] for d, sa in ma.items() if d in mb}, False

    def _eval_or(self, q) -> dict:
        acc = None
        for c in q.subqueries:
            m = self.evaluate(c)
            if acc is None:
                acc = dict(m)
            else:
                for d, sc in m.items():
                    acc[d] = acc[d] + sc if d in acc else sc
        return self._boost(acc or {}, q.boost)

    def _eval_phrase(self, q) -> dict:
        from whoosh_spark.search.engine import _span_near_chain

        for w in q.words:
            if (q.field, w) not in self.stats:
                return {}
        per_word = [self.lix.positions.get((q.field, w), {}) for w in q.words]
        docs = set(per_word[0])
        for pw in per_word[1:]:
            docs &= set(pw)
        matched = [
            d for d in docs
            if _span_near_chain([pw[d] for pw in per_word], q.slop, True, 1)
        ]
        # score: order-preserving binary tree sum (engine tree_score)
        scores = [self.term_scores(q.field, w) for w in q.words]

        def tree(lo, hi):
            if hi - lo == 1:
                return dict(scores[lo])
            half = (hi - lo) // 2
            l, r = tree(lo, lo + half), tree(lo + half, hi)
            return {d: l[d] + r[d] for d in l.keys() & r.keys()}

        total = tree(0, len(q.words))
        return self._boost({d: total[d] for d in matched if d in total}, q.boost)


class _NotLocal(Exception):
    pass


def _resolve_multiterms_local(q, searcher):
    """Expand multiterms against the driver-cached lexicon (zero jobs);
    raises _NotLocal when the field's lexicon isn't fully cached."""
    ix = searcher.index
    if isinstance(q, Q.MultiTerm):
        ix._maybe_prefetch_field(q.field)
        if q.field not in ix._complete_fields:
            raise _NotLocal
        terms = sorted(
            t for (f, t), row in ix._term_stats_cache.items()
            if f == q.field and row is not None and q.term_predicate(t)
        )
        if len(terms) > searcher.max_expansion:
            raise _NotLocal
        if not terms:
            return Q.NullQuery
        if len(terms) == 1:
            return Q.Term(q.field, terms[0], boost=q.boost)
        expanded = Q.Or([Q.Term(q.field, t) for t in terms])
        if q.constantscore:
            return Q.ConstantScore(expanded, 1.0)
        expanded.boost = q.boost
        return expanded
    if isinstance(q, Q.CompoundQuery):
        return q._rebuild([_resolve_multiterms_local(c, searcher) for c in q.subqueries])
    if isinstance(q, Q.Not):
        return Q.Not(_resolve_multiterms_local(q.query, searcher), boost=q.boost)
    if isinstance(q, Q.BinaryQuery):
        return type(q)(
            _resolve_multiterms_local(q.a, searcher),
            _resolve_multiterms_local(q.b, searcher), boost=q.boost,
        )
    if isinstance(q, Q.ConstantScore):
        return Q.ConstantScore(_resolve_multiterms_local(q.child, searcher), q.score, boost=q.boost)
    return q


def _contains_multiterm(q) -> bool:
    if isinstance(q, Q.MultiTerm):
        return True
    return any(_contains_multiterm(c) for c in q.children())


def try_local_search(searcher, q, limit: int):
    """None when the query isn't eligible; else the top-k rows
    [(doc_id, score)] computed entirely driver-side (no Spark jobs once
    the field stats are prefetched)."""
    if isinstance(q, Q.MultiTerm) or _contains_multiterm(q):
        try:
            q = _resolve_multiterms_local(q, searcher)
        except _NotLocal:
            return None
    if not _supported(q):
        return None
    ix = searcher.index
    if _has_not(q) and ix.doc_count_all() > getattr(searcher, "local_threshold", LOCAL_THRESHOLD):
        return None  # complements need the doc universe — distributed territory
    plain: set = set()
    positional: set = set()
    _collect_terms(q, plain, positional)
    if not plain:
        return None
    # stats (prefetched fields answer without a job)
    stats = {}
    for field in {f for f, _ in plain}:
        terms = [t for f, t in plain if f == field]
        for t, row in ix.term_stats(field, terms).items():
            stats[(field, t)] = row
    total_postings = sum(int(st["df"]) for st in stats.values() if st)
    if total_postings > getattr(searcher, "local_threshold", LOCAL_THRESHOLD):
        return None
    from whoosh_spark.search.engine import _Stats

    lix = _LocalIndex(ix, plain, positional)
    ev = LocalEvaluator(searcher, lix, stats, _Stats(stats, ix.doc_count_all()))
    try:
        m = ev.evaluate(q)
    except TypeError:
        return None
    rows = sorted(m.items(), key=lambda kv: (-kv[1], kv[0]))[:limit]
    return rows
