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
order of the DataFrame engine (score formula = scoring.score_np, bit-equal
to score_py; And in huffman order; Or left-fold in child order) so results
are IDENTICAL — asserted by tests/test_local_fastpath.py across random
query trees.

Everything here is numpy-vectorized: match sets are (sorted unique doc_id
array, score array) pairs; per-doc combining uses intersect1d/isin indexed
arithmetic, which performs the same per-element IEEE ops as the old dict
fold did. Measured ~8x faster than the dict evaluator (r6), which moves
the local-vs-distributed crossover into the millions of postings — the
default threshold is sized from that measurement (see LOCAL_THRESHOLD).

At 100 TB this path simply never triggers for hot terms (df exceeds the
threshold) — the distributed plan remains the scale path.
"""

from __future__ import annotations

import os

import numpy as np

from whoosh_spark.index import codec
from whoosh_spark.index.quantize import BYTE_TO_LENGTH
from whoosh_spark.query import nodes as Q

#: Max total postings for the driver-local path. Crossover measurement
#: (BENCH/LOCAL_CROSSOVER.json, r6): the vectorized evaluator answers a
#: 1M-posting disjunction in ~0.1-0.2s wall on one core, while the
#: distributed plan's floor is ~0.7-1.5s of job scheduling at any size —
#: so 2M postings (~50 MB transient driver memory) is still ~5x under the
#: distributed floor. Env-overridable for clusters where the driver is
#: weak (set 0 to disable) or beefy.
LOCAL_THRESHOLD = int(os.environ.get("WHOOSH_SPARK_LOCAL_THRESHOLD", "2000000"))

_EMPTY_M = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))


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
    """Driver-side posting access for one query's term set.

    postings[(field, term)] -> (ids, weights, fls): doc-id-sorted arrays.
    positions[(field, term)] -> (pos_flat, pos_lens): ragged position
    lists aligned 1:1 with the postings arrays.
    """

    def __init__(self, ix, plain, positional):
        import pyarrow.parquet as pq

        self.ix = ix
        self.postings: dict = {}
        self.positions: dict = {}
        by_field: dict = {}
        for f, t in plain | positional:
            by_field.setdefault(f, set()).add(t)
        deleted = self._deleted_ids()
        # accumulate per-(field,term) block buffers across segments, then
        # batch-decode each term's blocks in one vectorized pass
        acc: dict = {}
        for field, terms in by_field.items():
            need_pos = {t for f, t in positional if f == field}
            cols = ["term", "count", "ids", "tfs", "len_bytes", "weights",
                    "positions"]
            for seg in ix.manifest.segments:
                path = os.path.join(seg.path(ix.index_dir), "postings.parquet")
                # pre-weight-channel segments lack the weights column
                avail = set(pq.read_schema(_first_parquet_file(path)).names)
                tbl = pq.read_table(
                    path, columns=[c for c in cols if c in avail],
                    filters=[("field", "==", field), ("term", "in", list(terms))],
                )
                nrows = tbl.num_rows
                if not nrows:
                    continue
                terms_l = tbl["term"].to_pylist()
                counts = tbl["count"].to_numpy()
                ids_l = tbl["ids"].to_pylist()
                tfs_l = tbl["tfs"].to_pylist()
                lbs_l = tbl["len_bytes"].to_pylist()
                ws_l = (tbl["weights"].to_pylist() if "weights" in avail
                        else [None] * nrows)
                pos_l = (tbl["positions"].to_pylist()
                         if "positions" in tbl.column_names else [None] * nrows)
                for i, t in enumerate(terms_l):
                    a = acc.setdefault((field, t), ([], [], [], [], [], []))
                    a[0].append(int(counts[i]))
                    a[1].append(ids_l[i])
                    a[2].append(tfs_l[i])
                    a[3].append(lbs_l[i])
                    a[4].append(ws_l[i])
                    a[5].append(pos_l[i] if t in need_pos else None)
        for key, (cnts, ids_b, tfs_b, lbs_b, ws_b, pos_b) in acc.items():
            counts = np.asarray(cnts, dtype=np.int64)
            n = int(counts.sum())
            ids = codec.delta_decode_concat(ids_b, counts)
            # weights: the scoring weight is the token-boost sum when a
            # block carries a weights payload, else tf
            if any(w is not None for w in ws_b):
                parts = []
                for w, tf_bin, c in zip(ws_b, tfs_b, counts):
                    if w is not None:
                        parts.append(np.frombuffer(w, dtype=np.float64))
                    else:
                        parts.append(
                            codec.varint_decode(tf_bin, int(c)).astype(np.float64))
                ws = np.concatenate(parts)
            else:
                ws = codec.varint_decode_concat(tfs_b, n).astype(np.float64)
            lbs = np.frombuffer(b"".join(lbs_b), dtype=np.uint8)
            pos_flat = pos_lens = None
            if any(p is not None for p in pos_b):
                pos_flat, pos_lens = codec.decode_position_lists_concat(
                    pos_b, counts)
            if deleted is not None and deleted.size:
                keep = ~np.isin(ids, deleted)
                if not keep.all():
                    if pos_flat is not None:
                        pos_flat = pos_flat[np.repeat(keep, pos_lens)]
                        pos_lens = pos_lens[keep]
                    ids, ws, lbs = ids[keep], ws[keep], lbs[keep]
            if ids.size > 1 and np.any(np.diff(ids) < 0):
                # multi-segment interleaved doc ranges: restore sorted order
                order = np.argsort(ids, kind="stable")
                if pos_flat is not None:
                    offs = np.concatenate(
                        ([0], np.cumsum(pos_lens))).astype(np.int64)
                    pos_flat = np.concatenate(
                        [pos_flat[offs[j]:offs[j + 1]] for j in order]
                    ) if pos_flat.size else pos_flat
                    pos_lens = pos_lens[order]
                ids, ws, lbs = ids[order], ws[order], lbs[order]
            fls = BYTE_TO_LENGTH[lbs].astype(np.float64)
            self.postings[key] = (ids, ws, fls)
            if pos_flat is not None:
                self.positions[key] = (pos_flat.astype(np.int64),
                                       pos_lens.astype(np.int64))

    def _deleted_ids(self):
        paths = self.ix._delete_paths()
        if not paths:
            return None
        import pyarrow.parquet as pq

        ids = [pq.read_table(p, columns=["doc_id"])["doc_id"].to_numpy() for p in paths]
        return np.concatenate(ids) if ids else None


class LocalEvaluator:
    """Mirror of engine.py's _compile over (sorted doc_id array, score
    array) match sets — per-doc float ops identical to the dict fold."""

    def __init__(self, searcher, lix: _LocalIndex, stats: dict, stats_view):
        self.s = searcher
        self.lix = lix
        self.stats = stats
        self.stats_view = stats_view
        self._all_docs = None

    # ---- scored leaf ----

    def term_scores(self, field: str, term: str, boost: float = 1.0):
        st = self.stats.get((field, term))
        if st is None:
            return _EMPTY_M
        entry = self.lix.postings.get((field, term))
        if entry is None:
            return _EMPTY_M
        ids, ws, fls = entry
        w = self.s.weighting
        dc = self.s.index.doc_count_all()
        ftype = self.s.schema[field] if field in self.s.schema else None
        scorable = bool(ftype and ftype.scorable)
        fboost = float(ftype.field_boost) if ftype else 1.0
        idf = w.idf(dc, int(st["df"]))
        avgfl = self.s.index.avg_field_length(field) or 1.0
        B = w.field_B(field) if hasattr(w, "field_B") else 0.0
        if scorable and hasattr(w, "score_np"):
            sc = w.score_np(idf, ws * fboost, fls, avgfl, B)
        elif scorable and hasattr(w, "score_py"):
            wb = ws * fboost
            sc = np.array(
                [w.score_py(idf, wi, fl, avgfl, B) for wi, fl in zip(wb, fls)],
                dtype=np.float64,
            )
        else:
            sc = ws * fboost
        if boost != 1.0:
            sc = sc * boost
        return ids, sc

    # ---- tree evaluation (same orders as engine.py) ----

    def evaluate(self, q):
        m, neg = self._eval(q)
        if neg:
            return self._complement(m)
        return m

    def _docs_universe(self) -> np.ndarray:
        if self._all_docs is None:
            import pyarrow.parquet as pq

            ids = []
            for seg in self.s.index.manifest.segments:
                p = os.path.join(seg.path(self.s.index.index_dir), "docs.parquet")
                ids.append(pq.read_table(p, columns=["doc_id"])["doc_id"].to_numpy())
            universe = (np.unique(np.concatenate(ids)) if ids
                        else np.empty(0, dtype=np.int64))
            deleted = self.lix._deleted_ids()
            if deleted is not None:
                universe = np.setdiff1d(universe, deleted, assume_unique=False)
            self._all_docs = universe.astype(np.int64)
        return self._all_docs

    def _complement(self, m):
        ids = np.setdiff1d(self._docs_universe(), m[0], assume_unique=True)
        return ids, np.ones(ids.size, dtype=np.float64)

    def _eval(self, q):
        if isinstance(q, Q._NullQuery):
            return _EMPTY_M, False
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
            out = (m[0], np.full(m[0].size, float(q.score), dtype=np.float64))
            return self._boost(out, q.boost), False
        if isinstance(q, Q.And):
            return self._eval_and(q), False
        if isinstance(q, Q.Or):
            return self._eval_or(q), False
        if isinstance(q, Q.DisjunctionMax):
            acc = None
            for c in q.subqueries:
                ids, sc = self.evaluate(c)
                if acc is None:
                    acc = (ids, sc.copy())
                else:
                    acc = self._union_combine(acc, (ids, sc), np.maximum)
            return self._boost(acc or _EMPTY_M, q.boost), False
        if isinstance(q, Q.AndNot):
            a = self.evaluate(q.a)
            b = self.evaluate(q.b)
            keep = ~np.isin(a[0], b[0], assume_unique=True)
            return self._boost((a[0][keep], a[1][keep]), q.boost), False
        if isinstance(q, Q.Require):
            a = self.evaluate(q.a)
            b = self.evaluate(q.b)
            keep = np.isin(a[0], b[0], assume_unique=True)
            return self._boost((a[0][keep], a[1][keep]), q.boost), False
        if isinstance(q, Q.AndMaybe):
            a = self.evaluate(q.a)
            b = self.evaluate(q.b)
            _, ia, ib = np.intersect1d(a[0], b[0], assume_unique=True,
                                       return_indices=True)
            sc = a[1].copy()
            sc[ia] = a[1][ia] + b[1][ib]
            return self._boost((a[0], sc), q.boost), False
        if isinstance(q, Q.Phrase):
            return self._eval_phrase(q), False
        raise TypeError(type(q).__name__)

    @staticmethod
    def _boost(m, boost: float):
        if boost == 1.0:
            return m
        return m[0], m[1] * boost

    def _eval_and(self, q):
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
            ca, cb = self._complement(ma), self._complement(mb)
            both = np.intersect1d(ca[0], cb[0], assume_unique=True)
            return (both, np.full(both.size, 2.0, dtype=np.float64)), False
        if nb:
            keep = ~np.isin(ma[0], mb[0], assume_unique=True)
            return (ma[0][keep], ma[1][keep] + 1.0), False
        if na:
            keep = ~np.isin(mb[0], ma[0], assume_unique=True)
            return (mb[0][keep], 1.0 + mb[1][keep]), False
        common, ia, ib = np.intersect1d(ma[0], mb[0], assume_unique=True,
                                        return_indices=True)
        return (common, ma[1][ia] + mb[1][ib]), False

    @staticmethod
    def _union_combine(acc, m, combine):
        """acc (owned) U m, combining scores of common docs with
        ``combine(acc_score, m_score)`` — acc + child order, like the dict
        fold. Both sides sorted unique; result sorted unique."""
        acc_ids, acc_sc = acc
        m_ids, m_sc = m
        if not m_ids.size:
            return acc
        if not acc_ids.size:
            return m_ids, m_sc.copy()
        _, ia, ib = np.intersect1d(acc_ids, m_ids, assume_unique=True,
                                   return_indices=True)
        acc_sc[ia] = combine(acc_sc[ia], m_sc[ib])
        mask = np.ones(m_ids.size, dtype=bool)
        mask[ib] = False
        if mask.any():
            acc_ids = np.concatenate([acc_ids, m_ids[mask]])
            acc_sc = np.concatenate([acc_sc, m_sc[mask]])
            order = np.argsort(acc_ids, kind="stable")
            acc_ids, acc_sc = acc_ids[order], acc_sc[order]
        return acc_ids, acc_sc

    def _eval_or(self, q):
        acc = None
        for c in q.subqueries:
            ids, sc = self.evaluate(c)
            if acc is None:
                acc = (ids, sc.copy())
            else:
                acc = self._union_combine(acc, (ids, sc), np.add)
        return self._boost(acc or _EMPTY_M, q.boost)

    def _positions_of(self, field: str, word: str):
        """(ids, pos_flat, pos_offsets) for one positional term, or None."""
        entry = self.lix.postings.get((field, word))
        pos = self.lix.positions.get((field, word))
        if entry is None or pos is None:
            return None
        ids = entry[0]
        pos_flat, pos_lens = pos
        offs = np.concatenate(([0], np.cumsum(pos_lens))).astype(np.int64)
        return ids, pos_flat, offs

    @staticmethod
    def _gather_ragged(flat, offs, idx):
        """Concatenate flat[offs[i]:offs[i+1]] for i in idx, plus the
        per-i group index of every gathered element."""
        lens = (offs[idx + 1] - offs[idx]).astype(np.int64)
        total = int(lens.sum())
        if total == 0:
            return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
        starts = np.repeat(offs[idx], lens)
        gstart = np.concatenate(([0], np.cumsum(lens)[:-1]))
        within = np.arange(total, dtype=np.int64) - np.repeat(gstart, lens)
        take = starts + within
        group = np.repeat(np.arange(idx.size, dtype=np.int64), lens)
        return flat[take], group

    def _eval_phrase(self, q):
        from whoosh_spark.search.engine import _span_near_chain

        for w in q.words:
            if (q.field, w) not in self.stats:
                return _EMPTY_M
        per_word = [self._positions_of(q.field, w) for w in q.words]
        if any(p is None for p in per_word):
            return _EMPTY_M
        docs = per_word[0][0]
        for pw in per_word[1:]:
            docs = np.intersect1d(docs, pw[0], assume_unique=True)
        if docs.size == 0:
            matched = docs
        elif q.slop == 1 and len(q.words) > 1:
            # ordered adjacency: exists p in pos0 with p+i in pos_i for all
            # following words (same degenerate form the engine uses; the
            # pairwise chain with slop=1/mindist=1 forces b == a_end + 1).
            # Vectorized via (candidate_index << 32 | position) keys.
            KEY = np.int64(1) << np.int64(32)
            keys = []
            for ids, flat, offs in per_word:
                idx = np.searchsorted(ids, docs)
                pvals, group = self._gather_ragged(flat, offs, idx)
                keys.append(group * KEY + pvals)
            survivors = keys[0]
            for i in range(1, len(keys)):
                survivors = survivors[np.isin(survivors + np.int64(i), keys[i])]
            matched = docs[np.unique(survivors // KEY)] if survivors.size else \
                np.empty(0, dtype=np.int64)
        elif len(q.words) == 1:
            matched = docs
        else:
            idxs = [np.searchsorted(pw[0], docs) for pw in per_word]
            out = []
            for j in range(docs.size):
                poslists = [
                    pw[1][pw[2][idxs[k][j]]:pw[2][idxs[k][j] + 1]].tolist()
                    for k, pw in enumerate(per_word)
                ]
                if _span_near_chain(poslists, q.slop, True, 1):
                    out.append(docs[j])
            matched = np.asarray(out, dtype=np.int64)

        # score: order-preserving binary tree sum (engine tree_score)
        def tree(lo, hi):
            if hi - lo == 1:
                ids, sc = self.term_scores(q.field, q.words[lo])
                return ids, sc
            half = (hi - lo) // 2
            (li, ls), (ri, rs) = tree(lo, lo + half), tree(lo + half, hi)
            common, ia, ib = np.intersect1d(li, ri, assume_unique=True,
                                            return_indices=True)
            return common, ls[ia] + rs[ib]

        tids, tsc = tree(0, len(q.words))
        keep = np.isin(tids, matched, assume_unique=True)
        return self._boost((tids[keep], tsc[keep]), q.boost)


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
    threshold = getattr(searcher, "local_threshold", LOCAL_THRESHOLD)
    total_postings = sum(int(st["df"]) for st in stats.values() if st)
    if total_postings > threshold:
        return None
    # positional terms additionally pay per OCCURRENCE (ragged position
    # decode + the adjacency key join), measured ~5x cheaper per element
    # than a posting but far more numerous — budget them separately
    # (2.5M-doc calibration: 6.6M effective = 0.44s local, well under the
    # ~2s distributed floor; 33M effective = 23s, clearly past it)
    pos_occ = sum(
        int(st["df"]) + int(st["total_tf"])
        for (f, t), st in stats.items()
        if st is not None and (f, t) in positional
    )
    if pos_occ > 5 * threshold:
        return None
    from whoosh_spark.search.engine import _Stats

    lix = _LocalIndex(ix, plain, positional)
    ev = LocalEvaluator(searcher, lix, stats, _Stats(stats, ix.doc_count_all()))
    try:
        ids, sc = ev.evaluate(q)
    except TypeError:
        return None
    order = np.lexsort((ids, -sc))
    if limit is not None:
        order = order[:limit]
    return [(int(ids[i]), float(sc[i])) for i in order]
