"""Driver-side Results / Hit / ResultsPage wrappers — the reference's
user-facing result API (/root/reference/src/whoosh/searching.py:934-1652)
over the engine's DataFrame top-k.

Scale note: the distributed engine surface stays `Searcher.search(...) ->
DataFrame`; these wrappers are the small-result convenience layer a
reference user expects.  Construction collects only the already-bounded
top-k (one job).  `len(results)` (total matches beyond the limit) and
`docs()` run one extra distributed count/collect, lazily, exactly like the
reference defers to its collector.  Stored fields for the page are fetched
in ONE doc-pruned join, not per-hit.
"""

from __future__ import annotations

from math import ceil

from pyspark.sql import functions as F


def _field_terms(q, field: str, out: set) -> None:
    """Collect Term texts for ``field`` from a query tree (reference
    Query.existing_terms flavor used by highlighting)."""
    from whoosh_spark.query import nodes as Q

    if isinstance(q, Q.Term) and q.field == field:
        out.add(q.text)
    for c in q.children():
        _field_terms(c, field, out)


class NoTermsException(Exception):
    """Raised when hit.matched_terms() is called on a search that did not
    record terms (reference searching.py:26-34)."""

    message = "Results were created without recording terms"


class Results:
    """Ranked top-k as a list-like of :class:`Hit` (reference Results,
    searching.py:934-1346).  ``top_n`` is the reference's list of
    ``(score, docnum)`` tuples in rank order."""

    def __init__(self, searcher, q, top_n, limit=None):
        self.searcher = searcher
        self.q = q
        self.top_n = list(top_n)
        self.limit = limit
        self.docset = None
        self._total = None
        self._stored = None  # docnum -> stored-field dict for current top_n
        # exact when the limit wasn't reached (everything matched is here)
        if limit is None or len(self.top_n) < limit:
            self._total = len(self.top_n)

    # ------------------------------------------------------------- basics

    def __repr__(self):
        return "<Top %s Results for %r>" % (len(self.top_n), self.q)

    def __len__(self):
        """TOTAL number of matching documents (may exceed the scored page,
        reference searching.py:972-989).  Lazily runs one distributed
        count when the search was limit-truncated."""
        if self._total is None:
            self._total = self.searcher.matches(self.q).count()
        return self._total

    def __getitem__(self, n):
        if isinstance(n, slice):
            start, stop, step = n.indices(len(self.top_n))
            return [Hit(self, self.top_n[i][1], i, self.top_n[i][0])
                    for i in range(start, stop, step)]
        if n >= len(self.top_n):
            raise IndexError(
                "results[%r]: Results only has %s hits" % (n, len(self.top_n)))
        return Hit(self, self.top_n[n][1], n, self.top_n[n][0])

    def __iter__(self):
        for i in range(len(self.top_n)):
            yield Hit(self, self.top_n[i][1], i, self.top_n[i][0])

    def __contains__(self, docnum):
        return docnum in self.docs()

    def __bool__(self):
        return not self.is_empty()

    def is_empty(self):
        return self.scored_length() == 0

    def scored_length(self):
        return len(self.top_n)

    def has_exact_length(self):
        return self._total is not None

    def estimated_length(self):
        """Upper-bound hit estimate from term statistics without running
        the unscored count (reference searching.py:1110-1130 delegates to
        q.estimate_size); exact when the exact total is already known."""
        if self._total is not None:
            return self._total
        from collections import defaultdict

        from whoosh_spark.search.engine import _Stats

        by_field = defaultdict(set)
        for f, t in self.q.all_terms():
            by_field[f].add(t)
        stats = {}
        ix = self.searcher.index
        for f, ts in by_field.items():
            for t, row in ix.term_stats(f, sorted(ts)).items():
                stats[(f, t)] = row
        try:
            est = int(self.q.estimate_size(_Stats(stats, ix.doc_count_all())))
        except NotImplementedError:
            return len(self)
        return min(est, ix.doc_count_all())

    def estimated_min_length(self):
        # the scored hits are a true lower bound (reference
        # estimate_min_size flavor)
        return self.scored_length()

    def items(self):
        """(docnum, score) pairs in rank order."""
        return ((docnum, score) for score, docnum in self.top_n)

    def facet_names(self) -> list[str]:
        """Names of the facets this search was grouped by (reference
        searching.py:1042-1048)."""
        return sorted(getattr(self, "_groups", {}) or {})

    def groups(self, name: str | None = None) -> dict:
        """Facet value -> ranked doc ids, for a search run with
        ``groupedby=`` (reference Results.groups, searching.py:1050-1069;
        name optional when only one facet was used)."""
        gs = getattr(self, "_groups", None)
        if not gs:
            raise KeyError("results were not grouped (pass groupedby=)")
        if name is None:
            if len(gs) == 1:
                return next(iter(gs.values()))
            raise KeyError(f"multiple facets {sorted(gs)}; pass a name")
        return gs[name]

    def query_terms(self, expand: bool = False, fieldname: str | None = None) -> set:
        """The query's terms that exist in the index (reference
        searching.py:1176-1178; ``expand`` is accepted for signature
        parity — multiterm expansion happens in the engine)."""
        out = self.q.existing_terms(self.searcher.index)
        if fieldname is not None:
            out = {(f, t) for f, t in out if f == fieldname}
        return out

    # ---- matched terms (search_results(terms=True); reference
    # searching.py:1071-1090 + TermsCollector) ----

    def has_matched_terms(self) -> bool:
        return getattr(self, "_termlists", None) is not None

    def matched_terms(self) -> set:
        """Union of (fieldname, text) pairs that matched in any hit."""
        if not self.has_matched_terms():
            raise NoTermsException
        out = set()
        for terms in self._termlists.values():
            out.update(terms)
        return out

    def score(self, n):
        return self.top_n[n][0]

    def docnum(self, n):
        return self.top_n[n][1]

    def docs(self):
        """Set of ALL matching doc ids (reference searching.py:1140-1147).
        One distributed collect when the page was limit-truncated."""
        if self.docset is None:
            if self._total is not None and self._total == len(self.top_n):
                self.docset = {d for _, d in self.top_n}
            else:
                rows = self.searcher.matches(self.q).select("doc_id").collect()
                self.docset = {r["doc_id"] for r in rows}
        return self.docset

    def copy(self):
        r = Results(self.searcher, self.q, list(self.top_n), self.limit)
        r.docset = set(self.docset) if self.docset is not None else None
        r._total = self._total
        return r

    # ------------------------------------------------------ stored fields

    def _stored_map(self):
        """Stored fields for the current top_n, fetched with one doc-pruned
        scan (NOT one lookup per hit)."""
        ids = [int(d) for _, d in self.top_n]
        if self._stored is None or not set(ids) <= set(self._stored):
            if not ids:
                self._stored = {}
            else:
                docs = self.searcher.index.docs()
                rows = docs.filter(F.col("doc_id").isin(ids)).collect()
                self._stored = {r["doc_id"]: r.asDict() for r in rows}
        return self._stored

    def fields(self, n):
        """Stored fields of the n-th ranked document."""
        return dict(self._stored_map().get(self.top_n[n][1], {}))

    # -------------------------------------------------------- combinators
    # list surgery identical to the reference (searching.py:1277-1346)

    def extend(self, results):
        docs = self.docs()
        for item in results.top_n:
            if item[1] not in docs:
                self.top_n.append(item)
        self.docset = docs | results.docs()
        self._total = len(self.docset)
        self._stored = None

    def filter(self, results):
        if not len(results):
            return
        otherdocs = results.docs()
        self.top_n = [item for item in self.top_n if item[1] in otherdocs]
        self.docset = self.docs() & otherdocs

    def upgrade(self, results, reverse=False):
        if not len(results):
            return
        otherdocs = results.docs()
        arein = [item for item in self.top_n if item[1] in otherdocs]
        notin = [item for item in self.top_n if item[1] not in otherdocs]
        self.top_n = notin + arein if reverse else arein + notin

    def upgrade_and_extend(self, results):
        if not len(results):
            return
        docs = self.docs()
        otherdocs = results.docs()
        arein = [item for item in self.top_n if item[1] in otherdocs]
        notin = [item for item in self.top_n if item[1] not in otherdocs]
        other = [item for item in results.top_n if item[1] not in docs]
        self.docset = docs | otherdocs
        self.top_n = arein + notin + other
        self._stored = None

    # ---------------------------------------------------------- analysis

    def key_terms(self, fieldname, docs=10, numterms=5, model="bo1",
                  normalize=True):
        """Most important terms of the top ``docs`` documents (reference
        searching.py:1243-1268); returns [(term, weight), ...]."""
        if not self.top_n:
            return []
        from whoosh_spark.search.classify import key_terms as _key_terms

        ids = [d for _, d in self.top_n[:docs]]
        return _key_terms(self.searcher, fieldname, ids, numterms=numterms,
                          model=model)


class Hit:
    """One ranked result; acts as a read-only dict of the document's stored
    fields (reference Hit, searching.py:1348-1540)."""

    def __init__(self, results, docnum, pos=None, score=None):
        self.results = results
        self.searcher = results.searcher
        self.pos = self.rank = pos
        self.docnum = docnum
        self.score = score

    def fields(self):
        return dict(self.results._stored_map().get(self.docnum, {}))

    def matched_terms(self) -> set:
        """(fieldname, text) pairs of query terms this hit contains; needs
        search_results(terms=True) (reference searching.py:1393-1414)."""
        if not self.results.has_matched_terms():
            raise NoTermsException
        return set(self.results._termlists.get(self.docnum, set()))

    def __repr__(self):
        return "<%s %r>" % (self.__class__.__name__, self.fields())

    def __eq__(self, other):
        if isinstance(other, Hit):
            return self.fields() == other.fields()
        if isinstance(other, dict):
            return self.fields() == other
        return False

    def __len__(self):
        return len(self.fields())

    def __iter__(self):
        return iter(self.fields().keys())

    def __getitem__(self, fieldname):
        f = self.fields()
        if fieldname in f:
            return f[fieldname]
        raise KeyError(fieldname)

    def __contains__(self, key):
        return key in self.fields()

    def items(self):
        return list(self.fields().items())

    def keys(self):
        return list(self.fields().keys())

    def values(self):
        return list(self.fields().values())

    def get(self, key, default=None):
        return self.fields().get(key, default)

    def __setitem__(self, key, value):
        raise NotImplementedError("You cannot modify a search result")

    def __delitem__(self, key):
        raise NotImplementedError("You cannot modify a search result")

    def highlights(self, fieldname, text=None, top=3, minscore=1,
                   maxchars=200, surround=20, fragmenter="context",
                   formatter=None):
        """Highlighted snippets from the given field (reference
        searching.py:1446-1480); ``text`` overrides the stored value."""
        from whoosh_spark.search.highlight import highlight_text

        if text is None:
            text = self.fields().get(fieldname, "")
        terms: set = set()
        _field_terms(self.results.q, fieldname, terms)
        schema = self.searcher.schema
        analyzer = (schema[fieldname].analyzer
                    if fieldname in schema else None)
        return highlight_text(text, terms, analyzer=analyzer, top=top,
                              maxchars=maxchars, surround=surround,
                              minscore=minscore, fragmenter=fragmenter,
                              formatter=formatter)

    def more_like_this(self, fieldname, text=None, top=10, numterms=5,
                       model="bo1"):
        """Documents similar to this hit (reference searching.py:1484-1516)."""
        from whoosh_spark.search.classify import more_like

        if text is None:
            text = self.fields().get(fieldname, "")
        return more_like(self.searcher, fieldname, text, limit=top,
                         numterms=numterms, model=model)


class ResultsPage:
    """One page of a longer result list (reference ResultsPage,
    searching.py:1553-1652), with the same clamped-pagenum / short-last-page
    semantics."""

    def __init__(self, results, pagenum, pagelen=10):
        self.results = results
        self.total = len(results)
        if pagenum < 1:
            raise ValueError("pagenum must be >= 1")
        self.pagecount = int(ceil(self.total / pagelen))
        self.pagenum = min(self.pagecount, pagenum)
        offset = (self.pagenum - 1) * pagelen
        if (offset + pagelen) > self.total:
            pagelen = self.total - offset
        self.offset = offset
        self.pagelen = pagelen

    def __getitem__(self, n):
        offset = self.offset
        if isinstance(n, slice):
            start, stop, step = n.indices(self.pagelen)
            return self.results[start + offset:stop + offset:step]
        return self.results[n + offset]

    def __iter__(self):
        return iter(self.results[self.offset:self.offset + self.pagelen])

    def __len__(self):
        return self.total

    def scored_length(self):
        return self.results.scored_length()

    def score(self, n):
        return self.results.score(n + self.offset)

    def docnum(self, n):
        return self.results.docnum(n + self.offset)

    def is_last_page(self):
        return self.pagecount == 0 or self.pagenum == self.pagecount
