"""Hit highlighting — replicates the reference pipeline
(/root/reference/src/whoosh/highlight.py): retokenize with char offsets,
mark matched terms, ContextFragmenter (maxchars/surround/charlimit state
machine, highlight.py:418-505), BasicFragmentScorer (score = matched boosts
x 100 x distinct terms, :598-607), top_fragments (:880-885), HtmlFormatter
(tagname="b", between="...", class "match termN", :750-820).

Driver-side ``highlight_text`` for single hits; ``add_highlights`` runs the
same code as an Arrow-batched UDF over a top-k DataFrame (post-top-k work
on k rows — never on the corpus).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from html import escape as htmlescape

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.pandas.functions import pandas_udf

from whoosh_spark.analysis import Analyzer, standard_analyzer

DEFAULT_CHARLIMIT = 2 ** 15


@dataclass
class _Tok:
    text: str
    startchar: int
    endchar: int
    matched: bool


@dataclass
class _Fragment:
    text: str
    matches: list
    startchar: int
    endchar: int

    @property
    def matched_terms(self):
        return {t.text for t in self.matches}

    def __len__(self):
        return self.endchar - self.startchar


def _char_tokens(text: str, analyzer: Analyzer, termset: frozenset):
    """Token stream with char offsets; stopped tokens kept (the reference
    highlights with removestops=False)."""
    pat = re.compile(analyzer.pattern)
    for m in pat.finditer(text):
        t = m.group(0)
        if analyzer.lowercase:
            t = t.lower()
        yield _Tok(t, m.start(), m.end(), t in termset)


def context_fragments(text: str, tokens, maxchars: int = 200, surround: int = 20,
                      charlimit: int = DEFAULT_CHARLIMIT):
    """Exact ContextFragmenter state machine (highlight.py:435-505)."""
    from collections import deque

    first = None
    firsts = deque()
    countdown = -1
    tks: list = []
    endchar = None
    currentlen = 0

    for t in tokens:
        startchar = t.startchar
        endchar = t.endchar
        tlength = endchar - startchar
        if charlimit and endchar > charlimit:
            break

        if countdown < 0 and not t.matched:
            firsts.append(startchar)
            while firsts and endchar - firsts[0] > surround:
                firsts.popleft()
        elif currentlen + tlength > maxchars:
            countdown = 0
        elif t.matched:
            countdown = surround
            if first is None:
                if firsts:
                    first = firsts[0]
                else:
                    first = startchar
                    countdown += surround
            tks.append(t)

        if countdown >= 0:
            currentlen += tlength
            countdown -= tlength
            if countdown <= 0:
                yield _mkfrag(text, tks, first, endchar)
                tks = []
                firsts = deque()
                first = None
                currentlen = 0

    if tks:
        yield _mkfrag(text, tks, first, endchar)


def sentence_fragments(text: str, tokens, maxchars: int = 200,
                       sentencechars: str = ".!?",
                       charlimit: int = DEFAULT_CHARLIMIT):
    """SentenceFragmenter semantics (reference highlight.py:343-417): a
    sentence ends when the char AFTER a token is in ``sentencechars``
    (runs of punctuation like "..." do not end it); sentences with matches
    and length <= maxchars are emitted, spanning first-token start to
    last-token end (trailing punctuation excluded). Use with an analyzer
    that keeps stop words (our retokenizer always does)."""
    sentenceset = frozenset(sentencechars)
    textlen = len(text)
    first = None
    tks: list = []
    endchar = None
    currentlen = 0

    for t in tokens:
        startchar = t.startchar
        endchar = t.endchar
        if charlimit and endchar > charlimit:
            break
        if first is None:
            first = startchar
            currentlen = 0
        currentlen += endchar - startchar
        if t.matched:
            tks.append(t)
        if endchar < textlen and text[endchar] in sentenceset:
            if endchar + 1 < textlen and text[endchar + 1] in sentenceset:
                continue  # "..." — not a sentence end
            if tks and currentlen <= maxchars:
                yield _mkfrag(text, tks, first, endchar)
            tks = []
            first = None
            currentlen = 0

    if tks:
        yield _mkfrag(text, tks, first, endchar)


def pinpoint_fragments(text: str, tokens, maxchars: int = 200, surround: int = 20,
                       autotrim: bool = False, charlimit: int = DEFAULT_CHARLIMIT):
    """PinpointFragmenter semantics (reference highlight.py:506-583): build
    fragments directly around runs of MATCHED tokens — greedily absorb the
    next match while it starts within ``surround`` of the current right
    edge and keeps the fragment under ``maxchars`` — then pad ``surround``
    chars of raw context either side. ``autotrim`` snaps the padded edges
    to word boundaries (first/last space) without cutting into a match.
    Non-retokenizing in the reference (Characters format offsets); our
    offsets come from the same retokenizer as the other fragmenters."""
    matched = [t for t in tokens if t.matched]
    j = -1
    for i, t in enumerate(matched):
        if j >= i:
            continue
        j = i
        left = t.startchar
        right = t.endchar
        if charlimit and right > charlimit:
            break
        currentlen = right - left
        while j < len(matched) - 1 and currentlen < maxchars:
            nxt = matched[j + 1]
            ec = nxt.endchar
            if ec - right <= surround and ec - left <= maxchars:
                j += 1
                right = ec
                currentlen += ec - nxt.startchar
            else:
                break
        left = max(0, left - surround)
        right = min(len(text), right + surround)
        frag = _Fragment(text, list(matched[i:j + 1]), left, right)
        if autotrim:
            _autotrim(frag)
        yield frag


def _autotrim(fragment: _Fragment) -> None:
    text = fragment.text
    startchar, endchar = fragment.startchar, fragment.endchar
    firstspace = text.find(" ", startchar, endchar)
    if firstspace > 0:
        startchar = firstspace + 1
    lastspace = text.rfind(" ", startchar, endchar)
    if lastspace > 0:
        endchar = lastspace
    if fragment.matches:
        startchar = min(startchar, fragment.matches[0].startchar)
        endchar = max(endchar, fragment.matches[-1].endchar)
    fragment.startchar = startchar
    fragment.endchar = endchar


def whole_fragment(text: str, tokens, charlimit: int = DEFAULT_CHARLIMIT):
    matches = [t for t in tokens if t.matched and (not charlimit or t.endchar <= charlimit)]
    yield _Fragment(text, matches, 0, len(text))


def _mkfrag(text, tokens, startchar, endchar):
    if startchar is None:
        startchar = tokens[0].startchar if tokens else 0
    if endchar is None:
        endchar = tokens[-1].endchar if tokens else len(text)
    return _Fragment(text, list(tokens), startchar, endchar)


def _basic_score(f: _Fragment) -> float:
    score = float(len(f.matches))  # boosts default 1.0
    score *= (len(f.matched_terms) * 100) or 1
    return score


class _PlainFormatter:
    """Base walk of reference Formatter.format_fragment (highlight.py:
    683-719): stitch unmatched text verbatim (no escaping) around
    format_token outputs, join fragments with ``between``."""

    def __init__(self, between="..."):
        self.between = between

    def format_token(self, text, token) -> str:
        raise NotImplementedError

    def format_fragment(self, fragment: _Fragment) -> str:
        output = []
        index = fragment.startchar
        text = fragment.text
        for t in fragment.matches:
            if t.startchar < index:
                continue
            if t.startchar > index:
                output.append(text[index:t.startchar])
            output.append(self.format_token(text, t))
            index = t.endchar
        output.append(text[index:fragment.endchar])
        return "".join(output)

    def format(self, fragments) -> str:
        return self.between.join(self.format_fragment(f) for f in fragments)


class NullFormatter(_PlainFormatter):
    """Reference NullFormatter (highlight.py:726-731): fragment text
    unchanged — useful for plain-text excerpts."""

    def format_token(self, text, token) -> str:
        return text[token.startchar:token.endchar]


class UppercaseFormatter(_PlainFormatter):
    """Reference UppercaseFormatter (highlight.py:734-747): matched terms
    uppercased in place."""

    def format_token(self, text, token) -> str:
        return text[token.startchar:token.endchar].upper()


class HtmlFormatter:
    template = '<%(tag)s class=%(q)s%(cls)s%(tn)s%(q)s>%(t)s</%(tag)s>'

    def __init__(self, tagname="b", between="...", classname="match",
                 termclass="term", maxclasses=5, attrquote='"'):
        self.tagname = tagname
        self.between = between
        self.maxclasses = maxclasses
        self.attrquote = attrquote
        self.htmlclass = " ".join((classname, termclass))
        self.seen: dict = {}

    def format_token(self, text, token):
        ttext = htmlescape(text[token.startchar:token.endchar], quote=False)
        if ttext in self.seen:
            termnum = self.seen[ttext]
        else:
            termnum = len(self.seen) % self.maxclasses
            self.seen[ttext] = termnum
        return self.template % {
            "tag": self.tagname, "q": self.attrquote, "cls": self.htmlclass,
            "t": ttext, "tn": termnum,
        }

    def format_fragment(self, fragment: _Fragment) -> str:
        output = []
        index = fragment.startchar
        text = fragment.text
        for t in fragment.matches:
            if t.startchar < index:
                continue
            if t.startchar > index:
                output.append(htmlescape(text[index:t.startchar], quote=False))
            output.append(self.format_token(text, t))
            index = t.endchar
        output.append(htmlescape(text[index:fragment.endchar], quote=False))
        return "".join(output)

    def format(self, fragments) -> str:
        return self.between.join(self.format_fragment(f) for f in fragments)


def highlight_text(text: str, terms, analyzer: Analyzer | None = None, top: int = 3,
                   maxchars: int = 200, surround: int = 20, minscore: float = 1,
                   fragmenter: str = "context", formatter: HtmlFormatter | None = None) -> str:
    analyzer = analyzer or standard_analyzer()
    termset = frozenset(terms)
    tokens = _char_tokens(text or "", analyzer, termset)
    if fragmenter == "context":
        frags = list(context_fragments(text or "", tokens, maxchars, surround))
    elif fragmenter == "sentence":
        frags = list(sentence_fragments(text or "", tokens, maxchars))
    elif fragmenter == "pinpoint":
        frags = list(pinpoint_fragments(text or "", tokens, maxchars, surround))
    elif fragmenter == "pinpoint_autotrim":
        frags = list(pinpoint_fragments(text or "", tokens, maxchars, surround,
                                        autotrim=True))
    else:
        frags = list(whole_fragment(text or "", tokens))
    # reference top_fragments uses nlargest on (score, fragment) tuples and
    # Fragment orders by startchar — score ties keep the LATEST fragments
    scored = sorted(((_basic_score(f), f.startchar, f) for f in frags),
                    key=lambda x: (-x[0], -x[1]))[:top]
    best = [f for s, _, f in scored if s >= minscore]
    best.sort(key=lambda f: f.startchar)  # FIRST order
    fmt = formatter or HtmlFormatter()
    return fmt.format(best)


def add_highlights_stored(top_df: DataFrame, ix, field: str, terms,
                          text_col: str, out_col: str = "highlights",
                          top: int = 3, maxchars: int = 200, surround: int = 20,
                          minscore: float = 1, autotrim: bool = False,
                          charlimit: int = DEFAULT_CHARLIMIT,
                          formatter=None) -> DataFrame:
    """Non-retokenizing "pinpoint" highlighting from STORED char offsets —
    the reference Highlighter's can_load_chars path (highlight.py:920-1036):
    when the field stores the Characters format and the fragmenter doesn't
    retokenize (PinpointFragmenter), matched-term char spans come straight
    from the index instead of re-running the analyzer over the stored text.

    Spark shape: the k top-doc ids broadcast into the char-postings scan
    (term IN-list + semi-join pushdown), spans collect per doc, and a
    pandas UDF over the K ROWS builds fragments — no corpus-wide work.
    Matches the reference per-hit flow: tokens sorted by startchar, same-
    startchar duplicates keep the longest (highlight.py:1029-1031), then
    PinpointFragmenter.fragment_matches."""
    terms = [str(t) for t in terms]
    cp = (
        ix.char_postings(field)
        .filter(F.col("term").isin(terms))
        .join(F.broadcast(top_df.select("doc_id").distinct()), on="doc_id")
        .select(
            "doc_id", "term",
            F.explode(F.arrays_zip(
                F.col("positions").cast("array<long>").alias("pos"),
                F.col("startchars").cast("array<long>").alias("sc"),
                F.col("endchars").cast("array<long>").alias("ec"),
            )).alias("z"),
        )
        .select("doc_id", "term", F.col("z.pos").alias("pos"),
                F.col("z.sc").alias("sc"), F.col("z.ec").alias("ec"))
    )
    spans = cp.groupBy("doc_id").agg(
        F.collect_list(F.struct("term", "pos", "sc", "ec")).alias("_spans")
    )
    joined = top_df.join(spans, on="doc_id", how="left")

    def _one(text, span_rows):
        # fresh formatter PER DOCUMENT: the reference shares one formatter
        # across hits, so its "termN" class numbers depend on the caller's
        # hit-iteration order — meaningless across distributed rows. Per-doc
        # numbering is the deterministic equivalent (identical to the
        # reference when each hit is highlighted from a fresh Results).
        fmt = formatter() if callable(formatter) else HtmlFormatter()
        if text is None or span_rows is None:
            return ""
        toks = []
        for r in span_rows:
            if charlimit and r["ec"] > charlimit:
                continue
            toks.append(_Tok(r["term"], int(r["sc"]), int(r["ec"]), True))
        toks.sort(key=lambda t: t.startchar)
        # same-startchar duplicates: keep the longest (reference :1029-1031)
        dedup = []
        for t in toks:
            if dedup and dedup[-1].startchar == t.startchar:
                if (t.endchar - t.startchar) > (dedup[-1].endchar - dedup[-1].startchar):
                    dedup[-1] = t
            else:
                dedup.append(t)
        frags = list(pinpoint_fragments(text, dedup, maxchars, surround,
                                        autotrim=autotrim, charlimit=charlimit))
        scored = sorted(((_basic_score(f), f.startchar, f) for f in frags),
                        key=lambda x: (-x[0], -x[1]))[:top]
        best = [f for s, _, f in scored if s >= minscore]
        best.sort(key=lambda f: f.startchar)
        return fmt.format(best)

    @pandas_udf("string")
    def hl(texts: pd.Series, span_lists: pd.Series) -> pd.Series:
        return pd.Series([_one(t, s) for t, s in zip(texts, span_lists)])

    return joined.withColumn(out_col, hl(F.col(text_col), F.col("_spans"))).drop("_spans")


def add_highlights(df: DataFrame, text_col: str, terms, analyzer: Analyzer | None = None,
                   out_col: str = "highlights", **kw) -> DataFrame:
    """Append a highlights column to a (top-k) DataFrame with stored text."""
    terms = list(terms)
    ana = analyzer or standard_analyzer()

    @pandas_udf("string")
    def hl(texts: pd.Series) -> pd.Series:
        return pd.Series([highlight_text(t, terms, ana, **kw) for t in texts])

    return df.withColumn(out_col, hl(F.col(text_col)))
