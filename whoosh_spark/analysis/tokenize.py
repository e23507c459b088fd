"""Whoosh-compatible analyzer chain, Arrow-batched for Spark.

Reproduces the exact token stream of the reference chain
``RegexTokenizer() | LowercaseFilter() | StopFilter()``:

- token pattern ``\\w+(\\.?\\w+)*`` (reference:
  /root/reference/src/whoosh/analysis/tokenizers.py:33)
- lowercase after tokenizing (analysis/filters.py:215-227)
- stop filter drops tokens shorter than ``minsize`` (default 2), longer than
  ``maxsize``, or in the stop set; surviving tokens are *renumbered* so that
  the first kept token retains its original position and each later kept
  token gets ``first_kept_pos + i`` (analysis/filters.py:296-320 semantics)
- field length = number of kept tokens; per-term weight = tf (token boosts
  default to 1.0, formats.py:162-263 semantics)

The Spark surface is :func:`Analyzer.tokens_udf` — a pandas UDF mapping a
string column to ``struct<terms: array<struct<term,tf,positions>>, length>``
so one Arrow batch crosses the JVM/Python boundary per ~10k docs.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

# Identical *values* to the reference default English stop set
# (analysis/filters.py:41-45) — required data for behavioral parity.
STOP_WORDS = frozenset(
    "a an and are as at be by can for from have if in is it may not of on or "
    "tbd that the this to us we when will with yet you your".split()
)

DEFAULT_PATTERN = r"\w+(\.?\w+)*"

_PAT_CACHE: dict = {}


def _compiled(pattern: str):
    rx = _PAT_CACHE.get(pattern)
    if rx is None:
        rx = _PAT_CACHE[pattern] = re.compile(pattern)
    return rx

TOKEN_STRUCT = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("tf", T.IntegerType()),
        T.StructField("positions", T.ArrayType(T.IntegerType())),
    ]
)
ANALYSIS_STRUCT = T.StructType(
    [
        T.StructField("terms", T.ArrayType(TOKEN_STRUCT)),
        T.StructField("length", T.IntegerType()),
    ]
)


@dataclass(frozen=True)
class Analyzer:
    """Serializable analyzer config; the UDF closure captures only this."""

    pattern: str = DEFAULT_PATTERN
    lowercase: bool = True
    stopwords: frozenset = field(default_factory=lambda: STOP_WORDS)
    minsize: int = 2
    maxsize: int | None = None
    use_stopfilter: bool = True
    #: (min, max) char n-gram sizes; None = normal tokenization
    ngram: tuple | None = None
    #: n-grams within regex words (NGRAMWORDS) vs over the raw text (NGRAM)
    ngram_words: bool = False
    #: Porter-stem kept tokens (reference StemFilter, analysis/morph.py:35-149;
    #: applied after the stop filter, like StemmingAnalyzer's chain order)
    stem: bool = False
    #: Snowball language stemmer code ("da"|"no"|"sv"|"de") — the reference
    #: StemFilter(lang=...) (morph.py stemfn path); applied where `stem`
    #: would be, mutually exclusive with it
    lang_stem: str | None = None
    #: alternative stem algorithm name — the reference's
    #: StemFilter(stemfn=...) plug point with one of the bundled
    #: non-Porter/non-Snowball stemmers: "lovins" | "paicehusk" | "isri"
    #: (each diff-tested vs the reference whoosh.lang module)
    alt_stem: str | None = None
    #: IntraWordFilter options (delims, splitwords, splitnums, mergewords,
    #: mergenums) — None disables. Runs BEFORE lowercasing, like the
    #: reference chain order (analysis/analyzers.py FancyAnalyzer).
    intraword: tuple | None = None
    #: CharsetFilter(accent_map) accent folding (after lowercase)
    accent_fold: bool = False
    #: SubstitutionFilter steps ((regex, replacement), ...)
    substitutions: tuple = ()
    #: ReverseTextFilter
    reverse: bool = False
    #: PathTokenizer mode: "/a/b/c" -> "/a", "/a/b", "/a/b/c" (reference
    #: analysis/tokenizers.py:320-337); pattern matches path components
    path_mode: bool = False
    #: CompoundWordFilter: break tokens that segment into dictionary words
    #: (reference intraword.py:36-99); runs before lowercasing
    compound_words: frozenset | None = None
    compound_keep: bool = True
    #: ShingleFilter/BiWordFilter: (size, sep) merges adjacent kept tokens
    #: (reference intraword.py:102-222); runs LAST
    shingle: tuple | None = None
    #: StripFilter (reference filters.py:230-237): text.strip() per token;
    #: applied right after tokenizing
    strip: bool = False
    #: CharsetTokenizer (reference tokenizers.py:187-290): replaces the
    #: regex tokenizer with a translate-and-split scan; value is the
    #: hashable form from charsets.charmap_key (ordinal -> replacement,
    #: absent = token break). Faithfully keeps the reference quirk that the
    #: FINAL token (at end of string) is emitted UNTRANSLATED.
    charmap: tuple | None = None
    #: DoubleMetaphoneFilter (reference analysis/morph.py:219-281):
    #: (primary_boost, secondary_boost, combine). Each token becomes
    #: [original if combine] + primary code (boost x primary_boost) +
    #: secondary code (boost x secondary_boost), all at the token's
    #: position. Runs LAST (it is the reference's is_morph end-of-chain
    #: filter). The boosts flow into posting weights like delimited_boost.
    dmetaphone: tuple | None = None
    #: DelimitedAttributeFilter(delimiter, attribute="boost", type=float)
    #: (reference filters.py:375-436): token text after the delimiter is the
    #: token's boost; the boost flows into the posting WEIGHT (reference
    #: Frequency format sums token boosts, formats.py:162-263). Applied
    #: right after tokenizing. Only 1:1-or-drop chains are supported
    #: (no ngram/intraword/compound/shingle/tee), enforced at build time.
    delimited_boost: str | None = None
    #: TeeFilter (reference filters.py:147-198): tuple of branch Analyzers;
    #: tokens are tokenized ONCE by this analyzer's tokenizer, then each
    #: branch's post-tokenize chain runs on a copy and the branch outputs
    #: are interleaved round-robin (next() round-robin over branch
    #: generators, exhausted branches skipped — reference semantics). The
    #: outer analyzer's own post-chain then continues on the merged stream.
    tee: tuple | None = None

    # ---- driver-side (query analysis, tests) ----

    def _pat(self):
        return _compiled(self.pattern)

    def raw_tokens(self, text: str) -> list[str]:
        toks = [m.group(0) for m in self._pat().finditer(text)]
        if self.lowercase:
            toks = [t.lower() for t in toks]
        return toks

    def _ngram_tokens(self, text: str) -> list[tuple[str, int]]:
        """(gram, pos) streams matching the reference NgramTokenizer /
        NgramFilter (analysis/ngrams.py:37-221): char mode slides over the
        raw text (pos = start offset); word mode emits grams per regex word
        (grams inherit the word position)."""
        lo, hi = self.ngram
        out = []
        if self.ngram_words:
            pat = re.compile(self.pattern)
            for wpos, m in enumerate(pat.finditer(text)):
                w = m.group(0).lower() if self.lowercase else m.group(0)
                for start in range(len(w) - lo + 1):
                    for size in range(lo, hi + 1):
                        if start + size <= len(w):
                            out.append((w[start:start + size], wpos))
        else:
            t = text.lower() if self.lowercase else text
            for start in range(len(t) - lo + 1):
                for size in range(lo, hi + 1):
                    if start + size <= len(t):
                        out.append((t[start:start + size], start))
        return out

    def _charmap_tokens(self, text: str) -> list[tuple[str, int]]:
        """CharsetTokenizer scan (reference tokenizers.py:256-290): chars
        mapping to a replacement accumulate into the token (translated);
        unmapped chars break tokens. Reference quirk kept bit-for-bit: the
        final token, when the text does not end on a break char, is the RAW
        text slice (tokenizers.py:283 uses value[startchar:currentchar])."""
        cm = _charmap_dict(self.charmap)
        out: list[tuple[str, int]] = []
        buf = ""
        pos = 0
        startchar = 0
        current = 0
        for ch in text:
            t = cm.get(ord(ch))
            if t:
                buf += t
            else:
                if current > startchar:
                    out.append((buf, pos))
                    pos += 1
                startchar = current + 1
                buf = ""
            current += 1
        if current > startchar:
            out.append((text[startchar:current], pos))
        return out

    def _tokenize(self, text: str) -> list[tuple[str, int]]:
        if self.charmap is not None:
            pairs = self._charmap_tokens(text)
        elif self.path_mode:
            pairs = [(text[: m.end()], i) for i, m in enumerate(self._pat().finditer(text))]
        else:
            pairs = [(m.group(0), i) for i, m in enumerate(self._pat().finditer(text))]
        if self.strip:
            pairs = [(t.strip(), p) for t, p in pairs]
        return pairs

    def tokens(self, text: str) -> list[tuple[str, int]]:
        """Kept (term, position) pairs — the ONE pipeline shared by query
        analysis, the Spark analyzer UDF, and the index-build kernels:

        tokenize [-> strip] [-> tee] -> intraword -> lowercase ->
        accent_fold -> substitutions -> reverse -> stop (with the reference
        renumbering quirk) -> stem -> shingle
        """
        if self.ngram is not None:
            return self._ngram_tokens(text)
        pairs = self._tokenize(text)
        if self.tee is not None:
            pairs = _interleave([b._post_pairs(pairs) for b in self.tee])
        return self._post_pairs(pairs)

    def _post_pairs(self, pairs: list[tuple[str, int]]) -> list[tuple[str, int]]:
        """The post-tokenize chain; tee branches run this on shared input."""
        if self.delimited_boost is not None:
            # term side only; tokens_boosts() carries the boost values
            d = self.delimited_boost
            pairs = [(t.split(d, 1)[0] if d in t else t, p) for t, p in pairs]
        if self.intraword is not None:
            from whoosh_spark.analysis.intraword import intraword_pairs

            pairs = intraword_pairs(pairs, *self.intraword)
        if self.compound_words is not None:
            pairs = _compound_pairs(pairs, self.compound_words, self.compound_keep)
        if self.lowercase:
            pairs = [(t.lower(), p) for t, p in pairs]
        if self.accent_fold:
            from whoosh_spark.analysis.intraword import fold_accents

            pairs = [(fold_accents(t), p) for t, p in pairs]
        for pat, repl in self.substitutions:
            rx = _compiled(pat)
            pairs = [(rx.sub(repl, t), p) for t, p in pairs]
        if self.reverse:
            pairs = [(t[::-1], p) for t, p in pairs]
        if self.use_stopfilter:
            kept = []
            first_pos = None
            for t, pos in pairs:
                if len(t) >= self.minsize and (self.maxsize is None or len(t) <= self.maxsize) and t not in self.stopwords:
                    if first_pos is None:
                        first_pos = pos
                    kept.append((t, first_pos + len(kept)))
        else:
            kept = pairs
        stem_fn = self._stem_fn()
        if stem_fn is not None:
            kept = [(stem_fn(t), pos) for t, pos in kept]
        if self.shingle is not None:
            kept = _shingle_pairs(kept, *self.shingle)
        if self.dmetaphone is not None:
            kept = [(t, p) for t, p, _ in
                    _dmetaphone_triples(((t, p, 1.0) for t, p in kept), *self.dmetaphone)]
        return kept

    def tokens_boosts(self, text: str) -> list[tuple[str, int, float]]:
        """(term, position, boost) triples for delimited_boost analyzers —
        same kept terms/positions as tokens() (tested invariant), plus the
        per-token boost. Restricted to 1:1-or-drop chains: tokenize ->
        strip -> boost split -> lowercase -> fold -> substitutions ->
        reverse -> stop -> stem. Like the reference filter, a non-numeric
        suffix after the delimiter raises ValueError."""
        if (self.ngram is not None or self.intraword is not None
                or self.compound_words is not None or self.shingle is not None
                or self.tee is not None):
            raise ValueError(
                "delimited_boost requires a 1:1-or-drop analyzer chain "
                "(no ngram/intraword/compound/shingle/tee)"
            )
        d = self.delimited_boost
        triples: list[tuple[str, int, float]] = []
        for t, p in self._tokenize(text):
            if d is not None and d in t:
                t, _, suffix = t.partition(d)
                triples.append((t, p, float(suffix)))
            else:
                triples.append((t, p, 1.0))
        if self.lowercase:
            triples = [(t.lower(), p, b) for t, p, b in triples]
        if self.accent_fold:
            from whoosh_spark.analysis.intraword import fold_accents

            triples = [(fold_accents(t), p, b) for t, p, b in triples]
        for pat, repl in self.substitutions:
            rx = _compiled(pat)
            triples = [(rx.sub(repl, t), p, b) for t, p, b in triples]
        if self.reverse:
            triples = [(t[::-1], p, b) for t, p, b in triples]
        if self.use_stopfilter:
            kept = []
            first_pos = None
            for t, pos, b in triples:
                if len(t) >= self.minsize and (self.maxsize is None or len(t) <= self.maxsize) and t not in self.stopwords:
                    if first_pos is None:
                        first_pos = pos
                    kept.append((t, first_pos + len(kept), b))
        else:
            kept = triples
        stem_fn = self._stem_fn()
        if stem_fn is not None:
            kept = [(stem_fn(t), pos, b) for t, pos, b in kept]
        if self.dmetaphone is not None:
            kept = _dmetaphone_triples(kept, *self.dmetaphone)
        return kept

    def doc_kernel_boost(self):
        """Build-side kernel for delimited_boost fields:
        ``text -> ({term: (positions, weight_sum)}, field_length)``."""
        tokens_boosts = self.tokens_boosts

        def kern(text):
            kept = tokens_boosts(text)
            agg: dict[str, tuple[list[int], float]] = {}
            for term, pos, boost in kept:
                cur = agg.get(term)
                if cur is None:
                    agg[term] = ([pos], boost)
                else:
                    cur[0].append(pos)
                    agg[term] = (cur[0], cur[1] + boost)
            return agg, len(kept)

        return kern

    def tokens_chars(self, text: str) -> list[tuple[str, int, int, int, float]]:
        """(term, position, startchar, endchar, boost) — the token stream
        for PositionBoosts/CharacterBoosts-format fields (reference
        formats.py:339-481 word_values with positions+chars+boosts=True).

        Char offsets are the tokenizer match span in the ORIGINAL text;
        like the reference chain, later text-rewriting filters (stem,
        substitutions, lowercase, fold) do NOT move them — only
        DelimitedAttributeFilter trims ``endchar`` past the delimiter
        (filters.py:429-431). Restricted to 1:1-or-drop chains; token-
        multiplying filters (ngram/intraword/compound/shingle/tee/
        dmetaphone/path/charmap) raise."""
        if (self.ngram is not None or self.intraword is not None
                or self.compound_words is not None or self.shingle is not None
                or self.tee is not None or self.dmetaphone is not None
                or self.path_mode or self.charmap is not None):
            raise ValueError(
                "character/position-boost formats require a 1:1-or-drop "
                "analyzer chain (no ngram/intraword/compound/shingle/tee/"
                "dmetaphone/path/charmap)"
            )
        d = self.delimited_boost
        toks: list[tuple[str, int, int, int, float]] = []
        for pos, m in enumerate(self._pat().finditer(text)):
            t = m.group(0)
            sc, ec = m.start(), m.end()
            if d is not None and d in t:
                t, _, suffix = t.partition(d)
                ec -= len(d) + len(suffix)
                toks.append((t, pos, sc, ec, float(suffix)))
            else:
                toks.append((t, pos, sc, ec, 1.0))
        if self.strip:
            # reference StripFilter strips text but leaves chars untouched
            toks = [(t.strip(), p, sc, ec, b) for t, p, sc, ec, b in toks]
        if self.lowercase:
            toks = [(t.lower(), p, sc, ec, b) for t, p, sc, ec, b in toks]
        if self.accent_fold:
            from whoosh_spark.analysis.intraword import fold_accents

            toks = [(fold_accents(t), p, sc, ec, b) for t, p, sc, ec, b in toks]
        for pat, repl in self.substitutions:
            rx = _compiled(pat)
            toks = [(rx.sub(repl, t), p, sc, ec, b) for t, p, sc, ec, b in toks]
        if self.reverse:
            toks = [(t[::-1], p, sc, ec, b) for t, p, sc, ec, b in toks]
        if self.use_stopfilter:
            kept = []
            first_pos = None
            for t, pos, sc, ec, b in toks:
                if len(t) >= self.minsize and (self.maxsize is None or len(t) <= self.maxsize) and t not in self.stopwords:
                    if first_pos is None:
                        first_pos = pos
                    kept.append((t, first_pos + len(kept), sc, ec, b))
        else:
            kept = toks
        stem_fn = self._stem_fn()
        if stem_fn is not None:
            kept = [(stem_fn(t), p, sc, ec, b) for t, p, sc, ec, b in kept]
        return kept

    def doc_kernel_chars(self):
        """Build-side kernel for chars/pos_boosts-format fields:
        ``text -> ({term: (positions, startchars, endchars, boosts)},
        field_length)`` — per-OCCURRENCE parallel arrays (reference
        PositionBoosts/CharacterBoosts word_values aggregation)."""
        tokens_chars = self.tokens_chars

        def kern(text):
            kept = tokens_chars(text)
            agg: dict[str, tuple[list[int], list[int], list[int], list[float]]] = {}
            for term, pos, sc, ec, boost in kept:
                cur = agg.get(term)
                if cur is None:
                    agg[term] = ([pos], [sc], [ec], [boost])
                else:
                    cur[0].append(pos)
                    cur[1].append(sc)
                    cur[2].append(ec)
                    cur[3].append(boost)
            return agg, len(kept)

        return kern

    def _stem_fn(self):
        """The morph function: Porter (stem=True) or a Snowball language
        stemmer (lang_stem=code); None when the chain is unmorphic."""
        if self.stem:
            from whoosh_spark.analysis.morph import porter_stem

            return porter_stem
        if self.lang_stem is not None:
            from whoosh_spark.analysis.snowball import stemmer_for

            return stemmer_for(self.lang_stem)
        if self.alt_stem is not None:
            if self.alt_stem == "lovins":
                from whoosh_spark.analysis.lovins import stem as fn
            elif self.alt_stem == "paicehusk":
                from whoosh_spark.analysis.paicehusk import stem as fn
            elif self.alt_stem == "isri":
                from whoosh_spark.analysis.isri import stem as fn
            else:
                raise ValueError(f"unknown alt_stem {self.alt_stem!r}")
            return fn
        return None

    def _is_simple(self) -> bool:
        """True when the chain is tokenize->lower->stop->stem only — the fused
        fast paths below then skip the intermediate (term, pos) list."""
        return (self.ngram is None and self.intraword is None
                and self.compound_words is None and self.shingle is None
                and not self.path_mode and not self.accent_fold
                and not self.substitutions and not self.reverse
                and not self.strip and self.charmap is None
                and self.tee is None and self.delimited_boost is None
                and self.dmetaphone is None)

    def kept_count(self, text: str) -> int:
        """Field length (number of kept tokens) without materializing the
        token list — the lengths-table pass is a full corpus tokenize, so
        this fast path matters for build throughput."""
        if not self._is_simple():
            return len(self.tokens(text))
        pat = self._pat()
        if not self.use_stopfilter:
            return sum(1 for _ in pat.finditer(text))
        minsize, maxsize, stops = self.minsize, self.maxsize, self.stopwords
        lower = self.lowercase
        k = 0
        for m in pat.finditer(text):
            t = m.group(0)
            if lower:
                t = t.lower()
            if len(t) >= minsize and (maxsize is None or len(t) <= maxsize) and t not in stops:
                k += 1
        return k

    def query_terms(self, text: str) -> list[str]:
        return [t for t, _ in self.tokens(text)]

    def single_text(self, text: str) -> str:
        """The reference's get_single_text(field, text, tokenize=False,
        removestops=False) (qparser/common.py + analysis tokenize=False):
        the whole string passes through the filter chain as ONE token —
        lowercase/fold/substitute/reverse/stem apply, stop words are kept —
        used for range endpoints (syntax.py RangeNode.query:486-491).
        charmap/tee don't apply: CharsetTokenizer's tokenize=False mode
        yields the raw value, and TeeFilter branches are index-side."""
        pairs = [(text.strip() if self.strip else text, 0)]
        if self.intraword is not None:
            from whoosh_spark.analysis.intraword import intraword_pairs

            pairs = intraword_pairs(pairs, *self.intraword)
        if self.compound_words is not None:
            pairs = _compound_pairs(pairs, self.compound_words, self.compound_keep)
        if self.lowercase:
            pairs = [(t.lower(), p) for t, p in pairs]
        if self.accent_fold:
            from whoosh_spark.analysis.intraword import fold_accents

            pairs = [(fold_accents(t), p) for t, p in pairs]
        for pat, repl in self.substitutions:
            rx = _compiled(pat)
            pairs = [(rx.sub(repl, t), p) for t, p in pairs]
        if self.reverse:
            pairs = [(t[::-1], p) for t, p in pairs]
        stem_fn = self._stem_fn()
        if stem_fn is not None:
            pairs = [(stem_fn(t), p) for t, p in pairs]
        return pairs[0][0] if pairs else text

    def doc_kernel(self):
        """A prebound callable ``text -> ({term: positions}, field_length)``
        — the index build's hot loop. The simple chain (tokenize -> lower ->
        stop -> stem) gets a fused closure with zero per-doc attribute
        lookups; other chains go through tokens()."""
        if not self._is_simple():
            tokens = self.tokens

            def general(text):
                kept = tokens(text)
                agg: dict[str, list[int]] = {}
                for term, pos in kept:
                    agg.setdefault(term, []).append(pos)
                return agg, len(kept)

            return general

        pat = self._pat()
        finditer = pat.finditer
        lower = self.lowercase
        stem_fn = self._stem_fn()
        if self.use_stopfilter:
            minsize, maxsize, stops = self.minsize, self.maxsize, self.stopwords

            def fused_stop(text):
                agg: dict[str, list[int]] = {}
                first = None
                k = 0
                for pos, m in enumerate(finditer(text)):
                    t = m.group(0)
                    if lower:
                        t = t.lower()
                    if len(t) >= minsize and (maxsize is None or len(t) <= maxsize) and t not in stops:
                        if first is None:
                            first = pos
                        if stem_fn is not None:
                            t = stem_fn(t)
                        agg.setdefault(t, []).append(first + k)
                        k += 1
                return agg, k

            return fused_stop

        def fused(text):
            agg: dict[str, list[int]] = {}
            k = 0
            for pos, m in enumerate(finditer(text)):
                t = m.group(0)
                if lower:
                    t = t.lower()
                if stem_fn is not None:
                    t = stem_fn(t)
                agg.setdefault(t, []).append(pos)
                k = pos + 1
            return agg, k

        return fused

    def analyze_doc(self, text: str) -> tuple[list[tuple[str, int, list[int]]], int]:
        """Per-doc aggregation: [(term, tf, positions)], field_length."""
        agg, k = self.doc_kernel()(text or "")
        return [(t, len(ps), ps) for t, ps in agg.items()], k

    # ---- Spark-side ----

    def tokens_udf(self):
        cfg = self  # plain dataclass — cheap to pickle into the UDF

        @pandas_udf(ANALYSIS_STRUCT)
        def analyze(texts: pd.Series) -> pd.DataFrame:
            out_terms = []
            out_len = []
            for text in texts:
                terms, n = cfg.analyze_doc(text or "")
                out_terms.append(terms)
                out_len.append(n)
            return pd.DataFrame({"terms": out_terms, "length": out_len})

        return analyze

    def apply(self, df, text_col: str, out_col: str = "_analysis"):
        """df -> df + struct column with per-doc (terms, length)."""
        return df.withColumn(out_col, self.tokens_udf()(F.col(text_col)))


_CHARMAP_CACHE: dict = {}


def _charmap_dict(charmap: tuple) -> dict:
    d = _CHARMAP_CACHE.get(charmap)
    if d is None:
        d = _CHARMAP_CACHE[charmap] = dict(charmap)
    return d


def _interleave(streams: list[list]) -> list:
    """Round-robin merge, skipping exhausted streams — exactly what the
    reference TeeFilter's repeated next() loop produces
    (filters.py:182-198)."""
    out = []
    idx = [0] * len(streams)
    remaining = [len(s) for s in streams]
    live = sum(1 for r in remaining if r > 0)
    while live:
        for i, s in enumerate(streams):
            if idx[i] < remaining[i]:
                out.append(s[idx[i]])
                idx[i] += 1
                if idx[i] == remaining[i]:
                    live -= 1
    return out


def _compound_subwords(s, wordset, memo):
    """Greedy-prefix recursive segmentation (reference intraword.py:68-84)."""
    if s in wordset:
        return [s]
    if s in memo:
        return memo[s]
    for i in range(1, len(s)):
        if s[:i] in wordset:
            rest = _compound_subwords(s[i:], wordset, memo)
            if rest:
                memo[s] = [s[:i]] + rest
                return memo[s]
    memo[s] = None
    return None


def _compound_pairs(pairs, wordset, keep):
    out = []
    memo: dict = {}
    for t, p in pairs:
        subs = _compound_subwords(t, wordset, memo)
        if subs:
            if len(subs) > 1 and keep:
                out.append((t, p))
            out.extend((sw, p) for sw in subs)
        else:
            out.append((t, p))
    return out


def _dmetaphone_triples(triples, primary_boost, secondary_boost, combine):
    """DoubleMetaphoneFilter expansion over (term, pos, boost) triples
    (reference morph.py:248-267): original kept only when ``combine``;
    empty primary code drops the token."""
    from whoosh_spark.analysis.dmetaphone import double_metaphone

    out = []
    for t, p, b in triples:
        if combine:
            out.append((t, p, b))
        primary, secondary = double_metaphone(t)
        if primary:
            out.append((primary, p, b * primary_boost))
        if secondary:
            out.append((secondary, p, b * secondary_boost))
    return out


def _shingle_pairs(pairs, size, sep):
    """Adjacent-token shingles; pos = first token's pos; streams shorter
    than ``size`` emit one shingle of everything (reference
    intraword.py:170-222; BiWord == size 2)."""
    out = []
    buf: list = []
    for t, p in pairs:
        buf.append((t, p))
        if len(buf) == size:
            out.append((sep.join(x for x, _ in buf), buf[0][1]))
            buf.pop(0)
    if not out and buf:
        out.append((sep.join(x for x, _ in buf), buf[0][1]))
    return out


def standard_analyzer(**kw) -> Analyzer:
    """RegexTokenizer | Lowercase | StopFilter — the target chain."""
    return Analyzer(**kw)


def stemming_analyzer(**kw) -> Analyzer:
    """RegexTokenizer | Lowercase | StopFilter | StemFilter — the reference
    docs' recommended default (reference analysis/analyzers.py:243-296
    StemmingAnalyzer)."""
    return Analyzer(stem=True, **kw)


def fancy_analyzer(mergewords: bool = False, mergenums: bool = False, **kw) -> Analyzer:
    """RegexTokenizer(r'\\S+') | IntraWordFilter | Lowercase | StopFilter —
    the reference FancyAnalyzer (analysis/analyzers.py:299-321); ideal for
    source code (camelCase / snake_case splitting)."""
    from whoosh_spark.analysis.intraword import DEFAULT_DELIMS

    return Analyzer(
        pattern=r"\S+",
        intraword=(DEFAULT_DELIMS, True, True, mergewords, mergenums),
        **kw,
    )


def simple_analyzer() -> Analyzer:
    """RegexTokenizer | Lowercase (no stop filter)."""
    return Analyzer(use_stopfilter=False)


def path_analyzer() -> Analyzer:
    """PathTokenizer: each prefix of a /-separated path is a token."""
    return Analyzer(pattern=r"[^/]+", lowercase=False, use_stopfilter=False,
                    path_mode=True)


#: language-name aliases accepted everywhere a two-letter code is
#: (reference lang/__init__.py:46-86 two_letter_code: ISO 639-2 codes,
#: English names, native names)
LANG_ALIASES = {
    "ara": "ar", "dan": "da", "nld": "nl", "eng": "en", "fin": "fi",
    "fra": "fr", "deu": "de", "hun": "hu", "ita": "it", "nor": "no",
    "por": "pt", "ron": "ro", "rus": "ru", "spa": "es", "swe": "sv",
    "tur": "tr",
    "arabic": "ar", "danish": "da", "dutch": "nl", "english": "en",
    "finnish": "fi", "french": "fr", "german": "de", "hungarian": "hu",
    "italian": "it", "norwegian": "no", "portuguese": "pt",
    "romanian": "ro", "russian": "ru", "spanish": "es", "swedish": "sv",
    "turkish": "tr",
    "العربية": "ar", "dansk": "da", "nederlands": "nl", "suomi": "fi",
    "français": "fr", "deutsch": "de", "magyar": "hu", "italiano": "it",
    "norsk": "no", "português": "pt", "русский язык": "ru",
    "español": "es", "svenska": "sv", "türkçe": "tr",
}


def language_analyzer(lang: str, minsize: int = 2) -> Analyzer:
    """RegexTokenizer | Lowercase | StopFilter(lang) | StemFilter(lang) —
    the reference LanguageAnalyzer (analysis/analyzers.py:256-296) for the
    languages with a bundled Snowball stemmer ("en" = English Snowball,
    like the reference — classic Porter is stemming_analyzer()). Accepts
    the reference's language aliases ("english", "deu", "français", ...).
    Languages without a stop list (e.g. Romanian) skip the stop filter,
    exactly like the reference's NoStopWords fallback."""
    from whoosh_spark.analysis.snowball import STEMMERS
    from whoosh_spark.analysis.stopwords_data import STOPWORDS

    lang = LANG_ALIASES.get(lang, lang)
    if lang == "ar":
        # the reference routes Arabic to the ISRI stemmer and has no Arabic
        # stop list (lang/__init__.py:122, NoStopWords fallback)
        return Analyzer(use_stopfilter=False, alt_stem="isri")
    if lang not in STEMMERS:
        raise ValueError(f"no bundled stemmer for language {lang!r}")
    stops = STOPWORDS.get(lang)
    if stops is None:
        return Analyzer(use_stopfilter=False, lang_stem=lang)
    return Analyzer(stopwords=stops, minsize=minsize, lang_stem=lang)


def id_analyzer(lowercase: bool = False) -> Analyzer:
    """Whole-value-as-one-token analyzer for ID fields."""
    return Analyzer(pattern=r"(?s)\A.*\Z", lowercase=lowercase, use_stopfilter=False)
