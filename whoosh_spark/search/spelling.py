"""Spelling suggestions + "did you mean" query correction.

Reference behavior (/root/reference/src/whoosh/spelling.py:41-118,
verified empirically): candidates are lexicon terms within ``maxdist``
(optionally sharing a ``prefix``); ranked by term frequency descending,
then term ascending — the actual edit distance does NOT affect rank within
the radius (the reference scores every candidate with the constant maxdist
plus 0.5/frequency), and the query word itself is a valid suggestion.

The reference intersects a Levenshtein DFA with the term dictionary
(automata/lev.py); over a distinct-terms DataFrame the built-in
``levenshtein`` + prefix pushdown is the idiomatic equivalent.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from whoosh_spark.index.catalog import Index


def suggest(ix: Index, field: str, text: str, limit: int = 5,
            maxdist: int = 2, prefix: int = 0) -> list[str]:
    lex = (
        ix.termstats()
        .filter(F.col("field") == field)
        .groupBy("term")
        .agg(F.sum("total_tf").alias("freq"))
    )
    cond = F.levenshtein(F.col("term"), F.lit(text)) <= maxdist
    if prefix:
        cond = cond & F.col("term").startswith(text[:prefix])
    # the reference's bounded heap keeps the LARGEST (score, term) tuples,
    # so among equal frequencies the alphabetically last terms survive the
    # cut — but the final list displays term-ascending (spelling.py:65-74)
    rows = (
        lex.filter(cond)
        .orderBy(F.desc("freq"), F.desc("term"))
        .limit(limit)
        .collect()
    )
    rows.sort(key=lambda r: (-r["freq"], r["term"]))
    return [r["term"] for r in rows]


def correct_query_terms(ix: Index, field: str, words: list[str],
                        maxdist: int = 2, prefix: int = 0) -> dict[str, str]:
    """For each word not present in the lexicon, its best suggestion
    (reference Searcher.correct_query semantics at the term level)."""
    present = {
        r["term"]
        for r in ix.termstats()
        .filter((F.col("field") == field) & F.col("term").isin(words))
        .select("term")
        .collect()
    }
    out = {}
    for w in words:
        if w in present:
            continue
        sugs = suggest(ix, field, w, limit=1, maxdist=maxdist, prefix=prefix)
        if sugs:
            out[w] = sugs[0]
    return out
