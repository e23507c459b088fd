"""Batch query serving: evaluate MANY queries in one Spark job.

The per-query DataFrame planner (engine.py) pays Spark job-scheduling
latency per query — right for interactive use, wrong for throughput. The
scalable serving pattern joins a *query table* against the index once:

    queries (query_id, field, term[, weight]) --broadcast-->
      posting blocks (filter term IN query terms) -> decode -> score
      -> join queries -> groupBy (query_id, doc_id) -> window top-k

One shuffle for any number of queries; throughput scales with cores and
cluster size (this powers the N vs 4N scaling evidence in bench.py).

Supported batch shapes: bags of weighted terms per query, scored BM25F and
combined by sum — the Or/term workload that dominates search serving.
Conjunctive batches add a HAVING count = n_terms filter; phrase batches
(``batch_phrase_search``) add a positional adjacency chain evaluated as
JVM higher-order array expressions; prefix batches
(``batch_prefix_search``) expand against one lexicon scan per field and
keep the reference's constant-score / single-term-degenerate semantics;
fuzzy batches (``batch_fuzzy_search``) expand via one JVM-levenshtein
lexicon scan into scored Or bags; generic pattern/range batches
(``batch_multiterm_search``) evaluate every query's term predicate in one
Arrow pass over the lexicon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from whoosh_spark.index.catalog import decode_blocks
from whoosh_spark.search.engine import Searcher, _PlanContext


def _prepare(searcher: Searcher, queries: list[tuple[str, str, list[str]]]):
    ix = searcher.index
    qrows = []
    for qid, field, terms in queries:
        for t in terms:
            qrows.append((qid, field, t))
    import pandas as pd

    qdf = ix.spark.createDataFrame(
        pd.DataFrame(qrows, columns=["query_id", "field", "term"]),
        schema="query_id string, field string, term string",
    )
    all_terms: dict[str, set] = {}
    for _, field, terms in queries:
        all_terms.setdefault(field, set()).update(terms)
    plan = _PlanContext(searcher)
    plan.stats = {}
    for field, ts in all_terms.items():
        for t, row in ix.term_stats(field, list(ts)).items():
            plan.stats[(field, t)] = row
    return qdf, all_terms, plan


def _selective_fraction(searcher: Searcher,
                        queries: list[tuple[str, str, list[str]]],
                        k: int) -> float:
    """Fraction of queries carrying a doc-range-sparse term (k <= df <=
    doc_count/BOUND_CHUNK). Such a term has the query's highest idf, so it
    drives theta, and it misses most 256-id chunks, so the hot terms'
    blocks prune there — the regime where batch WAND measured 3.1x faster
    (BENCH/WAND_SKEW.json). Driver-side metadata only (term stats), no
    Spark job."""
    from whoosh_spark.index.catalog import BOUND_CHUNK

    ix = searcher.index
    cutoff = max(1, ix.doc_count_all() // BOUND_CHUNK)
    by_field: dict[str, set] = {}
    for _, field, terms in queries:
        by_field.setdefault(field, set()).update(terms)
    df: dict[tuple[str, str], int] = {}
    for field, ts in by_field.items():
        for t, row in ix.term_stats(field, list(ts)).items():
            df[(field, t)] = int(row["df"])
    sel = sum(
        1 for _, field, terms in queries
        if any(k <= df.get((field, t), 0) <= cutoff for t in terms)
    )
    return sel / max(1, len(queries))


def _topk_window(agg: DataFrame, k: int) -> DataFrame:
    # NOTE a partition-local pre-top-k via mapInPandas was tried here and
    # REVERTED: shipping the full aggregated (query, doc) set across the
    # JVM->Python boundary cost ~2x the Tungsten window sort it displaced
    # (27.8s -> 52s at 500k docs). The volume fix lives upstream: the
    # fused bucket kernel (batch_fused_topk) never materializes that set.
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", F.col("score"), "rank")
    )


def batch_fused_topk(
    searcher: Searcher,
    queries: list[tuple[str, str, list[str]]],
    k: int = 10,
    conjunctive: bool = False,
    combine: str = "sum",
    min_match: int = 0,
    exclude: list[tuple[str, str]] | None = None,
    require: list[tuple[str, str]] | None = None,
) -> DataFrame | None:
    """Disjunctive weighted-term batch top-k as ONE fused kernel over
    bucket-co-partitioned posting blocks — the guide-§8 shape: every
    per-(query, doc) decision happens where the postings already are, and
    only ``queries x k`` candidate rows per partition ever reach a shuffle.

    The DataFrame plan (decode -> score -> broadcast-join queries ->
    groupBy(query, doc) -> window) is the right shape for SELECTIVE
    batches, but for hot unselective ones it materializes and shuffles the
    full matched set — |queries| x |matching docs| rows (10^8 at 500k docs
    x 200 queries) — twice (aggregation + ranking window), just to keep k
    rows per query. All of a doc's postings for every term share the
    build-time ``bucket`` (doc_id // bucket_width), so partitioning the
    compact ENCODED blocks by bucket makes each partition doc-complete:
    the kernel decodes, scores (same numpy BM25 as the local evaluator,
    bit-equal to the JVM expression), accumulates per query in the
    query's term order (the engine's exact left-fold order), and emits its
    local top-k. A final tiny window merges partition candidates — exact
    by the top-k merge property (doc_id breaks score ties).

    Parallelism below one-task-per-core is recovered by replicating the
    block stream over G query-groups (each query belongs to exactly one
    group, so per-(query, doc) work is never duplicated — only the cheap
    block decode, bounded by G).

    Eligibility (caller falls back to the DataFrame plan otherwise): plain
    BM25F weighting, no tombstones (the kernel reads raw blocks), and no
    ``round_to`` (faithful HALF_UP decimal rounding before the local cut
    cannot be vectorized; rounded oracle comparisons keep the proven
    plan)."""
    import numpy as np
    import pandas as pd

    from whoosh_spark.index import codec
    from whoosh_spark.index.quantize import BYTE_TO_LENGTH
    from whoosh_spark.search.scoring import BM25F

    ix = searcher.index
    w = searcher.weighting
    if type(w) is not BM25F or getattr(w, "use_final", False):
        return None
    if ix._delete_paths():
        return None
    _, all_terms, plan = _prepare(searcher, queries)

    # per-(field, term) scoring constants (same values attach_scores feeds
    # the JVM expression; score_np reproduces its op order bit-for-bit)
    dc = ix.doc_count_all()
    meta: dict = {}
    for field, ts in all_terms.items():
        ftype = searcher.schema[field] if field in searcher.schema else None
        scorable = bool(ftype and ftype.scorable)
        fboost = float(ftype.field_boost) if ftype else 1.0
        avgfl = ix.avg_field_length(field) or 1.0
        B = w.field_B(field)
        for t in ts:
            st = plan.stats.get((field, t))
            if st is None:
                continue
            meta[(field, t)] = (w.idf(dc, int(st["df"])), avgfl, B, fboost, scorable)

    nparts = max(1, ix.spark.sparkContext.defaultParallelism)
    span = max(
        (s.max_doc_id for s in ix.manifest.segments), default=0
    ) - min((s.min_doc_id for s in ix.manifest.segments), default=0)
    from whoosh_spark.index.build import DEFAULT_BUCKET_WIDTH

    n_buckets = max(1, span // DEFAULT_BUCKET_WIDTH + 1)
    G = int(max(1, min(len(queries), nparts // n_buckets)))
    import zlib

    qgroup = {qid: zlib.crc32(str(qid).encode()) % G for qid, _, _ in queries}
    by_group: list[list[tuple[str, str, list[str]]]] = [[] for _ in range(G)]
    for q in queries:
        by_group[qgroup[q[0]]].append(q)

    # membership-only term sets (AndNot / Require on the single-query
    # route): their ids are decoded per partition but never scored —
    # buckets are doc-complete, so per-partition exclusion/required
    # membership is exact
    extra_pairs = set(exclude or ()) | set(require or ())
    exclude = list(exclude or ())
    require = list(require or ())
    term_pairs = {(f, t) for f, ts in all_terms.items() for t in ts} | extra_pairs
    blocks = ix.postings_blocks().filter(
        F.col("term").isin(sorted({t for _, t in term_pairs}))
        & F.col("field").isin(sorted({f for f, _ in term_pairs}))
    ).select("field", "term", "bucket", "count", "ids", "tfs", "len_bytes",
             "weights")
    if G > 1:
        blocks = blocks.withColumn(
            "g", F.explode(F.sequence(F.lit(0), F.lit(G - 1))))
    else:
        blocks = blocks.withColumn("g", F.lit(0))
    parts = blocks.repartition(nparts, "bucket", "g")

    def kernel(batches):
        # (g, field, term) -> [ids chunks], [score chunks]
        acc: dict = {}
        # (g, field, term) -> [ids chunks] for membership-only terms
        macc: dict = {}
        for pdf in batches:
            if not len(pdf):
                continue
            for (g, fld, trm), idx in pdf.groupby(
                    ["g", "field", "term"], sort=False).indices.items():
                m = meta.get((fld, trm))
                if m is None:
                    if (fld, trm) in extra_pairs:
                        sub = pdf.iloc[idx]
                        counts = sub["count"].to_numpy().astype(np.int64)
                        macc.setdefault((g, fld, trm), []).append(
                            codec.delta_decode_concat(sub["ids"].tolist(), counts))
                    continue
                sub = pdf.iloc[idx]
                counts = sub["count"].to_numpy().astype(np.int64)
                n = int(counts.sum())
                ids = codec.delta_decode_concat(sub["ids"].tolist(), counts)
                wcol = sub["weights"]
                if wcol.isna().all():
                    ws = codec.varint_decode_concat(
                        sub["tfs"].tolist(), n).astype(np.float64)
                else:
                    chunks = []
                    for wv, tf_bin, c in zip(wcol, sub["tfs"], counts):
                        if wv is not None:
                            chunks.append(np.frombuffer(wv, dtype=np.float64))
                        else:
                            chunks.append(codec.varint_decode(
                                tf_bin, int(c)).astype(np.float64))
                    ws = np.concatenate(chunks)
                lbs = np.frombuffer(b"".join(sub["len_bytes"]), dtype=np.uint8)
                idf, avgfl, B, fboost, scorable = m
                if scorable:
                    fls = BYTE_TO_LENGTH[lbs].astype(np.float64)
                    sc = w.score_np(idf, ws * fboost, fls, avgfl, B)
                else:
                    sc = ws * fboost
                slot = acc.setdefault((g, fld, trm), ([], []))
                slot[0].append(ids)
                slot[1].append(sc)
        if not acc:
            return
        groups = {g for g, _, _ in acc}
        out_q: list = []
        out_d: list = []
        out_s: list = []
        for g in groups:
            term_scores = {
                (fld, trm): (np.concatenate(chunks[0]), np.concatenate(chunks[1]))
                for (gg, fld, trm), chunks in acc.items() if gg == g
            }
            mem = {
                (fld, trm): np.concatenate(chunks)
                for (gg, fld, trm), chunks in macc.items() if gg == g
            }

            def _member_ids(pairs_list):
                """Union doc set of membership pairs present here (a pair
                that is also a scoring term reads its ids from acc)."""
                arrs = []
                for p in pairs_list:
                    if p in term_scores:
                        arrs.append(term_scores[p][0])
                    elif p in mem:
                        arrs.append(mem[p])
                return (np.unique(np.concatenate(arrs)) if arrs
                        else np.empty(0, dtype=np.int64))

            for qid, field, terms in by_group[g]:
                parts_i = [term_scores[(field, t)] for t in terms
                           if (field, t) in term_scores]
                if not parts_i or (conjunctive and len(parts_i) < len(terms)):
                    continue  # conjunctive: a term with no postings here
                # per-doc fold IN TERM ORDER over columns aligned to the
                # union doc set — bit-identical to the engine's left fold
                # (0.0-fill for absent terms is the join plan's coalesce;
                # NOTE add.reduceat was tried and replaced: numpy reduces
                # pairwise, which re-associates the sum by 1 ulp)
                docs = np.unique(np.concatenate([p[0] for p in parts_i]))
                if combine == "max":
                    sums = np.full(docs.size, float("-inf"))
                else:
                    sums = np.zeros(docs.size, dtype=np.float64)
                npresent = (np.zeros(docs.size, dtype=np.int32)
                            if conjunctive or min_match else None)
                for ids_t, sc_t in parts_i:
                    idx = np.searchsorted(docs, ids_t)
                    if combine == "max":
                        sums[idx] = np.maximum(sums[idx], sc_t)
                    else:
                        sums[idx] = sums[idx] + sc_t
                    if npresent is not None:
                        npresent[idx] += 1
                if conjunctive:
                    # all-terms-required: one contribution per term
                    # occurrence (buckets are doc-complete, so the count
                    # is global, not partial)
                    keep = npresent == len(terms)
                    docs, sums = docs[keep], sums[keep]
                elif min_match:
                    keep = npresent >= min_match
                    docs, sums = docs[keep], sums[keep]
                if exclude:
                    keep = ~np.isin(docs, _member_ids(exclude),
                                    assume_unique=True)
                    docs, sums = docs[keep], sums[keep]
                if require:
                    keep = np.isin(docs, _member_ids(require),
                                   assume_unique=True)
                    docs, sums = docs[keep], sums[keep]
                top = np.lexsort((docs, -sums))[:k]
                out_q.extend([qid] * top.size)
                out_d.append(docs[top])
                out_s.append(sums[top])
        if not out_q:
            return
        yield pd.DataFrame({
            "query_id": out_q,
            "doc_id": np.concatenate(out_d),
            "score": np.concatenate(out_s),
        }, copy=False)

    cand = parts.mapInPandas(kernel, "query_id string, doc_id long, score double")
    return _topk_window(cand, k)


def phrase_fused_topk(
    searcher: Searcher,
    field: str,
    words: list[str],
    k: int = 10,
) -> DataFrame | None:
    """Single-phrase top-k through the bucket-co-partitioned kernel: per
    partition, decode the words' postings WITH positions, intersect the
    doc sets in word order, run the slop=1 adjacency check
    (keys-vectorized, the same degenerate form as the engine expression
    and the local evaluator), sum word scores over the engine's
    order-preserving binary tree, and emit the local top-k. The generic
    plan ships every matched doc's position ARRAYS through an
    aggregation exchange; here positions never leave the partition that
    decoded them. Same eligibility rules as batch_fused_topk."""
    import numpy as np
    import pandas as pd

    from whoosh_spark.index import codec
    from whoosh_spark.index.quantize import BYTE_TO_LENGTH
    from whoosh_spark.search.scoring import BM25F

    ix = searcher.index
    w = searcher.weighting
    if type(w) is not BM25F or getattr(w, "use_final", False):
        return None
    if ix._delete_paths():
        return None
    stats = ix.term_stats(field, sorted(set(words)))
    if any(t not in stats for t in words):
        # a missing word means no matches (reference positional.py)
        return ix.spark.createDataFrame([], "doc_id long, score double")
    ftype = searcher.schema[field] if field in searcher.schema else None
    scorable = bool(ftype and ftype.scorable)
    fboost = float(ftype.field_boost) if ftype else 1.0
    avgfl = ix.avg_field_length(field) or 1.0
    B = w.field_B(field)
    dc = ix.doc_count_all()
    meta = {t: (w.idf(dc, int(stats[t]["df"])), avgfl, B, fboost, scorable)
            for t in set(words)}

    nparts = max(1, ix.spark.sparkContext.defaultParallelism)
    blocks = ix.postings_blocks().filter(
        (F.col("field") == field) & F.col("term").isin(list(set(words)))
    ).select("term", "bucket", "count", "ids", "tfs", "len_bytes",
             "weights", "positions")
    parts = blocks.repartition(nparts, "bucket")
    uwords = sorted(set(words))

    def kernel(batches):
        acc: dict = {t: ([], [], [], []) for t in uwords}
        got = False
        for pdf in batches:
            if not len(pdf):
                continue
            got = True
            for trm, idx in pdf.groupby("term", sort=False).indices.items():
                sub = pdf.iloc[idx]
                counts = sub["count"].to_numpy().astype(np.int64)
                n = int(counts.sum())
                ids = codec.delta_decode_concat(sub["ids"].tolist(), counts)
                wcol = sub["weights"]
                if wcol.isna().all():
                    ws = codec.varint_decode_concat(
                        sub["tfs"].tolist(), n).astype(np.float64)
                else:
                    chunks = []
                    for wv, tf_bin, c in zip(wcol, sub["tfs"], counts):
                        if wv is not None:
                            chunks.append(np.frombuffer(wv, dtype=np.float64))
                        else:
                            chunks.append(codec.varint_decode(
                                tf_bin, int(c)).astype(np.float64))
                    ws = np.concatenate(chunks)
                lbs = np.frombuffer(b"".join(sub["len_bytes"]), dtype=np.uint8)
                pos_flat, pos_lens = codec.decode_position_lists_concat(
                    sub["positions"].tolist(), counts)
                idf, avgfl_, B_, fboost_, scorable_ = meta[trm]
                if scorable_:
                    fls = BYTE_TO_LENGTH[lbs].astype(np.float64)
                    sc = w.score_np(idf, ws * fboost_, fls, avgfl_, B_)
                else:
                    sc = ws * fboost_
                slot = acc[trm]
                slot[0].append(ids)
                slot[1].append(sc)
                slot[2].append(pos_flat)
                slot[3].append(pos_lens)
        if not got:
            return
        per_word: dict = {}
        for t in uwords:
            ids_c, sc_c, pf_c, pl_c = acc[t]
            if not ids_c:
                return  # a word absent from this partition: no match here
            ids = np.concatenate(ids_c)
            sc = np.concatenate(sc_c)
            pf = np.concatenate(pf_c) if pf_c else np.empty(0, np.int64)
            pl = np.concatenate(pl_c)
            if ids.size > 1 and np.any(np.diff(ids) < 0):
                order = np.argsort(ids, kind="stable")
                offs = np.concatenate(([0], np.cumsum(pl))).astype(np.int64)
                lens_o = pl[order]
                starts_o = offs[order]
                total = int(lens_o.sum())
                gstart = np.concatenate(([0], np.cumsum(lens_o)[:-1]))
                within = np.arange(total, dtype=np.int64) - np.repeat(gstart, lens_o)
                pf = pf[np.repeat(starts_o, lens_o) + within]
                pl = lens_o
                ids, sc = ids[order], sc[order]
            per_word[t] = (ids, sc, pf,
                           np.concatenate(([0], np.cumsum(pl))).astype(np.int64))
        docs = per_word[words[0]][0]
        for t in words[1:]:
            docs = np.intersect1d(docs, per_word[t][0], assume_unique=True)
        if docs.size == 0:
            return
        if len(words) > 1:
            # slop=1 ordered adjacency via (candidate << 32 | position)
            KEY = np.int64(1) << np.int64(32)
            keys = []
            for t in words:
                ids, _, pf, offs = per_word[t]
                idx = np.searchsorted(ids, docs)
                lens = offs[idx + 1] - offs[idx]
                total = int(lens.sum())
                gstart = np.concatenate(([0], np.cumsum(lens)[:-1]))
                within = np.arange(total, dtype=np.int64) - np.repeat(gstart, lens)
                pvals = pf[np.repeat(offs[idx], lens) + within]
                group = np.repeat(np.arange(idx.size, dtype=np.int64), lens)
                keys.append(group * KEY + pvals)
            survivors = keys[0]
            for i in range(1, len(keys)):
                survivors = survivors[np.isin(survivors + np.int64(i), keys[i])]
            if not survivors.size:
                return
            matched = docs[np.unique(survivors // KEY)]
        else:
            matched = docs

        # order-preserving binary score tree (engine tree_score shape)
        def tree(lo: int, hi: int):
            if hi - lo == 1:
                ids, sc, _, _ = per_word[words[lo]]
                idx = np.searchsorted(ids, matched)
                return sc[idx]
            half = (hi - lo) // 2
            return tree(lo, lo + half) + tree(lo + half, hi)

        sums = tree(0, len(words))
        top = np.lexsort((matched, -sums))[:k]
        yield pd.DataFrame({"doc_id": matched[top], "score": sums[top]},
                           copy=False)

    cand = parts.mapInPandas(kernel, "doc_id long, score double")
    return cand


def batch_term_search(
    searcher: Searcher,
    queries: list[tuple[str, str, list[str]]],
    k: int = 10,
    conjunctive: bool = False,
    use_wand: bool | str = "auto",
    round_to: int | None = None,
    conjunctive_skip: bool = True,
) -> DataFrame:
    """queries: [(query_id, field, [terms...])] -> top-k per query.

    Returns DataFrame(query_id, doc_id, score, rank). ``use_wand``:
    True routes disjunctive batches through per-query block-max pruning
    (batch_wand_search), False forces the full-decode plan, and "auto"
    (default) picks WAND when >=80% of the batch is selective (has a
    doc-range-sparse high-idf term) — where WAND measured 3.1x faster —
    and the exact plan otherwise (where WAND's bounds cannot prune and
    its extra phases cost ~5%). All three produce identical top-k.
    ``round_to`` rounds scores BEFORE the top-k window so the k-boundary
    tie-cut is deterministic across engines (oracle comparisons).
    Conjunctive batches route through per-query chunk-intersection block
    skipping (exact; ``conjunctive_skip=False`` keeps the full-decode plan
    for A/B benchmarking)."""
    if use_wand == "auto":
        use_wand = (not conjunctive
                    and _selective_fraction(searcher, queries, k) >= 0.8)
    if use_wand and not conjunctive:
        return batch_wand_search(searcher, queries, k, round_to=round_to)
    if round_to is None:
        # unselective serving: the fused bucket kernel never materializes
        # the |queries| x |docs| matched set (see its doc). For SELECTIVE
        # conjunctive batches the chunk-intersection plan below can still
        # win by decoding less; route them there (same signal as the WAND
        # auto-route: a doc-range-sparse term drives the pruning).
        selective = (conjunctive
                     and _selective_fraction(searcher, queries, k) >= 0.8)
        if not selective:
            fused = batch_fused_topk(searcher, queries, k,
                                     conjunctive=conjunctive)
            if fused is not None:
                return fused
    if conjunctive and conjunctive_skip:
        return batch_conjunctive_search(searcher, queries, k, round_to=round_to)
    ix = searcher.index
    qdf, all_terms, plan = _prepare(searcher, queries)
    term_pairs = {(f, t) for f, ts in all_terms.items() for t in ts}
    # spread the encoded blocks across the cluster BEFORE decode — the
    # batch fan-out (score x queries-per-term) is the heavy stage and must
    # not inherit the 1-2 packed Parquet input splits. One task per core:
    # the r6 vectorized block decode made finer splits pure overhead
    # (64 partitions measured 0.6s slower end-to-end than 32 on 32 cores).
    nparts = max(1, ix.spark.sparkContext.defaultParallelism)
    parts = []
    for field, ts in all_terms.items():
        parts.append(ix.postings_for(field, list(ts), min_partitions=nparts))
    decoded = parts[0]
    for p in parts[1:]:
        decoded = decoded.unionByName(p)
    scored = plan.attach_scores(decoded, sorted(term_pairs))

    joined = scored.join(F.broadcast(qdf), on=["field", "term"])
    if conjunctive:
        agg = joined.groupBy("query_id", "doc_id").agg(
            F.sum("score").alias("score"), F.count("*").alias("_n")
        )
        n_terms = qdf.groupBy("query_id").agg(F.count("*").alias("_need"))
        agg = agg.join(F.broadcast(n_terms), on="query_id").filter(
            F.col("_n") == F.col("_need")
        )
    else:
        # no match-count needed for disjunctive scoring — dropping the
        # count column narrows the (query, doc) shuffle rows
        agg = joined.groupBy("query_id", "doc_id").agg(
            F.sum("score").alias("score")
        )
    out = agg.select("query_id", "doc_id", "score")
    if round_to is not None:
        out = out.withColumn("score", F.round(F.col("score"), round_to))
    return _topk_window(out, k)


def _conjunctive_prune(blocks: DataFrame, qdf_u: DataFrame):
    """Per-query chunk-intersection pruning on block metadata (the shared
    core of the conjunctive and phrase batch paths): a chunk can hold a
    match for a query only if EVERY of the query's (field, term) pairs has
    a block overlapping it. Returns (allowed, surv_blocks, slim):
    ``allowed`` = per-query surviving (field, term, bucket, block_no),
    ``surv_blocks`` = the union of blocks any query still needs (decode
    input), ``slim`` = the block metadata projection (for diagnostics)."""
    from whoosh_spark.index.catalog import _chunk_col

    need_u = qdf_u.groupBy("query_id").agg(F.count("*").alias("_need_u"))
    slim = blocks.select("field", "term", "bucket", "block_no", _chunk_col())
    present = slim.select("field", "term", "chunk").distinct()
    okchunks = (
        present.join(F.broadcast(qdf_u), on=["field", "term"])
        .groupBy("query_id", "chunk")
        .agg(F.count("*").alias("_p"))
        .join(F.broadcast(need_u), on="query_id")
        .filter(F.col("_p") == F.col("_need_u"))
        .select("query_id", "chunk")
    )
    allowed = (
        slim.join(F.broadcast(qdf_u), on=["field", "term"])
        .join(okchunks, on=["query_id", "chunk"])
        .select("query_id", "field", "term", "bucket", "block_no")
        .distinct()
    )
    survivors = allowed.select("field", "term", "bucket", "block_no").distinct()
    surv_blocks = blocks.join(survivors, on=["field", "term", "bucket", "block_no"])
    return allowed, surv_blocks, slim


def batch_conjunctive_search(
    searcher: Searcher,
    queries: list[tuple[str, str, list[str]]],
    k: int = 10,
    round_to: int | None = None,
    with_stats: bool = False,
):
    """Conjunctive (all-terms-required) batch with per-query
    chunk-intersection block skipping.

    For each query, only doc-id chunks where EVERY query term has an
    overlapping block can contain a match, so each term's blocks outside
    the query's shared chunks are dropped before decode — the reference's
    IntersectionMatcher ``skip_to`` jump (matching/binary.py,
    codec/whoosh3.py:1018-1036) on block metadata. Exact for any scoring
    mode: pruned blocks only hold docs missing some required term. For
    And(rare, hot) batches this decodes ~df(rare)/N of the hot lists.
    ``with_stats=True`` additionally returns per-(query,term) block
    keep/total counts (two extra count jobs — diagnostics only)."""
    ix = searcher.index
    qdf, all_terms, plan = _prepare(searcher, queries)
    term_pairs = {(f, t) for f, ts in all_terms.items() for t in ts}

    blocks = ix.postings_blocks().filter(
        F.col("term").isin([t for _, t in term_pairs])
        & F.col("field").isin(list(all_terms))
    )
    # chunk math runs on DISTINCT (query, field, term) pairs; the original
    # qdf (with any repeated terms) is joined back afterwards so duplicate
    # terms keep scoring twice, exactly like the unpruned plan
    qdf_u = qdf.dropDuplicates(["query_id", "field", "term"])
    allowed, surv_blocks, slim = _conjunctive_prune(blocks, qdf_u)
    decoded = ix._mask_deleted(decode_blocks(surv_blocks, with_block_id=True))
    scored = plan.attach_scores(decoded, sorted(term_pairs),
                                extra_cols=["bucket", "block_no"])
    per_query = scored.join(allowed, on=["field", "term", "bucket", "block_no"])
    # restore duplicate-term multiplicity (qdf join fans out repeated terms)
    per_query = per_query.join(F.broadcast(qdf), on=["query_id", "field", "term"])
    agg = per_query.groupBy("query_id", "doc_id").agg(
        F.sum("score").alias("score"), F.count("*").alias("_n")
    )
    n_terms = qdf.groupBy("query_id").agg(F.count("*").alias("_need"))
    agg = agg.join(F.broadcast(n_terms), on="query_id").filter(
        F.col("_n") == F.col("_need")
    )
    out = agg.select("query_id", "doc_id", "score")
    if round_to is not None:
        out = out.withColumn("score", F.round(F.col("score"), round_to))
    topk = _topk_window(out, k)
    if not with_stats:
        return topk
    qt_total = slim.select("field", "term", "bucket", "block_no").distinct().join(
        F.broadcast(qdf_u), on=["field", "term"]
    ).count()
    return topk, {
        "qt_blocks_total": qt_total,
        "qt_blocks_kept": allowed.count(),
        "decode_blocks_total": blocks.count(),
        "decode_blocks_kept": surv_blocks.count(),
    }


def batch_wand_search(
    searcher: Searcher,
    queries: list[tuple[str, str, list[str]]],
    k: int = 10,
    with_stats: bool = False,
    round_to: int | None = None,
):
    """Block-max WAND for a whole query batch (disjunctive scoring).

    Phase 1: for each query, decode just enough of its strongest term's
    best-bounded blocks to cover k postings; the k-th exact partial is a
    valid per-query threshold theta (any k exact partials lower-bound the
    true k-th best total).
    Phase 2: CHUNK-ALIGNED (doc-range) block-max pruning. Blocks are
    doc-sorted, so each block's [min_id, max_id] span says exactly which
    256-id chunks of doc-id space it can score into. For each
    (query, chunk) the sum over the query's terms of their MAX overlapping
    block quality upper-bounds every doc total in the chunk (terms absent
    from a chunk contribute 0 — vs the reference-style global max_quality
    rest bound, which never prunes hot+rare disjunctions, and vs a
    per-bucket rest, which saturates once every term touches every 8192-id
    bucket). A (query, term) block survives iff SOME chunk it overlaps has
    block_quality + (chunk_bound - own term's chunk max) >= theta. Every
    doc whose true total can reach theta keeps ALL its blocks, so returned
    top-k lists are exact (same invariant as search/wand.py).

    ``with_stats=True`` returns ``(df, stats)`` where stats counts the
    per-(query,term) blocks the pruned plan keeps vs the full batch scan
    (two extra count jobs — diagnostic / benchmark use only).

    Default-strategy guidance (measured at 600k docs with a realistic
    long-tail vocabulary, BENCH/WAND_SKEW.json): selective batches — every
    query carrying a rare high-idf term (df ~60) — run 4.2x faster here
    than the exact plan, with 85% of per-(query,term) blocks pruned;
    ``batch_term_search(use_wand="auto")`` routes those batches here. The
    saturated control (every term touches every 256-id chunk) prunes 0%
    and pays the extra phases, so auto keeps it on the exact plan."""
    from whoosh_spark.search.wand import EPS, _max_quality, _term_constants

    ix = searcher.index
    spark = ix.spark
    qdf, all_terms, plan = _prepare(searcher, queries)

    # driver-side per-(field,term) constants + bounds
    consts: dict = {}
    mq: dict = {}
    for field, ts in all_terms.items():
        for t in ts:
            c = _term_constants(searcher, plan.stats, field, t)
            if c is not None:
                c["boost"] = 1.0
                consts[(field, t)] = c
                mq[(field, t)] = _max_quality(searcher, c)
    if not consts:
        return spark.createDataFrame([], "query_id string, doc_id long, score double, rank int")

    # per-query strongest term + per-(query,term) rest bound
    qstar_rows = []
    qterm_rows = []
    for qid, field, terms in queries:
        live = [(field, t) for t in terms if (field, t) in consts]
        if not live:
            continue
        star = max(live, key=lambda ft: mq[ft])
        qstar_rows.append((qid, star[0], star[1]))
        for ft in live:
            qterm_rows.append((qid, ft[0], ft[1]))
    import pandas as pd

    qstar = spark.createDataFrame(
        pd.DataFrame(qstar_rows, columns=["query_id", "field", "term"]),
        schema="query_id string, field string, term string",
    )
    qterm_names = spark.createDataFrame(
        pd.DataFrame(qterm_rows, columns=["query_id", "field", "term"]),
        schema="query_id string, field string, term string",
    )

    # block metadata with per-term quality bound (JVM-side expression)
    meta_rows = [
        {
            "field": f, "term": t, "idf": c["idf"], "avgfl": c["avgfl"],
            "b": c["B"], "one_minus_b": 1 - c["B"], "fboost": c["fboost"],
            "scorable": c["scorable"],
        }
        for (f, t), c in consts.items()
    ]
    import pandas as pd

    meta = spark.createDataFrame(pd.DataFrame(meta_rows))  # Arrow LocalRelation
    blocks = ix.postings_blocks().filter(
        F.col("term").isin([t for _, t in consts]) & F.col("field").isin(list(all_terms))
    )
    from whoosh_spark.search.scoring import byte_to_length_col

    bmeta = blocks.join(F.broadcast(meta), on=["field", "term"])
    w_col = F.col("max_tf") * F.col("fboost")
    fl_col = byte_to_length_col(F.col("min_len_byte"))
    bq = searcher.weighting.score_col(
        w_col, fl_col, F.col("idf"), F.col("avgfl"), F.col("b"),
        F.col("one_minus_b"), F.col("scorable"),
    )
    bmeta = bmeta.select(
        "field", "term", "bucket", "block_no", "count", "min_id", "max_id",
        bq.alias("bq"),
    )

    # ---- phase 1: theta per query from the strongest term's best blocks
    seed_meta = bmeta.join(F.broadcast(qstar), on=["field", "term"])
    wq = Window.partitionBy("query_id").orderBy(F.desc("bq"), F.asc("bucket"), F.asc("block_no"))
    seed_sel = (
        seed_meta.withColumn("_cum", F.sum("count").over(wq))
        .filter(F.col("_cum") - F.col("count") < k)
        .select("query_id", "field", "term", "bucket", "block_no")
    )
    seed_blocks = blocks.join(
        seed_sel.select("field", "term", "bucket", "block_no").distinct(),
        on=["field", "term", "bucket", "block_no"],
    )
    seed_decoded = ix._mask_deleted(decode_blocks(seed_blocks))
    seed_scored = plan.attach_scores(seed_decoded, sorted(consts)).join(
        F.broadcast(qstar), on=["field", "term"]
    )
    wq2 = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    theta = (
        seed_scored.withColumn("_rn", F.row_number().over(wq2))
        .filter(F.col("_rn") == k)
        .select("query_id", F.col("score").alias("theta"))
    )

    # ---- phase 2: chunk-aligned per-(query, block) pruning, dedup
    # decode, exact scoring. Explode each block into the 256-id chunks its
    # [min_id, max_id] span overlaps (≤ bucket_width/256 + 1 chunks);
    # tcq = a term's best overlapping block quality per chunk; chunk_bound
    # = sum of tcq over the query's terms PRESENT in the chunk (absent
    # terms bound to 0 — the big win over both a global rest and a
    # per-bucket rest). All metadata-sized, all JVM-side.
    from whoosh_spark.search.wand import BOUND_CHUNK

    chunk = F.explode(
        F.sequence(
            (F.col("min_id") / BOUND_CHUNK).cast("long"),
            (F.col("max_id") / BOUND_CHUNK).cast("long"),
        )
    ).alias("chunk")
    bchunk = bmeta.select("field", "term", "bucket", "block_no", "bq", chunk)
    tcq = bchunk.groupBy("field", "term", "chunk").agg(F.max("bq").alias("tcq"))
    qchunk = (
        tcq.join(F.broadcast(qterm_names), on=["field", "term"])
        .groupBy("query_id", "chunk")
        .agg(F.sum("tcq").alias("chunk_bound"))
    )
    # a block may survive via several chunks — distinct() restores the
    # one-row-per-(query, block) shape the score join depends on
    allowed = (
        bchunk.join(F.broadcast(qterm_names), on=["field", "term"])
        .join(tcq, on=["field", "term", "chunk"])
        .join(qchunk, on=["query_id", "chunk"])
        .join(F.broadcast(theta), on="query_id", how="left")
        .filter(
            F.col("theta").isNull()
            | ((F.col("bq") + (F.col("chunk_bound") - F.col("tcq")))
               * F.lit(1 + EPS) + F.lit(EPS) >= F.col("theta"))
        )
        .select("query_id", "field", "term", "bucket", "block_no")
        .distinct()
    )
    survivors = allowed.select("field", "term", "bucket", "block_no").distinct()
    surv_blocks = blocks.join(survivors, on=["field", "term", "bucket", "block_no"])
    decoded = ix._mask_deleted(decode_blocks(surv_blocks, with_block_id=True))
    scored = plan.attach_scores(decoded, sorted(consts), extra_cols=["bucket", "block_no"])
    per_query = scored.join(allowed, on=["field", "term", "bucket", "block_no"])
    agg = per_query.groupBy("query_id", "doc_id").agg(F.sum("score").alias("score"))
    if round_to is not None:
        # round BEFORE the top-k window: the k-boundary tie-cut is then
        # deterministic across engines (oracle comparisons)
        agg = agg.withColumn("score", F.round(F.col("score"), round_to))
    out = _topk_window(agg, k)
    if not with_stats:
        return out
    qt_blocks_total = bmeta.join(F.broadcast(qterm_names), on=["field", "term"]).count()
    qt_blocks_kept = allowed.count()
    decode_total = blocks.count()
    decode_kept = survivors.count()
    return out, {
        # per-(query,term) pruning decisions — the WAND skip rate
        "qt_blocks_total": qt_blocks_total,
        "qt_blocks_kept": qt_blocks_kept,
        # physical blocks decoded once after dedup vs the full batch scan
        "decode_blocks_total": decode_total,
        "decode_blocks_kept": decode_kept,
    }


def batch_phrase_search(
    searcher: Searcher,
    queries: list[tuple[str, str, list[str]]],
    k: int = 10,
    slop: int = 1,
    round_to: int | None = None,
    conjunctive_skip: bool = True,
) -> DataFrame:
    """queries: [(query_id, field, [words in phrase order])] -> top-k per
    query with EXACT single-query Phrase semantics (reference
    query/positional.py: ordered proximity chain, score = sum of the word
    term-scores, repeated words summed per occurrence) — evaluated for the
    whole batch in ONE positional decode pass. The n-gram / exact-quote
    lookup shape a training-data pipeline runs at thousands of phrases per
    job.

    Phrases are conjunctive, so each query prunes to doc-id chunks where
    EVERY word has a block (``_conjunctive_prune``) before positions are
    decoded. ``slop=1`` (exact adjacency, the default) evaluates the chain
    as pure JVM higher-order array expressions — no Python in the match
    loop; ``slop>1`` falls back to an Arrow-batched UDF running the same
    ``_span_near_chain`` the single-query planner uses."""
    import pandas as pd

    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    from whoosh_spark.search.engine import _span_near_chain

    ix = searcher.index
    qrows = []
    for qid, field, words in queries:
        for i, w in enumerate(words):
            qrows.append((qid, field, w, i))
    qdf = ix.spark.createDataFrame(
        pd.DataFrame(qrows, columns=["query_id", "field", "term", "ordinal"]),
        schema="query_id string, field string, term string, ordinal int",
    )
    all_terms: dict[str, set] = {}
    for _, field, words in queries:
        all_terms.setdefault(field, set()).update(words)
    plan = _PlanContext(searcher)
    plan.stats = {}
    for field, ts in all_terms.items():
        for t, row in ix.term_stats(field, list(ts)).items():
            plan.stats[(field, t)] = row
    term_pairs = {(f, t) for f, ts in all_terms.items() for t in ts}

    blocks = ix.postings_blocks().filter(
        F.col("term").isin([t for _, t in term_pairs])
        & F.col("field").isin(list(all_terms))
    )
    qdf_u = qdf.dropDuplicates(["query_id", "field", "term"])
    if conjunctive_skip:
        allowed, surv_blocks, _ = _conjunctive_prune(blocks, qdf_u)
    else:
        allowed, surv_blocks = None, blocks
    decoded = ix._mask_deleted(
        decode_blocks(surv_blocks, with_positions=True, with_block_id=True)
    )
    scored = plan.attach_scores(decoded, sorted(term_pairs),
                                keep_positions=True,
                                extra_cols=["bucket", "block_no"])
    if allowed is not None:
        scored = scored.join(allowed, on=["field", "term", "bucket", "block_no"])
        per_query = scored.join(F.broadcast(qdf), on=["query_id", "field", "term"])
    else:
        per_query = scored.join(F.broadcast(qdf), on=["field", "term"])

    agg = per_query.groupBy("query_id", "doc_id").agg(
        F.sum("score").alias("score"),
        F.count_distinct(F.col("ordinal")).alias("_n"),
        F.array_sort(F.collect_list(F.struct("ordinal", "positions"))).alias("_op"),
    )
    n_words = qdf.groupBy("query_id").agg(
        F.count_distinct(F.col("ordinal")).alias("_need")
    )
    agg = agg.join(F.broadcast(n_words), on="query_id").filter(
        F.col("_n") == F.col("_need")
    )
    ps = F.transform(F.col("_op"), lambda s: s["positions"])
    agg = agg.withColumn("_ps", ps)
    if slop == 1:
        # exists p in ps[0] with p+i in ps[i] for every following ordinal —
        # the SpanNear2 chain at slop=1 as JVM codegen (engine.py
        # _compile_phrase uses the same degenerate form per query)
        chain_ok = F.when(F.size("_ps") == 1, F.lit(True)).otherwise(
            F.exists(
                F.element_at("_ps", 1),
                lambda x: F.forall(
                    F.sequence(F.lit(1), F.size("_ps") - 1),
                    lambda i: F.array_contains(F.element_at("_ps", i + 1), x + i),
                ),
            )
        )
    else:
        _slop = int(slop)

        # no type hints: `from __future__ import annotations` stringifies
        # them, which PySpark's hint inference rejects
        @pandas_udf(T.BooleanType())
        def _chain(ps_col):
            return ps_col.apply(
                lambda ps: _span_near_chain([list(p) for p in ps], _slop, True, 1)
            )

        chain_ok = _chain(F.col("_ps"))
    out = agg.filter(chain_ok).select("query_id", "doc_id", "score")
    if round_to is not None:
        out = out.withColumn("score", F.round(F.col("score"), round_to))
    return _topk_window(out, k)


def batch_prefix_search(
    searcher: Searcher,
    queries: list[tuple[str, str, str]],
    k: int = 10,
    round_to: int | None = None,
) -> DataFrame:
    """queries: [(query_id, field, prefix)] -> top-k per query with EXACT
    single-query Prefix semantics (reference terms.py:173-211 as resolved
    by engine._resolve_multiterms): an expansion of >=2 terms is a
    constant-score-1.0 doc set (the boost-ignored reference quirk), exactly
    one term degenerates to a scored BM25F Term, zero terms to no rows.
    The query-expansion shape (autocomplete, identifier lookup over a code
    corpus) served for the whole batch at once.

    Scale shape: ONE lexicon scan per field, broadcast-joined against the
    batch's prefixes on a JVM ``startswith`` (no term list ever reaches the
    driver for multi-term queries); ONE posting scan whose OR-of-prefixes
    predicate pushes to the term-sorted Parquet files (StringStartsWith
    row-group pruning); ids-only use of the decoded rows with a per-query
    distinct. The only driver traffic is the <=1-row-per-query list of
    single-term expansions (bounded, same class as the WAND seed collect),
    which routes through ``batch_term_search`` for exact term scoring."""
    import pandas as pd

    ix = searcher.index
    qdf = ix.spark.createDataFrame(
        pd.DataFrame(queries, columns=["query_id", "field", "prefix"]),
        schema="query_id string, field string, prefix string",
    )
    fields = sorted({f for _, f, _ in queries})

    exp_parts = []
    for field in fields:
        lex = ix.field_terms(field).select("term")
        qf = qdf.filter(F.col("field") == field).select("query_id", "prefix")
        exp_parts.append(
            lex.join(F.broadcast(qf), F.col("term").startswith(F.col("prefix")))
            .select("query_id", F.lit(field).alias("field"), "term")
        )
    expansion = exp_parts[0]
    for p in exp_parts[1:]:
        expansion = expansion.unionByName(p)
    counts = expansion.groupBy("query_id").agg(F.count("*").alias("_n_exp"))

    # single-term degenerates (reference: Prefix expanding to one term IS
    # that scored Term) — bounded collect, <= 1 row per query
    ones = (
        expansion.join(F.broadcast(counts.filter(F.col("_n_exp") == 1)),
                       on="query_id")
        .select("query_id", "field", "term")
        .collect()
    )
    outs = []
    if ones:
        outs.append(batch_term_search(
            searcher,
            [(r["query_id"], r["field"], [r["term"]]) for r in ones],
            k=k, use_wand=False, round_to=round_to,
        ))

    one_qids = {r["query_id"] for r in ones}
    multi_queries = [(qid, f, p) for qid, f, p in queries if qid not in one_qids]
    if multi_queries:
        pred = None
        for _, field, prefix in multi_queries:
            c = (F.col("field") == field) & F.col("term").startswith(prefix)
            pred = c if pred is None else (pred | c)
        blocks = ix.postings_blocks().filter(pred)
        decoded = ix._mask_deleted(decode_blocks(blocks)).select(
            "field", "term", "doc_id"
        )
        multi = expansion.join(
            F.broadcast(counts.filter(F.col("_n_exp") >= 2)), on="query_id"
        ).select("query_id", "field", "term")
        matched = (
            decoded.join(F.broadcast(multi), on=["field", "term"])
            .select("query_id", "doc_id")
            .distinct()
            .withColumn("score", F.lit(1.0))
        )
        if round_to is not None:
            matched = matched.withColumn("score", F.round(F.col("score"), round_to))
        outs.append(_topk_window(matched, k))

    if not outs:
        return ix.spark.createDataFrame(
            [], "query_id string, doc_id bigint, score double, rank int"
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def batch_fuzzy_search(
    searcher: Searcher,
    queries: list[tuple[str, str, str]],
    k: int = 10,
    maxdist: int = 1,
    prefixlength: int = 1,
    round_to: int | None = None,
    use_wand: bool | str = False,
) -> DataFrame:
    """queries: [(query_id, field, word)] -> top-k per query with EXACT
    single-query FuzzyTerm semantics (reference terms.py:420-485 as a
    SCORED multiterm: expands to Or-of-Terms, each expanded term scored
    with its own idf, scores summed). The typo-tolerant lookup shape a
    dedup / entity-resolution pipeline runs in bulk.

    Expansion is ONE lexicon scan per field, broadcast-joined against the
    batch's words on JVM ``levenshtein`` + prefix guard (Spark's builtin
    is plain Levenshtein, identical to the single-query predicate). The
    expanded bags then route through ``batch_term_search``
    (sum-of-term-scores == Or). Driver traffic is the expansion itself,
    clipped at ``Searcher.max_expansion`` terms per query with a loud
    failure beyond — the same contract as the single-query scored
    expansion (engine._resolve_multiterms)."""
    import pandas as pd

    ix = searcher.index
    qdf = ix.spark.createDataFrame(
        pd.DataFrame(queries, columns=["query_id", "field", "word"]),
        schema="query_id string, field string, word string",
    )
    fields = sorted({f for _, f, _ in queries})
    cap = searcher.max_expansion

    exp_parts = []
    for field in fields:
        lex = ix.field_terms(field).select("term")
        qf = qdf.filter(F.col("field") == field).select("query_id", "word")
        cond = F.levenshtein(F.col("term"), F.col("word")) <= F.lit(int(maxdist))
        if prefixlength:
            cond = cond & F.col("term").startswith(
                F.substring(F.col("word"), 1, int(prefixlength))
            )
        exp_parts.append(
            lex.join(F.broadcast(qf), cond)
            .select("query_id", F.lit(field).alias("field"), "term")
        )
    expansion = exp_parts[0]
    for p in exp_parts[1:]:
        expansion = expansion.unionByName(p)
    # <= cap+1 terms per query ever reach the driver (slice before collect)
    rows = (
        expansion.groupBy("query_id", "field")
        .agg(F.slice(F.sort_array(F.collect_list("term")), 1, cap + 1).alias("terms"))
        .collect()
    )
    bags = []
    for r in rows:
        if len(r["terms"]) > cap:
            raise ValueError(
                f"fuzzy query {r['query_id']!r} expands to more than "
                f"max_expansion={cap} terms; lower maxdist or raise "
                f"Searcher(max_expansion=...)"
            )
        bags.append((r["query_id"], r["field"], list(r["terms"])))
    if not bags:
        return ix.spark.createDataFrame(
            [], "query_id string, doc_id bigint, score double, rank int"
        )
    return batch_term_search(searcher, bags, k=k, use_wand=use_wand,
                             round_to=round_to)


def batch_multiterm_search(
    searcher: Searcher,
    queries: list[tuple[str, "object"]],
    k: int = 10,
    round_to: int | None = None,
) -> DataFrame:
    """queries: [(query_id, MultiTerm node)] — any mix of constant-score
    pattern/range queries (Wildcard / Regex / Prefix / TermRange) served
    for the whole batch at once with EXACT single-query semantics: >=2
    expanded terms are a constant-score-1.0 doc set (boost-ignored
    reference quirk), exactly one term degenerates to a scored BM25F Term,
    zero terms to no rows. Scored multiterms (FuzzyTerm) belong in
    ``batch_fuzzy_search`` and are rejected here.

    Scale shape: ONE lexicon scan per field evaluates EVERY query's
    ``term_predicate`` in a single Arrow-batched pass (the per-query
    Python regexes are broadcast in the UDF closure and run over distinct
    terms only — the same work the reference does per term, batched); the
    posting scan is then restricted to exactly the expansion's terms via a
    broadcast join (plus each query's native pushdown as a Parquet
    row-group filter when every query provides one). Driver traffic is
    the <=1-row-per-query single-term-degenerate list, as in
    ``batch_prefix_search``."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    ix = searcher.index
    for qid, q in queries:
        if not getattr(q, "constantscore", False):
            raise ValueError(
                f"query {qid!r}: {type(q).__name__} is not a constant-score "
                "multiterm; use batch_fuzzy_search for scored expansions"
            )
    fields = sorted({q.field for _, q in queries})

    exp_parts = []
    for field in fields:
        plist = [(qid, q.term_predicate) for qid, q in queries if q.field == field]

        @pandas_udf(T.ArrayType(T.StringType()))
        def _match(s, _plist=plist):
            return s.map(lambda t: [qid for qid, p in _plist if p(t)])

        lex = ix.field_terms(field).select("term")
        exp_parts.append(
            lex.withColumn("query_id", F.explode(_match(F.col("term"))))
            .select("query_id", F.lit(field).alias("field"), "term")
        )
    expansion = exp_parts[0]
    for p in exp_parts[1:]:
        expansion = expansion.unionByName(p)
    counts = expansion.groupBy("query_id").agg(F.count("*").alias("_n_exp"))

    # single-term degenerates (scored Term) — bounded collect
    ones = (
        expansion.join(F.broadcast(counts.filter(F.col("_n_exp") == 1)),
                       on="query_id")
        .select("query_id", "field", "term")
        .collect()
    )
    outs = []
    if ones:
        outs.append(batch_term_search(
            searcher,
            [(r["query_id"], r["field"], [r["term"]]) for r in ones],
            k=k, use_wand=False, round_to=round_to,
        ))

    one_qids = {r["query_id"] for r in ones}
    multi_nodes = [(qid, q) for qid, q in queries if qid not in one_qids]
    if multi_nodes:
        multi = expansion.join(
            F.broadcast(counts.filter(F.col("_n_exp") >= 2)), on="query_id"
        ).select("query_id", "field", "term")
        blocks = ix.postings_blocks().filter(F.col("field").isin(fields))
        pds = [(q.field, q.spark_term_filter()) for _, q in multi_nodes]
        if all(p is not None for _, p in pds):
            pred = None
            for field, p in pds:
                c = (F.col("field") == field) & p
                pred = c if pred is None else (pred | c)
            blocks = blocks.filter(pred)
        blocks = blocks.join(
            F.broadcast(multi.select("field", "term").distinct()),
            on=["field", "term"],
        )
        decoded = ix._mask_deleted(decode_blocks(blocks)).select(
            "field", "term", "doc_id"
        )
        matched = (
            decoded.join(F.broadcast(multi), on=["field", "term"])
            .select("query_id", "doc_id")
            .distinct()
            .withColumn("score", F.lit(1.0))
        )
        if round_to is not None:
            matched = matched.withColumn("score", F.round(F.col("score"), round_to))
        outs.append(_topk_window(matched, k))

    if not outs:
        return ix.spark.createDataFrame(
            [], "query_id string, doc_id bigint, score double, rank int"
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def _classify_for_batch(q):
    """Map a query tree onto a batch kernel, or None for engine fallback.

    Returns (kind, payload) where kind is one of "null", "term", "and",
    "phrase", "prefix", "fuzzy", "multiterm" — the shapes the batch
    kernels serve with exact single-query semantics — or None when the
    tree needs the full per-query planner (boosts, minmatch/scale, Not,
    nested boolean, spans, ranges over stored columns, ...)."""
    from whoosh_spark import query as Q
    from whoosh_spark.query.nodes import _NullQuery

    if isinstance(q, _NullQuery):
        return ("null", None)
    if q.boost != 1.0:
        return None
    if type(q) is Q.Term:
        return ("term", (q.field, [q.text]))
    if type(q) is Q.Or and q.minmatch == 0 and q.scale is None:
        subs = q.subqueries
        if (subs and all(type(s) is Q.Term and s.boost == 1.0 for s in subs)
                and len({s.field for s in subs}) == 1):
            terms = [s.text for s in subs]
            if len(set(terms)) == len(terms):
                return ("term", (subs[0].field, terms))
        return None
    if type(q) is Q.And:
        subs = q.subqueries
        if (subs and all(type(s) is Q.Term and s.boost == 1.0 for s in subs)
                and len({s.field for s in subs}) == 1):
            terms = [s.text for s in subs]
            if len(set(terms)) == len(terms):
                return ("and", (subs[0].field, terms))
        return None
    if type(q) is Q.Phrase:
        return ("phrase", (q.slop, q.field, list(q.words)))
    if type(q) is Q.Prefix:
        return ("prefix", (q.field, q.text))
    if type(q) is Q.FuzzyTerm:
        return ("fuzzy", ((q.maxdist, q.prefixlength), q.field, q.text))
    if type(q) is Q.Variations:
        return ("term", (q.field, sorted(q._candidates())))
    if getattr(q, "constantscore", False) and hasattr(q, "term_predicate"):
        return ("multiterm", q)
    return None


def batch_search(
    searcher: Searcher,
    queries: "list[tuple[str, object]]",
    k: int = 10,
    parser=None,
    round_to: int | None = None,
    strict: bool = False,
) -> DataFrame:
    """Serve a query log: ``queries`` is [(query_id, query)] where each
    query is a Query node or a raw query-language string (parsed with
    ``parser``). Every query is routed to the batch kernel matching its
    tree shape — Term/Or bags and Variations to ``batch_term_search``
    (auto block-max WAND), all-terms-required Ands to
    ``batch_conjunctive_search`` (chunk-intersection skipping), Phrases to
    ``batch_phrase_search`` (grouped by slop, one positional decode pass
    each), Prefixes to ``batch_prefix_search``, FuzzyTerms to
    ``batch_fuzzy_search`` (grouped by (maxdist, prefixlength)), and
    constant-score Wildcard/Regex/TermRange to ``batch_multiterm_search``
    — so N queries of the same shape share ONE posting scan + shuffle
    instead of N sequential jobs. Trees no kernel serves exactly (boosts,
    minmatch/scale, Not/nested boolean, spans, column ranges) fall back to
    the per-query engine inside the same returned union; pass
    ``strict=True`` to raise instead (a serving deployment that must never
    run per-query jobs). Returns DataFrame(query_id, doc_id, score, rank);
    queries with no matches contribute no rows.

    Fallback note: batch kernels apply ``round_to`` BEFORE their top-k
    tie-cut; fallback queries keep the engine's exact-score cut and round
    after, which can differ at a rounded k-boundary tie."""
    ix = searcher.index
    if any(isinstance(q, str) for _, q in queries):
        if parser is None:
            raise ValueError("string queries need a parser")
        queries = [(qid, parser.parse(q) if isinstance(q, str) else q)
                   for qid, q in queries]

    buckets: dict = {"term": [], "and": [], "prefix": [], "multiterm": []}
    phrase_by_slop: dict = {}
    fuzzy_by_params: dict = {}
    fallback = []
    for qid, q in queries:
        c = _classify_for_batch(q)
        if c is None:
            if strict:
                raise ValueError(
                    f"query {qid!r}: {type(q).__name__} tree has no exact "
                    "batch kernel (strict=True)")
            fallback.append((qid, q))
            continue
        kind, payload = c
        if kind == "null":
            continue
        elif kind == "phrase":
            slop, field, words = payload
            phrase_by_slop.setdefault(slop, []).append((qid, field, words))
        elif kind == "fuzzy":
            params, field, text = payload
            fuzzy_by_params.setdefault(params, []).append((qid, field, text))
        elif kind == "multiterm":
            buckets["multiterm"].append((qid, payload))
        else:
            field, terms = payload
            buckets[kind].append((qid, field, terms))

    outs = []
    if buckets["term"]:
        outs.append(batch_term_search(
            searcher, buckets["term"], k=k, round_to=round_to))
    if buckets["and"]:
        outs.append(batch_term_search(
            searcher, buckets["and"], k=k, conjunctive=True,
            round_to=round_to))
    for slop, qs in sorted(phrase_by_slop.items()):
        outs.append(batch_phrase_search(
            searcher, qs, k=k, slop=slop, round_to=round_to))
    if buckets["prefix"]:
        outs.append(batch_prefix_search(
            searcher, buckets["prefix"], k=k, round_to=round_to))
    for (maxdist, prefixlength), qs in sorted(fuzzy_by_params.items()):
        outs.append(batch_fuzzy_search(
            searcher, qs, k=k, maxdist=maxdist, prefixlength=prefixlength,
            round_to=round_to))
    if buckets["multiterm"]:
        outs.append(batch_multiterm_search(
            searcher, buckets["multiterm"], k=k, round_to=round_to))
    for qid, q in fallback:
        r = searcher.search(q, limit=k).select(
            F.lit(qid).alias("query_id"), "doc_id", "score")
        if round_to is not None:
            r = r.withColumn("score", F.round(F.col("score"), round_to))
        outs.append(_topk_window(r, k))

    if not outs:
        return ix.spark.createDataFrame(
            [], "query_id string, doc_id bigint, score double, rank int")
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
