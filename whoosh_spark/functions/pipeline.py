"""Training-data pipeline operators: deterministic corpus mixing,
sequence packing, and benchmark-contamination flagging.

  mixture_sample      per-stratum sampling at exact, reproducible rates
                      (the "data mixing" step of an LLM pre-training
                      pipeline: lang/source/quality strata get different
                      keep-rates)
  sequence_pack       greedy doc -> context-window packing: documents are
                      laid end-to-end per stratum in doc_id order and cut
                      into fixed token windows; each doc is labeled with
                      the window (bin) its first token lands in
  contamination_flag  docs sharing any word w-shingle with a benchmark /
                      eval set (n-gram-overlap decontamination, the
                      standard 8-to-13-gram check scaled down to the
                      shared SHINGLE_W so the oracle machinery is reused)

Like functions/dedup.py, every hash is md5-prefix-base16 so each operator
has an exact DuckDB SQL mirror (no rand()/monotonically_increasing_id —
reruns and the oracle agree bit-for-bit).

Scale notes (100 TB lens):
- mixture_sample is a broadcast join of a k-row rates table + one scan;
  no shuffle of the corpus. Never a driver-side sample() — rates must be
  exact and reproducible across reruns and engines.
- sequence_pack is one shuffle (window partitioned by stratum). Hot
  strata skew the window; pass ``shard_docs`` to pack per
  (stratum, doc_id-range shard) instead — offsets reset per shard, which
  is what a distributed packer does anyway (each worker packs its shard
  independently; a window boundary between shards wastes at most one
  partial window per shard).
- contamination_flag broadcasts the benchmark shingle set (eval sets are
  tiny vs the corpus) — corpus side is scan + explode + semi-join-shaped
  aggregation, no corpus x corpus product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from whoosh_spark.functions.dedup import SHINGLE_W, _sql_shingles, shingle_table
from whoosh_spark.functions.textstats import TOKEN_PATTERN, md5_hash64, tokens_col

#: resolution of the sampling hash: rates are exact multiples of 1e-6
MIX_BUCKETS = 1_000_000


def _mix_bucket(key: Column, salt: str) -> Column:
    """Deterministic bucket in [0, MIX_BUCKETS) from a row key — the
    reproducible stand-in for rand() (same row -> same verdict on every
    run, every engine)."""
    return md5_hash64(F.concat(F.lit(f"{salt}:"), key.cast("string"))) % MIX_BUCKETS


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    strat_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Keep each row of stratum s with probability ``rates[s]`` —
    deterministically (hash of the row key, not rand()). Strata missing
    from ``rates`` are dropped (rate 0). The rates ride a broadcast join,
    so arbitrarily many strata never become a Catalyst CASE chain."""
    spark = df.sparkSession
    rates_df = spark.createDataFrame(
        [(s, int(round(r * MIX_BUCKETS))) for s, r in sorted(rates.items())],
        f"{strat_col} string, keep_below long",
    )
    bucket = _mix_bucket(F.col(key_col), salt)
    return (
        df.join(F.broadcast(rates_df), on=strat_col, how="inner")
        .filter(bucket < F.col("keep_below"))
        .drop("keep_below")
    )


def mixture_sample_sql(
    rates: dict[str, float],
    strat_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "mix",
    table: str = "documents",
    select: str = "doc_id, lang",
) -> str:
    vals = ", ".join(
        f"('{s}', {int(round(r * MIX_BUCKETS))})" for s, r in sorted(rates.items())
    )
    bucket = (
        f"CAST(('0x' || substr(md5(concat('{salt}:', CAST({key_col} AS VARCHAR))), 1, 8)) "
        f"AS BIGINT) % {MIX_BUCKETS}"
    )
    return f"""
WITH rates({strat_col}, keep_below) AS (VALUES {vals})
SELECT {select} FROM {table} JOIN rates USING ({strat_col})
WHERE {bucket} < keep_below
"""


def sequence_pack(
    df: DataFrame,
    window_tokens: int = 2048,
    strat_col: str = "lang",
    text_col: str = "text",
    shard_docs: int | None = None,
) -> DataFrame:
    """(doc_id, <strat_col>[, shard], n_tokens, start_offset, bin_id):
    documents laid end-to-end per stratum in doc_id order; ``bin_id`` is
    the ``window_tokens``-sized window the doc's first token lands in.
    With ``shard_docs`` the running offset resets per doc_id-range shard
    (the distributed-packer layout; see module scale notes)."""
    n_tok = F.size(tokens_col(F.col(text_col))).cast("long")
    parts = [strat_col]
    cols = ["doc_id", strat_col]
    out = df.select("doc_id", strat_col, n_tok.alias("n_tokens"))
    if shard_docs is not None:
        out = out.withColumn("shard", (F.col("doc_id") / F.lit(shard_docs)).cast("long"))
        parts.append("shard")
        cols.append("shard")
    w = (
        Window.partitionBy(*parts)
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_offset")
    return out.select(
        *cols,
        "n_tokens",
        start,
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / F.lit(window_tokens))
        .alias("bin_id"),
    )


def sequence_pack_sql(
    window_tokens: int = 2048,
    strat_col: str = "lang",
    table: str = "documents",
) -> str:
    toks = f"len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}'))"
    return f"""
WITH t AS (SELECT doc_id, {strat_col}, CAST({toks} AS BIGINT) AS n_tokens FROM {table}),
c AS (SELECT doc_id, {strat_col}, n_tokens,
             sum(n_tokens) OVER (PARTITION BY {strat_col} ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             - n_tokens AS start_offset
      FROM t)
SELECT doc_id, {strat_col}, n_tokens, start_offset,
       CAST(floor(start_offset / {window_tokens}) AS BIGINT) AS bin_id
FROM c
"""


def contamination_flag(
    df: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    w: int = SHINGLE_W,
) -> DataFrame:
    """(doc_id, n_hits): corpus docs sharing >= 1 distinct word w-shingle
    with the benchmark set, with the count of distinct shared shingles.
    The benchmark shingle set is broadcast — the corpus never shuffles."""
    doc_sh = shingle_table(df, text_col)
    bench_sh = shingle_table(bench, text_col).select("sh").distinct()
    return (
        doc_sh.join(F.broadcast(bench_sh), on="sh", how="inner")
        .groupBy("doc_id")
        .agg(F.count_distinct("sh").alias("n_hits"))
    )


def contamination_flag_sql(
    bench_pred: str,
    table: str = "documents",
    w: int = SHINGLE_W,
) -> str:
    """``bench_pred``: SQL predicate selecting the benchmark rows out of
    ``table`` (the driver entry derives its benchmark deterministically
    from the corpus itself)."""
    sh = _sql_shingles("lower(text)", w)
    hash32 = "CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT)"
    return f"""
WITH doc_sh AS (
  SELECT DISTINCT doc_id, {hash32} AS sh
  FROM (SELECT doc_id, unnest({sh}) AS shingle FROM {table})
),
bench_sh AS (
  SELECT DISTINCT {hash32} AS sh
  FROM (SELECT unnest({sh}) AS shingle FROM {table} WHERE {bench_pred})
)
SELECT doc_id, count(DISTINCT sh) AS n_hits
FROM doc_sh JOIN bench_sh USING (sh)
GROUP BY doc_id
"""
