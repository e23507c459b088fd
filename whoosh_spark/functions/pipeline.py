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
  gopher_quality      Gopher-style repetition/quality flags (dup-line
                      fractions, symbol/bullet/ellipsis ratios, stop-word
                      presence) as one shuffle-free column-expression scan
  line_dedup          C4-style boilerplate removal: lines occurring in
                      >= min_docs documents dropped corpus-wide via a
                      broadcast anti-join, text reassembled per doc
  pii_redact          email/IPv4/phone counting + redaction (regexp
                      column expressions, Java/RE2-common patterns)

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


#: the Gopher "must contain 2 of these" stop set (Rae et al. 2021 §A1.1)
GOPHER_STOPS = ["and", "be", "have", "of", "that", "the", "to", "with"]

#: PII patterns — common Java-regex / RE2 subset so Spark and the DuckDB
#: oracle match byte-for-byte (no lookarounds, no \p classes)
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}[-.]\d{3,4}[-.]\d{4}\b",
}


def _lines_col(text: Column) -> Column:
    """Non-empty trimmed lines as array<string>."""
    return F.filter(
        F.transform(F.split(text, "\n"), lambda l: F.trim(l)),
        lambda l: l != F.lit(""),
    )


def _ratio(num: Column, den: Column) -> Column:
    return F.round(
        F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(F.lit(0.0)), 6
    )


def gopher_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style document quality flags (Rae et al. 2021, §A1.1) as one
    pass of pure column expressions — no UDF, no shuffle, no explode:

      n_words            regex tokens (shared TOKEN_PATTERN)
      mean_word_len      bounds 3..10
      symbol_word_ratio  '#' or '...' occurrences per word, <= 0.1
      bullet_line_frac   lines starting with a bullet char, <= 0.9
      ellipsis_line_frac lines ending with '...' or an ellipsis, <= 0.3
      alpha_word_frac    words containing an ASCII letter, >= 0.8
      stop_hits          distinct GOPHER_STOPS present, >= 2
      dup_line_frac      duplicate (exact) lines per doc, <= 0.3
      dup_line_char_frac duplicate-line characters per doc, <= 0.2
      gopher_ok          1 iff every bound above holds and
                         50 <= n_words <= 100_000

    At 100 TB this is the cheapest possible shape: a single projected scan
    (whole-stage codegen), trivially partition-parallel, nothing collected.
    """
    text = F.col(text_col)
    words = tokens_col(text)
    n_words = F.size(words)
    lines = _lines_col(text)
    dlines = F.array_distinct(lines)
    n_lines = F.size(lines)
    chars = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0).cast("long"), lambda a, l: a + F.length(l)
    )
    mean_wl = F.round(
        F.when(
            n_words > 0,
            F.aggregate(words, F.lit(0.0), lambda a, w: a + F.length(w)) / n_words,
        ).otherwise(F.lit(0.0)),
        6,
    )
    dup_line_frac = _ratio(n_lines - F.size(dlines), n_lines)
    dup_char_frac = _ratio(chars(lines) - chars(dlines), chars(lines))
    symbol_ratio = _ratio(F.regexp_count(text, F.lit(r"#|\.\.\.")), n_words)
    bullet_frac = _ratio(
        F.size(F.filter(lines, lambda l: l.rlike(r"^[-*•]"))), n_lines
    )
    ellipsis_frac = _ratio(
        F.size(F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)$"))), n_lines
    )
    alpha_frac = _ratio(F.size(F.filter(words, lambda w: w.rlike("[a-z]"))), n_words)
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(w) for w in GOPHER_STOPS]),
            lambda w: F.array_contains(words, w),
        )
    )
    out = df.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        symbol_ratio.alias("symbol_word_ratio"),
        bullet_frac.alias("bullet_line_frac"),
        ellipsis_frac.alias("ellipsis_line_frac"),
        alpha_frac.alias("alpha_word_frac"),
        stop_hits.alias("stop_hits"),
        dup_line_frac.alias("dup_line_frac"),
        dup_char_frac.alias("dup_line_char_frac"),
    )
    ok = (
        (F.col("n_words") >= 50)
        & (F.col("n_words") <= 100_000)
        & (F.col("mean_word_len") >= 3.0)
        & (F.col("mean_word_len") <= 10.0)
        & (F.col("symbol_word_ratio") <= 0.1)
        & (F.col("bullet_line_frac") <= 0.9)
        & (F.col("ellipsis_line_frac") <= 0.3)
        & (F.col("alpha_word_frac") >= 0.8)
        & (F.col("stop_hits") >= 2)
        & (F.col("dup_line_frac") <= 0.3)
        & (F.col("dup_line_char_frac") <= 0.2)
    )
    return out.withColumn("gopher_ok", ok.cast("int"))


def gopher_quality_sql(table: str = "documents", text_expr: str = "text") -> str:
    stops = ", ".join(f"'{w}'" for w in GOPHER_STOPS)
    lsum = (
        "CASE WHEN len({a}) = 0 THEN 0 ELSE list_reduce("
        "list_prepend(CAST(0 AS BIGINT), list_transform({a}, x -> CAST(length(x) AS BIGINT))),"
        " (a, b) -> a + b) END"
    )
    return f"""
WITH d AS (SELECT doc_id, {text_expr} AS text FROM {table}),
t AS (
  SELECT doc_id,
         regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS words,
         list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
                     x -> x <> '') AS lines,
         len(regexp_extract_all(text, '#|\\.\\.\\.')) AS symbol_hits
  FROM d
), m AS (
  SELECT doc_id, len(words) AS n_words, len(lines) AS n_lines,
         len(list_distinct(lines)) AS n_dlines,
         {lsum.format(a="lines")} AS chars_all,
         {lsum.format(a="list_distinct(lines)")} AS chars_dist,
         CASE WHEN len(words) > 0 THEN round(
           list_reduce(list_prepend(0.0, list_transform(words, x -> CAST(length(x) AS DOUBLE))),
                       (a, b) -> a + b) / len(words), 6) ELSE 0.0 END AS mean_word_len,
         symbol_hits,
         len(list_filter(lines, x -> regexp_matches(x, '^[-*•]'))) AS bullet_hits,
         len(list_filter(lines, x -> regexp_matches(x, '(\\.\\.\\.|…)$'))) AS ellipsis_hits,
         len(list_filter(words, x -> regexp_matches(x, '[a-z]'))) AS alpha_hits,
         len(list_filter([{stops}], x -> list_contains(words, x))) AS stop_hits
  FROM t
), r AS (
  SELECT doc_id, n_words, mean_word_len,
    CASE WHEN n_words > 0 THEN round(CAST(symbol_hits AS DOUBLE) / n_words, 6) ELSE 0.0 END AS symbol_word_ratio,
    CASE WHEN n_lines > 0 THEN round(CAST(bullet_hits AS DOUBLE) / n_lines, 6) ELSE 0.0 END AS bullet_line_frac,
    CASE WHEN n_lines > 0 THEN round(CAST(ellipsis_hits AS DOUBLE) / n_lines, 6) ELSE 0.0 END AS ellipsis_line_frac,
    CASE WHEN n_words > 0 THEN round(CAST(alpha_hits AS DOUBLE) / n_words, 6) ELSE 0.0 END AS alpha_word_frac,
    stop_hits,
    CASE WHEN n_lines > 0 THEN round(CAST(n_lines - n_dlines AS DOUBLE) / n_lines, 6) ELSE 0.0 END AS dup_line_frac,
    CASE WHEN chars_all > 0 THEN round(CAST(chars_all - chars_dist AS DOUBLE) / chars_all, 6) ELSE 0.0 END AS dup_line_char_frac
  FROM m
)
SELECT *,
  CAST(n_words BETWEEN 50 AND 100000
   AND mean_word_len BETWEEN 3.0 AND 10.0
   AND symbol_word_ratio <= 0.1
   AND bullet_line_frac <= 0.9
   AND ellipsis_line_frac <= 0.3
   AND alpha_word_frac >= 0.8
   AND stop_hits >= 2
   AND dup_line_frac <= 0.3
   AND dup_line_char_frac <= 0.2 AS INT) AS gopher_ok
FROM r
"""


def line_dedup(df: DataFrame, min_docs: int = 3, text_col: str = "text") -> DataFrame:
    """C4-style boilerplate line removal (Raffel et al. 2020 §2.2): drop
    every line whose trimmed form occurs in >= ``min_docs`` distinct
    documents, corpus-wide. Returns per doc
    ``(doc_id, n_lines, n_kept, clean_md5)`` where clean_md5 hashes the
    surviving lines rejoined in original order (md5('') when everything
    was boilerplate).

    Scale shape (100 TB lens): one explode + one groupBy on the line text
    (map-side combine collapses repeats before the shuffle); then an
    anti-join against the hot set and one groupBy doc_id to reassemble.
    The corpus text itself is shuffled once (the reassembly), never joined
    against itself. The hot-set join strategy is deliberately left to AQE:
    at web scale the set of ALL lines occurring in >= min_docs documents
    is unbounded (every 3+-occurrence line, not just cookie banners), so a
    forced broadcast would OOM — AQE broadcasts when the runtime size is
    actually small and falls back to a shuffle join otherwise, with
    identical anti-join semantics. Size the set first with
    ``hot_line_stats`` when auditing a new corpus.
    """
    lines = (
        df.select("doc_id", F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"))
        .withColumn("norm", F.trim("line"))
        .filter(F.col("norm") != "")
    )
    totals = lines.groupBy("doc_id").agg(F.count("*").alias("n_lines"))
    hot = (
        lines.groupBy("norm")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("norm")
    )
    kept = lines.join(hot, "norm", "left_anti")
    clean = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda x: x["line"],
                ),
                "\n",
            )
        ).alias("clean_md5"),
    )
    return totals.join(clean, "doc_id", "left").select(
        "doc_id",
        "n_lines",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.coalesce("clean_md5", F.md5(F.lit(""))).alias("clean_md5"),
    )


def hot_line_stats(df: DataFrame, min_docs: int = 3,
                   text_col: str = "text") -> DataFrame:
    """Diagnostic for line_dedup (the lsh_dropped_buckets analog): the
    boilerplate lines the threshold would drop, with their distinct-doc
    counts — ``.count()`` it (or sum lengths) before trusting any
    broadcast assumption about the hot set on a new corpus."""
    lines = (
        df.select("doc_id", F.explode(F.split(F.col(text_col), "\n")).alias("line"))
        .select("doc_id", F.trim("line").alias("norm"))
        .filter(F.col("norm") != "")
    )
    return (
        lines.groupBy("norm")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
    )


def line_dedup_sql(
    min_docs: int = 3, table: str = "documents", text_expr: str = "text"
) -> str:
    return f"""
WITH d AS (SELECT doc_id, {text_expr} AS text FROM {table}),
l AS (
  SELECT doc_id, pos, line, trim(line) AS norm FROM (
    SELECT doc_id,
           unnest(string_split(text, chr(10))) AS line,
           generate_subscripts(string_split(text, chr(10)), 1) AS pos
    FROM d)
  WHERE trim(line) <> ''
),
tot AS (SELECT doc_id, count(*) AS n_lines FROM l GROUP BY doc_id),
hot AS (SELECT norm FROM l GROUP BY norm HAVING count(DISTINCT doc_id) >= {min_docs}),
kept AS (SELECT * FROM l WHERE norm NOT IN (SELECT norm FROM hot)),
c AS (SELECT doc_id, count(*) AS n_kept,
             md5(string_agg(line, chr(10) ORDER BY pos)) AS clean_md5
      FROM kept GROUP BY doc_id)
SELECT doc_id, n_lines, coalesce(n_kept, 0) AS n_kept,
       coalesce(clean_md5, md5('')) AS clean_md5
FROM tot LEFT JOIN c USING (doc_id)
"""


def pii_redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Count and redact PII-shaped spans (emails, IPv4s, phone-shaped
    numbers). Returns ``(doc_id, n_emails, n_ipv4, n_phones,
    redacted_md5)`` — redacted_md5 hashes the text with each match
    replaced by ``<EMAIL>``/``<IPV4>``/``<PHONE>``, applied in that order
    (so an address inside an email never double-matches).

    Pure regexp column expressions, single projected scan — the same
    100 TB shape as gopher_quality. Patterns are deliberately the common
    Java/RE2 subset so the DuckDB oracle matches byte-for-byte.
    """
    text = F.col(text_col)
    red = text
    for name, pat in PII_PATTERNS.items():
        red = F.regexp_replace(red, pat, f"<{name.upper()}>")
    return df.select(
        "doc_id",
        F.regexp_count(text, F.lit(PII_PATTERNS["email"])).alias("n_emails"),
        F.regexp_count(text, F.lit(PII_PATTERNS["ipv4"])).alias("n_ipv4"),
        F.regexp_count(text, F.lit(PII_PATTERNS["phone"])).alias("n_phones"),
        F.md5(red).alias("redacted_md5"),
    )


def pii_redact_sql(table: str = "documents", text_expr: str = "text") -> str:
    # DuckDB single-quoted strings are escape-free: the Python pattern
    # string passes through verbatim (only ' would need doubling; none do)
    red = "text"
    for name, pat in PII_PATTERNS.items():
        red = f"regexp_replace({red}, '{pat}', '<{name.upper()}>', 'g')"
    return f"""
WITH d AS (SELECT doc_id, {text_expr} AS text FROM {table})
SELECT doc_id,
  len(regexp_extract_all(text, '{PII_PATTERNS["email"]}')) AS n_emails,
  len(regexp_extract_all(text, '{PII_PATTERNS["ipv4"]}')) AS n_ipv4,
  len(regexp_extract_all(text, '{PII_PATTERNS["phone"]}')) AS n_phones,
  md5({red}) AS redacted_md5
FROM d
"""


def decorate_docs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministically decorate a corpus with multi-line structure for
    the line/quality/PII operators' driver oracles (the synthetic corpus
    is single-line and PII-free): shared boilerplate footers (7 variants
    -> corpus-hot), a per-doc unique line, periodic intra-doc duplicate
    footers, bullet/ellipsis/symbol lines, and synthetic emails/IPs/phone
    numbers. ``decorate_sql`` is the byte-identical DuckDB mirror."""
    d = F.col("doc_id")
    nl = F.lit("\n")
    foot = F.concat(F.lit("boilerplate footer "), (d % 7).cast("string"))
    parts = [
        F.col(text_col),
        nl,
        foot,
        nl,
        F.concat(F.lit("unique line "), d.cast("string")),
        F.when(d % 4 == 0, F.concat(nl, foot)).otherwise(F.lit("")),
        F.when(d % 5 == 0, F.lit("\n- bullet item one\n- bullet item two")).otherwise(F.lit("")),
        F.when(d % 11 == 0, F.lit("\nto be continued...")).otherwise(F.lit("")),
        F.when(d % 13 == 0, F.lit("\n### symbols # here #")).otherwise(F.lit("")),
        F.when(
            d % 4 == 0,
            F.concat(F.lit("\ncontact user"), d.cast("string"), F.lit("@example.com")),
        ).otherwise(F.lit("")),
        F.when(
            d % 6 == 0,
            F.concat(F.lit("\nhost 10.1."), (d % 200).cast("string"), F.lit(".7")),
        ).otherwise(F.lit("")),
        F.when(d % 9 == 0, F.lit("\ncall 555-867-5309")).otherwise(F.lit("")),
    ]
    return df.withColumn(text_col, F.concat(*parts))


def decorate_sql(text_expr: str = "text", id_expr: str = "doc_id") -> str:
    """DuckDB expression producing exactly ``decorate_docs``'s text."""
    foot = f"'boilerplate footer ' || CAST({id_expr} % 7 AS VARCHAR)"
    return (
        f"{text_expr} || chr(10) || {foot} || chr(10) || "
        f"'unique line ' || CAST({id_expr} AS VARCHAR)"
        f" || CASE WHEN {id_expr} % 4 = 0 THEN chr(10) || {foot} ELSE '' END"
        f" || CASE WHEN {id_expr} % 5 = 0 THEN chr(10) || '- bullet item one' || chr(10) || '- bullet item two' ELSE '' END"
        f" || CASE WHEN {id_expr} % 11 = 0 THEN chr(10) || 'to be continued...' ELSE '' END"
        f" || CASE WHEN {id_expr} % 13 = 0 THEN chr(10) || '### symbols # here #' ELSE '' END"
        f" || CASE WHEN {id_expr} % 4 = 0 THEN chr(10) || 'contact user' || CAST({id_expr} AS VARCHAR) || '@example.com' ELSE '' END"
        f" || CASE WHEN {id_expr} % 6 = 0 THEN chr(10) || 'host 10.1.' || CAST({id_expr} % 200 AS VARCHAR) || '.7' ELSE '' END"
        f" || CASE WHEN {id_expr} % 9 = 0 THEN chr(10) || 'call 555-867-5309' ELSE '' END"
    )


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
