"""Text analysis for large-scale training-data pipelines.

All operators are pure Spark column expressions (JVM-side, codegen-friendly,
no UDFs) and deliberately restricted to functions with exact DuckDB
equivalents so the driver's oracle gate can verify them:

  token_count       regex token count + whitespace word count
  quality_score     length / punctuation / stopword-ratio heuristic
  lang_id_heuristic marker-word voting language ID
  doc_fingerprint   order-sensitive rolling hash over tokens
  md5_hash64        md5-prefix -> bigint (the shared hash primitive)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from whoosh_spark.analysis.tokenize import DEFAULT_PATTERN, STOP_WORDS

TOKEN_PATTERN = DEFAULT_PATTERN
FP_MOD = 2147483647  # 2^31 - 1
FP_BASE = 31

# marker vocabularies for the language-ID heuristic (deterministic, tiny)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"],
    "fr": ["le", "la", "les", "et", "est", "une", "pour", "que", "dans", "pas"],
    "es": ["el", "los", "las", "es", "una", "para", "que", "con", "por", "como"],
    "zh": ["de", "shi", "le", "bu", "wo", "ni", "ta", "zai", "you", "men"],
}


def tokens_col(text: Column) -> Column:
    """All lowercased regex tokens (no stop filter) as array<string>."""
    return F.regexp_extract_all(F.lower(text), F.lit(TOKEN_PATTERN), 0)


def md5_hash64(c: Column, hex_chars: int = 8) -> Column:
    """Deterministic 32/60-bit hash shared with the DuckDB oracle:
    first ``hex_chars`` hex digits of md5, parsed base-16."""
    return F.conv(F.substring(F.md5(c), 1, hex_chars), 16, 10).cast("long")


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    toks = tokens_col(F.col(text_col))
    return df.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("n_ws_words"),
        F.length(F.col(text_col)).alias("n_chars"),
    )


def quality_col(text: Column) -> Column:
    """The quality heuristic as a reusable column expression (see
    ``quality_score``) — also used by the streaming ingest monitor."""
    toks = tokens_col(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    stops_arr = F.array(*[F.lit(w) for w in sorted(STOP_WORDS)])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stops_arr, t)))
    punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    len_ok = F.when((n_tok >= 10) & (n_tok <= 1000), 1.0).otherwise(0.0)
    punct_ratio = F.when(n_chars > 0, punct.cast("double") / n_chars.cast("double")).otherwise(F.lit(1.0))
    stop_ratio = F.when(n_tok > 0, n_stop.cast("double") / n_tok.cast("double")).otherwise(F.lit(0.0))
    stop_ok = F.when((stop_ratio >= 0.01) & (stop_ratio <= 0.6), 1.0).otherwise(0.0)
    mean_wl = F.when(n_tok > 0, (F.aggregate(toks, F.lit(0.0), lambda a, t: a + F.length(t)) / n_tok)).otherwise(F.lit(0.0))
    wl_ok = F.when((mean_wl >= 2.0) & (mean_wl <= 12.0), 1.0).otherwise(0.0)
    return F.round(0.25 * len_ok + 0.25 * (1.0 - punct_ratio) + 0.25 * stop_ok + 0.25 * wl_ok, 6)


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic quality heuristic in [0, 1]:
    0.25*len_ok + 0.25*(1 - punct_ratio) + 0.25*stop_ratio_ok + 0.25*word_len_ok."""
    return df.select("doc_id", quality_col(F.col(text_col)).alias("quality"))


def lang_id_heuristic(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word voting: predicted language = argmax marker hits
    (ties broken by language code ascending); 'und' when no marker hits."""
    toks = tokens_col(F.col(text_col))
    scores = []
    for lang in sorted(LANG_MARKERS):
        markers = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))
        scores.append((lang, hits))
    best = F.greatest(*[s for _, s in scores])
    pred = F.lit("und")
    for lang, s in reversed(scores):  # earlier langs win ties -> apply last
        pred = F.when((s == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return df.select("doc_id", pred.alias("pred_lang"))


def doc_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Order-sensitive rolling hash over all tokens:
    h = fold(h*31 + md5_32(token) mod (2^31-1))."""
    toks = tokens_col(F.col(text_col))
    fp = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * FP_BASE + F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")) % FP_MOD,
    )
    return df.select("doc_id", fp.alias("fingerprint"))


# ------------------------------------------------------------- oracle SQL

def sql_tokens(text_expr: str = "lower(text)") -> str:
    return f"regexp_extract_all({text_expr}, '{TOKEN_PATTERN}')"


def token_count_sql() -> str:
    return (
        f"SELECT doc_id, len({sql_tokens()}) AS n_tokens, "
        r"len(regexp_split_to_array(trim(text), '\s+')) AS n_ws_words, "
        "length(text) AS n_chars FROM documents"
    )


def quality_score_sql() -> str:
    stops = ",".join(f"'{w}'" for w in sorted(STOP_WORDS))
    return f"""
WITH t AS (
  SELECT doc_id, text, {sql_tokens()} AS toks, length(text) AS n_chars FROM documents
), m AS (
  SELECT doc_id, n_chars, len(toks) AS n_tok,
         len(list_filter(toks, x -> x IN ({stops}))) AS n_stop,
         n_chars - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS punct,
         CASE WHEN len(toks) > 0
              THEN list_reduce(list_transform(toks, x -> CAST(length(x) AS DOUBLE)), (a, b) -> a + b) / len(toks)
              ELSE 0.0 END AS mean_wl
  FROM t
)
SELECT doc_id,
  round(0.25 * (CASE WHEN n_tok BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.0 END)
      + 0.25 * (1.0 - CASE WHEN n_chars > 0 THEN CAST(punct AS DOUBLE)/n_chars ELSE 1.0 END)
      + 0.25 * (CASE WHEN n_tok > 0 AND CAST(n_stop AS DOUBLE)/n_tok BETWEEN 0.01 AND 0.6 THEN 1.0 ELSE 0.0 END)
      + 0.25 * (CASE WHEN mean_wl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END), 6) AS quality
FROM m
""".strip()


def lang_id_sql() -> str:
    parts = []
    for lang in sorted(LANG_MARKERS):
        markers = ",".join(f"'{w}'" for w in LANG_MARKERS[lang])
        parts.append(f"len(list_filter(toks, x -> x IN ({markers}))) AS s_{lang}")
    score_cols = ", ".join(parts)
    langs = sorted(LANG_MARKERS)
    best = "greatest(" + ", ".join(f"s_{l}" for l in langs) + ")"
    # CASE checks languages in ascending code order -> first match wins ties,
    # matching the Spark side (earlier langs applied last in the when-chain)
    conds = " ".join(
        f"WHEN s_{lang} = best AND best > 0 THEN '{lang}'" for lang in langs
    )
    return f"""
WITH t AS (SELECT doc_id, {sql_tokens()} AS toks FROM documents),
sc AS (SELECT doc_id, {score_cols} FROM t),
b AS (SELECT *, {best} AS best FROM sc)
SELECT doc_id, CASE {conds} ELSE 'und' END AS pred_lang FROM b
""".strip()


def doc_fingerprint_sql() -> str:
    return f"""
WITH t AS (SELECT doc_id, {sql_tokens()} AS toks FROM documents)
SELECT doc_id,
  list_reduce(
    list_prepend(CAST(0 AS BIGINT), list_transform(toks, x -> CAST(('0x' || substr(md5(x),1,8)) AS BIGINT))),
    (acc, h) -> (acc * {FP_BASE} + h) % {FP_MOD}
  ) AS fingerprint
FROM t
""".strip()
