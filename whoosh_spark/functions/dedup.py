"""Deduplication operators for training-data pipelines.

  exact_dedup          md5-groupBy, keep lowest doc_id per content group
  minhash_signatures   K-permutation MinHash over word shingles
  minhash_lsh_pairs    band-bucket join -> candidate pairs -> exact-jaccard
                       verification (the scale path: no all-pairs product)
  shingle_jaccard      exact word-shingle jaccard for candidate pairs
  simhash_signatures   64-bit SimHash bitstrings from token frequencies
  embedding_neardup    cosine >= tau pairs over an embedding column

Hash primitive everywhere is md5-prefix-base16 so every stage has an exact
DuckDB SQL equivalent; the K MinHash "permutations" are salted hashes
h_i(s) = md5_32(f"{i}:{s}") — affine (a*x+b) mod M tricks silently fail in
64-bit SQL arithmetic (without wraparound they preserve one global order,
making every permutation pick the same element).

At 100 TB the LSH path is the only viable one: signatures are one narrow
shuffle per band; candidate verification touches only bucket-colliding
pairs. Parameters (K=32 permutations, 16 bands x 2 rows, shingle width 3)
follow the standard MinHash-LSH construction (Broder; Mining of Massive
Datasets ch. 3): P(candidate | jaccard j) = 1 - (1 - j^2)^16 — 0.94 at
j=0.4, 0.998 at j=0.6. 2-row band keys avoid the 1-row trap where one hot
shingle's min-value forms giant buckets; MAX_BUCKET additionally drops any
degenerate bucket whose membership exceeds the cap (sub-quadratic guarantee
inside every bucket), mirrored exactly in the oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from whoosh_spark.functions.textstats import TOKEN_PATTERN, md5_hash64, tokens_col

K = 32
BANDS = 16
ROWS_PER_BAND = K // BANDS  # 2 minhashes per band key
SHINGLE_W = 3
# skew guard: a band bucket holding more than this many docs is degenerate
# (hot boilerplate); drop it rather than go quadratic inside it. The exact
# same cap is applied in the DuckDB oracle so results stay comparable.
MAX_BUCKET = 200


def shingles_col(text: Column, w: int = SHINGLE_W) -> Column:
    """Distinct word w-shingles (space-joined) as array<string>. Docs with
    fewer than ``w`` tokens (or null text) yield an empty array — the
    guard matters: F.sequence(1, 0) is a DESCENDING [1, 0] in Spark, so
    the unguarded version crashes slice() on any short doc."""
    toks = tokens_col(text)
    n = F.size(toks)
    idx = F.when(n >= w, F.sequence(F.lit(1), n - (w - 1))).otherwise(
        F.array().cast("array<int>"))
    sh = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, w), " "))
    return F.array_distinct(sh)


def exact_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per distinct content: (content_md5, keep_doc_id, dup_count)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_md5"))
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("dup_count"))
    )


def shingle_strings(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, shingle) — distinct word shingles as strings."""
    sh = shingles_col(F.col(text_col))
    return df.select("doc_id", F.explode(sh).alias("shingle"))


def shingle_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, shingle_hash) — distinct word shingles hashed to 32 bits."""
    return shingle_strings(df, text_col).select(
        "doc_id", md5_hash64(F.col("shingle")).alias("sh")
    )


def minhash_signatures(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, h0..h{K-1}) MinHash signature; docs with no shingles dropped.
    Permutation i = min over shingles of md5_32(f"{i}:{shingle}")."""
    st = shingle_strings(df, text_col)
    aggs = [
        F.min(md5_hash64(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"h{i}")
        for i in range(K)
    ]
    return st.groupBy("doc_id").agg(*aggs)


def band_table(sigs: DataFrame) -> DataFrame:
    """(doc_id, band, key) — band key = md5 of the band's joined values."""
    parts = []
    for band in range(BANDS):
        cols = [F.col(f"h{band * ROWS_PER_BAND + r}").cast("string") for r in range(ROWS_PER_BAND)]
        key = F.md5(F.concat_ws("_", *cols))
        parts.append(sigs.select("doc_id", F.lit(band).alias("band"), key.alias("key")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text", threshold: float = 0.5) -> DataFrame:
    """Near-duplicate pairs (a < b) with exact shingle jaccard >= threshold,
    candidates restricted to band-bucket collisions."""
    sigs = minhash_signatures(df, text_col)
    bands = band_table(sigs)
    # skew guard: drop degenerate buckets before the self-join so no bucket
    # can go quadratic (one extra narrow aggregate, no second shuffle of
    # the candidate pairs)
    bucket_n = bands.groupBy("band", "key").agg(F.count("*").alias("_bn"))
    bands = bands.join(
        bucket_n.filter(F.col("_bn") <= MAX_BUCKET).drop("_bn"),
        on=["band", "key"], how="left_semi",
    )
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), on=["band", "key"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .distinct()
    )
    st = shingle_table(df, text_col)
    sizes = st.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        cand.join(st.withColumnRenamed("doc_id", "a"), on="a")
        .join(st.withColumnRenamed("doc_id", "b").withColumnRenamed("sh", "sh_b"), on="b")
        .filter(F.col("sh") == F.col("sh_b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("n", "na"), on="a")
        .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("n", "nb"), on="b")
        .select(
            "a", "b",
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_inter")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out


def simhash_signatures(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash) — 64-bit SimHash as a '0'/'1' bitstring (msb first).

    bit_k = sign of sum over distinct tokens of tf * (bit_k(md5_64(token))*2-1).
    """
    toks = tokens_col(F.col(text_col))
    tok = (
        df.select("doc_id", F.explode(toks).alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count("*").alias("tf"))
        .withColumn("h", F.conv(F.substring(F.md5(F.col("t")), 1, 15), 16, 10).cast("long"))
    )
    # 60 usable bits from 15 hex chars; use bits 0..59 plus 4 from a second slice
    bit_cols = []
    for k in range(60):
        bit = F.shiftright(F.col("h"), k).bitwiseAND(F.lit(1))
        bit_cols.append(F.sum((bit * 2 - 1) * F.col("tf")).alias(f"s{k}"))
    h2 = F.conv(F.substring(F.md5(F.col("t")), 16, 8), 16, 10).cast("long")
    tok = tok.withColumn("h2", h2)
    for k in range(4):
        bit = F.shiftright(F.col("h2"), k).bitwiseAND(F.lit(1))
        bit_cols.append(F.sum((bit * 2 - 1) * F.col("tf")).alias(f"s{60 + k}"))
    agg = tok.groupBy("doc_id").agg(*bit_cols)
    bits = F.concat(*[F.when(F.col(f"s{k}") > 0, "1").otherwise("0") for k in range(63, -1, -1)])
    return agg.select("doc_id", bits.alias("simhash"))


SIMHASH_BANDS = 4  # 4 x 16-bit bands over the 64-bit signature


def simhash_neardup_pairs(
    df: DataFrame, text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Near-duplicate pairs (a < b, hamming) by SimHash banding: candidates
    are pairs sharing at least one of the 4 exact 16-bit bands, verified by
    full 64-bit hamming distance <= ``max_hamming``. By pigeonhole the
    4-band split is EXACT (no recall loss) for max_hamming <= 3 — the
    classic web near-dup operating point (Manku et al., WWW'07); above 3
    it is a recall-documented heuristic. Same scale shape as
    minhash_lsh_pairs: bucket join, never all-pairs, with the MAX_BUCKET
    skew cap mirrored in the SQL oracle."""
    # signatures are referenced by the band table AND both verify joins —
    # materialize once (one row per doc) instead of recomputing the
    # 64-partial-sum aggregation per reference (same localCheckpoint
    # pattern as dedup_groups)
    sigs = simhash_signatures(df, text_col).localCheckpoint(eager=False)
    band_structs = F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.substring("simhash", 16 * b + 1, 16).alias("key"))
        for b in range(SIMHASH_BANDS)
    ])
    bands = (
        sigs.select("doc_id", F.explode(band_structs).alias("bk"))
        .select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    )
    bucket_n = bands.groupBy("band", "key").agg(F.count("*").alias("_bn"))
    bands = bands.join(
        bucket_n.filter(F.col("_bn") <= MAX_BUCKET).drop("_bn"),
        on=["band", "key"], how="left_semi",
    )
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), on=["band", "key"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .distinct()
    )
    sa = sigs.select(F.col("doc_id").alias("a"), F.col("simhash").alias("_sa"))
    sb = sigs.select(F.col("doc_id").alias("b"), F.col("simhash").alias("_sb"))
    ham = F.size(F.filter(
        F.zip_with(F.split(F.col("_sa"), ""), F.split(F.col("_sb"), ""),
                   lambda x, y: x != y),
        lambda d: d,
    ))
    return (
        cand.join(sa, on="a").join(sb, on="b")
        .select("a", "b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


# ------------------------------------------------------------- oracle SQL

def _sql_shingles(text_expr: str = "lower(text)", w: int = SHINGLE_W) -> str:
    toks = f"regexp_extract_all({text_expr}, '{TOKEN_PATTERN}')"
    return (
        f"list_distinct(list_transform(range(1, greatest(len({toks}) - {w - 1}, 0) + 1), "
        f"i -> array_to_string(list_slice({toks}, i, i + {w - 1}), ' ')))"
    )


def exact_dedup_sql() -> str:
    return (
        "SELECT md5(text) AS content_md5, min(doc_id) AS keep_doc_id, "
        "count(*) AS dup_count FROM documents GROUP BY md5(text)"
    )


def _sql_hash32(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT)"


def minhash_pairs_sql(threshold: float = 0.5) -> str:
    mins = ",\n    ".join(
        "min({h}) AS h{i}".format(h=_sql_hash32(f"concat('{i}:', shingle)"), i=i)
        for i in range(K)
    )
    band_keys = []
    for band in range(BANDS):
        cols = ", ".join(f"CAST(h{band * ROWS_PER_BAND + r} AS VARCHAR)" for r in range(ROWS_PER_BAND))
        band_keys.append(f"SELECT doc_id, {band} AS band, md5(concat_ws('_', {cols})) AS key FROM sigs")
    bands_sql = " UNION ALL ".join(band_keys)
    return f"""
WITH sh AS (
  SELECT doc_id, unnest({_sql_shingles()}) AS shingle FROM documents
),
st AS (SELECT doc_id, {_sql_hash32('shingle')} AS s FROM sh),
sizes AS (SELECT doc_id, count(*) AS n FROM st GROUP BY doc_id),
sigs AS (
  SELECT doc_id,
    {mins}
  FROM sh GROUP BY doc_id
),
bands_all AS ({bands_sql}),
bands AS (
  SELECT doc_id, band, key FROM (
    SELECT *, count(*) OVER (PARTITION BY band, key) AS _bn FROM bands_all
  ) WHERE _bn <= {MAX_BUCKET}
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands x JOIN bands y ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
),
inter AS (
  SELECT c.a, c.b, count(*) AS n_inter
  FROM cand c JOIN st sa ON sa.doc_id = c.a JOIN st sb ON sb.doc_id = c.b AND sa.s = sb.s
  GROUP BY c.a, c.b
)
SELECT i.a, i.b,
       round(CAST(n_inter AS DOUBLE) / (na.n + nb.n - n_inter), 6) AS jaccard
FROM inter i JOIN sizes na ON na.doc_id = i.a JOIN sizes nb ON nb.doc_id = i.b
WHERE round(CAST(n_inter AS DOUBLE) / (na.n + nb.n - n_inter), 6) >= {threshold}
""".strip()


def simhash_sql() -> str:
    sums = []
    for k in range(60):
        sums.append(f"sum(((h >> {k}) & 1) * 2 * tf - tf) AS s{k}")
    for k in range(4):
        sums.append(f"sum(((h2 >> {k}) & 1) * 2 * tf - tf) AS s{60 + k}")
    sum_cols = ",\n    ".join(sums)
    bits = ", ".join(f"CASE WHEN s{k} > 0 THEN '1' ELSE '0' END" for k in range(63, -1, -1))
    return f"""
WITH tok AS (
  SELECT doc_id, t, count(*) AS tf FROM (
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS t FROM documents
  ) GROUP BY doc_id, t
),
h AS (
  SELECT doc_id, tf,
         CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) AS h,
         CAST(('0x' || substr(md5(t), 16, 8)) AS BIGINT) AS h2
  FROM tok
),
s AS (
  SELECT doc_id,
    {sum_cols}
  FROM h GROUP BY doc_id
)
SELECT doc_id, concat({bits}) AS simhash FROM s
""".strip()


def simhash_neardup_sql(max_hamming: int = 3) -> str:
    """DuckDB mirror of simhash_neardup_pairs (same banding + bucket cap)."""
    return f"""
WITH sig AS ({simhash_sql()}),
bands AS (
  SELECT doc_id, b.band, substr(simhash, 16 * b.band + 1, 16) AS key
  FROM sig, (SELECT unnest([0, 1, 2, 3]) AS band) b
),
ok AS (
  SELECT band, key FROM bands GROUP BY band, key HAVING count(*) <= {MAX_BUCKET}
),
kept AS (SELECT bands.* FROM bands JOIN ok USING (band, key)),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM kept x JOIN kept y
    ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
)
SELECT c.a, c.b, CAST(mismatches(sa.simhash, sb.simhash) AS INTEGER) AS hamming
FROM cand c
JOIN sig sa ON sa.doc_id = c.a
JOIN sig sb ON sb.doc_id = c.b
WHERE mismatches(sa.simhash, sb.simhash) <= {max_hamming}
""".strip()


def embedding_neardup(emb: DataFrame, tau: float = 0.95,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      dim: int | None = None) -> DataFrame:
    """Near-duplicate pairs (a < b) with exact cosine >= tau — routed through
    LSH bucket candidates (similarity.embedding_neardup_lsh), the only viable
    construction at corpus scale. The O(n^2) all-pairs variant survives as
    embedding_neardup_oracle for verification only."""
    from whoosh_spark.functions.similarity import embedding_neardup_lsh

    return embedding_neardup_lsh(emb, tau=tau, id_col=id_col, vec_col=vec_col, dim=dim)


def embedding_neardup_oracle(emb: DataFrame, tau: float = 0.95,
                             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """All pairs (a < b) with cosine >= tau. O(n^2) comparison — verification
    oracle ONLY; production near-dup goes through embedding_neardup (LSH)."""
    from whoosh_spark.functions.similarity import _valid_vectors

    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = _valid_vectors(emb, vec_col).select(F.col(id_col).alias("id"), v.alias("v"))
    dot = lambda a, b: F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    norm = base.withColumn("nrm", F.sqrt(dot(F.col("v"), F.col("v"))))
    j = (
        norm.alias("x")
        .join(norm.alias("y"), F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("a"), F.col("y.id").alias("b"),
            F.round(
                dot(F.col("x.v"), F.col("y.v")) / (F.col("x.nrm") * F.col("y.nrm")), 6
            ).alias("cosine"),
        )
    )
    return j.filter(F.col("cosine") >= tau)


def dedup_groups(pairs: DataFrame, a_col: str = "a", b_col: str = "b",
                 max_iters: int = 25) -> DataFrame:
    """(doc_id, group_id) connected components over the undirected
    near-dup pair graph (the output of ``minhash_lsh_pairs`` /
    ``embedding_neardup``); group_id = min doc_id in the component, so a
    pipeline keeps exactly one representative per duplicate cluster with
    ``WHERE doc_id = group_id`` (plus all unpaired docs).

    Distributed min-label propagation: every round each node takes the
    min of its own label and its neighbors' labels — one shuffle join +
    one groupBy per round, converging in O(component diameter) rounds.
    Near-dup clusters are dense (boilerplate families are near-cliques),
    so the diameter is tiny in practice; labels are localCheckpoint()ed
    each round to truncate the iterative lineage (the classic Spark
    iterative-algorithm trap), and driver traffic per round is ONE
    convergence count. Raises after ``max_iters`` non-converged rounds
    (a pathological path graph of length > max_iters) rather than
    looping forever; for such graphs a large-star/small-star contraction
    (O(log n) rounds) would be the next gear — not needed for the
    near-dup workload this serves.
    """
    edges = pairs.select(
        F.col(a_col).alias("x"), F.col(b_col).alias("y")
    ).union(pairs.select(F.col(b_col).alias("x"), F.col(a_col).alias("y")))
    # materialize the edge list ONCE: `pairs` is typically the whole
    # LSH/verify pipeline, and without this every round's neighbor join
    # re-runs it from the source (measured 3x end-to-end at sf0.01)
    edges = edges.localCheckpoint()
    labels = edges.select("x").distinct().withColumn("label", F.col("x"))
    labels = labels.localCheckpoint()
    for _ in range(max_iters):
        nbr = (
            edges.join(labels.withColumnRenamed("x", "y"), on="y")
            .groupBy("x")
            .agg(F.min("label").alias("nlabel"))
        )
        merged = labels.join(nbr, on="x", how="left").persist()
        changed = merged.filter(F.col("nlabel") < F.col("label")).count()
        labels = merged.select(
            "x", F.least(F.col("label"), F.coalesce("nlabel", "label")).alias("label")
        ).localCheckpoint()
        merged.unpersist()
        if changed == 0:
            return labels.select(
                F.col("x").alias("doc_id"), F.col("label").alias("group_id")
            )
    raise ValueError(
        f"dedup_groups did not converge in max_iters={max_iters} rounds; "
        "the pair graph has a component of diameter > max_iters"
    )


def dedup_groups_sql(pairs_sql: str) -> str:
    """DuckDB mirror of ``dedup_groups``: recursive closure of the
    symmetrized pair graph, then min reachable id per node."""
    return f"""
WITH RECURSIVE pairs AS ({pairs_sql}),
edges AS (
  SELECT a AS x, b AS y FROM pairs UNION SELECT b AS x, a AS y FROM pairs
),
reach(x, r) AS (
  SELECT x, x FROM (SELECT DISTINCT x FROM edges)
  UNION
  SELECT rr.x, e.y FROM reach rr JOIN edges e ON rr.r = e.x
)
SELECT x AS doc_id, min(r) AS group_id FROM reach GROUP BY x
""".strip()


def near_dedup(df: DataFrame, text_col: str = "text", threshold: float = 0.5,
               id_col: str = "doc_id") -> DataFrame:
    """Corpus -> corpus with near-duplicate clusters collapsed to one
    representative (the cluster's min id): ``minhash_lsh_pairs`` ->
    ``dedup_groups`` -> anti-join of the non-representatives. This is the
    complete dedup pipeline a training-data job runs before tokenizing —
    the anti-join side is only the clustered docs (tiny vs the corpus),
    so the corpus is never reshuffled; unpaired docs pass through
    untouched."""
    pairs = minhash_lsh_pairs(df, text_col, threshold)
    losers = (
        dedup_groups(pairs)
        .filter(F.col("doc_id") != F.col("group_id"))
        .select(F.col("doc_id").alias(id_col))
    )
    return df.join(losers, on=id_col, how="left_anti")
