"""Similarity search over embedding columns.

  brute_cosine_topk   exact top-k by cosine for a set of query vectors —
                      the correctness baseline (and DuckDB-verifiable)
  lsh_buckets         random-hyperplane signs -> bucket key (deterministic
                      pseudo-hyperplanes derived from md5, no stored model)
  lsh_cosine_topk     ANN: candidates restricted to LSH bucket collisions
                      with 1-bit-flip multi-probe (each query bucket is
                      probed as itself plus every single-bit variant, so
                      vectors one hyperplane-sign away are still found),
                      exact cosine re-rank — the 100 TB path (bucket join
                      instead of an all-pairs product); DuckDB-mirrored by
                      lsh_cosine_topk_sql
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

N_PLANES = 16
N_TABLES = 4
# near-dup pair search uses shorter bucket keys across more tables (recall
# over precision — the exact-cosine stage removes false positives)
ND_PLANES = 8
ND_TABLES = 4
MAX_BUCKET = 200  # skew guard: drop degenerate buckets (mirrored in SQL)


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _valid_vectors(df: DataFrame, vec_col: str) -> DataFrame:
    """Drop null and zero-norm vectors before any cosine math: cosine is
    undefined for them, and under ANSI SQL a SINGLE zero vector anywhere
    in a 100 TB corpus would fail the whole job with DIVIDE_BY_ZERO."""
    v = _as_double(F.col(vec_col))
    return df.filter(F.col(vec_col).isNotNull() & (_dot(v, v) > 0))


def _pseudo_plane(table: int, plane: int, dim: int) -> list[float]:
    """Deterministic unit-less hyperplane: component j from md5 bits."""
    import hashlib

    out = []
    for j in range(dim):
        h = hashlib.md5(f"plane:{table}:{plane}:{j}".encode()).hexdigest()
        out.append((int(h[:8], 16) / float(1 << 31)) - 1.0)  # [-1, 1)
    return out


def brute_cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query vector: (query_id, vec_id, cosine).

    queries: DataFrame with (query_id, embedding). The query side is
    broadcast — at 100 TB the corpus stays distributed and each partition
    scores locally; ties break by vec_id ascending."""
    emb = _valid_vectors(emb, vec_col)
    queries = _valid_vectors(queries, vec_col)
    base = emb.select(F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v"))
    base = base.withColumn("nrm", F.sqrt(_dot(F.col("v"), F.col("v"))))
    qs = queries.select(
        F.col("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qnrm", F.sqrt(_dot(F.col("qv"), F.col("qv"))))
    joined = base.crossJoin(F.broadcast(qs))
    scored = joined.select(
        "query_id", "vec_id",
        F.round(_dot(F.col("v"), F.col("qv")) / (F.col("nrm") * F.col("qnrm")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def brute_cosine_topk_sql(n_queries: int = 3, k: int = 5) -> str:
    """DuckDB oracle for brute_cosine_topk with queries = vec_id < n."""
    return f"""
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
),
q AS (SELECT vec_id AS query_id, v AS qv FROM base WHERE vec_id < {n_queries}),
scored AS (
  SELECT q.query_id, b.vec_id,
         round(list_dot_product(b.v, q.qv)
               / (sqrt(list_dot_product(b.v, b.v)) * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine
  FROM base b CROSS JOIN q
)
SELECT query_id, vec_id, cosine FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn
  FROM scored
) WHERE rn <= {k}
""".strip()


def embedding_neardup_sql(tau: float) -> str:
    return f"""
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
),
n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM base)
SELECT x.vec_id AS a, y.vec_id AS b,
       round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6) AS cosine
FROM n x JOIN n y ON x.vec_id < y.vec_id
WHERE round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6) >= {tau}
""".strip()


def lsh_buckets(emb: DataFrame, dim: int, id_col: str = "vec_id",
                vec_col: str = "embedding", n_tables: int = N_TABLES,
                n_planes: int = N_PLANES) -> DataFrame:
    """(vec_id, table, bucket) — sign pattern of deterministic hyperplanes.
    Null/zero vectors are excluded (cosine undefined downstream)."""
    base = _valid_vectors(emb, vec_col).select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v"))
    parts = []
    for t in range(n_tables):
        bits = []
        for p in range(n_planes):
            plane = F.array(*[F.lit(c) for c in _pseudo_plane(t, p, dim)])
            bits.append(F.when(_dot(F.col("v"), plane) >= 0, "1").otherwise("0"))
        parts.append(
            base.select("vec_id", F.lit(t).alias("table"), F.concat(*bits).alias("bucket"))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def lsh_dropped_buckets(emb: DataFrame, dim: int, id_col: str = "vec_id",
                        vec_col: str = "embedding", n_tables: int = ND_TABLES,
                        n_planes: int = ND_PLANES,
                        max_bucket: int = MAX_BUCKET) -> DataFrame:
    """Diagnostic: (table, bucket, members) for every bucket the skew cap
    drops. Non-empty output means some non-identical near-pairs inside those
    buckets rely on colliding in ANOTHER table (identical vectors are safe
    regardless — the exact-dup pre-pass in lsh_pair_candidates bypasses the
    cap). Count this in audits instead of guessing recall."""
    buckets = lsh_buckets(emb, dim, id_col, vec_col, n_tables=n_tables, n_planes=n_planes)
    return (
        buckets.groupBy("table", "bucket")
        .agg(F.count("*").alias("members"))
        .filter(F.col("members") > max_bucket)
    )


def lsh_pair_candidates(emb: DataFrame, dim: int, id_col: str = "vec_id",
                        vec_col: str = "embedding", n_tables: int = ND_TABLES,
                        n_planes: int = ND_PLANES,
                        max_bucket: int = MAX_BUCKET) -> DataFrame:
    """(a, b) candidate pairs (a < b) sharing an LSH bucket in any table,
    with degenerate buckets (> max_bucket members) dropped so no bucket's
    self-join can go quadratic — the scale path for pairwise similarity.

    Exact duplicates are exempt from the cap: a bitwise-equality self-join
    (hash-bucketed, so it shuffles on a 4-byte key, not the vector) emits
    every identical-vector pair even when its LSH bucket is oversized —
    without this, the cap would silently zero recall for exactly the hot
    boilerplate clusters dedup targets (round-2 ADVICE)."""
    base = _valid_vectors(emb, vec_col).select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v"))
    buckets = lsh_buckets(emb, dim, id_col, vec_col, n_tables=n_tables, n_planes=n_planes)
    sizes = buckets.groupBy("table", "bucket").agg(F.count("*").alias("_bn"))
    kept = buckets.join(
        sizes.filter(F.col("_bn") <= max_bucket).drop("_bn"),
        on=["table", "bucket"], how="left_semi",
    )
    lsh_pairs = (
        kept.alias("x")
        .join(kept.alias("y"), on=["table", "bucket"])
        .filter(F.col("x.vec_id") < F.col("y.vec_id"))
        .select(F.col("x.vec_id").alias("a"), F.col("y.vec_id").alias("b"))
    )
    hashed = base.select("vec_id", F.hash(F.col("v")).alias("_vh"), "v")
    exact_pairs = (
        hashed.alias("x")
        .join(
            hashed.alias("y"),
            (F.col("x._vh") == F.col("y._vh"))
            & (F.col("x.v") == F.col("y.v"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .select(F.col("x.vec_id").alias("a"), F.col("y.vec_id").alias("b"))
    )
    return lsh_pairs.unionByName(exact_pairs).distinct()


def embedding_neardup_lsh(emb: DataFrame, tau: float = 0.95, id_col: str = "vec_id",
                          vec_col: str = "embedding", dim: int | None = None,
                          n_tables: int = ND_TABLES, n_planes: int = ND_PLANES) -> DataFrame:
    """Near-duplicate pairs (a < b, exact cosine >= tau), candidates
    restricted to LSH bucket collisions — the default at-scale near-dup
    (the all-pairs variant survives as dedup.embedding_neardup_oracle for
    verification only). Exact-duplicate recall is 1.0 — guaranteed by the
    equality pre-pass in lsh_pair_candidates, NOT by bucket sharing (the
    skew cap can drop an oversized bucket); near-pair recall follows the
    standard random-hyperplane curve 1-(1-(1-theta/pi)^n_planes)^n_tables
    minus whatever mass sits in capped buckets (count those with
    lsh_dropped_buckets)."""
    if dim is None:
        head = _valid_vectors(emb, vec_col).select(vec_col).head()
        dim = len(head[0]) if head else 0
    if not dim:
        return emb.sparkSession.createDataFrame(
            [], "a long, b long, cosine double"
        )
    cand = lsh_pair_candidates(emb, dim, id_col, vec_col, n_tables, n_planes)
    base = emb.select(F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v"))
    base = base.withColumn("nrm", F.sqrt(_dot(F.col("v"), F.col("v"))))
    scored = (
        cand.join(base.select(F.col("vec_id").alias("a"), F.col("v").alias("va"),
                              F.col("nrm").alias("na")), on="a")
        .join(base.select(F.col("vec_id").alias("b"), F.col("v").alias("vb"),
                          F.col("nrm").alias("nb")), on="b")
        .select(
            "a", "b",
            F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6).alias("cosine"),
        )
    )
    return scored.filter(F.col("cosine") >= tau)


def _sql_plane_literal(table: int, plane: int, dim: int) -> str:
    return "[" + ", ".join(repr(c) for c in _pseudo_plane(table, plane, dim)) + "]"


def embedding_neardup_lsh_sql(tau: float, dim: int = 64,
                              n_tables: int = ND_TABLES, n_planes: int = ND_PLANES,
                              max_bucket: int = MAX_BUCKET) -> str:
    """DuckDB mirror of embedding_neardup_lsh: identical pseudo-hyperplane
    constants inlined as literals, identical bucket keys, cap, exact-dup
    equality pre-pass (list equality — DuckDB needs no hash bucketing at
    oracle scale), and exact cosine verification."""
    tables = []
    for t in range(n_tables):
        bits = " || ".join(
            f"(CASE WHEN list_dot_product(v, {_sql_plane_literal(t, p, dim)}) >= 0 "
            f"THEN '1' ELSE '0' END)"
            for p in range(n_planes)
        )
        tables.append(f"SELECT vec_id, {t} AS tbl, {bits} AS bucket FROM base")
    buckets_sql = " UNION ALL ".join(tables)
    return f"""
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
),
buckets_all AS ({buckets_sql}),
buckets AS (
  SELECT vec_id, tbl, bucket FROM (
    SELECT *, count(*) OVER (PARTITION BY tbl, bucket) AS _bn FROM buckets_all
  ) WHERE _bn <= {max_bucket}
),
cand AS (
  SELECT DISTINCT a, b FROM (
    SELECT x.vec_id AS a, y.vec_id AS b
    FROM buckets x JOIN buckets y ON x.tbl = y.tbl AND x.bucket = y.bucket AND x.vec_id < y.vec_id
    UNION ALL
    SELECT x.vec_id AS a, y.vec_id AS b
    FROM base x JOIN base y ON x.v = y.v AND x.vec_id < y.vec_id
  )
),
n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM base)
SELECT c.a, c.b,
       round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6) AS cosine
FROM cand c JOIN n x ON x.vec_id = c.a JOIN n y ON y.vec_id = c.b
WHERE round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6) >= {tau}
""".strip()


def _probe_variants(bucket: Column, n_planes: int) -> Column:
    """Array of the bucket key plus every single-bit flip (1-bit multi-probe:
    a corpus vector one hyperplane-sign away from the query is still found)."""
    variants = [bucket]
    for i in range(n_planes):
        variants.append(
            F.concat(
                F.substring(bucket, 1, i),
                F.when(F.substring(bucket, i + 1, 1) == "1", F.lit("0")).otherwise(F.lit("1")),
                F.substring(bucket, i + 2, n_planes - i - 1),
            )
        )
    return F.array(*variants)


def lsh_cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = N_TABLES,
    n_planes: int = N_PLANES,
) -> DataFrame:
    """ANN top-k: candidates = vectors whose LSH bucket, in any table,
    matches the query's bucket OR any single-bit flip of it (1-bit
    multi-probe, query side only — the corpus is bucketed once); exact
    cosine re-rank of candidates only. Probing expands only the broadcast
    query side by (n_planes + 1)x, so the 100 TB corpus-side bucket join is
    unchanged. DuckDB-mirrored by lsh_cosine_topk_sql."""
    cand_buckets = lsh_buckets(emb, dim, id_col, vec_col, n_tables=n_tables, n_planes=n_planes)
    q_buckets = (
        lsh_buckets(queries.withColumnRenamed("query_id", id_col), dim, id_col, vec_col,
                    n_tables=n_tables, n_planes=n_planes)
        .withColumnRenamed("vec_id", "query_id")
        .withColumn("bucket", F.explode(_probe_variants(F.col("bucket"), n_planes)))
    )
    cand = (
        F.broadcast(q_buckets).join(cand_buckets, on=["table", "bucket"])
        .select("query_id", "vec_id")
        .distinct()
    )
    base = emb.select(F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v"))
    base = base.withColumn("nrm", F.sqrt(_dot(F.col("v"), F.col("v"))))
    qs = queries.select("query_id", _as_double(F.col(vec_col)).alias("qv"))
    qs = qs.withColumn("qnrm", F.sqrt(_dot(F.col("qv"), F.col("qv"))))
    scored = (
        cand.join(base, on="vec_id")
        .join(F.broadcast(qs), on="query_id")
        .select(
            "query_id", "vec_id",
            F.round(_dot(F.col("v"), F.col("qv")) / (F.col("nrm") * F.col("qnrm")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return scored.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k).drop("_rn")


IVF_CENTROIDS = 16
IVF_NPROBE = 4


def _pseudo_centroid(i: int, dim: int) -> list[float]:
    import hashlib

    out = []
    for j in range(dim):
        h = hashlib.md5(f"centroid:{i}:{j}".encode()).hexdigest()
        out.append((int(h[:8], 16) / float(1 << 31)) - 1.0)
    return out


def _argmax_cell(v: Column, centroids: list[list[float]]) -> Column:
    """Index of the max-cosine centroid. array_max over (score, -cell)
    structs: highest score, ties -> smallest cell — mirrored in SQL by
    row_number ordered (score DESC, cell ASC). (A when-chain would
    duplicate each dim-term dot-product subtree O(k^2) times.)"""
    import math

    def cos(c):
        nrm = math.sqrt(sum(x * x for x in c))
        arr = F.array(*[F.lit(x) for x in c])
        return _dot(v, arr) / (F.sqrt(_dot(v, v)) * F.lit(nrm))

    entries = F.array(*[
        F.struct(cos(c).alias("s"), F.lit(-i).alias("negcell"))
        for i, c in enumerate(centroids)
    ])
    return -F.array_max(entries)["negcell"]


def ivf_cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = IVF_CENTROIDS,
    nprobe: int = IVF_NPROBE,
    centroids: list | None = None,
) -> DataFrame:
    """IVF ANN: corpus vectors are inverted-listed under their max-cosine
    centroid; a query probes its ``nprobe`` best cells and exact-cosine
    re-ranks only those lists. The cell assignment is a when-chain over
    broadcastable centroid literals — NO shuffle on the 100 TB corpus side
    beyond the final cell-equi-join, and lists can be written bucketed by
    cell for static pruning. ``centroids`` defaults to deterministic
    md5-derived pseudo-centroids (DuckDB-mirrored by ivf_cosine_topk_sql);
    pass cluster.kmeans(...) centers for trained cells."""
    cs = centroids if centroids is not None else [
        _pseudo_centroid(i, dim) for i in range(n_centroids)
    ]
    emb = _valid_vectors(emb, vec_col)
    queries = _valid_vectors(queries, vec_col)
    base = emb.select(F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v"))
    base = base.withColumn("cell", _argmax_cell(F.col("v"), cs))
    qs = queries.select("query_id", _as_double(F.col(vec_col)).alias("qv"))

    import math

    probe_scores = []
    for i, c in enumerate(cs):
        nrm = math.sqrt(sum(x * x for x in c))
        arr = F.array(*[F.lit(x) for x in c])
        probe_scores.append(F.struct(
            (_dot(F.col("qv"), arr) / (F.sqrt(_dot(F.col("qv"), F.col("qv"))) * F.lit(nrm))).alias("s"),
            F.lit(i).alias("cell"),
        ))
    probes = (
        qs.select("query_id", "qv", F.explode(F.array(*probe_scores)).alias("p"))
        .select("query_id", "qv", F.col("p.s").alias("s"), F.col("p.cell").alias("cell"))
    )
    wp = Window.partitionBy("query_id").orderBy(F.desc("s"), F.asc("cell"))
    probes = (
        probes.withColumn("_rn", F.row_number().over(wp))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "qv", "cell")
    )
    qn = probes.withColumn("qnrm", F.sqrt(_dot(F.col("qv"), F.col("qv"))))
    scored = (
        base.withColumn("nrm", F.sqrt(_dot(F.col("v"), F.col("v"))))
        .join(F.broadcast(qn), on="cell")
        .select(
            "query_id", "vec_id",
            F.round(_dot(F.col("v"), F.col("qv")) / (F.col("nrm") * F.col("qnrm")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return scored.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k).drop("_rn")


def _sql_centroid_literal(i: int, dim: int) -> str:
    return "[" + ", ".join(repr(c) for c in _pseudo_centroid(i, dim)) + "]"


def ivf_cosine_topk_sql(n_queries: int = 3, k: int = 5, dim: int = 64,
                        n_centroids: int = IVF_CENTROIDS,
                        nprobe: int = IVF_NPROBE) -> str:
    """DuckDB mirror of ivf_cosine_topk (pseudo-centroid default) with
    queries = vec_id < n_queries."""
    import math

    cell_rows = []
    for i in range(n_centroids):
        c = _pseudo_centroid(i, dim)
        nrm = repr(math.sqrt(sum(x * x for x in c)))
        lit = _sql_centroid_literal(i, dim)
        cell_rows.append(
            f"SELECT vec_id, {i} AS cell, "
            f"list_dot_product(v, {lit}) / (sqrt(list_dot_product(v, v)) * {nrm}) AS s "
            f"FROM base"
        )
    cells_sql = " UNION ALL ".join(cell_rows)
    return f"""
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
),
cellscores AS ({cells_sql}),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cell) AS rn
    FROM cellscores
  ) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cell) AS rn
    FROM cellscores WHERE vec_id < {n_queries}
  ) WHERE rn <= {nprobe}
),
n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM base),
scored AS (
  SELECT p.query_id, a.vec_id,
         round(list_dot_product(x.v, q.v) / (x.nrm * q.nrm), 6) AS cosine
  FROM probes p JOIN assign a ON a.cell = p.cell
  JOIN n x ON x.vec_id = a.vec_id JOIN n q ON q.vec_id = p.query_id
)
SELECT query_id, vec_id, cosine FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn
  FROM scored
) WHERE rn <= {k}
""".strip()


def lsh_cosine_topk_sql(n_queries: int = 3, k: int = 5, dim: int = 64,
                        n_tables: int = N_TABLES, n_planes: int = N_PLANES) -> str:
    """DuckDB mirror of lsh_cosine_topk with queries = vec_id < n_queries:
    identical pseudo-hyperplane literals, identical bucket keys, identical
    1-bit-flip multi-probe on the query side, exact cosine re-rank."""
    tables = []
    for t in range(n_tables):
        bits = " || ".join(
            f"(CASE WHEN list_dot_product(v, {_sql_plane_literal(t, p, dim)}) >= 0 "
            f"THEN '1' ELSE '0' END)"
            for p in range(n_planes)
        )
        tables.append(f"SELECT vec_id, {t} AS tbl, {bits} AS bucket FROM base")
    buckets_sql = " UNION ALL ".join(tables)
    flips = ["SELECT query_id, tbl, bucket FROM qb"]
    for i in range(1, n_planes + 1):
        flips.append(
            f"SELECT query_id, tbl, substr(bucket, 1, {i - 1}) || "
            f"(CASE WHEN substr(bucket, {i}, 1) = '1' THEN '0' ELSE '1' END) || "
            f"substr(bucket, {i + 1}) AS bucket FROM qb"
        )
    probes_sql = " UNION ALL ".join(flips)
    return f"""
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
),
buckets AS ({buckets_sql}),
qb AS (
  SELECT vec_id AS query_id, tbl, bucket FROM buckets WHERE vec_id < {n_queries}
),
probes AS ({probes_sql}),
cand AS (
  SELECT DISTINCT p.query_id, b.vec_id
  FROM probes p JOIN buckets b ON p.tbl = b.tbl AND p.bucket = b.bucket
),
n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM base),
scored AS (
  SELECT c.query_id, c.vec_id,
         round(list_dot_product(x.v, q.v) / (x.nrm * q.nrm), 6) AS cosine
  FROM cand c JOIN n x ON x.vec_id = c.vec_id JOIN n q ON q.vec_id = c.query_id
)
SELECT query_id, vec_id, cosine FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn
  FROM scored
) WHERE rn <= {k}
""".strip()
