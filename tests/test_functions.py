import hashlib

import numpy as np
import pytest
from pyspark.sql import Row, functions as F

from whoosh_spark.functions.dedup import (
    embedding_neardup,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    shingle_table,
    simhash_signatures,
)
from whoosh_spark.functions.multimodal import extract_features, frame_sample_plan, synth_media
from whoosh_spark.functions.similarity import brute_cosine_topk, lsh_cosine_topk
from whoosh_spark.functions.textstats import (
    doc_fingerprint,
    lang_id_heuristic,
    quality_score,
    token_count,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog again and again"),
    (1, "the quick brown fox jumps over the lazy dog again and again"),  # exact dup of 0
    (2, "the quick brown fox jumps over the lazy dog once more today"),  # near dup of 0
    (3, "completely different content about spark distributed engines"),
    (4, "der hund ist nicht auf der couch und das ist gut"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in DOCS])


def test_exact_dedup(spark, docs_df):
    got = {r["keep_doc_id"]: r["dup_count"] for r in exact_dedup(docs_df).collect()}
    assert got[0] == 2  # docs 0 and 1 identical
    assert got[2] == 1 and got[3] == 1


def test_shingles_and_minhash_pairs(spark, docs_df):
    pairs = {(r["a"], r["b"]): r["jaccard"] for r in minhash_lsh_pairs(docs_df, threshold=0.3).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0  # identical docs
    assert (0, 2) in pairs and 0.3 <= pairs[(0, 2)] < 1.0  # near dup
    assert (0, 3) not in pairs and (2, 3) not in pairs
    # jaccard oracle in python for (0, 2)
    def shingles(t):
        toks = t.split()
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    a, b = shingles(DOCS[0][1]), shingles(DOCS[2][1])
    want = round(len(a & b) / len(a | b), 6)
    assert pairs[(0, 2)] == want


def test_minhash_signature_deterministic(spark, docs_df):
    s1 = minhash_signatures(docs_df).orderBy("doc_id").collect()
    s2 = minhash_signatures(docs_df).orderBy("doc_id").collect()
    assert s1 == s2
    assert s1[0]["h0"] == s1[1]["h0"]  # identical docs -> identical signatures


def test_simhash(spark, docs_df):
    rows = {r["doc_id"]: r["simhash"] for r in simhash_signatures(docs_df).collect()}
    assert len(rows[0]) == 64 and set(rows[0]) <= {"0", "1"}
    assert rows[0] == rows[1]  # identical docs
    ham_near = sum(c1 != c2 for c1, c2 in zip(rows[0], rows[2]))
    ham_far = sum(c1 != c2 for c1, c2 in zip(rows[0], rows[3]))
    assert ham_near < ham_far


def test_textstats(spark, docs_df):
    tc = {r["doc_id"]: r["n_tokens"] for r in token_count(docs_df).collect()}
    assert tc[0] == 12
    q = {r["doc_id"]: r["quality"] for r in quality_score(docs_df).collect()}
    assert 0.0 <= min(q.values()) and max(q.values()) <= 1.0
    assert q[0] > 0.5  # clean english sentence
    lang = {r["doc_id"]: r["pred_lang"] for r in lang_id_heuristic(docs_df).collect()}
    assert lang[0] == "en"
    assert lang[4] == "de"
    fp = {r["doc_id"]: r["fingerprint"] for r in doc_fingerprint(docs_df).collect()}
    assert fp[0] == fp[1] and fp[0] != fp[2]
    # python oracle of the rolling hash
    h = 0
    for tok in DOCS[0][1].split():
        th = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)
        h = (h * 31 + th) % 2147483647
    assert fp[0] == h


def test_brute_cosine_topk(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 2).select(F.col("vec_id").alias("query_id"), "embedding")
    got = brute_cosine_topk(emb, queries, k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["vec_id"], r["cosine"]))
    # numpy oracle
    rows = emb.orderBy("vec_id").collect()
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = [r["vec_id"] for r in rows]
    for qid in (0, 1):
        qv = mat[ids.index(qid)]
        cos = mat @ qv / (np.linalg.norm(mat, axis=1) * np.linalg.norm(qv))
        order = sorted(zip(ids, cos), key=lambda t: (-round(t[1], 6), t[0]))[:5]
        want = [(i, round(c, 6)) for i, c in order]
        assert by_q[qid] == want
    # self-match is rank 1 with cosine 1.0
    assert by_q[0][0] == (0, 1.0)


def test_lsh_recall_on_planted_neighbors(spark):
    # the testdata embeddings are near-random (max off-diag cosine ~0.48),
    # so "top-5 recall" is meaningless there; the LSH path is for near-dup
    # retrieval — plant perturbed copies and require they are found
    import numpy as np

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dim = len(emb.first()["embedding"])
    rows = emb.filter(F.col("vec_id") < 20).collect()
    rng = np.random.RandomState(7)
    qrows = []
    for r in rows:
        v = np.array(r["embedding"], dtype=np.float64)
        v = v + rng.normal(0, 0.02 * np.abs(v).mean(), size=v.shape)  # cos ~ 0.999
        qrows.append((r["vec_id"], [float(x) for x in v]))
    queries = spark.createDataFrame(qrows, "query_id long, embedding array<double>")
    ann = lsh_cosine_topk(emb, queries, dim=dim, k=3).collect()
    by_q = {}
    for r in ann:
        by_q.setdefault(r["query_id"], []).append(r["vec_id"])
    hits = sum(1 for qid, vids in by_q.items() if qid in vids)
    assert hits / len(qrows) >= 0.9, f"planted-neighbor recall {hits}/{len(qrows)}"


def test_embedding_neardup_self(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
    dup = emb.select((F.col("vec_id") + 10000).alias("vec_id"), "embedding", "label").limit(5)
    both = emb.unionByName(dup)
    pairs = embedding_neardup(both, tau=0.999999).collect()
    found = {(r["a"], r["b"]) for r in pairs}
    assert all((i, i + 10000) in found for i in range(5))


def test_neardup_exact_dups_survive_bucket_cap(spark):
    # round-2 ADVICE: a duplicate cluster larger than MAX_BUCKET lands in
    # the same oversized bucket in every table; without the equality
    # pre-pass the cap silently drops ALL its pairs (recall 0 on exactly
    # the hot-boilerplate clusters dedup targets)
    from whoosh_spark.functions.similarity import (
        MAX_BUCKET,
        embedding_neardup_lsh,
        lsh_dropped_buckets,
    )

    n = MAX_BUCKET + 30
    v = [float((i * 37) % 13 - 6) for i in range(16)]
    other = [float((i * 29) % 11 - 5) for i in range(16)]
    rows = [(i, v) for i in range(n)] + [(n, other)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    dropped = lsh_dropped_buckets(emb, dim=16).collect()
    assert dropped and all(r["members"] >= n for r in dropped)  # cap really hit
    pairs = embedding_neardup_lsh(emb, tau=0.999, dim=16).collect()
    found = {(r["a"], r["b"]) for r in pairs}
    want = {(a, b) for a in range(n) for b in range(a + 1, n)}
    assert found == want, f"missing {len(want - found)} exact-dup pairs"


def test_lsh_multiprobe_beats_exact_bucket(spark):
    # a query whose vector sits just across ONE hyperplane from its
    # neighbor gets a bucket key 1 bit away; multi-probe must still find it
    import numpy as np

    from whoosh_spark.functions.similarity import _pseudo_plane, lsh_buckets

    rng = np.random.RandomState(11)
    dim = 16
    base = rng.normal(size=(40, dim))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    # perturb each query until at least one table's bucket differs from its
    # source vector's bucket (so exact-bucket join alone would lose table votes)
    queries = spark.createDataFrame(
        [(i, [float(x + rng.normal(0, 0.05)) for x in base[i]]) for i in range(10)],
        "query_id long, embedding array<double>",
    )
    ann = lsh_cosine_topk(emb, queries, dim=dim, k=1).collect()
    by_q = {r["query_id"]: r["vec_id"] for r in ann}
    hits = sum(1 for q, v in by_q.items() if q == v)
    assert hits >= 9, f"multi-probe nearest-neighbor hits {hits}/10"


def test_png_wav_roundtrip():
    import numpy as np

    from whoosh_spark.functions.multimodal import (
        png_decode,
        png_encode_gray,
        wav_decode,
        wav_encode_pcm16,
    )

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(9, 13), dtype=np.uint8)
    w, h, decoded = png_decode(png_encode_gray(px))
    assert (w, h) == (13, 9)
    assert (decoded == px).all()

    samples = (rng.standard_normal(160) * 10000).clip(-32768, 32767).astype("<i2")
    rate, back = wav_decode(wav_encode_pcm16(samples.astype(np.float64), 8000))
    assert rate == 8000
    assert np.allclose(back * 32768.0, samples, atol=1.0)


def test_multimodal_real_decode(spark):
    media = synth_media(spark, 30)
    assert media.count() == 30
    rows = extract_features(media, decoder="stdlib").collect()
    meta = {r["media_id"]: r["meta"] for r in media.collect()}
    assert len(rows) == 30
    assert all(len(r["feature"]) == 16 for r in rows)
    for r in rows:
        m = meta[r["media_id"]]
        if r["kind"] == "image":
            # the REAL PNG decode recovers the generator's dimensions
            assert (r["width"], r["height"]) == (m["width"], m["height"])
            assert r["feature"][0] == m["width"] and r["feature"][1] == m["height"]
            assert r["decoded"] is True
        elif r["kind"] == "audio":
            assert r["sample_rate"] == m["sample_rate"]
            assert r["n_samples"] == m["sample_rate"] * m["duration_ms"] // 1000
            assert r["feature"][1] == m["sample_rate"] * m["duration_ms"] // 1000
            assert r["decoded"] is True
        else:
            # video: documented hash-fallback stub, flagged per-row
            assert r["decoded"] is False and r["width"] is None
    plan = frame_sample_plan(media, every_ms=1000)
    assert plan.count() > 0
    # fake path still deterministic
    f1 = {r["media_id"]: r["feature"] for r in extract_features(media, decoder="fake").collect()}
    f2 = {r["media_id"]: r["feature"] for r in extract_features(media, decoder="fake").collect()}
    assert f1 == f2
    # capability gate: pillow not installed here
    with pytest.raises(Exception) as ei:
        extract_features(media, decoder="pillow").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(ei.value, NotImplementedError)


def test_kmeans_1d_matches_reference(spark, whoosh_ref):
    """Same data + same initial centers -> identical labels and centroids
    as the reference's Lloyd's loop (classify.py:265-332)."""
    from whoosh.classify import kmeans as ref_kmeans

    from whoosh_spark.functions.cluster import kmeans

    data = [float(x) for x in
            [1, 2, 3, 10, 11, 12, 50, 52, 55, 100, 101, 99, 3, 9, 51, 97]]
    centers = [0.0, 20.0, 60.0, 90.0]
    want_labels, want_c = ref_kmeans(data, 4, centers=list(centers))
    df = spark.createDataFrame([(i, x) for i, x in enumerate(data)], "i long, x double")
    got, got_c = kmeans(df, "x", 4, centers=list(centers), id_col="i")
    got_labels = [r["label"] for r in got.orderBy("i").collect()]
    assert got_labels == want_labels
    assert got_c == pytest.approx(want_c, rel=1e-12)


def test_kmeans_vectors_and_ivf(spark):
    from whoosh_spark.functions.cluster import kmeans
    from whoosh_spark.functions.similarity import ivf_cosine_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dim = len(emb.first()["embedding"])
    seeds = [r["embedding"] for r in emb.orderBy("vec_id").limit(4).collect()]
    labeled, centers = kmeans(emb.select(F.col("embedding").cast("array<double>").alias("embedding")),
                              "embedding", 4, centers=seeds, maxiter=5)
    assert len(centers) == 4 and len(centers[0]) == dim
    counts = {r["label"]: r["n"] for r in labeled.groupBy("label").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == emb.count()

    # IVF self-query: every query must find itself at rank 1 (cosine 1.0 in
    # its own cell, which is always probed first)
    queries = emb.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("query_id"), "embedding")
    got = ivf_cosine_topk(emb, queries, dim=dim, k=3).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["vec_id"], r["cosine"]))
    for qid in range(5):
        assert by_q[qid][0] == (qid, 1.0)


def test_dedup_groups_components(spark):
    from whoosh_spark.functions.dedup import dedup_groups

    # chain 1-2-3-4 (diameter 3: exercises multi-round propagation),
    # plus two isolated pairs
    pairs = spark.createDataFrame(
        [Row(a=1, b=2), Row(a=2, b=3), Row(a=3, b=4),
         Row(a=10, b=11), Row(a=20, b=21)]
    )
    out = {r["doc_id"]: r["group_id"] for r in dedup_groups(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}

    with pytest.raises(ValueError, match="converge"):
        dedup_groups(pairs, max_iters=1)


def test_dedup_groups_matches_recursive_oracle(spark, docs_df):
    import duckdb

    from whoosh_spark.functions.dedup import (
        dedup_groups, dedup_groups_sql, minhash_lsh_pairs, minhash_pairs_sql,
    )

    got = sorted(
        (r["doc_id"], r["group_id"])
        for r in dedup_groups(minhash_lsh_pairs(docs_df, threshold=0.2)).collect()
    )
    con = duckdb.connect()
    con.register("documents", docs_df.toPandas())
    want = sorted(
        (int(a), int(b))
        for a, b in con.execute(
            dedup_groups_sql(minhash_pairs_sql(threshold=0.2))
        ).fetchall()
    )
    assert got == want and got


def test_near_dedup_keeps_one_representative(spark, docs_df):
    from whoosh_spark.functions.dedup import minhash_lsh_pairs, near_dedup

    kept = {r["doc_id"] for r in near_dedup(docs_df, threshold=0.3).collect()}
    paired = set()
    for r in minhash_lsh_pairs(docs_df, threshold=0.3).collect():
        paired.update((r["a"], r["b"]))
    all_ids = {r["doc_id"] for r in docs_df.collect()}
    # unpaired docs pass through untouched
    assert (all_ids - paired) <= kept
    # docs 0 and 1 are identical -> exactly the min id survives
    assert 0 in kept and 1 not in kept


def test_ivf_trained_centroids_recall(spark):
    """End-to-end IVF training path: cluster.kmeans centers fed into
    ivf_cosine_topk(centroids=...). Trained cells must match brute-force
    ground truth at least as well as the md5 pseudo-centroids at the same
    nprobe budget, and clear an absolute recall floor."""
    from whoosh_spark.functions.cluster import kmeans
    from whoosh_spark.functions.similarity import brute_cosine_topk, ivf_cosine_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dim = len(emb.first()["embedding"])
    k = 5
    queries = emb.filter(F.col("vec_id") % 100 == 7).select(
        F.col("vec_id").alias("query_id"), "embedding")

    truth = {}
    for r in brute_cosine_topk(emb, queries, k=k).collect():
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])

    def recall(df):
        got = {}
        for r in df.collect():
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
        return hits / sum(len(t) for t in truth.values())

    seeds = [r["embedding"] for r in emb.orderBy("vec_id").limit(8).collect()]
    _, centers = kmeans(
        emb.select(F.col("embedding").cast("array<double>").alias("embedding")),
        "embedding", 8, centers=seeds, maxiter=5)
    r_trained = recall(ivf_cosine_topk(
        emb, queries, dim=dim, k=k, n_centroids=8, nprobe=2, centroids=centers))
    r_pseudo = recall(ivf_cosine_topk(
        emb, queries, dim=dim, k=k, n_centroids=8, nprobe=2))
    assert r_trained >= r_pseudo
    assert r_trained >= 0.6


def test_simhash_neardup_pairs_exact_for_h3(spark, docs_df):
    """4-band SimHash candidate generation is EXACT for hamming <= 3
    (pigeonhole): pairs must equal brute-force all-pairs hamming."""
    from whoosh_spark.functions.dedup import simhash_neardup_pairs, simhash_signatures

    got = {(r["a"], r["b"]): r["hamming"]
           for r in simhash_neardup_pairs(docs_df, max_hamming=3).collect()}
    sigs = {r["doc_id"]: r["simhash"] for r in simhash_signatures(docs_df).collect()}
    ids = sorted(sigs)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = sum(x != y for x, y in zip(sigs[a], sigs[b]))
            if h <= 3:
                want[(a, b)] = h
    assert got == want
    # planted exact duplicates -> hamming 0 pairs found
    from pyspark.sql import Row
    texts = [r["text"] for r in docs_df.orderBy("doc_id").limit(2).collect()]
    planted = docs_df.select("doc_id", "text").unionByName(
        spark.createDataFrame([Row(doc_id=90000 + i, text=t)
                               for i, t in enumerate(texts)]))
    got2 = {(r["a"], r["b"]): r["hamming"]
            for r in simhash_neardup_pairs(planted, max_hamming=3).collect()}
    lo = [r["doc_id"] for r in docs_df.orderBy("doc_id").limit(2).collect()]
    assert got2[(lo[0], 90000)] == 0 and got2[(lo[1], 90001)] == 0


def test_dedup_short_null_and_empty_docs(spark):
    """Docs with < SHINGLE_W tokens, empty text, or NULL text must not
    crash the shingle pipeline (regression: F.sequence(1, 0) is a
    DESCENDING [1, 0], so the unguarded index range fed slice() a 0 start
    and any short doc killed the whole minhash job)."""
    from whoosh_spark.functions.dedup import (
        minhash_lsh_pairs, near_dedup, shingles_col)

    long = "the quick brown fox jumps over the lazy dog today ok"
    rows = [Row(doc_id=0, text=long), Row(doc_id=1, text=None),
            Row(doc_id=2, text=""), Row(doc_id=3, text=long),
            Row(doc_id=4, text="two words"), Row(doc_id=5, text="single")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = {r["doc_id"]: r["s"] for r in
          df.select("doc_id", shingles_col(F.col("text")).alias("s")).collect()}
    assert sh[1] == [] and sh[2] == [] and sh[4] == [] and sh[5] == []
    assert len(sh[0]) == 9
    pairs = minhash_lsh_pairs(df, threshold=0.2).collect()
    assert [(r["a"], r["b"], r["jaccard"]) for r in pairs] == [(0, 3, 1.0)]
    kept = sorted(r["doc_id"] for r in near_dedup(df, threshold=0.2).select("doc_id").collect())
    assert kept == [0, 1, 2, 4, 5]  # dup cluster {0,3} -> keep 0; rest unpaired


def test_similarity_zero_and_null_vectors(spark):
    """Zero-norm and NULL embeddings are excluded from every cosine path
    (regression: one zero vector anywhere failed the whole job with ANSI
    DIVIDE_BY_ZERO). Identical zero vectors must also NOT surface through
    the exact-duplicate equality pre-pass."""
    import random
    from whoosh_spark.functions.dedup import embedding_neardup, embedding_neardup_oracle
    from whoosh_spark.functions.similarity import (
        brute_cosine_topk, ivf_cosine_topk, lsh_cosine_topk)

    rng = random.Random(1)
    rows = [Row(vec_id=i, embedding=[rng.uniform(-1, 1) for _ in range(8)])
            for i in range(20)]
    rows += [Row(vec_id=100, embedding=[0.0] * 8),
             Row(vec_id=101, embedding=None),
             Row(vec_id=102, embedding=[0.0] * 8)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter("vec_id in (0, 100, 101)").selectExpr(
        "vec_id as query_id", "embedding")
    for fn in (lambda: brute_cosine_topk(emb, q, k=3),
               lambda: lsh_cosine_topk(emb, q, dim=8, k=3),
               lambda: ivf_cosine_topk(emb, q, dim=8, k=3)):
        out = fn().collect()
        assert {r["query_id"] for r in out} == {0}  # invalid queries dropped
        assert all(r["vec_id"] < 100 for r in out)  # invalid corpus rows too
        assert all(r["cosine"] == r["cosine"] for r in out)  # no NaN
    got = {(r["a"], r["b"]) for r in embedding_neardup(emb, tau=0.8).collect()}
    want = {(r["a"], r["b"]) for r in embedding_neardup_oracle(emb, tau=0.8).collect()}
    assert got == want
    assert all(a < 100 and b < 100 for a, b in got)
