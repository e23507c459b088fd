"""Deterministic synthetic source-code corpus (BASELINE.json input_hint).

Generates the exact input-table shape the engine targets:
``(repo string, path string, commit string, lang string, content string)``
— seeded, reproducible row-by-row (content depends only on (seed, doc_id),
never on partitioning), with hot terms (``def``, ``import``, ``class``,
``return``, ``self``) at Zipf-ish frequency to exercise shuffle salting.

Generation happens executor-side in an Arrow-batched UDF over
``spark.range`` — no driver materialization, scales to any row count.
"""

from __future__ import annotations

import hashlib
import random

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

LANGS = ["python", "python", "python", "java", "go", "js", "rust"]

# Zipf-ish vocabulary: first entries are hot (weights 1/rank)
VOCAB = (
    "def import class return self if else for while try except with as from "
    "none true false lambda yield print len range dict list set str int float "
    "data value result index count parse load save init config run main test "
    "error handle stream batch merge sort filter map reduce join split strip "
    "encode decode buffer cache queue stack node tree graph hash token parse2 "
    "client server request response header payload socket thread lock mutex "
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
).split()

_WEIGHTS = [1.0 / (i + 1) for i in range(len(VOCAB))]
_CUM = []
_total = 0.0
for _w in _WEIGHTS:
    _total += _w
    _CUM.append(_total)


def _doc_content(seed: int, doc_id: int, rare_vocab: int = 0) -> str:
    rng = random.Random((seed << 32) ^ doc_id)
    n = rng.randint(10, 500)
    words = []
    for _ in range(n):
        x = rng.random() * _total
        lo, hi = 0, len(_CUM) - 1
        while lo < hi:
            mid = (lo + hi) // 2
            if _CUM[mid] < x:
                lo = mid + 1
            else:
                hi = mid
        words.append(VOCAB[lo])
        if rng.random() < 0.1:
            words.append(f"ident_{rng.randint(0, 999)}")
        # opt-in long-tail symbols (real code corpora carry a huge df<100
        # identifier tail — the regime block-max pruning is for). The rng
        # draw short-circuits when disabled, so default content stays
        # byte-identical across rounds (bench comparability).
        if rare_vocab and rng.random() < 0.02:
            words.append(f"sym_{rng.randint(0, rare_vocab - 1)}")
    return " ".join(words)


def _row(seed: int, doc_id: int, rare_vocab: int = 0) -> dict:
    rng = random.Random((seed << 16) ^ doc_id)
    repo = f"org{doc_id % 10}/proj{doc_id % 37}"
    path = f"src/pkg{doc_id % 23}/mod_{doc_id}.py"
    commit = hashlib.sha1(f"{seed}:{doc_id}".encode()).hexdigest()
    lang = LANGS[rng.randrange(len(LANGS))]
    return {
        "repo": repo,
        "path": path,
        "commit": commit,
        "lang": lang,
        "content": _doc_content(seed, doc_id, rare_vocab),
    }


CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)


def synth_code_corpus(spark: SparkSession, n_docs: int, seed: int = 42,
                      partitions: int | None = None,
                      rare_vocab: int = 0) -> DataFrame:
    """``rare_vocab > 0`` sprinkles in a long tail of ``sym_<i>`` rare
    identifiers (i < rare_vocab, ~2% of word slots) without perturbing the
    default content — expected df per symbol ≈ 5.1 * n_docs / rare_vocab
    (e.g. 50k symbols at 600k docs → df ≈ 60)."""
    base = spark.range(0, n_docs, numPartitions=partitions or spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            rows = [{"doc_id": int(i), **_row(seed, int(i), rare_vocab)} for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=[f.name for f in CORPUS_SCHEMA.fields])

    return base.mapInPandas(gen, CORPUS_SCHEMA)


def docs_table_as_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map the driver testdata `documents` table onto the corpus shape."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        F.concat(F.lit("org/"), F.col("source")).alias("repo"),
        F.concat(F.lit("docs/"), F.col("doc_id").cast("string"), F.lit(".txt")).alias("path"),
        F.sha2(F.col("doc_id").cast("string"), 256).substr(1, 40).alias("commit"),
        "lang",
        F.col("text").alias("content"),
    )


def assign_doc_ids(df: DataFrame, order_cols: tuple[str, ...] = ("repo", "path"),
                   num_partitions: int | None = None) -> DataFrame:
    """Contiguous global ``doc_id``s ordered by ``order_cols`` WITHOUT a
    single-partition shuffle (a bare ``row_number() OVER (ORDER BY ...)``
    funnels every row through one task — a non-starter at 10^12 rows).

    Two-pass RDD-``zipWithIndex`` shape, DataFrame-native: range-partition
    on the order columns (globally ordered partitions), persist so the
    sampled range boundaries are identical across the two jobs, count rows
    per partition (one ~num_partitions-row driver aggregate), then add each
    partition's broadcast cumulative offset to its local row_number. Every
    step is bounded: driver traffic is O(partitions), the window sorts only
    within partitions."""
    from pyspark import StorageLevel
    from pyspark.sql.window import Window

    cols = [F.col(c) for c in order_cols]
    parted = df.repartitionByRange(
        num_partitions or df.sparkSession.sparkContext.defaultParallelism, *cols
    ).withColumn("_pid", F.spark_partition_id())
    # persist: RangePartitioner samples boundaries — without a materialized
    # partitioning the count job and the id job could disagree on _pid
    parted = parted.persist(StorageLevel.MEMORY_AND_DISK)
    counts = sorted(
        (r["_pid"], r["cnt"])
        for r in parted.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    )
    offsets, acc = [], 0
    for pid, cnt in counts:
        offsets.append({"_pid": pid, "_off": acc})
        acc += cnt
    off_df = df.sparkSession.createDataFrame(
        pd.DataFrame(offsets, columns=["_pid", "_off"]),
        T.StructType([T.StructField("_pid", T.IntegerType()),
                      T.StructField("_off", T.LongType())]),
    )
    w = Window.partitionBy("_pid").orderBy(*cols)
    out = (
        parted.withColumn("_rn", F.row_number().over(w) - 1)
        .join(F.broadcast(off_df), "_pid")
        .withColumn("doc_id", (F.col("_off") + F.col("_rn")).cast("long"))
        .drop("_pid", "_rn", "_off")
    )
    return out
