"""Training-pipeline operators (functions/pipeline.py): deterministic
mixing, sequence packing, benchmark decontamination. Semantics are pinned
against plain-python models; plan shapes against the 100-TB design notes
(broadcast joins, single window shuffle)."""

import hashlib
import re

import pytest
from pyspark.sql import Row, functions as F

from whoosh_spark.functions.pipeline import (
    MIX_BUCKETS,
    contamination_flag,
    mixture_sample,
    sequence_pack,
)
from whoosh_spark.functions.textstats import TOKEN_PATTERN


def _mk_docs(spark, rows):
    return spark.createDataFrame([Row(**r) for r in rows])


def _bucket(doc_id, salt="mix"):
    h = hashlib.md5(f"{salt}:{doc_id}".encode()).hexdigest()
    return int(h[:8], 16) % MIX_BUCKETS


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        {"doc_id": i, "lang": ["en", "de", "fr"][i % 3],
         "text": f"alfa bravo charlie_{i} delta echo " * (1 + i % 4)}
        for i in range(60)
    ]
    return _mk_docs(spark, rows), rows


def test_mixture_sample_matches_python_model(spark, corpus):
    df, rows = corpus
    rates = {"en": 0.5, "de": 1.0}  # fr missing -> dropped entirely
    got = sorted(r["doc_id"] for r in mixture_sample(df, rates).collect())
    want = sorted(
        r["doc_id"] for r in rows
        if r["lang"] in rates
        and _bucket(r["doc_id"]) < round(rates[r["lang"]] * MIX_BUCKETS)
    )
    assert got == want
    assert {r["lang"] for r in mixture_sample(df, rates).collect()} <= {"en", "de"}
    # rate 1.0 keeps every de doc; determinism: second run identical
    de_total = sum(1 for r in rows if r["lang"] == "de")
    assert sum(1 for r in rows if r["doc_id"] in set(got) and r["lang"] == "de") == de_total
    again = sorted(r["doc_id"] for r in mixture_sample(df, rates).collect())
    assert again == got


def test_mixture_sample_broadcasts_rates(spark, corpus):
    df, _ = corpus
    plan = mixture_sample(df, {"en": 0.5})._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan


def test_sequence_pack_greedy_offsets(spark, corpus):
    df, rows = corpus
    out = sequence_pack(df, window_tokens=16).collect()
    by_lang = {}
    for r in sorted(rows, key=lambda x: x["doc_id"]):
        toks = re.findall(TOKEN_PATTERN, r["text"].lower())
        by_lang.setdefault(r["lang"], []).append((r["doc_id"], len(toks)))
    want = {}
    for lang, seq in by_lang.items():
        off = 0
        for doc_id, n in seq:
            want[doc_id] = (lang, n, off, off // 16)
            off += n
    got = {r["doc_id"]: (r["lang"], r["n_tokens"], r["start_offset"], r["bin_id"])
           for r in out}
    assert got == want


def test_sequence_pack_sharded_resets_offsets(spark, corpus):
    df, _ = corpus
    out = sequence_pack(df, window_tokens=16, shard_docs=20).collect()
    # offsets restart inside every (lang, shard): the first doc of each
    # group has start_offset 0, and offsets are strictly increasing within
    groups = {}
    for r in sorted(out, key=lambda r: r["doc_id"]):
        groups.setdefault((r["lang"], r["shard"]), []).append(r)
    for (lang, shard), rs in groups.items():
        assert rs[0]["start_offset"] == 0
        offs = [r["start_offset"] for r in rs]
        assert offs == sorted(offs)
        assert all(r["doc_id"] // 20 == shard for r in rs)


def test_contamination_flag_semantics_and_broadcast(spark, corpus):
    df, rows = corpus
    bench = df.filter(F.col("doc_id") < 3)
    out = contamination_flag(df, bench)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    got = {r["doc_id"]: r["n_hits"] for r in out.collect()}
    # benchmark docs always flag themselves
    assert set(got) >= {0, 1, 2}
    # every corpus doc shares the "alfa bravo charlie_i" stem shingles
    # except the charlie_{i} token differs — python model cross-check
    def shingles(text):
        # finditer + group(0): TOKEN_PATTERN contains groups, so findall
        # would return the capture, not the token
        toks = [m.group(0) for m in re.finditer(TOKEN_PATTERN, text.lower())]
        return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

    bench_sh = set()
    for r in rows:
        if r["doc_id"] < 3:
            bench_sh |= shingles(r["text"])
    for r in rows:
        overlap = shingles(r["text"]) & bench_sh
        if overlap:
            assert got.get(r["doc_id"]) == len(overlap), r["doc_id"]
        else:
            assert r["doc_id"] not in got
