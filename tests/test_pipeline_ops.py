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


# --------------------------------------------------------------------------
# round-5 additions: gopher_quality / line_dedup / pii_redact


def _toks(text):
    return [m.group(0) for m in re.finditer(TOKEN_PATTERN, text.lower())]


def _lines(text):
    return [l.strip() for l in text.split("\n") if l.strip()]


@pytest.fixture(scope="module")
def lined_corpus(spark):
    footer = "shared boilerplate footer"
    rows = [
        # 0: plenty of words, stops, a dup line
        {"doc_id": 0, "text": "the cat and the dog have to be of that with help\n"
                              + footer + "\nunique zero\n" + footer},
        # 1..3: footer appears in >= 3 docs -> corpus-hot
        {"doc_id": 1, "text": "alpha beta gamma\n" + footer},
        {"doc_id": 2, "text": "delta epsilon\n" + footer},
        # 3: ONLY the hot footer -> everything removed
        {"doc_id": 3, "text": footer},
        # 4: bullets + ellipsis + symbols + PII
        {"doc_id": 4, "text": "- one\n- two\nwait...\n### x # y\n"
                              "mail a.b@test.org and 10.0.0.1 call 555-123-4567"},
        # 5: empty text
        {"doc_id": 5, "text": ""},
    ]
    return _mk_docs(spark, rows), rows


def test_gopher_quality_matches_python_model(spark, lined_corpus):
    from whoosh_spark.functions.pipeline import GOPHER_STOPS, gopher_quality

    df, rows = lined_corpus
    got = {r["doc_id"]: r.asDict() for r in gopher_quality(df).collect()}
    for r in rows:
        toks, lines = _toks(r["text"]), _lines(r["text"])
        m = got[r["doc_id"]]
        assert m["n_words"] == len(toks)
        assert m["stop_hits"] == sum(1 for w in GOPHER_STOPS if w in toks)
        n_dup = len(lines) - len(dict.fromkeys(lines))
        assert m["dup_line_frac"] == round(n_dup / len(lines), 6) if lines else m["dup_line_frac"] == 0.0
        chars_all = sum(len(l) for l in lines)
        chars_dup = chars_all - sum(len(l) for l in dict.fromkeys(lines))
        assert m["dup_line_char_frac"] == (round(chars_dup / chars_all, 6) if chars_all else 0.0)
        n_sym = len(re.findall(r"#|\.\.\.", r["text"]))
        assert m["symbol_word_ratio"] == (round(n_sym / len(toks), 6) if toks else 0.0)
        n_bullet = sum(1 for l in lines if re.match(r"^[-*•]", l))
        assert m["bullet_line_frac"] == (round(n_bullet / len(lines), 6) if lines else 0.0)
        n_ell = sum(1 for l in lines if re.search(r"(\.\.\.|…)$", l))
        assert m["ellipsis_line_frac"] == (round(n_ell / len(lines), 6) if lines else 0.0)
        n_alpha = sum(1 for w in toks if re.search("[a-z]", w))
        assert m["alpha_word_frac"] == (round(n_alpha / len(toks), 6) if toks else 0.0)
        assert m["gopher_ok"] in (0, 1)
    # none of these tiny docs pass the 50-word floor
    assert all(m["gopher_ok"] == 0 for m in got.values())


def test_gopher_quality_is_shuffle_free(spark, lined_corpus):
    from whoosh_spark.functions.pipeline import gopher_quality

    df, _ = lined_corpus
    plan = gopher_quality(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # single projected scan, no shuffle


def test_line_dedup_removes_hot_lines(spark, lined_corpus):
    from whoosh_spark.functions.pipeline import line_dedup

    df, rows = lined_corpus
    out = {r["doc_id"]: r.asDict() for r in line_dedup(df, min_docs=3).collect()}
    footer = "shared boilerplate footer"
    # python model: footer is in docs 0,1,2,3 (>=3) -> removed everywhere
    for r in rows:
        lines = [(i, l) for i, l in enumerate(r["text"].split("\n")) if l.strip()]
        if not lines:  # doc 5: no non-empty lines at all -> absent
            assert r["doc_id"] not in out
            continue
        kept = [l for _, l in lines if l.strip() != footer]
        m = out[r["doc_id"]]
        assert m["n_lines"] == len(lines)
        assert m["n_kept"] == len(kept)
        assert m["clean_md5"] == hashlib.md5("\n".join(kept).encode()).hexdigest()
    assert out[3]["n_kept"] == 0
    assert out[3]["clean_md5"] == hashlib.md5(b"").hexdigest()


def test_line_dedup_hot_set_join_left_to_aqe(spark, lined_corpus):
    """The hot-line set is UNBOUNDED at corpus scale (every 3+-occurrence
    line), so line_dedup must NOT force a broadcast of it — the anti-join
    strategy is AQE's runtime choice (r6; the hint the r5 code forced
    would OOM at 100 TB). The plan stays an anti-join, with no broadcast
    hint anywhere in the logical tree."""
    from whoosh_spark.functions.pipeline import line_dedup

    df, _ = lined_corpus
    out = line_dedup(df)
    analyzed = out._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed  # no forced broadcast
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan


def test_hot_line_stats_matches_threshold(spark, lined_corpus):
    """hot_line_stats (the line_dedup sizing diagnostic) returns exactly
    the >=min_docs lines the operator drops."""
    from whoosh_spark.functions.pipeline import hot_line_stats

    df, rows = lined_corpus
    got = {r["norm"]: r["nd"] for r in hot_line_stats(df, min_docs=3).collect()}
    from collections import Counter

    counts = Counter()
    for r in rows:
        for line in {l.strip() for l in r["text"].split("\n") if l.strip()}:
            counts[line] += 1
    want = {l: n for l, n in counts.items() if n >= 3}
    assert got == want


def test_pii_redact_counts_and_hash(spark, lined_corpus):
    from whoosh_spark.functions.pipeline import PII_PATTERNS, pii_redact

    df, rows = lined_corpus
    out = {r["doc_id"]: r.asDict() for r in pii_redact(df).collect()}
    for r in rows:
        m = out[r["doc_id"]]
        assert m["n_emails"] == len(re.findall(PII_PATTERNS["email"], r["text"]))
        assert m["n_ipv4"] == len(re.findall(PII_PATTERNS["ipv4"], r["text"]))
        assert m["n_phones"] == len(re.findall(PII_PATTERNS["phone"], r["text"]))
        red = r["text"]
        for name, pat in PII_PATTERNS.items():
            red = re.sub(pat, f"<{name.upper()}>", red)
        assert m["redacted_md5"] == hashlib.md5(red.encode()).hexdigest()
    assert out[4]["n_emails"] == 1 and out[4]["n_ipv4"] == 1 and out[4]["n_phones"] == 1


def test_decorate_docs_matches_sql_mirror(spark, lined_corpus):
    import duckdb

    from whoosh_spark.functions.pipeline import decorate_docs, decorate_sql

    df, rows = lined_corpus
    got = {r["doc_id"]: r["text"] for r in decorate_docs(df).collect()}
    con = duckdb.connect()
    con.register("documents", __import__("pandas").DataFrame(rows))
    want = dict(con.execute(
        f"SELECT doc_id, {decorate_sql()} FROM documents").fetchall())
    assert got == want


def test_line_dedup_random_corpora_match_python_model(spark):
    """Property check: random multi-line corpora (shared line pool so
    cross-doc duplicates actually occur) against a pure-python model of
    the C4 rule, at several thresholds."""
    import random

    from whoosh_spark.functions.pipeline import line_dedup

    pool = [f"line {i}" for i in range(8)] + ["", "   "]  # incl. blank lines
    rng = random.Random(42)
    for trial in range(6):
        rows = [
            {"doc_id": i, "text": "\n".join(rng.choice(pool) for _ in range(rng.randint(0, 6)))}
            for i in range(12)
        ]
        min_docs = rng.choice([2, 3, 4])
        got = {r["doc_id"]: r.asDict()
               for r in line_dedup(_mk_docs(spark, rows), min_docs=min_docs).collect()}
        # python model
        from collections import defaultdict

        docs_per_line = defaultdict(set)
        for r in rows:
            for l in r["text"].split("\n"):
                if l.strip():
                    docs_per_line[l.strip()].add(r["doc_id"])
        hot = {l for l, ds in docs_per_line.items() if len(ds) >= min_docs}
        for r in rows:
            lines = [l for l in r["text"].split("\n") if l.strip()]
            if not lines:
                assert r["doc_id"] not in got, (trial, r)
                continue
            kept = [l for l in lines if l.strip() not in hot]
            m = got[r["doc_id"]]
            assert m["n_lines"] == len(lines), (trial, r)
            assert m["n_kept"] == len(kept), (trial, r)
            assert m["clean_md5"] == hashlib.md5("\n".join(kept).encode()).hexdigest(), (trial, r)
