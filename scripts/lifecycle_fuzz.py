"""Index-lifecycle fuzz: random add / delete / update / merge / optimize
sequences graded against a pure-python model of the live corpus.

Invariants checked after EVERY op:
  - Index.doc_count() == number of live model docs;
  - for a random probe term, the search doc-id set == the model's set of
    live docs containing the term (scores not compared here: tombstoned
    docs legitimately still affect global stats until expunged — reference
    keeps doc_count_all in idf the same way);
and after every OPTIMIZE (tombstone-free index, stats == live corpus):
  - exact BM25 top-k (doc_id, score) equality vs the python oracle from
    tests/test_fuzz_differential.py.

Usage: python scripts/lifecycle_fuzz.py [episodes] [ops_per_episode] [seed]
"""

from __future__ import annotations

import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

from pyspark.sql import Row  # noqa: E402

import test_fuzz_differential as fz  # noqa: E402
import whoosh_spark.query as Q  # noqa: E402
from whoosh_spark.index import Index, build_index  # noqa: E402
from whoosh_spark.index.build import build_segment  # noqa: E402
from whoosh_spark.index.merge import (apply_merge_policy, delete_by_term,  # noqa: E402
                                      delete_docs, update_documents)
from whoosh_spark.schema import ID, TEXT, IndexSchema  # noqa: E402
from whoosh_spark.search import Searcher  # noqa: E402

VOCAB = fz.VOCAB
K = 15


def _text(rng: random.Random) -> str:
    return " ".join(rng.choice(VOCAB) for _ in range(rng.randint(3, 15)))


def episode(spark, workdir: str, seed: int, n_ops: int) -> int:
    rng = random.Random(seed)
    d = os.path.join(workdir, f"lifecycle_{seed}")
    schema = IndexSchema.of(key=ID(stored=True, unique=True), value=TEXT())

    next_id = 0
    model: dict[int, str] = {}
    #: unique key per live doc — an updated doc KEEPS its victim's key, so
    #: later updates must target keys[kid], not f"k{kid}"
    keys: dict[int, str] = {}
    #: schema evolution state: live keyword fields -> {doc_id: tag value};
    #: dead_tags = removed fields whose data must stay invisible
    tags: dict[str, dict[int, str]] = {}
    dead_tags: list[str] = []
    n_tags = 0

    def new_docs(n):
        nonlocal next_id
        out = []
        for _ in range(n):
            out.append((next_id, _text(rng)))
            next_id += 1
        return out

    def add_df(docs):
        # each live doc carries each live tag with p=0.7 (else NULL),
        # exercising absent/None values through the build kernels; explicit
        # schema so an all-NULL tag column can't infer as NullType
        tag_names = sorted(tags)
        rows = []
        for i, t in docs:
            vals = []
            for tf in tag_names:
                if rng.random() < 0.7:
                    v = rng.choice(VOCAB)
                    vals.append(v)
                    tags[tf][i] = v
                else:
                    vals.append(None)
            keys[i] = f"k{i}"
            rows.append((i, keys[i], t, *vals))
        ddl = "doc_id long, key string, value string" + "".join(
            f", {tf} string" for tf in tag_names)
        return spark.createDataFrame(rows, schema=ddl)

    first = new_docs(rng.randint(5, 20))
    keys.update({i: f"k{i}" for i, _ in first})
    df = spark.createDataFrame(
        [Row(doc_id=i, key=keys[i], value=t) for i, t in first])
    build_index(spark, df, schema, d, sha_col=None)
    model.update(dict(first))

    fails = 0

    def check(where: str, score_exact: bool = False):
        nonlocal fails
        ix = Index(spark, d)
        got_n = ix.doc_count()
        if got_n != len(model):
            fails += 1
            print(f"FAIL seed={seed} after {where}: doc_count {got_n} != "
                  f"model {len(model)}")
        word = rng.choice(VOCAB)
        s = Searcher(ix)
        rows = s.search(Q.Term("value", word), limit=None).collect()
        got_ids = sorted(r["doc_id"] for r in rows)
        want_ids = sorted(i for i, t in model.items() if word in t.split())
        if got_ids != want_ids:
            fails += 1
            print(f"FAIL seed={seed} after {where}: term {word!r} ids\n"
                  f"  got ={got_ids}\n  want={want_ids}")
        # live tag fields: search ids == model; dead fields: invisible
        for tf, vals in tags.items():
            live_vals = {i: v for i, v in vals.items() if i in model}
            if live_vals:
                probe = rng.choice(sorted(set(live_vals.values())))
                got_t = sorted(r["doc_id"] for r in
                               s.search(Q.Term(tf, probe),
                                        limit=None).collect())
                want_t = sorted(i for i, v in live_vals.items() if v == probe)
                if got_t != want_t:
                    fails += 1
                    print(f"FAIL seed={seed} after {where}: tag {tf}={probe!r}"
                          f"\n  got ={got_t}\n  want={want_t}")
        for tf in dead_tags:
            if s.search(Q.Term(tf, rng.choice(VOCAB)), limit=None).collect():
                fails += 1
                print(f"FAIL seed={seed} after {where}: removed field {tf} "
                      f"still matches")
            if tf in ix.docs().columns:
                fails += 1
                print(f"FAIL seed={seed} after {where}: removed field {tf} "
                      f"still a stored column")
        if score_exact and model:
            ids = sorted(model)
            remap = {i: j for j, i in enumerate(ids)}
            oracle = fz.PyOracle([model[i] for i in ids])
            q = Q.Or([Q.Term("value", rng.choice(VOCAB)),
                      Q.Term("value", rng.choice(VOCAB))])
            want = sorted((d2, round(sc, 9))
                          for d2, sc in oracle.eval(
                              Q.Or([Q.Term("text", c.text)
                                    for c in q.subqueries])).items())
            got = sorted((remap[r["doc_id"]], round(r["score"], 9))
                         for r in s.search(q, limit=None).collect())
            # unlimited + id-sorted: no top-k tie-boundary ambiguity
            if got != want:
                fails += 1
                print(f"FAIL seed={seed} after {where}: optimized scores\n"
                      f"  got ={got}\n  want={want}")
        s.clear_cache()

    check("build")
    for op_i in range(n_ops):
        op = rng.choice(["add", "add", "delete_ids", "delete_term",
                         "update", "merge_small", "optimize",
                         "add_field", "remove_field"])
        if op == "add":
            docs = new_docs(rng.randint(1, 12))
            cur = Index(spark, d).schema  # evolution-aware schema
            build_segment(spark, add_df(docs), cur, d, sha_col=None)
            model.update(dict(docs))
        elif op == "add_field":
            if len(tags) < 3:  # bound schema growth
                name = f"tag{n_tags}"
                n_tags += 1
                Index(spark, d).add_field(name, ID(stored=True))
                tags[name] = {}
        elif op == "remove_field":
            if tags:
                name = rng.choice(sorted(tags))
                Index(spark, d).remove_field(name)
                del tags[name]
                dead_tags.append(name)
        elif op == "delete_ids":
            live = sorted(model)
            if live:
                victims = rng.sample(live, min(len(live),
                                               rng.randint(1, 5)))
                delete_docs(spark, d, victims)
                for v in victims:
                    model.pop(v)
        elif op == "delete_term":
            word = rng.choice(VOCAB)
            n = delete_by_term(spark, d, "value", word)
            want_victims = [i for i, t in model.items()
                            if word in t.split()]
            if n != len(want_victims):
                fails += 1
                print(f"FAIL seed={seed} op{op_i} delete_by_term({word!r}) "
                      f"reported {n}, model expects {len(want_victims)}")
            for v in want_victims:
                model.pop(v)
        elif op == "update":
            # mix: replace 1-2 existing keys, add 0-1 new key
            upd = []
            live = sorted(model)
            for kid in rng.sample(live, min(len(live), rng.randint(1, 2))):
                nid, t = new_docs(1)[0]
                upd.append((nid, keys[kid], t))  # the VICTIM'S actual key
                keys[nid] = keys[kid]
                model.pop(kid)
                model[nid] = t
            if rng.random() < 0.5:
                nid, t = new_docs(1)[0]
                keys[nid] = f"k{nid}"
                upd.append((nid, keys[nid], t))
                model[nid] = t
            if not upd:  # model empty + no-new-key roll: nothing to update
                continue
            df = spark.createDataFrame(
                [Row(doc_id=i, key=k, value=t) for i, k, t in upd])
            update_documents(spark, df, d, unique_field="key", sha_col=None)
        elif op == "merge_small":
            apply_merge_policy(spark, d, "MERGE_SMALL")
        else:
            apply_merge_policy(spark, d, "OPTIMIZE")
        check(f"op{op_i}:{op}", score_exact=(op == "optimize"))
    return fails


if __name__ == "__main__":
    episodes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n_ops = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    seed0 = int(sys.argv[3]) if len(sys.argv) > 3 else 7_000
    import tempfile

    from whoosh_spark.session import get_spark

    spark = get_spark(
        "lifecycle_fuzz",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
        shuffle_partitions=8,
    )
    total = 0
    t0 = time.time()
    with tempfile.TemporaryDirectory() as td:
        for e in range(episodes):
            total += episode(spark, td, seed0 + e, n_ops)
            print(f"episode {e + 1}/{episodes} done, total fails {total}, "
                  f"{time.time() - t0:.0f}s", flush=True)
    spark.stop()
    print(f"DONE {episodes}x{n_ops} ops, {total} fails")
    sys.exit(1 if total else 0)
