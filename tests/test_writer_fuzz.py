"""Seeded fuzz of the buffered writer: random sessions of add_document /
update_document / delete_document / delete_by_term / commit / cancel are
graded against a pure-python model after every commit.

Commit-order semantics (index/writer.py): deletes and update-tombstones
run against the PRE-COMMIT index, buffered adds (incl. update re-adds)
land as one new segment after. Each session touches distinct unique keys,
matching the reference writer's delete-then-add usage shape.
"""

import random

import pytest

import whoosh_spark.query as Q
from whoosh_spark.index import Index, create_in
from whoosh_spark.schema import ID, TEXT, IndexSchema
from whoosh_spark.search import Searcher

VOCAB = ["alfa", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
         "hotel", "india", "juliet"]


def _text(rng):
    return " ".join(rng.choice(VOCAB) for _ in range(rng.randint(2, 7)))


@pytest.mark.parametrize("seed", [1301, 1302])
def test_writer_session_fuzz(spark, tmp_path, seed):
    rng = random.Random(seed)
    d = str(tmp_path / f"wfuzz{seed}")
    schema = IndexSchema.of(key=ID(stored=True, unique=True), body=TEXT())
    ix = create_in(spark, d, schema)

    model = {}  # key -> (doc_id, text)
    next_key = 0

    for session in range(6):
        w = ix.writer()
        touched = set()
        cancel = rng.random() < 0.2
        snapshot = dict(model)
        for _ in range(rng.randint(1, 5)):
            op = rng.choice(["add", "add", "update", "del_id", "del_term"])
            if op == "add":
                k, t = f"k{next_key}", _text(rng)
                next_key += 1
                did = w.add_document(key=k, body=t)
                model[k] = (did, t)
                touched.add(k)
            elif op == "update":
                live = sorted(k for k in model if k not in touched)
                if not live:
                    continue
                k = rng.choice(live)
                t = _text(rng)
                did = w.update_document(key=k, body=t)
                model[k] = (did, t)
                touched.add(k)
            elif op == "del_id":
                live = sorted(k for k in model if k not in touched)
                if not live:
                    continue
                k = rng.choice(live)
                w.delete_document(model[k][0])
                del model[k]
                touched.add(k)
            else:
                word = rng.choice(VOCAB)
                victims = [k for k, (_, t) in model.items()
                           if word in t.split() and k not in touched]
                w.delete_by_term("body", word)
                for k in victims:
                    del model[k]
                touched.update(victims)
        if cancel:
            w.cancel()
            model = snapshot
        else:
            w.commit(merge=rng.random() < 0.5)
        ix.reload()

        assert ix.doc_count() == len(model), (seed, session)
        s = Searcher(ix)
        word = rng.choice(VOCAB)
        got = sorted(r["doc_id"] for r in
                     s.search(Q.Term("body", word), limit=None).collect())
        want = sorted(did for did, t in model.values()
                      if word in t.split())
        assert got == want, (seed, session, word)
        s.clear_cache()
