"""Capture .explain("formatted") for the headline bench queries against the
bench sf index, for plans/r06/<query>_{before,after}.txt.

Usage: python scripts/explain_r06.py before|after [index_dir]

Uses the same Searcher settings as bench.py (exact_scores=True,
cache_postings=False) but with use_local=False so the DISTRIBUTED plan is
captured — the local fast path has no Spark plan to print.
"""
from __future__ import annotations

import io
import os
import sys
import contextlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import whoosh_spark.query as Q
from whoosh_spark.index import Index
from whoosh_spark.search import Searcher
from whoosh_spark.session import get_spark


def headline_cases():
    return {
        "q_term": Q.Term("text", "scan"),
        "q_and2": Q.And([Q.Term("text", "scan"), Q.Term("text", "merge")]),
        "q_and3": Q.And([Q.Term("text", "scan"), Q.Term("text", "merge"), Q.Term("text", "join")]),
        "q_or3": Q.Or([Q.Term("text", "scan"), Q.Term("text", "join"), Q.Term("text", "window")]),
        "q_or5": Q.Or([Q.Term("text", t) for t in ["scan", "join", "window", "sort", "batch"]]),
        "q_andnot": Q.AndNot(Q.Term("text", "scan"), Q.Term("text", "join")),
        "q_phrase2": Q.Phrase("text", ["order", "sort"]),
        "q_prefix": Q.Prefix("text", "s"),
        "q_dismax": Q.DisjunctionMax([Q.Term("text", "scan"), Q.Term("text", "join")]),
    }


def main():
    tag = sys.argv[1]
    idx_dir = sys.argv[2] if len(sys.argv) > 2 else ".index_cache/bench_sf1.0"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("explain_r06", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    s = Searcher(Index(spark, idx_dir), exact_scores=True, cache_postings=False,
                 use_local=False)
    for name, q in headline_cases().items():
        spark.sparkContext.setJobDescription(f"explain {name}")
        df = s.search(q, limit=10)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(name, "written")
    spark.stop()


if __name__ == "__main__":
    main()
