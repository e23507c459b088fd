"""Extended parser fuzz campaign: thousands of random query strings parsed
AND searched through both engines (reference Whoosh vs whoosh_spark) on
the same corpus; (docnum, score) top-10 lists must be identical.

Richer than the in-suite 80-string fuzz (tests/test_parser.py): longer
strings (up to 8 pieces), fuzzy suffixes, grouped fields, ranges with
exclusive ends, slop phrases, boosts on groups. Strings where the
reference itself raises are skipped (no defined behavior to match); the
skip count is reported so a parser-crash regression is visible.

ORACLE DESIGN: the reference PARSER is trusted; its composed MATCHERS are
not (duplicate-subquery cursor desync, AndMaybe/AndNot doc skips, DisMax
3+ smearing — see tests/test_fuzz_differential.py). So the primary check
converts the reference parse tree into OUR nodes (ref_tree_convert) and
compares canonical trees. Only when trees differ do we fall back to the
end-to-end result comparison — if the results still agree the trees were
normalize-equivalent; if not, it is a real parser-parity failure.

Usage: python scripts/parser_fuzz_campaign.py [n_strings] [seed]
"""

from __future__ import annotations

import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import Row  # noqa: E402

from conftest import load_reference_whoosh  # noqa: E402
from whoosh_spark.index import Index, build_index  # noqa: E402
from whoosh_spark.query.parser import QueryParser  # noqa: E402
from whoosh_spark.schema import IndexSchema, TEXT  # noqa: E402
from whoosh_spark.search import Searcher  # noqa: E402

VOCAB = "alfa bravo charlie delta echo foxtrot".split()

PIECES = VOCAB + [
    '"alfa bravo"', '"bravo charlie delta"~2', "AND", "OR", "NOT", "ANDNOT",
    "ANDMAYBE", "(", ")", "alfa^2", "(bravo echo)^3", "br*", "*lfa", "del?a",
    "text:charlie", "text:(alfa delta)", "+delta", "-echo", "~2",
    "[alfa TO delta]", "{alfa TO delta]", "[bravo TO}", "'alfa'",
    "charlie~", "brovo~2", "de*a", "", "^", ":", '"', "echo^0.5",
]


def run(spark, n_strings: int, seed: int, workdir: str) -> int:
    load_reference_whoosh()
    from whoosh import fields as wfields
    from whoosh.filedb.filestore import RamStorage
    from whoosh.qparser import QueryParser as WParser

    from ref_tree_convert import canon, convert

    rng = random.Random(seed)
    docs = [" ".join(rng.choice(VOCAB) for _ in range(rng.randint(5, 18)))
            for _ in range(80)]
    wix = RamStorage().create_index(wfields.Schema(text=wfields.TEXT()))
    w = wix.writer()
    for t in docs:
        w.add_document(text=t)
    w.commit()

    d = os.path.join(workdir, "pfuzz_ix")
    build_index(spark, spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(docs)]),
        IndexSchema.of(text=TEXT()), d, sha_col=None)
    s = Searcher(Index(spark, d))
    parser = QueryParser("text", IndexSchema.of(text=TEXT()))
    wparser = WParser("text", wix.schema)

    fails = skipped = checked = 0
    t0 = time.time()
    with wix.searcher() as ws:
        for i in range(n_strings):
            qs = " ".join(rng.choice(PIECES)
                          for _ in range(rng.randint(1, 8)))
            try:
                wq = wparser.parse(qs)
            except Exception:
                skipped += 1
                continue
            try:
                ours = parser.parse(qs)
            except Exception as e:
                fails += 1
                print(f"CRASH on {qs!r}: {type(e).__name__}: {e}")
                continue
            checked += 1
            try:
                want_tree = canon(convert(wq))
            except TypeError as e:
                skipped += 1  # node kind outside the conversion set
                continue
            if want_tree == canon(ours):
                continue
            # trees differ: maybe normalize-equivalent — grade by results
            try:
                want = [(h.docnum, round(h.score, 6))
                        for h in ws.search(wq, limit=10)]
            except Exception:
                skipped += 1
                continue
            got = [(r["doc_id"], round(r["score"], 6))
                   for r in s.search(ours, limit=10).collect()]
            if got != want:
                fails += 1
                print(f"MISMATCH {qs!r}\n  reftree={want_tree}\n"
                      f"  ourtree={canon(ours)}\n  got ={got}\n"
                      f"  want={want}")
            if (i + 1) % 250 == 0:
                print(f"  {i + 1}/{n_strings} ({checked} checked, "
                      f"{skipped} ref-crash skips), {fails} fails, "
                      f"{time.time() - t0:.0f}s", flush=True)
    s.clear_cache()
    print(f"DONE {n_strings} strings: {checked} checked, {skipped} "
          f"ref-crash skips, {fails} fails, {time.time() - t0:.0f}s")
    return fails


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 31_337
    import tempfile

    from pyspark.sql import SparkSession

    spark = (SparkSession.builder
             .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .appName("parser_fuzz_campaign").getOrCreate())
    with tempfile.TemporaryDirectory() as td:
        rc = run(spark, n, seed, td)
    spark.stop()
    sys.exit(1 if rc else 0)
