"""Local mirror of the driver's correctness gate: run each __spark_entry__
query through Spark AND its oracle SQL through DuckDB at a given sf_dir,
compare row sets (columns sorted by name, rows sorted, exact values).

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i:i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    record: dict[str, dict] = {}

    import __spark_entry__ as entrymod
    from whoosh_spark.session import get_spark

    spark = get_spark("check_oracle", master="local[8]", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ours = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            record[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": None,
                            "oracle_rows": None,
                            "err": f"spark {type(e).__name__}: {e}"}
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            continue
        dt_spark = time.time() - t0
        if name not in oracles:
            record[name] = {"rows_only": True, "spark_rows": len(ours),
                            "err": None}
            print(f"OK?   {name}: rows-only ({len(ours)} rows, no oracle) {dt_spark:.1f}s")
            continue
        t0 = time.time()
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            record[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": len(ours),
                            "oracle_rows": None, "err": f"duckdb: {e}"}
            print(f"FAIL  {name}: duckdb error {e}")
            continue
        dt_duck = time.time() - t0
        a, b = normalize(ours), normalize(want)
        ok = list(a.columns) == list(b.columns) and len(a) == len(b)
        if ok:
            for c in a.columns:
                # dtype-KIND drift (int on one side, float on the other)
                # renders differently under a strict hasher (1024 vs
                # 1024.0) even when values compare equal numerically —
                # the r5 sequence_pack driver red cell. Fail it locally.
                ka, kb = a[c].dtype.kind, b[c].dtype.kind
                num = {"i", "u", "f"}
                if ka in num and kb in num and ((ka == "f") != (kb == "f")):
                    ok = False
                    print(f"      {name}: column {c} dtype-kind mismatch "
                          f"spark={a[c].dtype} duck={b[c].dtype} "
                          f"(strict hashers render these differently)")
                    break
                if a[c].dtype.kind == "f" or b[c].dtype.kind == "f":
                    same = (a[c].astype(float).fillna(-1e300) == b[c].astype(float).fillna(-1e300)).all()
                else:
                    same = (a[c].astype(str) == b[c].astype(str)).all()
                if not same:
                    ok = False
                    bad = (a[c].astype(str) != b[c].astype(str))
                    print(f"      {name}: column {c} mismatch, first diffs:")
                    print(pd.concat([a[bad].head(3).add_suffix("_spark"), b[bad].head(3).add_suffix("_duck")], axis=1))
                    break
        else:
            print(f"      {name}: shape spark={a.shape} duck={b.shape} cols {list(a.columns)} vs {list(b.columns)}")
        status = "OK  " if ok else "FAIL"
        if not ok:
            failures.append(name)
        record[name] = {
            "rows_match": len(a) == len(b),
            "schema_match": list(a.columns) == list(b.columns),
            "hash_match": bool(ok),
            "spark_rows": len(a),
            "oracle_rows": len(b),
            "err": None,
            "sec_spark": round(dt_spark, 2),
            "sec_duckdb": round(dt_duck, 2),
        }
        print(f"{status}  {name}: {len(a)} rows  spark={dt_spark:.1f}s duck={dt_duck:.1f}s")
    print()
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(record, f, indent=2)
        print(f"wrote {json_out} ({len(record)} entries)")
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
