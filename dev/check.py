#!/usr/bin/env python3
"""Local simulation of the driver's correctness gate.

Usage: python3 dev/check.py [sfdir] [outdir]

Runs DuckDB on the oracle SQL from <outdir>/oracle_sql.json (written by
`sbt "runMain graft.Verify <sfdir> <outdir>"`) and hash-compares each
result with the Spark parquet dump, sorting columns by name and rows by
value — the same normalization the driver describes.
"""
import glob
import json
import math
import os
import sys

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if isinstance(v, float):
            if v == int(v) and abs(v) < 1e15:
                return str(int(v))
            return repr(round(v, 9))
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return "[" + ",".join(cell(x) for x in v) + "]"
        return str(v)

    out = df.apply(lambda c: c.map(cell))
    return out.sort_values(by=list(out.columns), ignore_index=True)


def main() -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{OUT}/oracle_sql.json") as f:
        oracles = json.load(f)

    names = sorted(d for d in os.listdir(OUT) if os.path.isdir(f"{OUT}/{d}"))
    passed = failed = weak = 0
    for name in names:
        files = glob.glob(f"{OUT}/{name}/*.parquet")
        spark = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True) \
            if files else pd.DataFrame()
        if name not in oracles:
            status = "rows-only" if len(spark) > 0 else "rows-only EMPTY"
            weak += 1
            print(f"  ~ {name}: {status} ({len(spark)} rows)")
            continue
        try:
            oracle = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failed += 1
            print(f"  ✗ {name}: oracle SQL error: {e}")
            continue
        ns, no = norm(spark), norm(oracle)
        if list(ns.columns) != list(no.columns):
            failed += 1
            print(f"  ✗ {name}: column mismatch spark={list(ns.columns)} oracle={list(no.columns)}")
        elif len(ns) != len(no):
            failed += 1
            print(f"  ✗ {name}: row count spark={len(ns)} oracle={len(no)}")
        elif not ns.equals(no):
            failed += 1
            diff = (ns != no).any(axis=1)
            idx = diff[diff].index[:3]
            print(f"  ✗ {name}: value mismatch at rows {list(idx)}")
            for i in idx:
                print(f"      spark : {ns.loc[i].to_dict()}")
                print(f"      oracle: {no.loc[i].to_dict()}")
        else:
            passed += 1
            print(f"  ✓ {name} ({len(ns)} rows)")
    print(f"\n{passed} passed, {failed} failed, {weak} rows-only")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
