#!/usr/bin/env python3
"""Persist the DuckDB-oracle timing comparison (VERDICT r6 item 10).

Runs every SparkEntry.oracleSql query in DuckDB (threads=32, min-of-2)
against the given sf dir and writes per-query seconds + total, so the
judge's spark-vs-oracle ratio is auditable each round without re-running
DuckDB by hand.

Usage: python3 dev/oracle_times.py <sfDir> <oracle_sql.json> <out.json>
  e.g. python3 dev/oracle_times.py /root/testdata/sf0.1 \
         /tmp/verify_full_r7/oracle_sql.json dev/oracle_times_r7.json
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> None:
    sf_dir, sql_path, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    sqls = json.load(open(sql_path))
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        # same mount as dev/check.py (read_parquet handles both a single
        # file and a Spark-written directory of part files)
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    times = {}
    for name in sorted(sqls):
        best = None
        for _ in range(2):
            t0 = time.time()
            try:
                con.execute(sqls[name]).fetchall()
            except Exception as e:  # pragma: no cover
                print(f"[oracle] {name} ERROR {e}", file=sys.stderr)
                best = None
                break
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        if best is not None:
            times[name] = round(best, 4)
            print(f"[oracle] {name} {best:.3f}")
    total = round(sum(times.values()), 2)
    artifact = {"metric": "oracle_total", "value": total, "unit": "sec",
                "engine": f"duckdb {duckdb.__version__}, threads=32, min-of-2",
                "sf": sf_dir, "n_queries": len(times), "queries": times}
    # spark-vs-oracle ratio against the committed bench floor, if present
    try:
        bench = json.load(open("bench_times.json"))
        if bench.get("sf") == sf_dir:
            common = [q for q in times if q in bench["queries"]]
            spark_total = sum(bench["queries"][q] for q in common)
            oracle_total = sum(times[q] for q in common)
            artifact["spark_total_on_common"] = round(spark_total, 2)
            artifact["ratio_spark_over_oracle"] = round(
                spark_total / oracle_total, 3)
    except Exception:
        pass
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"[oracle] total {total}s over {len(times)} queries -> {out_path}")


if __name__ == "__main__":
    main()
