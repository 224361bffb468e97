#!/usr/bin/env python3
"""Time the DuckDB oracle replay over a sf dir — the single-node baseline
the engine's Bench totals are compared against (BASELINE.md). Mirrors
Bench methodology: one untimed warmup pass, then 2 timed full replays per
query, min per query, sum reported.

Usage: oracle_bench.py <sfDir> <oracle_sql.json> [threads]
"""
import sys, json, time
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def main():
    sf, sql_path = sys.argv[1], sys.argv[2]
    threads = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    oracle = json.load(open(sql_path))
    con = duckdb.connect()
    con.execute(f"SET threads={threads}")
    import os
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.isdir(p):  # Spark writes datasets as directories
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    # warmup
    for name, q in sorted(oracle.items()):
        try:
            con.execute(q).fetchall()
        except Exception:
            pass
    results, errors = {}, []
    for name, q in sorted(oracle.items()):
        times = []
        for _ in range(2):
            t0 = time.time()
            try:
                con.execute(q).fetchall()
                times.append(time.time() - t0)
            except Exception as e:
                if name not in errors:
                    errors.append(name)
        results[name] = round(min(times), 3) if times else -1.0
    total = round(sum(v for v in results.values() if v >= 0), 3)
    print(json.dumps({"metric": "oracle_total", "value": total,
                      "unit": "sec", "queries": results,
                      "errors": errors, "sf": sf}))

if __name__ == "__main__":
    main()
