#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB on a fixture dir — the local baseline
for BENCH comparisons. Usage: python3 scripts/bench_duck.py <sfDir> <oracle_sql.json>
"""
import sys, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, oracle_path):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(oracle_path))
    times = {}
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
            times[name] = round(time.time() - t0, 3)
        except Exception as e:
            times[name] = f"ERR {e}"
    total = sum(v for v in times.values() if isinstance(v, float))
    for k, v in sorted(times.items(), key=lambda kv: -(kv[1] if isinstance(kv[1], float) else 0)):
        print(f"{v:>8}  {k}")
    print(f"total {round(total,1)}s over {len(times)} queries")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
