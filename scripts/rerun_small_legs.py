#!/usr/bin/env python3
"""Re-run the sf0.001 + sf0.01 Spark bench legs on a quiet host, then
reassemble BENCH_FULL.json + BENCH_SCALING.json from all three /tmp
legs (sf0.1 already re-measured clean)."""
import json, os, subprocess, sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))
from make_artifacts import OPENS

cp = f"{REPO}/target/scala-2.13/classes:/opt/spark/jars/*"
for sf in ("sf0.001", "sf0.01"):
    full_path = f"/tmp/bench_full_{sf}.json"
    if os.path.exists(full_path):
        os.remove(full_path)
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=f"/root/testdata/{sf}",
               SPARK_GRAFT_BENCH_FULL=full_path)
    cmd = (f"java {OPENS} -Xmx16g -Dspark.ui.enabled=false "
           f"-Dspark.sql.session.timeZone=UTC -cp '{cp}' graft.Bench")
    res = subprocess.run(cmd, shell=True, env=env, capture_output=True, text=True)
    if res.returncode != 0 or not os.path.exists(full_path):
        sys.stderr.write(f"bench failed for {sf} (rc={res.returncode}); stderr tail:\n"
                         + "\n".join(res.stderr.splitlines()[-20:]) + "\n")
        raise SystemExit(1)

runs = {sf: json.load(open(f"/tmp/bench_full_{sf}.json"))
        for sf in ("sf0.001", "sf0.01", "sf0.1")}
art = {"_meta": {
    "harness": "graft.Bench — noop-sink full materialization; per-query cold (first run, incl. Catalyst planning + Janino codegen compile) and warm (median of 3 re-runs, codegen cache hot) seconds; local[32], AQE on, shuffle.partitions=32",
    "duckdb_baseline": "BASELINE_DUCK.json — best-of-2 seconds per oracle statement on the same parquet",
    "n_queries_bench": len(runs["sf0.1"]["queries"])}}
for sf, d in runs.items():
    art[sf] = {"total_cold": round(d["value"], 2), "total_warm": round(d["value_warm"], 2),
               "n_failed": d["n_failed"],
               "cold": {k: round(v["cold"], 3) for k, v in d["queries"].items()},
               "warm": {k: round(v["warm"], 3) for k, v in d["queries"].items()}}
    if sf == "sf0.1":
        json.dump(d, open(os.path.join(REPO, "BENCH_FULL.json"), "w"), indent=1)
json.dump(art, open(os.path.join(REPO, "BENCH_SCALING.json"), "w"), indent=1)
print(json.dumps({sf: {"cold": art[sf]["total_cold"], "warm": art[sf]["total_warm"],
                       "clean": runs[sf].get("sentinel_clean"),
                       "load": runs[sf].get("loadavg_start")} for sf in runs}, indent=1))
