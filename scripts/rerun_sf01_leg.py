#!/usr/bin/env python3
"""Re-run ONLY the given Spark bench legs (default: sf0.1) and
reassemble BENCH_FULL.json + BENCH_SCALING.json from the three
/tmp legs. Use after a mid-flight kill so completed sentinel-clean
legs aren't wastefully re-measured. The shared `assemble` refuses
mixed-query-set legs (a stale /tmp leg from an older binary), so a
partial rerun can't commit an internally inconsistent record.
Usage: python3 scripts/rerun_sf01_leg.py [sf0.001 sf0.01 sf0.1]
"""
import json, os, sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))
from make_artifacts import run_leg, assemble

ALL = ("sf0.001", "sf0.01", "sf0.1")
rerun = sys.argv[1:] or ["sf0.1"]
bad = [sf for sf in rerun if sf not in ALL]
if bad:
    raise SystemExit(f"unknown legs {bad}; choose from {ALL}")

for sf in rerun:
    run_leg(sf)
runs = {sf: json.load(open(f"/tmp/bench_full_{sf}.json")) for sf in ALL}
art = assemble(runs)
print(json.dumps({sf: {"cold": art[sf]["total_cold"], "warm": art[sf]["total_warm"],
                       "clean": runs[sf].get("sentinel_clean"),
                       "load": runs[sf].get("loadavg_start")} for sf in ALL}, indent=1))
