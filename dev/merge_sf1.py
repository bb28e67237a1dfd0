#!/usr/bin/env python3
"""Merge the per-batch sf1 oracle-parity artifacts (the resumable sf1
campaign runs check_timed.py against each Verify output dir) into one
CORRECTNESS_SF1_r{N}.json with the same summary shape check_timed
emits. Dev tooling only.

Usage: python3 dev/merge_sf1.py OUT.json IN1.json [IN2.json ...]
Later inputs win on key collisions (re-runs supersede).
"""
import sys, json

out_path, ins = sys.argv[1], sys.argv[2:]
per_query = {}
sf_dir = None
for p in ins:
    a = json.load(open(p))
    sf_dir = a.get("sf_dir", sf_dir)
    per_query.update(a["per_query"])

summary = {
    "sf_dir": sf_dir,
    "oracles": sum(1 for v in per_query.values() if v["status"] != "rows_only"),
    "pass": sum(1 for v in per_query.values() if v["status"] == "pass"),
    "fail": sum(1 for v in per_query.values()
                if v["status"] in ("fail", "oracle_error", "no_spark_output")),
    "oracle_timeout": sorted(k for k, v in per_query.items()
                             if v["status"] == "oracle_timeout"),
    "rows_only_queries": sorted(k for k, v in per_query.items()
                                if v["status"] == "rows_only"),
    "per_query": dict(sorted(per_query.items())),
}
with open(out_path, "w") as f:
    json.dump(summary, f, indent=1)
print(f"queries={len(per_query)} pass={summary['pass']} fail={summary['fail']} "
      f"timeout={len(summary['oracle_timeout'])} rows_only={len(summary['rows_only_queries'])}")
