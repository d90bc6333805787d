#!/usr/bin/env python
"""Merge the parallel sf1 replay part-records into CORRECTNESS_sf1.json.
Later parts (fix runs) override earlier ones. Driver-side tooling."""
import json, sys, glob

out = {}
for path in sys.argv[1:]:
    for f in sorted(glob.glob(path)):
        out.update(json.load(open(f)))
oracle = json.load(open("/tmp/verify_sf1_out/oracle_sql.json"))
missing = sorted(set(oracle) - set(out))
if missing:
    print("MISSING:", missing)
green = sum(1 for v in out.values()
            if v.get("rows_match") and v.get("schema_match") and v.get("hash_match"))
bad = {k: v for k, v in out.items()
       if not (v.get("rows_match") and v.get("schema_match") and v.get("hash_match"))}
json.dump(dict(sorted(out.items())), open("CORRECTNESS_sf1.json", "w"), indent=1)
print(f"CORRECTNESS_sf1.json: {len(out)} records, {green} hash-green")
for k, v in sorted(bad.items()):
    print(" NOT GREEN:", k, v.get("err") or f"rows {v.get('spark_rows')} vs {v.get('oracle_rows')}")
