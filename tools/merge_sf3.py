#!/usr/bin/env python
"""Merge the round-10 sf3 sweep's partial check.py --json outputs into
CORRECTNESS_sf3.json. The sweep ran in parts (the 30x oracles needed
per-part DuckDB memory limits and isolated spill dirs); later files
override earlier ones, and queries listed in EXCEPTIONS get an explicit
documented-intractable record instead of a silent gap.

Usage: python tools/merge_sf3.py out.json part1.json part2.json ...
"""
import json, sys

EXCEPTIONS = {
    # oracle-side intractability at the 30x replica; the ENGINE ran each
    # of these fine (outputs in .scratch/verify_sf3) — it is the DuckDB
    # all-pairs / unrolled-round REPLAY that exceeds the box.
    "q_dbscan": "oracle timeout (>900s): all-pairs neighborhood replay is "
                "quadratic in rows at sf3 (150k docs)",
    "q_dedup_clusters": "oracle exceeds local disk (>74G spill): the "
                        "unrolled min-label rounds materialize the 3x-replica "
                        "pair closure; passed in full at sf1 (r9 sweep)",
    "q_dedup_ngram": "oracle exceeds local disk (>57G spill, capped and "
                     "uncapped): the blocked-Jaccard replay joins the "
                     "3x-replica's quadratic block closure; sf1 replay green",
    "q_dup_matrix": "oracle exceeds local disk (>57G spill, capped and "
                    "uncapped): pairwise duplicate-matrix replay over the "
                    "3x-replica closure; sf1 replay green (r9 sweep)",
}

def main():
    out_path, parts = sys.argv[1], sys.argv[2:]
    merged = {}
    for p in parts:
        try:
            merged.update(json.load(open(p)))
        except FileNotFoundError:
            sys.stderr.write(f"[merge] missing {p} (skipped)\n")
    for q, why in EXCEPTIONS.items():
        rec = merged.get(q)
        # keep a real pass if a retry landed one; otherwise document
        if not rec or not (rec.get("rows_match") and rec.get("hash_match")):
            merged[q] = {"rows_match": None, "schema_match": None,
                         "hash_match": None, "spark_rows": None,
                         "oracle_rows": None,
                         "err": f"DOCUMENTED ORACLE-TRACTABILITY EXCEPTION: {why}"}
    ok = sum(1 for v in merged.values()
             if v.get("rows_match") and v.get("schema_match") and v.get("hash_match"))
    exc = sum(1 for v in merged.values()
              if (v.get("err") or "").startswith("DOCUMENTED"))
    bad = sorted(q for q, v in merged.items()
                 if not (v.get("rows_match") and v.get("hash_match"))
                 and not (v.get("err") or "").startswith("DOCUMENTED"))
    json.dump(dict(sorted(merged.items())), open(out_path, "w"), indent=1)
    print(f"{out_path}: {len(merged)} records, {ok} pass, {exc} documented "
          f"exceptions, {len(bad)} other: {bad}")

if __name__ == "__main__":
    main()
