#!/usr/bin/env python
"""Build/refresh BASELINE_ROWS.json — the canonical machine-readable bench
ledger (round-8 verdict item #1): one row per SparkEntry query with the
recorded sf0.1 best-of-K baseline (the 2x-gate comparand) and the sf1 wall
where recorded.

Sources, in priority order per query:
  1. the CURRENT best-of-K 2-col tables in BASELINE.md (round-6/7 zone);
  2. the sf0.1 column of the 10x-scaling tables (same protocol);
  3. prose mentions "q_name 0.98" / "q_name 0.98 -> 1.43" in the zone;
  4. --fill FILE: a bench JSONL (query/sec lines) from a fresh clean run,
     recorded as recorded_at=<--round> for queries still missing.

sf1_s comes from the scaling tables; --sf1 FILE merges a full-suite sf1
bench JSONL into sf1_s for every query (recorded_at kept per-field).

Usage: python tools/baseline_rows.py [--fill bench.jsonl] [--sf1 bench.jsonl]
       [--round r8] [--exponents]
--exponents (r16, verdict item #8): instead of writing the ledger, print a
markdown table of the per-query scaling exponent alpha(0.1->1) =
ln(sf1_s/sf0.1_s)/ln(10) for every ledger row that has both walls, flagging
everything above 1.3 — superlinear movers surface automatically instead of
by hand-picked headline queries. Sub-second sf0.1 walls are noted (their
exponent is floor-dominated and reads LOW, never high — a flag there is
real).
Driver-side tooling only; the Scala library reads the JSON in tests.
"""
import re, json, sys, os, math

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MD = os.path.join(ROOT, "BASELINE.md")
OUT = os.path.join(ROOT, "BASELINE_ROWS.json")

args = sys.argv[1:]
def opt(name):
    return args[args.index(name) + 1] if name in args else None
fill = opt("--fill")
sf1f = opt("--sf1")
rnd = opt("--round") or "r8"

if "--exponents" in args:
    ledger = json.load(open(OUT))
    rows = []
    for q, e in sorted(ledger.items()):
        a, b = e.get("sf0.1_s"), e.get("sf1_s")
        if a and b and a > 0 and b > 0:
            rows.append((q, a, b, math.log(b / a) / math.log(10)))
    rows.sort(key=lambda r: -r[3])
    print("| query | sf0.1_s | sf1_s | alpha(0.1->1) | note |")
    print("|---|---|---|---|---|")
    flagged = []
    for q, a, b, al in rows:
        notes = []
        if al > 1.3:
            notes.append("**FLAG > 1.3**")
            flagged.append(q)
        if a < 1.0:
            notes.append("sub-second sf0.1 (floor-dominated)")
        print(f"| {q} | {a:.2f} | {b:.2f} | {al:.2f} | {'; '.join(notes)} |")
    n_miss = sum(1 for e in ledger.values()
                 if not (e.get("sf0.1_s") and e.get("sf1_s")))
    print(f"\n{len(rows)} queries with both walls; {n_miss} missing a wall; "
          f"{len(flagged)} flagged > 1.3: {' '.join(flagged) or '(none)'}")
    sys.exit(0)

lines = open(MD).read().splitlines()
# canonical zone: after the round-6 CURRENT header, before the superseded
# round-4 single-run section
lo = next(i for i, l in enumerate(lines) if l.startswith("## CURRENT baseline"))
hi = next(i for i, l in enumerate(lines) if l.startswith("## Superseded"))

ledger = {}
def put(q, field, val, src):
    e = ledger.setdefault(q, {"sf0.1_s": None, "sf1_s": None,
                              "protocol": "best-of-k",
                              "recorded_at": None, "source": None})
    if field == "sf0.1_s" and e["sf0.1_s"] is None:
        e["sf0.1_s"] = val
        e["source"] = src
        e["recorded_at"] = "r6/r7"
    if field == "sf1_s" and e["sf1_s"] is None:
        e["sf1_s"] = val

# pass 1: 2-col CURRENT tables (highest priority for sf0.1)
for l in lines[lo:hi]:
    m = re.match(r"^\|\s*(q\w+)\s*\|\s*([0-9.]+)\s*\|\s*$", l)
    if m:
        put(m.group(1), "sf0.1_s", float(m.group(2)), "BASELINE.md best-of-K table")
# pass 2: scaling tables "| q | sf0.1 | sf1 | ..." (also fills sf1)
for l in lines[lo:hi]:
    m = re.match(r"^\|\s*(q\w+)\s*\|\s*([0-9.]+)\s*\|\s*([0-9.]+)\s*\|", l)
    if m:
        put(m.group(1), "sf0.1_s", float(m.group(2)), "BASELINE.md 10x table")
        put(m.group(1), "sf1_s", float(m.group(3)), "")
# pass 3: prose "q_name 0.98" (optionally "-> 1.43" = sf1)
zone = "\n".join(lines[lo:hi])
for m in re.finditer(r"\b(q\w+) ([0-9]+\.[0-9]+)(?:\s*(?:→|->)\s*([0-9]+\.[0-9]+))?", zone):
    q, v, v1 = m.group(1), float(m.group(2)), m.group(3)
    put(q, "sf0.1_s", v, "BASELINE.md prose")
    if v1:
        put(q, "sf1_s", float(v1), "")

# keep prior JSON entries not re-derivable from BASELINE.md (fresh r8+
# recordings) BEFORE the fill/sf1 merges so those can update them too
if os.path.exists(OUT):
    prev = json.load(open(OUT))
    for q, e in prev.items():
        if q not in ledger:
            ledger[q] = e

def merge_jsonl(path, field, src):
    for line in open(path):
        line = line.strip()
        if not line:
            continue
        d = json.loads(line)
        q, sec = d["query"], d["sec"]
        if sec < 0:
            continue
        e = ledger.setdefault(q, {"sf0.1_s": None, "sf1_s": None,
                                  "protocol": "best-of-k",
                                  "recorded_at": rnd, "source": src})
        if e[field] is None:
            e[field] = round(sec, 4)
            if field == "sf0.1_s":
                e["recorded_at"] = rnd
                e["source"] = src

if fill:
    merge_jsonl(fill, "sf0.1_s", f"fresh {rnd} run")
if sf1f:
    # sf1 sweep overwrites: one uniform protocol for the whole column
    for line in open(sf1f):
        line = line.strip()
        if not line:
            continue
        d = json.loads(line)
        if d["sec"] >= 0 and d["query"] in ledger:
            ledger[d["query"]]["sf1_s"] = round(d["sec"], 4)

json.dump(dict(sorted(ledger.items())), open(OUT, "w"), indent=1)
n = len(ledger)
n01 = sum(1 for e in ledger.values() if e["sf0.1_s"] is not None)
n1 = sum(1 for e in ledger.values() if e["sf1_s"] is not None)
print(f"{OUT}: {n} queries, {n01} with sf0.1_s, {n1} with sf1_s")
missing = sorted(q for q, e in ledger.items() if e["sf0.1_s"] is None)
if missing:
    print("missing sf0.1:", " ".join(missing))
