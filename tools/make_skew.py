#!/usr/bin/env python
"""Adversarial cluster-skew corpus for the dedup/cluster family (round 16,
verdict item #4): one GIANT near-dup clique holding ~20% of all rows plus a
power-law cluster-size tail, instead of the uniform replication
tools/make_sf1.py produces. Every copy gets the standard per-copy ' tk<id>'
tag, so copies are NEAR-dups (distinct token sets — the exact-set collapse
never fires) and the clique survives candidate blocking end-to-end: this is
the worst corpus shape for star contraction (one O(clique^2) edge family
dominating the graph) and for the rep modes.

Output: <outDir>/documents.parquet only — the dedup/cluster gates read just
the documents table. doc_id 0..N-1 fresh; source column records the base
doc; lang/n_chars kept consistent with the text mutation.

Usage: python tools/make_skew.py [outDir] [cliqueSize] [powerS] [tailMax]
Defaults: .scratch/skew 12000 1.5 600 — ~60k rows total, clique = ~20%.
Driver-side tooling only (pyarrow)."""
import os, sys
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/skew"
CLIQUE = int(sys.argv[2]) if len(sys.argv) > 2 else 12000
POWER_S = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
TAIL_MAX = int(sys.argv[4]) if len(sys.argv) > 4 else 600
os.makedirs(OUT, exist_ok=True)

t = pq.read_table(f"{SRC}/documents.parquet")
docs = t.to_pylist()
# clique seed: the longest doc (maximizes shingle overlap dominance of the
# per-copy tag, keeping within-clique jaccard comfortably above tau)
seed = max(docs, key=lambda d: d["n_chars"])

rows = []
def emit(base, cluster_rank):
    i = len(rows)
    tag = f" tk{i}"
    rows.append({
        "doc_id": i,
        "text": base["text"] + tag,
        "lang": base["lang"],
        "source": f"skew_c{cluster_rank}_b{base['doc_id']}",
        "n_chars": base["n_chars"] + len(tag),
    })

for _ in range(CLIQUE):
    emit(seed, 0)
# power-law tail over the remaining base docs, largest clusters first:
# cluster r (r = 1, 2, ...) gets max(1, TAIL_MAX / r^POWER_S) members
tail = [d for d in docs if d["doc_id"] != seed["doc_id"]]
for r, base in enumerate(tail, start=1):
    k = max(1, int(TAIL_MAX / (r ** POWER_S)))
    for _ in range(k):
        emit(base, r)

table = pa.Table.from_pylist(rows, schema=pa.schema([
    ("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string()),
    ("source", pa.string()), ("n_chars", pa.int64())]))
pq.write_table(table, f"{OUT}/documents.parquet")
sizes = {}
for row in rows:
    c = row["source"].split("_b")[0]
    sizes[c] = sizes.get(c, 0) + 1
top = sorted(sizes.values(), reverse=True)[:10]
print(f"{len(rows)} rows -> {OUT}/documents.parquet; "
      f"clique={CLIQUE} ({100.0*CLIQUE/len(rows):.1f}%); "
      f"{len(sizes)} clusters; top sizes {top}")
