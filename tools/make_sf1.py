#!/usr/bin/env python
"""Generate a ~10x replica of /root/testdata/sf0.1 ("sf1") for the scaling
benchmark (BENCH_sf1): each fact table is unioned 10 times with key columns
shifted per copy so cardinalities scale like real 10x data (keys, users,
docs, vectors all 10x; the date/time domain stays fixed, as in TPC-H where
larger SFs densify the same 7-year window). Foreign keys shift by the
PARENT table's stride, so referential integrity holds per copy.

Driver-side tooling only (pyarrow) — the Scala library never depends on
this. Output goes under the repo scratch dir (gitignored), NOT /root/testdata.

Usage: python tools/make_sf1.py [outDir] [copies]
"""
import os, sys
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1"
COPIES = int(sys.argv[2]) if len(sys.argv) > 2 else 10
os.makedirs(OUT, exist_ok=True)


def key_stride(name, col):
    """Shift stride for a primary key: parent max+1 so copies never collide."""
    t = pq.read_table(f"{SRC}/{name}.parquet", columns=[col])
    return pc.max(t.column(col)).as_py() + 1


# one stride per key domain, reused for every FK that references it
STRIDE = {
    "c_custkey": key_stride("customer", "c_custkey"),
    "s_suppkey": key_stride("supplier", "s_suppkey"),
    "p_partkey": key_stride("part", "p_partkey"),
    "o_orderkey": key_stride("orders", "o_orderkey"),
    "event_id": key_stride("events", "event_id"),
    "user_id": key_stride("events", "user_id"),
    "doc_id": key_stride("documents", "doc_id"),
    "vec_id": key_stride("embeddings", "vec_id"),
}


def replicate(name, shifts, mutate=None):
    """shifts: column name -> key-domain name in STRIDE."""
    src = pq.read_table(f"{SRC}/{name}.parquet")
    chunks = []
    for i in range(COPIES):
        cols = {}
        for field in src.schema:
            a = src.column(field.name)
            if field.name in shifts and i > 0:
                a = pc.add(a, pa.scalar(i * STRIDE[shifts[field.name]],
                                        type=field.type))
            cols[field.name] = a
        if mutate:
            mutate(i, cols)
        chunks.append(pa.table(cols, schema=src.schema))
    out = pa.concat_tables(chunks)
    pq.write_table(out, f"{OUT}/{name}.parquet")
    print(f"{name}: {src.num_rows} -> {out.num_rows}")


def mutate_documents(i, cols):
    # distinct doc text per copy (one extra trailing token) so the corpus
    # scales as NEAR-duplicates, not exact clones — the realistic shape
    # for dedup benchmarks; the doc_id token makes each text unique.
    if i == 0:
        return
    # join separator ' tk' contributes 3 chars: appended text is
    # text + ' tk' + tag, i.e. len(tag) + 3 extra characters
    tag = pc.cast(cols["doc_id"], pa.string())
    cols["text"] = pc.binary_join_element_wise(cols["text"], tag, " tk")
    cols["n_chars"] = pc.add(cols["n_chars"],
                             pc.add(pc.utf8_length(tag), pa.scalar(3, type=pa.int64())))


# dimension tables: nation/region stay as-is (real TPC-H keeps 25/5 rows
# at every SF); everything keyed scales 10x with consistent FK shifts.
for name in ("nation", "region"):
    pq.write_table(pq.read_table(f"{SRC}/{name}.parquet"), f"{OUT}/{name}.parquet")
    print(f"{name}: copied")

replicate("customer", {"c_custkey": "c_custkey"})
replicate("supplier", {"s_suppkey": "s_suppkey"})
replicate("part", {"p_partkey": "p_partkey"})
replicate("orders", {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"})
replicate("lineitem", {"l_orderkey": "o_orderkey", "l_partkey": "p_partkey",
                       "l_suppkey": "s_suppkey"})
replicate("events", {"event_id": "event_id", "user_id": "user_id"})
replicate("documents", {"doc_id": "doc_id"}, mutate=mutate_documents)
replicate("embeddings", {"vec_id": "vec_id"})
print(f"done -> {OUT}")
