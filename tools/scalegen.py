#!/usr/bin/env python3
"""Derive a larger scale factor from the driver-generated sf0.1 tables.

Usage: python3 tools/scalegen.py [outDir] [copies]

Produces <outDir> (default /root/repo/testdata-sf1) with the same
schema as /root/testdata/sf0.1, scaled <copies>x (default 10) by
key-shifted replication with referential integrity preserved:

- region/nation: fixed dimensions, copied unchanged (TPC-H keeps them
  constant across scale factors).
- customer/supplier/part/orders/lineitem/events: each copy c shifts
  every key column by c * (domain size), so joins fan out linearly
  and per-user/per-order structure is preserved per copy.
- documents: copy 0 is byte-identical; copies 1..9 suffix every
  whitespace token with a copy tag (so cross-copy near-duplicate
  density stays ZERO and the per-copy planted-dup density matches the
  source — plain replication would make every doc a 10-way exact dup
  and inflate pair-output queries quadratically, which no real corpus
  does). n_chars is recomputed to keep n_chars == length(text).
- embeddings: copies 1..9 add deterministic per-component noise at
  0.8 * |v|/sqrt(dim) (cross-copy cosine ~0.87, below every near-dup
  threshold in the repo) so vector-pair queries see constant dup
  density too.

Driver-side tooling only (pyarrow), like tools/check.py. The output
is NOT committed (see .gitignore); regenerate with this script.
"""
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata-sf1"
COPIES = int(sys.argv[2]) if len(sys.argv) > 2 else 10

# key domain sizes at sf0.1 (0-based contiguous, verified)
DOM = dict(cust=15000, supp=1000, part=20000, order=150000,
           event=100000, user=1500, doc=5000, vec=2000)

# (table, {column: domain}) — every key column shifted by c * domain
SHIFTS = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part", "l_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}


def splitmix(x):
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = x
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return (z ^ (z >> 31)) / 2**63 - 1.0  # [-1, 1)


def shifted_copy(tbl, shifts, c):
    cols = {}
    for name in tbl.column_names:
        col = tbl.column(name)
        if name in shifts:
            cols[name] = pc.add(col, c * DOM[shifts[name]])
        else:
            cols[name] = col
    return pa.table(cols, schema=tbl.schema)


def copy_tag(c):
    """Copy 1..9 keep the original single-char 'r'..'z' tags (so a
    10-copy run reproduces testdata-sf1 byte-identically); copies >= 10
    get a two-char lowercase tag ('aa', 'ab', ...) for sf10+."""
    if c <= 9:
        return chr(ord("q") + c)
    k = c - 10
    return chr(ord("a") + k // 26) + chr(ord("a") + k % 26)


def perturb_documents(tbl, c):
    tag = copy_tag(c)
    texts = tbl.column("text").to_pylist()
    new_texts = [" ".join(t + tag for t in s.split()) for s in texts]
    cols = {}
    for name in tbl.column_names:
        if name == "text":
            cols[name] = pa.array(new_texts, type=pa.string())
        elif name == "n_chars":
            cols[name] = pa.array([len(s) for s in new_texts], type=pa.int64())
        elif name == "doc_id":
            cols[name] = pc.add(tbl.column(name), c * DOM["doc"])
        else:
            cols[name] = tbl.column(name)
    return pa.table(cols, schema=tbl.schema)


def perturb_embeddings(tbl, c):
    vecs = tbl.column("embedding").to_pylist()
    ids = tbl.column("vec_id").to_pylist()
    out = []
    for vid, v in zip(ids, vecs):
        norm = sum(x * x for x in v) ** 0.5
        amp = 0.8 * norm / (len(v) ** 0.5)
        out.append([x + amp * splitmix(c * 1_000_003 + vid * 131 + i)
                    for i, x in enumerate(v)])
    cols = {}
    for name in tbl.column_names:
        if name == "embedding":
            cols[name] = pa.array(out, type=tbl.schema.field("embedding").type)
        elif name == "vec_id":
            cols[name] = pc.add(tbl.column(name), c * DOM["vec"])
        else:
            cols[name] = tbl.column(name)
    return pa.table(cols, schema=tbl.schema)


def main():
    os.makedirs(DST, exist_ok=True)
    for t in ["region", "nation"]:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
        print(f"{t}: copied unchanged")
    for t, shifts in SHIFTS.items():
        src = pq.read_table(f"{SRC}/{t}.parquet")
        # a regenerated/bigger sf0.1 with stale DOM sizes would make
        # copy c's keys collide with copy c+1's — corrupt data with no
        # diagnostic. Fail loudly instead.
        for col, dom in shifts.items():
            mx = pc.max(src.column(col)).as_py()
            assert mx is None or mx < DOM[dom], (
                f"{t}.{col} max {mx} exceeds domain {dom}={DOM[dom]}; "
                f"update DOM to match the source tables")
        parts = []
        for c in range(COPIES):
            if t == "documents" and c > 0:
                parts.append(perturb_documents(src, c))
            elif t == "embeddings" and c > 0:
                parts.append(perturb_embeddings(src, c))
            else:
                parts.append(shifted_copy(src, shifts, c))
        big = pa.concat_tables(parts)
        pq.write_table(big, f"{DST}/{t}.parquet")
        print(f"{t}: {src.num_rows} -> {big.num_rows} rows")


if __name__ == "__main__":
    main()
