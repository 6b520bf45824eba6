#!/usr/bin/env python3
"""Derive a larger scale factor from the driver-generated sf0.1 tables.

Usage: python3 tools/scalegen.py [outDir] [copies]
  sf1 = 10 copies, sf10 = 100, sf100 = 1000 (~15 GB; copies stream
  through a ParquetWriter so memory stays at one ~2M-row chunk).

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
    10-copy run reproduces testdata-sf1 contents exactly); copies >= 10
    get a FIXED-width tag of three base-26 chars plus a terminal 'q'.

    The combined tag set is SUFFIX-FREE: all multi-char tags share one
    width (so none is a proper suffix of another) and end in 'q' (which
    no single-char tag is), so no token+tag concatenation can equal a
    different token's — the variable-width scheme this replaces allowed
    cross-width collisions like token+'r' == (token+'a')+... whenever
    the source vocabulary contained trailing-letter extension pairs
    (r15 advice; measured exposure on the actual sf0.1 vocabulary: 0
    such pairs, so previously generated dirs are collision-free and
    stay valid). Capacity: 26^3 multi tags -> copies 10..17585."""
    if c <= 9:
        return chr(ord("q") + c)
    k = c - 10
    assert k < 26 ** 3, f"copy {c} exceeds tag capacity (max 17585 copies)"
    tag = ""
    for _ in range(3):
        tag = chr(ord("a") + k % 26) + tag
        k //= 26
    return tag + "q"


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


def splitmix_np(xs):
    """Vectorized splitmix for large copy counts; bit-for-bit identical
    to splitmix() (uint64 wrap-around == the & masks; the final float64
    division is the same operation)."""
    import numpy as np
    with np.errstate(over="ignore"):
        z = xs.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z.astype(np.float64) / 2.0**63 - 1.0


def perturb_embeddings(tbl, c):
    import numpy as np
    dim = len(tbl.column("embedding")[0])
    vecs = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    ids = np.array(tbl.column("vec_id").to_pylist(), dtype=np.int64)
    norms = np.sqrt((vecs * vecs).sum(axis=1))
    amp = 0.8 * norms / (dim ** 0.5)
    idx = (c * 1_000_003 + ids[:, None] * 131
           + np.arange(dim)[None, :]).astype(np.uint64)
    out_np = vecs + amp[:, None] * splitmix_np(idx)
    out = [[float(x) for x in row] for row in out_np]
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
        # Stream copies through a ParquetWriter, flushing ~2M-row
        # chunks: sf100 (1000 copies, 600M lineitem rows) must never
        # hold the whole table in memory the way concat_tables did.
        writer = pq.ParquetWriter(f"{DST}/{t}.parquet", src.schema)
        parts, buffered, total = [], 0, 0
        for c in range(COPIES):
            if t == "documents" and c > 0:
                part = perturb_documents(src, c)
            elif t == "embeddings" and c > 0:
                part = perturb_embeddings(src, c)
            else:
                part = shifted_copy(src, shifts, c)
            parts.append(part)
            buffered += part.num_rows
            if buffered >= 2_000_000 or c == COPIES - 1:
                writer.write_table(pa.concat_tables(parts))
                total += buffered
                parts, buffered = [], 0
        writer.close()
        print(f"{t}: {src.num_rows} -> {total} rows")


if __name__ == "__main__":
    main()
