#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each <outDir>/<name> parquet dir, runs <outDir>/oracle_sql.json[name]
in DuckDB over the same sf parquet tables, sorts columns by name,
normalizes, and hash-compares. Dev tool only — NOT part of the library.
"""
import sys, json, glob, os, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"{v:.6f}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        try:
            o = con.execute(sql)
            o_cols = [d[0] for d in o.description]
            o_rows = o.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        s = con.execute(f"SELECT * FROM '{spark_dir}/*.parquet'")
        s_cols = [d[0] for d in s.description]
        s_rows = s.fetchall()
        if sorted(o_cols) != sorted(s_cols):
            print(f"FAIL {name}: cols spark={sorted(s_cols)} oracle={sorted(o_cols)}")
            n_bad += 1
            continue
        if len(o_rows) != len(s_rows):
            print(f"FAIL {name}: rows spark={len(s_rows)} oracle={len(o_rows)}")
            n_bad += 1
            continue
        hs, ho = table_hash(s_cols, s_rows), table_hash(o_cols, o_rows)
        if hs != ho:
            print(f"FAIL {name}: hash mismatch ({len(s_rows)} rows)")
            # show first differing row for debugging
            order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
            order_o = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
            ls = sorted("\x01".join(norm_cell(r[i]) for i in order_s) for r in s_rows)
            lo = sorted("\x01".join(norm_cell(r[i]) for i in order_o) for r in o_rows)
            for a, b in zip(ls, lo):
                if a != b:
                    print(f"  spark : {a[:300]}")
                    print(f"  oracle: {b[:300]}")
                    break
            n_bad += 1
        else:
            print(f"ok   {name} ({len(s_rows)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    sys.exit(main(sf, out))
