#!/usr/bin/env python3
"""Oracle check for queries whose OUTPUT is too large for check.py's
Python-side row hashing (sort + md5 of every row tuple — fine at tens
of thousands of rows, hopeless at tens of millions).

Usage: python3 tools/check_bigout.py <sfDir> <verifyOutDir> query[,query...]

Same contract as tools/check.py (rows / schema / value equality after
sorting columns by name), but the value check is an ORDER-INDEPENDENT
checksum computed INSIDE DuckDB: sum(hash(row-string)) over rows,
with doubles rounded to 9 digits and NULLs normalized, mirroring
check.py's norm(). Addition is commutative, so no sort is needed, and
nothing row-sized ever crosses into Python.
"""
import json
import os
import sys

import duckdb


def row_expr(con, rel_sql):
    cols = [(r[0], r[1]) for r in con.sql(f"DESCRIBE {rel_sql}").fetchall()]
    parts = []
    for name, typ in sorted(cols):
        q = f'"{name}"'
        t = typ.upper()
        if t in ("DOUBLE", "FLOAT", "REAL"):
            # repr(round(v, 9)) in check.py ~ shortest float repr; use
            # a fixed normalization both sides share (same engine here,
            # so any deterministic form works)
            v = f"CAST(round({q}, 9) AS VARCHAR)"
        elif t in ("BOOLEAN",):
            v = f"CAST(CAST({q} AS INT) AS VARCHAR)"
        else:
            v = f"CAST({q} AS VARCHAR)"
        parts.append(f"coalesce({v}, 'NULL')")
    return sorted(c for c, _ in cols), " || '\\x1f' || ".join(parts)


def summary(con, rel_sql):
    cols, expr = row_expr(con, rel_sql)
    n, h = con.sql(
        f"SELECT count(*), coalesce(sum(hash({expr})), 0) FROM {rel_sql}"
    ).fetchone()
    return n, cols, int(h)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3].split(",")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

    con = duckdb.connect()
    # Bound the oracle's own resources: a big-SF oracle join that
    # spills must not fill the root disk (the sf10 pagerank oracle
    # spilled >70 GB of join temp before dying — that oracle stays an
    # sf<=1 check; see SCALING.md). Env-tunable (r16): the defaults
    # assume ~100 GB free; on a fuller disk set CHECK_TEMP_MAX below
    # the actual headroom or the oracle's spill evicts everything else.
    con.sql(f"SET memory_limit='{os.environ.get('CHECK_MEM_LIMIT', '48GB')}'")
    con.sql("SET temp_directory='/tmp/duckdb_spill'")
    con.sql(f"SET max_temp_directory_size="
            f"'{os.environ.get('CHECK_TEMP_MAX', '60GB')}'")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = 0
    for name in names:
        if name not in oracle:
            print(f"{name}: no oracle (rows-only)")
            continue
        sr, sc, sh = summary(
            con, f"(SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet'))")
        orr, oc, oh = summary(con, f"({oracle[name]})")
        ok = (sr == orr) and (sc == oc) and (sh == oh)
        print(f"{name}: rows {sr}/{orr} schema_match={sc == oc} "
              f"hash_match={sh == oh} (commutative-checksum)"
              + ("" if ok else "  <-- MISMATCH"))
        if not ok:
            failures += 1
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
