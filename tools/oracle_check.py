#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [skip1,skip2,...]

For each query result `<outDir>/<name>/` (parquet written by graft.Verify),
runs the matching SQL from `<outDir>/oracle_sql.json` in DuckDB against the
same parquet tables, then compares: row count, column names (sorted), and a
hash of the value matrix with columns sorted by name and rows sorted by all
columns. Mirrors the driver's compare semantics (sort cols by name → hash).
"""
import sys, os, json, glob, hashlib

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(val):
    if val is None:
        return "NULL"
    if isinstance(val, float):
        if val != val:
            return "NaN"
        return f"{val:.9g}"
    if isinstance(val, bytes):
        return val.hex()
    if isinstance(val, list):
        return "[" + ",".join(canon(v) for v in val) + "]"
    return str(val)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    mat = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for r in mat:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def main(sf_dir, out_dir, skip=()):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if name in skip:
            print(f"SKIP {name}")
            continue
        d = f"{out_dir}/{name}"
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"FAIL {name}: no result parquet")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchall()
            gcols = [c[0] for c in con.description]
            want = con.execute(oracle[name]).fetchall()
            wcols = [c[0] for c in con.description]
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if sorted(gcols) != sorted(wcols):
            print(f"FAIL {name}: cols {sorted(gcols)} != {sorted(wcols)}")
            n_fail += 1
        elif len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
        elif table_hash(gcols, got) != table_hash(wcols, want):
            print(f"FAIL {name}: hash mismatch ({len(got)} rows)")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  set(sys.argv[3].split(",")) if len(sys.argv) > 3 else ()))
