#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [skip1,skip2,...]

For each query result `<outDir>/<name>/` (parquet written by graft.Verify),
runs the matching SQL from `<outDir>/oracle_sql.json` in DuckDB against the
same parquet tables, then compares: row count, column names (sorted), and a
hash of the value matrix with columns sorted by name and rows sorted by all
columns.

Driver-faithful since r8: both sides go through pandas (like the driver's
compare), rows are sorted with `DataFrame.sort_values` (so array cells
crash here exactly as they crash there — r7 v15), and a column whose dtype
*kind* differs between the two sides (int64 vs float64 — DuckDB HUGEINT
sums decay to float64 in pandas; r7 j9/st3) FAILS even when the `%.9g`
value canonicalization would mask it.
"""
import sys, os, json, glob, hashlib

import duckdb
import pandas as pd


TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(val):
    if val is None or val != val:  # None or NaN
        return "NULL" if val is None else "NaN"
    if isinstance(val, float):
        return f"{val:.9g}"
    if isinstance(val, bytes):
        return val.hex()
    if isinstance(val, list):
        return "[" + ",".join(canon(v) for v in val) + "]"
    return str(val)


def frame_hash(df):
    """Sort columns by name, sort rows via pandas (driver-style — raises
    on unsortable cells), then hash the canonicalized value matrix."""
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(list(df.columns))
    h = hashlib.sha256()
    for r in df.itertuples(index=False):
        h.update("\x1f".join(canon(v) for v in r).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def kind(dtype):
    k = dtype.kind
    return "i" if k in "iu" else k


def main(sf_dir, out_dir, skip=()):
    con = duckdb.connect()
    # Large-replica twins (v10/v4c at 30x+) spill gigabytes; default spill
    # lands in ./.tmp on whatever partition the repo sits on and the
    # default memory cap fights any still-running JVM. Both opt-in via env
    # so the sf0.01 driver-faithful path stays byte-identical.
    tmp = os.environ.get("GRAFT_DUCKDB_TMP")
    if tmp:
        os.makedirs(tmp, exist_ok=True)
        con.execute(f"SET temp_directory='{tmp}'")
    mem = os.environ.get("GRAFT_DUCKDB_MEM")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
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
            got = con.execute(f"SELECT * FROM read_parquet({files!r})").df()
            want = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if sorted(got.columns) != sorted(want.columns):
            print(f"FAIL {name}: cols {sorted(got.columns)} != "
                  f"{sorted(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        dk = [(c, kind(got[c].dtype), kind(want[c].dtype))
              for c in sorted(got.columns)
              if kind(got[c].dtype) != kind(want[c].dtype)]
        if dk:
            print(f"FAIL {name}: dtype kind mismatch {dk} "
                  "(driver hashes these differently, e.g. 3 vs 3.0)")
            n_fail += 1
            continue
        try:
            gh, wh = frame_hash(got), frame_hash(want)
        except Exception as e:
            print(f"FAIL {name}: sort/hash crash ({e})")
            n_fail += 1
            continue
        if gh != wh:
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
