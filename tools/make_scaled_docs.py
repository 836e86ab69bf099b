#!/usr/bin/env python3
"""Documents-ONLY replica at arbitrary factor — the text-corpus scale
probe (make_scaled_data.py replicates every table but its factor is
capped at 2*dims by the embedding decorrelation; the text/dedup/URL
operators have no such cap and deserve a far larger point).

Same replication semantics as make_scaled_data.py's documents rule:
copy-decade token tagging keeps near-dup cluster SIZE constant (10) at
any factor while cluster COUNT scales with the data; the id offset is
max(doc_id)+1 so copies never collide with base ids.

Usage: python3 tools/make_scaled_docs.py [src_sf_dir] [out_dir] [factor]
"""
import os
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfdocs1k"
factor = int(sys.argv[3]) if len(sys.argv) > 3 else 1000

os.makedirs(out, exist_ok=True)
con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count()}")

off = con.execute(
    f"SELECT max(doc_id) + 1 FROM read_parquet('{src}/documents.parquet')"
).fetchone()[0]

sel = (
    f"doc_id + i*{off} AS doc_id,"
    " array_to_string(list_transform("
    "   list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0),"
    "   (x, j) -> CASE WHEN j % 2 = 1"
    "             THEN 'g' || (i // 10)::VARCHAR || 'q' || x ELSE x END),"
    "   ' ') || CASE WHEN i = 0 THEN '' ELSE ' copy' || i END AS text,"
    " lang, source, n_chars"
)
con.execute(
    f"COPY (SELECT {sel} FROM read_parquet('{src}/documents.parquet'),"
    f" (SELECT unnest(range({factor})) AS i) ORDER BY doc_id)"
    f" TO '{out}/documents.parquet' (FORMAT PARQUET)"
)
n = con.execute(
    f"SELECT count(*) FROM read_parquet('{out}/documents.parquet')"
).fetchone()[0]
print(f"{out}/documents.parquet: {n} docs (factor {factor} of {src})")
