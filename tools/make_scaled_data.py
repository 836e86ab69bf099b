#!/usr/bin/env python3
"""Build a 10x replication of an SF directory for SCALING benchmarks only
(never correctness: the driver's real generator owns those inputs).

Each copy i offsets every key column past the source's max so key
cardinality scales with the data (10x rows => 10x distinct orders,
customers, docs, users...). Document texts get a per-copy suffix so the
dedup operators see a realistic near-duplicate corpus (10-member clusters)
instead of a degenerate exact-duplicate one; embeddings stay identical
across copies (10-member cosine-duplicate cells for the ANN operators).

Usage: python3 tools/make_scaled_data.py [src_sf_dir] [out_dir] [factor]
"""
import os
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1r"
factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(out, exist_ok=True)
con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count()}")

# The embedding decorrelation below is a dim-rotation by copy index; for
# i >= dims the raw slice degenerates to the identity and cross-copy exact
# cosine duplicates reappear (the output-quadratic benchmark failure mode
# the rotation exists to avoid). Rotate by i % dims and flip the sign of
# the whole vector on each wrap (both are orthogonal transforms: norms and
# intra-copy cosines are exactly preserved), which keeps copies pairwise
# decorrelated up to factor = 2*dims. Beyond that, fail loudly.
dims = con.execute(
    f"SELECT len(embedding) FROM read_parquet('{src}/embeddings.parquet') LIMIT 1"
).fetchone()[0]
if factor > 2 * dims:
    sys.exit(f"factor {factor} > 2*dims ({2 * dims}): copies would alias "
             "and reintroduce exact cross-copy cosine duplicates")

# table -> select list with key offsets as functions of copy index i
SCALED = {
    # ts passes through as TIMESTAMP_NS: DuckDB writes it back as the
    # parquet TIMESTAMP(NANOS) logical type the harness uses, so the
    # engine's loader still sees epoch-nano longs (nanosAsLong) AND the
    # DuckDB oracles still bind hour()/date_trunc() on replicas. (The old
    # epoch_ns() form wrote plain BIGINT — same values for Spark, but the
    # 30x oracle run failed to bind time functions on it.)
    "events": "event_id + i*100000 AS event_id, ts::TIMESTAMP_NS AS ts,"
              " user_id + i*1500 AS user_id, event_type, value, props",
    "lineitem": "l_orderkey + i*150000 AS l_orderkey, l_partkey + i*20000 AS l_partkey,"
                " l_suppkey + i*1000 AS l_suppkey, l_linenumber, l_quantity,"
                " l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,"
                " l_shipdate",
    "orders": "o_orderkey + i*150000 AS o_orderkey, o_custkey + i*15000 AS o_custkey,"
              " o_orderstatus, o_totalprice, o_orderdate, o_orderpriority",
    "customer": "c_custkey + i*15000 AS c_custkey, c_name, c_nationkey,"
                " c_acctbal, c_mktsegment",
    "part": "p_partkey + i*20000 AS p_partkey, p_name, p_brand, p_type,"
            " p_size, p_retailprice",
    "supplier": "s_suppkey + i*1000 AS s_suppkey, s_name, s_nationkey, s_acctbal",
    # Near-dup CLUSTER SIZE must stay constant (10) as the factor grows, or
    # pair-emitting dedup benchmarks go output-quadratic in the factor: the
    # old "base text + ' copy<i>'" form left every copy >0.2-Jaccard-similar
    # to EVERY other copy (one cluster of size=factor, C(factor,2) pairs per
    # base doc — 435 at 30x vs a real corpus's bounded clusters). Fix: tag
    # alternating tokens with a copy-DECADE marker, so every shingle
    # contains a marker and shingle sets are disjoint across decades (zero
    # cross-decade Jaccard), while the 10 copies inside a decade differ only
    # by the ' copy<i>' suffix (still genuine near-dups). Cluster size = 10
    # at ANY factor; cluster COUNT scales with the data, like a real corpus.
    # Every-2nd (not every-4th) tagging is load-bearing for SIMHASH: 25%
    # token churn across decades left cross-decade fingerprints within
    # Hamming 3 of each other (the r10 300x point measured width-30 d9b
    # clusters, 10x the true-pair mass), so the width bound held for the
    # Jaccard operators but not the Hamming ones; 50% churn separates both.
    "documents": "doc_id + i*5000 AS doc_id,"
                 " array_to_string(list_transform("
                 "   list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0),"
                 "   (x, j) -> CASE WHEN j % 2 = 1"
                 "             THEN 'g' || (i // 10)::VARCHAR || 'q' || x ELSE x END),"
                 "   ' ') || CASE WHEN i = 0 THEN '' ELSE ' copy' || i END AS text,"
                 " lang, source, n_chars",
    # rotate dims by copy index: norms and intra-copy cosines are exactly
    # preserved (it's a permutation), while cross-copy vectors decorrelate —
    # verbatim copies would give every vector 9 exact cosine-duplicates and
    # make every near-dup benchmark output-quadratic (see BENCH_SCALING.md)
    "embeddings": "vec_id + i*2000 AS vec_id,"
                  " list_transform(embedding[(i % {d}) + 1:] || embedding[:(i % {d})],"
                  "   x -> x * (CASE WHEN (i // {d}) % 2 = 1 THEN -1 ELSE 1 END))"
                  " AS embedding, label",
}
SCALED["embeddings"] = SCALED["embeddings"].format(d=dims)
COPIED = ["region", "nation"]  # fixed-size dims

for t, sel in SCALED.items():
    con.execute(
        f"COPY (SELECT {sel}"
        f"      FROM read_parquet('{src}/{t}.parquet'), range({factor}) r(i))"
        f" TO '{out}/{t}.parquet' (FORMAT parquet)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
    print(f"{t}: {n} rows")
for t in COPIED:
    con.execute(f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet'))"
                f" TO '{out}/{t}.parquet' (FORMAT parquet)")
print(f"wrote {factor}x of {src} to {out}")
