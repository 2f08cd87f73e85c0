#!/usr/bin/env python3
"""Build a ~sf1.0 dataset at /tmp/sf1.0 by replicating sf0.1 x10 with
key offsets that preserve FK joins (round-10 growth-law audit: VERDICT
task 6 — run the top steady queries once at 10x and record the ratio).

Offsets keep copy 0 byte-identical to sf0.1 so fixed-id fixtures
(centroids vec_id<8, probe queries, bounded event slices) still exist.
Dims (region, nation) are shared, so replicated customers keep valid
nation keys. Usage: python3 tools/make_sf1.py [reps] [outdir]
"""
import sys, os, duckdb

reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1.0"
src = "/root/testdata/sf0.1"
os.makedirs(out, exist_ok=True)
con = duckdb.connect()

# table -> {column: offset_per_copy}; unlisted columns pass through
OFFSETS = {
    "region": {},
    "nation": {},
    "customer": {"c_custkey": 10**7},
    "supplier": {"s_suppkey": 10**5},
    "part": {"p_partkey": 10**6},
    "orders": {"o_orderkey": 10**9, "o_custkey": 10**7},
    "lineitem": {"l_orderkey": 10**9, "l_partkey": 10**6,
                 "l_suppkey": 10**5},
    # documents/embeddings use 1e8 strides: several dedup queries
    # synthesize near-dup twins at doc_id + 1e6, so a 1e6 replication
    # stride would collide synthetic ids with the next copy's real ids
    # and fuse clusters across copies (measured: q311 56x instead of
    # ~1x at 10x data — an audit artifact, not an engine pathology)
    "events": {"event_id": 10**9, "user_id": 10**7},
    "documents": {"doc_id": 10**8},
    "embeddings": {"vec_id": 10**8},
}

for t, offs in OFFSETS.items():
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()]
    n = 1 if not offs else reps
    parts = []
    for i in range(n):
        sel = ", ".join(
            f"{c} + {i * offs[c]} AS {c}" if c in offs and i > 0 else c
            for c in cols)
        parts.append(f"SELECT {sel} FROM '{src}/{t}.parquet'")
    q = " UNION ALL ".join(parts)
    con.execute(f"COPY ({q}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    cnt = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {cnt} rows")
print(f"done -> {out}")
