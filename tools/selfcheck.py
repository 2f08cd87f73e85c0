#!/usr/bin/env python3
"""Self-check: replicate the driver's correctness gate locally.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query dir in <outDir>, run the matching oracle SQL in DuckDB
(tables = parquet files in <sfDir>), then compare row count, schema and
exact values with columns sorted by name.
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(t).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{t}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
for qdir in sorted(glob.glob(f"{out_dir}/q*")):
    qname = os.path.basename(qdir)
    try:
        spark_df = pq.read_table(glob.glob(f"{qdir}/*.parquet")[0]).to_pandas()
    except Exception as e:
        results[qname] = f"SPARK-READ-FAIL {e}"
        continue
    if qname not in oracle:
        results[qname] = f"rows-only ({len(spark_df)} rows)" if len(spark_df) else "ROWS-ONLY-EMPTY!"
        continue
    try:
        duck_df = con.sql(oracle[qname]).df()
    except Exception as e:
        results[qname] = f"DUCKDB-FAIL {str(e)[:200]}"
        continue
    a = spark_df.reindex(sorted(spark_df.columns), axis=1)
    b = duck_df.reindex(sorted(duck_df.columns), axis=1)
    if list(a.columns) != list(b.columns):
        results[qname] = f"SCHEMA-NAMES spark={list(a.columns)} duck={list(b.columns)}"
        continue
    if len(a) != len(b):
        results[qname] = f"ROWCOUNT spark={len(a)} duck={len(b)}"
        continue
    # sort rows for order-insensitive compare, then exact value match
    a2 = a.sort_values(by=list(a.columns), ignore_index=True)
    b2 = b.sort_values(by=list(b.columns), ignore_index=True)
    mismatch = None
    for c in a.columns:
        av, bv = a2[c], b2[c]
        try:
            if str(av.dtype).startswith("datetime") or str(bv.dtype).startswith("datetime"):
                av = pd.to_datetime(av).astype("datetime64[us]")
                bv = pd.to_datetime(bv).astype("datetime64[us]")
            eq = (av.isna() & bv.isna()) | (av == bv)
            if not eq.all():
                i = int((~eq).idxmax())
                mismatch = f"VALUE col={c} row={i} spark={a2[c][i]!r} duck={b2[c][i]!r}"
                break
        except Exception as e:
            mismatch = f"COMPARE-ERR col={c}: {e}"
            break
    dt_a = {c: str(spark_df[c].dtype) for c in spark_df.columns}
    dt_b = {c: str(duck_df[c].dtype) for c in duck_df.columns}
    type_diff = {c: (dt_a[c], dt_b[c]) for c in dt_a if dt_a[c] != dt_b.get(c)}
    if mismatch:
        results[qname] = mismatch
    elif type_diff:
        results[qname] = f"ok-values TYPE-DIFF {type_diff}"
    else:
        results[qname] = f"OK ({len(a)} rows)"

ok = sum(1 for v in results.values() if v.startswith("OK") or v.startswith("rows-only"))
for k, v in sorted(results.items()):
    print(f"{k:28s} {v}")
print(f"\n{ok}/{len(results)} pass")
