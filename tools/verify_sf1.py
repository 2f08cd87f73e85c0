#!/usr/bin/env python3
"""sf1.0 hash gate (round-11 VERDICT task 1): rows+schema+hash-verify a
query subset ABOVE the driver's sf0.01 gate scale.

Everything in the suite is oracle-verified at sf0.01 and only TIMED at
sf0.1/sf1.0; growth-law bugs that change answers (overflow past int
ranges, fixed-codebook cell saturation, sampling-threshold assumptions)
are invisible to a timing audit — the r10 audit already caught one
answer-changing scaler artifact (doc-id stride colliding with synthetic
near-dup twins). This harness closes that gap:

  python3 tools/make_sf1.py 10 /tmp/sf1.0
  SPARK_GRAFT_CPUS=32 sbt -batch \
    "runMain graft.Verify /tmp/sf1.0 /tmp/v_sf1 <query names...>"
  python3 tools/verify_sf1.py /tmp/sf1.0 /tmp/v_sf1 SF1_CORRECTNESS_r11.json

Emits a CORRECTNESS_r{N}-style JSON: per query
{rows_match, schema_match, hash_match, spark_rows, oracle_rows, err}.
The value compare mirrors the driver/selfcheck discipline: columns
sorted by name, rows sorted by all columns, exact equality (NaN==NaN,
NULL==NULL) — "hash_match" is exact-value equality, the same predicate
the driver's hash implements.
"""
import json
import sys
import glob
import os
import math

import duckdb
import pyarrow.parquet as pq
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
json_out = sys.argv[3] if len(sys.argv) > 3 else None

con = duckdb.connect()
for t in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(t).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{t}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
for qdir in sorted(glob.glob(f"{out_dir}/q*")):
    qname = os.path.basename(qdir)
    rec = {"rows_match": False, "schema_match": False, "hash_match": False,
           "spark_rows": None, "oracle_rows": None, "err": None}
    results[qname] = rec
    try:
        spark_df = pq.read_table(glob.glob(f"{qdir}/*.parquet")[0]).to_pandas()
    except Exception as e:
        rec["err"] = f"spark-read: {e}"
        continue
    rec["spark_rows"] = len(spark_df)
    if qname not in oracle:
        # rows-only contract (non-SQL-expressible op): weaker gate,
        # recorded as such rather than silently green
        rec["err"] = "rows-only (no oracle sql)"
        rec["rows_match"] = len(spark_df) > 0
        continue
    try:
        duck_df = con.sql(oracle[qname]).df()
    except Exception as e:
        rec["err"] = f"duckdb: {str(e)[:300]}"
        continue
    rec["oracle_rows"] = len(duck_df)
    a = spark_df.reindex(sorted(spark_df.columns), axis=1)
    b = duck_df.reindex(sorted(duck_df.columns), axis=1)
    rec["schema_match"] = list(a.columns) == list(b.columns)
    rec["rows_match"] = len(a) == len(b)
    if not (rec["schema_match"] and rec["rows_match"]):
        continue
    a2 = a.sort_values(by=list(a.columns), ignore_index=True)
    b2 = b.sort_values(by=list(b.columns), ignore_index=True)
    mismatch = None
    for c in a.columns:
        av, bv = a2[c], b2[c]
        try:
            if (str(av.dtype).startswith("datetime")
                    or str(bv.dtype).startswith("datetime")):
                av = pd.to_datetime(av).astype("datetime64[us]")
                bv = pd.to_datetime(bv).astype("datetime64[us]")
            eq = (av.isna() & bv.isna()) | (av == bv)
            if not eq.all():
                i = int((~eq).idxmax())
                mismatch = (f"col={c} row={i} "
                            f"spark={a2[c][i]!r} oracle={b2[c][i]!r}")
                break
        except Exception as e:
            mismatch = f"compare col={c}: {e}"
            break
    if mismatch:
        rec["err"] = f"value: {mismatch}"
    else:
        rec["hash_match"] = True

n_green = sum(1 for v in results.values()
              if v["rows_match"] and v["schema_match"] and v["hash_match"])
for k, v in sorted(results.items()):
    state = "OK" if (v["rows_match"] and v["schema_match"]
                     and v["hash_match"]) else f"FAIL {v['err']}"
    print(f"{k:32s} {state} ({v['spark_rows']} rows)")
print(f"\n{n_green}/{len(results)} green")

if json_out:
    payload = {"sf_dir": sf_dir, "n_queries": len(results),
               "n_green": n_green, "queries": results}
    with open(json_out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {json_out}")
sys.exit(0 if n_green == len(results) else 1)
