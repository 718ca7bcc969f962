#!/usr/bin/env python3
"""Replays the driver's correctness gate locally: for a graft.Verify /
graft.tools.RunOne output directory, run every oracle SQL in DuckDB
against the testdata parquet tables and compare row counts, schemas, and
values (rows and columns sorted by name) with the Spark-written results.

Usage: python3 tools/oracle_check.py <verifyOutDir> <sfDir> [name ...]
"""
import duckdb
import json
import os
import sys

if len(sys.argv) < 3:
    print(__doc__.strip())
    sys.exit(2)
out, sf = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf}/{t}.parquet"
    if os.path.isdir(p):
        # Spark-written table (ScaleUp output): a directory of part files
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
    elif os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
oracles = json.load(open(f"{out}/oracle_sql.json"))
names = sorted(only or oracles.keys())
bad = []
for name in names:
    if name not in oracles:
        bad.append((name, "unknown query (not in oracle_sql.json)"))
        continue
    res_dir = f"{out}/{name}"
    if not os.path.isdir(res_dir):
        bad.append((name, "missing result dir"))
        continue
    try:
        spark = con.execute(
            f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").df()
        ora = con.execute(oracles[name]).df()
    except Exception as e:  # noqa: BLE001 - report and keep going
        bad.append((name, f"error: {e}"))
        continue
    sc, oc = sorted(spark.columns), sorted(ora.columns)
    if sc != oc:
        bad.append((name, f"schema {sc} vs {oc}"))
        continue
    s = spark[sc].sort_values(sc).reset_index(drop=True)
    o = ora[oc].sort_values(oc).reset_index(drop=True)
    if s.shape != o.shape:
        bad.append((name, f"rows {s.shape[0]} vs {o.shape[0]}"))
        continue
    diff_cols = [c for c in sc
                 if not (s[c].astype(str).values == o[c].astype(str).values).all()]
    if diff_cols:
        bad.append((name, f"values differ in {diff_cols}"))
    else:
        print(f"PASS {name} ({s.shape[0]} rows)")
for name, why in bad:
    print(f"FAIL {name}: {why}")
print(f"TOTAL {len(names)} pass {len(names) - len(bad)} fail {len(bad)}")
sys.exit(1 if bad else 0)
