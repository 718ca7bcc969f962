#!/usr/bin/env python3
"""Type-preserving N-fold replication of the events table.

The driver's events.parquet stores ts as TIMESTAMP(NANOS). Spark has no
nanos timestamp type (it reads the column as long via
spark.sql.legacy.parquet.nanosAsLong), so the Scala ScaleUp tool cannot
write the column back type-faithfully — round-tripping through Spark turns
it into BIGINT and breaks every DuckDB oracle that does timestamp
arithmetic on it. DuckDB reads AND writes TIMESTAMP_NS natively, so the
events replication runs here instead. Companion to
src/test/scala/graft/tools/ScaleUp.scala, which handles every other table.

Usage: python3 tools/scaleup_events.py <srcDir> <dstDir> <factor>
"""
import shutil
import sys
import os
import duckdb

src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
target = f"{dst}/events.parquet"
if os.path.isdir(target):
    shutil.rmtree(target)
elif os.path.exists(target):
    os.remove(target)
con = duckdb.connect()
n_events = con.sql(f"SELECT count(*) FROM '{src}/events.parquet'").fetchone()[0]
n_users = con.sql(f"SELECT max(user_id) + 1 FROM '{src}/events.parquet'").fetchone()[0]
con.execute(f"""
COPY (
  SELECT event_id + i.i * {n_events} AS event_id,
         ts,
         user_id + i.i * {n_users} AS user_id,
         event_type, value, props
  FROM '{src}/events.parquet', (SELECT unnest(range(0, {factor})) AS i) i
) TO '{dst}/events.parquet' (FORMAT parquet)
""")
out = con.sql(f"SELECT count(*), typeof(max(ts)) FROM '{dst}/events.parquet'").fetchone()
print(f"SCALEUP events -> {out[0]} rows, ts type {out[1]}")
