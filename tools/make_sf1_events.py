#!/usr/bin/env python3
"""Replicate the events table 10x with re-keyed ids for the sf1 corpus.

Done with pyarrow (not Spark, not DuckDB) because events.ts is parquet
TIMESTAMP(NANOS): Spark cannot read/write that physical type and DuckDB's
parquet writer downcasts to MICROS — pyarrow round-trips timestamp[ns]
exactly, so the sf1 schema matches sf0.1 for both engines' readers.

Usage: make_sf1_events.py [srcDir] [outDir] [copies]
"""
import sys
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata_sf1"
copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
STRIDE = 100000000

t = pq.read_table(f"{src}/events.parquet")
parts = []
for i in range(copies):
    shifted = t.set_column(t.schema.get_field_index("event_id"), "event_id",
                           pc.add(t["event_id"], i * STRIDE))
    shifted = shifted.set_column(shifted.schema.get_field_index("user_id"),
                                 "user_id",
                                 pc.add(shifted["user_id"], i * STRIDE))
    parts.append(shifted)
big = pa.concat_tables(parts)
pq.write_table(big, f"{out}/events.parquet",
               coerce_timestamps=None, version="2.6")
check = pq.read_schema(f"{out}/events.parquet")
print(f"events: {big.num_rows} rows, ts type {check.field('ts').type}")
