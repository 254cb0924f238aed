"""Deterministic sf-scale-up generator for bench floors.

The driver ships testdata up to sf0.1 (5k docs); sub-5s queries at that
size sit inside the VM's ±25-40% steal noise (VERDICT r2 finding #5).
This tool synthesises an "sf1"-shaped directory — 10x rows — entirely
from sf0.1 by deterministic replication with per-replica id offsets and
a replica token appended to text (no external data, byte-stable):

    python tools/gen_sf.py [src_dir] [dst_dir] [factor]

documents: doc_id + k*OFFSET, text || ' repk', same lang/source
embeddings: vec_id + k*OFFSET, embedding rotated by k positions
events: event_id + k*OFFSET, user_id + k*1000, ts + k minutes

Replicated text makes the dedup workload HEAVIER (each doc gains
factor-1 near-duplicates — a realistic boilerplate regime), so sf1
numbers are comparable only to other sf1 runs, not linear-scaled sf0.1.
"""

from __future__ import annotations

import os
import sys

import duckdb

OFFSET = 1_000_000


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfgen/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    ks = ", ".join(str(k) for k in range(factor))

    con.sql(f"""
        COPY (
          SELECT doc_id + k.k * {OFFSET} AS doc_id,
                 CASE WHEN k.k = 0 THEN text ELSE text || ' rep' || k.k::VARCHAR END AS text,
                 lang, source, n_chars
          FROM '{src}/documents.parquet', (SELECT unnest([{ks}]) AS k) k
          ORDER BY doc_id
        ) TO '{dst}/documents.parquet' (FORMAT PARQUET, COMPRESSION ZSTD)
    """)
    con.sql(f"""
        COPY (
          SELECT vec_id + k.k * {OFFSET} AS vec_id,
                 list_concat(embedding[(k.k % len(embedding)) + 1:],
                             embedding[1:(k.k % len(embedding))]) AS embedding,
                 label
          FROM '{src}/embeddings.parquet', (SELECT unnest([{ks}]) AS k) k
          ORDER BY vec_id
        ) TO '{dst}/embeddings.parquet' (FORMAT PARQUET, COMPRESSION ZSTD)
    """)
    con.sql(f"""
        COPY (
          SELECT event_id + k.k * {OFFSET} AS event_id,
                 ts + INTERVAL (k.k) MINUTE AS ts,
                 user_id + k.k * 1000 AS user_id,
                 event_type, value, props
          FROM '{src}/events.parquet', (SELECT unnest([{ks}]) AS k) k
          ORDER BY event_id
        ) TO '{dst}/events.parquet' (FORMAT PARQUET, COMPRESSION ZSTD)
    """)
    for t in ("documents", "embeddings", "events"):
        n = con.sql(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
