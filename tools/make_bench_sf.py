#!/usr/bin/env python3
"""Dev-only: synthesize a larger bench-scale dataset by replicating the
driver's sf0.1 tables K times with key/timestamp/content offsets, so the
per-round Bench can be swept at ~sf1.0 (6M lineitem / 1M events / 50k
docs / 20k embeddings) where data-dependent heads separate from
JVM/overhead-bound ones.

BENCH-ONLY: correctness oracles always run against the driver's real
/root/testdata (this script's output carries no oracle guarantees).
Offsets keep the tables' semantic shape:
  - events: event_id and ts offset per replica (no planted duplicate
    timestamps, so A1 keeps its real selectivity)
  - documents: doc_id offset, text suffixed per replica (exact-dedup
    selectivity preserved)
  - embeddings: vec_id offset, vectors perturbed per replica (cosine
    structure preserved, no artificial exact duplicates)
  - lineitem/orders: orderkey co-offset (join keys stay consistent);
    dimension tables stay as-is (realistic fact/dim scaling)

Usage: python3 tools/make_bench_sf.py <srcDir> <dstDir> <K>
"""
import sys
import duckdb

src, dst, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
con = duckdb.connect()
con.execute(f"CREATE VIEW ks AS SELECT unnest(range(0, {k})) AS k")

import os
os.makedirs(dst, exist_ok=True)

def copy(name, sql=None):
    q = sql or f"SELECT * FROM '{src}/{name}.parquet'"
    con.execute(f"COPY ({q}) TO '{dst}/{name}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{dst}/{name}.parquet'").fetchone()[0]
    print(f"{name}: {n} rows")

me = con.sql(f"SELECT max(event_id), epoch(max(ts)) - epoch(min(ts)) "
             f"FROM '{src}/events.parquet'").fetchone()
copy("events", f"""
  SELECT event_id + ks.k * {me[0] + 1} AS event_id,
         ts + INTERVAL (ks.k * {int(me[1]) + 3600}) SECOND AS ts,
         user_id, event_type, value, props
  FROM '{src}/events.parquet' CROSS JOIN ks""")

md = con.sql(f"SELECT max(doc_id) FROM '{src}/documents.parquet'").fetchone()[0]
copy("documents", f"""
  SELECT doc_id + ks.k * {md + 1} AS doc_id,
         CASE WHEN ks.k = 0 THEN text
              ELSE text || ' r' || ks.k::VARCHAR END AS text,
         * EXCLUDE (doc_id, text)
  FROM '{src}/documents.parquet' CROSS JOIN ks""")

mv = con.sql(f"SELECT max(vec_id) FROM '{src}/embeddings.parquet'").fetchone()[0]
copy("embeddings", f"""
  SELECT vec_id + ks.k * {mv + 1} AS vec_id,
         list_transform(embedding,
           x -> x + ks.k * 0.0001 * (1 + x)) AS embedding,
         * EXCLUDE (vec_id, embedding)
  FROM '{src}/embeddings.parquet' CROSS JOIN ks""")

mo = con.sql(f"SELECT max(o_orderkey) FROM '{src}/orders.parquet'").fetchone()[0]
copy("orders", f"""
  SELECT o_orderkey + ks.k * {mo + 1} AS o_orderkey,
         * EXCLUDE (o_orderkey)
  FROM '{src}/orders.parquet' CROSS JOIN ks""")
copy("lineitem", f"""
  SELECT l_orderkey + ks.k * {mo + 1} AS l_orderkey,
         * EXCLUDE (l_orderkey)
  FROM '{src}/lineitem.parquet' CROSS JOIN ks""")

for t in ["customer", "supplier", "part", "nation", "region"]:
    copy(t)
