#!/usr/bin/env python3
"""Build the sf1.0 SCALE-PROBE dataset (10x sf0.1) under target/sf1.0.

Probe-only data for BENCH_sf1.json — never used by correctness gates
(those stay on the driver-generated /root/testdata). Replication is
designed to keep gate WORKLOADS scaling linearly, the way a real 10x
corpus would, rather than adversarially:

- documents: 10 replicas; replica k suffixes every word with _k and
  offsets doc_id by k*1e9. Replicas share no vocabulary, so shingle/
  word/minhash/simhash dedup sees 10x independent corpora (linear
  candidate growth) instead of every doc gaining 9 artificial
  near-duplicates (quadratic blowup a real corpus doesn't have).
  Replica 0 is the original byte-for-byte.
- events: 10 replicas; replica k offsets event_id by k*N (the grid
  gates' t dimension grows 10x) and shifts ts by k*(range+1h) (the
  stream timeline extends 10x; watermark state stays bounded).
- remaining tables symlink to sf0.1 (only warmup touches them for the
  probed gates).
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "target/sf1.0"
K = int(sys.argv[2]) if len(sys.argv) > 2 else 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute("SET threads TO 8")

# documents: vocabulary-disjoint replicas
con.execute(f"""
  COPY (
    SELECT doc_id, text, lang, source, n_chars
    FROM '{SRC}/documents.parquet'
    UNION ALL
    SELECT d.doc_id + k.k * 1000000000 AS doc_id,
           regexp_replace(d.text, '([^ ]+)', '\\1_' || k.k::VARCHAR, 'g') AS text,
           d.lang, d.source,
           length(regexp_replace(d.text, '([^ ]+)', '\\1_' || k.k::VARCHAR, 'g')) AS n_chars
    FROM '{SRC}/documents.parquet' d, (SELECT unnest(range(1, {K})) AS k) k
    ORDER BY doc_id
  ) TO '{DST}/documents.parquet' (FORMAT PARQUET)
""")

# events: extended timeline + extended event_id grid
n, lo, hi = con.execute(
    f"SELECT count(*), min(ts), max(ts) FROM '{SRC}/events.parquet'").fetchone()
con.execute(f"""
  COPY (
    SELECT e.event_id + k.k * {n} AS event_id,
           e.ts + k.k * (TIMESTAMP '{hi}' - TIMESTAMP '{lo}' + INTERVAL 1 HOUR) AS ts,
           e.user_id, e.event_type, e.value, e.props
    FROM '{SRC}/events.parquet' e, (SELECT unnest(range(0, {K})) AS k) k
    ORDER BY event_id
  ) TO '{DST}/events.parquet' (FORMAT PARQUET)
""")

# embeddings: 10 replicas, id-offset, DIRECTION-DECORRELATED: replica k
# cyclically shifts components by k and alternates signs by (i+k)
# parity, so replica directions are near-orthogonal to the originals.
# (A whole-vector sign flip or pure scaling would preserve the cosine
# DIRECTION — every vector would gain 9 exact-direction duplicates and
# LSH/semdedup would see an adversarial 10-deep-duplicate corpus no
# real 10x crawl produces.)
con.execute(f"""
  COPY (
    SELECT * FROM '{SRC}/embeddings.parquet'
    UNION ALL
    SELECT e.vec_id + k.k * 1000000000 AS vec_id,
           list_transform(
             e.embedding[k.k + 1:] || e.embedding[:k.k],
             (x, i) -> (x * (CASE WHEN (i + k.k) % 2 = 0
                             THEN -1.0 ELSE 1.0 END))::FLOAT) AS embedding,
           e.label
    FROM '{SRC}/embeddings.parquet' e, (SELECT unnest(range(1, {K})) AS k) k
    ORDER BY vec_id
  ) TO '{DST}/embeddings.parquet' (FORMAT PARQUET)
""")

# relational star: 10 replicas with consistent key remaps (replica k
# offsets every synthetic key by k*max so joins stay replica-local —
# the realistic growth shape: more customers/orders/parts, same
# geography). nation/region stay fixed.
C, O, P, S = [con.execute(
    f"SELECT max({k}) + 1 FROM '{SRC}/{t}.parquet'").fetchone()[0]
    for k, t in [("c_custkey", "customer"), ("o_orderkey", "orders"),
                 ("p_partkey", "part"), ("s_suppkey", "supplier")]]
ks = f"(SELECT unnest(range(0, {K})) AS k) k"
con.execute(f"""
  COPY (SELECT c_custkey + k.k * {C} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM '{SRC}/customer.parquet' c, {ks} ORDER BY c_custkey)
  TO '{DST}/customer.parquet' (FORMAT PARQUET)""")
con.execute(f"""
  COPY (SELECT s_suppkey + k.k * {S} AS s_suppkey, s_name, s_nationkey,
               s_acctbal
        FROM '{SRC}/supplier.parquet' s, {ks} ORDER BY s_suppkey)
  TO '{DST}/supplier.parquet' (FORMAT PARQUET)""")
con.execute(f"""
  COPY (SELECT p_partkey + k.k * {P} AS p_partkey, p_name, p_brand,
               p_type, p_size, p_retailprice
        FROM '{SRC}/part.parquet' p, {ks} ORDER BY p_partkey)
  TO '{DST}/part.parquet' (FORMAT PARQUET)""")
con.execute(f"""
  COPY (SELECT o_orderkey + k.k * {O} AS o_orderkey,
               o_custkey + k.k * {C} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{SRC}/orders.parquet' o, {ks} ORDER BY o_orderkey)
  TO '{DST}/orders.parquet' (FORMAT PARQUET)""")
con.execute(f"""
  COPY (SELECT l_orderkey + k.k * {O} AS l_orderkey,
               l_partkey + k.k * {P} AS l_partkey,
               l_suppkey + k.k * {S} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM '{SRC}/lineitem.parquet' l, {ks} ORDER BY l_orderkey, l_linenumber)
  TO '{DST}/lineitem.parquet' (FORMAT PARQUET)""")

for t in ["region", "nation"]:
    dst = f"{DST}/{t}.parquet"
    if not os.path.exists(dst):
        os.symlink(f"{SRC}/{t}.parquet", dst)

for t in ["documents", "events", "embeddings", "customer", "orders",
          "lineitem", "supplier", "part"]:
    r = con.execute(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
    print(t, r)
print("done ->", DST)
