#!/usr/bin/env python3
"""Build the SKEWED 10x probe dataset under target/sf1.0_skew.

make_sf1.py's replicas are uniform; real corpora are Zipf-skewed. This
variant plants the specific hazards the verdict named, so the gates
whose salting/AQE-skew handling was added on uniform data get measured
against adversarial-but-realistic distributions:

- documents (10x, vocabulary-disjoint replicas like make_sf1):
  * ~80% of the corpus is ONE language (replicas 1..9 relabel 84% of
    rows 'en'; replica 0 stays pristine) -> c09's percentile filter and
    t05's profile training see one giant group;
  * Zipf source counts (source rank r with mass ~ 1/r over 20 ranks via
    an inverse-CDF ladder on a doc_id hash) -> domain-grouped work is
    head-heavy instead of 250-per-source uniform;
  * a VIRAL cluster: doc_id % 100 == 7 in replicas 1..9 all share one
    identical boilerplate text (~450 exact copies) -> one white-hot
    MinHash band / shingle bucket, the mega-cluster every web crawl has.
- embeddings (10x): replicas 1..9 send 15% of vectors to a HOT IVF
  cell (seed vector 0 plus a tiny deterministic per-row perturbation,
  ~2700 near-identical vectors); the rest decorrelate by cyclic shift +
  alternating signs as in make_sf1.
- orders/lineitem (10x, replica-local key remaps as make_sf1): replicas
  1..9 reassign 30% of orders to ONE customer and 10% of line items to
  ONE mega-order -> hot groupBy keys on both sides of q05's
  pre-aggregate-then-join.
- events/nation/region/customer/supplier/part: symlinked from the
  uniform 10x dir (only warmup touches them for the probed gates).

Probe-only data for BENCH_sf1.json's skew_probe block — never used by
correctness gates.

Usage: make_skew.py [DST] [UNIFORM_DIR]   (defaults target/sf1.0_skew,
uniform replica source target/sf1.0 for symlinks; base data always
/root/testdata/sf0.1)
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "target/sf1.0_skew"
UNI = sys.argv[2] if len(sys.argv) > 2 else "target/sf1.0"
K = 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute("SET threads TO 8")

# Zipf inverse-CDF ladder over 20 source ranks: P(r) ~ 1/r, H20 = 3.5977.
H = sum(1.0 / r for r in range(1, 21))
cum = []
acc = 0.0
for r in range(1, 21):
    acc += (1.0 / r) / H
    cum.append(acc)
ladder = " ".join(
    f"WHEN u < {cum[i]:.6f} THEN 'src{i}'" for i in range(19))
zipf_source = f"(CASE {ladder} ELSE 'src19' END)"

VIRAL = ("breaking news subscribe to our newsletter for the latest "
         "updates terms of service privacy policy cookie settings all "
         "rights reserved contact us about advertising careers help "
         "center community guidelines do not sell my personal information")

con.execute(f"""
  COPY (
    WITH rep AS (
      SELECT d.doc_id + k.k * 1000000000 AS doc_id,
             CASE WHEN d.doc_id % 100 = 7 THEN '{VIRAL}'
                  ELSE regexp_replace(d.text, '([^ ]+)', '\\1_' || k.k::VARCHAR, 'g')
             END AS text,
             CASE WHEN d.doc_id % 100 < 84 THEN 'en' ELSE d.lang END AS lang,
             (hash(d.doc_id * 31 + k.k) % 1000000) / 1000000.0 AS u
      FROM '{SRC}/documents.parquet' d,
           (SELECT unnest(range(1, {K})) AS k) k)
    SELECT doc_id, text, lang, source, n_chars FROM (
      SELECT doc_id, text, lang, {zipf_source} AS source,
             length(text) AS n_chars FROM rep
      UNION ALL
      SELECT doc_id, text, lang, source, n_chars
      FROM '{SRC}/documents.parquet')
    ORDER BY doc_id
  ) TO '{DST}/documents.parquet' (FORMAT PARQUET)
""")

# embeddings: hot IVF cell around seed vector 0 + decorrelated rest
con.execute(f"""
  COPY (
    WITH seed AS (
      SELECT embedding AS s FROM '{SRC}/embeddings.parquet' WHERE vec_id = 0)
    SELECT * FROM (
      SELECT * FROM '{SRC}/embeddings.parquet'
      UNION ALL
      SELECT e.vec_id + k.k * 1000000000 AS vec_id,
             CASE WHEN e.vec_id % 20 < 3 THEN
               list_transform(seed.s,
                 (x, i) -> (x + 0.001 * (((e.vec_id * 31 + k.k * 7 + i) % 7) - 3))::FLOAT)
             ELSE
               list_transform(
                 e.embedding[k.k + 1:] || e.embedding[:k.k],
                 (x, i) -> (x * (CASE WHEN (i + k.k) % 2 = 0
                                 THEN -1.0 ELSE 1.0 END))::FLOAT)
             END AS embedding,
             e.label
      FROM '{SRC}/embeddings.parquet' e,
           (SELECT unnest(range(1, {K})) AS k) k, seed)
    ORDER BY vec_id
  ) TO '{DST}/embeddings.parquet' (FORMAT PARQUET)
""")

# relational star with hot keys: 30% of replica orders -> one customer,
# 10% of replica line items -> one mega-order
C, O = [con.execute(
    f"SELECT max({k}) + 1 FROM '{SRC}/{t}.parquet'").fetchone()[0]
    for k, t in [("c_custkey", "customer"), ("o_orderkey", "orders")]]
hot_cust = con.execute(
    f"SELECT min(c_custkey) FROM '{SRC}/customer.parquet'").fetchone()[0]
hot_order = con.execute(
    f"SELECT min(o_orderkey) FROM '{SRC}/orders.parquet'").fetchone()[0]
con.execute(f"""
  COPY (
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           o_orderdate, o_orderpriority FROM (
      SELECT * FROM '{SRC}/orders.parquet'
      UNION ALL
      SELECT o.o_orderkey + k.k * {O} AS o_orderkey,
             CASE WHEN o.o_orderkey % 10 < 3 THEN {hot_cust}
                  ELSE o.o_custkey + k.k * {C} END AS o_custkey,
             o.o_orderstatus, o.o_totalprice, o.o_orderdate, o.o_orderpriority
      FROM '{SRC}/orders.parquet' o, (SELECT unnest(range(1, {K})) AS k) k)
    ORDER BY o_orderkey
  ) TO '{DST}/orders.parquet' (FORMAT PARQUET)
""")
con.execute(f"""
  COPY (
    SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
           l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
           l_shipdate FROM (
      SELECT * FROM '{SRC}/lineitem.parquet'
      UNION ALL
      SELECT CASE WHEN l.l_orderkey % 10 = 4 THEN {hot_order}
                  ELSE l.l_orderkey + k.k * {O} END AS l_orderkey,
             l.l_partkey, l.l_suppkey, l.l_linenumber, l.l_quantity,
             l.l_extendedprice, l.l_discount, l.l_tax, l.l_returnflag,
             l.l_linestatus, l.l_shipdate
      FROM '{SRC}/lineitem.parquet' l, (SELECT unnest(range(1, {K})) AS k) k)
    ORDER BY l_orderkey, l_linenumber
  ) TO '{DST}/lineitem.parquet' (FORMAT PARQUET)
""")

for t in ["events", "region", "nation", "customer", "supplier", "part"]:
    dst = f"{DST}/{t}.parquet"
    src = f"{UNI}/{t}.parquet" if os.path.exists(f"{UNI}/{t}.parquet") \
        else f"{SRC}/{t}.parquet"
    if not os.path.exists(dst):
        os.symlink(os.path.abspath(src), dst)

for t in ["documents", "embeddings", "orders", "lineitem"]:
    n = con.execute(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
    print(t, n)
en = con.execute(f"""SELECT
  sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) / count(*),
  sum(CASE WHEN text = '{VIRAL}' THEN 1 ELSE 0 END)
  FROM '{DST}/documents.parquet'""").fetchone()
print("en share %.3f, viral copies %d" % (en[0], en[1]))
hot = con.execute(f"""SELECT count(*) FROM '{DST}/embeddings.parquet'
  WHERE vec_id >= 1000000000 AND (vec_id % 1000000000) % 20 < 3""").fetchone()[0]
print("hot-cell vectors", hot)
