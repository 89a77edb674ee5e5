#!/usr/bin/env python
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python tools/compare.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over the same
parquet tables, and compares row-count, schema-ish, and exact values after
sorting rows and sorting columns by name (mirrors the described driver
behavior as closely as we can).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).fetchall()
            cols = [d[0] for d in con.description]
            got_rel = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got = got_rel.fetchall()
            gcols = [d[0] for d in con.description]
            if sorted(cols) != sorted(gcols):
                print(f"FAIL {name}: columns exp={sorted(cols)} got={sorted(gcols)}")
                n_fail += 1
                continue
            # sort columns by name, then rows
            eidx = [cols.index(c) for c in sorted(cols)]
            gidx = [gcols.index(c) for c in sorted(gcols)]
            erows = sorted([tuple(norm(r[i]) for i in eidx) for r in exp],
                           key=repr)
            grows = sorted([tuple(norm(r[i]) for i in gidx) for r in got],
                           key=repr)
            if len(erows) != len(grows):
                print(f"FAIL {name}: rowcount exp={len(erows)} got={len(grows)}")
                n_fail += 1
                continue
            bad = [(a, b) for a, b in zip(erows, grows) if a != b]
            if bad:
                print(f"FAIL {name}: {len(bad)}/{len(erows)} rows differ; first: exp={bad[0][0]} got={bad[0][1]}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(erows)} rows)")
                n_pass += 1
        except Exception as e:  # noqa
            print(f"ERROR {name}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
