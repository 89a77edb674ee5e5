#!/usr/bin/env python3
"""Dev-side replica of the driver's correctness check: run each oracle SQL
in DuckDB over the sf parquet tables, compare to the Spark parquet dump
(columns sorted by name, values compared exactly).

The comparison is positional (no row sort): every query in the suite is
required to end with a total deterministic ORDER BY on both sides
(QueryDef.scala:17), so a row-order mismatch IS a correctness failure.
Values are compared as exact Python objects via fetchall() — no pandas
dtype coercion (nullable ints stay ints, NULL stays None and never
equals NaN).
"""
import sys, json, math
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")


def canon(v):
    """Normalize sequence-typed cells so == has unambiguous truth value."""
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if hasattr(v, "tolist"):  # numpy array / scalar
        return canon(v.tolist())
    return v


def cells_equal(a, b):
    a, b = canon(a), canon(b)
    if a is None or b is None:
        return a is None and b is None  # NULL==NULL only, never NULL==NaN
    if isinstance(a, float) and isinstance(b, float):
        return (math.isnan(a) and math.isnan(b)) or a == b
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(cells_equal(x, y) for x, y in zip(a, b))
    return a == b


oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = []
import os
for name, sql in sorted(oracle.items()):
    # dev subset runs (SPARK_GRAFT_ONLY) dump only the named queries; skip
    # the others by NAME (a named query whose dump dir is missing crashed
    # inside Verify and must still be reported as a failure)
    only = os.environ.get("SPARK_GRAFT_ONLY")
    if only and name not in only.split(","):
        continue
    try:
        cur = con.execute(sql)
        exp_cols = [d[0] for d in cur.description]
        exp_rows = cur.fetchall()

        cur2 = duckdb.connect().execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        got_cols = [d[0] for d in cur2.description]
        got_rows = cur2.fetchall()

        # compare with columns sorted by name (driver convention)
        eidx = [exp_cols.index(c) for c in sorted(exp_cols)]
        gidx = [got_cols.index(c) for c in sorted(got_cols)]
        if sorted(exp_cols) != sorted(got_cols):
            fails.append((name, f"columns: oracle={sorted(exp_cols)} spark={sorted(got_cols)}"))
            continue
        if len(exp_rows) != len(got_rows):
            fails.append((name, f"rows: oracle={len(exp_rows)} spark={len(got_rows)}"))
            continue
        bad = None
        for i, (er, gr) in enumerate(zip(exp_rows, got_rows)):
            for ci, (ei, gi) in enumerate(zip(eidx, gidx)):
                if not cells_equal(er[ei], gr[gi]):
                    bad = (f"col {sorted(exp_cols)[ci]} row {i}: "
                           f"oracle={er[ei]!r} spark={gr[gi]!r}")
                    break
            if bad:
                break
        if bad:
            fails.append((name, bad))
        else:
            print(f"PASS {name} ({len(exp_rows)} rows)")
    except Exception as e:
        fails.append((name, f"compare error: {type(e).__name__}: {e}"))
for name, why in fails:
    print(f"FAIL {name}: {why}")
print(f"\n{len(oracle) - len(fails)}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
