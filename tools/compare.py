#!/usr/bin/env python3
"""Dev-side replica of the driver's correctness check: run each oracle SQL
in DuckDB over the sf parquet tables, compare to the Spark parquet dump
(columns sorted by name, values compared exactly)."""
import sys, json, glob, math
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetch_df()
    except Exception as e:
        fails.append((name, f"oracle error: {e}"))
        continue
    try:
        got = duckdb.connect().execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetch_df()
    except Exception as e:
        fails.append((name, f"result read error: {e}"))
        continue
    exp = exp[sorted(exp.columns)]
    got = got[sorted(got.columns)]
    if list(exp.columns) != list(got.columns):
        fails.append((name, f"columns: oracle={list(exp.columns)} spark={list(got.columns)}"))
        continue
    if len(exp) != len(got):
        fails.append((name, f"rows: oracle={len(exp)} spark={len(got)}"))
        continue
    bad = None
    for c in exp.columns:
        ev, gv = exp[c].tolist(), got[c].tolist()
        for i, (a, b) in enumerate(zip(ev, gv)):
            ok = (a == b) or (a is None and b is None)
            if not ok and isinstance(a, float) and isinstance(b, float):
                ok = (math.isnan(a) and math.isnan(b)) or a == b
            if not ok:
                try:
                    import pandas as pd
                    ok = pd.isna(a) and pd.isna(b)
                except Exception:
                    pass
            if not ok:
                bad = f"col {c} row {i}: oracle={a!r} spark={b!r}"
                break
        if bad:
            break
    if bad:
        fails.append((name, bad))
    else:
        print(f"PASS {name} ({len(exp)} rows)")
for name, why in fails:
    print(f"FAIL {name}: {why}")
print(f"\n{len(oracle) - len(fails)}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
