#!/usr/bin/env python3
"""Dev-only: cross-fetch-path oracle comparison.

The main gate (check_oracle.py) compares via cursor fetchall(), which
coerces DuckDB types through python objects. External comparators may
fetch via pandas (.df()) or arrow (.arrow()) instead, where type edges
render differently (the r6/r7 lesson: HUGEINT -> float64/decimal128
made pack_sequences hash-red ONLY under those paths). This harness
re-compares every query's Spark parquet against its oracle SQL under
BOTH alternative paths, so a type edge can't hide behind fetch-path
luck. Run after check_oracle.py (it reuses the Verify output dir).

Usage: python3 tools/check_fetchpaths.py [sfDir] [outDir]
"""
import sys, json, os, glob
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
for t in TABLES:
    p = f"{SF}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def canon_pandas(df):
    df = df[sorted(df.columns)]
    return [tuple(str(v) for v in row) for row in df.itertuples(index=False)]

def canon_arrow(tbl):
    cols = sorted(tbl.column_names)
    data = [tbl.column(c).to_pylist() for c in cols]
    return [tuple(str(data[j][i]) for j in range(len(cols)))
            for i in range(tbl.num_rows)]

fails = 0
for name, sql in sorted(oracle.items()):
    pdir = f"{OUT}/{name}"
    if not glob.glob(f"{pdir}/*.parquet"):
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    spark_sql = f"SELECT * FROM '{pdir}/*.parquet'"
    for path, canon, fetch in (
            ("pandas", canon_pandas, lambda q: con.execute(q).df()),
            ("arrow", canon_arrow, lambda q: con.execute(q).arrow())):
        a, b = canon(fetch(spark_sql)), canon(fetch(sql))
        if a != b:
            bad = [(i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y][:2]
            print(f"FAIL {name} [{path}]: rows {len(a)} vs {len(b)}; {bad}")
            fails += 1
            break
    else:
        print(f"OK   {name}")

print(f"\n{'ALL MATCH (both fetch paths)' if fails == 0 else f'{fails} FAILURES'} / {len(oracle)} queries")
sys.exit(1 if fails else 0)
