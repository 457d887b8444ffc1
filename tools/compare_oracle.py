#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: compare_oracle.py <sfDir> <verifyOutDir>

Loads each query's parquet output (Spark side), runs its oracle SQL in
DuckDB over the same testdata parquet, and compares as multisets of rows
(columns sorted by name, rows sorted, values canonicalized).
"""
import sys, json, glob, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision: engines must agree to the last bit
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)

def rows_of(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)

fails = []
for name in sorted(oracle):
    sql = oracle[name]
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        fails.append((name, "no spark output")); continue
    # read the WHOLE directory — a multi-file output compared via files[0]
    # would silently check a partial row set
    spark_glob = f"{outdir}/{name}/*.parquet"
    scol = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{spark_glob}')").fetchall()]
    srows = con.execute(f"SELECT * FROM read_parquet('{spark_glob}')").fetchall()
    try:
        res = con.execute(sql)
        ocol = [d[0] for d in res.description]
        orows = res.fetchall()
    except Exception as e:
        fails.append((name, f"oracle error: {e}")); continue
    if sorted(scol) != sorted(ocol):
        fails.append((name, f"schema mismatch spark={sorted(scol)} duck={sorted(ocol)}")); continue
    a, b = rows_of(scol, srows), rows_of(ocol, orows)
    if a != b:
        diff_a = [r for r in a if r not in b][:3]
        diff_b = [r for r in b if r not in a][:3]
        fails.append((name, f"rows differ n_spark={len(a)} n_duck={len(b)} spark_only={diff_a} duck_only={diff_b}"))
    else:
        print(f"OK   {name} ({len(a)} rows)")

for name, msg in fails:
    print(f"FAIL {name}: {msg}")
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} queries match")
