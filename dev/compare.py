#!/usr/bin/env python3
"""Dev-loop replica of the driver's correctness gate: run each
oracle_sql.json statement in DuckDB over the same sf tables, load the
Spark parquet dump, normalize (sort columns by name, round doubles to
6 decimals, render timestamps ISO-8601 UTC, sort rows), and diff.

Usage: python3 dev/compare.py <sfDir> <verifyOutDir>
"""
import sys, json, math, glob, os
import duckdb

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{round(v, 6):.6f}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)

def norm(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out_rows = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return [cols[i] for i in order], sorted(out_rows)

ok = fail = 0
for name in sorted(oracle):
    spark_dir = f"{out}/{name}"
    if not os.path.isdir(spark_dir):
        print(f"MISSING  {name} (no spark output)")
        fail += 1
        continue
    try:
        o = con.execute(oracle[name])
        o_cols = [d[0] for d in o.description]
        o_rows = o.fetchall()
    except Exception as e:
        print(f"ORACLE-ERR {name}: {e}")
        fail += 1
        continue
    s = con.execute(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
    s_cols = [d[0] for d in s.description]
    s_rows = s.fetchall()
    oc, orows = norm(o_cols, o_rows)
    sc, srows = norm(s_cols, s_rows)
    if oc != sc:
        print(f"SCHEMA   {name}: spark={sc} oracle={oc}")
        fail += 1
    elif orows != srows:
        diff_a = [r for r in srows if r not in orows][:3]
        diff_b = [r for r in orows if r not in srows][:3]
        print(f"ROWS     {name}: spark={len(srows)} oracle={len(orows)}"
              f" spark-only={diff_a} oracle-only={diff_b}")
        fail += 1
    else:
        print(f"OK       {name} ({len(srows)} rows)")
        ok += 1

# rows-only queries
for name in [os.path.basename(p) for p in glob.glob(f"{out}/*")
             if os.path.isdir(p)]:
    if name not in oracle:
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{name}/*.parquet')"
        ).fetchone()[0]
        print(f"ROWSONLY {name} ({n} rows)")

print(f"\n{ok} ok, {fail} fail, {len(oracle)} oracled")
sys.exit(1 if fail else 0)
