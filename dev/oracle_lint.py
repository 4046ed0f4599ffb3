#!/usr/bin/env python3
"""Oracle type-drift lint (dev-side; guards the bug class that bit in
rounds 1 and 4): DuckDB silently widens integer arithmetic — windowed
sum(BIGINT) is HUGEINT, and `//` over it stays HUGEINT — while Spark
emits LONG, so the driver gate's value hash diverges even though the
numbers print identically.

Runs every statement in a Verify dump's oracle_sql.json against the sf
tables and FAILS if any RESULT column has a type Spark cannot emit
from the paired query:
  - HUGEINT / UHUGEINT / UBIGINT  -> always a bug (cast to BIGINT)
  - unexpected nested/exotic types -> flagged for review
DECIMAL is allowed (some oracles intentionally pair Spark decimal
aggregates) but reported, so a new uncast decimal is visible in review.

Usage: python3 dev/oracle_lint.py <sfDir> <verifyOutDir>
Exit code 1 on any hard failure.
"""
import sys, json, glob, os
import duckdb

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))

HARD_BAD = {"HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT",
            "UTINYINT"}
OK = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE", "FLOAT",
      "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP", "TIMESTAMP WITH TIME ZONE",
      "TIME", "BLOB"}

def base_type(t):
    t = str(t)
    return t.split("(")[0].strip()

fails, warns = 0, 0
for name in sorted(oracle):
    sql = oracle[name]
    try:
        rel = con.sql(sql)
        cols, types = rel.columns, [base_type(t) for t in rel.types]
    except Exception as e:
        print(f"ERROR    {name}: oracle failed to run: {e}")
        fails += 1
        continue
    for c, t in zip(cols, types):
        if t in HARD_BAD:
            print(f"FAIL     {name}.{c}: {t} (cast to BIGINT in the oracle)")
            fails += 1
        elif t.startswith("DECIMAL"):
            print(f"decimal  {name}.{c}: {t} (ok if Spark side is decimal)")
            warns += 1
        elif t.startswith("STRUCT") or t.endswith("[]") or t.startswith("MAP"):
            print(f"nested   {name}.{c}: {t} (review: driver hash of nested)")
            warns += 1
        elif t not in OK:
            print(f"FAIL     {name}.{c}: unexpected type {t}")
            fails += 1

print(f"lint: {len(oracle)} oracles, {fails} failures, {warns} notes")
sys.exit(1 if fails else 0)
