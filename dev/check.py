#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Runs graft.Verify output (parquet per query + oracle_sql.json) against DuckDB
on the same test tables, sorts columns by name and rows by value, and compares.
Usage: python3 dev/check.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, glob, os
import duckdb

def norm(v):
    # floats: exact compare — the engine is designed for bit-identical output.
    if isinstance(v, float):
        return repr(v)
    return repr(v)

def table_rows(rel):
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = rel.fetchall()
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_dir = f"{out_dir}/{name}"
        if not glob.glob(f"{spark_dir}/*.parquet"):
            print(f"FAIL {name}: no spark output"); failed.append(name); continue
        try:
            scols, srows = table_rows(con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'"))
            ocols, orows = table_rows(con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: {e}"); failed.append(name); continue
        if scols != ocols:
            print(f"FAIL {name}: columns spark={scols} oracle={ocols}"); failed.append(name); continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}"); failed.append(name); continue
        bad = [(a, b) for a, b in zip(srows, orows) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(srows)} row mismatches; first: spark={bad[0][0]} oracle={bad[0][1]}")
            failed.append(name); continue
        print(f"PASS {name} ({len(srows)} rows)")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} pass")
    sys.exit(1 if failed else 0)

if __name__ == "__main__":
    main()
