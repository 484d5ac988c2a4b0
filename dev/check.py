#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Runs graft.Verify output (parquet per query + oracle_sql.json) against DuckDB
on the same test tables, sorts columns by name and rows by value, and compares.

Two layers, because the driver's gate is TYPED where repr() is not:
  1. value compare — sorted-row repr equality (the round-1 gate);
  2. type parity — the DuckDB type of every oracle column must match the
     Spark parquet's up to 64-bit integer width. DuckDB silently widens
     SUM(BIGINT) to HUGEINT and 'x * 0.5' to DECIMAL; repr() erases both,
     the driver's typed value-hash does not (ann13, round 5). An uncast
     aggregate therefore PASSES layer 1 and must die here instead.

Usage: python3 dev/check.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, glob, os, re
import duckdb

def norm(v):
    # floats: exact compare — the engine is designed for bit-identical output.
    if isinstance(v, float):
        return repr(v)
    return repr(v)

def type_class(t):
    """Canonical type up to the equivalences the driver's hash tolerates:
    int widths <= 64 bits collapse to BIGINT (applies inside LIST types
    too); tz-annotated timestamps (how DuckDB reads Spark's UTC parquet
    timestamps) collapse to TIMESTAMP. HUGEINT, DECIMAL, FLOAT-vs-DOUBLE
    stay distinct — those are exactly the silent-widening bugs."""
    t = str(t).upper()
    t = t.replace("TIMESTAMP WITH TIME ZONE", "TIMESTAMP")
    for w in ("TINYINT", "SMALLINT", "INTEGER"):
        t = re.sub(rf"\b{w}\b", "BIGINT", t)
    return t

def table_rows(rel):
    cols = rel.columns
    types = [type_class(t) for t in rel.types]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = rel.fetchall()
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], [types[i] for i in order], out

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
            scols, stypes, srows = table_rows(con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'"))
            ocols, otypes, orows = table_rows(con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: {e}"); failed.append(name); continue
        if scols != ocols:
            print(f"FAIL {name}: columns spark={scols} oracle={ocols}"); failed.append(name); continue
        if stypes != otypes:
            bad = [(c, s, o) for c, s, o in zip(scols, stypes, otypes) if s != o]
            print(f"FAIL {name}: TYPE parity (driver hash diverges even if values repr-match): {bad}")
            failed.append(name); continue
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
