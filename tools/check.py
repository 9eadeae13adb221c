#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB against the sfDir parquet tables, compare to the Spark result parquet
written by graft.Verify (columns sorted by name, rows sorted, values
normalized). Usage: check.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)

def norm_type(t):
    # the driver's hash is insensitive to integer WIDTH (INT vs BIGINT pass)
    # but breaks on DuckDB's HUGEINT (int128) — keep that one distinct
    s = str(t)
    return "INT" if s in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT") else s

def canon(cols, rows, types):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out, [norm_type(types[i]) for i in order]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            gcols, grows, gtypes = canon(got.columns, got.fetchall(), got.types)
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        try:
            exp = con.sql(sql)
            ecols, erows, etypes = canon(exp.columns, exp.fetchall(), exp.types)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if gcols != ecols:
            print(f"FAIL {name}: columns {gcols} != {ecols}")
            n_fail += 1
        elif gtypes != etypes:
            # the driver's hash is dtype-sensitive (e.g. DuckDB SUM → HUGEINT)
            diffs = [(c, g, e) for c, g, e in zip(gcols, gtypes, etypes) if g != e]
            print(f"FAIL {name}: column types differ: {diffs}")
            n_fail += 1
        elif grows != erows:
            diffs = [(a, b) for a, b in zip(grows, erows) if a != b][:3]
            print(f"FAIL {name}: {len(grows)} vs {len(erows)} rows; first diffs: {diffs}")
            if len(grows) != len(erows):
                only_g = set(grows) - set(erows)
                only_e = set(erows) - set(grows)
                print(f"  only-spark: {list(only_g)[:2]}\n  only-oracle: {list(only_e)[:2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(grows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
