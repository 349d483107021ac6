#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query result
parquet dumped by graft.Verify, run the corresponding DuckDB oracle SQL over
the same sf dir and compare (columns sorted by name, rows sorted, values
compared exactly — floats exactly too, to surface any nondeterminism early).

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if isinstance(v, float):
        return ("f", repr(v))
    if isinstance(v, list):
        return ("l", tuple(norm_cell(x) for x in v))
    return ("v", str(v))

def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_noracle = 0
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        try:
            got_rel = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
            got_cols, got = norm_rows(got_rel.columns, got_rel.fetchall())
        except Exception as e:
            print(f"FAIL {name}: cannot read result: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            status = "ROWS-ONLY" if len(got) > 0 else "ROWS-ONLY-EMPTY!"
            print(f"{status} {name}: {len(got)} rows")
            n_noracle += 1
            continue
        try:
            exp_rel = con.sql(oracles[name])
            exp_cols, exp = norm_rows(exp_rel.columns, exp_rel.fetchall())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} vs {exp_cols}")
            n_fail += 1
        elif got != exp:
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            only_got = [r for r in got if r not in set(exp)][:3]
            only_exp = [r for r in exp if r not in set(got)][:3]
            for r in only_got:
                print(f"   spark-only: {r}")
            for r in only_exp:
                print(f"   oracle-only: {r}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(got)} rows")
            n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_noracle} rows-only ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
