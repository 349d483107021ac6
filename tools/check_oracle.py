#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query result
parquet dumped by graft.Verify, run the corresponding DuckDB oracle SQL over
the same sf dir and compare two ways:

1. exact compare (round-1 behavior): columns sorted by name, rows sorted,
   values compared exactly — floats exactly too.
2. pandas compare (driver-faithful, added in round 2): both sides go through
   pandas (spark parquet via pyarrow, oracle via duckdb .df()), dtypes must
   match after datetime-unit normalization, rows must sort without error, and
   values must match. This is the mode that catches the representation
   divergences the driver flagged in round 1 (int32 vs int64, DuckDB HUGEINT
   -> float64, NULL cells -> float64) that fetchall-str compare silently
   passes.

Additionally any spark-side output column with a hash-risk physical type
(decimal, date32, list/array) FAILS regardless of values: round 1 proved the
driver's canonicalization mismatches those types even when values are exact.

Usage: check_oracle.py <sfDir> <verifyOutDir> [--json <outPath>]

--json writes a driver-schema artifact: per-query {rows_match, schema_match,
hash_match, spark_rows, oracle_rows, err} exactly mirroring the driver's
CORRECTNESS_r{N}.json, so off-gate runs (e.g. the sf0.1 full gate) are
machine-comparable round over round (VERDICT r07 Next #7).
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import pyarrow.dataset as pads

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

RISKY_TYPES = ("decimal", "date32", "list", "large_list", "fixed_size_list")

def risky_columns(qdir):
    """Spark-side physical types the driver's canonicalization is known to
    mismatch even on exact values (VERDICT r01)."""
    schema = pads.dataset(glob.glob(f"{qdir}/*.parquet")).schema
    out = []
    for name, typ in zip(schema.names, schema.types):
        t = str(typ)
        if any(t.startswith(r) for r in RISKY_TYPES):
            out.append(f"{name}:{t}")
    return out

def norm_dtype(dt):
    s = str(dt)
    if s.startswith("datetime64"):
        return "datetime64"  # driver passes timestamps regardless of unit
    if s in ("int8", "int16", "int32", "int64"):
        return "int"  # driver r01 passed int32 Spark vs int64 DuckDB (qm01, qs01..)
    return s

def norm_pd_cell(v):
    if isinstance(v, float):
        return repr(v)
    return str(v)

def pandas_compare(qdir, sql, con):
    """Mirror the driver: pandas on both sides, dtype-aware. Returns a list
    of issue strings (empty = pass)."""
    issues = []
    spark_df = pd.read_parquet(qdir)
    oracle_df = con.sql(sql).df()
    s_cols, o_cols = sorted(spark_df.columns), sorted(oracle_df.columns)
    if s_cols != o_cols:
        return [f"columns {s_cols} vs {o_cols}"]
    spark_df, oracle_df = spark_df[s_cols], oracle_df[s_cols]
    for c in s_cols:
        sd, od = norm_dtype(spark_df[c].dtype), norm_dtype(oracle_df[c].dtype)
        if sd != od:
            issues.append(f"dtype[{c}]: spark {sd} vs oracle {od}")
    try:
        spark_df = spark_df.sort_values(by=s_cols).reset_index(drop=True)
        oracle_df = oracle_df.sort_values(by=s_cols).reset_index(drop=True)
    except TypeError as e:
        issues.append(f"row sort crashed (driver would err): {e}")
        return issues
    if len(spark_df) != len(oracle_df):
        issues.append(f"rows {len(spark_df)} vs {len(oracle_df)}")
        return issues
    if not issues:
        for c in s_cols:
            sv = [norm_pd_cell(v) for v in spark_df[c].tolist()]
            ov = [norm_pd_cell(v) for v in oracle_df[c].tolist()]
            if sv != ov:
                bad = next(i for i in range(len(sv)) if sv[i] != ov[i])
                issues.append(
                    f"value[{c}] row {bad}: spark {sv[bad]} vs oracle {ov[bad]}")
    return issues

def main(sf_dir, out_dir, json_out=None):
    results = {}
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
            results[name] = entry(err=f"cannot read result: {e}")
            n_fail += 1
            continue
        risky = risky_columns(qdir)
        if risky:
            print(f"FAIL {name}: hash-risk output types {risky}")
            results[name] = entry(schema=False, spark_rows=len(got),
                                  err=f"hash-risk output types {risky}")
            n_fail += 1
            continue
        if name not in oracles:
            status = "ROWS-ONLY" if len(got) > 0 else "ROWS-ONLY-EMPTY!"
            print(f"{status} {name}: {len(got)} rows")
            results[name] = entry(rows=len(got) > 0, schema=None, hash_m=None,
                                  spark_rows=len(got))
            n_noracle += 1
            continue
        try:
            exp_rel = con.sql(oracles[name])
            exp_cols, exp = norm_rows(exp_rel.columns, exp_rel.fetchall())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e).splitlines()[0]}")
            results[name] = entry(spark_rows=len(got),
                                  err=f"oracle SQL error: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} vs {exp_cols}")
            results[name] = entry(rows=len(got) == len(exp), schema=False,
                                  spark_rows=len(got), oracle_rows=len(exp))
            n_fail += 1
        elif got != exp:
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            only_got = [r for r in got if r not in set(exp)][:3]
            only_exp = [r for r in exp if r not in set(got)][:3]
            for r in only_got:
                print(f"   spark-only: {r}")
            for r in only_exp:
                print(f"   oracle-only: {r}")
            results[name] = entry(rows=len(got) == len(exp), schema=True,
                                  spark_rows=len(got), oracle_rows=len(exp))
            n_fail += 1
        else:
            try:
                issues = pandas_compare(qdir, oracles[name], con)
            except Exception as e:
                issues = [f"pandas compare crashed: {e}"]
            if issues:
                print(f"FAIL {name}: pandas-mode " + "; ".join(issues[:4]))
                results[name] = entry(rows=True, schema=not any(
                    i.startswith(("dtype", "columns")) for i in issues),
                    spark_rows=len(got), oracle_rows=len(exp),
                    err="pandas-mode " + "; ".join(issues[:4]))
                n_fail += 1
            else:
                print(f"PASS {name}: {len(got)} rows")
                results[name] = entry(rows=True, schema=True, hash_m=True,
                                      spark_rows=len(got), oracle_rows=len(exp))
                n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_noracle} rows-only ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
        print(f"wrote {json_out} ({len(results)} queries)")
    return 1 if n_fail else 0

def entry(rows=False, schema=True, hash_m=False, spark_rows=None,
          oracle_rows=None, err=None):
    """One driver-schema result row (hash_match is False unless the full
    value compare passed; None mirrors the driver's weaker rows-only check)."""
    return {"rows_match": rows, "schema_match": schema, "hash_match": hash_m,
            "spark_rows": spark_rows, "oracle_rows": oracle_rows, "err": err}


if __name__ == "__main__":
    argv = sys.argv[1:]
    j = None
    if "--json" in argv:
        i = argv.index("--json")
        j = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sys.exit(main(argv[0], argv[1], j))
