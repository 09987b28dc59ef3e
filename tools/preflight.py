#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (SURVEY §5.2).

Usage: python3 tools/preflight.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the parquet
tables in <sfDir>, sorts columns by name, and value-compares cell by cell
(the driver hash-compares; an exact value diff is strictly stronger and
actually debuggable).
"""
import json, math, sys
import duckdb

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_pass = n_fail = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        sql = oracles[name]
        try:
            spark_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            spark_cols = sorted(spark_rel.columns)
            spark_rows = con.sql(
                "SELECT " + ", ".join(f'"{c}"' for c in spark_cols)
                + f" FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchall()
            ora_rel = con.sql(sql)
            ora_cols_orig = ora_rel.columns
            ora_cols = sorted(ora_cols_orig)
            ora_rows = con.execute(
                "SELECT " + ", ".join(f'"{c}"' for c in ora_cols)
                + f" FROM ({sql}) t").fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if spark_cols != ora_cols:
            print(f"FAIL {name}: columns spark={spark_cols} oracle={ora_cols}")
            n_fail += 1
            continue
        if len(spark_rows) != len(ora_rows):
            print(f"FAIL {name}: rowcount spark={len(spark_rows)} oracle={len(ora_rows)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(spark_rows, ora_rows)):
            if tuple(norm(x) for x in a) != tuple(norm(x) for x in b):
                bad = (i, a, b)
                break
        if bad:
            i, a, b = bad
            print(f"FAIL {name}: row {i} differs\n  cols   {spark_cols}\n  spark  {a}\n  oracle {b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_rows)} rows)")
            n_pass += 1
    declared = set(oracles)
    print(f"\n{n_pass} pass, {n_fail} fail, {len(declared)} declared oracles")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
