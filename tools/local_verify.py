#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (dev tool only; the
shipped library is pure Scala/Spark). Usage:

    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/local_verify.py /root/testdata/sf0.01 /tmp/verify_out

Loads oracle_sql.json, registers the sf tables as DuckDB views, runs each
oracle, and compares against the Spark parquet output: row count, column
names, and exact values after sorting rows & columns."""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None and not (isinstance(v, float) and np.isnan(v)) else None)
    return df.sort_values(by=list(df.columns), kind="mergesort", na_position="last").reset_index(drop=True)

def compare(name, spark_df, oracle_df):
    issues = []
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        return [f"columns differ: spark={sorted(spark_df.columns)} oracle={sorted(oracle_df.columns)}"]
    if len(spark_df) != len(oracle_df):
        issues.append(f"row count: spark={len(spark_df)} oracle={len(oracle_df)}")
        return issues
    s, o = canon(spark_df), canon(oracle_df)
    for c in s.columns:
        sv, ov = s[c], o[c]
        s_float, o_float = pd.api.types.is_float_dtype(sv), pd.api.types.is_float_dtype(ov)
        s_int, o_int = pd.api.types.is_integer_dtype(sv), pd.api.types.is_integer_dtype(ov)
        # The driver hashes raw values, so int64 875213 vs float64 875213.0 is
        # a FAIL there (DuckDB HUGEINT→float64 class of bug). Mirror that:
        # a numeric dtype mismatch is an error even when the values coincide.
        if (s_float and o_int) or (s_int and o_float):
            issues.append(f"col {c}: dtype mismatch spark={sv.dtype} oracle={ov.dtype} "
                          "(driver hash would fail even on equal values)")
            continue
        if s_float or o_float:
            sv = pd.to_numeric(sv, errors="coerce").astype(float)
            ov = pd.to_numeric(ov, errors="coerce").astype(float)
            neq = ~((sv == ov) | (sv.isna() & ov.isna()))
        else:
            neq = ~((sv == ov) | (sv.isna() & ov.isna()))
        n = int(neq.sum())
        if n:
            i = neq.idxmax()
            issues.append(f"col {c}: {n} diffs, first at row {i}: spark={s[c][i]!r} oracle={o[c][i]!r}")
    return issues

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle_sql = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    all_query_dirs = sorted(d for d in os.listdir(out_dir)
                            if os.path.isdir(os.path.join(out_dir, d)))
    for name in all_query_dirs:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            results[name] = ["NO SPARK OUTPUT"]
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle_sql:
            results[name] = [f"rows-only: {len(spark_df)} rows" + (" (EMPTY!)" if len(spark_df) == 0 else "")]
            continue
        try:
            oracle_df = con.execute(oracle_sql[name]).fetchdf()
        except Exception as e:
            results[name] = [f"ORACLE SQL ERROR: {e}"]
            continue
        try:
            results[name] = compare(name, spark_df, oracle_df)
        except Exception as e:
            results[name] = [f"COMPARE ERROR: {e}"]
    npass = 0
    for name in sorted(results):
        issues = results[name]
        if not issues or (len(issues) == 1 and issues[0].startswith("rows-only") and "EMPTY" not in issues[0]):
            npass += 1
            print(f"PASS  {name}" + (f"  [{issues[0]}]" if issues else ""))
        else:
            print(f"FAIL  {name}")
            for i in issues[:4]:
                print(f"      {i}")
    print(f"\n{npass}/{len(results)} pass")
    return 0 if npass == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
