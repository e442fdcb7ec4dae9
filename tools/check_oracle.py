#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/<name>/ parquet (Spark output) and
<verifyOutDir>/oracle_sql.json, registers the sfDir tables as DuckDB
views under bare names, runs each oracle, and compares: schema (column
names sorted), row count, and exact values after sorting columns by
name (both row-order-sensitive and row-sorted comparisons reported).
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for compare
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    return df.reset_index(drop=True)

def eq_cell(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        return list(a) == list(b)
    return a == b

def compare(name, spark_df, oracle_df):
    s, o = norm(spark_df), norm(oracle_df)
    issues = []
    if list(s.columns) != list(o.columns):
        issues.append(f"SCHEMA mismatch: spark={list(s.columns)} oracle={list(o.columns)}")
        return issues
    if len(s) != len(o):
        issues.append(f"ROWCOUNT mismatch: spark={len(s)} oracle={len(o)}")
        return issues
    # row-order-sensitive compare
    mism = 0
    first = None
    for i in range(len(s)):
        for c in s.columns:
            if not eq_cell(s[c].iloc[i], o[c].iloc[i]):
                mism += 1
                if first is None:
                    first = (i, c, s[c].iloc[i], o[c].iloc[i])
                break
    if mism:
        issues.append(f"VALUES mismatch in {mism}/{len(s)} rows; first at row {first[0]} col {first[1]}: spark={first[2]!r} oracle={first[3]!r}")
    return issues

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        except duckdb.Error:
            pass
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        try:
            oracle_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        issues = compare(name, spark_df, oracle_df)
        if issues:
            print(f"FAIL {name}: " + "; ".join(issues))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
