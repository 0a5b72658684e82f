#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/crosscheck.py <sfDir> <verifyOutDir>

Registers each <sfDir>/*.parquet as a DuckDB view, runs every SQL in
<verifyOutDir>/oracle_sql.json, and compares against the Spark result
parquet dumped by graft.Verify — column names sorted, rows sorted, values
hashed — reporting per-query match/mismatch with a diff preview.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: ints -> int64 (nullable), floats -> float64, rest -> str
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64").round(9)
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("Int64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype("datetime64[us]")
        else:
            out[c] = s.astype("string")
    df = pd.DataFrame(out)
    return df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    failures = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        spark_df = pd.concat([pd.read_parquet(p) for p in glob.glob(f"{d}/*.parquet")],
                             ignore_index=True)
        if name not in oracles:
            print(f"[rows-only] {name}: rows={len(spark_df)}"
                  + (" EMPTY!" if len(spark_df) == 0 else ""))
            continue
        try:
            duck_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"[FAIL-sql ] {name}: oracle SQL error: {e}")
            failures += 1
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"[FAIL-cols] {name}: spark={list(a.columns)} duck={list(b.columns)}")
            failures += 1
            continue
        if len(a) != len(b):
            print(f"[FAIL-rows] {name}: spark={len(a)} duck={len(b)}")
            failures += 1
            continue
        if not a.equals(b):
            neq = (a != b) & ~(a.isna() & b.isna())
            bad = neq.any(axis=1)
            print(f"[FAIL-vals] {name}: {bad.sum()}/{len(a)} differing rows")
            print("  spark:", a[bad].head(3).to_dict("records"))
            print("  duck :", b[bad].head(3).to_dict("records"))
            failures += 1
            continue
        print(f"[OK       ] {name}: {len(a)} rows x {len(a.columns)} cols")
    print(f"\n{'ALL MATCH' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
