#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (dev tool only —
not part of the shipped library). Reads the Verify.scala output dir,
runs each oracle SQL in DuckDB over the same sf dir, and compares
row-hashes the way the driver describes: columns sorted by name,
rows sorted, values hashed.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize types: ints as int64 where possible, floats as repr
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    rows = sorted(df.astype(str).values.tolist())
    return rows

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output"); n_fail += 1; continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files])
        if name not in oracles:
            ok = len(spark_df) > 0
            print(f"{'pass' if ok else 'FAIL'} {name}: rows-only ({len(spark_df)} rows)")
            n_pass += ok; n_fail += (not ok); continue
        try:
            duck_df = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        a, b = canon(spark_df), canon(duck_df)
        if a == b:
            print(f"pass {name}: {len(a)} rows hash-match"); n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: spark {len(a)} rows vs duck {len(b)} rows")
            for i, (ra, rb) in enumerate(zip(a, b)):
                if ra != rb:
                    print(f"  first diff row {i}:\n    spark {ra}\n    duck  {rb}")
                    break
            if len(a) != len(b):
                only_a = [r for r in a if r not in b][:2]
                only_b = [r for r in b if r not in a][:2]
                print(f"    only-spark: {only_a}\n    only-duck:  {only_b}")
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
