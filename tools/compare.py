#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB with the
sf tables registered as views, loads the corresponding Spark parquet
result, sorts columns by name + rows by all columns, and compares.
NOT shipped library code — dev tooling only.
"""
import sys, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    import os
    for t in TABLES:
        # partial dirs (e.g. the x10 amplified corpus) carry a table subset
        if os.path.exists(f"{sfdir}/{t}.parquet"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        try:
            odf = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failed.append(name); continue
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark result parquet")
            failed.append(name); continue
        sdf = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if sorted(sdf.columns) != sorted(odf.columns):
            print(f"FAIL {name}: columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
            failed.append(name); continue
        a, b = norm(sdf), norm(odf)
        if len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} oracle={len(b)}")
            failed.append(name); continue
        # dtype check (driver checks schema): warn only
        dt_mismatch = [(c, str(a[c].dtype), str(b[c].dtype))
                       for c in a.columns if str(a[c].dtype) != str(b[c].dtype)]
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
            status = "PASS"
        except AssertionError as e:
            status = None
            print(f"FAIL {name}: value mismatch\n{str(e)[:600]}")
            diff = (a != b)
            for c in a.columns:
                if diff[c].any():
                    i = diff[c].idxmax()
                    print(f"  first diff col={c} row={i}: spark={a[c][i]!r} oracle={b[c][i]!r}")
            failed.append(name)
        if status:
            extra = f" (dtype warn: {dt_mismatch})" if dt_mismatch else ""
            print(f"PASS {name}: {len(a)} rows{extra}")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} passed")
    sys.exit(1 if failed else 0)

if __name__ == "__main__":
    main()
