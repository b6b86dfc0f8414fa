#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness pass.

Usage: tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<query>/ parquet (Spark result) and runs the
matching SQL from oracle_sql.json in DuckDB over <sfDir>/*.parquet tables,
then compares values with columns sorted by name (mirrors the driver).
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_rowsonly = 0
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = qdir.rstrip("/").split("/")[-1]
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"FAIL  {name}: no spark output"); n_fail += 1; continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if name not in oracle:
            status = "ROWS " if len(got) > 0 else "EMPTY"
            print(f"{status} {name}: rows={len(got)} (no oracle)")
            n_rowsonly += 1
            continue
        try:
            want = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}"); n_fail += 1; continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL  {name}: columns {list(g.columns)} != {list(w.columns)}")
            n_fail += 1; continue
        if len(g) != len(w):
            print(f"FAIL  {name}: rows {len(g)} != {len(w)}")
            n_fail += 1; continue
        try:
            # dtype-strict: the driver hashes typed values, so a DuckDB
            # HUGEINT vs Spark int64 mismatch must fail here too.
            pd.testing.assert_frame_equal(g, w, check_dtype=True,
                                          check_exact=True)
            print(f"PASS  {name}: rows={len(g)}")
            n_pass += 1
        except AssertionError as e:
            msg = str(e).split("\n")[0:3]
            print(f"FAIL  {name}: values differ: {' / '.join(msg)}")
            # show first differing rows for debugging
            neq = (g != w) & ~(g.isna() & w.isna())
            bad = neq.any(axis=1)
            if bad.any():
                i = bad.idxmax()
                print(f"      first diff row {i}:\n  got:  {g.loc[i].to_dict()}\n  want: {w.loc[i].to_dict()}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
