#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables and diff against Verify's parquet dumps.
Driver-side tooling only — NOT part of the Spark library."""
import duckdb, glob, json, sys

import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        try:
            exp = con.execute(oracle[name]).fetchdf()
            files = glob.glob(f"{outdir}/{name}/*.parquet")
            if not files:
                print(f"{name:28s} MISSING spark output"); n_bad += 1; continue
            got = duckdb.connect().execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            exp = exp[sorted(exp.columns)].reset_index(drop=True)
            got = got[sorted(got.columns)].reset_index(drop=True)
            if list(exp.columns) != list(got.columns):
                print(f"{name:28s} SCHEMA exp={list(exp.columns)} got={list(got.columns)}")
                n_bad += 1; continue
            if exp.shape != got.shape:
                print(f"{name:28s} ROWS exp={exp.shape} got={got.shape}"); n_bad += 1; continue
            diff_cols = []
            for c in exp.columns:
                a, b = exp[c], got[c]
                try:
                    same = (a.isna() == b.isna()).all() and (a.dropna().astype(str).values == b.dropna().astype(str).values).all()
                except Exception:
                    same = False
                if not same:
                    diff_cols.append(c)
            if diff_cols:
                print(f"{name:28s} DIFF cols={diff_cols}")
                for c in diff_cols[:2]:
                    mask = ~((exp[c].isna() & got[c].isna()) | (exp[c].astype(str) == got[c].astype(str)))
                    print(pd.concat([exp[mask].head(3).add_prefix("exp_"),
                                     got[mask].head(3).add_prefix("got_")], axis=1).to_string())
                n_bad += 1
            else:
                print(f"{name:28s} OK rows={len(exp)}"); n_ok += 1
        except Exception as e:
            print(f"{name:28s} ERROR {type(e).__name__}: {e}"); n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
