#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's t2 correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL and diff. Not part of the shipped library."""
import json
import sys
import glob
import os

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"[MISS] {name}: no spark output")
            n_bad += 1
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"[ORACLE-ERR] {name}: {e}")
            n_bad += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        # driver sorts columns by name before hashing values
        exp = exp.reindex(sorted(exp.columns), axis=1).reset_index(drop=True)
        got = got.reindex(sorted(got.columns), axis=1).reset_index(drop=True)
        if list(exp.columns) != list(got.columns):
            print(f"[SCHEMA] {name}: oracle={list(exp.columns)} spark={list(got.columns)}")
            n_bad += 1
            continue
        if len(exp) != len(got):
            print(f"[ROWS] {name}: oracle={len(exp)} spark={len(got)}")
            n_bad += 1
            continue
        diff_cols = []
        for c in exp.columns:
            a, b = exp[c], got[c]
            try:
                same = (a.astype(str).values == b.astype(str).values)
            except Exception:
                same = a.values == b.values
            if not same.all():
                idx = int((~same).argmax())
                diff_cols.append((c, idx, a.iloc[idx], b.iloc[idx]))
        if diff_cols:
            c, idx, ev, gv = diff_cols[0]
            print(f"[DIFF] {name}: col={c} row={idx} oracle={ev!r} spark={gv!r} "
                  f"({len(diff_cols)} cols differ)")
            n_bad += 1
        else:
            print(f"[OK]   {name} ({len(exp)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    sys.exit(main(sf, out))
