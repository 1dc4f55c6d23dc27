#!/usr/bin/env python3
"""Local proxy for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: load the Spark parquet result, run the
matching oracle SQL (from oracle_sql.json) in DuckDB against the sfDir tables,
sort columns by name, sort rows, and compare cell-by-cell (exact string repr
after float normalization). Mirrors "sorts columns by name before hashing".
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: everything to python objects with float normalization
    def norm(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "NULL"
            return repr(v)
        if isinstance(v, (list, tuple)) or str(type(v)).find("ndarray") >= 0:
            return "[" + ",".join(norm(x) for x in v) + "]"
        if pd.isna(v):
            return "NULL"
        return str(v)

    out = df.copy()
    for c in out.columns:
        out[c] = out[c].map(norm)
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark result missing ({e})")
            n_bad += 1
            continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_bad += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns spark={list(g.columns)} oracle={list(e.columns)}")
            n_bad += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(e)}")
            n_bad += 1
            continue
        if not g.equals(e):
            diff = (g != e)
            bad_cols = [c for c in g.columns if diff[c].any()]
            idx = diff.any(axis=1)
            i = int(idx.idxmax())
            print(f"FAIL {name}: values differ in cols {bad_cols}; first row {i}:")
            print("  spark :", g.iloc[i].to_dict())
            print("  oracle:", e.iloc[i].to_dict())
            n_bad += 1
            continue
        print(f"OK   {name} ({len(g)} rows)")
        n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
