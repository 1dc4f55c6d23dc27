#!/usr/bin/env python3
"""Compare two Verify output dirs query-by-query (canonical row sets).

Usage: python3 tools/diffdirs.py <dirA> <dirB> [q1,q2,...]

For each query dir present in BOTH (or the given subset), load both parquet
results, sort columns by name and rows by value, and compare cell-by-cell —
the same canonicalization as tools/compare.py, but Spark-vs-Spark: the fast
equality check for "this optimization changed no result".
"""
import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(__file__))
from compare import canon  # noqa: E402


def main(a: str, b: str, only=None) -> int:
    names = sorted(set(os.listdir(a)) & set(os.listdir(b)))
    names = [n for n in names if os.path.isdir(os.path.join(a, n))]
    if only:
        names = [n for n in names if n in only]
    n_ok = n_bad = 0
    for name in names:
        try:
            da = canon(pd.read_parquet(os.path.join(a, name)))
            db = canon(pd.read_parquet(os.path.join(b, name)))
        except Exception as e:
            print(f"FAIL {name}: read error {e}")
            n_bad += 1
            continue
        if list(da.columns) != list(db.columns):
            print(f"FAIL {name}: columns {list(da.columns)} vs {list(db.columns)}")
            n_bad += 1
        elif len(da) != len(db):
            print(f"FAIL {name}: rows {len(da)} vs {len(db)}")
            n_bad += 1
        elif not da.equals(db):
            diff = (da != db).any(axis=1)
            i = int(diff.idxmax())
            print(f"FAIL {name}: values differ, first row {i}:")
            print("  A:", da.iloc[i].to_dict())
            print("  B:", db.iloc[i].to_dict())
            n_bad += 1
        else:
            print(f"OK   {name} ({len(da)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], only))
