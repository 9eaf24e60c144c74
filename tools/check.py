#!/usr/bin/env python3
"""Dev-only local mirror of the driver's correctness gate.

Runs DuckDB oracle SQL from <outDir>/oracle_sql.json against the testdata
parquet tables, compares to the Spark results Verify wrote to
<outDir>/<name>/ (parquet), and prints per-query match status.

Usage: python3 tools/check.py <sfDir> <outDir>
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize value representations a bit before comparing
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                              type(v).__name__ == "ndarray" else v)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    failures = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        got = norm(con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf())
        try:
            want = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failures += 1
            continue
        # row-order-insensitive compare (driver may or may not sort rows;
        # we sort by all columns to be safe)
        g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        w = want.sort_values(by=list(want.columns)).reset_index(drop=True)
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                          check_exact=True)
            print(f"OK   {name} ({len(got)} rows)")
        except AssertionError as e:
            failures += 1
            print(f"FAIL {name}: value mismatch\n{str(e)[:1200]}")
            diff = g.compare(w) if g.shape == w.shape else None
            if diff is not None and not diff.empty:
                print(diff.head(10))
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
