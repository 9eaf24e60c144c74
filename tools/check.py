#!/usr/bin/env python3
"""Dev-only local mirror of the driver's correctness gate.

Runs DuckDB oracle SQL from <outDir>/oracle_sql.json against the testdata
parquet tables, compares to the Spark results Verify wrote to
<outDir>/<name>/ (parquet), and prints per-query match status.

Mirrors the driver faithfully (round-2 lesson): columns sorted by name,
rows sorted by all columns, then a dtype-sensitive per-row hash
(pd.util.hash_pandas_object). int64 vs float64 (e.g. DuckDB HUGEINT from
SUM(BIGINT)) is a FAILURE here even when values are numerically equal.

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


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # tz-aware (Spark TimestampType) vs naive (DuckDB) timestamps hash to
    # the same i8 epoch in the driver; normalize so sorting+hashing agree.
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64") and getattr(
                df[c].dtype, "tz", None) is not None:
            df[c] = df[c].dt.tz_localize(None)
    return df.reset_index(drop=True)


def row_hashes(df: pd.DataFrame):
    s = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return pd.util.hash_pandas_object(s, index=False).values, s


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    failures = 0
    errs_path = os.path.join(out_dir, "verify_errors.json")
    errs = {}
    if os.path.exists(errs_path):
        # every Verify-side failure is a gate failure, including for
        # oracle-less queries that would otherwise dodge the
        # "no spark output" branch below (review finding: an ERR line
        # with rc 0 re-opens the round-7 silent-shrink gap)
        errs = json.load(open(errs_path))
        for name, msg in sorted(errs.items()):
            print(f"ERR  {name}: {msg[:200]}")
            if name not in oracle:
                failures += 1
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    for name, sql in sorted(oracle.items()):
        if only is not None and name not in only:
            continue
        if name in errs:
            # an ERR name with an oracle must fail HERE, before any
            # parquet lookup: a reused outDir can carry stale output
            # from a prior run that would otherwise compare OK
            print(f"FAIL {name}: verify-side error (any output is stale)")
            failures += 1
            continue
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        got = canon(pd.read_parquet(files))
        try:
            want = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != "
                  f"{list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failures += 1
            continue
        try:
            hg, g = row_hashes(got)
            hw, w = row_hashes(want)
        except Exception as e:
            print(f"FAIL {name}: unsortable/unhashable output: {e!r:.300}")
            failures += 1
            continue
        if (hg == hw).all():
            print(f"OK   {name} ({len(got)} rows)")
            continue
        failures += 1
        print(f"FAIL {name}: hash mismatch")
        for c in g.columns:
            if str(g[c].dtype) != str(w[c].dtype):
                print(f"  dtype {c}: spark={g[c].dtype} oracle={w[c].dtype}")
        bad = (hg != hw).nonzero()[0][:5]
        for i in bad:
            print(f"  row {i}:\n   spark  {g.iloc[i].to_dict()}"
                  f"\n   oracle {w.iloc[i].to_dict()}")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
