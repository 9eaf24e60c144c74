#!/usr/bin/env python3
"""Dev-only fuzz for the G14 portable fixed-point log2.

The engine's claim is that graft.expressions.Log2FixImpl.log2q20 (JVM,
also codegen'd into queries) and Portable.sql.log2CteSql (the DuckDB
recursive-CTE mirror the oracles use) compute the SAME pure-int64
digit recurrence bit-for-bit. The oracle gate only exercises the values
the 97 queries happen to produce; this fuzz drives both sides over
random int64s across the full positive range plus the edge band
(1..64, powers of two, Long.MaxValue neighborhood).

Usage: python3 tools/log2_fuzz.py [n_random=20000] [seed=8]
"""
import random
import sys

import duckdb

FRAC = 20


def log2q20_py(x: int) -> int:
    """Line-for-line mirror of Log2FixImpl.log2q20 (arbitrary-precision
    ints behave identically because every intermediate fits int64)."""
    assert x > 0
    e = x.bit_length() - 1
    y = (x << (30 - e)) if e <= 30 else (x >> (e - 30))
    acc = 0
    for _ in range(FRAC):
        y2 = y * y
        if y2 >= (1 << 61):
            acc = 2 * acc + 1
            y = y2 >> 31
        else:
            acc = 2 * acc
            y = y2 >> 30
    return (e << FRAC) + acc


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rng = random.Random(seed)
    vals = set(range(1, 65))
    vals |= {1 << k for k in range(63)}
    vals |= {(1 << 63) - 1 - d for d in range(8)}
    # log-uniform random draw so small and huge magnitudes both appear
    while len(vals) < n:
        bits = rng.randrange(1, 64)
        vals.add(rng.randrange(1 << (bits - 1), 1 << bits))
    vals = sorted(vals)

    con = duckdb.connect()
    con.execute("CREATE TABLE loginputs(val BIGINT)")
    con.executemany("INSERT INTO loginputs VALUES (?)",
                    [(v,) for v in vals])
    # the same CTE fragment shape Portable.sql.log2CteSql emits
    rows = con.sql(f"""
      WITH RECURSIVE steps(val, i, y, acc) AS (
        SELECT val, 0,
          CASE WHEN length(bin(val)) - 1 <= 30
               THEN val << (30 - (length(bin(val)) - 1))
               ELSE val >> ((length(bin(val)) - 1) - 30) END,
          0::BIGINT
        FROM loginputs
        UNION ALL
        SELECT val, i + 1,
          CASE WHEN y*y >= (1::BIGINT << 61) THEN (y*y) >> 31
               ELSE (y*y) >> 30 END,
          CASE WHEN y*y >= (1::BIGINT << 61) THEN 2*acc + 1
               ELSE 2*acc END
        FROM steps WHERE i < {FRAC}),
      logs AS (
        SELECT val,
          ((length(bin(val)) - 1)::BIGINT << {FRAC}) + acc AS log2_q20
        FROM steps WHERE i = {FRAC})
      SELECT val, log2_q20 FROM logs ORDER BY val
    """).fetchall()

    assert len(rows) == len(vals), (len(rows), len(vals))
    bad = [(v, got, log2q20_py(v)) for v, got in rows
           if got != log2q20_py(v)]
    for v, got, want in bad[:10]:
        print(f"MISMATCH val={v} duckdb={got} jvm-mirror={want}")
    print(f"{'FAIL' if bad else 'OK'}: {len(vals)} values, "
          f"{len(bad)} mismatches")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
