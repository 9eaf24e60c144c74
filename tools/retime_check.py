#!/usr/bin/env python3
"""Quiet-window gate for Bench artifacts (r16 — the r15 verdict's
task 6: r15's retime windows b/c ran at load 5-8 and polluted the
per-query medians, producing a false ann_index regression alarm; the
bench's own self-defense gates TOTALS, not the per-query rows a
round-over-round diff reads).

Two modes:

  retime_check.py <bench.json>
      Exit 0 iff the window is QUIET end-to-end: contended=false,
      every per-pass steal (warmup/cold/steady) < the threshold
      (default 0.1%, env RETIME_MAX_STEAL_PCT), load_avg_start under
      the bench's own threshold, and zero failed queries. A rejected
      window prints why.

  retime_check.py --cov <clean1.json> <clean2.json> ...
      Per-query steady-pass coefficient of variation across the kept
      windows. Prints every row with CoV >= 10% and exits nonzero if
      any STORE row (the *_store_*/*_index_*/incremental family — the
      rows the r15 false alarm hit) exceeds it, i.e. "three windows
      whose per-query CoV < 10% on the store rows" is the done bar.
"""
import json
import math
import os
import sys


def load(path):
    with open(path) as f:
        return json.loads(f.read())


def check_window(path):
    a = load(path)
    thr = float(os.environ.get("RETIME_MAX_STEAL_PCT", "0.1"))
    env = a.get("env", {})
    bad = []
    if a.get("contended", True):
        bad.append("contended=true")
    for p in ("warmup", "cold", "steady"):
        s = env.get(f"steal_pct_{p}", 99.0)
        if s >= thr:
            bad.append(f"steal_{p}={s}%>={thr}%")
    if a.get("errors"):
        bad.append(f"errors={a['errors']}")
    if bad:
        print(f"REJECT {path}: {', '.join(bad)}")
        return False
    print(f"KEEP {path}: steady_total={a.get('steady_total', 0):.1f}s "
          f"steals w/c/s="
          f"{env.get('steal_pct_warmup')}/{env.get('steal_pct_cold')}/"
          f"{env.get('steal_pct_steady')}%")
    return True


def is_store_row(name):
    return ("_store_" in name or "_index_" in name or
            "incremental" in name or name.startswith("shards_") or
            name.startswith("pack_store"))


def cov_report(paths):
    runs = [load(p) for p in paths]
    names = sorted(set.intersection(
        *[set(r.get("queries_steady", {})) for r in runs]))
    worst_store = 0.0
    offenders = []
    for n in names:
        vals = [r["queries_steady"][n] for r in runs]
        m = sum(vals) / len(vals)
        if m <= 0:
            continue
        sd = math.sqrt(sum((v - m) ** 2 for v in vals) / len(vals))
        cov = sd / m
        if is_store_row(n):
            worst_store = max(worst_store, cov)
        if cov >= 0.10:
            offenders.append((cov, n, m, vals))
    offenders.sort(reverse=True)
    for cov, n, m, vals in offenders:
        tag = "STORE" if is_store_row(n) else "     "
        print(f"CoV {cov * 100:5.1f}% {tag} {n}: mean {m:.2f}s "
              f"{['%.2f' % v for v in vals]}")
    store_off = [o for o in offenders if is_store_row(o[1])]
    print(f"windows={len(runs)} queries={len(names)} "
          f"cov>=10%: {len(offenders)} total, {len(store_off)} store; "
          f"worst store CoV {worst_store * 100:.1f}%")
    return 1 if store_off else 0


def main():
    args = sys.argv[1:]
    if not args:
        print(__doc__)
        return 2
    if args[0] == "--cov":
        return cov_report(args[1:])
    return 0 if check_window(args[0]) else 1


if __name__ == "__main__":
    sys.exit(main())
