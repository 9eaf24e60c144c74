#!/usr/bin/env bash
# Environment-drift probe — the r10 "is it the box or the code?"
# experiment as one command.
#
# Rebuilds an UNCHANGED past tree from its own commit in a throwaway
# git worktree, benches it on today's box, benches the CURRENT tree,
# and prints both steady per-query means plus the ratio. If the old
# tree's mean moved by ~the same factor as the current tree's, the
# drift is environmental (the r10 conclusion: the unchanged r8 tree
# rebuilt today landed inside the r10 band); if only the current tree
# moved, it's the code.
#
# Usage: tools/envprobe.sh <commit> [sfDir]
#   commit  git rev of the control tree (e.g. the last round's bench tag)
#   sfDir   testdata dir (default /root/testdata/sf0.1)
#
# Notes:
#  - runs the two benches SEQUENTIALLY on an otherwise-idle box; treat
#    results like any bench artifact (check load/steal fields).
#  - the control bench runs THAT tree's Bench main over THAT tree's
#    registry; per-query comparison only makes sense over the shared
#    query set, which the summary handles by comparing each tree's own
#    steady mean (total_steady / n_queries), the same normalization
#    SCALING.md's drift sections use.
set -euo pipefail

COMMIT="${1:?usage: tools/envprobe.sh <commit> [sfDir]}"
SF_DIR="${2:-/root/testdata/sf0.1}"
REPO_ROOT="$(git rev-parse --show-toplevel)"
WT="$(mktemp -d /tmp/envprobe-XXXX)"
trap 'git -C "$REPO_ROOT" worktree remove --force "$WT" 2>/dev/null || true; rm -rf "$WT"' EXIT

bench_tree() { # $1 = tree dir, $2 = label
  # Bench prints TWO metric lines — the full artifact (with the
  # queries_steady map) and a compact totals line; keep the longest
  ( cd "$1" &&
    SPARK_GRAFT_SF_DIR="$SF_DIR" sbt -batch "runMain graft.Bench" 2>&1 |
      grep '"metric"' | awk '{ print length, $0 }' | sort -rn |
      head -1 | cut -d' ' -f2- ) |
  python3 -c "
import json, sys
line = sys.stdin.readline().strip()
d = json.loads(line)
qs = d.get('queries_steady') or d.get('queries') or {}
n = len(qs) or 1
tot = sum(qs.values())
print(json.dumps({'label': '$2', 'n_queries': len(qs),
  'steady_total_s': round(tot, 2), 'steady_mean_s': round(tot / n, 4),
  'contended': d.get('contended'), 'steal_pct': d.get('steal_pct')}))
print(line, file=sys.stderr)
"
}

echo "[envprobe] building control tree $COMMIT in $WT" >&2
git -C "$REPO_ROOT" worktree add --detach "$WT" "$COMMIT" >&2

CONTROL=$(bench_tree "$WT" "control:$COMMIT")
CURRENT=$(bench_tree "$REPO_ROOT" "current:$(git -C "$REPO_ROOT" rev-parse --short HEAD)")

python3 -c "
import json, sys
control, current = json.loads('''$CONTROL'''), json.loads('''$CURRENT''')
ratio = current['steady_mean_s'] / max(control['steady_mean_s'], 1e-9)
print(json.dumps(control))
print(json.dumps(current))
print(json.dumps({'metric': 'envprobe',
  'current_over_control_mean': round(ratio, 3),
  'reading': 'compare each mean to its own historical sample: if BOTH '
    'moved together vs their recorded rounds, the box moved; if only '
    'current did, the code did'}))
"
