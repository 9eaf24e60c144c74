#!/usr/bin/env bash
# Repeatable sf1 WIDTH gate (r14 — the r13 verdict's task 6): re-runs
# the width-sensitive oracle subset at 10× sf0.1 each round, so a
# decimal/double boundary crossing (the class the one-shot r13 full
# pass caught on q1_agg's 2^53 sum) surfaces the round it appears
# instead of at 100 TB. The subset is the docs/SF1_GATE.md list:
# exact-decimal money sums (q1/q5), Q20 fixed-point sums (E11/E12/I8),
# DECIMAL token quotas (H6c), and the KMV/CMS/hist estimator rollups.
# r15 adds the banded-store rows (the r14 verdict's task 7): the
# persisted banded leg and the frozen-cont AUTO dispatch — the default
# 100 TB scale machinery — re-verify at sf1 width every round (bits
# ladder rungs only move with block size, so sf1 is where a rung
# boundary would first show).
# r16 adds the store APPEND family (the r15 verdict's task 5): the
# append paths' cursor arithmetic, batch_id folds and count sums are
# width-class code the width-sensitive subset never exercised —
# bm25/lm/pq/dsir/ann-index append rows now re-verify at sf1 width.
#
# Usage: tools/sf1_gate.sh [sf1Dir] [outDir]   (~12 min engine side +
# DuckDB oracle time, I8 dominating; regenerates the corpus if absent)
set -euo pipefail
cd "$(dirname "$0")/.."
SUBSET=q1_agg,q5_multijoin,token_entropy,doc_kl,mix_sources_tokens,metrics_kmv,metrics_kmv_rollup,metrics_cms,metrics_cms_rollup,metrics_cms_estimate,metrics_hist_rollup,hist_store_rollup,kmv_store_estimate,cms_store_estimate,doc_similarity,dedup_incremental_embedding_banded,dedup_incremental_embedding_auto,ann_index_append_search,bm25_index_append_search,lm_index_append_score,pq_index_append_search,dsir_store_append_score
SF1=${1:-testdata_sf1}
OUT=${2:-/tmp/sf1_gate_out}
[ -d "$SF1" ] || python3 tools/gen_sf.py /root/testdata/sf0.1 "$SF1" 10
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  sbt -batch "runMain graft.Verify $SF1 $OUT $SUBSET"
python3 tools/check.py "$SF1" "$OUT" "$SUBSET"
