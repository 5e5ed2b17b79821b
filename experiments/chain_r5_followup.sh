#!/bin/bash
# Post-4M follow-up chip lanes, strictly serial (launched only after
# chain_r5_final.sh prints CHAIN_DONE).
#  1. GIST-200k x 960-d int8 packed-tier A/B (VERDICT r4 #9 — r4 committed
#     an empty artifact; the donated-cache fix makes the sweep runnable)
#  2. sparse-24k sweep extension to ef 200/400 (higher-recall points)
#  3. sparse-24k ZIPF lane — power-law indices (lexical sparsity), the
#     distribution sparse search actually serves; uniform-random nnz32/4096
#     is a near-worst case (78% of pairs share no index)
set -x
cd /root/repo
export JAX_PLATFORMS=axon,cpu

for try in 1 2; do
  timeout 3000 python experiments/watchdog_run.py python experiments/lane_gist_int8.py \
    >> /tmp/lane_gist_int8.log 2>&1 && break
done

LANE_N=24576 LANE_EFS=40,100,200,400 \
  LANE_OUT=/root/repo/experiments/results/lane_sparse24k_r5.json \
  timeout 1800 python experiments/watchdog_run.py python experiments/lane_sparse1m.py \
  >> /tmp/lane_sparse24k_ext.log 2>&1

for try in 1 2; do
  LANE_N=24576 LANE_DIST=zipf LANE_EFS=40,100,200 \
    LANE_OUT=/root/repo/experiments/results/lane_sparse24k_zipf_r5.json \
    timeout 2400 python experiments/watchdog_run.py python experiments/lane_sparse1m.py \
    >> /tmp/lane_sparse24k_zipf.log 2>&1 && break
done

echo FOLLOWUP_DONE
