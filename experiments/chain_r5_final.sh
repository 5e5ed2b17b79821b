#!/bin/bash
# Round-5 final chip chain: strictly serial TPU lanes (two concurrent
# clients wedge the axon tunnel — NOTES.md r5).
#  1. sparse-24k sweep from the /tmp/lane_sparse_ckpt checkpoint (the
#     build finished in the prior session; the sweep crashed the worker on
#     the merge-join gather — now rides the densified-query scorer)
#  2. 4M x 128-d HNSW lane at its own capacity (GT + build + ckpt + sweep)
set -x
cd /root/repo
export JAX_PLATFORMS=axon,cpu

for try in 1 2; do
  LANE_N=24576 LANE_OUT=/root/repo/experiments/results/lane_sparse24k_r5.json \
    timeout 2400 python experiments/watchdog_run.py python experiments/lane_sparse1m.py \
    >> /tmp/lane_sparse24k_sweep.log 2>&1 && break
done

for try in 1 2 3; do
  LANE_N=4194304 LANE_OUT=/root/repo/experiments/results/lane_4m_hnsw_r5.json \
    timeout 7200 python experiments/watchdog_run.py python experiments/lane_10m_hnsw.py \
    >> /tmp/lane_4m.log 2>&1 && break
done

echo CHAIN_DONE
