#!/bin/bash
# Round-5 session-7 chip chain, take 2.  The 10M build at wave 2048 /
# efc 64 measured ~0.75 waves/s steady (ETA ~108 min) — running it first
# would have squeezed sparse-1M (missing three rounds) out again.  New
# order: bounded lanes first, the 10M build last with efc=40 (legal
# floor is 2m=32) so its sweep still lands before the session ends.
# The 10M exact-GT milestone from take 1 persists at /tmp/lane10m_gt.npy.
set -u
cd /root/repo

echo "=== sparse 1M lane (VERDICT r4 #4) at $(date) ==="
for attempt in 1 2; do
  LANE_OUT=/root/repo/experiments/results/lane_sparse1m_r5.json \
    timeout 4500 python experiments/watchdog_run.py \
    python experiments/lane_sparse1m.py && break
  echo "=== sparse attempt $attempt rc=$? — retrying from milestones ==="
done
echo "=== sparse done at $(date) ==="

echo "=== device-only latency lane (VERDICT r4 #7) at $(date) ==="
LAT_OUT=/root/repo/experiments/results/lane_latency_r5.json \
LAT_CKPT=/root/repo/.bench_cache/hnsw_n1000000_clustered_m16_efc64_exp4_w1024 \
  timeout 1500 python experiments/watchdog_run.py \
  python experiments/lane_device_latency.py
echo "=== latency rc=$? at $(date) ==="

echo "=== gist int8 A/B lane (VERDICT r4 #9) at $(date) ==="
timeout 2100 python experiments/watchdog_run.py \
  python experiments/lane_gist_int8.py
echo "=== int8 rc=$? at $(date) ==="
python experiments/aggregate_r5.py

echo "=== 10M HNSW lane (wave 2048, efc 40) at $(date) ==="
for attempt in 1 2; do
  LANE_OUT=/root/repo/experiments/results/lane_10m_hnsw_r5.json \
  LANE_WAVE=2048 LANE_EFC=40 \
    timeout 7200 python experiments/watchdog_run.py \
    python experiments/lane_10m_hnsw.py && break
  echo "=== 10M attempt $attempt rc=$? — retrying from milestones ==="
done
echo "=== 10M done at $(date) ==="

python experiments/aggregate_r5.py
echo "=== chain complete at $(date) ==="
