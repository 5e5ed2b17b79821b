#!/bin/bash
# Round-5 session-7 chip chain, strictly serial (two TPU clients wedge the
# axon tunnel — BENCH_NOTES.md).  Order: 10M first (longest unbounded
# phase; r4 landed zero serving numbers because it started too late),
# then sparse-1M (VERDICT #4, missing three rounds), then the two short
# evidence lanes.  Every lane saves incrementally and resumes from /tmp
# milestones; the watchdog kills+retries a wedged worker.
set -u
cd /root/repo

echo "=== 10M HNSW lane (wave 2048 per lane_wave_ab) at $(date) ==="
for attempt in 1 2; do
  LANE_OUT=/root/repo/experiments/results/lane_10m_hnsw_r5.json \
  LANE_WAVE=2048 \
    timeout 7800 python experiments/watchdog_run.py \
    python experiments/lane_10m_hnsw.py && break
  echo "=== 10M attempt $attempt rc=$? — retrying from milestones ==="
done
echo "=== 10M done at $(date) ==="

echo "=== sparse 1M lane (VERDICT r4 #4) at $(date) ==="
for attempt in 1 2; do
  LANE_OUT=/root/repo/experiments/results/lane_sparse1m_r5.json \
    timeout 4800 python experiments/watchdog_run.py \
    python experiments/lane_sparse1m.py && break
  echo "=== sparse attempt $attempt rc=$? — retrying from milestones ==="
done
echo "=== sparse done at $(date) ==="

echo "=== device-only latency lane (VERDICT r4 #7) at $(date) ==="
LAT_OUT=/root/repo/experiments/results/lane_latency_r5.json \
LAT_CKPT=/root/repo/.bench_cache/hnsw_n1000000_clustered_m16_efc64_exp4_w1024 \
  timeout 1800 python experiments/watchdog_run.py \
  python experiments/lane_device_latency.py
echo "=== latency rc=$? at $(date) ==="

echo "=== gist int8 A/B lane (VERDICT r4 #9) at $(date) ==="
timeout 2400 python experiments/watchdog_run.py \
  python experiments/lane_gist_int8.py
echo "=== int8 rc=$? at $(date) ==="

python experiments/aggregate_r5.py
echo "=== chain complete at $(date) ==="
