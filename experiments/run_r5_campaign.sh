#!/bin/bash
# Round-5 chip campaign, strictly serial (two TPU clients wedge the axon
# tunnel — BENCH_NOTES.md).  Each lane saves incrementally and resumes
# from /tmp milestones; the watchdog kills+retries a wedged worker.
set -u
cd /root/repo

echo "=== 10M HNSW lane (VERDICT r4 #3) at $(date) ==="
for attempt in 1 2 3; do
  LANE_OUT=/root/repo/experiments/results/lane_10m_hnsw_r5.json \
    timeout 13500 python experiments/watchdog_run.py \
    python experiments/lane_10m_hnsw.py && break
  echo "=== 10M attempt $attempt rc=$? — retrying from milestones ==="
done
echo "=== 10M done at $(date) ==="

echo "=== sparse 1M lane (VERDICT r4 #4) at $(date) ==="
for attempt in 1 2 3; do
  LANE_OUT=/root/repo/experiments/results/lane_sparse1m_r5.json \
    timeout 10800 python experiments/watchdog_run.py \
    python experiments/lane_sparse1m.py && break
  echo "=== sparse attempt $attempt rc=$? — retrying from milestones ==="
done
echo "=== sparse done at $(date) ==="

echo "=== device-only latency lane (VERDICT r4 #7) at $(date) ==="
LAT_OUT=/root/repo/experiments/results/lane_latency_r5.json \
  timeout 3600 python experiments/lane_device_latency.py
echo "=== campaign complete at $(date) ==="
