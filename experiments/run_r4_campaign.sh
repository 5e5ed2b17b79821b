#!/bin/bash
# Round-4 TPU measurement campaign: waits for the in-flight bench to free
# the chip, then runs the scale lanes serially (one TPU job at a time).
# Each lane saves incrementally into experiments/results/.
set -u
cd /root/repo
BENCH_PID=$(cat /tmp/bench.pid 2>/dev/null || echo 0)
while [ "$BENCH_PID" -gt 0 ] && kill -0 "$BENCH_PID" 2>/dev/null; do
  sleep 30
done
echo "=== chip free at $(date) ==="

echo "=== lane 1: GIST 200k int8 (bench-config A/B vs sketch256) ==="
LANE_N=200000 LANE_OUT=/root/repo/experiments/results/lane_gist200k_int8_r4.json \
  timeout 3000 python experiments/lane_gist1m.py
echo "=== lane 1 rc=$? at $(date) ==="

echo "=== lane 2: GIST 1M sketch+prune64 ==="
LANE_N=1000000 LANE_OUT=/root/repo/experiments/results/lane_gist1m_r4.json \
  timeout 5400 python experiments/lane_gist1m.py
echo "=== lane 2 rc=$? at $(date) ==="

echo "=== lane 3: sparsevec 1M ==="
timeout 7200 python experiments/lane_sparse1m.py
echo "=== lane 3 rc=$? at $(date) ==="

echo "=== lane 4: 10M HNSW bf16 ==="
timeout 10800 python experiments/lane_10m_hnsw.py
echo "=== lane 4 rc=$? at $(date) ==="
echo "=== campaign done at $(date) ==="
