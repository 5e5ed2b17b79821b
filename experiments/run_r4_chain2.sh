#!/bin/bash
# Round-4 session-2 chip chain: wait for the in-flight 10M HNSW lane,
# then run the single-query latency lane (VERDICT r3 #4) and the
# sparsevec-1M lane (VERDICT r3 #2) strictly serially — two TPU clients
# wedge the axon tunnel (BENCH_NOTES.md).  Every lane saves incrementally.
set -u
cd /root/repo
PID=$(cat /tmp/lane10m.pid 2>/dev/null || echo 0)
while [ "$PID" -gt 0 ] && kill -0 "$PID" 2>/dev/null; do
  sleep 30
done
echo "=== chip free at $(date) ==="

echo "=== latency lane (1M, p50/p99 batch 1/16/256 + device-only) ==="
LAT_OUT=/root/repo/experiments/results/lane_latency_r4.json \
  timeout 2700 python experiments/lane_latency.py
echo "=== latency rc=$? at $(date) ==="

echo "=== sparse 1M lane ==="
timeout 7200 python experiments/lane_sparse1m.py
echo "=== sparse rc=$? at $(date) ==="
echo "=== chain done at $(date) ==="
