#!/bin/bash
# Chain 3: after the in-flight latency lane frees the chip, run the 10M
# HNSW lane (highest-value missing BASELINE row), then sparse-1M with
# whatever session time remains.  Strictly one TPU client at a time.
set -u
cd /root/repo
while kill -0 "$(cat /tmp/lanelat.pid)" 2>/dev/null; do sleep 20; done
echo "=== chip free at $(date) ==="

echo "=== 10M HNSW lane ==="
timeout 10800 python experiments/lane_10m_hnsw.py > /tmp/lane10m.log 2>&1
echo "=== 10m rc=$? at $(date) ==="

echo "=== sparse 1M lane ==="
timeout 7200 python experiments/lane_sparse1m.py > /tmp/lanesparse.log 2>&1
echo "=== sparse rc=$? at $(date) ==="
echo "=== chain3 done at $(date) ==="
