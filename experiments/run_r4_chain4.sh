#!/bin/bash
# Chain 4: after the in-flight latency lane frees the chip, run the 10M
# HNSW lane then sparse-1M, each under the wedge watchdog with retries.
# Lanes are milestone-resumable (GT npy + graph checkpoint in /tmp), so a
# retry skips finished phases.  Strictly one TPU client at a time.
set -u
cd /root/repo
while kill -0 "$(cat /tmp/lanelat.pid)" 2>/dev/null; do sleep 20; done
echo "=== chip free at $(date) ==="

for attempt in 1 2 3; do
  echo "=== 10M HNSW lane attempt $attempt at $(date) ==="
  timeout 9000 python experiments/watchdog_run.py \
    python experiments/lane_10m_hnsw.py > /tmp/lane10m.log 2>&1
  rc=$?
  echo "=== 10m rc=$rc at $(date) ==="
  [ "$rc" -ne 99 ] && break
  sleep 20  # let the faulted worker recycle
done

for attempt in 1 2 3; do
  echo "=== sparse 1M lane attempt $attempt at $(date) ==="
  timeout 7200 python experiments/watchdog_run.py \
    python experiments/lane_sparse1m.py > /tmp/lanesparse.log 2>&1
  rc=$?
  echo "=== sparse rc=$rc at $(date) ==="
  [ "$rc" -ne 99 ] && break
  sleep 20
done
echo "=== chain4 done at $(date) ==="
