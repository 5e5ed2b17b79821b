#!/bin/bash
# Chain 5: after chain4 (10M HNSW + sparse-1M) frees the chip, run the
# device-only latency probe.  Strictly one TPU client at a time; the probe
# is milestone-resumable (1M graph checkpoint in /tmp) under the watchdog.
set -u
cd /root/repo
CH4_PID="${1:?pass chain4 pid}"
while kill -0 "$CH4_PID" 2>/dev/null; do sleep 30; done
echo "=== chip free at $(date) ==="

for attempt in 1 2 3; do
  echo "=== device latency probe attempt $attempt at $(date) ==="
  timeout 5400 python experiments/watchdog_run.py \
    python experiments/lane_device_latency.py > /tmp/lanedevlat.log 2>&1
  rc=$?
  echo "=== devlat rc=$rc at $(date) ==="
  [ "$rc" -ne 99 ] && break
  sleep 20
done
echo "=== chain5 done at $(date) ==="
