#!/bin/bash
# Round-5 chip chain 2: waits for run_r5_campaign.sh, then
#  1. GIST-200k int8 A/B lane (validates the donated-cache fix on the
#     exact config that OOM'd; VERDICT r4 #9)
#  2. query-beam sweep at the 0.99-recall operating point from the bench
#     graph cache (hop-count lever; hbm_frac ~3% says wider beams are
#     nearly free per hop)
#  3. warm bench re-run (uncontended lane numbers + driver rehearsal)
#  4. summary_r05 aggregation
set -u
cd /root/repo
PID=$(cat /tmp/r5_campaign.pid 2>/dev/null || echo 0)
while [ "$PID" -gt 0 ] && kill -0 "$PID" 2>/dev/null; do sleep 60; done
echo "=== chip free at $(date) ==="

echo "=== gist int8 A/B lane ==="
timeout 4500 python experiments/watchdog_run.py \
  python experiments/lane_gist_int8.py
echo "=== gist int8 rc=$? at $(date) ==="

echo "=== query beam sweep (bench cache) ==="
EXP_BENCH_CACHE=1 EXP_Q=8000 EXP_BATCH=8000 EXP_EF=64,80,100 \
  EXP_QEXPAND=16 timeout 2400 python experiments/exp_query_sweep.py sweep \
  | tee /tmp/qsweep16.json
EXP_BENCH_CACHE=1 EXP_Q=8000 EXP_BATCH=8000 EXP_EF=64,80,100 \
  EXP_QEXPAND=24 timeout 1800 python experiments/exp_query_sweep.py sweep \
  | tee /tmp/qsweep24.json
echo "=== sweep rc=$? at $(date) ==="

echo "=== warm bench rehearsal ==="
timeout 3600 python bench.py > /tmp/bench_warm.out 2> /tmp/bench_warm.err
echo "=== bench rc=$? at $(date) ==="

python experiments/aggregate_r5.py
echo "=== chain2 complete at $(date) ==="
