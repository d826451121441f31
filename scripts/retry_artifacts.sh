#!/bin/bash
# Unattended retry chain for the round-2 tail artifacts (orbit bench JSON,
# TPU parity JSON). Each attempt is a fresh client process — the wedged
# relay frees when the previous client dies, and some attempts succeed.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/retry_artifacts.log

for i in $(seq 1 12); do
  echo "[$(date +%H:%M:%S)] attempt $i: orbit" >> $LOG
  if [ ! -f /tmp/orbit_result.json ]; then
    timeout 2700 env BENCH_ORBIT=2 BENCH_BREAKDOWN=0 BENCH_WATCHDOG_S=2400 \
      python bench.py > /tmp/orbit_try.log 2>>/tmp/orbit_err.log
    grep '"unit"' /tmp/orbit_try.log | tail -1 > /tmp/orbit_result.json
    [ -s /tmp/orbit_result.json ] || rm -f /tmp/orbit_result.json
  fi
  echo "[$(date +%H:%M:%S)] attempt $i: parity" >> $LOG
  if [ "$(grep -c wall_s docs/parity_r2.json 2>/dev/null || echo 0)" -lt 4 ]; then
    timeout 2700 python scripts/tpu_parity.py > /tmp/parity_try.log 2>&1
  fi
  if [ -f /tmp/orbit_result.json ] && \
     [ "$(grep -c wall_s docs/parity_r2.json 2>/dev/null || echo 0)" -ge 4 ]; then
    echo "[$(date +%H:%M:%S)] both artifacts captured" >> $LOG
    cp /tmp/orbit_result.json docs/orbit_r2.json
    exit 0
  fi
  sleep 120
done
echo "[$(date +%H:%M:%S)] gave up" >> $LOG
# Keep whatever landed.
[ -f /tmp/orbit_result.json ] && cp /tmp/orbit_result.json docs/orbit_r2.json
exit 0
