#!/bin/bash
# Round-5 end-game device window (run AFTER the artifact chain exits):
#   1. smoke-compile the split3 tent-dot kernel classes (HTTP-500 guard)
#   2. speed A/B: profile_sweep PROF_VARIANTS at the bench pose
#   3. on-device full-frame parity spot-check split3 vs highest
# Then (manual decision): flip VKV_TENT_PRECISION default / BENCH_SKIPMODE
# and refresh docs/bench_static_r5.json + docs/aniso_r5.json.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/r5_endgame.log
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a $LOG; }

log "1. split3 smoke"
timeout 1800 env SMOKE_OUT=/tmp/r5_smoke.json \
  python scripts/r3_smoke_kernels.py > /tmp/r5_smoke_run.log 2>&1
grep -E "split3" /tmp/r5_smoke.json | tee -a $LOG
if grep -E '"brick_(tent|headline)_split3": "(?!ok)' -P /tmp/r5_smoke.json \
    > /dev/null 2>&1; then
  log "split3 failed to compile — stop (keep highest)"; exit 1
fi

log "2. profile_sweep variants (beetle sm2, full scale)"
timeout 3600 env PROF_VARIANTS=1 PROF_OUT=/tmp/r5_prof.json \
  python scripts/profile_sweep.py > /tmp/r5_prof_run.log 2>&1
grep -E "sweep_tent|sweep_ms|frame_ms" /tmp/r5_prof.json | tee -a $LOG

log "3. device parity spot-check split3 vs highest"
timeout 1800 python scripts/r5_split3_parity.py 2>&1 | tail -5 | tee -a $LOG
log "endgame probes done — decide defaults, then refresh benches"
