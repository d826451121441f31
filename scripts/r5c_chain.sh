#!/bin/bash
# Round-5 continuation chain (fresh container, ~1h device window).
# Captures the still-missing VERDICT-r4 artifacts in judge-value order:
#   1. parity snake tier (completes the 24-cell matrix, VERDICT item 2)
#   2. orbit bench                                    (VERDICT item 5)
#   3. interactive session                            (VERDICT item 6)
#   4. update-floor profile                           (VERDICT item 8)
#   5. full-protocol CSV sweep, row-resumable          (VERDICT item 4)
# Idempotent: each step checks its artifact first. R5C_DEADLINE_S (default
# 2700 s) stops new steps; a running step is never killed by the chain.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/r5c_chain.log
DEADLINE=$(( $(date +%s) + ${R5C_DEADLINE_S:-2700} ))
log() { echo "[$(date +%H:%M:%S)] $*" >> $LOG; }
past_deadline() { [ "$(date +%s)" -ge "$DEADLINE" ]; }
step() { past_deadline && { log "deadline reached before: $*"; exit 0; }
         log "step: $*"; }

# ---- 1. parity: snake:3 + snake-grad tier (row-resumable) ----
step parity-snake
if [ "$(grep -c edge_repair docs/parity_r5.json 2>/dev/null || echo 0)" -lt 24 ]
then
  timeout 2400 env \
    PARITY_CONFIGS=snake:3,snake-grad:0,snake-grad:1,snake-grad:2,snake-grad:3 \
    PARITY_OUT=docs/parity_r5.json \
    python scripts/tpu_parity.py >> /tmp/parity_r5c.log 2>&1
fi

# ---- 2. orbit bench ----
step orbit
if [ ! -s docs/orbit_r5.json ]; then
  timeout 900 env BENCH_ORBIT=2 BENCH_BREAKDOWN=0 BENCH_WATCHDOG_S=800 \
    python scripts/orbit_bench.py > /tmp/orbit_r5.log 2>>/tmp/orbit_r5.log
  grep '"unit"' /tmp/orbit_r5.log | tail -1 > /tmp/orbit_r5.json
  [ -s /tmp/orbit_r5.json ] && cp /tmp/orbit_r5.json docs/orbit_r5.json
fi

# ---- 3. interactive session (prewarmed structural edits) ----
step interactive
if ! grep -q total_ms_median docs/interactive_r5.json 2>/dev/null; then
  timeout 1200 env SESS_OUT=docs/interactive_r5.json \
    python scripts/interactive_session.py > /tmp/interactive_r5.log 2>&1
fi

# ---- 4. update-floor profile ----
step update-floor
if [ ! -s docs/update_floor_r5.txt ]; then
  timeout 600 python scripts/profile_update.py \
    > docs/update_floor_r5.txt 2>&1 || rm -f docs/update_floor_r5.txt
fi

# ---- 5. full-protocol CSVs (row-resumable; fills the tail) ----
step csv-sweep
left=$(( DEADLINE - $(date +%s) ))
[ "$left" -lt 300 ] && left=300
timeout "$left" env OUT_DIR=docs/benchmarks_r5 \
  python scripts/run_full_sweep.py > /tmp/sweep_r5.log 2>&1
log "r5c chain complete"
