#!/bin/bash
# Round-5 manual-control tail: runs after the restarted orbit bench exits.
# Device steps strictly serial; the parity snake tier waits for the
# host-side snake synthesis (standalone, /tmp/snake_synth.log) to finish.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/r5d_chain.log
log() { echo "[$(date +%H:%M:%S)] $*" >> $LOG; }

# ---- 0. wait for orbit to exit, harvest its artifact ----
while [ -e /proc/$(cat /tmp/orbit.pid 2>/dev/null || echo 0) ]; do sleep 20; done
grep '"unit"' /tmp/orbit_r5.log | tail -1 > /tmp/orbit_r5.json
[ -s /tmp/orbit_r5.json ] && cp /tmp/orbit_r5.json docs/orbit_r5.json
log "orbit harvested: $(wc -c < /tmp/orbit_r5.json 2>/dev/null || echo 0) bytes"

synth_done() { grep -q "synth done" /tmp/snake_synth.log 2>/dev/null; }

# ---- 1. if snake ready: parity first (top judge item); else interactive ----
run_parity() {
  log "parity snake tier"
  timeout 9000 env \
    PARITY_CONFIGS=snake:3,snake-grad:0,snake-grad:1,snake-grad:2,snake-grad:3 \
    PARITY_OUT=docs/parity_r5.json \
    python scripts/tpu_parity.py >> /tmp/parity_r5c.log 2>&1
}
run_interactive() {
  if ! grep -q total_ms_median docs/interactive_r5.json 2>/dev/null; then
    log "interactive session"
    timeout 2400 env SESS_OUT=docs/interactive_r5.json \
      python scripts/interactive_session.py > /tmp/interactive_r5.log 2>&1
  fi
}
run_floor() {
  if [ ! -s docs/update_floor_r5.txt ]; then
    log "update floor"
    timeout 1200 python scripts/profile_update.py \
      > docs/update_floor_r5.txt 2>&1 || rm -f docs/update_floor_r5.txt
  fi
}

if synth_done; then
  run_parity; run_interactive; run_floor
else
  run_interactive
  if synth_done; then run_parity; run_floor
  else
    run_floor
    log "waiting for snake synth"
    while ! synth_done; do
      # If the synth process died without the marker, stop waiting.
      [ -e /proc/$(cat /tmp/synth.pid 2>/dev/null || echo 0) ] || break
      sleep 30
    done
    synth_done && run_parity
  fi
fi

# ---- 2. CSV sweep fills the remaining window ----
log "csv sweep"
timeout 10800 env OUT_DIR=docs/benchmarks_r5 \
  python scripts/run_full_sweep.py > /tmp/sweep_r5.log 2>&1
log "r5d chain complete"
