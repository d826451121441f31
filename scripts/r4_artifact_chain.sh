#!/bin/bash
# Unattended round-4 artifact chain (VERDICT.md round-3 items, ordered by
# judge value per TPU-minute). Each step is gated on a done-check so fresh
# attempts (wedged relay, worker crash) resume where the last died.
#
#  1. kernel smoke      — the round-3 tail Mosaic specialisation classes
#                         must compile before they carry an artifact
#  2. static bench      — the driver-protocol headline (supervised bench.py)
#  3. aniso A/B         — skipmode 3 with the per-ray octant stitch must
#                         now beat skipmode 2 (VERDICT item 3)
#  4. stretch-fit A/B   — reference per-axis fit protocol (VERDICT item 7)
#  5. orbit             — cap-relief plans on device (VERDICT item 5)
#  6. interactive       — TF-edit latency artifact (VERDICT item 6)
#  7. parity matrix     — 24 configs + edge_repair (VERDICT item 4)
#  8. profiler A/B      — rect-cost + tent-precision calibration
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/r4_chain.log
log() { echo "[$(date +%H:%M:%S)] $*" >> $LOG; }

rm -f /tmp/r4_smoke_attempts /tmp/r4_rectab_attempts

smoke_done() {
  [ -s /tmp/r4_smoke.json ] || return 1
  [ "$(grep -c ':' /tmp/r4_smoke.json)" -ge 10 ] || return 1
  if [ "$(grep -c '"ok"' /tmp/r4_smoke.json)" -ge 10 ]; then return 0; fi
  [ "$(cat /tmp/r4_smoke_attempts 2>/dev/null || echo 0)" -ge 2 ]
}
rectab_done() {
  [ "$(grep -c frame_ms docs/rect_ab_r4.json 2>/dev/null || echo 0)" -ge 3 ] \
    && return 0
  # a persistently refusing arm (e.g. wide-rect compile 500s) must not
  # wedge the chain: 3 whole-script tries, then accept what we have
  [ "$(cat /tmp/r4_rectab_attempts 2>/dev/null || echo 0)" -ge 3 ] \
    && [ "$(grep -c frame_ms docs/rect_ab_r4.json 2>/dev/null || echo 0)" -ge 1 ]
}
static_done()      { [ -s docs/bench_static_r4.json ]; }
aniso_done()       { [ -s docs/aniso_r4.json ]; }
fit_done()         { [ -s docs/fit_ab_r4.json ]; }
orbit_done()       { [ -s docs/orbit_r4.json ]; }
interactive_done() { [ -s docs/interactive_r4.json ]; }
parity_done() {
  [ "$(grep -c wall_s docs/parity_r4.json 2>/dev/null || echo 0)" -ge 24 ]
}

rect_guard() {
  # If a wide brick rect failed its device smoke, pin the plans to the
  # proven geometry (see r3 chain for the rationale).
  if smoke_done; then
    if grep -q '"brick_rect512": "ok"' /tmp/r4_smoke.json; then
      unset VKV_MAX_RECT
    elif grep -q '"brick_rect384": "ok"' /tmp/r4_smoke.json; then
      export VKV_MAX_RECT=384
    else
      export VKV_MAX_RECT=256
    fi
    if grep -q '"brick_rect384_r96": "ok"' /tmp/r4_smoke.json; then
      unset VKV_MAX_BRICK_R
    else
      export VKV_MAX_BRICK_R=64
    fi
    if ! grep -q '"brick_headline_class": "ok"' /tmp/r4_smoke.json; then
      export VKV_MAX_RECT=256
    fi
  fi
  # The MEASURED winner overrides the compile-only guard: round 4's first
  # bench ran 53.4 ms vs the pre-wide-rect 18.6 ms — the wide-rect cost
  # model is uncalibrated, so trust the on-device A/B when it exists.
  if rectab_done; then
    best=$(python - <<'EOF'
import json
rows = [json.loads(l) for l in open("docs/rect_ab_r4.json") if l.strip()]
rows = [r for r in rows if "frame_ms" in r]
if rows:
    print(min(rows, key=lambda r: r["frame_ms"])["arm"])
EOF
)
    if [ -n "$best" ]; then
      export VKV_MAX_RECT=$best
      log "rect A/B winner pins VKV_MAX_RECT=$best"
    fi
  fi
}

run_bench() {  # $1 = output json, $@... = extra env
  local out=$1; shift
  timeout 3000 env BENCH_DEADLINE_S=2400 "$@" python bench.py \
    > /tmp/bench_step.log 2>>/tmp/bench_step_err.log
  grep '"unit"' /tmp/bench_step.log | tail -1 > "$out.tmp"
  if [ -s "$out.tmp" ]; then mv "$out.tmp" "$out"; else rm -f "$out.tmp"; fi
}

for i in $(seq 1 400); do
  if ! timeout 90 python -c "import jax, jax.numpy as a; float(a.arange(4.).sum())" \
      >/dev/null 2>&1; then
    log "attempt $i: relay still down"
    sleep 150
    continue
  fi
  log "attempt $i: relay healthy"
  if ! smoke_done; then
    n=$(cat /tmp/r4_smoke_attempts 2>/dev/null || echo 0)
    log "attempt $i: kernel smoke (try $((n + 1)))"
    timeout 2700 env SMOKE_OUT=/tmp/r4_smoke.json \
      python scripts/r3_smoke_kernels.py > /tmp/smoke_try.log 2>&1 \
      && echo $((n + 1)) > /tmp/r4_smoke_attempts
    continue
  fi
  if ! rectab_done; then
    log "attempt $i: rect A/B ($(grep -c frame_ms docs/rect_ab_r4.json 2>/dev/null || echo 0)/3 arms)"
    # arms are resumable one at a time: skip already-measured arms
    arms=""
    for a in 512 384 256; do
      grep -q "\"arm\": $a" docs/rect_ab_r4.json 2>/dev/null || arms="$arms,$a"
    done
    arms=${arms#,}
    n=$(cat /tmp/r4_rectab_attempts 2>/dev/null || echo 0)
    [ -n "$arms" ] && timeout 2700 env RECT_ARMS=$arms \
      python scripts/rect_ab.py > /tmp/rect_ab.log 2>&1
    echo $((n + 1)) > /tmp/r4_rectab_attempts
    continue
  fi
  rect_guard
  if ! static_done; then
    log "attempt $i: static bench (VKV_MAX_RECT=${VKV_MAX_RECT:-512})"
    run_bench docs/bench_static_r4.json
    [ -s docs/bench_static_r4.json ] \
      && cp /tmp/r4_smoke.json docs/smoke_r4.json 2>/dev/null
    continue
  fi
  if ! aniso_done; then
    log "attempt $i: aniso bench (skipmode 3, per-ray octant stitch)"
    run_bench docs/aniso_r4.json BENCH_SKIPMODE=3 BENCH_BREAKDOWN=0
    continue
  fi
  if ! fit_done; then
    log "attempt $i: stretch-fit A/B"
    run_bench docs/fit_ab_r4.json VKV_BENCH_FIT=stretch BENCH_BREAKDOWN=0
    continue
  fi
  if ! orbit_done; then
    log "attempt $i: orbit bench"
    timeout 4200 env BENCH_ORBIT=2 BENCH_BREAKDOWN=0 BENCH_WATCHDOG_S=3600 \
      python scripts/orbit_bench.py > /tmp/orbit_try.log 2>>/tmp/orbit_err.log
    grep '"unit"' /tmp/orbit_try.log | tail -1 > /tmp/orbit_r4.json
    if [ -s /tmp/orbit_r4.json ]; then
      cp /tmp/orbit_r4.json docs/orbit_r4.json
    else
      rm -f /tmp/orbit_r4.json
    fi
    continue
  fi
  if ! interactive_done; then
    log "attempt $i: interactive session"
    timeout 2700 env SESS_OUT=docs/interactive_r4.json \
      python scripts/interactive_session.py > /tmp/interactive_try.log 2>&1
    continue
  fi
  if ! parity_done; then
    log "attempt $i: parity matrix ($(grep -c wall_s docs/parity_r4.json 2>/dev/null || echo 0)/24)"
    timeout 3300 env PARITY_OUT=docs/parity_r4.json \
      python scripts/tpu_parity.py > /tmp/parity_try.log 2>&1
    continue
  fi
  if [ "$(grep -c frame_ms docs/ess_ratio_r4.json 2>/dev/null || echo 0)" -lt 18 ]; then
    log "attempt $i: ESS-ratio + aniso-vs-iso matrix ($(grep -c frame_ms docs/ess_ratio_r4.json 2>/dev/null || echo 0)/18)"
    timeout 3300 env \
      ESS_DATASETS=present,present-grad,beetle,beetle-grad,snake,snake-grad \
      ESS_SKIPMODES=0,2,3 python scripts/ess_ratio.py \
      > /tmp/ess_try.log 2>&1
    continue
  fi
  if [ ! -s docs/update_floor_r4.txt ]; then
    log "attempt $i: small-volume map-update floor profile (present b=4)"
    { timeout 1200 env DS=present python scripts/profile_update.py \
        && timeout 1200 env DS=present PALLAS_ONLY=1 \
             python scripts/profile_update.py; } \
      > /tmp/update_floor.log 2>&1 \
      && cp /tmp/update_floor.log docs/update_floor_r4.txt
    continue
  fi
  if [ ! -s docs/profile_r4.json ]; then
    log "attempt $i: profiler variant A/B"
    timeout 3300 env PROF_VARIANTS=1 python scripts/profile_sweep.py \
      > /tmp/prof_try.log 2>>/tmp/prof_err.log
    grep '"frame_ms"' /tmp/prof_try.log | tail -1 > /tmp/profile_r4.json
    if [ -s /tmp/profile_r4.json ]; then
      cp /tmp/profile_r4.json docs/profile_r4.json
    else
      rm -f /tmp/profile_r4.json
    fi
    continue
  fi
  log "all artifacts captured"
  exit 0
done
log "attempt budget exhausted"
exit 0
