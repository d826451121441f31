#!/bin/bash
# Round-5 artifact chain: capture every VERDICT-r4 "done =" artifact on the
# fixed renderer (bf16-ray precision fix + warp alignment fix + 128-quantum
# rects + banded repair), in judge-value order:
#
#   1. static + aniso bench  (north star: BENCH_r05 preview, new rects)
#   2. ESS stage matrix      (warp_ms check, skipmode 1 included this time)
#   3. sample-count A/B      (sweep over-march diagnostic, VERDICT item 3)
#   4. parity snake tier     (completes the 24-cell matrix, VERDICT item 2)
#   5. orbit bench           (tail poses, VERDICT item 5)
#   6. interactive session   (prewarmed structural edits, VERDICT item 6)
#   7. update-floor profile  (small-map updates, VERDICT item 8)
#   8. full-protocol CSVs    (benchmarks_r5, VERDICT item 4 — longest, last)
#
# Idempotent: every step checks its artifact first; re-run the chain after
# a relay crash and it resumes. R5_DEADLINE_S (default 18000 s) stops new
# steps; a running step is never killed by the chain itself.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/r5_chain.log
DEADLINE=$(( $(date +%s) + ${R5_DEADLINE_S:-18000} ))
log() { echo "[$(date +%H:%M:%S)] $*" >> $LOG; }
past_deadline() { [ "$(date +%s)" -ge "$DEADLINE" ]; }

relay_ok() {
  timeout 90 python -c \
    "import jax, jax.numpy as a; float(a.arange(4.).sum())" >/dev/null 2>&1
}

step() {
  past_deadline && { log "deadline reached before: $*"; exit 0; }
  if ! relay_ok; then log "relay down before: $*"; sleep 120; fi
}

run_bench() {  # $1 = output json, $@... = extra env
  local out=$1; shift
  timeout 3000 env BENCH_DEADLINE_S=2400 "$@" python bench.py \
    > /tmp/bench_step.log 2>>/tmp/bench_step_err.log
  grep '"unit"' /tmp/bench_step.log | tail -1 > "$out.tmp"
  if [ -s "$out.tmp" ]; then mv "$out.tmp" "$out"; else rm -f "$out.tmp"; fi
}

parity_rows() {  # $1 = comma configs ("" = all 24), $2 = min repaired rows
  [ "$(grep -c edge_repair docs/parity_r5.json 2>/dev/null || echo 0)" \
    -ge "$2" ] && return 0
  log "parity rows: ${1:-ALL}"
  local cfg_env=()
  [ -n "$1" ] && cfg_env=(PARITY_CONFIGS="$1")
  timeout 14400 env "${cfg_env[@]}" PARITY_OUT=docs/parity_r5.json \
    python scripts/tpu_parity.py >> /tmp/parity_r5_chain.log 2>&1
}

# ---- 1. static + aniso bench (north star preview on the new rects) ----
step static-bench
if [ ! -s docs/bench_static_r5.json ]; then
  log "static bench (new rects)"
  run_bench docs/bench_static_r5.json
fi
step aniso-bench
if [ ! -s docs/aniso_r5.json ]; then
  log "aniso bench"
  run_bench docs/aniso_r5.json BENCH_SKIPMODE=3 BENCH_BREAKDOWN=0
fi

# ---- 2. parity matrix: ALL 24 cells, default + edge-repair columns ----
# (top judge item; tpu_parity.py resumes row-by-row, oracle rendered once
# per dataset and reused across the 4 skipmodes)
step parity-full
parity_rows "" 24
step parity-full-retry
parity_rows "" 24

# ---- 3. ESS stage matrix, all skipmodes incl Block ----
step ess-matrix
if [ ! -s docs/ess_ratio_r5.json ]; then
  log "ESS matrix (skipmodes 0,1,2,3)"
  timeout 7200 env ESS_OUT=docs/ess_ratio_r5.json \
    ESS_DATASETS=present,present-grad,beetle,beetle-grad,snake,snake-grad \
    ESS_SKIPMODES=0,1,2,3 python scripts/ess_ratio.py \
    > /tmp/ess_r5.log 2>&1
fi

# ---- 3. sample-count A/B (sweep over-march) ----
step sample-ab
if [ ! -s docs/sample_ab_r5.json ]; then
  log "sample-count A/B (beetle:2)"
  timeout 3600 env AB_OUT=docs/sample_ab_r5.json \
    python scripts/sample_count_ab.py > /tmp/sample_ab_r5.log 2>&1
fi

# ---- 5. orbit bench (tail poses under the headroomed tiers) ----
step orbit
if [ ! -s docs/orbit_r5.json ]; then
  log "orbit bench"
  timeout 4200 env BENCH_ORBIT=2 BENCH_BREAKDOWN=0 BENCH_WATCHDOG_S=3600 \
    python scripts/orbit_bench.py > /tmp/orbit_r5.log 2>>/tmp/orbit_r5.log
  grep '"unit"' /tmp/orbit_r5.log | tail -1 > /tmp/orbit_r5.json
  [ -s /tmp/orbit_r5.json ] && cp /tmp/orbit_r5.json docs/orbit_r5.json
fi

# ---- 6. interactive session (prewarmed) ----
step interactive
if ! grep -q total_ms_median docs/interactive_r5.json 2>/dev/null; then
  log "interactive session (prewarmed structural edits)"
  timeout 4200 env SESS_OUT=docs/interactive_r5.json \
    python scripts/interactive_session.py > /tmp/interactive_r5.log 2>&1
fi

# ---- 7. update-floor profile ----
step update-floor
if [ ! -s docs/update_floor_r5.txt ]; then
  log "update floor profile (present)"
  timeout 2400 python scripts/profile_update.py \
    > docs/update_floor_r5.txt 2>&1 || rm -f docs/update_floor_r5.txt
fi

# ---- 8. full-protocol CSVs (longest; last) ----
step csv-sweep
if [ ! -f /tmp/r5_csv_started ]; then
  log "full-protocol CSV sweep -> docs/benchmarks_r5"
  touch /tmp/r5_csv_started
  # Run only until the chain deadline: the sweep is row-resumable and the
  # driver's end-of-round bench needs the device back.
  left=$(( DEADLINE - $(date +%s) ))
  [ "$left" -lt 600 ] && left=600
  timeout "$left" env OUT_DIR=docs/benchmarks_r5 \
    python scripts/run_full_sweep.py > /tmp/sweep_r5.log 2>&1
fi
log "r5 chain complete"
