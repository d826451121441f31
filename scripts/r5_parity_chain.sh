#!/bin/bash
# Round-5 parity matrix: all 6 configs x skipmodes 0-3 into docs/parity_r5.json
# (VERDICT r4 missing #1/#2). Order: present-grad first (the round-5 density
# fix's headline evidence), then present, beetle, beetle-grad, then the snake
# tier (832M voxels — the long pole). tpu_parity.py is per-config resumable;
# this wrapper restarts it on relay wedges until done or deadline.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
export PARITY_OUT=docs/parity_r5.json
LOG=/tmp/r5_parity.log
DEADLINE=$(( $(date +%s) + ${R5_DEADLINE_S:-14400} ))
log() { echo "[$(date +%H:%M:%S)] $*" >> $LOG; }

ORDER="present-grad present beetle beetle-grad snake snake-grad"
CFGS=""
for ds in $ORDER; do
  for sm in 0 1 2 3; do CFGS="$CFGS,$ds:$sm"; done
done
CFGS=${CFGS#,}

# Pass 1: all 24 default columns (PARITY_REPAIR=0) — the raw-parity
# evidence lands first. Pass 2: repair columns (resumable per config; the
# default columns are already on disk so crashes re-run only the repair).
want=24
attempt=0
for repair in 0 1; do
  while [ "$(date +%s)" -lt "$DEADLINE" ]; do
    have=$(grep -c wall_s "$PARITY_OUT" 2>/dev/null || echo 0)
    nrep=$(grep -c repaired_px "$PARITY_OUT" 2>/dev/null || echo 0)
    if [ "$repair" = 0 ]; then
      [ "$have" -ge "$want" ] && { log "pass 1 complete ($have rows)"; break; }
    else
      [ "$nrep" -ge "$want" ] && { log "pass 2 complete ($nrep repairs)"; break; }
    fi
    attempt=$((attempt+1))
    log "attempt $attempt (repair=$repair): $have/$want rows, $nrep repairs"
    timeout 5400 env PARITY_CONFIGS="$CFGS" PARITY_REPAIR=$repair \
      python scripts/tpu_parity.py >> $LOG 2>&1
    rc=$?
    log "tpu_parity exited rc=$rc"
    [ $rc -ne 0 ] && sleep 60   # relay cooldown before retry
  done
done
log "chain done or deadline"
