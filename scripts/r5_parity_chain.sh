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

want=24
attempt=0
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  have=$(grep -c wall_s "$PARITY_OUT" 2>/dev/null || echo 0)
  [ "$have" -ge "$want" ] && { log "parity matrix complete ($have rows)"; exit 0; }
  attempt=$((attempt+1))
  log "attempt $attempt: $have/$want rows done"
  timeout 5400 env PARITY_CONFIGS="$CFGS" \
    python scripts/tpu_parity.py >> $LOG 2>&1
  rc=$?
  log "tpu_parity exited rc=$rc"
  [ $rc -ne 0 ] && sleep 60   # relay cooldown before retry
done
log "deadline reached"
