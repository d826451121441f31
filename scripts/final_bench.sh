#!/bin/bash
# Post-sweep round-2 artifact chain (serial on the one TPU):
# headline bench + orbit bench + aniso headline + DT exactness/timing + parity.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== headline (static, stage breakdown) ==="
python bench.py 2>/dev/null

echo "=== orbit 2 deg/frame ==="
BENCH_ORBIT=2 BENCH_BREAKDOWN=0 python bench.py 2>/dev/null

echo "=== anisotropic skipmode ==="
BENCH_SKIPMODE=3 BENCH_BREAKDOWN=0 python bench.py 2>/dev/null

echo "=== Pallas DT exactness + timing on device ==="
PALLAS_ONLY=1 python scripts/profile_update.py 2>/dev/null

echo "=== TPU parity artifact ==="
python scripts/tpu_parity.py 2>/dev/null
