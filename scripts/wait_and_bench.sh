#!/bin/bash
# Wait for the TPU relay/device to recover (it wedges on substantive
# kernels after heavy use), then run the final bench chain once.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

probe() {
  timeout 300 python - << 'EOF' > /tmp/devprobe.log 2>&1
import numpy as np, jax, jax.numpy as jnp
from vkvolume_tpu.utils import enable_compile_cache
enable_compile_cache()
from vkvolume_tpu.accel.occupancy import occupancy_map
from vkvolume_tpu.tf.transfer_function import tf_params
rng = np.random.default_rng(0)
vol = jnp.asarray(rng.integers(0, 255, (494, 832, 832), dtype=np.uint8))
tf = tf_params(intensity_min=0.086, gradient_min=0.0, gradient_max=0.0)
occ = occupancy_map(vol, None, tf, (124, 208, 208))
occ.block_until_ready()
float(occ.ravel()[0])
print("DEVICE OK")
EOF
  grep -q "DEVICE OK" /tmp/devprobe.log
}

for i in $(seq 1 30); do
  if probe; then
    echo "[$(date +%H:%M:%S)] device ok after $i probes; running final bench" \
      >> /tmp/wait_and_bench.log
    bash scripts/final_bench.sh > /tmp/final_bench3.log 2>&1
    echo "[$(date +%H:%M:%S)] final bench rc=$?" >> /tmp/wait_and_bench.log
    exit 0
  fi
  echo "[$(date +%H:%M:%S)] probe $i failed; sleeping" >> /tmp/wait_and_bench.log
  sleep 240
done
echo "device never recovered" >> /tmp/wait_and_bench.log
exit 1
