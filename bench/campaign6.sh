#!/bin/bash
# Round-5 campaign, phase 5: capture the NEW fused-split R1CS device
# verify (engine.verify_r1cs_split) and warm its compile cache for the
# driver's end-of-round bench run.
set -x
cd "$(dirname "$0")/.."
LOG=bench/onchip_campaign.log
exec >> "$LOG" 2>&1
echo "=== campaign6 start $(date +%F.%T) ==="

probe() {
  timeout 240 python - <<'EOF'
import jax, jax.numpy as jnp, numpy as np
assert jax.devices()[0].platform in ("tpu", "axon")
np.asarray(jnp.ones((8, 128)) @ jnp.ones((128, 8)))
EOF
}
for i in $(seq 1 200); do
  if probe; then break; fi
  sleep 90
done

_BENCH_CHILD=r1cs_scale _BENCH_ARG= _BENCH_R1CS_DEVICE=1 \
  timeout 2400 python bench.py

echo "=== campaign6 done $(date +%F.%T) ==="
