#!/bin/bash
# Round-5 campaign, phase 2 (2026-08-20): the tunnel flaps — this loop
# waits for it, then runs the queued chip work ONE process at a time.
# Order: tx-batch capture (idle box, 7 iters) -> affine MSM A/B at 2^16
# -> 2^18 spot check -> full bench with the inline sweep.
set -x
cd "$(dirname "$0")/.."
LOG=bench/onchip_campaign.log
exec >> "$LOG" 2>&1
echo "=== campaign3 start $(date +%F.%T) ==="

probe() {
  timeout 240 python - <<'EOF'
import jax, jax.numpy as jnp, numpy as np
assert jax.devices()[0].platform in ("tpu", "axon")
np.asarray(jnp.ones((8, 128)) @ jnp.ones((128, 8)))
EOF
}

wait_tunnel() {
  for i in $(seq 1 200); do
    if probe; then return 0; fi
    sleep 90
  done
  return 1
}

wait_tunnel || exit 1
echo "--- c3 step 1: tx batch capture ($(date +%F.%T)) ---"
BENCH_NB= BENCH_TXNB=256 BENCH_ITERS=7 BENCH_PROBE_TIMEOUT=300 \
  timeout 1800 python bench.py --onchip-now

wait_tunnel || exit 1
echo "--- c3 step 2: affine A/B at 2^16 ($(date +%F.%T)) ---"
timeout 2400 python bench/affine_probe.py

wait_tunnel || exit 1
echo "--- c3 step 3: affine A/B at 2^18 ($(date +%F.%T)) ---"
MS_LOG_N=18 MS_ITERS=2 timeout 2400 python bench/affine_probe.py

wait_tunnel || exit 1
echo "--- c3 step 4: full bench ($(date +%F.%T)) ---"
BENCH_BUDGET_S=3000 timeout 3300 python bench.py

echo "=== campaign3 done $(date +%F.%T) ==="
