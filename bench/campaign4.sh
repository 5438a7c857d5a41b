#!/bin/bash
# Round-5 campaign, phase 3: gather-layout probe + the NEW fused tx-batch
# device path + refreshed captures.  Chained after campaign3.
set -x
cd "$(dirname "$0")/.."
LOG=bench/onchip_campaign.log
exec >> "$LOG" 2>&1
echo "=== campaign4 start $(date +%F.%T) ==="

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
echo "--- c4 step 1: gather layout probe8 ($(date +%F.%T)) ---"
timeout 3000 python bench/stage_probe8.py

wait_tunnel || exit 1
echo "--- c4 step 2: tx batch capture, fused device path ($(date +%F.%T)) ---"
BENCH_NB= BENCH_TXNB=256 BENCH_ITERS=7 BENCH_PROBE_TIMEOUT=300 \
  timeout 2400 python bench.py --onchip-now

wait_tunnel || exit 1
echo "--- c4 step 3: batch verify refresh ($(date +%F.%T)) ---"
BENCH_NB=4096 BENCH_TXNB=0 BENCH_ITERS=5 BENCH_PROBE_TIMEOUT=300 \
  timeout 2400 python bench.py --onchip-now

echo "=== campaign4 done $(date +%F.%T) ==="
