#!/bin/bash
# Round-5 campaign, phase 4: the children the budget-truncated full bench
# skipped — virtual-mesh efficiency, host prove metrics, cloak, and the
# R1CS 2^15 child with its mega-check routed through the chip
# (VERDICT r4 task 4).  Chained after campaign4.
set -x
cd "$(dirname "$0")/.."
LOG=bench/onchip_campaign.log
exec >> "$LOG" 2>&1

until grep -q "campaign4 done" "$LOG"; do sleep 120; done
echo "=== campaign5 start $(date +%F.%T) ==="

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

BENCH_NB= BENCH_TXNB=0 BENCH_SKIP_SWEEP=1 BENCH_BUDGET_S=2500 \
  timeout 2700 python bench.py

echo "=== campaign5 done $(date +%F.%T) ==="
