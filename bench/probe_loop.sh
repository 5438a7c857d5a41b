#!/bin/bash
# Background device-availability watcher: tries to claim the chip and run a
# trivial jit every few minutes, logging to /tmp/probe_loop.log.  The axon
# tunnel is known to stall in init for unbounded time (see memory notes), so
# each attempt runs under a hard timeout in its own process.
LOG=/tmp/probe_loop.log
echo "probe loop start $(date +%H:%M:%S)" >> "$LOG"
while true; do
  # each attempt writes its OWN file — grepping the cumulative log would
  # match a stale success from a previous watcher run and fire the
  # campaign against a dead device
  ATTEMPT=$(mktemp /tmp/probe_attempt.XXXXXX)
  timeout 420 python - <<'EOF' > "$ATTEMPT" 2>&1
import time
t0 = time.time()
import jax, numpy as np, jax.numpy as jnp
ds = jax.devices()
x = jnp.ones((128, 128), jnp.float32)
y = np.asarray(jax.jit(lambda a: a @ a)(x))
print(f"PROBE_OK {time.strftime('%H:%M:%S')} init+run {time.time()-t0:.1f}s "
      f"{ds[0].platform}", flush=True)
EOF
  cat "$ATTEMPT" >> "$LOG"
  if grep -q PROBE_OK "$ATTEMPT"; then
    rm -f "$ATTEMPT"
    echo "device up at $(date +%H:%M:%S); firing campaign" >> "$LOG"
    bash /root/repo/bench/onchip_campaign.sh
    echo "campaign finished at $(date +%H:%M:%S); watcher exiting" >> "$LOG"
    exit 0
  fi
  rm -f "$ATTEMPT"
  echo "attempt failed at $(date +%H:%M:%S); retry in 180s" >> "$LOG"
  sleep 180
done
