#!/usr/bin/env python
"""On-chip sweep of the seq-pipeline tile parameters (ROUND3-NOTES lever:
the K-chunk scan dominates device time).  Each configuration runs in a
child process (the constants are read at import) and times
window_totals_packed at SS_LOG_N (default 2^16).

Usage: python bench/seq_sweep.py
Env: SS_LOG_N, SS_WBITS, SS_CONFIGS="lanes:block:tile,..." to override.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LOG_N = int(os.environ.get("SS_LOG_N", "16"))
WBITS = int(os.environ.get("SS_WBITS", "13"))
DEFAULT = "512:8:128,512:16:128,512:8:256,1024:8:128,1024:8:256,256:8:128"


def child():
    import random

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    import jax.numpy as jnp
    import numpy as np

    from zkvm_tpu.constants import L
    from zkvm_tpu.kernels import msm as jmsm
    from zkvm_tpu.kernels import pallas_msm as pm

    n = 1 << LOG_N
    r = random.Random(42)
    from zkvm_tpu.oracle.ristretto import RistrettoPoint
    base = [RistrettoPoint.from_uniform_bytes(
        r.getrandbits(512).to_bytes(64, "little")).ep for _ in range(256)]
    pb = pm.pack_points_lm(base)
    reps = n // 256
    pts = pm.PointBatch(
        jnp.tile(pb.x, (1, reps)), jnp.tile(pb.y, (1, reps)),
        jnp.tile(pb.z, (1, reps)), jnp.tile(pb.t, (1, reps)))
    digits = jnp.asarray(jmsm.signed_digits_radix_2w(
        [r.randrange(L) for _ in range(n)], WBITS))
    t0 = time.time()
    out = pm.window_totals_packed(pts, digits, WBITS, False)
    np.asarray(out)
    compile_s = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        np.asarray(pm.window_totals_packed(pts, digits, WBITS, False))
        best = min(best, time.time() - t0)
    print(json.dumps({"__child__": True, "best_ms": best * 1e3,
                      "compile_s": compile_s}))


def main():
    if os.environ.get("_SS_CHILD"):
        return child()
    configs = os.environ.get("SS_CONFIGS", DEFAULT).split(",")
    for cfg in configs:
        lanes, block, tile = cfg.split(":")
        env = dict(os.environ, _SS_CHILD="1", ZKVM_SEQ_LANES=lanes,
                   ZKVM_SEQ_BLOCK=block, ZKVM_SCAN_TILE=tile)
        try:
            res = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                capture_output=True, text=True, timeout=900)
        except subprocess.TimeoutExpired:
            print(f"{cfg:>14}: TIMEOUT")
            continue
        line = [ln for ln in res.stdout.splitlines() if "__child__" in ln]
        if not line:
            print(f"{cfg:>14}: FAILED {res.stderr[-200:]}")
            continue
        d = json.loads(line[0])
        print(f"{cfg:>14}: {d['best_ms']:8.1f} ms "
              f"(compile {d['compile_s']:.0f}s)")


if __name__ == "__main__":
    main()
