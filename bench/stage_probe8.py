#!/usr/bin/env python
"""Probe 8: main-gather layout A/B at 2^16 x 20 windows (VERDICT r4
task 2 follow-up).  Round-4/5 evidence: the column gather
take((80, n), perm, axis=1) costs ~29 ms and is bound by gather
POSITIONS (32-word rows cost the same; 16-word affine rows cost MORE
after their normalization overhead).  Hypothesis: a row-major gather
take((n, 80), flat_perm, axis=0) is bandwidth-bound (contiguous rows),
like the bucket-tail compaction's row gather — measure it with and
without the limb-major relayout the scan kernel needs.

Run: python bench/stage_probe8.py
"""

import os
import random
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp

LOG_N = int(os.environ.get("MS_LOG_N", "16"))
ITERS = int(os.environ.get("MS_ITERS", "3"))
NW = 20
M, K = 512, (1 << LOG_N) // 512


def timed(name, fn, *args):
    f = jax.jit(fn)
    t0 = time.time()
    out = f(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:8])
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(ITERS):
        t0 = time.time()
        out = f(*args)
        np.asarray(jax.tree.leaves(out)[0].ravel()[:8])
        best = min(best, time.time() - t0)
    print(f"{name:46s} {best*1e3:9.1f} ms (compile {compile_s:.0f}s)",
          flush=True)


def main():
    n = 1 << LOG_N
    rng = np.random.default_rng(11)
    stacked = jnp.asarray(
        rng.integers(0, 1 << 13, size=(80, n), dtype=np.int32))
    perm = np.stack([rng.permutation(n).astype(np.int32)
                     for _ in range(NW)])
    perm_l = jnp.asarray(perm.reshape(NW, M, K).transpose(0, 2, 1))
    flat = jnp.asarray(
        (perm.reshape(NW, M, K).transpose(0, 2, 1)
         + (np.arange(NW) * 0)[:, None, None]).reshape(-1))
    print(f"platform={jax.devices()[0].platform} n=2^{LOG_N} nw={NW}",
          flush=True)

    timed("g1 column take((80,n), perm, axis=1)",
          lambda s, p: jnp.take(s, p, axis=1), stacked, perm_l)

    def g2(s, f):
        rows = jax.lax.optimization_barrier(s.T)   # (n, 80) row-major
        return jnp.take(rows, f, axis=0)           # (nw*K*M, 80)

    timed("g2 row take((n,80), flat, axis=0)", g2, stacked, flat)

    def g3(s, f):
        g = g2(s, f).reshape(NW, K, M, 80)
        return jnp.transpose(g, (3, 0, 1, 2))      # (80, nw, K, M)

    timed("g3 row take + relayout to limb-major", g3, stacked, flat)

    # transpose cost alone (the relayout g3 adds over g2)
    g = jax.jit(g2)(stacked, flat)
    timed("t  transpose (nw*K*M,80)->(80,nw,K,M)",
          lambda x: jnp.transpose(x.reshape(NW, K, M, 80), (3, 0, 1, 2)),
          g)

    # affine-width row gather: (n, 16) rows
    rows16 = jnp.asarray(
        rng.integers(0, 1 << 13, size=(n, 16), dtype=np.int32))

    def g4(r, f):
        g = jnp.take(r, f, axis=0).reshape(NW, K, M, 16)
        return jnp.transpose(g, (3, 0, 1, 2))

    timed("g4 row take 16-wide + relayout", g4, rows16, flat)

    # decisive: full window_totals with the row gather vs the column
    # gather (fresh closures per combo so the jit cache re-traces)
    import random as _random

    from zkvm_tpu.constants import L
    from zkvm_tpu.kernels import msm as jmsm
    from zkvm_tpu.kernels import pallas_msm as pm
    from zkvm_tpu.oracle.ristretto import RistrettoPoint

    r = _random.Random(42)
    base = [RistrettoPoint.from_uniform_bytes(
        r.getrandbits(512).to_bytes(64, "little")).ep for _ in range(256)]
    pb = pm.pack_points_lm(base)
    reps = n // 256
    pts = pm.PointBatch(*(jnp.tile(c, (1, reps)) for c in pb))
    scalars = [r.randrange(L) for _ in range(n)]
    digits = jnp.asarray(jmsm.signed_digits_radix_2w(scalars, 13))
    for mode in ("0", "1"):
        os.environ["ZKVM_MSM_ROWGATHER"] = mode

        def wt(px, py, pz, pt, d):
            return pm._bucket_totals_seq(
                pm.PointBatch(px, py, pz, pt), d, 13, False)

        timed(f"w  window_totals rowgather={mode}",
              wt, pts.x, pts.y, pts.z, pts.t, digits)


if __name__ == "__main__":
    main()
